package graft.sources

import java.nio.file.{Files, Path, Paths}

import graft.SparkSuite

/** Bloom/NDV payloads live in per-file SIDECARS (`blobs-<dataFile>`), not
  * in the manifest: the manifest stores only `col=@slot` refs, so a
  * million-file manifest stays list-sized, snapshots share sidecars by
  * reference, and rename/drop maintenance stays metadata-only. */
class BlobSidecarSpec extends SparkSuite {
  import spark.implicits._

  private val Fmt = "graft.sources.GraftManifestSink"

  private lazy val rootDir = {
    val d = Files.createTempDirectory("graft_blob_").toString
    spark.conf.set("spark.sql.catalog.graftblob", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftblob.root", d)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftblob.q")
    d
  }

  private def mkBloomTable(name: String): Path = {
    rootDir
    spark.sql(s"DROP TABLE IF EXISTS graftblob.q.$name")
    spark.sql(s"""CREATE TABLE graftblob.q.$name (id BIGINT, s STRING)
                  TBLPROPERTIES ('bloom.columns'='id', 'ndv.columns'='id')""")
    (1L to 300L).map(i => (i, s"s$i")).toDF("id", "s")
      .repartition(3).writeTo(s"graftblob.q.$name").append()
    Paths.get(rootDir, "q", name)
  }

  test("payloads land in sidecars; the manifest keeps only @slot refs") {
    val dir = mkBloomTable("t1")
    val m = Manifest.read(dir).get
    assert(m.entries.nonEmpty)
    m.entries.foreach { e =>
      // refs in the line, payloads out of it
      assert(e.stats.bloomRefs.get("id").exists(_.startsWith("@")),
        s"${e.name}: bloom ref should be a @slot pointer")
      assert(e.stats.ndvRefs.get("id").exists(_.startsWith("@")))
      val blobs = e.blobsFile.getOrElse(fail(s"${e.name}: no sidecar recorded"))
      assert(Files.exists(dir.resolve(blobs)), s"sidecar $blobs missing")
      // the rendered stats line is small — payload-free
      assert(e.renderStats.length < 512,
        s"stats line should be list-sized, got ${e.renderStats.length} chars")
      // and the resolved view still yields the payload
      assert(e.stats.blooms("id").length > 100, "payload must resolve via sidecar")
    }
    // pruning still works end-to-end: a point probe plans a strict subset
    val probed = spark.read.format(Fmt).option("path", dir.toString).load()
      .filter($"id" === 7L)
    assert(probed.collect().map(_.getLong(0)).toSeq == Seq(7L))
  }

  test("RENAME COLUMN keeps sidecar pruning without touching any sidecar") {
    val dir = mkBloomTable("t2")
    val sidecars = Manifest.read(dir).get.entries.flatMap(_.blobsFile)
    val mtimes = sidecars.map(b => b -> Files.getLastModifiedTime(dir.resolve(b)))
    spark.sql("ALTER TABLE graftblob.q.t2 RENAME COLUMN id TO key")
    // refs followed the rename; sidecars untouched (metadata-only)
    val m2 = Manifest.read(dir).get
    assert(m2.entries.forall(_.stats.bloomRefs.contains("key")))
    assert(m2.entries.forall(e => e.stats.blooms("key").length > 100))
    mtimes.foreach { case (b, t) =>
      assert(Files.getLastModifiedTime(dir.resolve(b)) == t,
        s"rename must not rewrite sidecar $b")
    }
    assert(spark.table("graftblob.q.t2").where("key = 9").count() == 1L)
  }

  test("VACUUM keeps referenced sidecars and reaps orphaned ones") {
    val dir = mkBloomTable("t3")
    val live = Manifest.read(dir).get.entries.flatMap(_.blobsFile)
    // plant an orphan sidecar (referenced by no manifest version)
    val orphan = dir.resolve("blobs-part-orphan.tsv")
    Files.writeString(orphan, "0\tAAAA")
    spark.conf.set("spark.graft.vacuum.stagingMinAgeMs", "0")
    try spark.sql(s"VACUUM MANIFEST '${dir}' RETAIN 1 SNAPSHOTS").collect()
    finally spark.conf.unset("spark.graft.vacuum.stagingMinAgeMs")
    assert(!Files.exists(orphan), "orphan sidecar must be reaped")
    live.foreach(b => assert(Files.exists(dir.resolve(b)),
      s"live sidecar $b must survive vacuum"))
    assert(spark.table("graftblob.q.t3").where("id = 5").count() == 1L)
  }

  test("copy-on-write DELETE carries sidecars; shallow clones resolve them") {
    val dir = mkBloomTable("t4")
    // every file spans the whole id range (round-robin partitioning), so a
    // mid-range predicate CUTS all of them → copy-on-write rewrite
    spark.sql("DELETE FROM graftblob.q.t4 WHERE id BETWEEN 51 AND 200")
    val m = Manifest.read(dir).get
    // the rewritten files have fresh sidecars of their own
    assert(m.entries.forall(e => e.blobsFile.isDefined &&
      Files.exists(dir.resolve(e.blobsFile.get))))
    assert(m.entries.forall(_.stats.blooms("id").length > 100))
    assert(spark.table("graftblob.q.t4").count() == 150L)

    // a shallow clone resolves the source's sidecars through the chain
    spark.sql("CREATE TABLE graftblob.q.t4c SHALLOW CLONE graftblob.q.t4")
    val cdir = Paths.get(rootDir, "q", "t4c")
    val cm = Manifest.read(cdir).get
    assert(cm.entries.forall(e => !Files.exists(cdir.resolve(e.name))),
      "clone holds no data files of its own")
    assert(cm.entries.forall(_.stats.blooms("id").length > 100),
      "clone must resolve blooms through the clone chain")
    assert(spark.table("graftblob.q.t4c").where("id = 7").count() == 1L)
  }

  test("legacy inline base64 stats still parse and prune") {
    val b = new FileBloom.Builder
    (0 until 100).foreach(i => b.add(FileBloom.hashLong(i.toLong)))
    val bloom = b.result().get
    val st = ColumnStats.parse(s"id=0,99%id=$bloom")
    assert(st.blooms("id") == bloom && st.bloomRefs("id") == bloom)
    assert(st.blobsName.isEmpty)
  }
}
