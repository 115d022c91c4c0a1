package graft.sources

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import graft.SparkSuite

/** The manifest tree: entries live in immutable `seg-*.list` files and the
  * root holds one ref per segment — commits write O(new entries +
  * #segments), snapshots share segments by reference, and segment count
  * stays bounded by periodic coalescing. */
class ManifestTreeSpec extends SparkSuite {
  import spark.implicits._

  private val Fmt = "graft.sources.GraftManifestSink"

  private def freshDir(): String =
    Files.createTempDirectory("graft_tree_").toString

  private def append(dir: String, lo: Long, hi: Long): Unit =
    (lo until hi).map(i => (i, i * 1.0)).toDF("id", "v").coalesce(1)
      .write.format(Fmt).option("path", dir).mode("append").save()

  private def segNames(dir: String): Seq[String] =
    Manifest.read(Paths.get(dir)).get.segments.map(_._1)

  test("an append reuses prior segments untouched and adds one new segment") {
    val dir = freshDir()
    append(dir, 0, 1000)
    val s1 = segNames(dir)
    assert(s1.length == 1)
    val mtime1 = Files.getLastModifiedTime(Paths.get(dir, s1.head))

    append(dir, 1000, 1001) // a 1-row append to a 1000-row table
    val s2 = segNames(dir)
    assert(s2.length == 2 && s2.head == s1.head,
      s"prior segment must be reused by reference: $s1 -> $s2")
    assert(Files.getLastModifiedTime(Paths.get(dir, s1.head)) == mtime1,
      "the reused segment file must not be rewritten")
    // the new segment holds ONLY the appended entry
    assert(Manifest.read(Paths.get(dir)).get.segments.last._2.length == 1)
    // the root is list-of-segments-sized, not list-of-entries-sized
    assert(Files.size(Paths.get(dir, "_manifest")) < 512,
      "root must hold refs, not entry lines")
    // entries stay in commit order and reads see everything
    val m = Manifest.read(Paths.get(dir)).get
    assert(m.entries.length == 2 && m.entries.last.rows == 1L)
    assert(spark.read.format(Fmt).option("path", dir).load().count() == 1001L)
  }

  test("archived snapshots share segments by reference") {
    val dir = freshDir()
    append(dir, 0, 100)
    append(dir, 100, 200)
    val cur = segNames(dir).toSet
    // the previous version's root references a SUBSET of the same segments
    val v1 = Manifest.readSnapshot(Paths.get(dir), 1).get.segments.map(_._1).toSet
    assert(v1.nonEmpty && v1.subsetOf(cur),
      s"snapshot must share segment files with the current root: $v1 vs $cur")
    // time travel still reads the old state
    assert(spark.read.format(Fmt).option("path", dir)
      .option("snapshot", "1").load().count() == 100L)
  }

  test("segment count stays bounded under many commits (log-structured merge)") {
    val dir = freshDir()
    (0 until 70).foreach(i => append(dir, i * 10L, i * 10L + 10L))
    val segs = segNames(dir)
    assert(segs.length <= 64, s"segments must compact, got ${segs.length}")
    // compaction merges the order-contiguous back half: entry order (=
    // commit order) survives, and no row is lost or duplicated
    val m = Manifest.read(Paths.get(dir)).get
    assert(m.entries.length == 70)
    assert(m.entries.head.stats.ranges("id")._1 == BigDecimal(0))
    assert(m.entries.last.stats.ranges("id")._2 == BigDecimal(699))
    assert(spark.read.format(Fmt).option("path", dir).load().count() == 700L)
  }

  test("VACUUM keeps referenced segments and reaps orphans") {
    val dir = freshDir()
    append(dir, 0, 50)
    append(dir, 50, 100)
    val live = segNames(dir)
    val orphan = Paths.get(dir, "seg-v99-orphan.list")
    Files.writeString(orphan, "part-ghost.tsv\t1")
    spark.conf.set("spark.graft.vacuum.stagingMinAgeMs", "0")
    try spark.sql(s"VACUUM MANIFEST '$dir' RETAIN 1 SNAPSHOTS").collect()
    finally spark.conf.unset("spark.graft.vacuum.stagingMinAgeMs")
    assert(!Files.exists(orphan), "orphan segment must be reaped")
    live.foreach(s => assert(Files.exists(Paths.get(dir, s)),
      s"referenced segment $s must survive vacuum"))
    assert(spark.read.format(Fmt).option("path", dir).load().count() == 100L)
  }

  test("the segment cache makes repeat reads parse nothing") {
    val dir = freshDir()
    append(dir, 0, 500)
    Manifest.clearReadCache()
    spark.read.format(Fmt).option("path", dir).load().count()
    val p0 = Manifest.segParseCount.get()
    // a second read of the unchanged table re-parses no segment; drop the
    // ROOT cache so the claim is about the segment tier specifically
    (0 until 3).foreach { _ =>
      Manifest.readSnapshot(Paths.get(dir), 1) // forces root re-assembly
      spark.read.format(Fmt).option("path", dir).load()
        .queryExecution.executedPlan
    }
    assert(Manifest.segParseCount.get() == p0,
      "unchanged segments must be served from cache")
  }

  test("a shallow clone re-publishes segment refs with zero entry I/O") {
    val root = Files.createTempDirectory("graft_tree_cat_").toString
    spark.conf.set("spark.sql.catalog.gtree", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gtree.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtree.q")
    spark.sql("CREATE TABLE gtree.q.src (id BIGINT, v DOUBLE)")
    val src = Paths.get(root, "q", "src").toString
    (0L until 2000L).map(i => (i, i * 1.0)).toDF("id", "v").coalesce(1)
      .writeTo("gtree.q.src").append()
    (2000L until 2100L).map(i => (i, i * 1.0)).toDF("id", "v").coalesce(1)
      .writeTo("gtree.q.src").append()
    val srcSegs = segNames(src).toSet
    assert(srcSegs.size == 2)
    spark.sql("CREATE TABLE gtree.q.clone SHALLOW CLONE gtree.q.src")

    val cdir = Paths.get(root, "q", "clone")
    val cm = Manifest.read(cdir).get
    // the clone's root references the SOURCE's segments by name — no
    // segment (and no data) file was copied into the clone directory
    assert(cm.segments.map(_._1).toSet == srcSegs)
    val s = Files.list(cdir)
    try assert(!s.iterator().asScala.exists(p =>
      p.getFileName.toString.startsWith("seg-") ||
        p.getFileName.toString.startsWith("part-")),
      "cloning must copy no segment or data files")
    finally s.close()
    // and reads resolve entries + data through the clone chain
    assert(spark.table("gtree.q.clone").count() == 2100L)

    // REGRESSION (segment name collision): the clone's version numbering
    // restarts at 1, so its first local commit used to write a segment
    // named like one of the SOURCE's — and the chain resolution prefers
    // the local dir, silently swapping the source segment's entries for
    // the new commit's. Random name components de-collide; every row of
    // both lineages must survive a clone-local append.
    (9000L until 9010L).map(i => (i, 0.0)).toDF("id", "v").coalesce(1)
      .writeTo("gtree.q.clone").append()
    val cm2 = Manifest.read(cdir).get
    assert(cm2.entries.length == 3, cm2.entries.map(_.name).mkString(", "))
    assert(srcSegs.subsetOf(cm2.segments.map(_._1).toSet),
      "source segments must stay referenced after a clone-local commit")
    assert(spark.table("gtree.q.clone").count() == 2110L)
    assert(spark.sql("SELECT sum(id) FROM gtree.q.clone").head().getLong(0) ==
      (0L until 2100L).sum + (9000L until 9010L).sum)
    assert(spark.table("gtree.q.src").count() == 2100L)
  }

  test("legacy inline-entry manifests still read and upgrade on next commit") {
    val dir = freshDir()
    val schema = Seq((1L, 1.0)).toDF("id", "v").schema
    // hand-write a legacy manifest with an inline entry line
    append(dir, 0, 10)
    val seg = Paths.get(dir, segNames(dir).head)
    val entryLines = Files.readAllLines(seg)
    val root = Paths.get(dir, "_manifest")
    val rootLines = Files.readAllLines(root)
    Files.writeString(root,
      (rootLines.get(0) +: entryLines.toArray.toSeq).mkString("\n"))
    // legacy shape (no refs) reads identically
    val m = Manifest.read(Paths.get(dir)).get
    assert(m.segments.isEmpty && m.entries.length == 1)
    assert(spark.read.format(Fmt).option("path", dir).load().count() == 10L)
    // and the next commit re-segments it
    append(dir, 10, 20)
    assert(segNames(dir).nonEmpty)
    assert(spark.read.format(Fmt).option("path", dir).load().count() == 20L)
  }
}
