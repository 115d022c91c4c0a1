package graft.sources

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import graft.SparkSuite

/** The V2 catalog must make manifest tables SQL-addressable end-to-end:
  * CREATE / INSERT (through the sink's atomic commit) / SELECT / RENAME /
  * DROP, with manifest-invisible files staying invisible by name too. */
class GraftCatalogSpec extends SparkSuite {
  import spark.implicits._

  private lazy val rootDir = {
    val d = Files.createTempDirectory("graft_catalog_").toString
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftcat.root", d)
    d
  }

  test("CREATE / INSERT / SELECT round-trips through the catalog by name") {
    rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.corpus")
    spark.sql("CREATE TABLE graftcat.corpus.docs (doc_id BIGINT, body STRING)")
    // created-but-unwritten: schema visible, zero rows
    assert(spark.table("graftcat.corpus.docs").count() == 0L)
    assert(spark.table("graftcat.corpus.docs").schema.fieldNames.toSeq ==
      Seq("doc_id", "body"))

    Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("doc_id", "body")
      .writeTo("graftcat.corpus.docs").append()
    val got = spark.sql("SELECT doc_id, body FROM graftcat.corpus.docs ORDER BY doc_id")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")))

    // second INSERT appends through a second manifest commit
    spark.sql("INSERT INTO graftcat.corpus.docs VALUES (4, 'delta')")
    assert(spark.table("graftcat.corpus.docs").count() == 4L)

    // SHOW TABLES sees it; a bare directory without a manifest is invisible
    Files.createDirectories(Paths.get(rootDir, "corpus", "not_a_table"))
    val listed = spark.sql("SHOW TABLES IN graftcat.corpus")
      .select("tableName").as[String].collect().toSet
    assert(listed.contains("docs") && !listed.contains("not_a_table"))
  }

  test("DELETE drops whole files metadata-only and rewrites cut files copy-on-write") {
    rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.del")
    spark.sql("CREATE TABLE graftcat.del.t (id BIGINT, v DOUBLE)")
    // three single-partition batches → exactly three files with disjoint
    // zone-map ranges (VALUES alone splits one row per partition)
    def batch(ids: Seq[Long]): Unit =
      ids.map(i => (i, i * 1.0)).toDF("id", "v").coalesce(1)
        .writeTo("graftcat.del.t").append()
    batch(Seq(1L, 2L, 3L)); batch(Seq(11L, 12L, 13L)); batch(Seq(21L, 22L, 23L))
    assert(spark.table("graftcat.del.t").count() == 9L)
    val dir = s"$rootDir/del/t"
    def entryNames = Manifest.read(Paths.get(dir)).get.entries.map(_.name)

    // predicate covers file 1's entire [1, 3] range → metadata-only drop:
    // no file is rewritten, the surviving entries keep their names
    val namesBefore = entryNames
    spark.sql("DELETE FROM graftcat.del.t WHERE id < 10")
    assert(spark.table("graftcat.del.t").select("id").as[Long].collect().sorted.toSeq
      == Seq(11L, 12L, 13L, 21L, 22L, 23L))
    assert(entryNames.toSet.subsetOf(namesBefore.toSet), "aligned delete must not rewrite")
    assert(entryNames.length == 2)

    // predicate cuts through file [11, 13] → that ONE file is rewritten
    // copy-on-write; the untouched [21, 23] file keeps its identity
    val beforeCut = entryNames
    spark.sql("DELETE FROM graftcat.del.t WHERE id = 12")
    assert(spark.table("graftcat.del.t").select("id").as[Long].collect().sorted.toSeq
      == Seq(11L, 13L, 21L, 22L, 23L))
    val afterCut = entryNames
    assert(afterCut.length == 2)
    assert(beforeCut.intersect(afterCut).length == 1,
      "the untouched file keeps its identity; the cut file is replaced")

    // a file containing NULLs in the predicate column can never be proven
    // all-matching by its zone map (built from non-null cells) — the
    // rewrite must keep the NULL row, which the predicate does not match
    Seq((Some(31L), 1.0), (Some(32L), 2.0), (None: Option[Long], 3.0))
      .toDF("id", "v").coalesce(1).writeTo("graftcat.del.t").append()
    spark.sql("DELETE FROM graftcat.del.t WHERE id <= 40")
    val survivors = spark.table("graftcat.del.t").select("id")
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    assert(survivors == Seq(None), s"only the NULL row survives, got $survivors")

    // every replaced file stays reachable through the snapshot archived just
    // before its delete (history: create, 3 inserts, del, del, insert, del)
    val snaps = Manifest.snapshotVersions(java.nio.file.Paths.get(dir))
    val before = spark.read.format("graft.sources.GraftManifestSink")
      .option("path", dir).option("snapshot", (snaps.max - 4).toString).load()
    assert(before.count() == 9L)
  }

  test("UPDATE rewrites only the files the predicate can touch") {
    rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.upd")
    spark.sql("CREATE TABLE graftcat.upd.t (id BIGINT, v DOUBLE, tag STRING)")
    def batch(ids: Seq[Long]): Unit =
      ids.map(i => (i, i * 1.0, s"t$i")).toDF("id", "v", "tag").coalesce(1)
        .writeTo("graftcat.upd.t").append()
    batch(Seq(1L, 2L, 3L)); batch(Seq(11L, 12L, 13L)); batch(Seq(21L, 22L, 23L))
    val dir = Paths.get(s"$rootDir/upd/t")
    def entryNames = Manifest.read(dir).get.entries.map(_.name)

    // the predicate's zone-map reading touches only the [11, 13] file; SET
    // reads the OLD row (v and tag both from pre-update values)
    val before = entryNames
    spark.sql("UPDATE graftcat.upd.t SET v = v * 10, tag = concat(tag, '!') " +
      "WHERE id BETWEEN 11 AND 13 AND v < 13.0")
    val after = entryNames
    assert(after.length == 3)
    assert(before.intersect(after).length == 2,
      "the two files the predicate provably misses must keep their identity")
    val got = spark.table("graftcat.upd.t").orderBy("id")
      .as[(Long, Double, String)].collect().toSeq
    assert(got == Seq((1L, 1.0, "t1"), (2L, 2.0, "t2"), (3L, 3.0, "t3"),
      (11L, 110.0, "t11!"), (12L, 120.0, "t12!"), (13L, 13.0, "t13"),
      (21L, 21.0, "t21"), (22L, 22.0, "t22"), (23L, 23.0, "t23")))

    // a NULL predicate keeps the row unchanged (ANSI UPDATE), and the
    // assignment casts to the column's declared type (int literal → double)
    Seq((Some(31L), None: Option[Double], "t31")).toDF("id", "v", "tag")
      .coalesce(1).writeTo("graftcat.upd.t").append()
    spark.sql("UPDATE graftcat.upd.t SET v = 7 WHERE v > 100.0")
    val vs = spark.table("graftcat.upd.t").orderBy("id").select("v")
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    assert(vs == Seq(Some(1.0), Some(2.0), Some(3.0), Some(7.0), Some(7.0),
      Some(13.0), Some(21.0), Some(22.0), Some(23.0), None))
    assert(spark.table("graftcat.upd.t").schema("v").dataType ==
      org.apache.spark.sql.types.DoubleType)

    // pre-update state stays readable through an archived snapshot
    val preUpdate = Seq(1.0, 2.0, 3.0, 11.0, 12.0, 13.0, 21.0, 22.0, 23.0)
    val reachable = Manifest.snapshotVersions(dir).exists { ver =>
      val s = spark.read.format("graft.sources.GraftManifestSink")
        .option("path", dir.toString).option("snapshot", ver.toString).load()
      s.count() == 9L &&
        s.orderBy("id").select("v").as[Double].collect().toSeq == preUpdate
    }
    assert(reachable, "pre-update state must be reachable via time travel")

    // guardrails: unknown SET column and non-manifest targets fail loudly
    intercept[IllegalArgumentException] {
      spark.sql("UPDATE graftcat.upd.t SET nope = 1")
    }
    intercept[IllegalArgumentException] { // ANSI: duplicate assignment
      spark.sql("UPDATE graftcat.upd.t SET v = 1, v = 2")
    }
    spark.range(5).createOrReplaceTempView("plain_view")
    intercept[Exception] { spark.sql("UPDATE plain_view SET id = 1") }
  }

  test("DESCRIBE HISTORY lists every committed snapshot, newest = current") {
    rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.hist")
    spark.sql("CREATE TABLE graftcat.hist.t (id BIGINT)")
    Seq(1L, 2L).toDF("id").coalesce(1).writeTo("graftcat.hist.t").append()
    Seq(3L).toDF("id").coalesce(1).writeTo("graftcat.hist.t").append()
    val h = spark.sql("DESCRIBE HISTORY graftcat.hist.t")
      .as[(Int, Int, Long)].collect().toSeq
    assert(h.map(_._1) == h.map(_._1).sorted, "versions ascending")
    assert(h.last._2 == 2 && h.last._3 == 3L,
      s"newest row must be the current state (2 files, 3 rows): $h")
    assert(h.map(_._3).containsSlice(Seq(2L, 3L)), s"append trail visible: $h")
    spark.range(5).createOrReplaceTempView("plain_view_h")
    intercept[Exception] { spark.sql("DESCRIBE HISTORY plain_view_h") }
  }

  test("OPTIMIZE compacts many small files into one atomic rewrite") {
    rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.opt")
    spark.sql("CREATE TABLE graftcat.opt.t (id BIGINT, v DOUBLE)")
    (0 until 6).foreach { b =>
      Seq((b * 10L, b * 1.0), (b * 10L + 1, b * 1.0)).toDF("id", "v")
        .coalesce(1).writeTo("graftcat.opt.t").append()
    }
    val dir = Paths.get(s"$rootDir/opt/t")
    assert(Manifest.read(dir).get.entries.length == 6)

    val rpt = spark.sql("OPTIMIZE graftcat.opt.t").head()
    assert(rpt.getInt(0) == 6 && rpt.getInt(1) < 6, s"must shrink: $rpt")
    assert(Manifest.read(dir).get.entries.length == rpt.getInt(1))
    // content identical after the rewrite
    assert(spark.table("graftcat.opt.t").select("id").as[Long]
      .collect().sorted.toSeq == (0 until 6).flatMap(b => Seq(b * 10L, b * 10L + 1)))
    // the new entries carry fresh zone maps: an id-ranged SELECT still works
    assert(spark.sql("SELECT count(*) FROM graftcat.opt.t WHERE id >= 50")
      .head().getLong(0) == 2L)
    // pre-compaction layout stays reachable through an archived snapshot
    val sixFileVersion = Manifest.snapshotVersions(dir).filter { v =>
      Manifest.readSnapshot(dir, v).exists(_.entries.length == 6)
    }
    assert(sixFileVersion.nonEmpty, "pre-optimize snapshot must survive")
    // a second OPTIMIZE is a no-op: already at/below the target count
    val again = spark.sql("OPTIMIZE graftcat.opt.t").head()
    assert(again.getInt(0) == again.getInt(1))
  }

  test("OPTIMIZE ZORDER BY clusters so zone maps prune on BOTH dimensions") {
    rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.zo")
    spark.sql("CREATE TABLE graftcat.zo.grid (d1 BIGINT, d2 BIGINT)")
    // a 64×64 grid in ROW-MAJOR order: a plain sort/write clusters d1 only
    val grid = spark.range(0, 64L * 64)
      .selectExpr("id DIV 64 AS d1", "id % 64 AS d2")
    grid.repartitionByRange(8, $"d1").writeTo("graftcat.zo.grid").append()
    val dir = Paths.get(s"$rootDir/zo/grid")
    def entries = Manifest.read(dir).get.entries
    // before: d1-sorted layout → every file spans the full d2 range
    def filesOverlapping(c: String, v: Long) = entries.count { e =>
      e.stats.ranges.get(c).forall { case (lo, hi) => lo <= v && v <= hi }
    }
    assert(filesOverlapping("d2", 5L) == entries.length,
      "row-major layout cannot prune on d2")

    spark.sql("OPTIMIZE graftcat.zo.grid TARGET 4096 BYTES ZORDER BY (d1, d2)")
    assert(entries.length > 1, "target must yield multiple files")
    // after: a point predicate on EITHER dimension misses most files
    assert(filesOverlapping("d1", 5L) < entries.length,
      s"d1 must prune after zorder: ${entries.map(_.stats.ranges.get("d1"))}")
    assert(filesOverlapping("d2", 5L) < entries.length,
      s"d2 must prune after zorder: ${entries.map(_.stats.ranges.get("d2"))}")
    // content survives the clustered rewrite
    assert(spark.table("graftcat.zo.grid").count() == 64L * 64)
    assert(spark.sql(
      "SELECT count(*) FROM graftcat.zo.grid WHERE d1 = 5 AND d2 = 5")
      .head().getLong(0) == 1L)
    // STRING columns cluster too (r10): the first-7-byte key is monotone
    // in UTF8_BINARY order, so after the rewrite a point predicate on the
    // string dimension prunes through the string zone maps
    spark.sql("CREATE TABLE graftcat.zo.s (k STRING, v BIGINT)")
    (0 until 32).flatMap(i => (0L until 32L).map(v =>
        (f"key$i%02d", v)))
      .toDF("k", "v").repartition(8) // hash-random: no dimension pruned
      .writeTo("graftcat.zo.s").append()
    spark.sql("OPTIMIZE graftcat.zo.s TARGET 2048 BYTES ZORDER BY (k, v)")
    val sDir = Paths.get(s"$rootDir/zo/s")
    val sEntries = Manifest.read(sDir).get.entries
    assert(sEntries.length > 2, "the string grid must stay multi-file")
    val probe = "key07".getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sOverlap = sEntries.count { e =>
      e.stats.strRanges.get("k").forall { case (lo, hi) =>
        ColumnStats.cmpBytes(probe, ColumnStats.unb64(lo)) >= 0 &&
          ColumnStats.cmpBytes(probe, ColumnStats.unb64(hi)) <= 0
      }
    }
    assert(sOverlap < sEntries.length,
      s"the string dimension must prune after zorder ($sOverlap/${sEntries.length})")
    assert(spark.table("graftcat.zo.s").count() == 32L * 32)
    assert(spark.sql(
      "SELECT count(*) FROM graftcat.zo.s WHERE k = 'key07' AND v = 5")
      .head().getLong(0) == 1L)
    // ONE-column ZORDER (r10) degenerates to plain range clustering —
    // same pruning contract on the single dimension, content intact
    spark.sql("OPTIMIZE graftcat.zo.s TARGET 2048 BYTES ZORDER BY (v)")
    val vEntries = Manifest.read(sDir).get.entries
    val vOverlap = vEntries.count(e =>
      e.stats.ranges.get("v").forall { case (lo, hi) =>
        lo <= BigDecimal(5) && BigDecimal(5) <= hi })
    assert(vOverlap < vEntries.length,
      s"single-column clustering must prune v ($vOverlap/${vEntries.length})")
    assert(spark.table("graftcat.zo.s").count() == 32L * 32)

    // THREE-dimensional clustering: zorder3 (21 bits/dim) must prune on
    // every one of the three columns after the rewrite
    spark.sql("CREATE TABLE graftcat.zo.g3 (a BIGINT, b BIGINT, c BIGINT)")
    spark.range(0, 16L * 16 * 16)
      .selectExpr("id DIV 256 AS a", "(id DIV 16) % 16 AS b", "id % 16 AS c")
      .repartitionByRange(8, $"a").writeTo("graftcat.zo.g3").append()
    val dir3 = Paths.get(s"$rootDir/zo/g3")
    def entries3 = Manifest.read(dir3).get.entries
    def overlapping3(col: String, v: Long) = entries3.count { e =>
      e.stats.ranges.get(col).forall { case (lo, hi) => lo <= v && v <= hi }
    }
    assert(overlapping3("c", 3L) == entries3.length,
      "row-major layout cannot prune on the innermost dimension")
    spark.sql("OPTIMIZE graftcat.zo.g3 TARGET 2048 BYTES ZORDER BY (a, b, c)")
    assert(entries3.length > 1)
    Seq("a", "b", "c").foreach { cn =>
      assert(overlapping3(cn, 3L) < entries3.length,
        s"$cn must prune after 3-D zorder: ${entries3.map(_.stats.ranges.get(cn))}")
    }
    assert(spark.table("graftcat.zo.g3").count() == 16L * 16 * 16)
    assert(spark.sql(
      "SELECT count(*) FROM graftcat.zo.g3 WHERE a = 3 AND b = 3 AND c = 3")
      .head().getLong(0) == 1L)
    // timestamps cluster through the zone maps' own epoch-micros encoding
    spark.sql("CREATE TABLE graftcat.zo.ts (ts TIMESTAMP, v BIGINT)")
    spark.range(0, 512)
      .selectExpr("timestamp_micros(1700000000000000 + id * 60000000) AS ts",
        "id % 64 AS v")
      .writeTo("graftcat.zo.ts").append()
    spark.sql("OPTIMIZE graftcat.zo.ts TARGET 2048 BYTES ZORDER BY (ts, v)")
    assert(spark.table("graftcat.zo.ts").count() == 512L)
    val tsEntries = Manifest.read(Paths.get(s"$rootDir/zo/ts")).get.entries
      .filter(_.rows > 0)
    assert(tsEntries.length > 1)
    // clustered layout: a one-hour ts window misses most files
    val probeMicros = BigDecimal(1700000000000000L + 256L * 60000000L)
    val tsOverlap = tsEntries.count { e =>
      e.stats.ranges.get("ts").forall { case (lo, hi) =>
        lo <= probeMicros && probeMicros <= hi
      }
    }
    assert(tsOverlap < tsEntries.length,
      s"ts must prune after zorder: $tsOverlap/${tsEntries.length}")
  }

  test("change-data-feed reads: files added between snapshots, and a streaming source") {
    rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.cdf")
    spark.sql("CREATE TABLE graftcat.cdf.t (id BIGINT)")
    val dir = s"$rootDir/cdf/t"
    def version = Manifest.snapshotVersions(Paths.get(dir)).last
    Seq(1L, 2L).toDF("id").coalesce(1).writeTo("graftcat.cdf.t").append()
    val v1 = version
    Seq(3L, 4L).toDF("id").coalesce(1).writeTo("graftcat.cdf.t").append()
    Seq(5L).toDF("id").coalesce(1).writeTo("graftcat.cdf.t").append()
    val v3 = version

    // batch CDF: only the rows committed after v1 (up to v3)
    val changed = spark.read.format("graft.sources.GraftManifestSink")
      .option("path", dir).option("changesFrom", v1.toString)
      .option("changesTo", v3.toString).load()
      .select("id").as[Long].collect().sorted.toSeq
    assert(changed == Seq(3L, 4L, 5L))
    // changesFrom 0 = everything
    assert(spark.read.format("graft.sources.GraftManifestSink")
      .option("path", dir).option("changesFrom", "0").load().count() == 5L)

    // streaming source, full manifest→manifest loop: readStream from the
    // source table, writeStream into ANOTHER manifest table, AvailableNow
    val ckpt = Files.createTempDirectory("graft_cdf_ckpt_").toString
    val outDir = Files.createTempDirectory("graft_cdf_out_").toString
    def drain(): Unit = {
      val q = spark.readStream.format("graft.sources.GraftManifestSink")
        .option("path", dir).load()
        .writeStream.format("graft.sources.GraftManifestSink")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(60000); ()
    }
    def sunk = spark.read.format("graft.sources.GraftManifestSink")
      .option("path", outDir).load().as[Long].collect().sorted.toSeq
    drain()
    assert(sunk == Seq(1L, 2L, 3L, 4L, 5L))
    // a resumed pass from the SAME checkpoint ships only the new commit —
    // no duplicates of the already-delivered rows
    Seq(6L, 7L).toDF("id").coalesce(1).writeTo("graftcat.cdf.t").append()
    drain()
    assert(sunk == Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L),
      "resume must replay ONLY the commits after the checkpointed version")
  }

  test("RESTORE TABLE rolls back to an archived snapshot, and is itself undoable") {
    rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.rst")
    spark.sql("CREATE TABLE graftcat.rst.t (id BIGINT)")
    Seq(1L, 2L).toDF("id").coalesce(1).writeTo("graftcat.rst.t").append()
    Seq(3L).toDF("id").coalesce(1).writeTo("graftcat.rst.t").append()
    val dir = Paths.get(s"$rootDir/rst/t")
    val preDelete = Manifest.snapshotVersions(dir).last
    spark.sql("DELETE FROM graftcat.rst.t WHERE id >= 1")
    assert(spark.table("graftcat.rst.t").count() == 0L)

    val rpt = spark.sql(s"RESTORE TABLE graftcat.rst.t TO VERSION AS OF $preDelete").head()
    assert(rpt.getInt(0) == 2 && rpt.getLong(1) == 3L)
    assert(spark.table("graftcat.rst.t").select("id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L, 3L))
    // the restore archived the pre-restore (empty) state — roll forward to it
    val preRestore = Manifest.snapshotVersions(dir).dropRight(1).last
    spark.sql(s"RESTORE TABLE graftcat.rst.t TO VERSION AS OF $preRestore")
    assert(spark.table("graftcat.rst.t").count() == 0L)
    // a version that never existed fails loudly
    intercept[IllegalArgumentException] {
      spark.sql("RESTORE TABLE graftcat.rst.t TO VERSION AS OF 9999")
    }

    // TIMESTAMP AS OF (r10): restore to the newest snapshot committed at
    // or before a wall-clock instant — resolve "now" (all snapshots are
    // in the past) back to the just-restored empty state, then pin the
    // resolved version in the report
    val rts = spark.sql("RESTORE TABLE graftcat.rst.t TO TIMESTAMP AS OF " +
      "'2099-01-01 00:00:00'").head()
    assert(rts.getInt(0) == Manifest.snapshotVersions(dir).dropRight(1).last)
    // a pre-creation timestamp finds nothing
    intercept[IllegalArgumentException] {
      spark.sql("RESTORE TABLE graftcat.rst.t TO TIMESTAMP AS OF " +
        "'1999-01-01 00:00:00'")
    }
    // an unparseable literal fails in RESTORE terms
    intercept[IllegalArgumentException] {
      spark.sql("RESTORE TABLE graftcat.rst.t TO TIMESTAMP AS OF 'nonsense'")
    }
  }

  test("plain OPTIMIZE bin-packs: at-target files stay untouched by name") {
    rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.bp")
    spark.sql("CREATE TABLE graftcat.bp.t (id BIGINT, pad STRING)")
    // one LARGE file (well over the target) and a trail of small ones
    (1L to 600L).map(i => (i, "x" * 50)).toDF("id", "pad").coalesce(1)
      .writeTo("graftcat.bp.t").append()
    (1 to 4).foreach { c =>
      Seq((10000L + c, "y")).toDF("id", "pad").coalesce(1)
        .writeTo("graftcat.bp.t").append()
    }
    val dir = Paths.get(s"$rootDir/bp/t")
    val before = Manifest.read(dir).get.entries
    val large = before.maxBy(_.rows).name
    spark.sql("OPTIMIZE graftcat.bp.t TARGET 8192 BYTES")
    val after = Manifest.read(dir).get.entries
    assert(after.map(_.name).contains(large),
      "the at-target file must keep its identity — compacting stragglers " +
        "must never rewrite the 100 TB bulk")
    assert(after.length < before.length, "the small files must merge")
    assert(spark.table("graftcat.bp.t").count() == 604)
  }

  test("VACUUM DRY RUN reports exactly the real pass's reap set, deletes nothing") {
    rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.vdr")
    spark.sql("CREATE TABLE graftcat.vdr.t (id BIGINT)")
    Seq(1L, 2L).toDF("id").coalesce(1).writeTo("graftcat.vdr.t").append()
    spark.sql("DELETE FROM graftcat.vdr.t WHERE id = 1") // superseded file
    val dir = Paths.get(s"$rootDir/vdr/t")
    def listDir(): Set[String] = {
      val st = Files.list(dir)
      try st.iterator().asScala.map(_.toString).toSet
      finally st.close()
    }
    val filesBefore = listDir()
    spark.conf.set("spark.graft.vacuum.stagingMinAgeMs", "0")
    try {
      val dry = spark.sql("VACUUM graftcat.vdr.t RETAIN 1 SNAPSHOTS DRY RUN")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(dry.nonEmpty, "the superseded snapshot chain must report")
      // nothing deleted
      assert(listDir() == filesBefore)
      assert(spark.table("graftcat.vdr.t").count() == 1)
      // the real pass reaps exactly the reported set
      val real = spark.sql("VACUUM graftcat.vdr.t RETAIN 1 SNAPSHOTS")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(real == dry, s"dry run must preview the real pass:\n$dry\nvs\n$real")
      assert(spark.table("graftcat.vdr.t").count() == 1)
    } finally spark.conf.unset("spark.graft.vacuum.stagingMinAgeMs")
  }

  test("concurrent appends all land: the commit lock serializes the manifest RMW") {
    rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.cc")
    spark.sql("CREATE TABLE graftcat.cc.t (id BIGINT)")
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    // 8 append jobs race the read-modify-write; before the lock, losers'
    // entries were silently dropped from the manifest (their files left as
    // vacuum-able orphans)
    val futs = (0 until 8).map { t =>
      Future {
        spark.range(t * 100L, t * 100L + 10).toDF("id")
          .coalesce(1).writeTo("graftcat.cc.t").append()
      }
    }
    Await.result(Future.sequence(futs), 180.seconds)
    val ids = spark.table("graftcat.cc.t").select("id").as[Long]
      .collect().sorted.toSeq
    assert(ids == (0 until 8).flatMap(t => t * 100 until t * 100 + 10)
      .map(_.toLong).sorted.toSeq,
      s"every concurrent append must be published (got ${ids.length}/80 rows)")
  }

  test("CommitLock is pluggable: injected impl serializes the same racing appends") {
    rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.cc2")
    spark.sql("DROP TABLE IF EXISTS graftcat.cc2.t")
    spark.sql("CREATE TABLE graftcat.cc2.t (id BIGINT)")
    // a delegating impl that PROVES exclusion: a CAS-guarded critical
    // section (any overlap → flag) around the default file lock — the
    // shape an object-store conditional-put impl would take
    val overlapped = new java.util.concurrent.atomic.AtomicBoolean(false)
    val inside = new java.util.concurrent.atomic.AtomicInteger(0)
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val counting = new CommitLock {
      def withLock[T](dir: java.nio.file.Path)(body: => T): T =
        LocalFileCommitLock.withLock(dir) {
          calls.incrementAndGet()
          if (inside.incrementAndGet() != 1) overlapped.set(true)
          try body finally inside.decrementAndGet()
        }
    }
    val prev = ManifestLock.install(counting)
    try {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration._
      implicit val ec: ExecutionContext = ExecutionContext.global
      val futs = (0 until 8).map { t =>
        Future {
          spark.range(t * 100L, t * 100L + 10).toDF("id")
            .coalesce(1).writeTo("graftcat.cc2.t").append()
        }
      }
      Await.result(Future.sequence(futs), 180.seconds)
    } finally ManifestLock.install(prev)
    assert(spark.table("graftcat.cc2.t").count() == 80L,
      "every concurrent append must publish through the injected lock")
    assert(calls.get() >= 8, s"injected lock must see every commit (saw ${calls.get()})")
    assert(!overlapped.get(), "no two commits may overlap inside the lock")
  }

  test("ALTER TABLE ADD COLUMN widens metadata-only: old files NULL-fill, snapshots keep the old schema") {
    rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.evo")
    spark.sql("CREATE TABLE graftcat.evo.t (id BIGINT, name STRING)")
    spark.sql("INSERT INTO graftcat.evo.t VALUES (1, 'alpha'), (2, 'beta')")
    val preAlterFiles = Manifest.read(Paths.get(rootDir, "evo", "t")).get.entries

    spark.sql("ALTER TABLE graftcat.evo.t ADD COLUMN score DOUBLE")
    assert(spark.table("graftcat.evo.t").schema.fieldNames.toSeq ==
      Seq("id", "name", "score"))
    // no data file was rewritten — same entries, narrower widths
    val postAlter = Manifest.read(Paths.get(rootDir, "evo", "t")).get
    assert(postAlter.entries.map(_.name) == preAlterFiles.map(_.name))
    assert(postAlter.entries.forall(_.cols == 2))

    spark.sql("INSERT INTO graftcat.evo.t VALUES (3, 'gamma', 3.5)")
    val got = spark.sql(
      "SELECT id, name, score FROM graftcat.evo.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    // pre-alter rows NULL-fill the new column; the new row carries its value
    assert(got == Seq((1L, "alpha", None), (2L, "beta", None),
      (3L, "gamma", Some(3.5))))
    // the new column participates in filters (NULL never matches)
    assert(spark.sql(
      "SELECT id FROM graftcat.evo.t WHERE score > 1.0").collect()
      .map(_.getLong(0)).toSeq == Seq(3L))

    // the pre-alter snapshot still reads under the OLD schema
    val dir = s"$rootDir/evo/t"
    val snaps = Manifest.snapshotVersions(Paths.get(dir))
    val old = spark.read.format("graft.sources.GraftManifestSink")
      .option("path", dir).option("snapshot", (snaps.max - 2).toString).load()
    assert(old.schema.fieldNames.toSeq == Seq("id", "name"))
    assert(old.count() == 2L)

    // everything that would need a rewrite is rejected explicitly
    // (DROP COLUMN is now metadata-only — its own dedicated test below)
    intercept[Exception] {
      spark.sql("ALTER TABLE graftcat.evo.t ALTER COLUMN id TYPE INT") }
    intercept[Exception] {
      spark.sql("ALTER TABLE graftcat.evo.t ADD COLUMN dup DOUBLE NOT NULL") }
    intercept[Exception] { // duplicate name
      spark.sql("ALTER TABLE graftcat.evo.t ADD COLUMN name STRING") }
    // table unchanged by the rejected alters
    assert(spark.table("graftcat.evo.t").schema.length == 3)
    assert(spark.table("graftcat.evo.t").count() == 3L)
  }

  test("ALTER TABLE RENAME COLUMN is metadata-only: stats, partitioning and blooms follow") {
    rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.ren")
    spark.sql("DROP TABLE IF EXISTS graftcat.ren.t")
    Seq((1L, 1.0, "a"), (2L, 2.0, "b"), (3L, 3.0, "c")).toDF("k", "v", "s")
      .writeTo("graftcat.ren.t")
      .partitionedBy(org.apache.spark.sql.functions.col("s"))
      .tableProperty("bloom.columns", "k")
      .create()
    val dir = Paths.get(rootDir, "ren", "t")
    val preFiles = Manifest.read(dir).get.entries.map(_.name)

    spark.sql("ALTER TABLE graftcat.ren.t RENAME COLUMN v TO val")
    // schema renamed in place, no data file touched
    assert(spark.table("graftcat.ren.t").schema.fieldNames.toSeq ==
      Seq("k", "val", "s"))
    assert(Manifest.read(dir).get.entries.map(_.name) == preFiles)
    // data reads back identically (positional TSV binding)
    assert(spark.sql("SELECT k, val FROM graftcat.ren.t WHERE val > 1.5 ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((2L, 2.0), (3L, 3.0)))
    // zone-map stats follow the rename: ranges keyed under the new name
    val renamed = Manifest.read(dir).get
    assert(renamed.entries.exists(_.stats.ranges.contains("val")))
    assert(renamed.entries.forall(!_.stats.ranges.contains("v")))

    // the partitioning contract and bloom config follow their columns
    spark.sql("ALTER TABLE graftcat.ren.t RENAME COLUMN s TO src")
    assert(Manifest.partitionCols(dir) == Seq("src"))
    spark.sql("ALTER TABLE graftcat.ren.t RENAME COLUMN k TO kk")
    assert(Manifest.bloomCols(dir) == Seq("kk"))
    // a write AFTER the renames still lands (partition contract resolves)
    spark.sql("INSERT INTO graftcat.ren.t VALUES (4, 4.0, 'd')")
    assert(spark.table("graftcat.ren.t").count() == 4L)

    // the pre-rename snapshot still reads under the OLD names
    val snaps = Manifest.snapshotVersions(dir)
    val old = spark.read.format("graft.sources.GraftManifestSink")
      .option("path", dir.toString).option("snapshot", snaps.min.toString).load()
    assert(old.schema.fieldNames.toSeq == Seq("k", "v", "s"))

    // collisions and unknown columns are rejected
    intercept[Exception] {
      spark.sql("ALTER TABLE graftcat.ren.t RENAME COLUMN kk TO val") }
    intercept[Exception] {
      spark.sql("ALTER TABLE graftcat.ren.t RENAME COLUMN nope TO x") }
    // renaming a column referenced by a stored CHECK is refused — the
    // constraint's SQL text would never bind again
    spark.sql("ALTER TABLE graftcat.ren.t SET TBLPROPERTIES ('check.pos' = 'val >= 0')")
    val guarded = intercept[Exception] {
      spark.sql("ALTER TABLE graftcat.ren.t RENAME COLUMN val TO v2") }
    assert(guarded.getMessage.contains("check.pos"), guarded.getMessage)
    spark.sql("ALTER TABLE graftcat.ren.t UNSET TBLPROPERTIES ('check.pos')")
    spark.sql("ALTER TABLE graftcat.ren.t RENAME COLUMN val TO v2")
    assert(spark.table("graftcat.ren.t").schema.fieldNames.toSeq ==
      Seq("kk", "v2", "src"))
  }

  test("SHALLOW CLONE is metadata-only; the clone diverges copy-on-write") {
    rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.cl")
    spark.sql("DROP TABLE IF EXISTS graftcat.cl.src")
    spark.sql("DROP TABLE IF EXISTS graftcat.cl.dev")
    spark.sql("CREATE TABLE graftcat.cl.src (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO graftcat.cl.src SELECT /*+ COALESCE(1) */ id, CAST(id AS DOUBLE) FROM RANGE(0, 10)")
    spark.sql("INSERT INTO graftcat.cl.src SELECT /*+ COALESCE(1) */ id, CAST(id AS DOUBLE) FROM RANGE(10, 20)")

    spark.sql("CREATE TABLE graftcat.cl.dev SHALLOW CLONE graftcat.cl.src")
    // zero data files copied — the clone dir holds only metadata
    val cloneDir = Paths.get(rootDir, "cl", "dev")
    val localData = Files.list(cloneDir).iterator()
    val dataFiles = scala.jdk.CollectionConverters.IteratorHasAsScala(localData)
      .asScala.count(_.getFileName.toString.startsWith("part-"))
    assert(dataFiles == 0, "shallow clone must not copy data files")
    assert(spark.table("graftcat.cl.dev").count() == 20L)
    assert(spark.sql("SELECT sum(k) FROM graftcat.cl.dev").head().getLong(0) == 190L)

    // writes to the clone never touch the source
    spark.sql("INSERT INTO graftcat.cl.dev SELECT /*+ COALESCE(1) */ id, 0.0 FROM RANGE(100, 105)")
    spark.sql("DELETE FROM graftcat.cl.dev WHERE k >= 0 AND k < 10") // whole-file drop
    spark.sql("UPDATE graftcat.cl.dev SET v = v + 1000 WHERE k = 15") // COW rewrite
    assert(spark.table("graftcat.cl.dev").count() == 15L)
    assert(spark.sql("SELECT v FROM graftcat.cl.dev WHERE k = 15").head().getDouble(0)
      == 1015.0)
    // source unchanged by all of it
    assert(spark.table("graftcat.cl.src").count() == 20L)
    assert(spark.sql("SELECT v FROM graftcat.cl.src WHERE k = 15").head().getDouble(0)
      == 15.0)

    // and source-side writes after the clone point stay invisible here
    spark.sql("INSERT INTO graftcat.cl.src SELECT /*+ COALESCE(1) */ id, 0.0 FROM RANGE(200, 210)")
    assert(spark.table("graftcat.cl.dev").count() == 15L)
    assert(spark.table("graftcat.cl.src").count() == 30L)

    // VERSION AS OF clones an archived snapshot (v2 = after first insert)
    spark.sql("DROP TABLE IF EXISTS graftcat.cl.old")
    val srcSnaps = Manifest.snapshotVersions(Paths.get(rootDir, "cl", "src"))
    spark.sql(
      s"CREATE TABLE graftcat.cl.old SHALLOW CLONE graftcat.cl.src VERSION AS OF ${srcSnaps(1)}")
    assert(spark.table("graftcat.cl.old").count() == 10L)

    // an existing target is refused
    intercept[Exception] {
      spark.sql("CREATE TABLE graftcat.cl.dev SHALLOW CLONE graftcat.cl.src") }
  }

  test("_file metadata column attributes every row to its committed data file") {
    rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.fmeta")
    spark.sql("DROP TABLE IF EXISTS graftcat.fmeta.t")
    spark.sql("CREATE TABLE graftcat.fmeta.t (k BIGINT, v DOUBLE)")
    (0 until 3).foreach { i =>
      spark.sql(s"INSERT INTO graftcat.fmeta.t SELECT /*+ COALESCE(1) */ id, " +
        s"CAST(id AS DOUBLE) FROM RANGE(${i * 5}, ${i * 5 + 5})")
    }
    val byFile = spark.sql(
      "SELECT _file, count(*) AS n FROM graftcat.fmeta.t GROUP BY _file")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(byFile.size == 3, s"expected 3 files, got $byFile")
    assert(byFile.values.forall(_ == 5L))
    // the names are exactly the committed manifest entries
    val entries = Manifest.read(Paths.get(rootDir, "fmeta", "t")).get.entries
    assert(byFile.keySet == entries.map(_.name).toSet)
    // metadata column is hidden unless selected
    assert(!spark.table("graftcat.fmeta.t").columns.contains("_file"))
  }

  test("MERGE without NOT-MATCHED-BY-SOURCE rewrites only files holding matched keys") {
    rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.mrgb")
    spark.sql("DROP TABLE IF EXISTS graftcat.mrgb.t")
    spark.sql("CREATE TABLE graftcat.mrgb.t (k BIGINT, v DOUBLE)")
    (0 until 3).foreach { i =>
      spark.sql(s"INSERT INTO graftcat.mrgb.t SELECT /*+ COALESCE(1) */ id, " +
        s"CAST(id AS DOUBLE) FROM RANGE(${i * 10}, ${i * 10 + 10})")
    }
    val dir = Paths.get(rootDir, "mrgb", "t")
    val before = Manifest.read(dir).get.entries.map(_.name)
    assert(before.length == 3)

    // matched keys 12 and 15 live ONLY in the middle file; 100 inserts
    Seq((12L, 1200.0), (15L, 1500.0), (100L, 100.0)).toDF("k", "nv")
      .createOrReplaceTempView("mrgb_src")
    spark.sql(
      """MERGE INTO graftcat.mrgb.t t USING mrgb_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.nv
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.nv)""".stripMargin)

    val after = Manifest.read(dir).get.entries.map(_.name)
    // files 1 and 3 keep their exact entries — never rewritten
    assert(after.contains(before(0)) && after.contains(before(2)),
      s"untouched files must keep their identity: before=$before after=$after")
    assert(!after.contains(before(1)), "the touched file must be replaced")
    // content is the full merge semantics
    assert(spark.table("graftcat.mrgb.t").count() == 31L)
    assert(spark.sql("SELECT v FROM graftcat.mrgb.t WHERE k = 12").head().getDouble(0)
      == 1200.0)
    assert(spark.sql("SELECT v FROM graftcat.mrgb.t WHERE k = 5").head().getDouble(0)
      == 5.0)
    assert(spark.sql("SELECT v FROM graftcat.mrgb.t WHERE k = 100").head().getDouble(0)
      == 100.0)

    // an INSERT-only merge (nothing matches) is a pure append: every
    // pre-merge entry survives by name
    val preIns = Manifest.read(dir).get.entries.map(_.name).toSet
    Seq((200L, 2.0), (201L, 2.1)).toDF("k", "nv")
      .createOrReplaceTempView("mrgb_ins")
    spark.sql(
      """MERGE INTO graftcat.mrgb.t t USING mrgb_ins s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.nv
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.nv)""".stripMargin)
    val postIns = Manifest.read(dir).get.entries.map(_.name).toSet
    assert(preIns.subsetOf(postIns), "insert-only merge must not rewrite any file")
    assert(spark.table("graftcat.mrgb.t").count() == 33L)
  }

  test("write-time constraints: NOT NULL and CHECK reject bad writes atomically") {
    rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.dq")
    spark.sql("DROP TABLE IF EXISTS graftcat.dq.t")
    spark.sql("CREATE TABLE graftcat.dq.t (k BIGINT NOT NULL, v DOUBLE, tag STRING) " +
      "TBLPROPERTIES ('check.v_pos' = 'v >= 0')")
    def n(): Long = spark.table("graftcat.dq.t").count()
    // NULL in a CHECK column passes (SQL semantics: unknown is not false)
    spark.sql("INSERT INTO graftcat.dq.t VALUES (1, 1.0, 'a'), (2, NULL, 'b')")
    assert(n() == 2L)
    // a CHECK violation fails the job and commits nothing
    intercept[Exception] {
      spark.sql("INSERT INTO graftcat.dq.t VALUES (3, 3.0, 'ok'), (4, -1.0, 'bad')") }
    assert(n() == 2L, "failed write must not commit any of its rows")
    // a NULL into the NOT NULL column is rejected
    intercept[Exception] {
      spark.sql("INSERT INTO graftcat.dq.t VALUES (CAST(NULL AS BIGINT), 1.0, 'd')") }
    assert(n() == 2L)
    // an unbindable or non-row-level CHECK is rejected at DDL time
    intercept[Exception] {
      spark.sql("ALTER TABLE graftcat.dq.t SET TBLPROPERTIES ('check.bad' = 'nope > 0')") }
    intercept[Exception] {
      spark.sql("ALTER TABLE graftcat.dq.t SET TBLPROPERTIES ('check.agg' = 'sum(v) > 0')") }
    // a newly SET constraint applies to future writes
    spark.sql("ALTER TABLE graftcat.dq.t SET TBLPROPERTIES ('check.tag_len' = 'length(tag) <= 3')")
    intercept[Exception] {
      spark.sql("INSERT INTO graftcat.dq.t VALUES (5, 1.0, 'toolong')") }
    spark.sql("INSERT INTO graftcat.dq.t VALUES (5, 1.0, 'ok')")
    assert(n() == 3L)
    // copy-on-write UPDATE obeys the same contracts: a violating rewrite
    // fails before the swap, the table is untouched
    intercept[Exception] {
      spark.sql("UPDATE graftcat.dq.t SET v = -5.0 WHERE k = 1") }
    assert(spark.sql("SELECT v FROM graftcat.dq.t WHERE k = 1").head().getDouble(0)
      == 1.0)
    // the Delta DDL spelling lowers to the same properties (r10):
    // ADD CONSTRAINT enforces, DROP CONSTRAINT lifts
    spark.sql("ALTER TABLE graftcat.dq.t ADD CONSTRAINT v_cap CHECK (v < 100)")
    intercept[Exception] {
      spark.sql("INSERT INTO graftcat.dq.t VALUES (9, 500.0, 'x')") }
    spark.sql("ALTER TABLE graftcat.dq.t DROP CONSTRAINT v_cap")
    spark.sql("INSERT INTO graftcat.dq.t VALUES (9, 500.0, 'x')")
    assert(spark.sql("SELECT v FROM graftcat.dq.t WHERE k = 9").head().getDouble(0)
      == 500.0)
    // a predicate with string literals survives the lowering's re-quoting
    spark.sql("ALTER TABLE graftcat.dq.t ADD CONSTRAINT tag_ok " +
      "CHECK (tag <> 'banned')")
    intercept[Exception] {
      spark.sql("INSERT INTO graftcat.dq.t VALUES (10, 1.0, 'banned')") }
    spark.sql("ALTER TABLE graftcat.dq.t DROP CONSTRAINT tag_ok")
  }

  test("DESCRIBE DETAIL summarizes the table's physical state metadata-only") {
    rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.det")
    spark.sql("DROP TABLE IF EXISTS graftcat.det.t")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "tag")
      .writeTo("graftcat.det.t")
      .partitionedBy(org.apache.spark.sql.functions.col("tag"))
      .tableProperty("owner.team", "graft")
      .create()
    spark.sql("INSERT INTO graftcat.det.t VALUES (4, 'd')")
    val d = spark.sql("DESCRIBE DETAIL graftcat.det.t").head()
    assert(d.getAs[String]("location").endsWith("det/t"))
    assert(d.getAs[Int]("num_files") >= 1)
    assert(d.getAs[Long]("size_bytes") > 0L)
    assert(d.getAs[Long]("num_rows") == 4L)
    assert(d.getAs[String]("partition_columns") == "tag")
    assert(d.getAs[Int]("num_snapshots") >= 2)
    assert(d.getAs[Int]("num_properties") == 1)
    assert(d.getAs[Int]("num_deletion_vectors") == 0)
    assert(d.getAs[Long]("num_deleted_rows") == 0L)
  }

  test("DESCRIBE DETAIL reports deletion-vector state; write.targetFileSize reaches the write") {
    rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.det2")
    spark.sql("DROP TABLE IF EXISTS graftcat.det2.t")
    spark.sql("CREATE TABLE graftcat.det2.t (k BIGINT, v DOUBLE) " +
      "PARTITIONED BY (k) " + // advisory sizing needs a clustered write
      "TBLPROPERTIES ('delete.dv' = 'true', 'write.targetFileSize' = '1048576')")
    spark.sql("INSERT INTO graftcat.det2.t " +
      "SELECT /*+ COALESCE(1) */ id, CAST(id AS DOUBLE) FROM RANGE(0, 40)")
    spark.sql("DELETE FROM graftcat.det2.t WHERE k IN (3, 7)")
    val d = spark.sql("DESCRIBE DETAIL graftcat.det2.t").head()
    assert(d.getAs[Long]("num_rows") == 38L)
    assert(d.getAs[Int]("num_deletion_vectors") == 1)
    assert(d.getAs[Long]("num_deleted_rows") == 2L)
    // the advisory file-size knob reaches the V2 write
    val dir = Paths.get(rootDir, "det2", "t")
    val info = new org.apache.spark.sql.connector.write.LogicalWriteInfo {
      override def queryId(): String = "t-advisory"
      override def schema(): org.apache.spark.sql.types.StructType =
        spark.table("graftcat.det2.t").schema
      override def options(): org.apache.spark.sql.util.CaseInsensitiveStringMap =
        org.apache.spark.sql.util.CaseInsensitiveStringMap.empty()
    }
    val w = new ManifestTable(dir, info.schema())
      .newWriteBuilder(info).build()
      .asInstanceOf[org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering]
    assert(w.advisoryPartitionSizeInBytes() == 1048576L)
  }

  test("metadata DELETE accepts a date-ranged whole-file predicate") {
    rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.dated")
    spark.sql("CREATE TABLE graftcat.dated.ev (id BIGINT, d DATE, src STRING)")
    def batch(day0: Int, src: String): Unit =
      spark.sql(
        s"""INSERT INTO graftcat.dated.ev SELECT /*+ COALESCE(1) */ id,
           |DATE_ADD(DATE'2026-01-01', CAST(id + $day0 AS INT)), '$src'
           |FROM RANGE(0, 5)""".stripMargin)
    batch(0, "web"); batch(10, "api"); batch(20, "web")
    assert(spark.table("graftcat.dated.ev").count() == 15L)
    // whole-file date range [Jan 11, Jan 15] → drops exactly the middle file
    spark.sql(
      "DELETE FROM graftcat.dated.ev WHERE d >= DATE'2026-01-11' AND d <= DATE'2026-01-15'")
    assert(spark.table("graftcat.dated.ev").count() == 10L)
    assert(spark.sql(
      "SELECT count(*) FROM graftcat.dated.ev WHERE d >= DATE'2026-01-11' AND d <= DATE'2026-01-15'")
      .head().getLong(0) == 0L)
    // a date predicate cutting through a file rewrites just that file
    spark.sql("DELETE FROM graftcat.dated.ev WHERE d = DATE'2026-01-02'")
    assert(spark.table("graftcat.dated.ev").count() == 9L)
    assert(spark.sql(
      "SELECT count(*) FROM graftcat.dated.ev WHERE d = DATE'2026-01-02'")
      .head().getLong(0) == 0L)
    // string equality covering a whole file still deletes metadata-only:
    // remaining files are [web Jan1-5 rewritten] and [web Jan21-25], both
    // all-'web', so DELETE WHERE src='web' drops both without a rewrite
    spark.sql("DELETE FROM graftcat.dated.ev WHERE src = 'web'")
    assert(spark.table("graftcat.dated.ev").count() == 0L)
  }

  test("SQL MERGE INTO whole-row upsert (star actions through the bounded tier)") {
    rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.mrg")
    spark.sql("CREATE TABLE graftcat.mrg.base (k BIGINT, v DOUBLE, tag STRING)")
    spark.sql("CREATE TABLE graftcat.mrg.upd (k BIGINT, v DOUBLE, tag STRING)")
    spark.sql("INSERT INTO graftcat.mrg.base VALUES (1, 1.0, 'a'), (2, 2.0, 'b'), (3, 3.0, 'c')")
    // one matched update (k=2) + one insert (k=9)
    spark.sql("INSERT INTO graftcat.mrg.upd VALUES (2, 22.0, 'B'), (9, 9.0, 'i')")

    spark.sql(
      """MERGE INTO graftcat.mrg.base USING graftcat.mrg.upd ON base.k = upd.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)

    val got = spark.sql("SELECT k, v, tag FROM graftcat.mrg.base ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
    // matched keys take the update row, unmatched updates insert, the rest
    // survive — the exact q_merge_upsert / FULL OUTER JOIN semantics
    assert(got == Seq((1L, 1.0, "a"), (2L, 22.0, "B"), (3L, 3.0, "c"), (9L, 9.0, "i")))

    // merge is atomic + snapshotted: the pre-merge version stays readable
    val dir = s"$rootDir/mrg/base"
    val snaps = Manifest.snapshotVersions(Paths.get(dir))
    val before = spark.read.format("graft.sources.GraftManifestSink")
      .option("path", dir).option("snapshot", (snaps.max - 1).toString).load()
    assert(before.count() == 3L)

    // a second merge composes (idempotent when re-applied)
    spark.sql(
      """MERGE INTO graftcat.mrg.base USING graftcat.mrg.upd ON base.k = upd.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.table("graftcat.mrg.base").count() == 4L)

    // shapes NO tier can express (non-equi ON) fall through to Spark's own
    // MERGE (which rejects a table without row-level-operation support)
    // instead of mis-lowering
    intercept[Exception] {
      spark.sql(
        """MERGE INTO graftcat.mrg.base USING graftcat.mrg.upd ON base.k > upd.k
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }

    // ANSI cardinality: several source rows for one key must ERROR, never
    // commit an arbitrary winner
    spark.sql("INSERT INTO graftcat.mrg.upd VALUES (9, 99.0, 'dup')")
    val card = intercept[Exception] {
      spark.sql(
        """MERGE INTO graftcat.mrg.base USING graftcat.mrg.upd ON base.k = upd.k
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    assert(card.getMessage.contains("cardinality"), card.getMessage)
    assert(spark.table("graftcat.mrg.base").count() == 4L, "failed merge must not commit")

    // a non-manifest target is refused with a clear error instead of being
    // silently truncate-overwritten through the lowered path
    spark.sql("INSERT INTO graftcat.mrg.upd VALUES (1, 0.0, 'x')") // irrelevant
    Seq((1L, 1.0, "a")).toDF("k", "v", "tag").createOrReplaceTempView("plain_view")
    val notManifest = intercept[Exception] {
      spark.sql(
        """MERGE INTO plain_view USING graftcat.mrg.upd ON plain_view.k = upd.k
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    assert(notManifest.getMessage.contains("manifest"), notManifest.getMessage)
  }

  test("MERGE INTO full clause surface: conditional UPDATE/DELETE, INSERT list, NOT MATCHED BY SOURCE") {
    rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.mrg2")
    spark.sql("DROP TABLE IF EXISTS graftcat.mrg2.t")
    spark.sql("CREATE TABLE graftcat.mrg2.t (k BIGINT, v DOUBLE, tag STRING)")
    spark.sql(
      "INSERT INTO graftcat.mrg2.t VALUES (1, 1.0, 'a'), (2, 2.0, 'b'), (3, 3.0, 'c'), (4, 4.0, 'd')")
    Seq((2L, 20.0, "U"), (3L, 0.0, "D"), (9L, 9.0, "I"), (10L, 10.0, "skip"))
      .toDF("k", "nv", "op").createOrReplaceTempView("mrg2_src")

    spark.sql(
      """MERGE INTO graftcat.mrg2.t t USING mrg2_src s ON t.k = s.k
        |WHEN MATCHED AND s.op = 'D' THEN DELETE
        |WHEN MATCHED AND s.op = 'U' THEN UPDATE SET v = s.nv, tag = concat(t.tag, '+')
        |WHEN NOT MATCHED AND s.op = 'I' THEN INSERT (k, v) VALUES (s.k, s.nv)
        |WHEN NOT MATCHED BY SOURCE AND t.k = 4 THEN UPDATE SET tag = 'nmbs'""".stripMargin)

    val got = spark.sql("SELECT k, v, tag FROM graftcat.mrg2.t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1), Option(r.getString(2)))).toSeq
    // k=1 target-only (cond false) keeps; k=2 matched 'U' updates (first
    // applying clause, assignment sees both sides); k=3 matched 'D'
    // deletes; k=4 target-only NMBS updates; k=9 inserts with tag
    // NULL-filled (unmentioned INSERT column — the Delta rule); k=10
    // source-only with no applying clause does NOT insert
    assert(got === Seq(
      (1L, 1.0, Some("a")), (2L, 20.0, Some("b+")),
      (4L, 4.0, Some("nmbs")), (9L, 9.0, None)))

    // delete-only merge: every matched key leaves, everything else stays
    spark.sql(
      """MERGE INTO graftcat.mrg2.t t USING mrg2_src s ON t.k = s.k
        |WHEN MATCHED THEN DELETE""".stripMargin)
    assert(spark.sql("SELECT k FROM graftcat.mrg2.t ORDER BY k")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 4L))

    // cardinality guard fires even for INSERT-only merges: the join
    // formulation would silently DUPLICATE a kept target row matched by
    // two source rows
    spark.sql("INSERT INTO graftcat.mrg2.t VALUES (77, 7.0, 'kept')")
    Seq((77L, 5.0, "x"), (77L, 6.0, "y"))
      .toDF("k", "nv", "op").createOrReplaceTempView("mrg2_dup")
    val card = intercept[Exception] {
      spark.sql(
        """MERGE INTO graftcat.mrg2.t t USING mrg2_dup s ON t.k = s.k
          |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.nv)""".stripMargin)
    }
    assert(card.getMessage.contains("cardinality"), card.getMessage)

    // an UPDATE SET naming an unknown target column fails in MERGE terms
    val badCol = intercept[Exception] {
      spark.sql(
        """MERGE INTO graftcat.mrg2.t t USING mrg2_src s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET nope = s.nv""".stripMargin)
    }
    assert(badCol.getMessage.contains("nope"), badCol.getMessage)
  }

  test("SQL time travel: VERSION AS OF and TIMESTAMP AS OF read archived snapshots") {
    rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.tt")
    spark.sql("CREATE TABLE graftcat.tt.t (id BIGINT, name STRING)")      // v1
    spark.sql("INSERT INTO graftcat.tt.t VALUES (1, 'alpha')")            // v2
    Thread.sleep(20) // commit mtimes must be distinguishable for AS OF ts
    val betweenInserts = java.time.Instant.now()
    Thread.sleep(20)
    spark.sql("INSERT INTO graftcat.tt.t VALUES (2, 'beta')")             // v3
    spark.sql("ALTER TABLE graftcat.tt.t ADD COLUMN score DOUBLE")        // v4
    spark.sql("INSERT INTO graftcat.tt.t VALUES (3, 'gamma', 3.5)")       // v5

    // current state: widened schema, 3 rows
    assert(spark.table("graftcat.tt.t").count() == 3L)

    // VERSION AS OF pins both the file list AND the schema of that commit
    val v2 = spark.sql("SELECT * FROM graftcat.tt.t VERSION AS OF 2")
    assert(v2.schema.fieldNames.toSeq == Seq("id", "name"))
    assert(v2.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "alpha")))
    assert(spark.sql("SELECT * FROM graftcat.tt.t VERSION AS OF 1").count() == 0L)
    assert(spark.sql("SELECT * FROM graftcat.tt.t VERSION AS OF 3").count() == 2L)
    // post-alter, pre-last-insert: 2 rows under the WIDENED schema
    val v4 = spark.sql("SELECT * FROM graftcat.tt.t VERSION AS OF 4")
    assert(v4.schema.fieldNames.toSeq == Seq("id", "name", "score"))
    assert(v4.count() == 2L)

    // a time-traveled scan still prunes files by zone map (planning works)
    assert(spark.sql(
      "SELECT id FROM graftcat.tt.t VERSION AS OF 3 WHERE id = 2").count() == 1L)

    // TIMESTAMP AS OF resolves to the newest commit at or before t
    val tsLit = java.sql.Timestamp.from(betweenInserts).toString
    val atTs = spark.sql(s"SELECT * FROM graftcat.tt.t TIMESTAMP AS OF '$tsLit'")
    assert(atTs.count() == 1L, s"expected the v2 snapshot at $tsLit")
    // a timestamp after everything sees the current state
    val now = java.sql.Timestamp.from(java.time.Instant.now().plusSeconds(1)).toString
    assert(spark.sql(s"SELECT * FROM graftcat.tt.t TIMESTAMP AS OF '$now'").count() == 3L)

    // out-of-range asks fail with a clear error, not empty results
    intercept[Exception] { spark.sql("SELECT * FROM graftcat.tt.t VERSION AS OF 99").collect() }
    intercept[Exception] {
      spark.sql("SELECT * FROM graftcat.tt.t TIMESTAMP AS OF '1999-01-01 00:00:00'").collect()
    }
  }

  test("RENAME and DROP are metadata operations on the manifest directory") {
    rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.tmp")
    spark.sql("CREATE TABLE graftcat.tmp.a (k BIGINT)")
    spark.sql("INSERT INTO graftcat.tmp.a VALUES (42)")
    spark.sql("ALTER TABLE graftcat.tmp.a RENAME TO tmp.b")
    assert(spark.table("graftcat.tmp.b").count() == 1L)
    intercept[Exception] { spark.table("graftcat.tmp.a").count() }
    spark.sql("DROP TABLE graftcat.tmp.b")
    intercept[Exception] { spark.table("graftcat.tmp.b").count() }
  }

  test("PARTITIONED BY clusters writes so zone maps prune partition predicates") {
    rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.pt")
    spark.sql("CREATE TABLE graftcat.pt.docs (id BIGINT, src STRING, v BIGINT) " +
      "PARTITIONED BY (src)")

    // the declared partitioning is visible on the loaded table
    val cat = spark.sessionState.catalogManager.catalog("graftcat")
      .asInstanceOf[GraftCatalog]
    val t = cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("pt"), "docs"))
    assert(t.partitioning().toSeq.map(_.references().head.fieldNames().mkString(".")) ==
      Seq("src"))

    // the INPUT interleaves all 8 sources round-robin — without the write's
    // required distribution every task would see every source and no file
    // could prune. AQE's partition coalescing would fold this toy-sized
    // shuffle into ONE task (the production behavior: files sized by the
    // advisory target); hold it off so the clustering itself is observable.
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val coalescePrev = spark.conf.get(coalesceKey)
    spark.conf.set(coalesceKey, "false")
    try spark.range(0, 4000)
      .selectExpr("id", "concat('s', CAST(id % 8 AS STRING)) AS src", "id * 2 AS v")
      .writeTo("graftcat.pt.docs").append()
    finally spark.conf.set(coalesceKey, coalescePrev)

    val dir = Paths.get(s"$rootDir/pt/docs")
    val entries = Manifest.read(dir).get.entries.filter(_.rows > 0)
    assert(entries.length > 1, "clustered append must commit multiple files")
    // range-clustered layout: one source's value sits inside a strict
    // minority of the files' string zone maps
    val probe = "s3".getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val overlapping = entries.count { e =>
      e.stats.strRanges.get("src").forall { case (lo, hi) =>
        ColumnStats.cmpBytes(probe, ColumnStats.unb64(lo)) >= 0 &&
          ColumnStats.cmpBytes(probe, ColumnStats.unb64(hi)) <= 0
      }
    }
    assert(overlapping < entries.length,
      s"src='s3' must prune: $overlapping of ${entries.length} files overlap")
    // the partition-predicate scan plans only the overlapping files, and
    // the rows are exactly right
    val q = spark.table("graftcat.pt.docs").where("src = 's3'")
    assert(q.count() == 500L)
    val desc = q.queryExecution.executedPlan.toString
    val planned = """files=(\d+)/(\d+)""".r.findFirstMatchIn(desc)
    assert(planned.exists(m => m.group(1).toInt < m.group(2).toInt),
      s"scan must plan a strict file subset, plan was:\n$desc")

    // rejection matrix: unsupported transforms and unknown columns never
    // create a half-honored table (bucket/days are accepted — their own test)
    intercept[Exception] {
      spark.sql("CREATE TABLE graftcat.pt.tr (s STRING) " +
        "PARTITIONED BY (truncate(4, s))")
    }
    intercept[Exception] {
      spark.sql("CREATE TABLE graftcat.pt.nc (id BIGINT) PARTITIONED BY (nope)")
    }
    intercept[Exception] { // time transform over a non-temporal column
      spark.sql("CREATE TABLE graftcat.pt.dd (id BIGINT) " +
        "PARTITIONED BY (days(id))")
    }
    assert(cat.listTables(Array("pt")).map(_.name()).toSet == Set("docs"))
  }

  test("transform partitioning: days(ts) prunes ts predicates to a strict file subset") {
    rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.ptt")
    spark.sql("DROP TABLE IF EXISTS graftcat.ptt.ev")
    spark.sql("CREATE TABLE graftcat.ptt.ev (ts TIMESTAMP, v BIGINT) " +
      "PARTITIONED BY (days(ts))")

    // the declared transform survives the round-trip to DESCRIBE/SHOW CREATE
    val cat = spark.sessionState.catalogManager.catalog("graftcat")
      .asInstanceOf[GraftCatalog]
    val t = cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("ptt"), "ev"))
    assert(t.partitioning().toSeq.map(_.toString) == Seq("days(ts)"),
      t.partitioning().toSeq.toString)

    // 16 days of events, interleaved on input — the write's clustering
    // contract (range on the SOURCE column, a refinement of day
    // granularity) must separate them into narrow-range files
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val coalescePrev = spark.conf.get(coalesceKey)
    spark.conf.set(coalesceKey, "false")
    try spark.range(0, 4000)
      .selectExpr(
        "timestamp_seconds(1700000000 + (id % 16) * 86400 + id) AS ts",
        "id AS v")
      .writeTo("graftcat.ptt.ev").append()
    finally spark.conf.set(coalesceKey, coalescePrev)
    val entries = Manifest.read(Paths.get(s"$rootDir/ptt/ev")).get.entries
      .filter(_.rows > 0)
    assert(entries.length > 1, "clustered append must commit multiple files")

    // a ts range predicate (no user-derived day column anywhere) plans a
    // strict file subset and returns exactly the right rows
    val q = spark.table("graftcat.ptt.ev").where(
      "ts >= timestamp_seconds(1700000000 + 3*86400) AND " +
        "ts < timestamp_seconds(1700000000 + 4*86400)")
    val n = q.count()
    assert(n == 250L, s"one of 16 days → 250 rows, got $n")
    val desc = q.queryExecution.executedPlan.toString
    val planned = """files=(\d+)/(\d+)""".r.findFirstMatchIn(desc)
    assert(planned.exists(m => m.group(1).toInt < m.group(2).toInt),
      s"days(ts) table must plan a strict file subset, plan was:\n$desc")

    // bucket(n, col) is accepted, records its DDL, and point probes prune
    spark.sql("DROP TABLE IF EXISTS graftcat.ptt.bk")
    spark.sql("CREATE TABLE graftcat.ptt.bk (id BIGINT, v DOUBLE) " +
      "PARTITIONED BY (bucket(16, id))")
    val bt = cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("ptt"), "bk"))
    assert(bt.partitioning().toSeq.map(_.toString) == Seq("bucket(16, id)"),
      bt.partitioning().toSeq.toString)
    spark.conf.set(coalesceKey, "false")
    try spark.range(0, 4000)
      .selectExpr("(id * 2654435761) % 4000 AS id", "CAST(id AS DOUBLE) AS v")
      .writeTo("graftcat.ptt.bk").append()
    finally spark.conf.set(coalesceKey, coalescePrev)
    val bq = spark.table("graftcat.ptt.bk").where("id = 1234")
    bq.collect() // value-clustered layout serves the bucket's point-probe goal
    val bdesc = bq.queryExecution.executedPlan.toString
    val bplanned = """files=(\d+)/(\d+)""".r.findFirstMatchIn(bdesc)
    assert(bplanned.exists(m => m.group(1).toInt < m.group(2).toInt),
      s"bucket table must plan a strict file subset for a point probe:\n$bdesc")
  }

  test("TBLPROPERTIES persist in the manifest; ALTER SET/UNSET rides the atomic swap") {
    rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.props")
    spark.sql("CREATE TABLE graftcat.props.t (k BIGINT) " +
      "TBLPROPERTIES ('team'='data', 'ttl.days'='30')")
    def props = spark.sql("SHOW TBLPROPERTIES graftcat.props.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("team") == "data" && props("ttl.days") == "30")
    spark.sql("ALTER TABLE graftcat.props.t SET TBLPROPERTIES ('team'='ml')")
    assert(props("team") == "ml")
    spark.sql("ALTER TABLE graftcat.props.t UNSET TBLPROPERTIES ('ttl.days')")
    assert(!props.contains("ttl.days"))
    // properties survive data commits, and the sink's internal props never
    // leak into the user-visible map
    spark.sql("INSERT INTO graftcat.props.t VALUES (1)")
    assert(props("team") == "ml")
    assert(!props.keys.exists(k => k.contains("partitionCols") || k.contains("lastEpoch")))
    // a value the line-oriented manifest cannot store is rejected, not torn
    intercept[Exception] {
      spark.sql("ALTER TABLE graftcat.props.t SET TBLPROPERTIES ('bad'='a\tb')")
    }
  }

  test("bloom.columns prunes point probes where min/max ranges cannot") {
    rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.bl")
    spark.sql("CREATE TABLE graftcat.bl.t (id BIGINT, s STRING) " +
      "TBLPROPERTIES ('bloom.columns'='id,s')")
    // 8 hash-random shards: every file spans ~the whole id range, so range
    // stats keep every file on a point probe — only the bloom can prune
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(coalesceKey)
    spark.conf.set(coalesceKey, "false")
    try spark.range(0, 4000).selectExpr("id", "concat('k', id) AS s")
      .repartition(8).writeTo("graftcat.bl.t").append()
    finally spark.conf.set(coalesceKey, prev)

    val dir = Paths.get(s"$rootDir/bl/t")
    val entries = Manifest.read(dir).get.entries.filter(_.rows > 0)
    assert(entries.length > 1, "need multiple files to demonstrate pruning")
    assert(entries.forall(_.stats.blooms.keySet == Set("id", "s")))

    def planned(pred: String): (Int, Int) = {
      val desc = spark.table("graftcat.bl.t").where(pred)
        .queryExecution.executedPlan.toString
      val m = """files=(\d+)/(\d+)""".r.findFirstMatchIn(desc).get
      (m.group(1).toInt, m.group(2).toInt)
    }
    val (k1, n1) = planned("id = 1234")
    assert(k1 < n1, s"long bloom must prune: planned $k1/$n1")
    val (k2, n2) = planned("s = 'k1234'")
    assert(k2 < n2, s"string bloom must prune: planned $k2/$n2")
    // no false negatives: every probe finds its row
    assert(spark.table("graftcat.bl.t").where("id = 1234").count() == 1L)
    assert(spark.table("graftcat.bl.t").where("s = 'k1234'").count() == 1L)
    assert(spark.table("graftcat.bl.t").where("id IN (7, 3999)").count() == 2L)
    // blooms survive a copy-on-write rewrite (DELETE carries tbl. props)
    spark.sql("DELETE FROM graftcat.bl.t WHERE id >= 3000 AND id < 3100")
    val after = Manifest.read(dir).get.entries.filter(_.rows > 0)
    assert(after.forall(_.stats.blooms.contains("id")),
      "rewritten files must keep their blooms")
    assert(spark.table("graftcat.bl.t").count() == 3900L)
  }

  test("INSERT OVERWRITE replaces the table atomically; old snapshot stays readable") {
    rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.ow")
    spark.sql("CREATE TABLE graftcat.ow.t (k BIGINT, s STRING)")
    spark.sql("INSERT INTO graftcat.ow.t VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT OVERWRITE graftcat.ow.t VALUES (9, 'z')")
    assert(spark.table("graftcat.ow.t").collect().map(_.getLong(0)).toSeq == Seq(9L))
    // the replaced state is still time-travelable (truncate is a manifest
    // swap, not a file delete)
    val versions = spark.sql("DESCRIBE HISTORY graftcat.ow.t")
      .orderBy("version").collect().map(_.getInt(0))
    val prev = versions(versions.length - 2)
    assert(spark.sql(s"SELECT count(*) FROM graftcat.ow.t VERSION AS OF $prev")
      .head.getLong(0) == 2L)
  }

  test("SHOW CREATE TABLE reflects schema, partitioning and properties") {
    rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.sc")
    spark.sql("CREATE TABLE graftcat.sc.t (id BIGINT, src STRING) " +
      "PARTITIONED BY (src) TBLPROPERTIES ('team'='data')")
    val ddl = spark.sql("SHOW CREATE TABLE graftcat.sc.t").head.getString(0)
    assert(ddl.contains("PARTITIONED BY"), ddl)
    assert(ddl.contains("src"), ddl)
    assert(ddl.toLowerCase.contains("team"), ddl)
  }

  test("catalog-backed declared queries are re-invokable in one session") {
    // the bench calls every query FOUR times (2 passes × warm+timed) in one
    // session; Spark caches each catalog instance with its first root, so a
    // query that path-addresses its own scratch root breaks on the repeat —
    // exactly how q_table_changes failed the sf0.1 bench. Pin re-invocation
    // for every catalog-based query.
    Seq("q_table_changes", "q_delete_rows", "q_table_history",
      "q_partitioned_table", "q_bloom_lookup").foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      val r1 = fn(spark, sfDir).count()
      val r2 = fn(spark, sfDir).count()
      assert(r1 == r2 && r1 > 0, s"$q: first run $r1 rows, repeat $r2")
    }
  }

  test("VACUUM by table name expires snapshots through the catalog") {
    rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.vac")
    spark.sql("CREATE TABLE graftcat.vac.t (k BIGINT)")
    (1 to 4).foreach(i => spark.sql(s"INSERT INTO graftcat.vac.t VALUES ($i)"))
    val dir = Paths.get(s"$rootDir/vac/t")
    assert(Manifest.snapshotVersions(dir).length == 5) // create + 4 inserts
    val out = spark.sql("VACUUM graftcat.vac.t RETAIN 2 SNAPSHOTS").collect()
    assert(out.map(_.getString(1)).forall(_ == "snapshot-expired"))
    assert(Manifest.snapshotVersions(dir).length == 2)
    assert(spark.table("graftcat.vac.t").count() == 4)
    // a non-manifest target is refused, and the path form still parses
    intercept[Exception] { spark.sql("VACUUM does.not.exist") }
  }

  test("ALTER TABLE DROP COLUMN is metadata-only: middle-column drop, time travel, no re-ADD resurrection") {
    rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.dropc")
    spark.sql("DROP TABLE IF EXISTS graftcat.dropc.t")
    spark.sql("CREATE TABLE graftcat.dropc.t (k BIGINT, mid DOUBLE, tag STRING)")
    spark.sql("INSERT INTO graftcat.dropc.t VALUES (1, 1.5, 'a'), (2, 2.5, 'b')")
    val dir = Paths.get(rootDir, "dropc", "t")
    val preDropSnap = Manifest.snapshotVersions(dir).last
    val preFiles = Manifest.read(dir).get.entries.map(_.name).toSet

    // drop the MIDDLE column — the hard case: later cells must not shift
    spark.sql("ALTER TABLE graftcat.dropc.t DROP COLUMN mid")
    assert(spark.table("graftcat.dropc.t").schema.fieldNames.toSeq == Seq("k", "tag"))
    val got = spark.sql("SELECT k, tag FROM graftcat.dropc.t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === Seq((1L, "a"), (2L, "b")))
    // zero data files rewritten — same physical files, new layout map
    assert(Manifest.read(dir).get.entries.map(_.name).toSet == preFiles,
      "DROP COLUMN must not rewrite data files")
    // stats for the dropped column purged from every entry
    val m = Manifest.read(dir).get
    assert(m.entries.forall(e => !e.stats.ranges.contains("mid") &&
      !e.stats.strRanges.contains("mid") && !e.stats.blooms.contains("mid")))

    // pre-drop snapshot still reads the column on time travel
    val old = spark.sql(
      s"SELECT k, mid, tag FROM graftcat.dropc.t VERSION AS OF $preDropSnap ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
    assert(old === Seq((1L, 1.5, "a"), (2L, 2.5, "b")))

    // re-ADD of the same name must NOT resurrect old cell values
    spark.sql("ALTER TABLE graftcat.dropc.t ADD COLUMN mid DOUBLE")
    val readd = spark.sql("SELECT k, mid, tag FROM graftcat.dropc.t ORDER BY k")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), r.getString(2))).toSeq
    assert(readd === Seq((1L, None, "a"), (2L, None, "b")))
    // and writes under the re-added column round-trip alongside old files
    // (schema order is now k, tag, mid — the re-ADD appends at the end)
    spark.sql("INSERT INTO graftcat.dropc.t VALUES (3, 'c', 9.5)")
    assert(spark.sql("SELECT sum(mid) FROM graftcat.dropc.t").head().getDouble(0) == 9.5)

    // dropping the LAST schema column normalizes back to the prefix form
    spark.sql("DROP TABLE IF EXISTS graftcat.dropc.u")
    spark.sql("CREATE TABLE graftcat.dropc.u (a BIGINT, b STRING)")
    spark.sql("INSERT INTO graftcat.dropc.u VALUES (7, 'x')")
    spark.sql("ALTER TABLE graftcat.dropc.u DROP COLUMN b")
    val mu = Manifest.read(Paths.get(rootDir, "dropc", "u")).get
    assert(mu.entries.forall(e => e.colMap.isEmpty && e.cols == 1),
      s"tail drop should stay prefix-form, got ${mu.entries}")
    assert(spark.table("graftcat.dropc.u").collect().map(_.getLong(0)).toSeq == Seq(7L))

    // guard rails: last remaining column, partition column, CHECK reference
    intercept[Exception] { spark.sql("ALTER TABLE graftcat.dropc.u DROP COLUMN a") }
    spark.sql("DROP TABLE IF EXISTS graftcat.dropc.p")
    spark.sql("CREATE TABLE graftcat.dropc.p (k BIGINT, v DOUBLE) PARTITIONED BY (k)")
    val pc = intercept[Exception] {
      spark.sql("ALTER TABLE graftcat.dropc.p DROP COLUMN k") }
    assert(pc.getMessage.contains("partition"), pc.getMessage)
    spark.sql("DROP TABLE IF EXISTS graftcat.dropc.c")
    spark.sql("CREATE TABLE graftcat.dropc.c (k BIGINT, v DOUBLE) " +
      "TBLPROPERTIES ('check.pos' = 'v > 0')")
    val ck = intercept[Exception] {
      spark.sql("ALTER TABLE graftcat.dropc.c DROP COLUMN v") }
    assert(ck.getMessage.contains("CHECK"), ck.getMessage)
  }

  test("ALTER COLUMN TYPE widens INT to BIGINT metadata-only; everything else is rejected") {
    rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.wide")
    spark.sql("DROP TABLE IF EXISTS graftcat.wide.t")
    spark.sql("CREATE TABLE graftcat.wide.t (k INT, s STRING) " +
      "TBLPROPERTIES ('bloom.columns' = 'k')")
    spark.sql("INSERT INTO graftcat.wide.t SELECT /*+ COALESCE(1) */ " +
      "CAST(id AS INT), concat('s', id) FROM RANGE(0, 50)")
    val dir = Paths.get(rootDir, "wide", "t")
    val preFiles = Manifest.read(dir).get.entries.map(_.name).toSet
    val preSnap = Manifest.snapshotVersions(dir).last

    spark.sql("ALTER TABLE graftcat.wide.t ALTER COLUMN k TYPE BIGINT")
    assert(spark.table("graftcat.wide.t").schema("k").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(Manifest.read(dir).get.entries.map(_.name).toSet == preFiles,
      "widening must not rewrite data files")
    // old cells read under the widened type; values intact
    assert(spark.sql("SELECT sum(k) FROM graftcat.wide.t").head().getLong(0)
      == (0L until 50L).sum)
    // a value only BIGINT can hold lands beside the old files
    spark.sql("INSERT INTO graftcat.wide.t VALUES (4000000000, 'big')")
    assert(spark.sql("SELECT k FROM graftcat.wide.t WHERE s = 'big'")
      .head().getLong(0) == 4000000000L)
    // pre-widen blooms stay valid: the int hash rides its long encoding,
    // so an equality probe still prunes to a strict file subset
    val q = spark.table("graftcat.wide.t").where("k = 7")
    assert(q.count() == 1L)
    // time travel reads the pre-widen snapshot under INT
    val old = spark.sql(
      s"SELECT k FROM graftcat.wide.t VERSION AS OF $preSnap WHERE k = 7")
    assert(old.schema("k").dataType == org.apache.spark.sql.types.IntegerType)
    assert(old.head().getInt(0) == 7)

    // rejection matrix: narrowing, cross-family, precision-losing
    intercept[Exception] {
      spark.sql("ALTER TABLE graftcat.wide.t ALTER COLUMN k TYPE INT") }
    intercept[Exception] {
      spark.sql("ALTER TABLE graftcat.wide.t ALTER COLUMN k TYPE DOUBLE") }
    intercept[Exception] {
      spark.sql("ALTER TABLE graftcat.wide.t ALTER COLUMN s TYPE BIGINT") }
  }

  test("FLOAT->DOUBLE and DECIMAL precision widening are metadata-only; post-widen pruning holds") {
    rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.wide2")
    spark.sql("DROP TABLE IF EXISTS graftcat.wide2.t")
    spark.sql("CREATE TABLE graftcat.wide2.t (id BIGINT, f FLOAT, d DECIMAL(8,2))")
    (0 until 3).foreach { i =>
      spark.sql("INSERT INTO graftcat.wide2.t SELECT /*+ COALESCE(1) */ id, " +
        "CAST(id * 0.1 AS FLOAT), CAST(id AS DECIMAL(8,2)) / 4 " +
        s"FROM RANGE(${i * 100}, ${i * 100 + 100})")
    }
    val dir = Paths.get(rootDir, "wide2", "t")
    val preFiles = Manifest.read(dir).get.entries.map(_.name).toSet
    // pre-widen: float and decimal zone maps prune range predicates
    val dec = spark.table("graftcat.wide2.t").where("d >= 60.25")
    assert(dec.count() == 59L) // d = id/4 >= 60.25 → id >= 241
    assert(dec.queryExecution.executedPlan.toString.contains("files=1/3"),
      dec.queryExecution.executedPlan.toString)

    spark.sql("ALTER TABLE graftcat.wide2.t ALTER COLUMN f TYPE DOUBLE")
    spark.sql("ALTER TABLE graftcat.wide2.t ALTER COLUMN d TYPE DECIMAL(12,2)")
    assert(Manifest.read(dir).get.entries.map(_.name).toSet == preFiles,
      "widening must not rewrite data files")
    val sch = spark.table("graftcat.wide2.t").schema
    assert(sch("f").dataType == org.apache.spark.sql.types.DoubleType)
    assert(sch("d").dataType == org.apache.spark.sql.types.DecimalType(12, 2))
    // old cells read under the widened types; values intact (float 0.1
    // grid re-reads as the shortest-round-trip doubles)
    assert(spark.sql("SELECT count(*) FROM graftcat.wide2.t WHERE f = CAST(CAST(1.5 AS FLOAT) AS DOUBLE)")
      .head().getLong(0) == 1L)
    assert(spark.sql("SELECT sum(d) FROM graftcat.wide2.t").head()
      .getDecimal(0) == new java.math.BigDecimal("11212.50"))
    // post-widen zone maps still prune the same strict file subset
    val dec2 = spark.table("graftcat.wide2.t").where("d >= 60.25")
    assert(dec2.count() == 59L)
    assert(dec2.queryExecution.executedPlan.toString.contains("files=1/3"),
      dec2.queryExecution.executedPlan.toString)
    // values only the wider types hold land beside the old files
    spark.sql("INSERT INTO graftcat.wide2.t VALUES (9999, 1e300, 9999999999.25)")
    assert(spark.sql("SELECT f, d FROM graftcat.wide2.t WHERE id = 9999").head()
      .getDouble(0) == 1e300)
    // rejection: scale change, precision narrowing, cross-family
    intercept[Exception] {
      spark.sql("ALTER TABLE graftcat.wide2.t ALTER COLUMN d TYPE DECIMAL(14,4)") }
    intercept[Exception] {
      spark.sql("ALTER TABLE graftcat.wide2.t ALTER COLUMN d TYPE DECIMAL(6,2)") }
    intercept[Exception] {
      spark.sql("ALTER TABLE graftcat.wide2.t ALTER COLUMN f TYPE DECIMAL(12,2)") }
  }

  test("OPTIMIZE WHERE compacts only the files the predicate can touch") {
    rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.ow")
    spark.sql("DROP TABLE IF EXISTS graftcat.ow.t")
    spark.sql("CREATE TABLE graftcat.ow.t (id BIGINT, v DOUBLE)")
    // a fragmented low range (3 small files) + a healthy high range (1)
    (0 until 3).foreach { i =>
      spark.sql("INSERT INTO graftcat.ow.t " +
        s"SELECT /*+ COALESCE(1) */ id, CAST(id AS DOUBLE) " +
        s"FROM RANGE(${i * 10}, ${i * 10 + 10})")
    }
    spark.sql("INSERT INTO graftcat.ow.t " +
      "SELECT /*+ COALESCE(1) */ id, CAST(id AS DOUBLE) FROM RANGE(1000, 1050)")
    val dir = Paths.get(rootDir, "ow", "t")
    val highFile = Manifest.read(dir).get.entries
      .filter(_.stats.ranges.get("id").exists(_._1 >= 1000)).map(_.name)
    assert(highFile.size == 1)

    val out = spark.sql("OPTIMIZE graftcat.ow.t WHERE id < 100").collect()
    assert(out.head.getInt(0) == 3 && out.head.getInt(1) == 1,
      s"scope must be the 3 low-range files, got ${out.head}")
    val m1 = Manifest.read(dir).get
    // the out-of-scope file keeps its identity; the low range is one file
    assert(m1.entries.map(_.name).toSet.intersect(highFile.toSet) == highFile.toSet,
      "out-of-scope file must keep its identity")
    assert(m1.entries.length == 2)
    assert(spark.table("graftcat.ow.t").count() == 80L)
    assert(spark.sql("SELECT sum(id) FROM graftcat.ow.t").head().getLong(0)
      == (0L until 30L).sum + (1000L until 1050L).sum)
  }

  test("deletion vectors: DELETE is metadata + sidecar, reads skip ordinals, OPTIMIZE purges, VACUUM reaps") {
    rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.dv")
    spark.sql("DROP TABLE IF EXISTS graftcat.dv.t")
    spark.sql("CREATE TABLE graftcat.dv.t (id BIGINT, v DOUBLE) " +
      "TBLPROPERTIES ('delete.dv' = 'true')")
    (0 until 3).foreach { i =>
      spark.sql("INSERT INTO graftcat.dv.t " +
        s"SELECT /*+ COALESCE(1) */ id, CAST(id AS DOUBLE) " +
        s"FROM RANGE(${i * 30}, ${i * 30 + 30})")
    }
    val dir = Paths.get(rootDir, "dv", "t")
    val preFiles = Manifest.read(dir).get.entries.map(_.name).toSet
    val preSnap = Manifest.snapshotVersions(dir).last

    // a selective delete cuts through a file → sidecar, NOT a rewrite
    spark.sql("DELETE FROM graftcat.dv.t WHERE id IN (7, 8, 41)")
    val m1 = Manifest.read(dir).get
    assert(m1.entries.map(_.name).toSet == preFiles,
      "DV delete must not rewrite or drop data files")
    assert(m1.entries.exists(_.dv.isDefined), m1.entries.mkString("; "))
    assert(m1.entries.map(e => e.dv.map(_._2).getOrElse(0L)).sum == 3L)
    // reads skip exactly the deleted ordinals
    assert(spark.table("graftcat.dv.t").count() == 87L)
    assert(spark.sql("SELECT count(*) FROM graftcat.dv.t WHERE id IN (7, 8, 41)")
      .head().getLong(0) == 0L)
    // _pos metadata ordinals are PHYSICAL: survivors around a deleted row
    // keep their original positions
    val pos = spark.sql(
      "SELECT id, _pos FROM graftcat.dv.t WHERE id IN (6, 9) ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(pos(9L) - pos(6L) == 3L, s"physical gap must persist: $pos")
    // DESCRIBE HISTORY / DETAIL report LIVE rows
    assert(spark.sql("DESCRIBE HISTORY graftcat.dv.t").orderBy("version")
      .collect().last.getLong(2) == 87L)
    // time travel BEFORE the delete still sees all 90 rows
    assert(spark.sql(
      s"SELECT count(*) FROM graftcat.dv.t VERSION AS OF $preSnap")
      .head().getLong(0) == 90L)

    // a second delete on the same file MERGES vectors (new sidecar)
    spark.sql("DELETE FROM graftcat.dv.t WHERE id = 9")
    assert(spark.table("graftcat.dv.t").count() == 86L)
    val m2 = Manifest.read(dir).get
    assert(m2.entries.map(e => e.dv.map(_._2).getOrElse(0L)).sum == 4L)

    // zone-map-aligned deletes still drop whole files metadata-only
    spark.sql("DELETE FROM graftcat.dv.t WHERE id >= 60")
    val m3 = Manifest.read(dir).get
    assert(m3.entries.map(_.name).toSet.subsetOf(preFiles))
    assert(spark.table("graftcat.dv.t").count() == 56L)

    // OPTIMIZE compacts THROUGH the vectors and purges them
    spark.sql("OPTIMIZE graftcat.dv.t")
    val m4 = Manifest.read(dir).get
    assert(m4.entries.forall(_.dv.isEmpty), "OPTIMIZE must purge vectors")
    assert(spark.table("graftcat.dv.t").count() == 56L)
    assert(spark.sql("SELECT count(*) FROM graftcat.dv.t WHERE id IN (7, 8, 9, 41)")
      .head().getLong(0) == 0L)

    // VACUUM with the snapshots expired reaps the now-unreferenced sidecars
    spark.conf.set("spark.graft.vacuum.stagingMinAgeMs", "0")
    try spark.sql("VACUUM graftcat.dv.t RETAIN 1 SNAPSHOTS")
    finally spark.conf.unset("spark.graft.vacuum.stagingMinAgeMs")
    val dvLeft = Files.list(dir).iterator()
    val dvFiles = scala.jdk.CollectionConverters.IteratorHasAsScala(dvLeft)
      .asScala.count(_.getFileName.toString.startsWith("dv-"))
    assert(dvFiles == 0, s"$dvFiles dv sidecars survived vacuum")
    assert(spark.table("graftcat.dv.t").count() == 56L)
  }

  test("deletion-vector UPDATE: old ordinal deleted, updated copy appended, no file rewrite") {
    rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.dvu")
    spark.sql("DROP TABLE IF EXISTS graftcat.dvu.t")
    spark.sql("CREATE TABLE graftcat.dvu.t (id BIGINT, v DOUBLE) " +
      "TBLPROPERTIES ('delete.dv' = 'true')")
    (0 until 2).foreach { i =>
      spark.sql("INSERT INTO graftcat.dvu.t " +
        s"SELECT /*+ COALESCE(1) */ id, CAST(id AS DOUBLE) " +
        s"FROM RANGE(${i * 40}, ${i * 40 + 40})")
    }
    val dir = Paths.get(rootDir, "dvu", "t")
    val preFiles = Manifest.read(dir).get.entries.map(_.name).toSet
    val preSnap = Manifest.snapshotVersions(dir).last

    spark.sql("UPDATE graftcat.dvu.t SET v = v + 1000 WHERE id IN (3, 77)")
    val m1 = Manifest.read(dir).get
    // original files still referenced untouched; updated copies appended
    assert(preFiles.subsetOf(m1.entries.map(_.name).toSet),
      "DV update must keep the touched files in place")
    assert(m1.entries.map(_.name).toSet.size > preFiles.size,
      "updated copies must land as appended files")
    assert(m1.entries.filter(e => preFiles(e.name))
      .map(e => e.dv.map(_._2).getOrElse(0L)).sum == 2L)
    // row count stable, values updated, non-matching rows untouched
    assert(spark.table("graftcat.dvu.t").count() == 80L)
    val got = spark.sql(
      "SELECT id, v FROM graftcat.dvu.t WHERE id IN (3, 4, 77) ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === Seq((3L, 1003.0), (4L, 4.0), (77L, 1077.0)))
    // time travel pre-update sees the old values
    assert(spark.sql(
      s"SELECT v FROM graftcat.dvu.t VERSION AS OF $preSnap WHERE id = 3")
      .head().getDouble(0) == 3.0)
    // a second update re-reads through the vectors (no double-apply)
    spark.sql("UPDATE graftcat.dvu.t SET v = v + 1 WHERE id = 3")
    assert(spark.sql("SELECT v FROM graftcat.dvu.t WHERE id = 3")
      .head().getDouble(0) == 1004.0)
    assert(spark.table("graftcat.dvu.t").count() == 80L)
    // OPTIMIZE compacts through vectors and purges them
    spark.sql("OPTIMIZE graftcat.dvu.t")
    val m2 = Manifest.read(dir).get
    assert(m2.entries.forall(_.dv.isEmpty))
    assert(spark.table("graftcat.dvu.t").count() == 80L)
    assert(spark.sql("SELECT v FROM graftcat.dvu.t WHERE id = 3")
      .head().getDouble(0) == 1004.0)
  }

  test("deletion-vector MERGE: kept rows stay in place, deltas append, modified ordinals vector") {
    rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.dvm")
    spark.sql("DROP TABLE IF EXISTS graftcat.dvm.t")
    spark.sql("CREATE TABLE graftcat.dvm.t (k BIGINT, v DOUBLE, tag STRING) " +
      "TBLPROPERTIES ('delete.dv' = 'true')")
    (0 until 2).foreach { i =>
      spark.sql("INSERT INTO graftcat.dvm.t " +
        s"SELECT /*+ COALESCE(1) */ id, CAST(id AS DOUBLE), concat('t', id) " +
        s"FROM RANGE(${i * 50}, ${i * 50 + 50})")
    }
    val dir = Paths.get(rootDir, "dvm", "t")
    val preFiles = Manifest.read(dir).get.entries.map(_.name).toSet
    Seq((3L, 30.0, "U"), (77L, 0.0, "D"), (200L, 2.0, "I"))
      .toDF("k", "nv", "op").createOrReplaceTempView("dvm_src")

    spark.sql(
      """MERGE INTO graftcat.dvm.t t USING dvm_src s ON t.k = s.k
        |WHEN MATCHED AND s.op = 'D' THEN DELETE
        |WHEN MATCHED AND s.op = 'U' THEN UPDATE SET v = s.nv
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.nv)""".stripMargin)

    val m1 = Manifest.read(dir).get
    // both original files still referenced (kept rows stay put); the
    // changed output (1 update + 1 insert) landed as appended files
    assert(preFiles.subsetOf(m1.entries.map(_.name).toSet),
      s"DV merge must keep touched files: ${m1.entries.map(_.name)}")
    assert(m1.entries.map(_.name).toSet.size > preFiles.size)
    // one vectored ordinal per modified target row (update k=3, delete k=77)
    assert(m1.entries.filter(e => preFiles(e.name))
      .map(e => e.dv.map(_._2).getOrElse(0L)).sum == 2L)
    // row results: 100 - 1 deleted + 1 inserted
    assert(spark.table("graftcat.dvm.t").count() == 100L)
    val got = spark.sql(
      "SELECT k, v, tag FROM graftcat.dvm.t WHERE k IN (3, 4, 77, 200) ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1), Option(r.getString(2)))).toSeq
    assert(got === Seq(
      (3L, 30.0, Some("t3")), // updated in place semantics: unassigned cols kept
      (4L, 4.0, Some("t4")),  // untouched neighbor intact
      (200L, 2.0, None)))     // insert NULL-fills unmentioned tag
    // the cardinality guard still fires from the DV path's jobs
    Seq((5L, 1.0, "U"), (5L, 2.0, "U")).toDF("k", "nv", "op")
      .createOrReplaceTempView("dvm_dup")
    val card = intercept[Exception] {
      spark.sql(
        """MERGE INTO graftcat.dvm.t t USING dvm_dup s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET v = s.nv""".stripMargin)
    }
    assert(card.getMessage.contains("cardinality"), card.getMessage)
    assert(spark.sql("SELECT v FROM graftcat.dvm.t WHERE k = 5").head().getDouble(0)
      == 5.0, "failed merge must not commit")
    // OPTIMIZE purges the vectors without changing results
    spark.sql("OPTIMIZE graftcat.dvm.t")
    assert(Manifest.read(dir).get.entries.forall(_.dv.isEmpty))
    assert(spark.table("graftcat.dvm.t").count() == 100L)
    assert(spark.sql("SELECT count(*) FROM graftcat.dvm.t WHERE k = 77")
      .head().getLong(0) == 0L)
  }

  test("DV construction is distributed: the driver sees one ref per touched file, not per matched row") {
    rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.dvd")
    spark.sql("DROP TABLE IF EXISTS graftcat.dvd.t")
    spark.sql("CREATE TABLE graftcat.dvd.t (id BIGINT, v DOUBLE) " +
      "TBLPROPERTIES ('delete.dv' = 'true')")
    (0 until 3).foreach { i =>
      spark.sql("INSERT INTO graftcat.dvd.t " +
        s"SELECT /*+ COALESCE(1) */ id, CAST(id AS DOUBLE) " +
        s"FROM RANGE(${i * 1000}, ${i * 1000 + 1000})")
    }
    val dir = Paths.get(rootDir, "dvd", "t")
    assert(Manifest.read(dir).get.entries.length == 3)

    // a delete matching ~1800 rows across 2 files (neither fully covered,
    // so both take the DV path): the driver-rows spy must report 2 — the
    // per-file sidecar refs — never the 1800 matched ordinals
    ManifestTable.lastDvDriverRows.set(-1L)
    spark.sql("DELETE FROM graftcat.dvd.t WHERE id >= 100 AND id <= 1899")
    assert(spark.table("graftcat.dvd.t").count() == 1200L)
    assert(ManifestTable.lastDvDriverRows.get() == 2L,
      s"driver must see O(#touched files) refs, got ${ManifestTable.lastDvDriverRows.get()}")
    // and the sidecars really carry the 1800 ordinals
    assert(Manifest.read(dir).get.entries
      .map(e => e.dv.map(_._2).getOrElse(0L)).sum == 1800L)

    // DV UPDATE goes through the same distributed fold
    ManifestTable.lastDvDriverRows.set(-1L)
    spark.sql("UPDATE graftcat.dvd.t SET v = v + 0.5 WHERE id >= 2000 AND id <= 2499")
    assert(ManifestTable.lastDvDriverRows.get() == 1L)
    assert(spark.sql("SELECT sum(CASE WHEN v = id + 0.5 THEN 1 ELSE 0 END) " +
      "FROM graftcat.dvd.t").head().getLong(0) == 500L)

    // DV MERGE too: 300 modified rows in one file → one driver ref
    spark.range(2500, 2800).selectExpr("id AS k", "CAST(-1.0 AS DOUBLE) AS nv")
      .createOrReplaceTempView("dvd_src")
    ManifestTable.lastDvDriverRows.set(-1L)
    spark.sql(
      """MERGE INTO graftcat.dvd.t t USING dvd_src s ON t.id = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.nv""".stripMargin)
    assert(ManifestTable.lastDvDriverRows.get() == 1L)
    assert(spark.sql("SELECT count(*) FROM graftcat.dvd.t WHERE v = -1.0")
      .head().getLong(0) == 300L)
    assert(spark.table("graftcat.dvd.t").count() == 1200L)
  }

  test("MERGE cardinality counts SOURCE rows per key: duplicate target keys are legal") {
    rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.mrg3")
    spark.sql("DROP TABLE IF EXISTS graftcat.mrg3.t")
    spark.sql("CREATE TABLE graftcat.mrg3.t (k BIGINT, v DOUBLE)")
    // TWO target rows with key 5, ONE source row with key 5 — each target
    // row matches at most one source row, so ANSI says both update; the
    // old key-grouped pair count (2×1=2) spuriously rejected this
    spark.sql("INSERT INTO graftcat.mrg3.t VALUES (5, 1.0), (5, 2.0), (6, 6.0)")
    Seq((5L, 50.0)).toDF("k", "nv").createOrReplaceTempView("mrg3_src")
    spark.sql(
      """MERGE INTO graftcat.mrg3.t t USING mrg3_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.nv""".stripMargin)
    val got = spark.sql("SELECT k, v FROM graftcat.mrg3.t ORDER BY k, v")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === Seq((5L, 50.0), (5L, 50.0), (6L, 6.0)))

    // and a genuinely duplicated SOURCE key still errors
    Seq((6L, 1.0), (6L, 2.0)).toDF("k", "nv").createOrReplaceTempView("mrg3_dup")
    val card = intercept[Exception] {
      spark.sql(
        """MERGE INTO graftcat.mrg3.t t USING mrg3_dup s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET v = s.nv""".stripMargin)
    }
    assert(card.getMessage.contains("cardinality"), card.getMessage)
    assert(spark.sql("SELECT v FROM graftcat.mrg3.t WHERE k = 6").head().getDouble(0)
      == 6.0, "failed merge must not commit")
  }

  test("MERGE on a table with a data column named _file uses the whole-table path") {
    rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.mrg4")
    spark.sql("DROP TABLE IF EXISTS graftcat.mrg4.t")
    // `_file` as DATA shadows the scan's metadata column, so file-bounded
    // discovery would read garbage — the lowering must fall back to the
    // whole-table rewrite and still apply every matched update
    spark.sql("CREATE TABLE graftcat.mrg4.t (k BIGINT, v DOUBLE, `_file` STRING)")
    spark.sql("INSERT INTO graftcat.mrg4.t VALUES (1, 1.0, 'a'), (2, 2.0, 'b')")
    Seq((2L, 20.0)).toDF("k", "nv").createOrReplaceTempView("mrg4_src")
    spark.sql(
      """MERGE INTO graftcat.mrg4.t t USING mrg4_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.nv""".stripMargin)
    val got = spark.sql("SELECT k, v, `_file` FROM graftcat.mrg4.t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
    assert(got === Seq((1L, 1.0, "a"), (2L, 20.0, "b")))
  }

  test("SHALLOW CLONE strips per-query streaming epoch fences") {
    rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.cl2")
    spark.sql("DROP TABLE IF EXISTS graftcat.cl2.src")
    spark.sql("DROP TABLE IF EXISTS graftcat.cl2.dev")
    spark.sql("CREATE TABLE graftcat.cl2.src (k BIGINT)")
    spark.sql("INSERT INTO graftcat.cl2.src VALUES (1), (2)")
    // simulate a streaming writer's watermark props: the bare key AND a
    // per-query `lastEpoch.<queryId>` key — a clone inheriting either
    // would silently drop the first epochs of a resumed query as replays
    val srcDir = Paths.get(rootDir, "cl2", "src")
    val m = Manifest.read(srcDir).get
    Manifest.write(srcDir, m.copy(props = m.props +
      (Manifest.LastEpochProp -> "7") +
      (s"${Manifest.LastEpochProp}.some-query-id" -> "5")))
    spark.sql("CREATE TABLE graftcat.cl2.dev SHALLOW CLONE graftcat.cl2.src")
    val cloneProps = Manifest.read(Paths.get(rootDir, "cl2", "dev")).get.props
    assert(!cloneProps.keys.exists(k =>
      k == Manifest.LastEpochProp ||
        k.startsWith(Manifest.LastEpochProp + ".")), cloneProps)
    assert(spark.table("graftcat.cl2.dev").count() == 2L)
  }
}
