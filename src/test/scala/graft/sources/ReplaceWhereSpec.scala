package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.col

import graft.SparkSuite

/** replaceWhere (Delta's predicate overwrite, DSv2 `SupportsOverwrite`):
  * `df.writeTo(t).overwrite(cond)` atomically replaces exactly the rows
  * matching `cond` with the new data — the partition-rebuild primitive.
  * Zone maps scope the work: provably-all-matching files drop
  * metadata-only, provably-unaffected files keep their identity, only
  * genuinely cut files rewrite. */
class ReplaceWhereSpec extends SparkSuite {
  import spark.implicits._

  private lazy val rootDir = {
    val d = Files.createTempDirectory("graft_rw_").toString
    spark.conf.set("spark.sql.catalog.graftrw", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftrw.root", d)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftrw.q")
    d
  }

  test("predicate overwrite replaces matching rows, keeps the rest, and " +
    "leaves unaffected files untouched by name") {
    rootDir
    spark.sql("CREATE TABLE graftrw.q.t (day BIGINT, id BIGINT, v DOUBLE)")
    // one file per day → the zone maps can prove day boundaries
    (1L to 3L).foreach { day =>
      (1L to 10L).map(i => (day, day * 100 + i, i * 1.0)).toDF("day", "id", "v")
        .coalesce(1).writeTo("graftrw.q.t").append()
    }
    val dir = Paths.get(rootDir, "q", "t")
    val before = Manifest.read(dir).get.entries.map(_.name).toSet
    assert(before.size == 3)
    // rebuild day 2 with different content
    val day2 = (1L to 4L).map(i => (2L, 9000L + i, i * 2.0)).toDF("day", "id", "v")
    day2.coalesce(1).writeTo("graftrw.q.t").overwrite(col("day") === 2L)
    val after = Manifest.read(dir).get
    // day-1 and day-3 files survive BY NAME (zone-proven unaffected —
    // the all-matching day-2 file dropped metadata-only)
    assert(before.count(n => after.entries.map(_.name).contains(n)) == 2,
      "exactly the two unaffected day files must keep their identity")
    val got = spark.table("graftrw.q.t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (Seq(1L, 3L).flatMap(day => (1L to 10L).map(i => (day, day * 100 + i)))
      ++ (1L to 4L).map(i => (2L, 9000L + i))).toSet
    assert(got == want)
  }

  test("a cut file rewrites keeping only its non-matching rows") {
    rootDir
    spark.sql("CREATE TABLE graftrw.q.c (k STRING, v BIGINT)")
    // one file spanning both keys → the predicate CUTS it
    Seq(("a", 1L), ("b", 2L), ("a", 3L), ("b", 4L)).toDF("k", "v")
      .coalesce(1).writeTo("graftrw.q.c").append()
    Seq(("b", 100L)).toDF("k", "v").coalesce(1)
      .writeTo("graftrw.q.c").overwrite(col("k") === "b")
    assert(spark.table("graftrw.q.c").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("a", 1L), ("a", 3L), ("b", 100L)))
    // time travel still reads the pre-overwrite state
    val dir = Paths.get(rootDir, "q", "c")
    val prior = Manifest.snapshotVersions(dir).init.last
    assert(spark.read.format("graft.sources.GraftManifestSink")
      .option("path", dir.toString).option("snapshot", prior.toString)
      .load().count() == 4)
  }

  test("INSERT INTO … REPLACE WHERE is the SQL spelling of the same op") {
    rootDir
    spark.sql("CREATE TABLE graftrw.q.s (day BIGINT, v BIGINT)")
    Seq((1L, 10L), (1L, 11L), (2L, 20L), (3L, 30L)).toDF("day", "v")
      .coalesce(1).writeTo("graftrw.q.s").append()
    spark.sql(
      "INSERT INTO graftrw.q.s REPLACE WHERE day = 1 " +
        "SELECT 1L AS day, 99L AS v")
    assert(spark.table("graftrw.q.s").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 99L), (2L, 20L), (3L, 30L)))
    // VALUES form parses too
    spark.sql(
      "INSERT INTO graftrw.q.s REPLACE WHERE day = 2 VALUES (2, 7)")
    assert(spark.table("graftrw.q.s").where("day = 2").collect()
      .map(_.getLong(1)).toSeq == Seq(7L))
  }

  test("replaceWhere on an immutable tag refuses") {
    rootDir
    spark.sql("CREATE TABLE graftrw.q.tg (k STRING, v BIGINT)")
    Seq(("a", 1L)).toDF("k", "v").writeTo("graftrw.q.tg").append()
    spark.sql("ALTER TABLE graftrw.q.tg CREATE TAG rel")
    val e = intercept[Exception] {
      Seq(("a", 2L)).toDF("k", "v")
        .writeTo("graftrw.q.`tg@rel`").overwrite(col("k") === "a")
    }
    def tagMsg(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains("immutable TAG")) ||
        tagMsg(t.getCause))
    assert(tagMsg(e))
  }
}
