package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSuite

/** Immutable tag refs ([[Tag]]): `ALTER TABLE t CREATE TAG r` pins a
  * snapshot readable forever as `` t@r `` — writes refuse, VACUUM keeps
  * the pinned files until DROP TAG, and a training run can record the
  * tag it read for exact reproducibility. */
class TagSpec extends SparkSuite {
  import spark.implicits._

  private lazy val rootDir = {
    val d = Files.createTempDirectory("graft_tag_").toString
    spark.conf.set("spark.sql.catalog.grafttag", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.grafttag.root", d)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS grafttag.q")
    d
  }

  test("tag round-trip: pin, diverge, read pinned, survive vacuum, drop") {
    rootDir
    spark.sql("CREATE TABLE grafttag.q.t (id BIGINT, v DOUBLE)")
    val dir = Paths.get(rootDir, "q", "t")
    (1L to 5L).map(i => (i, i * 1.0)).toDF("id", "v").coalesce(1)
      .writeTo("grafttag.q.t").append()
    val r = spark.sql("ALTER TABLE grafttag.q.t CREATE TAG r1").collect().head
    assert(r.getString(1) == "create")
    val pinned = r.getInt(2)
    // the table moves on: append + delete + OPTIMIZE rewrite the layout
    (6L to 8L).map(i => (i, i * 1.0)).toDF("id", "v").coalesce(1)
      .writeTo("grafttag.q.t").append()
    spark.sql("DELETE FROM grafttag.q.t WHERE id IN (2, 7)")
    spark.sql("OPTIMIZE grafttag.q.t")
    // the tag still reads EXACTLY the pinned snapshot
    assert(spark.table("grafttag.q.`t@r1`").orderBy("id")
      .collect().map(_.getLong(0)).toSeq == (1L to 5L))
    assert(spark.table("grafttag.q.t").count() == 6)
    // SHOW TAGS reports the pin
    val st = spark.sql("SHOW TAGS grafttag.q.t").collect()
    assert(st.map(r2 => (r2.getString(0), r2.getInt(1), r2.getLong(2))).toSeq ==
      Seq(("r1", pinned, 5L)))
    // a deep vacuum (expire all but current snapshot, age guard off)
    // keeps the tag's files reachable
    spark.conf.set("spark.graft.vacuum.stagingMinAgeMs", "0")
    try spark.sql("VACUUM grafttag.q.t RETAIN 1 SNAPSHOTS").collect()
    finally spark.conf.unset("spark.graft.vacuum.stagingMinAgeMs")
    assert(spark.table("grafttag.q.`t@r1`").count() == 5,
      "vacuum must keep tag-pinned files")
    // drop reaps the ref; a second deep vacuum may now collect
    spark.sql("ALTER TABLE grafttag.q.t DROP TAG r1")
    intercept[Exception](spark.table("grafttag.q.`t@r1`").count())
    spark.conf.set("spark.graft.vacuum.stagingMinAgeMs", "0")
    try spark.sql("VACUUM grafttag.q.t RETAIN 1 SNAPSHOTS").collect()
    finally spark.conf.unset("spark.graft.vacuum.stagingMinAgeMs")
    assert(spark.table("grafttag.q.t").count() == 6,
      "main must be intact after the post-drop vacuum")
  }

  test("tags are immutable: every write surface refuses") {
    rootDir
    spark.sql("CREATE TABLE grafttag.q.im (id BIGINT, v DOUBLE)")
    (1L to 3L).map(i => (i, i * 1.0)).toDF("id", "v").coalesce(1)
      .writeTo("grafttag.q.im").append()
    spark.sql("ALTER TABLE grafttag.q.im CREATE TAG rel")
    def refused(f: => Any): Unit = {
      val e = intercept[Exception](f)
      def tagMsg(t: Throwable): Boolean =
        t != null && (Option(t.getMessage).exists(_.contains("immutable TAG")) ||
          tagMsg(t.getCause))
      assert(tagMsg(e), s"expected immutable-TAG refusal, got: $e")
    }
    refused(Seq((9L, 9.0)).toDF("id", "v").writeTo("grafttag.q.`im@rel`").append())
    refused(spark.sql("DELETE FROM grafttag.q.`im@rel` WHERE id = 1"))
    refused(spark.sql("UPDATE grafttag.q.`im@rel` SET v = 0 WHERE id = 1"))
    refused(spark.sql("OPTIMIZE grafttag.q.`im@rel`"))
    refused(spark.sql(
      "ALTER TABLE grafttag.q.`im@rel` SET TBLPROPERTIES ('x' = 'y')"))
    // the tag still reads
    assert(spark.table("grafttag.q.`im@rel`").count() == 3)
  }

  test("RENAME TABLE re-points nested refs: tags and branches survive") {
    rootDir
    spark.sql("CREATE TABLE grafttag.q.rn (id BIGINT)")
    Seq(1L, 2L, 3L).toDF("id").coalesce(1).writeTo("grafttag.q.rn").append()
    spark.sql("ALTER TABLE grafttag.q.rn CREATE TAG rel")
    spark.sql("ALTER TABLE grafttag.q.rn CREATE BRANCH dev")
    Seq(4L).toDF("id").coalesce(1).writeTo("grafttag.q.`rn@dev`").append()
    spark.sql("ALTER TABLE grafttag.q.rn RENAME TO q.rn2")
    // both refs resolve their data through the MOVED parent
    assert(spark.table("grafttag.q.`rn2@rel`").count() == 3,
      "the tag must survive the rename")
    assert(spark.table("grafttag.q.`rn2@dev`").count() == 4,
      "the branch must survive the rename")
    assert(spark.table("grafttag.q.rn2").count() == 3)
  }

  test("SHALLOW CLONE of a tag yields a WRITABLE fork of the pinned state") {
    rootDir
    spark.sql("CREATE TABLE grafttag.q.cl (id BIGINT)")
    Seq(1L, 2L, 3L).toDF("id").coalesce(1).writeTo("grafttag.q.cl").append()
    spark.sql("ALTER TABLE grafttag.q.cl CREATE TAG rel")
    Seq(4L).toDF("id").coalesce(1).writeTo("grafttag.q.cl").append()
    // fork the tagged state: the reproducible-experiment workflow
    spark.sql("CREATE TABLE grafttag.q.exp SHALLOW CLONE grafttag.q.`cl@rel`")
    assert(spark.table("grafttag.q.exp").count() == 3,
      "the clone must read the PINNED state, not the moved-on table")
    // ...and it is writable (the pin prop must not ride into the clone)
    Seq(99L).toDF("id").coalesce(1).writeTo("grafttag.q.exp").append()
    spark.sql("DELETE FROM grafttag.q.exp WHERE id = 1")
    assert(spark.table("grafttag.q.exp").collect().map(_.getLong(0)).toSet ==
      Set(2L, 3L, 99L))
    // the tag itself stays immutable and intact
    assert(spark.table("grafttag.q.`cl@rel`").count() == 3)
  }

  test("AS OF VERSION pins an archived snapshot; ref names are exclusive") {
    rootDir
    spark.sql("CREATE TABLE grafttag.q.v (id BIGINT)")
    val dir = Paths.get(rootDir, "q", "v")
    Seq(1L, 2L).toDF("id").coalesce(1).writeTo("grafttag.q.v").append()
    val v1 = Manifest.snapshotVersions(dir).last
    Seq(3L).toDF("id").coalesce(1).writeTo("grafttag.q.v").append()
    spark.sql(s"ALTER TABLE grafttag.q.v CREATE TAG old AS OF VERSION $v1")
    assert(spark.table("grafttag.q.`v@old`").count() == 2)
    // tag and branch names share the @ namespace
    intercept[Exception](
      spark.sql("ALTER TABLE grafttag.q.v CREATE BRANCH old"))
    spark.sql("ALTER TABLE grafttag.q.v CREATE BRANCH dev")
    intercept[Exception](
      spark.sql("ALTER TABLE grafttag.q.v CREATE TAG dev"))
  }
}
