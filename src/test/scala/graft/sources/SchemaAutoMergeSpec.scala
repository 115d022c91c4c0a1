package graft.sources

import java.nio.file.Files

import graft.SparkSuite

/** Write-time schema evolution (`spark.graft.schema.autoMerge=true`,
  * Delta's mergeSchema): an append carrying source-only columns ADDs them
  * to the table (metadata-only; existing rows NULL-fill) instead of
  * failing strict output resolution. Off by default — drift is opt-in. */
class SchemaAutoMergeSpec extends SparkSuite {
  import spark.implicits._

  private lazy val rootDir = {
    val d = Files.createTempDirectory("graft_sam_").toString
    spark.conf.set("spark.sql.catalog.graftsam", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftsam.root", d)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftsam.q")
    d
  }

  private def withAutoMerge[T](body: => T): T = {
    spark.conf.set("spark.graft.schema.autoMerge", "true")
    try body finally spark.conf.unset("spark.graft.schema.autoMerge")
  }

  test("an append with a source-only column evolves the table; old rows NULL-fill") {
    rootDir
    spark.sql("CREATE TABLE graftsam.q.t (id BIGINT, v STRING)")
    Seq((1L, "a")).toDF("id", "v").writeTo("graftsam.q.t").append()
    // OFF: the evolving write refuses with the pointer to the flag
    val e = intercept[Exception] {
      Seq((2L, "b", 9.5)).toDF("id", "v", "score")
        .writeTo("graftsam.q.t").append()
    }
    assert(e.getMessage.contains("autoMerge") ||
      e.getMessage.toLowerCase.contains("too many"))
    withAutoMerge {
      Seq((2L, "b", 9.5)).toDF("id", "v", "score")
        .writeTo("graftsam.q.t").append()
    }
    val rows = spark.table("graftsam.q.t").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    assert(rows == Seq((1L, "a", None), (2L, "b", Some(9.5))),
      s"evolved table must NULL-fill old rows, got ${rows.mkString(", ")}")
    // the evolution is durable: a later plain append sees the 3-col table
    Seq((3L, "c", 1.0)).toDF("id", "v", "score").writeTo("graftsam.q.t").append()
    assert(spark.table("graftsam.q.t").count() == 3)
  }

  test("evolution composes with identity + default columns") {
    rootDir
    spark.sql("""CREATE TABLE graftsam.q.c (
      rid BIGINT GENERATED ALWAYS AS IDENTITY,
      v STRING, tag STRING DEFAULT 'auto')""")
    withAutoMerge {
      // omits rid+tag (computed/defaulted) AND adds a fresh column
      Seq(("a", 7L)).toDF("v", "extra").writeTo("graftsam.q.c").append()
    }
    val r = spark.table("graftsam.q.c").collect().head
    assert(r.getString(1) == "a" && r.getString(2) == "auto" &&
      r.getLong(3) == 7L, s"got $r")
    assert(!r.isNullAt(0), "identity still assigns under evolution")
  }

  test("by-name writes keep aligning when the flag is on but nothing evolves") {
    rootDir
    spark.sql("CREATE TABLE graftsam.q.p (id BIGINT, v STRING)")
    withAutoMerge {
      // reversed column order must land by NAME, not position
      Seq(("x", 10L)).toDF("v", "id").writeTo("graftsam.q.p").append()
    }
    val r = spark.table("graftsam.q.p").collect().head
    assert(r.getLong(0) == 10L && r.getString(1) == "x", s"got $r")
  }

  test("EXPLAIN of an evolving write never mutates the table schema") {
    rootDir
    spark.sql("CREATE TABLE graftsam.q.ex (id BIGINT, v STRING)")
    Seq((1L, "a")).toDF("id", "v").writeTo("graftsam.q.ex").append()
    withAutoMerge {
      // planning the write (EXPLAIN runs the V2Writes rule, which builds
      // the Write) must NOT add the source-only column
      spark.sql("EXPLAIN EXTENDED INSERT INTO graftsam.q.ex BY NAME " +
        "SELECT 2L AS id, 'b' AS v, 9.5D AS score").collect()
      assert(spark.table("graftsam.q.ex").columns.toSeq == Seq("id", "v"),
        "EXPLAIN of the write must leave the schema untouched")
      // EXECUTING the same write evolves it
      spark.sql("INSERT INTO graftsam.q.ex BY NAME " +
        "SELECT 2L AS id, 'b' AS v, 9.5D AS score")
      assert(spark.table("graftsam.q.ex").columns.toSeq == Seq("id", "v", "score"),
        "executing the write must evolve the schema")
    }
  }
}
