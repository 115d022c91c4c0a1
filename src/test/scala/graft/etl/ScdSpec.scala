package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** SCD Type 2 invariants (the history contract `q_scd2` relies on):
  * every changed key carries exactly its closed v1 row + one current vN row,
  * unchanged keys pass through untouched, and the current-rows projection
  * equals what a plain upsert would produce. */
class ScdSpec extends SparkSuite {

  private def dim = {
    import spark.implicits._
    Seq((1L, "A", 10.0), (2L, "B", 20.0), (3L, "C", 30.0), (4L, "D", 40.0))
      .toDF("k", "attr", "v")
  }

  private def changes = {
    import spark.implicits._
    Seq((2L, "B2", 21.0), (4L, "D2", 41.0)).toDF("k", "attr", "v")
  }

  test("changed keys get closed v1 + current vN; unchanged keys stay current v1") {
    val out = Scd.type2(dim, changes, Seq("k"), newVersion = 7).cache()
    assert(out.count() === 6) // 4 base + 2 change rows, nothing dropped

    val changed = out.filter(col("k").isin(2L, 4L))
    assert(changed.count() === 4)
    val closed = changed.filter(!col("is_current"))
    assert(closed.count() === 2)
    assert(closed.select("version").distinct().head().getInt(0) === 1)
    assert(closed.select("valid_to").distinct().head().getInt(0) === 7)
    val current = changed.filter(col("is_current"))
    assert(current.select("version").distinct().head().getInt(0) === 7)
    assert(current.select("attr").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().sorted === Array("B2", "D2"))

    val unchanged = out.filter(col("k").isin(1L, 3L))
    assert(unchanged.count() === 2)
    assert(unchanged.filter(col("is_current") && col("version") === 1 &&
      col("valid_to").isNull).count() === 2)
  }

  test("current-rows projection of SCD2 equals the plain keyed upsert") {
    val scdCurrent = Scd.type2(dim, changes, Seq("k"), newVersion = 2)
      .filter(col("is_current"))
      .select("k", "attr", "v")
    val upserted = Upsert.keyed(dim, changes, Seq("k"))
    assert(scdCurrent.exceptAll(upserted).isEmpty &&
      upserted.exceptAll(scdCurrent).isEmpty)
  }
}
