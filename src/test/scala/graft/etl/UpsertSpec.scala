package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** MERGE semantics of Upsert.keyed: update wins on matched keys, inserts
  * append, untouched rows survive, and re-applying the same batch is a
  * no-op (idempotent merge). */
class UpsertSpec extends SparkSuite {
  import spark.implicits._

  private def base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("k", "tag", "v")

  private def batch = Seq(
    (2L, "b2", 22.0),   // update
    (9L, "new", 90.0)   // insert
  ).toDF("k", "tag", "v")

  test("update wins, insert appends, untouched rows survive") {
    val got = Upsert.keyed(base, batch, Seq("k")).orderBy("k")
      .as[(Long, String, Double)].collect().toSeq
    assert(got === Seq((1L, "a", 10.0), (2L, "b2", 22.0), (3L, "c", 30.0), (9L, "new", 90.0)))
  }

  test("merge is idempotent: re-applying the same batch changes nothing") {
    val once = Upsert.keyed(base, batch, Seq("k"))
    val twice = Upsert.keyed(once, batch, Seq("k"))
    assert(twice.orderBy("k").collect().toSeq === once.orderBy("k").collect().toSeq)
  }

  test("applyChanges: U updates, I inserts, D deletes; replay is idempotent") {
    val changes = Seq(
      (2L, "b2", 22.0, "U"),  // update
      (9L, "new", 90.0, "I"), // insert
      (3L, "c", 30.0, "D"),   // delete existing
      (8L, "x", 0.0, "D")     // delete absent key — must be a no-op
    ).toDF("k", "tag", "v", "op")
    val once = Upsert.applyChanges(base, changes, Seq("k"), "op")
    assert(once.orderBy("k").as[(Long, String, Double)].collect().toSeq ===
      Seq((1L, "a", 10.0), (2L, "b2", 22.0), (9L, "new", 90.0)))
    val twice = Upsert.applyChanges(once, changes, Seq("k"), "op")
    assert(twice.orderBy("k").collect().toSeq === once.orderBy("k").collect().toSeq)
  }

  test("composite keys merge on the full key tuple") {
    val b = Seq((1L, "x", 1.0), (1L, "y", 2.0)).toDF("k1", "k2", "v")
    val u = Seq((1L, "y", 9.0)).toDF("k1", "k2", "v")
    val got = Upsert.keyed(b, u, Seq("k1", "k2")).orderBy("k1", "k2")
      .select("v").as[Double].collect().toSeq
    assert(got === Seq(1.0, 9.0))
  }
}
