package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

/** Count-Min sketch: the distributed build must equal the single-partition
  * build (cell-wise merge is order-invariant), and estimates must obey the
  * CMS contract — never under, over by at most ε·N (w.h.p.). */
class CountMinSpec extends SparkSuite {
  import spark.implicits._

  test("partial sketches merge to the single-node sketch byte-for-byte") {
    val e = Tables(spark, sfDir, "events").select("user_id")
    val merged = e.repartition(8)
      .agg(CountMinAgg.build(col("user_id"))).head().getAs[Array[Byte]](0)
    val single = e.coalesce(1)
      .agg(CountMinAgg.build(col("user_id"))).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(merged, single))
  }

  test("estimates never underestimate and overshoot stays within eps*N") {
    val eps = 0.01
    val e = Tables(spark, sfDir, "events").select("user_id")
    val n = e.count()
    val sketch = e.agg(CountMinAgg.build(col("user_id"), eps = eps))
      .head().getAs[Array[Byte]](0)
    val exact = e.groupBy("user_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect()
    exact.foreach { case (uid, cnt) =>
      val est = CountMinAgg.estimate(sketch, uid)
      assert(est >= cnt, s"CMS must never underestimate (user $uid: $est < $cnt)")
      assert(est <= cnt + (eps * n).toLong,
        s"overshoot beyond eps*N for user $uid: est $est, exact $cnt")
    }
  }

  test("heavy hitters from the sketch contain every exact heavy hitter (no false negatives)") {
    val e = Tables(spark, sfDir, "events").select("user_id")
    val sketch = e.agg(CountMinAgg.build(col("user_id"), eps = 0.001))
      .head().getAs[Array[Byte]](0)
    val exact = e.groupBy("user_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect()
    val threshold = exact.map(_._2).max * 4 / 5
    val exactHeavy = exact.filter(_._2 >= threshold).map(_._1).toSet
    val cmsHeavy = exact.map(_._1)
      .filter(uid => CountMinAgg.estimate(sketch, uid) >= threshold).toSet
    // over-approximation only: everything exact-heavy must appear
    assert(exactHeavy.subsetOf(cmsHeavy))
  }
}
