package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

/** The property that makes sketches the 100 TB distinct-count tool: merging
  * per-group partials is LOSSLESS (identical registers → identical
  * estimate), so partial sketches can be stored and composed. */
class AggSketchSpec extends SparkSuite {
  import spark.implicits._

  test("hll_union_agg of per-year partials equals the single-pass sketch estimate") {
    val li = Tables(spark, sfDir, "lineitem")
    val merged = Aggs.queries("q_agg_sketch_merge")(spark, sfDir)
      .as[(String, Long)].collect().toMap
    val direct = li.groupBy("l_returnflag")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("l_partkey"))).as("est"))
      .as[(String, Long)].collect().toMap
    assert(merged === direct)

    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n")).as[(String, Long)].collect().toMap
    merged.foreach { case (flag, est) =>
      val err = math.abs(est.toDouble - exact(flag)) / exact(flag)
      assert(err < 0.05, s"$flag: estimate $est vs exact ${exact(flag)} (err $err)")
    }
  }
}
