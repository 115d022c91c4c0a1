package graft.sources

import graft.{SparkSuite, Tables}

/** Bucketing = the pre-computed shuffle: both sides written into the same
  * bucket layout on the join key must join with NO Exchange. */
class BucketedJoinSpec extends SparkSuite {

  test("join of co-bucketed tables plans without a shuffle on either side") {
    // force a shuffle-based strategy so the assertion proves bucketing
    // (a broadcast join would trivially have no shuffle)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    Seq("orders_bucketed", "customer_bucketed").foreach(Sources.resetTable(spark, _))
    Sources.writeBucketed(Tables(spark, sfDir, "orders"), "orders_bucketed", "o_custkey", 8)
    Sources.writeBucketed(Tables(spark, sfDir, "customer"), "customer_bucketed", "c_custkey", 8)
    val joined = spark.table("orders_bucketed")
      .join(spark.table("customer_bucketed"),
        org.apache.spark.sql.functions.col("o_custkey") ===
          org.apache.spark.sql.functions.col("c_custkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"), plan.take(500))
    // the point: bucket layout replaces the runtime shuffle
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n${plan.take(1500)}")
    // and the result is the same as the plain join
    val expected = Tables(spark, sfDir, "orders")
      .join(Tables(spark, sfDir, "customer"),
        org.apache.spark.sql.functions.col("o_custkey") ===
          org.apache.spark.sql.functions.col("c_custkey")).count()
    assert(joined.count() === expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
