package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Adaptive Query Execution is the runtime half of the 100 TB skew story:
  * salting (`q_join_salted`, `q_agg_salted`) is the planned mitigation, AQE
  * is the unplanned one — a key that turns out hot at runtime gets its
  * shuffle partition SPLIT across tasks by OptimizeSkewedJoin, and
  * small post-shuffle partitions get coalesced. These tests force both on a
  * synthetic skewed join (99% of rows on one key) with the skew thresholds
  * scaled down to test-data sizes, then assert the FINAL adaptive plan
  * actually re-planned — the same mechanism, thresholds at defaults, that
  * rescues a hot-key join on a 1000-executor cluster. */
class AqeSpec extends SparkSuite {

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("OptimizeSkewedJoin splits a hot key's shuffle partition at runtime") {
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      // 99% of the left side lands on key 0 -> one shuffle partition carries
      // ~400k rows while the rest are tiny: exactly the shape AQE must split.
      val skewed = spark.range(0, 400000)
        .select((col("id") % 100).multiply(lit(0)).as("k"), col("id").as("v"))
        .union(spark.range(0, 4000).select(pmod(col("id"), lit(100)).as("k"), col("id").as("v")))
      val right = spark.range(0, 100).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = skewed.join(right, "k").select(sum(col("v") + col("w")).as("s"))
      joined.collect() // run to completion so AQE finalizes the plan
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected OptimizeSkewedJoin to mark the join skew=true:\n${finalPlan.take(2000)}")
    }
  }

  test("post-shuffle partition coalescing merges tiny partitions") {
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      // parallelismFirst keeps one partition per core on tiny inputs; turn
      // it off so the size-based target (64MB advisory) takes effect and
      // the KB-sized shuffle actually merges.
      "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64MB") {
      // 32 shuffle partitions of a few KB each -> AQE should read them as
      // far fewer coalesced partitions.
      val df = spark.range(0, 10000)
        .select(pmod(col("id"), lit(1000)).as("k"))
        .groupBy("k").agg(count(lit(1)).as("n"))
      df.collect()
      val finalPlan = df.queryExecution.executedPlan.toString
      assert(finalPlan.contains("coalesced") || finalPlan.contains("AQEShuffleRead"),
        s"expected an AQEShuffleRead with coalesced partitions:\n${finalPlan.take(2000)}")
    }
  }
}
