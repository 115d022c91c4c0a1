package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

class BloomFilterJoinSpec extends SparkSuite {
  import spark.implicits._

  private def dimKeys = Tables(spark, sfDir, "customer")
    .filter(col("c_mktsegment") === "BUILDING")
    .select("c_custkey")

  private def orders = Tables(spark, sfDir, "orders")

  test("bloom pre-filter has no false negatives and strictly reduces the fact side") {
    val bytes = dimKeys
      .agg(BloomFilterJoin.build(col("c_custkey"), 1 << 16, 0.01).as("bf"))
      .head().getAs[Array[Byte]](0)
    val pass = orders.filter(BloomFilterJoin.mightContain(lit(bytes), col("o_custkey")))
    val trueMatches = orders.join(dimKeys,
      col("o_custkey") === col("c_custkey"), "left_semi")
    // every true match survives the bloom
    assert(trueMatches.join(pass, Seq("o_orderkey"), "left_anti").count() === 0)
    // and the filter actually drops most non-matching rows (5 segments →
    // ~20% selectivity; 1% fpp adds almost nothing)
    val n = orders.count()
    assert(pass.count() < n / 2, s"bloom pass-through ${pass.count()} of $n")
  }

  test("reduced semi-join equals the plain semi-join exactly") {
    val reduced = BloomFilterJoin
      .semiJoinReduced(orders, "o_custkey", dimKeys, "c_custkey")
      .select("o_orderkey").as[Long].collect().sorted.toSeq
    val plain = orders.join(dimKeys,
        col("o_custkey") === col("c_custkey"), "left_semi")
      .select("o_orderkey").as[Long].collect().sorted.toSeq
    assert(reduced === plain)
  }

  test("partial filters merge across partitions (distributed build = single-node build)") {
    val keys = (1L to 1000L).toDF("k")
    val merged = keys.repartition(8)
      .agg(BloomFilterJoin.build(col("k"), 2000, 0.01)).head().getAs[Array[Byte]](0)
    val single = keys.coalesce(1)
      .agg(BloomFilterJoin.build(col("k"), 2000, 0.01)).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(merged, single),
      "bitwise-OR merge must be partitioning-invariant")
  }

  test("null keys probe to null and are filtered out, not matched") {
    val bytes = Seq(1L, 2L).toDF("k")
      .agg(BloomFilterJoin.build(col("k"), 100, 0.01)).head().getAs[Array[Byte]](0)
    val df = Seq(Some(1L), Some(99L), None).toDF("k")
    val rows = df.filter(BloomFilterJoin.mightContain(lit(bytes), col("k"))).collect()
    assert(!rows.exists(_.isNullAt(0)), "null key must not pass the bloom filter")
    assert(rows.map(_.getLong(0)).contains(1L), "present key must pass (no false negatives)")
  }
}
