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
    val merged = li
      .groupBy(col("l_returnflag"), year(col("l_shipdate")).as("y"))
      .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
      .groupBy("l_returnflag")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .as[(String, Long)].collect().toMap
    // the declared bound-flag form must certify exactly these groups
    val declared = Aggs.queries("q_agg_sketch_merge")(spark, sfDir)
      .as[(String, Long, Boolean)].collect()
    assert(declared.map(_._1).toSet == merged.keySet)
    assert(declared.forall(_._3), s"within_bound false: ${declared.mkString(", ")}")
    val direct = li.groupBy("l_returnflag")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("l_partkey"))).as("est"))
      .as[(String, Long)].collect().toMap
    // merged ≡ single-pass holds bit-exactly only while sketches stay in
    // SPARSE mode (small cardinalities); once dense, DataSketches' union
    // target representation can differ from the single-pass accumulator by
    // a small estimator delta (observed ~1.4% at sf0.01). The contract that
    // matters at scale: both estimates sit within the sketch's error bound
    // of exact, and within a tight band of each other.
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n")).as[(String, Long)].collect().toMap
    merged.foreach { case (flag, est) =>
      val err = math.abs(est.toDouble - exact(flag)) / exact(flag)
      assert(err < 0.05, s"$flag: merged $est vs exact ${exact(flag)} (err $err)")
      val drift = math.abs(est.toDouble - direct(flag)) / direct(flag)
      assert(drift < 0.03, s"$flag: merged $est vs single-pass ${direct(flag)}")
    }
    direct.foreach { case (flag, est) =>
      val err = math.abs(est.toDouble - exact(flag)) / exact(flag)
      assert(err < 0.05, s"$flag: single-pass $est vs exact ${exact(flag)} (err $err)")
    }
  }

  test("typed Aggregator weighted mean: merge ≡ reduce order, matches definition") {
    import graft.functions.WeightedMeanAgg
    val rows = Seq((10.0, 1.0), (20.0, 3.0), (5.5, 2.0), (0.25, 4.0))
    // driver-side definition: Σ(x·w) / Σw with scale-4 quantization
    val exp = rows.map { case (x, w) => BigDecimal(x).setScale(4) * BigDecimal(w).setScale(4) }.sum.toDouble /
      rows.map { case (_, w) => BigDecimal(w).setScale(4) }.sum.toDouble
    // reduce all in one partial
    val single = rows.foldLeft(WeightedMeanAgg.zero)(WeightedMeanAgg.reduce)
    assert(math.abs(WeightedMeanAgg.finish(single) - exp) < 1e-12)
    // split across two partials and merge — partial/final invariance
    val (l, r) = rows.splitAt(2)
    val merged = WeightedMeanAgg.merge(
      l.foldLeft(WeightedMeanAgg.zero)(WeightedMeanAgg.reduce),
      r.foldLeft(WeightedMeanAgg.zero)(WeightedMeanAgg.reduce))
    assert(WeightedMeanAgg.finish(merged) == WeightedMeanAgg.finish(single))
    // empty group → NaN, not a crash
    assert(WeightedMeanAgg.finish(WeightedMeanAgg.zero).isNaN)
    // and the declared query agrees with a direct decimal-sum formulation
    val got = Aggs.queries("q_agg_udaf")(spark, sfDir)
      .select("l_returnflag", "wavg_price").as[(String, Double)].collect().toMap
    val direct = Tables(spark, sfDir, "lineitem")
      .groupBy("l_returnflag")
      .agg((sum((col("l_extendedprice") * col("l_quantity"))
          .cast(org.apache.spark.sql.types.DecimalType(28, 4)))
          .cast(org.apache.spark.sql.types.DoubleType) /
        sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .cast(org.apache.spark.sql.types.DoubleType)).as("w"))
      .as[(String, Double)].collect().toMap
    got.foreach { case (flag, w) =>
      assert(math.abs(w - direct(flag)) < 1e-9, s"$flag: $w vs ${direct(flag)}")
    }
  }
}
