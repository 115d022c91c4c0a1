package graft

/** Physical-plan audits: the scale properties the engine is designed around
  * must be visible in the plans Catalyst actually produces, not just
  * intended. Planning is cheap (no execution), so every declared query gets
  * a no-cartesian check, and the load-bearing queries get specific operator
  * assertions. */
class PlanSpec extends SparkSuite {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("broadcast dim joins plan as BroadcastHashJoin, not a shuffle join") {
    val p = plan("q_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"), "dim chain must not sort-merge")
  }

  test("decontamination joins the eval gram set as a broadcast, never sort-merge") {
    // The corpus side must not shuffle for the membership test: the eval
    // gram table is the broadcast build side, so the explode → join is
    // map-side and only matched grams reach the per-doc aggregation.
    val p = plan("q_text_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin"), "eval gram set must broadcast")
  }

  test("global top-k plans as TakeOrderedAndProject (bounded heap, no global sort)") {
    val p = plan("q_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }

  test("timestamp range predicates push down to the parquet scan") {
    val p = plan("q_prune_files")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate")
      || p.contains("GreaterThanOrEqual(l_shipdate"), p.take(1200))
  }

  test("YearPredicateRewrite makes year(ts)=Y sargable: range reaches the scan as PushedFilters") {
    val p = plan("q_prune_year")
    assert(p.contains("GreaterThanOrEqual(l_shipdate") && p.contains("LessThan(l_shipdate"),
      p.take(1200))
    assert(!p.toLowerCase.contains("year(l_shipdate"),
      "year() must have been rewritten out of the predicate")
  }

  test("column pruning reaches the scan: projection-only query reads only its columns") {
    val p = plan("q_scan_parquet")
    assert(p.contains("ReadSchema"), p.take(800))
    val readSchema = p.split("ReadSchema: ").last.takeWhile(_ != '\n')
    assert(readSchema.contains("l_orderkey") && !readSchema.contains("l_shipdate"),
      s"scan should read 4 columns, got: $readSchema")
  }

  test("aggregations are partial+final (map-side combine before the shuffle)") {
    val p = plan("q_agg_multi")
    assert("HashAggregate".r.findAllIn(p).length >= 2, p.take(800))
  }

  test("similarity probe is broadcast — fact side never shuffles") {
    val p = plan("q_similarity_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p.take(800))
    assert(p.contains("TakeOrderedAndProject"), "top-k must stay a bounded heap")
  }

  test("bucketized range join plans as BroadcastHashJoin, not nested-loop") {
    val p = plan("q_join_range")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "range join must go through the bucket equi-key")
  }

  test("custom expressions are registered as SQL functions via SparkSessionExtensions") {
    val r = spark.sql(
      """SELECT fixed_point_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                       array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT))) AS d,
        |       simhash_pack(shingle_poly_hashes(array('a', 'b', 'a'), 1)) AS sh,
        |       sorted_array_intersect_count(array(1L, 5L, 9L), array(5L, 9L, 12L)) AS ic
        |""".stripMargin).head()
    assert(r.getDouble(0) === 9.0)
    assert(r.getLong(1) > 0L)
    assert(r.getInt(2) === 2)
  }

  test("upsert plans as union + single keyed shuffle, not a join") {
    val p = plan("q_merge_upsert")
    assert(p.contains("Union"), p.take(800))
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "merge must not plan a join — union + keep-winner is one shuffle")
    assert(p.contains("Exchange hashpartitioning(o_orderkey"), p.take(1200))
  }

  test("bloom semi-join: probe filters the fact side before a broadcast semi-join") {
    val p = plan("q_join_bloom")
    assert(p.toLowerCase.contains("bloom_might_contain") ||
      p.toLowerCase.contains("bloommightcontain"), p.take(1200))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p.take(1200))
  }

  test("sequence packing: prefix sum runs as range-partitioned windows, never one global partition") {
    val p = plan("q_corpus_pack")
    assert(p.contains("Exchange hashpartitioning(part"), p.take(1200))
    assert(!p.contains("Window [") || !p.contains("Exchange SinglePartition"),
      "no single-partition global window allowed")
  }

  test("sessionize shuffles the fact table once: both windows and the aggregate share one user_id exchange") {
    val p = plan("q_sessionize")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).length === 1, p.take(1500))
  }

  test("z-score stats and bin edges come back via broadcast — facts never shuffle for the join") {
    val pz = plan("q_feature_zscore")
    assert(pz.contains("BroadcastExchange"), pz.take(1000))
    assert(!pz.contains("SortMergeJoin"), "stats join-back must broadcast")
    val pb = plan("q_feature_bins")
    assert(pb.contains("BroadcastExchange"), pb.take(1000))
  }

  test("scd2 plans as union + single keyed shuffle, not a join") {
    val p = plan("q_scd2")
    assert(p.contains("Union"), p.take(800))
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "scd2 must not plan a join — union + one keyed window")
    assert("Exchange hashpartitioning\\(c_custkey".r.findAllIn(p).length === 1, p.take(1500))
  }

  test("bigram top-100 stays a bounded heap over a codegen'd generator") {
    val p = plan("q_text_bigrams")
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
    assert(p.contains("Generate"), "bigrams must come from a per-row Generate")
  }

  test("join strategy hints steer the planner: BROADCAST and SHUFFLE_MERGE are honored") {
    val o = SparkEntry.queries("q_scan_parquet")(spark, sfDir)
      .select("l_orderkey", "l_quantity")
    val dim = spark.range(0, 50).selectExpr("id AS l_orderkey", "id * 2 AS w")
    val broadcastPlan = o.join(dim.hint("broadcast"), "l_orderkey")
      .queryExecution.executedPlan.toString
    assert(broadcastPlan.contains("BroadcastHashJoin"), broadcastPlan.take(800))
    val mergePlan = o.join(dim.hint("shuffle_merge"), "l_orderkey")
      .queryExecution.executedPlan.toString
    assert(mergePlan.contains("SortMergeJoin"), mergePlan.take(800))
  }

  test("cdc apply plans as union + single keyed shuffle, not a join") {
    val p = plan("q_cdc_apply")
    assert(p.contains("Union"), p.take(800))
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "cdc apply must not plan a join — union + keep-winner + D-filter is one shuffle")
    assert("Exchange hashpartitioning\\(o_orderkey".r.findAllIn(p).length === 1, p.take(1500))
  }

  test("bigram token array binds as an attribute — split is not inlined per element") {
    val p = SparkEntry.queries("q_text_bigrams")(spark, sfDir)
      .queryExecution.optimizedPlan.toString
    assert("split\\(".r.findAllIn(p).length <= 2,
      s"split() must be materialized once, not re-run per lambda element:\n${p.take(1200)}")
  }

  test("attribution and PIT join plan as window carries — no event self-join") {
    Seq("q_attribution", "q_join_pit").foreach { q =>
      val p = plan(q)
      assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
        s"$q plans a join of the event table against itself:\n" + p.take(1200))
      assert(p.contains("Window"), s"$q lost its window carry")
    }
  }

  test("target encoding and revenue share broadcast their 1-row denominators") {
    Seq("q_feature_target_encode", "q_revenue_share").foreach { q =>
      val p = plan(q)
      assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
        s"$q does not broadcast the global aggregate:\n" + p.take(1200))
      assert(!p.contains("SortMergeJoin"), s"$q shuffles for a 1-row join")
    }
  }

  test("dynamic partition pruning fires on the day-partitioned fact scan") {
    val p = plan("q_join_dpp")
    assert(p.toLowerCase.contains("dynamicpruning"),
      "fact scan carries no dynamic-pruning subquery:\n" + p.take(1500))
  }

  test("boilerplate detection broadcasts the top-30 and bounds its output heap") {
    val p = plan("q_text_boilerplate")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "the common-trigram array must broadcast:\n" + p.take(1200))
    assert(p.contains("TakeOrderedAndProject"),
      "the top-50 output must be a bounded heap, not a global sort")
    assert(!p.contains("SortMergeJoin"),
      "the corpus must never shuffle for the membership test")
  }

  test("the managed embeddings table plans like the raw one: broadcast " +
    "probe + bounded top-k heap") {
    val p = plan("q_embed_table")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "the probe row must broadcast:\n" + p.take(1200))
    assert(p.contains("TakeOrderedAndProject"), "top-k must be a bounded heap")
    assert(!p.contains("SortMergeJoin"), "the vector scan must not shuffle")
  }

  test("no declared query plans a CartesianProduct") {
    // q_etl_gold excluded: building its DataFrame executes the pipeline
    // writes (covered by EtlSpec); everything else must plan shuffle- or
    // broadcast-based joins only.
    SparkEntry.queries.keys.filterNot(_ == "q_etl_gold").foreach { name =>
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian product")
    }
  }
}
