package graft

/** Deterministic perf gate (r16 — VERDICT "Next round" #2): the ten most
  * expensive bench queries' warm-run Spark job + stage counts, pinned as
  * strict equalities. Wall-clock on this VM swings 10-40× run-to-run, so
  * perf bars that ride seconds (the four-round `q_dedup_semantic ≤ 2.0 s`
  * saga) are noise; job/stage counts are a property of the executed plan
  * and reproduce exactly (verified across separate JVMs before pinning).
  * A regression that adds a shuffle, un-memoizes a fixture stage, or
  * reintroduces a per-partition driver loop moves these counts and fails
  * here deterministically — the committed JOBCOUNT_r{N}.json artifact
  * carries the full headline subset for the same reason.
  *
  * The r11 wall-clock bar restated as a budget: `q_dedup_semantic` must
  * serve in ≤ 18 jobs / ≤ 27 stages (its measured shape: banded self-join
  * + survivor anti-join over the once-materialized band rows).
  *
  * The counter ([[JobCount.measure]]) runs the body with AQE OFF: under
  * AQE, job counts are timing-dependent (stage-materialization futures
  * race with replanning — identical builds flipped 47/48 and, with
  * exchange reuse disabled, 49/50 across probed runs), so a strict pin
  * on AQE counts flakes by construction; AQE-off counts are a pure plan
  * property (probed 10/10 identical) — a complexity fingerprint, not
  * the production execution mode.
  *
  * Pins hold for the DEFAULT spec conditions (sf0.001, 4 cores); a
  * GRAFT_TEST_SF_DIR override changes data-dependent plan decisions, so
  * the suite self-skips there rather than pinning one sf's plan shape
  * against another's data. */
class JobCountSpec extends SparkSuite {

  /** (jobs, stages) of the warm second execution, measured at sf0.001 /
    * 4 cores (AQE off during measurement — see [[JobCount.measure]]). */
  private val pins: Seq[(String, Int, Int)] = Seq(
    // r16 optimization round: every pin dropped ≥1 job when Tables()
    // loads became memoized per (session, dir, table) — the parquet
    // schema-inference job was a fixed per-invocation tax; q_etl_gold
    // additionally fused its six monthly source writes into one
    // dynamic-partition pass (19 → 13). Values re-measured at the
    // default conditions after each change (OPTIMIZATION_r16.md).
    ("q_dedup_semantic", 17, 26),
    ("q_etl_gold", 13, 21),
    ("q_corpus_ingest_pipeline", 9, 17),
    ("q_dedup_semantic_incremental_asof_sql", 18, 27),
    ("q_dedup_semantic_indexed", 12, 18),
    ("q_dedup_minhash_incremental_asof_sql", 9, 17),
    ("q_dedup_semantic_incremental_sql", 17, 25),
    ("q_table_changes_mixed", 8, 24),
    ("q_dedup_minhash_incremental_sql", 8, 15),
    ("q_dedup_embedding", 5, 8),
  )

  private def defaultConditions: Boolean =
    !sys.env.contains("GRAFT_TEST_SF_DIR")

  pins.foreach { case (name, expJobs, expStages) =>
    test(s"job/stage budget: $name = $expJobs jobs / $expStages stages") {
      assume(defaultConditions,
        "pins are measured at the default sf0.001 fixture")
      // the counts are AQE-shape-dependent: pin the confs the measurement
      // was taken under (and restore, suites share the session)
      val conf = spark.conf
      val prevAqe = conf.get("spark.sql.adaptive.enabled")
      val prevShuf = conf.get("spark.sql.shuffle.partitions")
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.shuffle.partitions", "4")
      try {
        val fn = SparkEntry.queries(name)
        fn(spark, sfDir).count() // warm: codegen, fixture staging, memos
        val (jobs, stages) = JobCount.measure(spark) {
          fn(spark, sfDir).count()
        }
        assert(jobs == expJobs && stages == expStages,
          s"$name executed $jobs jobs / $stages stages, pinned " +
            s"$expJobs / $expStages — the warm plan shape changed")
      } finally {
        conf.set("spark.sql.adaptive.enabled", prevAqe)
        conf.set("spark.sql.shuffle.partitions", prevShuf)
      }
    }
  }
}
