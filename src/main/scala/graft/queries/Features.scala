package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType, LongType, StringType}

import graft.Tables

/** Feature-engineering surface — the per-column transforms a training-data
  * pipeline runs between ingest and model input (generalizes the reference's
  * derived-column stage, pasta2_pipelines/src/main.py:~40, from calendar
  * fields to statistical features):
  *
  *  - group-wise z-score normalization (`q_feature_zscore`);
  *  - global quantile binning / discretization (`q_feature_bins`);
  *  - one-pass column profiling — the ANALYZE-style data-quality report
  *    every ingest job emits (`q_profile`).
  *
  * Scale design: all three are one aggregate pass over the fact table plus
  * per-row arithmetic. The z-score stats and bin boundaries are tiny frames
  * broadcast back against the facts — the fact table never shuffles. The
  * power sums and counts are trivially mergeable partials: on a
  * 1000-executor cluster each of these runs as one map-side-combined
  * aggregate, one broadcast, one embarrassingly-parallel projection.
  *
  * Determinism: moments accumulate in fixed-point (floor(x·1e6) summed as
  * BIGINT — order-independent, engine-portable per the repo's parity rules;
  * the 1e-6 quantization is the documented contract of the op), and the
  * closed forms are evaluated in DOUBLE over identical operands so both
  * engines emit identical bits. Bin edges use exact interpolated
  * percentiles (Spark `percentile` ≡ DuckDB `quantile_cont`, bit-exact).
  */
object Features extends QueryModule {

  private val Fp = 1000000L // 1e6 fixed-point scale for moment sums

  def queries: Map[String, Q] = Map(
    // Per-event-type standardization: exact fixed-point power sums →
    // mean/std in closed form → broadcast join-back → per-row (x-µ)/σ.
    // Spark's builtin stddev streams doubles in partial order (correct but
    // not cross-engine reproducible); the fixed-point sums are the
    // deterministic, mergeable form.
    "q_feature_zscore" -> ((s, d) => {
      val e = Tables(s, d, "events")
      val sv6 = col("sv6").cast(DoubleType) / lit(1e6)
      val svv6 = col("svv6").cast(DoubleType) / lit(1e6)
      val stats = e.groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(floor(col("value") * Fp).cast(LongType)).as("sv6"),
          sum(floor(col("value") * col("value") * Fp).cast(LongType)).as("svv6"))
        .select(col("event_type"),
          (sv6 / col("n")).as("mean_v"),
          sqrt((svv6 - sv6 * sv6 / col("n")) / (col("n") - 1)).as("std_v"))
      e.join(broadcast(stats), Seq("event_type"))
        .select(col("event_id"), col("event_type"), col("value"),
          ((col("value") - col("mean_v")) / col("std_v")).as("z"))
        .orderBy("event_id")
    }),

    // Quantile discretization: one exact-percentile pass yields the
    // [p25, p50, p75] edges; every row is then binned by comparison against
    // the broadcast edges (a codegen'd CASE chain, no shuffle of facts).
    "q_feature_bins" -> ((s, d) => {
      val o = Tables(s, d, "orders")
      // ONE percentile buffer for all three edges (percentile over an
      // array of fractions) — three separate aggregates each built their
      // own copy of the full value buffer
      val edges = o.agg(
        percentile(col("o_totalprice"), array(lit(0.25), lit(0.5), lit(0.75))).as("qs"))
        .select(element_at(col("qs"), 1).as("q1"),
          element_at(col("qs"), 2).as("q2"),
          element_at(col("qs"), 3).as("q3"))
      o.crossJoin(broadcast(edges))
        .withColumn("bin",
          when(col("o_totalprice") <= col("q1"), 0)
            .when(col("o_totalprice") <= col("q2"), 1)
            .when(col("o_totalprice") <= col("q3"), 2)
            .otherwise(3).cast(IntegerType))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"),
          min("o_totalprice").as("lo"),
          max("o_totalprice").as("hi"),
          Det.dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("bin")
    }),

    // ANALYZE-style profile of `orders`: per column the non-null count,
    // distinct count, and min/max rendered to engine-portable strings
    // (numerics via DECIMAL(18,4) — both engines print all scale digits;
    // timestamps via an explicit format). One single-distinct aggregate
    // branch PER COLUMN, unioned: packing all six distinct counts into one
    // aggregate made Catalyst plan a 7-way Expand (the shuffle carried 7×
    // the fact rows — the round-3 bench's 3.5 s outlier); per-column
    // branches each get the efficient two-phase partial-distinct plan, and
    // each branch's parquet scan prunes to exactly its one column, so the
    // total bytes read match the single wide scan.
    "q_profile" -> ((s, d) => {
      val o = Tables(s, d, "orders")
      def decS(c: String, agg: String) =
        s"CAST(CAST($agg($c) AS DECIMAL(18,4)) AS STRING)"
      def tsS(c: String, agg: String) =
        s"date_format($agg($c), 'yyyy-MM-dd HH:mm:ss')"
      def strS(c: String, agg: String) = s"$agg($c)"
      val cols = Seq( // (name, min/max renderer)
        ("o_orderkey", decS _), ("o_custkey", decS _), ("o_totalprice", decS _),
        ("o_orderdate", tsS _), ("o_orderstatus", strS _), ("o_orderpriority", strS _))
      val branches = cols.map { case (c, r) =>
        o.agg(
            expr(s"count($c)").as("n_nonnull"),
            expr(s"count(distinct $c)").as("n_distinct"),
            expr(r(c, "min")).as("min_s"),
            expr(r(c, "max")).as("max_s"))
          .select(lit(c).as("col_name"), col("n_nonnull"), col("n_distinct"),
            col("min_s"), col("max_s"))
      }
      val nRows = o.agg(count(lit(1)).as("n_rows"))
      branches.reduce(_ unionAll _)
        .crossJoin(broadcast(nRows))
        .select(col("n_rows"), col("col_name"), col("n_nonnull"),
          col("n_distinct"), col("min_s"), col("max_s"))
        .orderBy("col_name")
    }),

    // FEATURE HASHING (the "hashing trick"): each document's bag of words
    // mapped into a fixed 16-dim count vector by token hash — the
    // vocabulary-free featurization step (no dictionary build, no shuffle:
    // the whole vector is per-row arithmetic over the codegen'd token-hash
    // array, so at 100 TB it runs embarrassingly parallel in the scan).
    // Declared output is the 16 bucket counts as scalar columns (driver
    // comparator takes no arrays) plus the token count.
    "q_feature_hash" -> ((s, d) => {
      val NB = 16
      val hs = graft.functions.ShingleHashes.shingles(split(col("text"), " "), 1)
      val base = Tables(s, d, "documents").select(col("doc_id"), hs.as("hs"))
      base.select(
        col("doc_id") +: size(col("hs")).as("n_tok") +:
          (0 until NB).map(b =>
            size(filter(col("hs"), h => pmod(h, lit(NB)) === lit(b))).as(s"f$b")): _*)
        .orderBy("doc_id")
    }),

    // Per-group closed-form OLS regression (price on quantity): slope,
    // intercept and R² from the exact DECIMAL power sums (n, Σx, Σy, Σxx,
    // Σxy, Σyy) — one partial+final hash aggregate, trivially mergeable at
    // 1000 executors; the closed form evaluates in DOUBLE over identical
    // operands on both engines (same long-units conversion as q_agg_stats —
    // DuckDB's DECIMAL→DOUBLE cast is not correctly rounded above 2^53).
    // This is the regr_slope/regr_intercept/regr_r2 family with a
    // cross-engine-deterministic accumulation.
    "q_regr_ols" -> ((s, d) => {
      val DecSq = DecimalType(28, 4)
      def dss(a: String, b: String) =
        (sum((col(a) * col(b)).cast(DecSq)) * 10000).cast(LongType)
          .cast(DoubleType) / 1e4
      val nD = col("n").cast(DoubleType)
      val covN = nD * col("sxy") - col("sum_x") * col("sum_y")   // n²·cov
      val varXN = nD * col("sxx") - col("sum_x") * col("sum_x")  // n²·var(x)
      val varYN = nD * col("syy") - col("sum_y") * col("sum_y")  // n²·var(y)
      Tables(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          Det.dsum(col("l_quantity")).as("sum_x"),
          Det.dsum(col("l_extendedprice")).as("sum_y"),
          dss("l_quantity", "l_quantity").as("sxx"),
          dss("l_quantity", "l_extendedprice").as("sxy"),
          dss("l_extendedprice", "l_extendedprice").as("syy"))
        .select(col("l_returnflag"), col("n"),
          (covN / varXN).as("slope"),
          ((col("sum_y") - (covN / varXN) * col("sum_x")) / nD).as("intercept"),
          (covN * covN / (varXN * varYN)).as("r2"))
        .orderBy("l_returnflag")
    }),

    // Robust outlier detection (median absolute deviation): per event type,
    // med = median(value), MAD = median(|value − med|), outlier ⇔
    // |value − med| > 3·MAD. Unlike the z-score this doesn't let the
    // outliers inflate their own threshold. Two exact-percentile aggregates
    // with the 5-row stats frames broadcast back — the fact table shuffles
    // only for the percentile passes, never row-vs-row. At 100 TB swap
    // `percentile` for `approx_percentile` (mergeable t-digest) — same plan
    // shape.
    "q_anomaly_mad" -> ((s, d) => {
      val e = Tables(s, d, "events")
      val med = e.groupBy("event_type")
        .agg(percentile(col("value"), lit(0.5)).as("med_v"))
      val dev = e.join(broadcast(med), Seq("event_type"))
        .withColumn("dev", abs(col("value") - col("med_v")))
      val mad = dev.groupBy("event_type")
        .agg(percentile(col("dev"), lit(0.5)).as("mad_v"))
      dev.join(broadcast(mad), Seq("event_type"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          max(col("med_v")).as("med_v"),
          max(col("mad_v")).as("mad_v"),
          count_if(col("dev") > lit(3.0) * col("mad_v")).as("n_outliers"))
        .orderBy("event_type")
    }),

    // TARGET ENCODING with Bayesian smoothing — the categorical-feature
    // workhorse: each category's target mean shrunk toward the global mean
    // by a prior of weight M, enc = (Σ_cat + M·µ_global) / (n_cat + M), so
    // rare categories don't memorize their few labels. One exact-decimal
    // aggregate per side; the output IS the encoder table (tiny — broadcast
    // join-back against the facts is the application step at 100 TB).
    "q_feature_target_encode" -> ((s, d) => {
      val M = 10.0
      val o = Tables(s, d, "orders")
      val glob = o.agg(Det.dsum(col("o_totalprice")).as("gsum"),
        count(lit(1)).as("gn"))
      o.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), Det.dsum(col("o_totalprice")).as("csum"))
        .crossJoin(broadcast(glob))
        .select(col("o_orderpriority"), col("n"),
          ((col("csum") + lit(M) * (col("gsum") / col("gn")))
            / (col("n") + lit(M))).as("enc"))
        .orderBy("o_orderpriority")
    }),

    // Data-quality rule battery — the Deequ-style constraint suite an
    // ingest job runs before publishing a table: one row per rule with its
    // violation count and pass/fail. Rules: primary-key uniqueness,
    // referential integrity (orders→customer), value range, accepted
    // value set, completeness, and non-empty volume. Scale shape: one
    // single-pass aggregate over the fact scan (all per-row predicates
    // map-side-combined, the distinct count is the only expand) plus one
    // anti-join count against the broadcast dimension key set; the two
    // 1-row frames cross-join for free and stack() unpivots driver-free.
    "q_dq_checks" -> ((s, d) => {
      val o = Tables(s, d, "orders")
      val scanStats = o.agg(
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v_dup_key"),
        count_if(col("o_totalprice") <= 0.0).as("v_price_range"),
        count_if(!col("o_orderstatus").isin("O", "F", "P")).as("v_status_set"),
        count_if(col("o_orderpriority").isNull).as("v_null_priority"))
      val orphans = o.join(
          Tables(s, d, "customer").select(col("c_custkey")),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("v_orphan_fk"))
      scanStats.crossJoin(orphans)
        .select(expr(
          """stack(6,
            |  'has_rows',        CAST(CASE WHEN n_rows > 0 THEN 0 ELSE 1 END AS BIGINT),
            |  'pk_unique',       v_dup_key,
            |  'fk_customer',     v_orphan_fk,
            |  'price_positive',  v_price_range,
            |  'status_in_set',   v_status_set,
            |  'priority_complete', v_null_priority
            |) AS (rule, violations)""".stripMargin))
        .select(col("rule"), col("violations").cast(LongType).as("violations"),
          (col("violations") === 0).as("ok"))
        .orderBy("rule")
    }),

    // K-ANONYMITY audit — the privacy gate a training-data release runs
    // beside PII redaction (C6): group the table by its quasi-identifier
    // tuple (here event_type × day) and report the equivalence-class
    // profile: k = the smallest class (any class < k re-identifies),
    // classes and rows below the k = 5 release bar. One partial+final
    // aggregate over the QI key then a 1-row rollup of the (bounded)
    // class frame — two shuffles total, no row ever leaves its partition
    // unaggregated. At 100 TB the QI cardinality (types × days) is the
    // only state.
    "q_privacy_kanon" -> ((s, d) => {
      val K = 5
      Tables(s, d, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("class_size"))
        .agg(count(lit(1)).as("n_classes"),
          min("class_size").as("k_anonymity"),
          count_if(col("class_size") < K).as("classes_below_k"),
          // coalesce mirrors the oracle's COALESCE: sum over zero classes
          // is NULL in both engines, reported as 0 rows at risk
          coalesce(sum(when(col("class_size") < K, col("class_size")).otherwise(0L)),
            lit(0L)).as("rows_at_risk"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q_privacy_kanon" ->
      """WITH c AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS class_size
        |  FROM events GROUP BY 1, 2)
        |SELECT COUNT(*) AS n_classes,
        |  min(class_size) AS k_anonymity,
        |  COUNT(*) FILTER (WHERE class_size < 5) AS classes_below_k,
        |  CAST(COALESCE(SUM(class_size) FILTER (WHERE class_size < 5), 0) AS BIGINT) AS rows_at_risk
        |FROM c""".stripMargin,
    "q_regr_ols" ->
      """WITH p AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_x,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_y,
        |    CAST(CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,4))) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 AS sxx,
        |    CAST(CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(28,4))) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 AS sxy,
        |    CAST(CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,4))) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 AS syy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  (CAST(n AS DOUBLE) * sxy - sum_x * sum_y)
        |    / (CAST(n AS DOUBLE) * sxx - sum_x * sum_x) AS slope,
        |  (sum_y - (CAST(n AS DOUBLE) * sxy - sum_x * sum_y)
        |             / (CAST(n AS DOUBLE) * sxx - sum_x * sum_x) * sum_x)
        |    / CAST(n AS DOUBLE) AS intercept,
        |  (CAST(n AS DOUBLE) * sxy - sum_x * sum_y)
        |    * (CAST(n AS DOUBLE) * sxy - sum_x * sum_y)
        |    / ((CAST(n AS DOUBLE) * sxx - sum_x * sum_x)
        |       * (CAST(n AS DOUBLE) * syy - sum_y * sum_y)) AS r2
        |FROM p ORDER BY l_returnflag""".stripMargin,
    "q_anomaly_mad" ->
      """WITH m AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med_v
        |  FROM events GROUP BY event_type),
        |d AS (
        |  SELECT e.event_type, m.med_v, abs(e.value - m.med_v) AS dev
        |  FROM events e JOIN m USING (event_type)),
        |md AS (
        |  SELECT event_type, quantile_cont(dev, 0.5) AS mad_v
        |  FROM d GROUP BY event_type)
        |SELECT d.event_type, COUNT(*) AS n,
        |  max(d.med_v) AS med_v, max(md.mad_v) AS mad_v,
        |  COUNT(*) FILTER (WHERE d.dev > 3.0 * md.mad_v) AS n_outliers
        |FROM d JOIN md USING (event_type)
        |GROUP BY d.event_type ORDER BY event_type""".stripMargin,
    "q_feature_target_encode" ->
      s"""WITH g AS (
         |  SELECT ${Det.sqlSum("o_totalprice")} AS gsum, COUNT(*) AS gn FROM orders),
         |p AS (
         |  SELECT o_orderpriority, COUNT(*) AS n,
         |         ${Det.sqlSum("o_totalprice")} AS csum
         |  FROM orders GROUP BY o_orderpriority)
         |SELECT o_orderpriority, n,
         |  (csum + 10.0 * (gsum / gn)) / (n + 10.0) AS enc
         |FROM p, g ORDER BY o_orderpriority""".stripMargin,
    "q_feature_zscore" ->
      """WITH st AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    CAST(SUM(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS sv6,
        |    CAST(SUM(CAST(floor(value * value * 1000000) AS BIGINT)) AS BIGINT) AS svv6
        |  FROM events GROUP BY event_type),
        |m AS (
        |  SELECT event_type,
        |    CAST(sv6 AS DOUBLE) / 1e6 / n AS mean_v,
        |    sqrt((CAST(svv6 AS DOUBLE) / 1e6
        |          - (CAST(sv6 AS DOUBLE) / 1e6) * (CAST(sv6 AS DOUBLE) / 1e6) / n)
        |         / (n - 1)) AS std_v
        |  FROM st)
        |SELECT e.event_id, e.event_type, e.value,
        |  (e.value - m.mean_v) / m.std_v AS z
        |FROM events e JOIN m USING (event_type)
        |ORDER BY e.event_id""".stripMargin,
    "q_feature_bins" ->
      s"""WITH q AS (
         |  SELECT quantile_cont(o_totalprice, 0.25) AS q1,
         |         quantile_cont(o_totalprice, 0.5)  AS q2,
         |         quantile_cont(o_totalprice, 0.75) AS q3
         |  FROM orders)
         |SELECT CAST(CASE WHEN o_totalprice <= q1 THEN 0
         |            WHEN o_totalprice <= q2 THEN 1
         |            WHEN o_totalprice <= q3 THEN 2
         |            ELSE 3 END AS INTEGER) AS bin,
         |  COUNT(*) AS n, min(o_totalprice) AS lo, max(o_totalprice) AS hi,
         |  ${Det.sqlSum("o_totalprice")} AS sum_price
         |FROM orders, q GROUP BY 1 ORDER BY bin""".stripMargin,
    "q_profile" ->
      """WITH a AS (
        |  SELECT COUNT(*) AS n_rows,
        |    COUNT(o_orderkey) AS c_ok, COUNT(DISTINCT o_orderkey) AS d_ok,
        |    CAST(CAST(min(o_orderkey) AS DECIMAL(18,4)) AS VARCHAR) AS mn_ok,
        |    CAST(CAST(max(o_orderkey) AS DECIMAL(18,4)) AS VARCHAR) AS mx_ok,
        |    COUNT(o_custkey) AS c_ck, COUNT(DISTINCT o_custkey) AS d_ck,
        |    CAST(CAST(min(o_custkey) AS DECIMAL(18,4)) AS VARCHAR) AS mn_ck,
        |    CAST(CAST(max(o_custkey) AS DECIMAL(18,4)) AS VARCHAR) AS mx_ck,
        |    COUNT(o_totalprice) AS c_tp, COUNT(DISTINCT o_totalprice) AS d_tp,
        |    CAST(CAST(min(o_totalprice) AS DECIMAL(18,4)) AS VARCHAR) AS mn_tp,
        |    CAST(CAST(max(o_totalprice) AS DECIMAL(18,4)) AS VARCHAR) AS mx_tp,
        |    COUNT(o_orderdate) AS c_od, COUNT(DISTINCT o_orderdate) AS d_od,
        |    strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S') AS mn_od,
        |    strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') AS mx_od,
        |    COUNT(o_orderstatus) AS c_os, COUNT(DISTINCT o_orderstatus) AS d_os,
        |    min(o_orderstatus) AS mn_os, max(o_orderstatus) AS mx_os,
        |    COUNT(o_orderpriority) AS c_op, COUNT(DISTINCT o_orderpriority) AS d_op,
        |    min(o_orderpriority) AS mn_op, max(o_orderpriority) AS mx_op
        |  FROM orders)
        |SELECT n_rows, col_name, n_nonnull, n_distinct, min_s, max_s FROM (
        |  SELECT n_rows, 'o_orderkey' AS col_name, c_ok AS n_nonnull,
        |         d_ok AS n_distinct, mn_ok AS min_s, mx_ok AS max_s FROM a
        |  UNION ALL SELECT n_rows, 'o_custkey', c_ck, d_ck, mn_ck, mx_ck FROM a
        |  UNION ALL SELECT n_rows, 'o_totalprice', c_tp, d_tp, mn_tp, mx_tp FROM a
        |  UNION ALL SELECT n_rows, 'o_orderdate', c_od, d_od, mn_od, mx_od FROM a
        |  UNION ALL SELECT n_rows, 'o_orderstatus', c_os, d_os, mn_os, mx_os FROM a
        |  UNION ALL SELECT n_rows, 'o_orderpriority', c_op, d_op, mn_op, mx_op FROM a)
        |ORDER BY col_name""".stripMargin,
    "q_feature_hash" -> {
      val NB = 16
      val fcols = (0 until NB).map(b =>
        s"CAST(len(list_filter(hs, h -> h % $NB = $b)) AS INTEGER) AS f$b")
        .mkString(",\n|  ")
      s"""WITH h AS (
         |  SELECT doc_id,
         |    [${graft.llm.PortableHash.sqlPolyChar("s")} for s in string_split(text, ' ')] AS hs
         |  FROM documents)
         |SELECT doc_id, CAST(len(hs) AS INTEGER) AS n_tok,
         |  $fcols
         |FROM h ORDER BY doc_id""".stripMargin
    },
    "q_dq_checks" ->
      """WITH s AS (
        |  SELECT COUNT(*) AS n_rows,
        |    COUNT(*) - COUNT(DISTINCT o_orderkey) AS v_dup_key,
        |    COUNT(*) FILTER (WHERE o_totalprice <= 0.0) AS v_price_range,
        |    COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('O', 'F', 'P')) AS v_status_set,
        |    COUNT(*) FILTER (WHERE o_orderpriority IS NULL) AS v_null_priority
        |  FROM orders),
        |f AS (
        |  SELECT COUNT(*) AS v_orphan_fk FROM orders o
        |  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
        |r AS (
        |  SELECT 'has_rows' AS rule,
        |         CAST(CASE WHEN n_rows > 0 THEN 0 ELSE 1 END AS BIGINT) AS violations
        |  FROM s
        |  UNION ALL SELECT 'pk_unique', v_dup_key FROM s
        |  UNION ALL SELECT 'fk_customer', v_orphan_fk FROM f
        |  UNION ALL SELECT 'price_positive', v_price_range FROM s
        |  UNION ALL SELECT 'status_in_set', v_status_set FROM s
        |  UNION ALL SELECT 'priority_complete', v_null_priority FROM s)
        |SELECT rule, violations, violations = 0 AS ok FROM r ORDER BY rule""".stripMargin
  )
}
