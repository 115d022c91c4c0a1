package graft.queries

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType, LongType}

import graft.Tables

/** Part B aggregate surface (SURVEY.md §2 B5-B9): multi-aggregate (TPC-H Q1
  * shape), exact + approximate distinct counting, rollup grouping sets, top-k
  * (global and per-group), and the ranking/analytic window battery.
  *
  * Scale design: every aggregate here is a partial+final hash aggregate (map
  * side combine before the shuffle); the global top-k compiles to
  * `TakeOrderedAndProjectExec` (per-partition heap of k, no full sort);
  * `approx_count_distinct` is HyperLogLog++ — constant memory per group where
  * exact distinct needs a per-group hash set. Running sums in the window
  * battery accumulate in DECIMAL so the result is order-independent exact
  * (see [[Det]]).
  */
object Aggs extends QueryModule {

  private val Dec = DecimalType(18, 4)

  def queries: Map[String, Q] = Map(
    // B5 — TPC-H Q1 shape: 7 aggregates over lineitem grouped by the two
    // status flags. The derived discounted price is a per-row double product
    // (bit-identical on both engines) accumulated exactly in decimal.
    "q_agg_multi" -> ((s, d) =>
      Tables(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          Det.dsum(col("l_quantity")).as("sum_qty"),
          Det.dsum(col("l_extendedprice")).as("sum_base_price"),
          Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          Det.davg(col("l_quantity")).as("avg_qty"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // B6a — exact distinct aggregates (expands to a two-phase plan: distinct
    // shuffle then count). Exact is the oracle-checked form.
    "q_agg_distinct" -> ((s, d) =>
      Tables(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")),

    // B6b — HyperLogLog++ approximate distinct: the 100 TB-scale form (no
    // per-group hash set, mergeable sketches). The raw estimate is
    // engine-specific, so the DECLARED output is the bound-flag form
    // (round-4 advice): exact count + `within_bound` = relative error ≤ 5%,
    // both deterministic given the data — DuckDB states the expected row
    // and the driver gate certifies the sketch, not just its row count.
    "q_agg_approx_distinct" -> ((s, d) =>
      Tables(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
          countDistinct(col("l_partkey")).as("n_parts"),
          count(lit(1)).as("n_rows"))
        .select(col("l_returnflag"), col("n_parts"), col("n_rows"),
          (abs(col("approx_parts") - col("n_parts")).cast("double") / col("n_parts")
            <= 0.05).as("within_bound"))
        .orderBy("l_returnflag")),

    // B6d — t-digest approximate percentiles: the 100 TB form (mergeable
    // sketch, bounded memory). Same bound-flag pattern: the estimate must
    // sit within 2% of the exact interpolated median computed in the SAME
    // query; the oracle mirrors the exact side and expects the flag true.
    "q_agg_approx_percentile" -> ((s, d) =>
      Tables(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(approx_percentile(col("l_extendedprice"), lit(0.5), lit(1000)).as("ap50"),
          percentile(col("l_extendedprice"), lit(0.5)).as("p50_exact"),
          count(lit(1)).as("n_rows"))
        .select(col("l_returnflag"), col("p50_exact"), col("n_rows"),
          (abs(col("ap50") - col("p50_exact")) / col("p50_exact") <= 0.02)
            .as("within_bound"))
        .orderBy("l_returnflag")),

    // B6e — MERGEABLE distinct sketches (Apache DataSketches HLL): partial
    // sketches per (flag, year) — the shape of per-partition/per-day
    // pre-aggregation — merged losslessly with hll_union_agg and estimated
    // once. At 100 TB this is how distinct counts compose across days and
    // reruns: store the partials, merge on demand, never rescan. Bound-flag
    // output: the merged estimate must land within 5% of the exact distinct
    // count; AggSketchSpec additionally pins merged ≡ single-pass.
    "q_agg_sketch_merge" -> ((s, d) => {
      val li = Tables(s, d, "lineitem")
      val merged = li
        .groupBy(col("l_returnflag"), year(col("l_shipdate")).as("y"))
        .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
        .groupBy("l_returnflag")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_parts_merged"))
      val exact = li.groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"))
      merged.join(exact, "l_returnflag")
        .select(col("l_returnflag"), col("n_parts"),
          (abs(col("approx_parts_merged") - col("n_parts")).cast("double") / col("n_parts")
            <= 0.05).as("within_bound"))
        .orderBy("l_returnflag")
    }),

    // Ratio-to-report (percent of total): each priority's share of global
    // revenue. The denominator comes from a separate 1-row exact-decimal
    // aggregate broadcast back — NOT from `sum().over()` with no partition:
    // the empty-frame window would both single-partition the frame AND sum
    // doubles in a nondeterministic row order. share = double division of
    // two exact decimals — identical bits on both engines.
    "q_revenue_share" -> ((s, d) => {
      val o = Tables(s, d, "orders")
      val per = o.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"), Det.dsum(col("o_totalprice")).as("revenue"))
      val tot = o.agg(Det.dsum(col("o_totalprice")).as("total"))
      per.crossJoin(broadcast(tot))
        .select(col("o_orderpriority"), col("n_orders"), col("revenue"),
          (col("revenue") / col("total")).as("share"))
        .orderBy("o_orderpriority")
    }),

    // Typed Aggregator surface (`Aggregator[IN, BUF, OUT]` + functions.udaf
    // — the PUBLIC typed-UDAF API, vs the repo's Catalyst
    // TypedImperativeAggregates): quantity-weighted mean price with exact
    // decimal accumulation, fully partial/final (the shuffle carries one
    // (Σwx, Σw) pair per group).
    "q_agg_udaf" -> ((s, d) => {
      val wm = udaf(graft.functions.WeightedMeanAgg,
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble))
      Tables(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(wm(col("l_extendedprice"), col("l_quantity")).as("wavg_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),

    // B6c — exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    // `quantile_cont`: same index/interpolation arithmetic, verified
    // bit-identical). At 100 TB prefer approx_percentile (t-digest sketch,
    // mergeable) — exact percentile materializes per-group value buffers.
    "q_agg_percentile" -> ((s, d) =>
      Tables(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          percentile(col("l_extendedprice"), lit(0.5)).as("p50_price"),
          percentile(col("l_extendedprice"), lit(0.95)).as("p95_price"),
          percentile(col("l_quantity"), lit(0.5)).as("med_qty"))
        .orderBy("l_returnflag")),

    // Skew-safe two-phase aggregation (salting): when a handful of hot keys
    // would funnel into single reducers, pre-aggregate by (key, salt) — 16
    // shards per key here — then combine per key. Decimal partials keep the
    // result exactly equal to the direct aggregation (the oracle computes
    // the direct form). `events` has 5 event types over 100k rows — exactly
    // the hot-key shape.
    "q_agg_salted" -> ((s, d) => {
      val partial = Tables(s, d, "events")
        .withColumn("salt", pmod(hash(col("event_id")), lit(16)))
        .groupBy("event_type", "salt")
        .agg(count(lit(1)).as("n_partial"),
          sum(col("value").cast(Dec)).as("sum_partial"))
      partial
        .groupBy("event_type")
        .agg(sum(col("n_partial")).as("n_events"),
          sum(col("sum_partial")).cast(DoubleType).as("sum_value"))
        .orderBy("event_type")
    }),

    // B7 — ROLLUP(year, month): detail rows + per-year subtotal + grand
    // total in one pass (Catalyst Expand + single aggregate). grouping_id
    // disambiguates subtotal levels; sort keys are null-coalesced so both
    // engines order identically.
    "q_rollup_cube" -> ((s, d) =>
      Tables(s, d, "orders")
        .withColumn("o_year", year(col("o_orderdate")))
        .withColumn("o_month", month(col("o_orderdate")))
        .rollup("o_year", "o_month")
        .agg(count(lit(1)).as("n_orders"), Det.dsum(col("o_totalprice")).as("sum_total"),
          grouping_id().cast(IntegerType).as("g_id"))
        .orderBy(col("g_id"), coalesce(col("o_year"), lit(-1)), coalesce(col("o_month"), lit(-1)))),

    // B7b — CUBE(year, priority): all four grouping combinations (detail,
    // per-year, per-priority, grand total) from one Expand + one aggregate
    // pass — vs four separate scans for the same report. String sort keys
    // coalesce to '' (sorts before any non-empty value on both engines).
    "q_cube" -> ((s, d) =>
      Tables(s, d, "orders")
        .withColumn("o_year", year(col("o_orderdate")))
        .cube("o_year", "o_orderpriority")
        .agg(count(lit(1)).as("n_orders"), Det.dsum(col("o_totalprice")).as("sum_total"),
          grouping_id().cast(IntegerType).as("g_id"))
        .orderBy(col("g_id"), coalesce(col("o_year"), lit(-1)),
          coalesce(col("o_orderpriority"), lit("")))),

    // B7c — GROUPING SETS picked freely (two independent subtotal ledgers,
    // NOT expressible as one rollup/cube): per-year and per-priority in a
    // single pass. Expand emits exactly the requested sets — no wasted
    // detail rows like a CUBE would produce here.
    "q_grouping_sets" -> ((s, d) => {
      val o = Tables(s, d, "orders").withColumn("o_year", year(col("o_orderdate")))
      o.groupingSets(Seq(Seq(col("o_year")), Seq(col("o_orderpriority"))),
          col("o_year"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"), Det.dsum(col("o_totalprice")).as("sum_total"),
          grouping_id().cast(IntegerType).as("g_id"))
        .orderBy(col("g_id"), coalesce(col("o_year"), lit(-1)),
          coalesce(col("o_orderpriority"), lit("")))
    }),

    // Pivot: long→wide with an EXPLICIT value list (never the inferred
    // form at scale — value inference is an extra distinct scan and makes
    // the output schema data-dependent). Absent combinations coalesce to 0
    // so the shape is total. One partial+final aggregate under the hood.
    "q_pivot" -> ((s, d) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val p = Tables(s, d, "events")
        .groupBy("user_id")
        .pivot("event_type", types)
        .agg(count(lit(1)))
      p.select(col("user_id") +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
        .orderBy("user_id")
    }),

    // Unpivot (wide→long): the inverse reshape, columns to (name, value)
    // rows — no shuffle at all (per-row expansion).
    "q_unpivot" -> ((s, d) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val p = Tables(s, d, "events")
        .groupBy("user_id")
        .pivot("event_type", types)
        .agg(count(lit(1)))
      val wide = p.select(col("user_id") +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
      wide.unpivot(Array(col("user_id")), types.map(col).toArray, "event_type", "n_events")
        .orderBy("user_id", "event_type")
    }),

    // Heavy hitters (exact form): users carrying ≥80% of the heaviest
    // user's event load. Two partial+final aggregates; the 1-row max
    // broadcasts. This is the exact twin of the Count-Min sketch path
    // (functions/CountMinAgg, CountMinSpec): CMS answers the same question
    // at 100 TB from an (ε,δ)-sized mergeable table without shuffling keys.
    "q_agg_heavy_hitters" -> ((s, d) => {
      val counts = Tables(s, d, "events")
        .groupBy("user_id").agg(count(lit(1)).as("n_events"))
      val maxN = counts.agg(max("n_events").as("n_max"))
      counts.crossJoin(broadcast(maxN))
        .filter(col("n_events") * 5 >= col("n_max") * 4)
        .select("user_id", "n_events")
        .orderBy("user_id")
    }),

    // Exact distributed statistics: variance / stddev / correlation from
    // exact DECIMAL power sums (n, Σx, Σx², Σy, Σy², Σxy — each
    // order-independent, one partial+final hash aggregate), with the closed
    // form evaluated in DOUBLE on identical operands so both engines emit
    // identical bits. Spark's builtin var_samp/corr stream doubles in
    // partial order — correct but not hash-reproducible across engines;
    // this is the deterministic twin, and the power sums are trivially
    // mergeable (the same shape a 1000-executor scan combines for free).
    "q_agg_stats" -> ((s, d) => {
      val DecSq = DecimalType(28, 4)
      // The squared/cross sums exceed 2^53 in 1e-4 units, and DuckDB's
      // DECIMAL→DOUBLE cast is NOT correctly rounded there (found at
      // sf0.001: exact 7096786968835.8685 → DuckDB …8691, correct …8682 =
      // Spark's BigDecimal path). Convert via exact BIGINT units / 1e4
      // instead: long→double is correctly rounded on every IEEE engine,
      // and the final division rounds once, identically. Bounded to sums
      // < 9.2e14 (BIGINT units) — the conversion is oracle-portability
      // machinery; production would cast the decimal natively.
      def dss(a: String, b: String) =
        (sum((col(a) * col(b)).cast(DecSq)) * 10000).cast(LongType)
          .cast(DoubleType) / 1e4
      val nD = col("n").cast(DoubleType)
      def varOf(ssq: String, sm: String) =
        (nD * col(ssq) - col(sm) * col(sm)) / (nD * (nD - lit(1.0)))
      Tables(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          Det.dsum(col("l_quantity")).as("sum_q"),
          dss("l_quantity", "l_quantity").as("ssq_q"),
          Det.dsum(col("l_extendedprice")).as("sum_p"),
          dss("l_extendedprice", "l_extendedprice").as("ssq_p"),
          dss("l_quantity", "l_extendedprice").as("sxy"))
        .select(col("l_returnflag"), col("n"),
          varOf("ssq_q", "sum_q").as("var_q"),
          sqrt(varOf("ssq_q", "sum_q")).as("std_q"),
          varOf("ssq_p", "sum_p").as("var_p"),
          ((nD * col("sxy") - col("sum_q") * col("sum_p")) /
            (sqrt(nD * col("ssq_q") - col("sum_q") * col("sum_q")) *
             sqrt(nD * col("ssq_p") - col("sum_p") * col("sum_p")))).as("corr_qp"))
        .orderBy("l_returnflag")
    }),

    // Deterministic MODE: most frequent order priority per year, ties broken
    // by priority string — builtin mode() has no tie-break contract on
    // either engine, so the portable form is count + ranked window over the
    // (small) distinct-combination frame. The window input is |years ×
    // priorities| rows, never the fact table.
    "q_agg_mode" -> ((s, d) => {
      val counts = Tables(s, d, "orders")
        .groupBy(year(col("o_orderdate")).cast(IntegerType).as("o_year"),
          col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("o_year").orderBy(desc("n"), col("o_orderpriority"))
      counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("o_year", "o_orderpriority", "n")
        .orderBy("o_year")
    }),

    // Fixed-width histogram: bin key computed per-row in the scan
    // (floor(x/width) — codegen'd, no UDF), then an ordinary partial+final
    // count. The classic single-pass distributed histogram; empty bins are
    // absent by construction on both engines.
    "q_agg_hist" -> ((s, d) =>
      Tables(s, d, "orders")
        .groupBy(floor(col("o_totalprice") / 50000.0).cast(IntegerType).as("bin"))
        .agg(count(lit(1)).as("n"),
          min("o_totalprice").as("lo"),
          max("o_totalprice").as("hi"))
        .orderBy("bin")),

    // Cumulative (YTD-style) running totals: aggregate to (priority, month)
    // FIRST — the window then runs over the tiny aggregated frame (|groups ×
    // months| rows), never the fact table; partials stay DECIMAL so the
    // running sum is exact and order-free. The canonical reporting query
    // every warehouse derives from the reference's monthly rollup.
    "q_running_total" -> ((s, d) => {
      val monthly = Tables(s, d, "orders")
        .groupBy(col("o_orderpriority"),
          date_trunc("month", col("o_orderdate")).as("month"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(DecimalType(18, 4))).as("m_sum"))
      val w = Window.partitionBy("o_orderpriority").orderBy("month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      monthly
        .select(col("o_orderpriority"), col("month"), col("n"),
          col("m_sum").cast(DoubleType).as("month_total"),
          sum(col("m_sum")).over(w).cast(DoubleType).as("running_total"))
        .orderBy("o_orderpriority", "month")
    }),

    // Incremental aggregation / materialized-view maintenance: per-batch
    // PARTIAL aggregates (here 3 synthetic ingest batches) merged into the
    // final result — the merge must equal a full recompute, which the
    // oracle states as a direct single-pass aggregate over all rows.
    // Partial sums stay DECIMAL through the merge (exact, order-free) and
    // convert to double once. This is the contract that lets a 100 TB
    // deployment maintain rollups by folding in each day's partial instead
    // of rescanning history — and it is exactly the partial/final split
    // Catalyst already runs inside one job, made durable across jobs.
    "q_agg_incremental" -> ((s, d) => {
      val Dec = DecimalType(18, 4)
      val partials = Tables(s, d, "orders")
        .withColumn("batch", pmod(col("o_orderkey"), lit(3)))
        .groupBy("batch", "o_orderpriority")
        .agg(count(lit(1)).as("n_part"),
          sum(col("o_totalprice").cast(Dec)).as("sum_part"),
          min("o_totalprice").as("min_part"),
          max("o_totalprice").as("max_part"))
      partials.groupBy("o_orderpriority")
        .agg(sum("n_part").as("n"),
          sum("sum_part").cast(DoubleType).as("sum_total"),
          min("min_part").as("min_total"),
          max("max_part").as("max_total"))
        .orderBy("o_orderpriority")
    }),

    // B8a — global top-k: orderBy+limit compiles to TakeOrderedAndProjectExec
    // (per-partition bounded heap, no global sort shuffle of the full table).
    "q_topk" -> ((s, d) =>
      Tables(s, d, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
        .limit(100)),

    // B8b — top-3 per group via ranked window; the rank predicate prunes
    // inside the per-group sort, never materializing the full ordering.
    "q_topk_group" -> ((s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
      Tables(s, d, "orders")
        .withColumn("rn", row_number().over(w).cast(IntegerType))
        .filter(col("rn") <= 3)
        .select("o_orderpriority", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_orderpriority", "rn")
    }),

    // B8c — the NATIVE top-k-per-group operator (graft.plans.TopKPerGroup):
    // partial bounded heaps per input partition, shuffle only the
    // ≤ partitions·groups·k candidates, final heap merge — vs. the window
    // form's full-table shuffle + per-group sort. The trailing row_number
    // runs on ≤ groups·k rows, so it's free; the oracle is the SAME SQL as
    // q_topk_group, proving the native operator is value-identical.
    "q_topk_group_native" -> ((s, d) => {
      val base = Tables(s, d, "orders").select("o_orderpriority", "o_orderkey", "o_totalprice")
      val pruned = graft.plans.TopK.perGroup(
        base, Seq("o_orderpriority"),
        Seq("o_totalprice" -> true, "o_orderkey" -> false), 3)
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
      pruned
        .withColumn("rn", row_number().over(w).cast(IntegerType))
        .select("o_orderpriority", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_orderpriority", "rn")
    }),

    // B9 — ranking/analytic battery over one window spec: row_number, rank,
    // dense_rank, lag, lead, and a running decimal-exact sum with an explicit
    // ROWS frame. One shuffle (partition key), one sort, one WindowExec.
    "q_window_rank_lag" -> ((s, d) => {
      val w = Window.partitionBy("o_orderpriority").orderBy("o_orderdate", "o_orderkey")
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, d, "orders")
        .select(
          col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).cast(IntegerType).as("rn"),
          rank().over(w).cast(IntegerType).as("rnk"),
          dense_rank().over(w).cast(IntegerType).as("drnk"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          sum(col("o_totalprice").cast(Dec)).over(wRun).cast(DoubleType).as("run_total"))
        .orderBy("o_orderpriority", "rn")
    }),

    // B9b — distribution/analytic window battery: ntile bucketing,
    // percent_rank, cume_dist (pure rank arithmetic — engine-portable
    // doubles), first_value over the ordered partition, and a 3-row moving
    // average with an explicit ROWS frame (decimal-exact sum ÷ frame count,
    // so the double is order-independent). The ordering carries the unique
    // key as tiebreaker, making every analytic value deterministic. Same
    // plan shape as B9: one shuffle, one sort, one WindowExec.
    "q_window_analytic" -> ((s, d) => {
      val w = Window.partitionBy("c_mktsegment").orderBy(desc("c_acctbal"), col("c_custkey"))
      val wMov = w.rowsBetween(-2, Window.currentRow)
      Tables(s, d, "customer")
        .select(
          col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
          ntile(4).over(w).cast(IntegerType).as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          first(col("c_custkey")).over(w).as("seg_top"),
          (sum(col("c_acctbal").cast(Dec)).over(wMov).cast(DoubleType) /
            count(lit(1)).over(wMov)).as("mov_avg3"))
        .orderBy("c_custkey")
    }),

    // B9+ — DISTINCT counts over windows. Spark (like most engines) rejects
    // COUNT(DISTINCT) OVER, and the naive workaround
    // (size(collect_set() OVER)) buffers every partition's value set per
    // row — O(rows × partition) memory, a straggler at scale. The classic
    // rank arithmetic is exact and bounded:
    //   total distinct per partition  = max(dense_rank over (p ORDER BY v));
    //   running distinct up to row    = running sum of the first-occurrence
    //     flag (row_number over (p, v) = 1).
    // Three window specs sharing the o_custkey hash exchange; the oracle
    // states the SAME formulation, so it certifies the rewrite on both
    // engines rather than leaning on a DuckDB-only DISTINCT-window feature.
    "q_window_distinct" -> ((s, d) => {
      val byCust = Window.partitionBy("o_custkey")
      val rowOrd = byCust.orderBy("o_orderdate", "o_orderkey")
      val firstSeen = Window.partitionBy("o_custkey", "o_orderpriority")
        .orderBy("o_orderdate", "o_orderkey")
      Tables(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
          col("o_orderdate"),
          dense_rank().over(byCust.orderBy("o_orderpriority")).as("dr"),
          when(row_number().over(firstSeen) === 1, 1L).otherwise(0L).as("fs"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
          max(col("dr")).over(byCust).cast(IntegerType).as("n_prio_total"),
          sum(col("fs")).over(rowOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast(IntegerType).as("n_prio_sofar"))
        .orderBy("o_orderkey")
    })
  )

  def oracles: Map[String, String] = Map(
    "q_agg_stats" ->
      s"""WITH p AS (
         |  SELECT l_returnflag, COUNT(*) AS n,
         |    ${Det.sqlSum("l_quantity")} AS sum_q,
         |    CAST(CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,4))) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 AS ssq_q,
         |    ${Det.sqlSum("l_extendedprice")} AS sum_p,
         |    CAST(CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,4))) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 AS ssq_p,
         |    CAST(CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(28,4))) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 AS sxy
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag, n,
         |  (CAST(n AS DOUBLE) * ssq_q - sum_q * sum_q)
         |    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS var_q,
         |  sqrt((CAST(n AS DOUBLE) * ssq_q - sum_q * sum_q)
         |    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) AS std_q,
         |  (CAST(n AS DOUBLE) * ssq_p - sum_p * sum_p)
         |    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS var_p,
         |  (CAST(n AS DOUBLE) * sxy - sum_q * sum_p)
         |    / (sqrt(CAST(n AS DOUBLE) * ssq_q - sum_q * sum_q)
         |       * sqrt(CAST(n AS DOUBLE) * ssq_p - sum_p * sum_p)) AS corr_qp
         |FROM p ORDER BY l_returnflag""".stripMargin,
    "q_agg_mode" ->
      """WITH c AS (
        |  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, o_orderpriority,
        |         COUNT(*) AS n
        |  FROM orders GROUP BY 1, 2),
        |r AS (
        |  SELECT o_year, o_orderpriority, n,
        |    row_number() OVER (PARTITION BY o_year
        |                       ORDER BY n DESC, o_orderpriority) AS rn
        |  FROM c)
        |SELECT o_year, o_orderpriority, n FROM r WHERE rn = 1
        |ORDER BY o_year""".stripMargin,
    "q_agg_hist" ->
      """SELECT CAST(floor(o_totalprice / 50000.0) AS INTEGER) AS bin,
        |  COUNT(*) AS n, min(o_totalprice) AS lo, max(o_totalprice) AS hi
        |FROM orders GROUP BY 1 ORDER BY bin""".stripMargin,
    // DuckDB date_trunc('month') returns DATE — cast to TIMESTAMP to match
    // Spark (parity playbook).
    "q_running_total" ->
      """WITH m AS (
        |  SELECT o_orderpriority,
        |         CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
        |         COUNT(*) AS n,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS m_sum
        |  FROM orders GROUP BY 1, 2)
        |SELECT o_orderpriority, month, n,
        |  CAST(m_sum AS DOUBLE) AS month_total,
        |  CAST(SUM(m_sum) OVER (PARTITION BY o_orderpriority ORDER BY month
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_total
        |FROM m ORDER BY o_orderpriority, month""".stripMargin,
    // Deliberately the single-pass form: hash-matching it certifies the
    // partial-merge path loses nothing.
    "q_agg_incremental" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n,
         |  ${Det.sqlSum("o_totalprice")} AS sum_total,
         |  min(o_totalprice) AS min_total, max(o_totalprice) AS max_total
         |FROM orders GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin,
    "q_agg_multi" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${Det.sqlSum("l_quantity")} AS sum_qty,
         |  ${Det.sqlSum("l_extendedprice")} AS sum_base_price,
         |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
         |  ${Det.sqlAvg("l_quantity")} AS avg_qty,
         |  MIN(l_extendedprice) AS min_price,
         |  MAX(l_extendedprice) AS max_price,
         |  COUNT(*) AS count_order
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_agg_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        |       COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // Bound-flag oracles: the estimator values are engine-specific, but
    // "exact aggregate + estimate-within-bound boolean" is deterministic
    // given the data, so DuckDB states the expected row (flag TRUE) and the
    // driver gate certifies the sketches cell-exactly.
    "q_agg_approx_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        |       COUNT(*) AS n_rows, TRUE AS within_bound
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_approx_percentile" ->
      """SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS p50_exact,
        |       COUNT(*) AS n_rows, TRUE AS within_bound
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_sketch_merge" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        |       TRUE AS within_bound
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_salted" ->
      s"""SELECT event_type, COUNT(*) AS n_events, ${Det.sqlSum("value")} AS sum_value
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_revenue_share" ->
      s"""WITH p AS (
         |  SELECT o_orderpriority, COUNT(*) AS n_orders,
         |         ${Det.sqlSum("o_totalprice")} AS revenue
         |  FROM orders GROUP BY o_orderpriority),
         |t AS (SELECT ${Det.sqlSum("o_totalprice")} AS total FROM orders)
         |SELECT o_orderpriority, n_orders, revenue, revenue / total AS share
         |FROM p, t ORDER BY o_orderpriority""".stripMargin,
    "q_agg_udaf" ->
      """SELECT l_returnflag,
        |  CAST(CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(28,4))) * 10000 AS BIGINT) AS DOUBLE) / 10000.0
        |    / CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS wavg_price,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_percentile" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_extendedprice, 0.5) AS p50_price,
        |  quantile_cont(l_extendedprice, 0.95) AS p95_price,
        |  quantile_cont(l_quantity, 0.5) AS med_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_rollup_cube" ->
      s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         |       CAST(month(o_orderdate) AS INTEGER) AS o_month,
         |       COUNT(*) AS n_orders, ${Det.sqlSum("o_totalprice")} AS sum_total,
         |       CAST(GROUPING(year(o_orderdate), month(o_orderdate)) AS INTEGER) AS g_id
         |FROM orders GROUP BY ROLLUP(year(o_orderdate), month(o_orderdate))
         |ORDER BY g_id, COALESCE(o_year, -1), COALESCE(o_month, -1)""".stripMargin,
    "q_cube" ->
      s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, o_orderpriority,
         |       COUNT(*) AS n_orders, ${Det.sqlSum("o_totalprice")} AS sum_total,
         |       CAST(GROUPING(year(o_orderdate), o_orderpriority) AS INTEGER) AS g_id
         |FROM orders GROUP BY CUBE(year(o_orderdate), o_orderpriority)
         |ORDER BY g_id, COALESCE(o_year, -1), COALESCE(o_orderpriority, '')""".stripMargin,
    "q_grouping_sets" ->
      s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, o_orderpriority,
         |       COUNT(*) AS n_orders, ${Det.sqlSum("o_totalprice")} AS sum_total,
         |       CAST(GROUPING(year(o_orderdate), o_orderpriority) AS INTEGER) AS g_id
         |FROM orders GROUP BY GROUPING SETS ((year(o_orderdate)), (o_orderpriority))
         |ORDER BY g_id, COALESCE(o_year, -1), COALESCE(o_orderpriority, '')""".stripMargin,
    "q_pivot" ->
      """SELECT user_id,
        |  COUNT(*) FILTER (WHERE event_type = 'click') AS click,
        |  COUNT(*) FILTER (WHERE event_type = 'error') AS error,
        |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  COUNT(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_unpivot" ->
      """WITH p AS (
        |  SELECT user_id,
        |    COUNT(*) FILTER (WHERE event_type = 'click') AS click,
        |    COUNT(*) FILTER (WHERE event_type = 'error') AS error,
        |    COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |    COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
        |    COUNT(*) FILTER (WHERE event_type = 'view') AS view
        |  FROM events GROUP BY user_id)
        |SELECT user_id, event_type, n_events
        |FROM p UNPIVOT (n_events FOR event_type IN (click, error, purchase, signup, view))
        |ORDER BY user_id, event_type""".stripMargin,
    "q_agg_heavy_hitters" ->
      """WITH c AS (SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id)
        |SELECT user_id, n_events FROM c
        |WHERE n_events * 5 >= (SELECT MAX(n_events) FROM c) * 4
        |ORDER BY user_id""".stripMargin,
    "q_topk" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100",
    "q_topk_group" ->
      """SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         CAST(row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin,
    // Identical SQL to q_topk_group: the native bounded-heap operator must
    // reproduce the window form's results exactly.
    "q_topk_group_native" ->
      """SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         CAST(row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin,
    "q_window_rank_lag" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  CAST(row_number() OVER w AS INTEGER) AS rn,
        |  CAST(rank() OVER w AS INTEGER) AS rnk,
        |  CAST(dense_rank() OVER w AS INTEGER) AS drnk,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_orderpriority, rn""".stripMargin,
    "q_window_analytic" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd,
        |  first_value(c_custkey) OVER w AS seg_top,
        |  (CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) OVER wm AS DOUBLE)
        |     / COUNT(*) OVER wm) AS mov_avg3
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey),
        |  wm AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
        |         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY c_custkey""".stripMargin,
    "q_window_distinct" ->
      """WITH r AS (
        |  SELECT o_orderkey, o_custkey, o_orderpriority, o_orderdate,
        |    dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS dr,
        |    CASE WHEN row_number() OVER (
        |      PARTITION BY o_custkey, o_orderpriority
        |      ORDER BY o_orderdate, o_orderkey) = 1 THEN 1 ELSE 0 END AS fs
        |  FROM orders)
        |SELECT o_orderkey, o_custkey, o_orderpriority,
        |  CAST(max(dr) OVER (PARTITION BY o_custkey) AS INTEGER) AS n_prio_total,
        |  CAST(SUM(fs) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INTEGER) AS n_prio_sofar
        |FROM r ORDER BY o_orderkey""".stripMargin
  )
}
