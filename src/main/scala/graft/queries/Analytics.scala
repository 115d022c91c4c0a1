package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

import graft.Tables

/** Behavioral / product-analytics surface over `events`, `orders` and
  * `documents` — the query shapes a warehouse team runs daily on top of the
  * reference's ETL output (generalizing pasta2_analytics/src/main.py:18-42's
  * grouped metrics to sequence- and cohort-aware analytics), plus the
  * dataset-split assignment a training pipeline needs.
  *
  * Scale design notes per query:
  *  - `q_funnel`: the three conversion timestamps are per-user window
  *    aggregates over ONE hash partitioning of the fact table (Catalyst
  *    reuses the exchange across the chained window selects) — the classic
  *    "windowed funnel" layout; no self-joins of the event table.
  *  - `q_cohort_retention`: cohort month is a per-customer window min —
  *    again one shuffle keyed by customer, then one aggregate keyed by
  *    (cohort, offset). No join of the fact table against itself.
  *  - `q_agg_argmax`: argmax/argmin WITHOUT a window: `max(struct(value,
  *    -key))` is a plain partial+final aggregate (map-side combine, one
  *    shuffle of 5 groups), with a total tie-break order — deterministic,
  *    unlike `max_by` on ties. The oracle computes the same rows via
  *    ranked windows: two genuinely different algorithms agreeing.
  *  - `q_interval_overlap`: peak-concurrency sweep over session intervals.
  *    The running sum over event boundaries is a DISTRIBUTED prefix sum:
  *    boundary points are collapsed per timestamp, bucketed by day, summed
  *    within each day partition, and day-level offsets (a tiny table) are
  *    broadcast back — the same two-phase layout as llm/Packing. No global
  *    single-partition window over the boundary stream.
  *  - `q_split_assign`: deterministic train/val/test assignment from a
  *    multiplicative hash of the stable key — pure per-row arithmetic in
  *    the scan (no shuffle before the small rollup), reproducible across
  *    engines and runs; the split of any document never depends on which
  *    other documents exist (the property that makes the split stable under
  *    corpus growth at 100 TB).
  */
object Analytics extends QueryModule {

  private val GapUs = 1800L * 1000000L  // q_interval_overlap session gap
  private val DayUs = 86400L * 1000000L

  def queries: Map[String, Q] = Map(
    // Ordered-sequence funnel signup → click → purchase: per user, t1 is the
    // first signup, t2 the first click AFTER t1, t3 the first purchase AFTER
    // t2 (strict event-time order — not mere co-occurrence of types).
    "q_funnel" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
      val e = Tables(s, d, "events")
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
      e.withColumn("t1",
          min(when(col("event_type") === "signup", col("ts_us"))).over(w))
        .withColumn("t2",
          min(when(col("event_type") === "click" && col("ts_us") > col("t1"),
            col("ts_us"))).over(w))
        .withColumn("t3",
          min(when(col("event_type") === "purchase" && col("ts_us") > col("t2"),
            col("ts_us"))).over(w))
        // reduce to one row per user BEFORE counting: t1/t2/t3 are per-user
        // constants, so the groupBy reuses the windows' hash partitioning
        // (no exchange) and the final count needs no DISTINCT — the naive
        // triple countDistinct planned a 4-way Expand over every event row.
        .groupBy("user_id")
        .agg(max("t1").as("t1"), max("t2").as("t2"), max("t3").as("t3"))
        .agg(count("t1").as("u_signup"), count("t2").as("u_click"),
          count("t3").as("u_purchase"))
    }),

    // Monthly cohort retention: cohort = month of a customer's first order
    // (absolute month number year·12+month — integer, engine-portable);
    // n_customers = distinct customers from that cohort ordering `offset`
    // months later (first year of each cohort's life).
    "q_cohort_retention" -> ((s, d) => {
      val o = Tables(s, d, "orders").select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast(IntegerType).as("mo"))
      o.withColumn("cohort_mo", min("mo").over(Window.partitionBy("o_custkey")))
        .withColumn("offset", (col("mo") - col("cohort_mo")).cast(IntegerType))
        .filter(col("offset") <= 11)
        .groupBy("cohort_mo", "offset")
        .agg(countDistinct("o_custkey").as("n_customers"))
        .orderBy("cohort_mo", "offset")
    }),

    // Deterministic argmax/argmin per segment: highest/lowest account
    // balance with its customer key. max(struct(bal, -key)) ≡ "max bal,
    // ties → min key"; min(struct(bal, key)) ≡ "min bal, ties → min key".
    "q_agg_argmax" -> ((s, d) =>
      Tables(s, d, "customer")
        .groupBy("c_mktsegment")
        .agg(
          max(struct(col("c_acctbal").as("bal"), (-col("c_custkey")).as("nk"))).as("hi"),
          min(struct(col("c_acctbal").as("bal"), col("c_custkey").as("k"))).as("lo"))
        .select(col("c_mktsegment"),
          col("hi.bal").as("top_bal"), (-col("hi.nk")).as("top_cust"),
          col("lo.bal").as("low_bal"), col("lo.k").as("low_cust"))
        .orderBy("c_mktsegment")),

    // Peak concurrent sessions (sweep line): sessionize per user (30-min
    // gap), emit +1/−1 boundary points, collapse per timestamp, then a
    // day-bucketed distributed prefix sum; peak = max running concurrency.
    "q_interval_overlap" -> ((s, d) => {
      val wOrd = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val prev = lag(col("ts_us"), 1).over(wOrd)
      val sess = Tables(s, d, "events")
        .withColumn("ts_us", unix_micros(col("ts")))
        .withColumn("new_s",
          when(prev.isNull || col("ts_us") - prev > GapUs, 1).otherwise(0))
        .withColumn("session_id", sum("new_s").over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_id")
        .agg(min("ts_us").as("start_us"), max("ts_us").as("end_us"))
        // materialize once: the interval set feeds both sweep branches AND
        // the session count — without this the sessionize windows recompute
        // four times (once per consumer)
        .localCheckpoint()
      val pts = sess.select(col("start_us").as("pt"), lit(1).as("delta"))
        .unionAll(sess.select((col("end_us") + 1).as("pt"), lit(-1).as("delta")))
      // collapse simultaneous boundaries first: removes any tie-order
      // sensitivity AND bounds the prefix-sum input to distinct timestamps
      val byPt = pts.groupBy("pt").agg(sum("delta").as("d"))
        .withColumn("day", expr(s"pt div $DayUs"))
        .localCheckpoint() // feeds the per-day prefix sums AND the day totals
      val wDay = Window.partitionBy("day").orderBy("pt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val local = byPt.withColumn("run_local", sum("d").over(wDay))
      // day totals are tiny (|days|); their exclusive running offset is the
      // only single-partition window and it runs over that tiny table
      val offs = byPt.groupBy("day").agg(sum("d").as("dt"))
        .withColumn("off", coalesce(sum("dt").over(
          Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("day", "off")
      val peak = local.join(broadcast(offs), "day")
        .agg(max(col("run_local") + col("off")).as("peak_concurrent"))
      sess.agg(count(lit(1)).as("n_sessions")).crossJoin(peak)
    }),

    // Last-touch marketing attribution: each purchase is credited to the
    // channel of the most recent click at or before it (channel = props.k
    // mod 4 of that click). One ignore-nulls window carry over the per-user
    // event-time order — the fact table shuffles once on user_id; no
    // purchase×click self-join (the naive formulation joins every purchase
    // against every earlier click and re-ranks — quadratic in events per
    // user at 100 TB).
    "q_attribution" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val chan = concat(lit("ch"),
        pmod(get_json_object(col("props"), "$.k").cast(IntegerType), lit(4))
          .cast(StringType))
      Tables(s, d, "events")
        .withColumn("ts_us", unix_micros(col("ts")))
        .withColumn("attr_ch",
          last(when(col("event_type") === "click", chan), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .groupBy(coalesce(col("attr_ch"), lit("direct")).as("channel"))
        .agg(count(lit(1)).as("n_purchases"), Det.dsum(col("value")).as("revenue"))
        .orderBy("channel")
    }),

    // Event-sequence pattern match (MATCH_RECOGNIZE-lite): the per-user
    // event-type sequence in event-time order, scanned with a regex. The
    // sequence is built once per user (sort_array over structs — collect
    // order-independent, total order by (ts, event_id)) and both patterns
    // evaluate per-row over that string — one shuffle on user_id, no
    // self-joins of the event table, no per-pattern rescans. The regex runs
    // on a ' '-padded path so every event type is space-delimited on both
    // sides (types are \w-only, so ' click (\w+ )*purchase ' means "a click
    // event strictly before a purchase event").
    "q_seq_pattern" -> ((s, d) => {
      Tables(s, d, "events")
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"), col("event_type"))
        .groupBy("user_id")
        .agg(sort_array(collect_list(
          struct(col("ts_us"), col("event_id"), col("event_type")))).as("seq"))
        .select(col("user_id"),
          size(col("seq")).cast(LongType).as("n_events"),
          concat(lit(" "),
            concat_ws(" ", expr("transform(seq, x -> x.event_type)")),
            lit(" ")).as("path"))
        .select(col("user_id"), col("n_events"),
          col("path").rlike(""" click (\w+ )*purchase """).as("converted"),
          col("path").rlike(""" error (\w+ )*error """).as("error_repeat"))
        .orderBy("user_id")
    }),

    // SKYLINE / Pareto frontier (multi-objective dominance): the orders
    // that are Pareto-optimal on (recency MAX, price MIN) — an order is on
    // the frontier iff no strictly more recent order is as cheap or
    // cheaper. Naive skyline is the quadratic NOT-EXISTS dominance
    // self-join; the scale-safe form is one sort + one running min:
    // pre-reduce to the per-day minimum price (same-day candidates), order
    // days most-recent-first, keep a day iff its price beats the running
    // min of all STRICTLY more recent days (RANGE frame excludes ties).
    // O(n log n), one exchange, no self-join.
    "q_skyline" -> ((s, d) => {
      val byDay = Tables(s, d, "orders")
        .groupBy(to_date(col("o_orderdate")).as("o_day"))
        .agg(min(col("o_totalprice")).as("best_price"))
        .withColumn("negd", -datediff(col("o_day"), lit("1970-01-01")))
      val wPrev = Window.orderBy("negd")
        .rangeBetween(Window.unboundedPreceding, -1)
      byDay
        .withColumn("prev_min", min("best_price").over(wPrev))
        .filter(col("prev_min").isNull || col("best_price") < col("prev_min"))
        .select(col("o_day"), col("best_price"))
        .orderBy(desc("o_day"))
    }),

    // 3-OBJECTIVE skyline (the 2-objective running-min trick above does
    // not generalize: after sorting by one objective, the dominance
    // frontier of the remaining two is a staircase, not a scalar). The
    // scale-safe generalization: (1) pre-reduce to one candidate point per
    // day — (recency MAX, cheapest order MIN, order volume MAX); skyline
    // membership survives pre-reduction because a dominated day-point is
    // dominated by a day-point. (2) dominance-test the reduced set with a
    // prefix-restricted block-nested-loop anti-join (q.day ≥ p.day is the
    // sorted-prefix restriction). The quadratic step runs over the
    // CALENDAR-BOUNDED day set — |days| does not grow with corpus size, so
    // the plan survives 100× data: the only full-table work is the keyed
    // per-day aggregate.
    "q_skyline3" -> ((s, d) => {
      val byDay = Tables(s, d, "orders")
        .groupBy(to_date(col("o_orderdate")).as("o_day"))
        .agg(min(col("o_totalprice")).as("best_price"),
          count(lit(1)).as("n_orders"))
      byDay.as("p").join(byDay.as("q"),
          col("q.o_day") >= col("p.o_day") &&
            col("q.best_price") <= col("p.best_price") &&
            col("q.n_orders") >= col("p.n_orders") &&
            (col("q.o_day") > col("p.o_day") ||
              col("q.best_price") < col("p.best_price") ||
              col("q.n_orders") > col("p.n_orders")),
          "left_anti")
        .select(col("o_day"), col("best_price"), col("n_orders"))
        .orderBy(desc("o_day"))
    }),

    // Train/val/test split assignment (80/10/10): bucket = Knuth
    // multiplicative hash of doc_id mod 100; rollup of docs and chars per
    // (source, split) proves the strata land where expected.
    "q_split_assign" -> ((s, d) => {
      val bucket = pmod(col("doc_id") * lit(2654435761L), lit(100L))
      Tables(s, d, "documents")
        .withColumn("split",
          when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
        .groupBy("source", "split")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"))
        .orderBy("source", "split")
    })
  )

  def oracles: Map[String, String] = Map(
    "q_attribution" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, value, epoch_us(ts) AS ts_us,
        |    'ch' || CAST(CAST(json_extract_string(props, '$.k') AS INTEGER) % 4
        |                 AS VARCHAR) AS chan
        |  FROM events),
        |a AS (
        |  SELECT *, last_value(CASE WHEN event_type = 'click' THEN chan END
        |                       IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS attr_ch
        |  FROM e)
        |SELECT COALESCE(attr_ch, 'direct') AS channel,
        |  COUNT(*) AS n_purchases,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM a WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY channel""".stripMargin,
    "q_seq_pattern" ->
      """WITH p AS (
        |  SELECT user_id, COUNT(*) AS n_events,
        |    ' ' || string_agg(event_type, ' ' ORDER BY epoch_us(ts), event_id)
        |        || ' ' AS path
        |  FROM events GROUP BY user_id)
        |SELECT user_id, n_events,
        |  regexp_matches(path, ' click (\w+ )*purchase ') AS converted,
        |  regexp_matches(path, ' error (\w+ )*error ') AS error_repeat
        |FROM p ORDER BY user_id""".stripMargin,
    "q_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |s1 AS (
        |  SELECT *, min(CASE WHEN event_type = 'signup' THEN ts_us END)
        |    OVER (PARTITION BY user_id) AS t1 FROM e),
        |s2 AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND ts_us > t1 THEN ts_us END)
        |    OVER (PARTITION BY user_id) AS t2 FROM s1),
        |s3 AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts_us > t2 THEN ts_us END)
        |    OVER (PARTITION BY user_id) AS t3 FROM s2)
        |SELECT
        |  COUNT(DISTINCT CASE WHEN t1 IS NOT NULL THEN user_id END) AS u_signup,
        |  COUNT(DISTINCT CASE WHEN t2 IS NOT NULL THEN user_id END) AS u_click,
        |  COUNT(DISTINCT CASE WHEN t3 IS NOT NULL THEN user_id END) AS u_purchase
        |FROM s3""".stripMargin,
    "q_cohort_retention" ->
      """WITH o AS (
        |  SELECT o_custkey,
        |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS INTEGER) AS mo
        |  FROM orders),
        |c AS (
        |  SELECT *, min(mo) OVER (PARTITION BY o_custkey) AS cohort_mo FROM o)
        |SELECT cohort_mo, CAST(mo - cohort_mo AS INTEGER) AS "offset",
        |  COUNT(DISTINCT o_custkey) AS n_customers
        |FROM c WHERE mo - cohort_mo <= 11
        |GROUP BY cohort_mo, mo - cohort_mo
        |ORDER BY cohort_mo, "offset"""".stripMargin,
    // Ranked-window formulation — a different algorithm certifying the
    // struct-aggregate argmax (ties: max bal → min key; min bal → min key).
    "q_agg_argmax" ->
      """WITH hi AS (
        |  SELECT c_mktsegment, c_acctbal AS top_bal, c_custkey AS top_cust
        |  FROM customer
        |  QUALIFY row_number() OVER (
        |    PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) = 1),
        |lo AS (
        |  SELECT c_mktsegment, c_acctbal AS low_bal, c_custkey AS low_cust
        |  FROM customer
        |  QUALIFY row_number() OVER (
        |    PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) = 1)
        |SELECT h.c_mktsegment, h.top_bal, h.top_cust, l.low_bal, l.low_cust
        |FROM hi h JOIN lo l USING (c_mktsegment)
        |ORDER BY c_mktsegment""".stripMargin,
    // Plain global running sum — certifies the day-bucketed two-phase
    // prefix sum computes the same concurrency profile.
    "q_interval_overlap" ->
      s"""WITH o AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         |    lag(epoch_us(ts)) OVER (
         |      PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
         |  FROM events),
         |f AS (
         |  SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > $GapUs
         |                 THEN 1 ELSE 0 END AS new_s FROM o),
         |sn AS (
         |  SELECT *, SUM(new_s) OVER (
         |    PARTITION BY user_id ORDER BY ts_us, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
         |  FROM f),
         |sess AS (
         |  SELECT user_id, session_id, min(ts_us) AS s, max(ts_us) AS e
         |  FROM sn GROUP BY user_id, session_id),
         |pts AS (
         |  SELECT s AS pt, 1 AS delta FROM sess
         |  UNION ALL SELECT e + 1, -1 FROM sess),
         |ag AS (SELECT pt, CAST(SUM(delta) AS BIGINT) AS d FROM pts GROUP BY pt),
         |run AS (
         |  SELECT SUM(d) OVER (
         |    ORDER BY pt ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
         |  FROM ag)
         |SELECT (SELECT COUNT(*) FROM sess) AS n_sessions,
         |       CAST(MAX(conc) AS BIGINT) AS peak_concurrent
         |FROM run""".stripMargin,
    // Same single-pass formulation (certifies cross-engine agreement); the
    // quadratic dominance definition is brute-force-checked in AnalyticsSpec.
    "q_skyline" ->
      """WITH byday AS (
        |  SELECT CAST(o_orderdate AS DATE) AS o_day,
        |         min(o_totalprice) AS best_price,
        |         -datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS negd
        |  FROM orders GROUP BY 1, 3),
        |r AS (
        |  SELECT o_day, best_price, min(best_price) OVER (
        |    ORDER BY negd RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |    AS prev_min
        |  FROM byday)
        |SELECT o_day, best_price FROM r
        |WHERE prev_min IS NULL OR best_price < prev_min
        |ORDER BY o_day DESC""".stripMargin,
    // The textbook NOT-EXISTS dominance formulation — a genuinely different
    // algorithm certifying the anti-join frontier.
    "q_skyline3" ->
      """WITH byday AS (
        |  SELECT CAST(o_orderdate AS DATE) AS o_day,
        |         min(o_totalprice) AS best_price,
        |         COUNT(*) AS n_orders
        |  FROM orders GROUP BY 1)
        |SELECT o_day, best_price, n_orders FROM byday p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM byday q
        |  WHERE q.o_day >= p.o_day AND q.best_price <= p.best_price
        |    AND q.n_orders >= p.n_orders
        |    AND (q.o_day > p.o_day OR q.best_price < p.best_price
        |         OR q.n_orders > p.n_orders))
        |ORDER BY o_day DESC""".stripMargin,
    "q_split_assign" ->
      """SELECT source,
        |  CASE WHEN (doc_id * 2654435761) % 100 < 80 THEN 'train'
        |       WHEN (doc_id * 2654435761) % 100 < 90 THEN 'val'
        |       ELSE 'test' END AS split,
        |  COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS n_chars
        |FROM documents
        |GROUP BY 1, 2 ORDER BY source, split""".stripMargin
  )
}
