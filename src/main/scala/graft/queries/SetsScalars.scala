package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, DoubleType, IntegerType, LongType, StringType}

import graft.Tables

/** Part B set operations + scalar-function surface (SURVEY.md §2 B10-B11).
  *
  * B10: UNION (distinct) / INTERSECT / EXCEPT between the nation-key sets of
  * customers and high-balance suppliers, tagged and stacked into one result.
  * Each set op is a hash-aggregate-style dedup/shuffle on the key — at scale,
  * identical cost to a distinct groupBy; no driver-side sets.
  *
  * B11: the string/math/date scalar batteries — all built-in Catalyst
  * expressions (codegen'd, pushdown-friendly), zero UDFs.
  */
object SetsScalars extends QueryModule {

  /** QUALIFY — ONE statement on BOTH engines (r14): Spark's grammar
    * lacks the post-window filter (users write the verbose subquery);
    * the parser extension rewrites `… QUALIFY p [ORDER BY …]` into
    * exactly that subquery, while DuckDB supports the clause natively —
    * so the oracle IS the query text, the strongest possible
    * zero-drift statement for a dialect extension. Top-2 orders per
    * customer by price. */
  private val QualifySql =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  CAST(row_number() OVER (PARTITION BY o_custkey
      |    ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk
      |FROM orders
      |QUALIFY rk <= 2
      |ORDER BY o_custkey, rk""".stripMargin

  /** One SQL text for Spark AND DuckDB (the q_cte pattern): uncorrelated
    * scalar subquery in SELECT, an IN subquery (planned as a semi join),
    * and a per-customer aggregate CTE joined once. The CTE used to be TWO
    * correlated scalar subqueries (COUNT and SUM per o_custkey), but
    * Catalyst's MergeScalarSubqueries does not fuse correlated subqueries
    * — each decorrelated into its OWN orders scan + semi-join + aggregate
    * + broadcast join subtree, tripling the orders I/O (observed 6× wall
    * clock at sf0.1). Fusing them into one GROUP BY produces the plan the
    * optimizer should have: orders scanned once for the aggregate, one
    * join back. The spend-vs-average comparison is cross-multiplied so
    * both sides stay exact DECIMAL — a correlated AVG of doubles would be
    * summation-order dependent across engines. */
  private val SubqueriesSql =
    """WITH per_cust AS (
      |  SELECT o_custkey, COUNT(*) AS cnt,
      |         SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS sum_price
      |  FROM orders GROUP BY o_custkey)
      |SELECT o.o_orderkey, o.o_custkey, o.o_totalprice,
      |  (SELECT MAX(o4.o_totalprice) FROM orders o4) AS max_price_global
      |FROM orders o JOIN per_cust p ON p.o_custkey = o.o_custkey
      |WHERE CAST(o.o_totalprice AS DECIMAL(18,4)) * p.cnt > 2 * p.sum_price
      |  AND o.o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      |ORDER BY o.o_orderkey""".stripMargin

  /** One SQL text for Spark AND DuckDB: a correlated LATERAL subquery with
    * ORDER BY + LIMIT — "top 2 orders for every MACHINERY customer" as the
    * user writes it. Catalyst decorrelates the limit into a ranked window
    * join (DecorrelateInnerQuery) — the per-customer subquery never
    * re-executes row-at-a-time, so at scale this is exactly the windowed
    * top-k-per-group plan; the comma-LATERAL form is an inner (cross apply)
    * join, dropping order-less customers on both engines. */
  private val LateralSql =
    """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
      |FROM customer c, LATERAL (
      |  SELECT o_orderkey, o_totalprice FROM orders
      |  WHERE o_custkey = c.c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
      |WHERE c.c_mktsegment = 'MACHINERY'
      |ORDER BY c.c_custkey, o.o_orderkey""".stripMargin

  /** One SQL text for Spark AND DuckDB: WITH RECURSIVE hierarchy walk
    * (Spark 4 supports recursive CTEs; semantics match DuckDB's UNION ALL
    * recursion). The tree is the implicit binary-heap encoding over
    * customer keys — parent(k) = floor((k−1)/2), root k=0 — so recursion
    * depth is log₂(n) and each recursive step is ONE equi-join of the
    * frontier against the (broadcastable) node table: the textbook
    * iterative-join plan, no row-at-a-time evaluation. floor(...) + CAST is
    * used instead of integer `/` because Spark's int division yields DOUBLE
    * while DuckDB's CAST rounds — floor-then-cast is exact on both. The
    * `depth < 7` guard is the standard bounded-recursion pattern (the cost
    * of a recursive CTE is per-ITERATION driver overhead, so unbounded
    * depth would grow with log n of the data; the cap makes iteration count
    * — and wall clock — scale-independent, like connectedComponents'
    * maxIters). */
  private val RecursiveTreeSql =
    s"""WITH RECURSIVE tree (k, root, depth) AS (
       |  SELECT c_custkey AS k, c_custkey AS root, 0 AS depth
       |  FROM customer WHERE c_custkey = 0
       |  UNION ALL
       |  SELECT c.c_custkey, t.root, t.depth + 1
       |  FROM customer c JOIN tree t
       |    ON CAST(floor((c.c_custkey - 1) / 2.0) AS BIGINT) = t.k
       |  WHERE c.c_custkey >= 1 AND t.depth < 7)
       |SELECT depth, COUNT(*) AS n_nodes,
       |  MIN(k) AS min_key, MAX(k) AS max_key,
       |  ${Det.sqlSum("b.c_acctbal")} AS sum_bal
       |FROM tree JOIN customer b ON b.c_custkey = tree.k
       |GROUP BY depth ORDER BY depth""".stripMargin

  def queries: Map[String, Q] = Map(
    // B11g — recursive CTE (hierarchy / graph-walk SQL surface).
    "q_recursive_tree" -> ((s, d) => {
      graft.Tables.register(s, d, "customer")
      s.sql(RecursiveTreeSql)
    }),

    // B11d — subquery surface: scalar (uncorrelated + correlated) and IN.
    "q_subqueries" -> ((s, d) => {
      graft.Tables.register(s, d, "orders", "customer")
      s.sql(SubqueriesSql)
    }),

    // QUALIFY (r14) — the post-window filter as a dialect extension:
    // the parser rewrites the clause to the subquery it abbreviates;
    // the oracle runs the IDENTICAL statement through DuckDB's native
    // QUALIFY support.
    "q_qualify" -> ((s, d) => {
      graft.Tables.register(s, d, "orders")
      s.sql(QualifySql)
    }),

    // B11f — LATERAL (correlated table subquery / cross apply).
    "q_lateral" -> ((s, d) => {
      graft.Tables.register(s, d, "orders", "customer")
      s.sql(LateralSql)
    }),

    // B11e — null-handling battery over real outer-join nulls (testdata has
    // no stored nulls): coalesce, NULLIF, IS NULL, CASE, and the
    // DataFrameNaFunctions fill surface. All per-row Catalyst expressions.
    // ANSI-safety battery: the try_* family returns NULL where the strict
    // operator would raise — divide-by-zero, malformed casts, out-of-range
    // array indices, BIGINT overflow, unparseable timestamps. The behavior
    // a 100 TB batch job needs: one poisoned row must not kill a 10-hour
    // run, and the nulls stay auditable (count them, don't swallow them).
    // Per-row codegen projections, no shuffle.
    "q_try_funcs" -> ((s, d) =>
      Tables(s, d, "orders").select(
        col("o_orderkey"),
        expr("try_divide(o_orderkey, o_custkey % 7)").as("safe_div"),
        expr("try_cast(o_orderpriority AS INT)").as("bad_cast"),
        // index ranges 1..5 — 0 is invalid USAGE (always raises, even under
        // try_); only out-of-range lookups are the recoverable case
        try_element_at(array(lit(10), lit(20)),
          (pmod(col("o_orderkey"), lit(5)) + 1).cast(IntegerType)).as("maybe_elem"),
        expr("try_multiply(o_orderkey, 4611686018427387903L)").as("overflow_mul"),
        expr("try_to_timestamp(concat('2024-01-0', CAST(o_orderkey % 3 + 1 AS STRING)))")
          .as("good_ts"),
        expr("try_to_timestamp(o_orderpriority)").as("bad_ts"))
        .orderBy("o_orderkey")),

    "q_nulls" -> ((s, d) => {
      val urgent = Tables(s, d, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .groupBy("o_custkey")
        .agg(graft.queries.Det.dsum(col("o_totalprice")).as("urgent_spend"),
          count(lit(1)).as("n_urgent"))
      Tables(s, d, "customer")
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_outer")
        .select(col("c_custkey"),
          coalesce(col("urgent_spend"), lit(0.0)).as("spend_or_zero"),
          col("n_urgent").isNull.as("no_urgent"),
          nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_nb"),
          when(col("n_urgent").isNull, lit("none"))
            .when(col("n_urgent") > 10, lit("many"))
            .otherwise(lit("some")).as("bucket"),
          col("n_urgent"))
        .na.fill(Map("n_urgent" -> -1L))
        .orderBy("c_custkey")
    }),

    // B10 — union/intersect/except, each branch tagged. Supplier side is
    // filtered (acctbal > 5000) so EXCEPT is non-empty on the testdata.
    "q_setops" -> ((s, d) => {
      val custNations = Tables(s, d, "customer").select(col("c_nationkey").as("nk"))
      val suppNations = Tables(s, d, "supplier")
        .filter(col("s_acctbal") > 5000.0)
        .select(col("s_nationkey").as("nk"))
      val u = custNations.union(suppNations).distinct()
        .select(lit("union").as("tag"), col("nk"))
      val i = custNations.intersect(suppNations)
        .select(lit("intersect").as("tag"), col("nk"))
      val e = custNations.except(suppNations)
        .select(lit("except").as("tag"), col("nk"))
      u.union(i).union(e).orderBy("tag", "nk")
    }),

    // B11a — string + math scalar battery over part.
    "q_scalar_funcs" -> ((s, d) =>
      Tables(s, d, "part")
        .select(
          col("p_partkey"),
          substring(col("p_name"), 1, 5).as("name5"),
          upper(col("p_brand")).as("brand_up"),
          lower(col("p_type")).as("type_lo"),
          concat(col("p_type"), lit("#"), col("p_brand")).as("type_brand"),
          col("p_name").like("%red%").as("is_red"),
          length(col("p_name")).cast(IntegerType).as("name_len"),
          round(col("p_retailprice"), 1).as("price_r1"),
          abs(col("p_retailprice") - lit(1000.0)).as("price_dist"),
          floor(col("p_retailprice")).cast(LongType).as("price_fl"),
          ceil(col("p_retailprice")).cast(LongType).as("price_ce"),
          (col("p_size") % 7).cast(IntegerType).as("size_mod"))
        .orderBy("p_partkey")),

    // B11c — array/map scalar battery over embeddings (the project's only
    // complex-typed table): indexing, slicing, sizes, scalar search. All
    // per-row Catalyst expressions; float cells compare exactly (same bits
    // both engines). The slice is surfaced as a STRING of fixed-point longs
    // (not a raw array column): the driver's comparator sorts result frames
    // in pandas, which cannot hash/sort ndarray cells — round-2 ERR.
    "q_scalar_arrays" -> ((s, d) =>
      Tables(s, d, "embeddings")
        .select(
          col("vec_id"),
          size(col("embedding")).cast(IntegerType).as("dim"),
          element_at(col("embedding"), 1).as("first_v"),
          element_at(col("embedding"), -1).as("last_v"),
          array_join(
            transform(slice(col("embedding"), 1, 4),
              x => floor(x.cast(DoubleType) * 1e12).cast(StringType)),
            ",").as("head4"),
          array_position(col("embedding"), element_at(col("embedding"), 3))
            .cast(IntegerType).as("pos_of_third"),
          array_contains(col("embedding"), lit(0.0f)).as("has_zero"))
        .orderBy("vec_id")),

    // B11i — array SET-operation battery: union/intersect/except/distinct/
    // flatten per row (all codegen'd; Spark's array set ops return DISTINCT
    // elements, mirrored by DuckDB list_distinct compositions). Outputs are
    // sorted and joined to strings so the comparison is order-free.
    "q_scalar_array_ops" -> ((s, d) => {
      val a = array(col("o_orderstatus"), lit("X"), col("o_orderpriority"))
      val b = array(lit("X"), lit("O"), lit("1-URGENT"))
      Tables(s, d, "orders")
        .select(
          col("o_orderkey"),
          array_join(array_sort(array_union(a, b)), ",").as("u"),
          array_join(array_sort(array_intersect(a, b)), ",").as("i"),
          array_join(array_sort(array_except(a, b)), ",").as("e"),
          size(array_distinct(a)).cast(IntegerType).as("nd"),
          array_join(flatten(array(a, b)), ",").as("fl"))
        .orderBy("o_orderkey")
    }),

    // B11h — MAP-type scalar battery: build a map per row from the typed
    // columns, then read it back through the map surface (element_at,
    // size, map_keys via sort for determinism, map_contains_key,
    // map_filter). All per-row codegen'd Catalyst expressions. The oracle
    // states the EXPECTED VALUES directly from the same inputs — map ops
    // are pure data functions, so proving Spark's map semantics emit
    // exactly the source values needs no DuckDB map support (whose
    // extraction returns lists, not scalars).
    "q_scalar_maps" -> ((s, d) => {
      val m = map(
        lit("status"), col("o_orderstatus"),
        lit("priority"), col("o_orderpriority"))
      Tables(s, d, "orders")
        .select(
          col("o_orderkey"),
          element_at(m, "status").as("m_status"),
          element_at(m, "priority").as("m_priority"),
          size(m).cast(IntegerType).as("m_size"),
          array_join(array_sort(map_keys(m)), ",").as("m_keys"),
          map_contains_key(m, "status").as("has_status"),
          map_contains_key(m, "missing").as("has_missing"),
          size(map_filter(m, (_, v) => v === lit("O")))
            .cast(IntegerType).as("n_open_vals"))
        .orderBy("o_orderkey")
    }),

    // B11f — regex scalar battery over events.props (the only column with
    // digits): global masking (the PII-scrub shape every training-data
    // pipeline runs), group extraction, and a boolean match. Patterns stay
    // in the char-class subset Java regex and RE2 agree on.
    "q_regex_funcs" -> ((s, d) =>
      Tables(s, d, "events")
        .select(
          col("event_id"),
          regexp_replace(col("props"), "[0-9]+", "#").as("masked"),
          regexp_extract(col("props"), "([0-9]+)", 1).cast(LongType).as("first_num"),
          col("props").rlike("[0-9]+").as("has_digits"))
        .orderBy("event_id")),

    // B11g — generator (UDTF) surface: the reference needs no UDTFs and
    // SURVEY §2 maps that surface to Spark's built-in Generators. posexplode
    // covers both explode and position tracking in one declared query; the
    // token stream is the shape every tokenization pipeline fans out to.
    // Generate runs inside whole-stage codegen and multiplies rows WITHOUT a
    // shuffle — at 100 TB the explode output never materializes globally,
    // it flows straight into the next per-partition operator. DuckDB twin:
    // parallel unnest (zip semantics) over the same string_split.
    "q_explode" -> ((s, d) =>
      Tables(s, d, "documents")
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
        .orderBy("doc_id", "pos")),

    // B11b — date/time scalar battery over orders (timestamps are
    // midnight-aligned, so day arithmetic is exact on both engines).
    "q_scalar_dates" -> ((s, d) =>
      Tables(s, d, "orders")
        .select(
          col("o_orderkey"),
          to_date(col("o_orderdate")).as("od"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast(DateType))
            .cast(IntegerType).as("days_since"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          last_day(col("o_orderdate")).as("month_end"),
          quarter(col("o_orderdate")).cast(IntegerType).as("q"),
          dayofmonth(col("o_orderdate")).cast(IntegerType).as("dom"),
          add_months(to_date(col("o_orderdate")), 3).as("plus3m"))
        .orderBy("o_orderkey"))
  )

  def oracles: Map[String, String] = Map(
    // Semantics mirror, not syntax: DuckDB raises where Spark's try_* nulls,
    // so each column states the null-producing condition explicitly.
    "q_try_funcs" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_custkey % 7 = 0 THEN NULL
        |       ELSE CAST(o_orderkey AS DOUBLE) / CAST(o_custkey % 7 AS DOUBLE)
        |  END AS safe_div,
        |  TRY_CAST(o_orderpriority AS INTEGER) AS bad_cast,
        |  CASE WHEN o_orderkey % 5 = 0 THEN 10
        |       WHEN o_orderkey % 5 = 1 THEN 20
        |       ELSE NULL END AS maybe_elem,
        |  CASE WHEN o_orderkey <= 2 THEN o_orderkey * 4611686018427387903
        |       ELSE NULL END AS overflow_mul,
        |  TRY_CAST('2024-01-0' || CAST(o_orderkey % 3 + 1 AS VARCHAR) AS TIMESTAMP) AS good_ts,
        |  TRY_CAST(o_orderpriority AS TIMESTAMP) AS bad_ts
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_recursive_tree" -> RecursiveTreeSql,
    "q_subqueries" -> SubqueriesSql,
    "q_qualify" -> QualifySql,
    "q_lateral" -> LateralSql,
    "q_nulls" ->
      s"""SELECT c.c_custkey,
         |  COALESCE(u.urgent_spend, 0.0) AS spend_or_zero,
         |  (u.n_urgent IS NULL) AS no_urgent,
         |  NULLIF(c.c_mktsegment, 'BUILDING') AS seg_nb,
         |  CASE WHEN u.n_urgent IS NULL THEN 'none'
         |       WHEN u.n_urgent > 10 THEN 'many' ELSE 'some' END AS bucket,
         |  COALESCE(u.n_urgent, -1) AS n_urgent
         |FROM customer c
         |LEFT JOIN (SELECT o_custkey, ${graft.queries.Det.sqlSum("o_totalprice")} AS urgent_spend,
         |                  COUNT(*) AS n_urgent
         |           FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey) u
         |  ON c.c_custkey = u.o_custkey
         |ORDER BY c.c_custkey""".stripMargin,
    "q_setops" ->
      """SELECT 'union' AS tag, nk FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  UNION SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000)
        |UNION ALL
        |SELECT 'intersect', nk FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  INTERSECT SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000)
        |UNION ALL
        |SELECT 'except', nk FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  EXCEPT SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000)
        |ORDER BY tag, nk""".stripMargin,
    "q_scalar_funcs" ->
      """SELECT p_partkey,
        |  substring(p_name, 1, 5) AS name5,
        |  upper(p_brand) AS brand_up,
        |  lower(p_type) AS type_lo,
        |  concat(p_type, '#', p_brand) AS type_brand,
        |  p_name LIKE '%red%' AS is_red,
        |  CAST(length(p_name) AS INTEGER) AS name_len,
        |  round(p_retailprice, 1) AS price_r1,
        |  abs(p_retailprice - 1000.0) AS price_dist,
        |  CAST(floor(p_retailprice) AS BIGINT) AS price_fl,
        |  CAST(ceil(p_retailprice) AS BIGINT) AS price_ce,
        |  CAST(p_size % 7 AS INTEGER) AS size_mod
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_scalar_arrays" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS INTEGER) AS dim,
        |  embedding[1] AS first_v,
        |  embedding[-1] AS last_v,
        |  array_to_string([CAST(CAST(floor(CAST(x AS DOUBLE) * 1000000000000) AS BIGINT) AS VARCHAR)
        |                   for x in embedding[1:4]], ',') AS head4,
        |  CAST(list_position(embedding, embedding[3]) AS INTEGER) AS pos_of_third,
        |  list_contains(embedding, CAST(0.0 AS FLOAT)) AS has_zero
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_regex_funcs" ->
      """SELECT event_id,
        |  regexp_replace(props, '[0-9]+', '#', 'g') AS masked,
        |  CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT) AS first_num,
        |  regexp_matches(props, '[0-9]+') AS has_digits
        |FROM events ORDER BY event_id""".stripMargin,
    "q_scalar_array_ops" ->
      """WITH t AS (
        |  SELECT o_orderkey,
        |    [o_orderstatus, 'X', o_orderpriority] AS a,
        |    ['X', 'O', '1-URGENT'] AS b
        |  FROM orders)
        |SELECT o_orderkey,
        |  array_to_string(list_sort(list_distinct(list_concat(a, b))), ',') AS u,
        |  array_to_string(list_sort(list_intersect(a, b)), ',') AS i,
        |  COALESCE(array_to_string(list_sort(list_distinct(
        |    list_filter(a, x -> NOT list_contains(b, x)))), ','), '') AS e,
        |  CAST(len(list_distinct(a)) AS INTEGER) AS nd,
        |  array_to_string(list_concat(a, b), ',') AS fl
        |FROM t ORDER BY o_orderkey""".stripMargin,
    "q_scalar_maps" ->
      """SELECT o_orderkey,
        |  o_orderstatus AS m_status,
        |  o_orderpriority AS m_priority,
        |  CAST(2 AS INTEGER) AS m_size,
        |  'priority,status' AS m_keys,
        |  true AS has_status,
        |  false AS has_missing,
        |  CAST(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END
        |       + CASE WHEN o_orderpriority = 'O' THEN 1 ELSE 0 END
        |       AS INTEGER) AS n_open_vals
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_explode" ->
      """SELECT doc_id, CAST(pos AS INTEGER) AS pos, token FROM (
        |  SELECT doc_id,
        |    unnest(range(0, len(string_split(text, ' ')))) AS pos,
        |    unnest(string_split(text, ' ')) AS token
        |  FROM documents)
        |ORDER BY doc_id, pos""".stripMargin,
    "q_scalar_dates" ->
      """SELECT o_orderkey,
        |  CAST(o_orderdate AS DATE) AS od,
        |  CAST(datediff('day', DATE '1995-01-01', o_orderdate) AS INTEGER) AS days_since,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS q,
        |  CAST(day(o_orderdate) AS INTEGER) AS dom,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m
        |FROM orders ORDER BY o_orderkey""".stripMargin
  )
}
