package graft.etl

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.queries.{Det, QueryModule}

/** End-to-end declared query for the ETL pipeline (A19/A20/A23/A25/A26 in
  * one oracle-checked flow):
  *
  *  1. materialize monthly source files `orders_YYYY-MM.parquet` for
  *     1996-01…1996-06 from the testdata `orders` table;
  *  2. run the full medallion pipeline with START=1996-01, END=1996-03 —
  *     filename pruning must skip the other three files — through bronze
  *     append, manifest logging, gold partitioned write and DDL
  *     registration;
  *  3. read gold back with a partition-pruning filter and aggregate.
  *
  * The DuckDB oracle computes the same aggregate directly from `orders` —
  * so file generation, pruning, casting, interval filtering, bronze append
  * and gold partitioning must all be lossless for the hashes to match.
  */
object EtlQueries extends QueryModule {

  private val Months = Seq("1996-01", "1996-02", "1996-03", "1996-04", "1996-05", "1996-06")
  private val StartYm = "1996-01"
  private val EndYm = "1996-03"

  private val ordersSchema = StructType(Seq(
    StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType), StructField("o_orderpriority", StringType)))

  def queries: Map[String, Q] = Map(
    "q_etl_gold" -> ((s, d) => {
      val tmp = graft.Scratch.dir("graft_etl_")
      val orders = Tables(s, d, "orders")
      // 1. monthly source files (exact month slices, reference naming).
      // ONE partitioned write instead of six filter+write jobs (r16,
      // guide §2.4/§1.2): the month slices are disjoint calendar
      // buckets of one contiguous range, so a single scan derives the
      // bucket (`date_format` ⇔ the per-month [start, next) filters) and
      // a dynamic-partition write lands every month in one pass; the
      // directories are then renamed to the reference's
      // `orders_YYYY-MM.parquet` naming. Same rows per file, one scan of
      // `orders` instead of six, 6 write jobs → 1.
      val lo = graft.dates.DateBounds.sqlLiteral(
        graft.dates.DateBounds.dateMinusTolerance(Months.head, 0))
      val hi = graft.dates.DateBounds.sqlLiteral(
        graft.dates.DateBounds.firstDayOfNextMonth(Months.last))
      orders
        .filter(col("o_orderdate") >= to_timestamp(lit(lo)) &&
          col("o_orderdate") < to_timestamp(lit(hi)))
        .withColumn("o_ym", date_format(col("o_orderdate"), "yyyy-MM"))
        .repartition(col("o_ym")) // one file per month directory
        .write.mode("overwrite").partitionBy("o_ym").parquet(s"$tmp/srcp")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$tmp/src"))
      Months.foreach { ym =>
        val from = java.nio.file.Paths.get(s"$tmp/srcp/o_ym=$ym")
        val to = java.nio.file.Paths.get(s"$tmp/src/orders_$ym.parquet")
        if (java.nio.file.Files.exists(from))
          java.nio.file.Files.move(from, to)
        else // a month with zero rows still lands as an (empty) source dir
          orders.limit(0).write.parquet(to.toString)
      }
      // 2. the pipeline (bronze → manifests → gold + DDL)
      val cfg = Etl.Config(
        srcDir = s"$tmp/src", bronzeDir = s"$tmp/bronze", goldDir = s"$tmp/gold",
        logDir = s"$tmp/logs", filePrefix = "orders", tsCol = "o_orderdate",
        startYm = StartYm, endYm = EndYm, toleranceHours = 72,
        bronzeSchema = ordersSchema,
        goldDropCols = Seq("o_orderstatus", "o_orderpriority"),
        yearCol = "o_year", monthCol = "o_month")
      Etl.run(s, cfg, runDate = "1996-04-01")
      // 3. gold read with a partition filter (pruned at the directory level)
      val gold = s.read.parquet(cfg.goldDir)
        .filter(col("o_year") === 1996 && col("o_month") <= 3)
      val result = gold
        .groupBy("o_year", "o_month")
        .agg(count(lit(1)).as("n_orders"),
          Det.dsum(col("o_totalprice")).as("sum_total"),
          countDistinct(col("o_custkey")).as("n_custs"))
        .orderBy("o_year", "o_month")
      // A21 — analytics results also land as headered CSV like the reference
      Etl.writeCsv(result, s"$tmp/csv/monthly_totals")
      result
    }),

    // Small-file compaction through the DRIVER'S oracle gate (round-6
    // advice: Compact was the last substantial component certified only by
    // ScalaTest): a 24-file layout of the orders projection is compacted
    // to ~1 sorted file, then read back in full. The oracle is the
    // PRE-compaction content straight from the parquet table, so a
    // compaction that drops, duplicates or corrupts any row hash-fails the
    // correctness gate — CompactSpec separately asserts the file count
    // shrank and the sort clustered. At 100 TB this is the maintenance
    // pass that keeps an incremental sink scannable (thousands of KB-scale
    // files → footer/open/schedule overhead dominates long before I/O).
    "q_compact_roundtrip" -> ((s, d) => {
      val tmp = graft.Scratch.dir("graft_compactq_")
      val dir = s"$tmp/orders_small"
      Tables(s, d, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
        .repartition(24).write.parquet(dir)
      Compact.directory(s, dir, targetBytes = 256L * 1024 * 1024,
        sortBy = Some("o_orderkey"))
      s.read.parquet(dir).orderBy("o_orderkey")
    }),

    // MERGE INTO (upsert) over orders: keys ≡3 (mod 10) get a price bump +
    // status 'U' (matched → update), keys ≡7 (mod 10) re-enter with shifted
    // keys + status 'N' (unmatched → insert), everything else survives
    // untouched. Spark runs the union+keep-winner form (one shuffle); the
    // oracle runs FULL OUTER JOIN + COALESCE — the two algorithms must
    // produce identical rows.
    "q_merge_upsert" -> ((s, d) => {
      val cols = Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
      val base = Tables(s, d, "orders").select(cols.map(col): _*)
      val updates = base.filter(pmod(col("o_orderkey"), lit(10)) === 3)
        .withColumn("o_totalprice", col("o_totalprice") * 1.1)
        .withColumn("o_orderstatus", lit("U"))
      val inserts = base.filter(pmod(col("o_orderkey"), lit(10)) === 7)
        .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
        .withColumn("o_orderstatus", lit("N"))
      Upsert.keyed(base, updates.unionByName(inserts), Seq("o_orderkey"))
        .orderBy("o_orderkey")
    }),

    // SCD Type 2 over the customer dimension: keys ≡0 (mod 10) change
    // segment + balance and land as version 2; their version-1 rows stay in
    // the output closed (is_current=false, valid_to=2). One union + one
    // keyed window — a single shuffle (see etl/Scd.scala); the oracle
    // states the same history as CASE projections + UNION ALL.
    "q_scd2" -> ((s, d) => {
      val cols = Seq("c_custkey", "c_mktsegment", "c_acctbal")
      val base = Tables(s, d, "customer").select(cols.map(col): _*)
      val changes = base.filter(pmod(col("c_custkey"), lit(10)) === 0)
        .withColumn("c_mktsegment", lit("MACHINERY"))
        .withColumn("c_acctbal", col("c_acctbal") + 100.0)
      Scd.type2(base, changes, Seq("c_custkey"), newVersion = 2)
        .orderBy("c_custkey", "version")
    }),

    // CDC changelog apply (MERGE with deletes): U rows update their key,
    // I rows insert, D rows DELETE — the change-data-feed sync step Upsert
    // alone can't express. Same one-shuffle union + keep-winner shape; the
    // oracle is the FULL OUTER JOIN + WHERE formulation.
    "q_cdc_apply" -> ((s, d) => {
      val cols = Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
      val base = Tables(s, d, "orders").select(cols.map(col): _*)
      val changes = base.filter(pmod(col("o_orderkey"), lit(10)) === 3)
        .withColumn("o_totalprice", col("o_totalprice") * 1.1)
        .withColumn("o_orderstatus", lit("U"))
        .withColumn("op", lit("U"))
        .unionByName(base.filter(pmod(col("o_orderkey"), lit(10)) === 7)
          .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
          .withColumn("o_orderstatus", lit("N"))
          .withColumn("op", lit("I")))
        .unionByName(base.filter(pmod(col("o_orderkey"), lit(10)) === 5)
          .withColumn("op", lit("D")))
      Upsert.applyChanges(base, changes, Seq("o_orderkey"), "op")
        .orderBy("o_orderkey")
    }),

    // Table diff / reconciliation: compare two snapshots by key and emit
    // added / removed / changed rows (unchanged excluded) — the audit every
    // sync job runs after a CDC apply. One full-outer join on the key;
    // snapshot B is the cdc-apply result recomputed in BOTH engines, so the
    // hash certifies apply + diff as a composition.
    "q_table_diff" -> ((s, d) => {
      val cols = Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
      val base = Tables(s, d, "orders").select(cols.map(col): _*)
      val changes = base.filter(pmod(col("o_orderkey"), lit(10)) === 3)
        .withColumn("o_totalprice", col("o_totalprice") * 1.1)
        .withColumn("o_orderstatus", lit("U"))
        .withColumn("op", lit("U"))
        .unionByName(base.filter(pmod(col("o_orderkey"), lit(10)) === 7)
          .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
          .withColumn("o_orderstatus", lit("N"))
          .withColumn("op", lit("I")))
        .unionByName(base.filter(pmod(col("o_orderkey"), lit(10)) === 5)
          .withColumn("op", lit("D")))
      val after = Upsert.applyChanges(base, changes, Seq("o_orderkey"), "op")
      val l = base.select(col("o_orderkey"),
        col("o_totalprice").as("price_a"), col("o_orderstatus").as("status_a"))
      val r = after.select(col("o_orderkey"),
        col("o_totalprice").as("price_b"), col("o_orderstatus").as("status_b"))
      l.join(r, Seq("o_orderkey"), "full_outer")
        .withColumn("diff_status",
          when(col("status_b").isNull, "removed")
            .when(col("status_a").isNull, "added")
            .when(col("price_a") =!= col("price_b") ||
              col("status_a") =!= col("status_b"), "changed")
            .otherwise("unchanged"))
        .filter(col("diff_status") =!= "unchanged")
        .select("o_orderkey", "diff_status", "price_a", "price_b")
        .orderBy("o_orderkey")
    })
  )

  def oracles: Map[String, String] = Map(
    "q_etl_gold" ->
      s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         |       CAST(month(o_orderdate) AS INTEGER) AS o_month,
         |       COUNT(*) AS n_orders, ${Det.sqlSum("o_totalprice")} AS sum_total,
         |       COUNT(DISTINCT o_custkey) AS n_custs
         |FROM orders
         |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
         |GROUP BY 1, 2 ORDER BY o_year, o_month""".stripMargin,
    "q_compact_roundtrip" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_merge_upsert" ->
      """WITH upd AS (
        |  SELECT o_orderkey, o_custkey,
        |         o_totalprice * CAST(1.1 AS DOUBLE) AS o_totalprice,
        |         'U' AS o_orderstatus
        |  FROM orders WHERE o_orderkey % 10 = 3
        |  UNION ALL
        |  SELECT o_orderkey + 100000000, o_custkey, o_totalprice, 'N'
        |  FROM orders WHERE o_orderkey % 10 = 7)
        |SELECT COALESCE(u.o_orderkey, b.o_orderkey) AS o_orderkey,
        |       COALESCE(u.o_custkey, b.o_custkey) AS o_custkey,
        |       COALESCE(u.o_totalprice, b.o_totalprice) AS o_totalprice,
        |       COALESCE(u.o_orderstatus, b.o_orderstatus) AS o_orderstatus
        |FROM orders b FULL OUTER JOIN upd u ON b.o_orderkey = u.o_orderkey
        |ORDER BY o_orderkey""".stripMargin,
    "q_scd2" ->
      """WITH chg AS (
        |  SELECT c_custkey, 'MACHINERY' AS c_mktsegment,
        |         c_acctbal + CAST(100.0 AS DOUBLE) AS c_acctbal
        |  FROM customer WHERE c_custkey % 10 = 0)
        |SELECT c_custkey, c_mktsegment, c_acctbal, 1 AS version,
        |       (c_custkey % 10 <> 0) AS is_current,
        |       CASE WHEN c_custkey % 10 = 0 THEN 2 ELSE NULL END AS valid_to
        |FROM customer
        |UNION ALL
        |SELECT c_custkey, c_mktsegment, c_acctbal, 2 AS version,
        |       true AS is_current, CAST(NULL AS INTEGER) AS valid_to
        |FROM chg
        |ORDER BY c_custkey, version""".stripMargin,
    "q_cdc_apply" ->
      """WITH chg AS (
        |  SELECT o_orderkey, o_custkey,
        |         o_totalprice * CAST(1.1 AS DOUBLE) AS o_totalprice,
        |         'U' AS o_orderstatus, 'U' AS op
        |  FROM orders WHERE o_orderkey % 10 = 3
        |  UNION ALL
        |  SELECT o_orderkey + 100000000, o_custkey, o_totalprice, 'N', 'I'
        |  FROM orders WHERE o_orderkey % 10 = 7
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus, 'D'
        |  FROM orders WHERE o_orderkey % 10 = 5)
        |SELECT COALESCE(u.o_orderkey, b.o_orderkey) AS o_orderkey,
        |       COALESCE(u.o_custkey, b.o_custkey) AS o_custkey,
        |       COALESCE(u.o_totalprice, b.o_totalprice) AS o_totalprice,
        |       COALESCE(u.o_orderstatus, b.o_orderstatus) AS o_orderstatus
        |FROM orders b FULL OUTER JOIN chg u ON b.o_orderkey = u.o_orderkey
        |WHERE u.op IS NULL OR u.op <> 'D'
        |ORDER BY o_orderkey""".stripMargin,
    "q_table_diff" ->
      """WITH chg AS (
        |  SELECT o_orderkey, o_custkey,
        |         o_totalprice * CAST(1.1 AS DOUBLE) AS o_totalprice,
        |         'U' AS o_orderstatus, 'U' AS op
        |  FROM orders WHERE o_orderkey % 10 = 3
        |  UNION ALL
        |  SELECT o_orderkey + 100000000, o_custkey, o_totalprice, 'N', 'I'
        |  FROM orders WHERE o_orderkey % 10 = 7
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus, 'D'
        |  FROM orders WHERE o_orderkey % 10 = 5),
        |after AS (
        |  SELECT COALESCE(u.o_orderkey, b.o_orderkey) AS o_orderkey,
        |         COALESCE(u.o_totalprice, b.o_totalprice) AS price_b,
        |         COALESCE(u.o_orderstatus, b.o_orderstatus) AS status_b
        |  FROM orders b FULL OUTER JOIN chg u ON b.o_orderkey = u.o_orderkey
        |  WHERE u.op IS NULL OR u.op <> 'D'),
        |d AS (
        |  SELECT COALESCE(a.o_orderkey, f.o_orderkey) AS o_orderkey,
        |    CASE WHEN f.status_b IS NULL THEN 'removed'
        |         WHEN a.o_orderstatus IS NULL THEN 'added'
        |         WHEN a.o_totalprice <> f.price_b
        |              OR a.o_orderstatus <> f.status_b THEN 'changed'
        |         ELSE 'unchanged' END AS diff_status,
        |    a.o_totalprice AS price_a, f.price_b AS price_b
        |  FROM orders a FULL OUTER JOIN after f ON a.o_orderkey = f.o_orderkey)
        |SELECT o_orderkey, diff_status, price_a, price_b FROM d
        |WHERE diff_status <> 'unchanged'
        |ORDER BY o_orderkey""".stripMargin
  )
}
