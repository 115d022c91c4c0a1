package graft.llm

import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.QueryModule

/** Corpus subsampling — the operation every training-data pipeline runs
  * before expensive downstream stages (dedup on a sample first, quality
  * sweeps, eval splits).
  *
  * Every sampler here is DETERMINISTIC key-hash selection — keep a row iff
  * `hash(key) mod M < k`. Unlike RNG sampling (Spark's `.sample` /
  * `sampleBy`, whose seeded per-partition XORShift is engine- and
  * partitioning-specific) this is a pure function of the data: the same
  * rows are selected on every run, every engine, any partitioning — which
  * makes a sample re-joinable across tables (hash the same user_id
  * everywhere and the per-user sample is CONSISTENT across a 100-table
  * lake), auditable, and cell-exact against the DuckDB oracle. Round-4
  * advice item: `q_sample`/`q_sample_stratified` were the RNG forms with
  * no oracle; both are now hash-threshold forms, flipping them into the
  * 100%-oracle-certified set. The hash is plain modular arithmetic (an LCG
  * step over the key) — a scan-side codegen'd filter, zero shuffle.
  */
object Sampling extends QueryModule {

  private val Seed = 42L

  /** LCG-step hash over [0, 2^31−1). */
  private val HashA = 1103515245L
  private val HashC = 12345L
  private val HashP = 2147483647L

  /** Overflow-safe LCG step: the key is reduced mod P BEFORE the multiply,
    * so the largest intermediate is (P−1+Seed)·HashA < 2^61 — inside
    * Long/BIGINT on both engines at ANY key (round-5 advice: the unreduced
    * `(key + Seed) * HashA` overflows once the key exceeds ~2^33, throwing
    * under Spark's ANSI mode and erroring in DuckDB — exactly the doc-id
    * range a 100 TB corpus reaches). For keys in [0, HashP) — HashP =
    * 2^31−1, covering all test SFs — the value is identical to the
    * unreduced form (at key = HashP the reduction wraps). Mirrored verbatim by
    * [[sqlLcg]] in the oracles. */
  private def lcg(key: org.apache.spark.sql.Column, seed: Long) =
    (((key % HashP) + seed) * HashA + HashC) % HashP

  private def sqlLcg(key: String, seed: Long): String =
    s"((($key % $HashP) + $seed) * $HashA + $HashC) % $HashP"

  def queries: Map[String, Q] = Map(
    // Uniform 25% sample: hash-threshold over doc_id. A salt (Seed) mixed
    // into the key decorrelates this sample from the other hash samplers
    // sharing the LCG family.
    "q_sample" -> ((s, d) =>
      Tables(s, d, "documents")
        .filter(lcg(col("doc_id"), Seed) % 10000 < 2500)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")),

    // Stratified sample: per-class keep-fractions as per-lang hash
    // thresholds — downsample the dominant language, keep the rest. Same
    // semantics as `sampleBy` with Map("en" -> 0.25, _ -> 1.0), but a pure
    // data function, so the class balance is reproducible and the EXACT
    // selected set is oracle-certified (not just its size).
    "q_sample_stratified" -> ((s, d) =>
      Tables(s, d, "documents")
        .filter(lcg(col("doc_id"), Seed) % 10000
          < when(col("lang") === "en", 2500).otherwise(10000))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("lang")),

    // ~5% deterministic sample of events keyed on event_id; keeps the full
    // row. Pushed into the scan projection — zero shuffle, and at 100 TB
    // the filter prunes before any downstream stage.
    "q_sample_hash" -> ((s, d) =>
      Tables(s, d, "events")
        .filter(lcg(col("event_id"), 0L) % 20 === 0)
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")),

    // Per-stratum capped sample ("reservoir" with a deterministic
    // pseudo-random order): each source keeps its k=8 docs with the
    // smallest key hash — a pure data function, so the SAME docs are
    // selected on every engine and every run, unlike a true reservoir
    // whose content is traversal-order dependent. The per-group rank is a
    // bounded window (group size ≤ docs-per-source, and the native
    // TopKPerGroup operator in plans/ gives the heap-bounded form at
    // scale); the cap is the standard guard against one giant source
    // flooding a training mixture.
    "q_sample_reservoir" -> ((s, d) =>
      Tables(s, d, "documents")
        .withColumn("hk", lcg(col("doc_id"), 0L))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("source").orderBy("hk", "doc_id"))
          .cast("int"))
        .filter(col("rk") <= 8)
        .select("source", "rk", "doc_id", "lang")
        .orderBy("source", "rk")),

    // Training-mixture sampling: each source gets a TARGET WEIGHT (here a
    // deterministic function of the source index — in production a mixture
    // spec table) and rows are kept iff their key hash falls under the
    // per-source threshold in basis points. Same deterministic-hash
    // machinery as q_sample_hash, so the mixture is reproducible,
    // auditable, and consistent across tables — and a pure scan-side
    // filter (no shuffle before the per-source rollup). sum(doc_id) in the
    // output makes the EXACT selected set visible to the oracle hash, not
    // just its size.
    "q_sample_mixture" -> ((s, d) => {
      val idx = expr("CAST(substring(source, 4) AS INT)")
      val thresholdBp = lit(2000) + pmod(idx, lit(8)) * 500   // 20%..55% by source
      Tables(s, d, "documents")
        .filter(lcg(col("doc_id"), 0L) % 10000 < thresholdBp)
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"),
          sum(col("doc_id")).cast("long").as("sum_doc_id"))
        .orderBy("source")
    }),

    // TEMPERATURE-SCALED mixture (the multilingual-LM standard: quota_i ∝
    // n_i^α with α = 0.5, flattening the source distribution so small
    // sources over-sample relative to their share): per-source quotas are
    // derived in FIXED POINT (w_fx = floor(√n·1e9) — √ is IEEE
    // correctly-rounded, so both engines agree bitwise; the quota split is
    // integer/exact-double arithmetic after that), and each source keeps
    // its quota of docs with the smallest key hash — the same
    // deterministic LCG machinery as every sampler here, so the EXACT
    // selected set is oracle-certified via sum(doc_id). Scale shape: the
    // quota table is |sources| rows (a broadcast); the per-source rank is
    // the bounded-window top-k the plans/TopKPerGroup operator serves
    // natively at scale; the scan filters after one rank — no second pass
    // over the corpus.
    "q_sample_temperature" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      val all = org.apache.spark.sql.expressions.Window.partitionBy()
      val quota = docs.groupBy("source").agg(count(lit(1)).as("n"))
        .withColumn("w_fx",
          floor(sqrt(col("n").cast("double")) * 1e9).cast("long"))
        .withColumn("k", least(col("n"),
          floor(lit(200.0) * col("w_fx") / sum("w_fx").over(all)).cast("long")))
        .select("source", "n", "k")
      val ranked = docs
        .withColumn("hk", lcg(col("doc_id"), Seed))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("source").orderBy("hk", "doc_id")).cast("long"))
      ranked.join(broadcast(quota), Seq("source"))
        .filter(col("rk") <= col("k"))
        .groupBy("source")
        .agg(first(col("n")).as("n_docs"), first(col("k")).as("k_quota"),
          count(lit(1)).as("n_kept"),
          sum(col("doc_id")).cast("long").as("sum_doc_id"))
        .orderBy("source")
    })
  )

  def oracles: Map[String, String] = Map(
    "q_sample" ->
      s"""SELECT doc_id, lang, source FROM documents
         |WHERE (${sqlLcg("doc_id", Seed)}) % 10000 < 2500
         |ORDER BY doc_id""".stripMargin,
    "q_sample_stratified" ->
      s"""SELECT lang, COUNT(*) AS n_docs FROM documents
         |WHERE (${sqlLcg("doc_id", Seed)}) % 10000
         |      < CASE WHEN lang = 'en' THEN 2500 ELSE 10000 END
         |GROUP BY lang ORDER BY lang""".stripMargin,
    "q_sample_reservoir" ->
      s"""WITH h AS (
         |  SELECT doc_id, source, lang,
         |         ${sqlLcg("doc_id", 0L)} AS hk
         |  FROM documents),
         |r AS (
         |  SELECT *, CAST(row_number() OVER (
         |    PARTITION BY source ORDER BY hk, doc_id) AS INTEGER) AS rk
         |  FROM h)
         |SELECT source, rk, doc_id, lang FROM r WHERE rk <= 8
         |ORDER BY source, rk""".stripMargin,
    "q_sample_hash" ->
      s"""SELECT event_id, user_id, event_type, value FROM events
         |WHERE (${sqlLcg("event_id", 0L)}) % 20 = 0
         |ORDER BY event_id""".stripMargin,
    "q_sample_mixture" ->
      s"""SELECT source, COUNT(*) AS n_kept, CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
         |FROM documents
         |WHERE (${sqlLcg("doc_id", 0L)}) % 10000
         |      < 2000 + 500 * (CAST(substring(source, 4) AS INT) % 8)
         |GROUP BY source ORDER BY source""".stripMargin,
    "q_sample_temperature" ->
      s"""WITH counts AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
         |w AS (SELECT source, n,
         |        CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000000) AS BIGINT) AS w_fx
         |      FROM counts),
         |q AS (SELECT source, n,
         |        least(n, CAST(floor(200.0 * w_fx /
         |          CAST((SELECT SUM(w_fx) FROM w) AS DOUBLE)) AS BIGINT)) AS k
         |      FROM w),
         |r AS (SELECT doc_id, source,
         |        CAST(row_number() OVER (PARTITION BY source
         |          ORDER BY ${sqlLcg("doc_id", Seed)}, doc_id) AS BIGINT) AS rk
         |      FROM documents)
         |SELECT q.source, q.n AS n_docs, q.k AS k_quota,
         |       COUNT(*) AS n_kept, CAST(SUM(r.doc_id) AS BIGINT) AS sum_doc_id
         |FROM r JOIN q ON r.source = q.source
         |WHERE r.rk <= q.k
         |GROUP BY q.source, q.n, q.k ORDER BY q.source""".stripMargin
  )
}
