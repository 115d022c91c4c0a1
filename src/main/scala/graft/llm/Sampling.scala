package graft.llm

import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.QueryModule

/** Corpus subsampling — the operation every training-data pipeline runs
  * before expensive downstream stages (dedup on a sample first, quality
  * sweeps, eval splits).
  *
  *  - `q_sample`: uniform Bernoulli sample with a FIXED seed — per-row
  *    coin-flip in the scan projection: no shuffle, fully parallel, and
  *    reproducible for a given Spark version (sampling is seeded XORShift
  *    per partition — deterministic plan→output, but engine-specific →
  *    rows-only check + determinism ScalaTest, no DuckDB oracle).
  *  - `q_sample_stratified`: per-class fractions via `sampleBy` — balances
  *    classes (here: languages) the way a curriculum/mixture spec does.
  *  - `q_sample_hash`: DETERMINISTIC key-hash sampling — keep a row iff
  *    `hash(key) mod M < k`. Unlike the RNG samples this is a pure
  *    function of the data: the same rows are selected on every run, every
  *    engine, any partitioning — which is what makes a sample re-joinable
  *    across tables (hash the same user_id everywhere and the per-user
  *    sample is CONSISTENT across a 100-table lake) and auditable. The
  *    hash is plain modular arithmetic (an LCG step over the key), so the
  *    DuckDB oracle checks it cell-exact.
  */
object Sampling extends QueryModule {

  private val Seed = 42L

  /** LCG-step hash over [0, 2^31−1): all intermediates < 2^63. */
  private val HashA = 1103515245L
  private val HashC = 12345L
  private val HashP = 2147483647L

  def queries: Map[String, Q] = Map(
    "q_sample" -> ((s, d) =>
      Tables(s, d, "documents")
        .sample(withReplacement = false, fraction = 0.25, seed = Seed)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")),

    "q_sample_stratified" -> ((s, d) =>
      Tables(s, d, "documents")
        // downsample the dominant language, keep the rest
        .stat.sampleBy("lang",
          Map("en" -> 0.25, "de" -> 1.0, "es" -> 1.0, "fr" -> 1.0, "zh" -> 1.0),
          Seed)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("lang")),

    // ~5% deterministic sample of events keyed on event_id; keeps the full
    // row. Pushed into the scan projection — zero shuffle, and at 100 TB
    // the filter prunes before any downstream stage.
    "q_sample_hash" -> ((s, d) =>
      Tables(s, d, "events")
        .filter(((col("event_id") * HashA + HashC) % HashP) % 20 === 0)
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
        .withColumn("hk", (col("doc_id") * HashA + HashC) % HashP)
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
        .filter(((col("doc_id") * HashA + HashC) % HashP) % 10000 < thresholdBp)
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"),
          sum(col("doc_id")).cast("long").as("sum_doc_id"))
        .orderBy("source")
    })
  )

  // q_sample / q_sample_stratified have no oracles: Bernoulli selection is
  // engine-specific (Spark's per-partition seeded XORShift vs DuckDB's RNG);
  // reproducibility is pinned by SamplingSpec instead. The hash sample is a
  // pure data function → cell-exact oracle.
  def oracles: Map[String, String] = Map(
    "q_sample_reservoir" ->
      s"""WITH h AS (
         |  SELECT doc_id, source, lang,
         |         (doc_id * $HashA + $HashC) % $HashP AS hk
         |  FROM documents),
         |r AS (
         |  SELECT *, CAST(row_number() OVER (
         |    PARTITION BY source ORDER BY hk, doc_id) AS INTEGER) AS rk
         |  FROM h)
         |SELECT source, rk, doc_id, lang FROM r WHERE rk <= 8
         |ORDER BY source, rk""".stripMargin,
    "q_sample_hash" ->
      s"""SELECT event_id, user_id, event_type, value FROM events
         |WHERE ((event_id * $HashA + $HashC) % $HashP) % 20 = 0
         |ORDER BY event_id""".stripMargin,
    "q_sample_mixture" ->
      s"""SELECT source, COUNT(*) AS n_kept, CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
         |FROM documents
         |WHERE ((doc_id * $HashA + $HashC) % $HashP) % 10000
         |      < 2000 + 500 * (CAST(substring(source, 4) AS INT) % 8)
         |GROUP BY source ORDER BY source""".stripMargin
  )
}
