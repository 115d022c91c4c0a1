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
  */
object Sampling extends QueryModule {

  private val Seed = 42L

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
        .orderBy("lang"))
  )

  // No oracles: Bernoulli selection is engine-specific (Spark's per-partition
  // seeded XORShift vs DuckDB's RNG). Reproducibility is pinned by
  // SamplingSpec instead.
  def oracles: Map[String, String] = Map.empty
}
