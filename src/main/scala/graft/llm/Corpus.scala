package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.Tables
import graft.queries.{Det, QueryModule}
import PortableHash._

/** The composite corpus-cleaning pipeline — the flagship LLM-training-data
  * flow, chaining the individually-verified operators into one dataflow:
  *
  *   documents
  *     ─1─▶ quality scoring (per-row; the q_text_quality formula)  — FILTER
  *     ─2─▶ exact dedup on the bag-of-words content key (sorted distinct
  *          tokens hashed; keep lowest doc_id)                     — DEDUP
  *     ─3─▶ MinHash + banded-LSH near-dedup over the survivors
  *          (drop every doc with a near-dup of smaller id)         — NEARDUP
  *     ─4─▶ per-(lang, source) corpus stats                        — ROLLUP
  *
  * Scale shape (the reason the stages are ordered this way): 1 is a pure
  * scan-side projection+filter — it prunes BEFORE anything shuffles; 2 is
  * one hash shuffle on the content key; 3 is the banded bucket equi-join
  * of [[Dedup.minhashCandidates]] over the already-reduced survivor set
  * (never all-pairs, and cheaper for every doc stages 1-2 removed); 4
  * reuses a partial+final aggregate. At 100 TB the same plan holds: each
  * stage's shuffle is keyed and bounded, and nothing materializes
  * driver-side.
  *
  * The whole composite is oracle-checked cell-exact: the DuckDB twin
  * mirrors every stage (same quality arithmetic, same portable content
  * hash, same banded candidate generation + Jaccard threshold), so the
  * gate certifies not just each operator but their composition.
  */
object Corpus extends QueryModule {

  private val QualityMin = 0.42
  private val MinTokens = 20L

  /** Stage-1+2 frame: doc_id, lang, source, n_tok, quality, bow_key. */
  private def scored(docs: org.apache.spark.sql.DataFrame) = {
    val base = docs.select(col("doc_id"), col("lang"), col("source"),
      length(col("text")).cast(LongType).as("len"),
      split(col("text"), " ").as("tk"))
    val nTok = size(col("tk")).cast(LongType)
    val stopHits = size(filter(col("tk"),
      t => Seq("the", "a", "of").map(m => t === m).reduce(_ || _))).cast(LongType)
    val longToks = size(filter(col("tk"), t => length(t) >= 5)).cast(LongType)
    val quality = stopHits.cast(DoubleType) / nTok * 0.3 +
      longToks.cast(DoubleType) / nTok * 0.5 +
      when(col("len") >= 200, 0.2).otherwise(0.0)
    // bow_key: polynomial hash of the space-joined sorted distinct token
    // set. Computed by the codegen'd ShinglePolyHashes over a 1-element
    // array with k=1 (≡ polyChar of the whole string — same byte loop) —
    // the interpreted polyChar HOF was the scan-side hot spot.
    val bowKey = element_at(graft.functions.ShingleHashes.shingles(
      array(array_join(array_sort(array_distinct(col("tk"))), " ")), 1), 1)
    base.select(col("doc_id"), col("lang"), col("source"), col("tk"),
      nTok.as("n_tok"), quality.as("quality"), bowKey.as("bow_key"))
  }

  /** MinHash-LSH near-dup pairs (doc_a < doc_b, Jaccard ≥ threshold) among
    * a (doc_id, tk) frame — stage 3's detection, reused by the fixpoint
    * test in CorpusSpec. */
  private[llm] def nearDupPairs(docs: org.apache.spark.sql.DataFrame) = {
    val sig = docs.select(col("doc_id"),
        Dedup.hashedShingleSet(col("tk")).as("hv"))
      .withColumn("mh",
        graft.functions.ShingleHashes.minhashSignature(col("hv"), Dedup.NumHashes))
    Dedup.minhashCandidates(sig)
      .join(sig.select(col("doc_id").as("doc_a"), col("hv").as("hv_a")), "doc_a")
      .join(sig.select(col("doc_id").as("doc_b"), col("hv").as("hv_b")), "doc_b")
      .filter(Dedup.jaccard(col("hv_a"), col("hv_b")) >= Dedup.MinhashJaccard)
      .select("doc_a", "doc_b")
  }

  /** The pipeline's three intermediate frames: (quality-filtered,
    * exact-deduped, near-dedup survivors). */
  private[llm] def stages(s: org.apache.spark.sql.SparkSession, d: String) = {
    // 1. score + filter (scan-side prune)
    val f = scored(Tables(s, d, "documents"))
      .filter(col("quality") >= QualityMin && col("n_tok") >= MinTokens)
    // 2. exact dedup on the bag-of-words key, keep lowest doc_id
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("bow_key").orderBy("doc_id")
    // The survivor frame feeds FIVE downstream branches (bands×2, two
    // hv join-backs, the final anti-join left side); without a
    // materialization Spark re-evaluates the whole scan→score→window
    // pipeline for each. localCheckpoint truncates the lineage once per
    // invocation — the per-run equivalent of persisting the deduped
    // corpus between pipeline stages, which is exactly what a 100 TB
    // run would do with a real checkpoint/table between stages.
    val exact = f.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn", "bow_key")
      .localCheckpoint()
    // 3. near-dedup: banded MinHash-LSH candidates over survivors, exact
    //    Jaccard residual, drop the larger id of each qualifying pair
    val dups = nearDupPairs(exact)
      .select(col("doc_b").as("doc_id")).distinct()
    val kept = exact.join(dups, Seq("doc_id"), "left_anti")
    (f, exact, kept)
  }

  /** q_chunk_overlap window geometry: chunks of ChunkLen tokens starting
    * every ChunkStride tokens (overlap = ChunkLen − ChunkStride). */
  private val ChunkLen = 32
  private val ChunkStride = 24

  def queries: Map[String, Q] = Map(
    // Sliding-window document chunking — the context-window preparation
    // step between cleaning and tokenization in a training-data pipeline
    // (RAG ingest uses the same shape): each document becomes
    // ceil(n_tok / stride) overlapping chunks of ≤ ChunkLen tokens.
    // Per-row Generate (posexplode) — row fan-out WITHOUT a shuffle, the
    // same scale tier as q_explode; at 100 TB chunking is a map-only stage
    // whose output partitioning inherits the scan's. The trailing orderBy
    // is the driver's hash contract.
    "q_chunk_overlap" -> ((s, d) => {
      val tk = split(col("text"), " ")
      val starts = sequence(lit(1), greatest(size(tk), lit(1)), lit(ChunkStride))
      Tables(s, d, "documents")
        .select(col("doc_id"), tk.as("tk"), posexplode(starts).as(Seq("chunk_idx", "st")))
        .select(col("doc_id"), col("chunk_idx"),
          col("st").as("start_tok"),
          size(slice(col("tk"), col("st"), lit(ChunkLen))).as("chunk_n"),
          array_join(slice(col("tk"), col("st"), lit(ChunkLen)), " ").as("chunk_text"))
        .orderBy("doc_id", "chunk_idx")
    }),

    "q_corpus_pipeline" -> ((s, d) => {
      val (_, _, kept) = stages(s, d)
      // 4. per-(lang, source) corpus statistics
      // avg quality in fixed point (floor to 1e-6 units, exact long sum):
      // the DECIMAL(18,4) route rounds a derived double whose value can sit
      // exactly where Spark's and DuckDB's double→decimal conversions
      // disagree (hit at sf0.1); floor of the identical product is
      // bit-portable like every other fixed-point reduction here.
      kept.groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("total_tokens"),
          (sum(floor(col("quality") * 1e6).cast(LongType)).cast(DoubleType)
            / 1e6 / count(lit(1))).as("avg_quality"))
        .orderBy("lang", "source")
    })
  )

  def oracles: Map[String, String] = Map(
    // Spark sequence(1, n, S) is stop-INCLUSIVE; DuckDB range(1, n+1, S)
    // matches. chunk_idx = (start−1)/stride since starts are 1 + k·stride.
    // List slicing clamps past the end on both engines.
    "q_chunk_overlap" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
         |s AS (
         |  SELECT doc_id, tk,
         |    unnest(range(1, greatest(len(tk), 1) + 1, $ChunkStride)) AS st
         |  FROM t)
         |SELECT doc_id,
         |  CAST((st - 1) // $ChunkStride AS INTEGER) AS chunk_idx,
         |  CAST(st AS INTEGER) AS start_tok,
         |  CAST(len(tk[st : st + ${ChunkLen - 1}]) AS INTEGER) AS chunk_n,
         |  array_to_string(tk[st : st + ${ChunkLen - 1}], ' ') AS chunk_text
         |FROM s ORDER BY doc_id, chunk_idx""".stripMargin,

    "q_corpus_pipeline" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang, source, length(text) AS len, string_split(text, ' ') AS tk
         |  FROM documents),
         |q AS (
         |  SELECT doc_id, lang, source, tk, CAST(len(tk) AS BIGINT) AS n_tok,
         |    CAST(len(list_filter(tk, x -> list_contains(['the', 'a', 'of'], x))) AS DOUBLE) / len(tk) * 0.3
         |    + CAST(len(list_filter(tk, x -> length(x) >= 5)) AS DOUBLE) / len(tk) * 0.5
         |    + CASE WHEN len >= 200 THEN 0.2 ELSE 0.0 END AS quality
         |  FROM t),
         |f AS (SELECT * FROM q WHERE quality >= $QualityMin AND n_tok >= $MinTokens),
         |b AS (SELECT *, ${sqlPolyChar("array_to_string(list_sort(list_distinct(tk)), ' ')")} AS bow_key FROM f),
         |e AS (SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY bow_key ORDER BY doc_id) AS rn FROM b)
         |  WHERE rn = 1),
         |hs AS (SELECT doc_id,
         |  list_distinct([${sqlPolyChar("s")} for s in
         |    list_distinct([tk[i] || ' ' || tk[i+1] for i in range(1, len(tk))])]) AS hv
         |  FROM e),
         |sig AS (SELECT doc_id, hv,
         |  [list_min([(h * (2*j+1) + 7*j + 13) % $P for h in hv]) for j in range(0, ${Dedup.NumHashes})] AS mh
         |  FROM hs),
         |bands AS (
         |  SELECT doc_id, bb, mh[2*bb+1] * $P + mh[2*bb+2] AS bkey
         |  FROM sig, (SELECT unnest(range(0, ${Dedup.NumHashes / Dedup.BandRows})) AS bb)),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM bands x JOIN bands y ON x.bb = y.bb AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
         |dups AS (
         |  SELECT DISTINCT c.doc_b AS doc_id
         |  FROM cand c JOIN sig sa ON sa.doc_id = c.doc_a JOIN sig sb ON sb.doc_id = c.doc_b
         |  WHERE CAST(len(list_intersect(sa.hv, sb.hv)) AS DOUBLE) /
         |          (len(sa.hv) + len(sb.hv) - len(list_intersect(sa.hv, sb.hv)))
         |        >= ${Dedup.MinhashJaccard}),
         |kept AS (SELECT * FROM e WHERE doc_id NOT IN (SELECT doc_id FROM dups))
         |SELECT lang, source, COUNT(*) AS n_docs,
         |  CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
         |  CAST(SUM(CAST(floor(quality * 1000000) AS BIGINT)) AS DOUBLE)
         |    / 1000000 / COUNT(*) AS avg_quality
         |FROM kept GROUP BY lang, source ORDER BY lang, source""".stripMargin
  )
}
