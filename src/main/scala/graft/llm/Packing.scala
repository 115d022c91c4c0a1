package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.Tables
import graft.queries.QueryModule

/** Sequence packing (concat-and-chunk) — the step that turns a cleaned
  * corpus into fixed-budget training sequences: documents are concatenated
  * in a deterministic global order and split at `chunkTokens` boundaries;
  * each doc lands in the chunk where its first token falls (greedy fill,
  * docs kept whole).
  *
  * The core primitive is a GLOBAL running token total — the textbook
  * sequential bottleneck. The scale-safe form here is a distributed prefix
  * sum:
  *
  *   1. split the doc_id key space into contiguous value ranges
  *      (`doc_id div span`) — each range is an independent window partition;
  *   2. local running sums per range (parallel `WindowExec`s);
  *   3. per-range totals → driver (`parts` rows — tiny) → exclusive-offset
  *      scan → broadcast join-back; global cum = local cum + range offset.
  *
  * Only step 3's offset table is sequential, and it is O(parts), not
  * O(rows). The DuckDB oracle runs the single-window global cumsum — the
  * distributed decomposition must be value-identical.
  */
object Packing extends QueryModule {

  private val ChunkTokens = 256
  private val Parts = 8

  /** Distributed concat-and-chunk. `docs` must have unique non-negative
    * `doc_id` plus an `n_tok` token count; output adds the chunk id. */
  def packChunks(spark: SparkSession, docs: DataFrame,
                 chunkTokens: Int, parts: Int): DataFrame = {
    import spark.implicits._
    val maxId = docs.agg(max("doc_id")).head().getLong(0)
    val span = maxId / parts + 1
    val parted = docs.withColumn("part", expr(s"doc_id div $span").cast(IntegerType))
    val w = Window.partitionBy("part").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = parted.withColumn("local_cum", sum("n_tok").over(w))
    // per-range totals: `parts` rows to the driver, never the data
    val totals = local.groupBy("part").agg(sum("n_tok").as("part_total"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until parts).map(p =>
      p -> (0 until p).map(q => totals.getOrElse(q, 0L)).sum)
    val offsetDf = offsets.toDF("part", "offset")
    local.join(broadcast(offsetDf), "part")
      .withColumn("cum", col("local_cum") + col("offset"))
      .withColumn("chunk_id", expr(s"(cum - n_tok) div $chunkTokens"))
      .drop("part", "local_cum", "offset")
  }

  def queries: Map[String, Q] = Map(
    "q_corpus_pack" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast(LongType).as("n_tok"))
      packChunks(s, docs, ChunkTokens, Parts)
        .select("doc_id", "n_tok", "chunk_id")
        .orderBy("doc_id")
    })
  )

  def oracles: Map[String, String] = Map(
    // The oracle is the sequential single-window global cumsum — the
    // distributed prefix-sum must reproduce it exactly.
    "q_corpus_pack" ->
      s"""WITH t AS (
         |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, n_tok,
         |    SUM(n_tok) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM t)
         |SELECT doc_id, n_tok, CAST((cum - n_tok) // $ChunkTokens AS BIGINT) AS chunk_id
         |FROM c ORDER BY doc_id""".stripMargin
  )
}
