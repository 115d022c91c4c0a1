package graft.llm

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.{SparkSuite, Tables}

/** The distributed prefix-sum must be invariant to the range-partition
  * count and equal to the sequential single-window form; chunk assignment
  * must be monotone and budget-respecting. */
class PackingSpec extends SparkSuite {
  import spark.implicits._

  private def docs = Tables(spark, sfDir, "documents")
    .select(col("doc_id"), size(split(col("text"), " ")).cast(LongType).as("n_tok"))

  private def pack(parts: Int) =
    Packing.packChunks(spark, docs, 256, parts)
      .select("doc_id", "n_tok", "chunk_id").orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq

  test("distributed prefix sum is invariant to the partition count") {
    assert(pack(1) === pack(4))
    assert(pack(4) === pack(13))   // non-divisor partition count
  }

  test("equals the sequential single-window cumsum") {
    val w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val seqForm = docs.withColumn("cum", sum("n_tok").over(w))
      .withColumn("chunk_id", expr("(cum - n_tok) div 256"))
      .select("doc_id", "n_tok", "chunk_id").orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(pack(8) === seqForm)
  }

  test("chunk ids are monotone in doc order and every chunk starts under budget") {
    val rows = pack(8)
    rows.sliding(2).foreach {
      case Seq((_, _, c1), (_, _, c2)) => assert(c1 <= c2, "chunk ids must be non-decreasing")
      case _ =>
    }
    // a doc is assigned to the chunk its FIRST token falls in, so the
    // tokens of a chunk's docs before its last doc stay under the budget
    val byChunk = rows.groupBy(_._3).values
    byChunk.foreach { ds =>
      val allButLast = ds.sortBy(_._1).dropRight(1).map(_._2).sum
      assert(allButLast < 256, s"chunk overfilled before its last doc: $allButLast")
    }
  }
}
