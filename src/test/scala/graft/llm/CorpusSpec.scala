package graft.llm

import graft.SparkSuite

/** Structural invariants of the composite corpus pipeline (cell values are
  * the driver's DuckDB gate; these pin the pipeline ALGEBRA). */
class CorpusSpec extends SparkSuite {

  test("stage counts are strictly staged and deterministic across runs") {
    val total = graft.Tables(spark, sfDir, "documents").count()
    val (f, exact, kept) = Corpus.stages(spark, sfDir)
    val (nf, ne, nk) = (f.count(), exact.count(), kept.count())
    info(s"docs $total → quality $nf → exact $ne → near-dedup $nk")
    assert(nf < total, "quality filter should prune")
    assert(ne < nf, "exact BOW dedup should remove collisions")
    assert(nk < ne, "near-dedup should remove LSH duplicates")
    val (f2, e2, k2) = Corpus.stages(spark, sfDir)
    assert((f2.count(), e2.count(), k2.count()) === ((nf, ne, nk)))
  }

  test("near-dedup is a fixpoint: no qualifying pair survives among kept docs") {
    val (_, _, kept) = Corpus.stages(spark, sfDir)
    // every pair (a<b, jaccard ≥ τ) had its b removed, so a second
    // detection pass over the survivors must find nothing.
    assert(Corpus.nearDupPairs(kept).count() === 0L)
  }

  test("exact-dedup survivors have unique bag-of-words keys") {
    import org.apache.spark.sql.functions._
    val (_, exact, _) = Corpus.stages(spark, sfDir)
    val keys = exact.select(
      element_at(graft.functions.ShingleHashes.shingles(
        array(array_join(array_sort(array_distinct(col("tk"))), " ")), 1), 1).as("k"))
    assert(keys.count() === keys.distinct().count())
  }

  test("q_chunk_overlap: stride segments reassemble each document and adjacent chunks overlap") {
    import org.apache.spark.sql.functions._
    val stride = 24; val clen = 32
    val chunks = Corpus.queries("q_chunk_overlap")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_idx"),
        r.getAs[Int]("start_tok"), r.getAs[String]("chunk_text")))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val docs = graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(chunks.keySet === docs.keySet)
    docs.foreach { case (id, text) =>
      val tk = text.split(" ", -1)
      val cs = chunks(id)
      // start positions are 1 + i*stride, covering every token
      cs.zipWithIndex.foreach { case ((_, idx, st, _), i) =>
        assert(idx === i && st === 1 + i * stride)
      }
      assert(cs.last._3 <= tk.length && cs.last._3 + stride > tk.length)
      // taking each chunk's first `stride` tokens reassembles the document
      val reassembled = cs.flatMap { case (_, idx, _, ct) =>
        val toks = ct.split(" ", -1)
        if (idx == cs.last._2) toks else toks.take(stride)
      }
      assert(reassembled.toSeq === tk.toSeq)
      // a full chunk's tail (beyond the stride) prefixes the next chunk
      cs.sliding(2).foreach {
        case Array((_, _, _, a), (_, _, _, b)) =>
          val at = a.split(" ", -1)
          if (at.length == clen)
            assert(b.split(" ", -1).startsWith(at.drop(stride)))
        case _ =>
      }
    }
  }
}
