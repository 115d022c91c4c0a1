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
}
