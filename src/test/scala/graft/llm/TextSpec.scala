package graft.llm

import graft.SparkSuite

/** Golden test for the TF-IDF pipeline (no DuckDB oracle — ln() portability)
  * on a corpus with a known rare/common term structure. */
class TextSpec extends SparkSuite {
  import spark.implicits._

  test("tf-idf ranks the rare distinguishing term above ubiquitous ones") {
    val corpus = Seq(
      (0L, "common common common zebra", "en", "srcA", 26L),
      (1L, "common common common common", "en", "srcA", 27L),
      (2L, "common common yak yak yak", "en", "srcB", 25L),
      (3L, "common common common common", "en", "srcB", 27L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("text_spec_").toString
    corpus.write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    val rows = Text.queries("q_text_tfidf")(spark, tmp)
      .select("source", "rank", "term", "score", "df")
      .as[(String, Int, String, Double, Long)].collect()
    val top = rows.filter(_._2 == 1).map(r => r._1 -> r._3).toMap
    // the rare term wins its source despite 'common' having far higher tf
    assert(top("srcA") === "zebra")
    assert(top("srcB") === "yak")
    // golden for zebra in srcA: tf=1, df=1, N=4 → 1·ln(5/2), quantized to
    // the pipeline's 1e-9 fixed-point resolution
    val zebra = rows.find(r => r._1 == "srcA" && r._3 == "zebra").get
    assert(math.abs(zebra._4 - math.log(5.0 / 2.0)) < 1e-8)
    assert(zebra._5 === 1L)
  }

  test("decontamination flags eval-overlapping docs and excludes the eval slice") {
    // doc 0 (0 % 97 == 0) is the eval doc; doc 97 would be too but ids stop
    // at 3. doc 1 is a verbatim copy (full overlap), doc 2 shares exactly
    // one 3-gram out of 12 (8.3% < 10% threshold), doc 3 shares nothing.
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta", "en", "srcA", 35L),
      (1L, "alpha beta gamma delta epsilon zeta", "en", "srcA", 35L),
      (2L, "alpha beta gamma u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11", "en", "srcA", 51L),
      (3L, "totally different content nothing shared at all", "en", "srcA", 47L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("text_spec_decon_").toString
    corpus.write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    val rows = Text.queries("q_text_decontaminate")(spark, tmp)
      .as[(Long, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(!rows.contains(0L))                 // eval docs never in the report
    assert(!rows.contains(3L))                 // zero overlap → absent
    assert(rows(1L) === ((1L, 4L, 4L, 1.0, true)))   // verbatim copy
    val (_, nGrams2, nHits2, frac2, flag2) = rows(2L)
    assert(nGrams2 === 12L && nHits2 === 1L && !flag2)
    assert(math.abs(frac2 - 1.0 / 12.0) < 1e-12)
  }

  test("repetition filter: boilerplate flagged, diverse and single-token docs pass") {
    val corpus = Seq(
      (0L, "x x x x x x", "en", "srcA", 11L),       // all duplicate
      (1L, "a b c d e", "en", "srcA", 9L),          // all distinct
      (2L, "solo", "en", "srcA", 4L)                // no bigrams → guard path
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("text_spec_rep_").toString
    corpus.write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    val rows = Text.queries("q_text_repetition")(spark, tmp)
      .as[(Long, Long, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    val (_, n0, dtf0, dbf0, rep0) = rows(0L)
    assert(n0 === 6L && rep0)
    assert(math.abs(dtf0 - 5.0 / 6.0) < 1e-12 && math.abs(dbf0 - 4.0 / 5.0) < 1e-12)
    assert(rows(1L) === ((1L, 5L, 0.0, 0.0, false)))
    assert(rows(2L) === ((2L, 1L, 0.0, 0.0, false)))
  }

  test("fingerprint: docs shorter than a k-gram / winnow window yield empty sets") {
    // doc 0: shorter than KGram=8 → zero k-grams; doc 1: 10 chars → 3
    // k-grams, fewer than WinnowWindow=4 → zero windows; doc 2: normal.
    val corpus = Seq(
      (0L, "tiny", "en", "srcA", 4L),
      (1L, "ten chars!", "en", "srcA", 10L),
      (2L, "a perfectly ordinary document long enough to fingerprint", "en", "srcA", 57L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("text_spec_fp_").toString
    corpus.write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    val rows = Text.queries("q_text_fingerprint")(spark, tmp)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.isNullAt(2), r.isNullAt(3))).toMap
    assert(rows(0L) === ((0L, true, true)))   // no k-grams at all
    assert(rows(1L) === ((0L, true, true)))   // k-grams but no full window
    assert(rows(2L)._1 > 0L && !rows(2L)._2 && !rows(2L)._3)
  }

  test("q_text_lm_coverage: counts bounded, fixed-point coverage consistent, corpus attests some bigrams") {
    val rows = Text.queries("q_text_lm_coverage")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nTok = r.getAs[Long]("n_tok"); val nOov = r.getAs[Long]("n_oov")
      val nBi = r.getAs[Long]("n_bigrams"); val nCov = r.getAs[Long]("n_cov")
      assert(nOov >= 0 && nOov <= nTok)
      assert(nCov >= 0 && nCov <= nBi)
      assert(nBi === math.max(nTok - 1, 0))
      val expect = if (nBi > 0) math.floor(nCov.toDouble * 1e6 / nBi).toLong else 0L
      assert(r.getAs[Long]("cov_fp") === expect)
    }
    // natural-language testdata repeats bigrams: coverage must be non-trivial
    assert(rows.exists(_.getAs[Long]("n_cov") > 0))
  }
}
