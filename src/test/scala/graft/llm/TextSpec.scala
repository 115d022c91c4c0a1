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
}
