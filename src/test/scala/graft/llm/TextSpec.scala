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
    // exact golden for zebra in srcA: tf=1, df=1, N=4 → 1·ln(5/2)
    val zebra = rows.find(r => r._1 == "srcA" && r._3 == "zebra").get
    assert(math.abs(zebra._4 - math.log(5.0 / 2.0)) < 1e-12)
    assert(zebra._5 === 1L)
  }
}
