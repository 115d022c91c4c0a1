package graft.llm

import graft.{SparkSuite, Tables}

/** Sampling has no cross-engine oracle; these pin what matters instead:
  * seed-reproducibility and statistical sanity. */
class SamplingSpec extends SparkSuite {
  import spark.implicits._

  test("uniform sample is reproducible for a fixed seed and roughly sized") {
    val a = Sampling.queries("q_sample")(spark, sfDir).as[(Long, String, String)].collect()
    val b = Sampling.queries("q_sample")(spark, sfDir).as[(Long, String, String)].collect()
    assert(a.toSeq === b.toSeq, "same seed must give the identical sample")
    val total = Tables(spark, sfDir, "documents").count()
    assert(a.length > total * 0.1 && a.length < total * 0.45,
      s"0.25 Bernoulli sample of $total gave ${a.length}")
  }

  test("stratified sample downsamples only the targeted class") {
    val sampled = Sampling.queries("q_sample_stratified")(spark, sfDir)
      .as[(String, Long)].collect().toMap
    val full = Tables(spark, sfDir, "documents")
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // non-en classes kept in full; en reduced
    full.keys.filterNot(_ == "en").foreach(l => assert(sampled(l) === full(l), l))
    assert(sampled("en") < full("en"))
  }
}
