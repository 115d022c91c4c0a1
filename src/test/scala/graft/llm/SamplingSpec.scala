package graft.llm

import graft.{SparkSuite, Tables}

/** The samplers are pure hash functions of the data (cell-exact DuckDB
  * oracles in Sampling.oracles); these pin reproducibility across
  * partitionings and statistical sanity. */
class SamplingSpec extends SparkSuite {
  import spark.implicits._

  test("uniform sample is partitioning-invariant and roughly sized") {
    val a = Sampling.queries("q_sample")(spark, sfDir).as[(Long, String, String)].collect()
    val b = Sampling.queries("q_sample")(spark, sfDir).as[(Long, String, String)].collect()
    assert(a.toSeq === b.toSeq, "hash sample must be run-invariant")
    // a true data function survives an arbitrary repartition (RNG samples
    // do not — their per-partition streams reshuffle with the data)
    val repart = Tables(spark, sfDir, "documents").repartition(7)
      .filter(org.apache.spark.sql.functions.expr(
        "(((doc_id + 42) * 1103515245 + 12345) % 2147483647) % 10000 < 2500"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(repart === a.map(_._1).toSeq.sorted)
    val total = Tables(spark, sfDir, "documents").count()
    assert(a.length > total * 0.1 && a.length < total * 0.45,
      s"25% hash sample of $total gave ${a.length}")
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
