package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

/** Semantic checks for the fuzzy entity-resolution join: the oracle proves
  * engine parity; this proves the LINKAGE is right — every synthesized typo
  * must resolve back to its own source name, at edit distance exactly 1. */
class JoinsSpec extends SparkSuite {

  test("fuzzy join links every typo'd observation back to its source name") {
    val resolved = Joins.queries("q_join_fuzzy")(spark, sfDir)
    val truth = Tables(spark, sfDir, "part")
      .filter(pmod(col("p_partkey"), lit(7)) === 0)
      .select(col("p_partkey").as("obs_key"), col("p_name").as("true_name"))
    val joined = resolved.join(truth, "obs_key")
      .select(col("obs_key"), col("match_name"), col("true_name"), col("dist"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getString(1) === r.getString(2),
        s"obs ${r.getLong(0)} linked to ${r.getString(1)}, expected ${r.getString(2)}")
      assert(r.getLong(3) === 1L, s"obs ${r.getLong(0)} dist ${r.getLong(3)} != 1")
    }
    // every observation resolves (no typo dropped by blocking or threshold)
    assert(joined.length === truth.count())
  }

  test("fuzzy join broadcasts the canonical dictionary") {
    val p = Joins.queries("q_join_fuzzy")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin"), "canonical dictionary must broadcast")
  }
}
