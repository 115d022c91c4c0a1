package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 generator for the SCALECHECK empirical scale audit (r16): writes
  * ~10× the sf0.1 tables as N transformed replicas, so the most
  * expensive operators can be measured at a real decade of scale-up
  * instead of arguing from plan shape alone.
  *
  * The per-replica transforms preserve WITHIN-replica structure exactly
  * while keeping replicas from colliding — a naive 10× copy would give
  * every document nine exact twins and every embedding nine cosine-1
  * copies, exploding the banded joins' per-bucket pair counts
  * quadratically in ways a real 10× corpus never does:
  *  - integer keys offset by replica × 10⁸ (uniqueness preserved);
  *  - document TOKENS suffixed per replica (disjoint vocabularies —
  *    within-replica shingle/token structure identical to sf0.1,
  *    cross-replica Jaccard 0); n_chars recomputed;
  *  - embedding DIMENSIONS permuted per replica (an isometry: norms and
  *    within-replica distances exact, so per-replica cluster geometry is
  *    sf0.1's; cross-replica cosines decorrelate);
  *  - dimension tables (region, nation) stay fixed, the TPC-H rule.
  *
  * Usage: `runMain graft.ScaleGen [srcDir] [outDir]` (defaults
  * /root/testdata/sf0.1 → /tmp/graft_sf1); SCALEGEN_REPLICAS overrides
  * the factor. Deterministic — the dim permutations are seeded per
  * replica. */
object ScaleGen {
  private val Off = 100000000L

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val reps = sys.env.getOrElse("SCALEGEN_REPLICAS", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = Sessions.local(cpus, appName = "graft-scalegen")
    def t(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")

    // dimension tables: fixed
    Seq("region", "nation").foreach { n =>
      t(n).write.mode("overwrite").parquet(s"$out/$n.parquet")
      println(s"[scalegen] $n copied")
    }

    def replicate(name: String, files: Int)
        (tf: (DataFrame, Int) => DataFrame): Unit = {
      val base = t(name)
      val all = (0 until reps).map(k => tf(base, k)).reduce(_ unionByName _)
      all.repartition(files).write.mode("overwrite")
        .parquet(s"$out/$name.parquet")
      val n = spark.read.parquet(s"$out/$name.parquet").count()
      println(s"[scalegen] $name ×$reps → $n rows / $files files")
    }
    def off(c: String, k: Int): Column = col(c) + lit(k * Off)

    replicate("customer", 8)((df, k) =>
      df.withColumn("c_custkey", off("c_custkey", k)))
    replicate("supplier", 4)((df, k) =>
      df.withColumn("s_suppkey", off("s_suppkey", k)))
    replicate("part", 8)((df, k) =>
      df.withColumn("p_partkey", off("p_partkey", k)))
    replicate("orders", 16)((df, k) => df
      .withColumn("o_orderkey", off("o_orderkey", k))
      .withColumn("o_custkey", off("o_custkey", k)))
    replicate("lineitem", 32)((df, k) => df
      .withColumn("l_orderkey", off("l_orderkey", k))
      .withColumn("l_partkey", off("l_partkey", k))
      .withColumn("l_suppkey", off("l_suppkey", k)))
    replicate("events", 16)((df, k) => df
      .withColumn("event_id", off("event_id", k))
      .withColumn("user_id", off("user_id", k)))
    replicate("documents", 10)((df, k) => {
      val text =
        if (k == 0) col("text")
        else array_join(transform(split(col("text"), " "),
          tk => when(length(tk) > 0, concat(tk, lit(s"_$k")))
            .otherwise(tk)), " ")
      df.withColumn("doc_id", off("doc_id", k))
        .withColumn("text", text)
        .withColumn("n_chars", length(col("text")).cast("long"))
    })
    val dim = t("embeddings").select(size(col("embedding")))
      .limit(1).collect().head.getInt(0)
    replicate("embeddings", 10)((df, k) => {
      val perm = scala.util.Random.javaRandomToRandom(
        new java.util.Random(k.toLong)).shuffle((0 until dim).toVector)
      val emb =
        if (k == 0) col("embedding")
        else array(perm.map(i => col("embedding")(i)): _*)
      df.withColumn("vec_id", off("vec_id", k))
        .withColumn("embedding", emb)
    })
    println(s"[scalegen] done → $out")
    spark.stop()
  }
}
