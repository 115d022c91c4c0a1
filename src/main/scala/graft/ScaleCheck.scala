package graft

import org.apache.spark.sql.functions._

/** Empirical scale audit (r16): times a fixed panel of the engine's most
  * expensive operators — raw-table dedup/clustering/text/similarity
  * dataflows, the core joins/aggs, and the two index BUILDS — on
  * SPARK_GRAFT_SF_DIR, printing one `[scalecheck]` line per operator
  * (min of two timed runs after a warm run) and a final JSON line. Run
  * it at sf0.1 and at the ScaleGen sf1 to get the sf→10×sf ratio per
  * operator; SCALECHECK.md commits the verdict. Index builds stage a
  * fresh manifest table from the sfDir's documents/embeddings (multi-
  * commit layout) and time CREATE TEXT/VECTOR INDEX end-to-end. */
object ScaleCheck {
  private val Panel: Seq[String] = Seq(
    // raw-table LLM-curation dataflows (the scale-critical tier)
    "q_dedup_exact", "q_dedup_minhash", "q_dedup_ngram", "q_dedup_simhash",
    "q_dedup_embedding", "q_dedup_semantic", "q_dedup_clusters",
    "q_dedup_incremental", "q_embed_kmeans", "q_knn_graph_xlist",
    "q_similarity_topk", "q_text_tfidf", "q_text_bm25",
    "q_text_decontaminate", "q_corpus_pipeline",
    // core relational ops
    "q_groupby_avg", "q_join_shuffle", "q_star_revenue",
    "q_window_avg_day", "q_sessionize")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = Sessions.local(cpus, appName = "graft-scalecheck")
    Sessions.quietBoundedGlobalWindowWarnings()
    val only: Option[Set[String]] =
      args.headOption.map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }
    Panel.filter(n => only.forall(_.contains(n))).foreach { n =>
      val fn = SparkEntry.queries(n)
      fn(spark, sfDir).count() // warm
      val t = math.min(time(fn(spark, sfDir).count()),
        time(fn(spark, sfDir).count()))
      results(n) = t
      println(f"[scalecheck] $n $t%.3f")
    }

    // index builds: end-to-end CREATE over a fresh multi-commit staging
    // of the sfDir's corpus (staging cost excluded from the timing)
    if (only.forall(o => o("build_text_index") || o("build_vector_index"))) {
      val root = Scratch.dir("graft_scalecheck_")
      val cat = s"graftscale${math.abs(sfDir.hashCode) % 1000000}"
      spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      spark.conf.set(s"spark.sql.catalog.$cat.root", root)
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.q")
      if (only.forall(_.contains("build_text_index"))) {
        spark.sql(s"CREATE TABLE $cat.q.docs " +
          "(doc_id BIGINT, source STRING, text STRING)")
        val docs = Tables(spark, sfDir, "documents")
          .select("doc_id", "source", "text")
        docs.select("source").distinct().orderBy("source")
          .collect().map(_.getString(0)).foreach { src =>
            docs.filter(docs("source") === src).coalesce(1)
              .writeTo(s"$cat.q.docs").append()
          }
        val t = time(
          spark.sql(s"CREATE TEXT INDEX ON $cat.q.docs (text)").collect())
        results("build_text_index") = t
        println(f"[scalecheck] build_text_index $t%.3f")
      }
      if (only.forall(_.contains("build_vector_index"))) {
        spark.sql(s"CREATE TABLE $cat.q.emb " +
          "(vec_id BIGINT, label INT, embedding ARRAY<FLOAT>)")
        val emb = Tables(spark, sfDir, "embeddings")
          .select("vec_id", "label", "embedding")
        emb.select("label").distinct().orderBy("label")
          .collect().map(_.getInt(0)).foreach { l =>
            emb.filter(emb("label") === l).coalesce(1)
              .writeTo(s"$cat.q.emb").append()
          }
        val t = time(spark.sql(s"CREATE VECTOR INDEX ON $cat.q.emb " +
          "(embedding) ANCHORS (vec_id)").collect())
        results("build_vector_index") = t
        println(f"[scalecheck] build_vector_index $t%.3f")
      }
    }
    val qs = results
      .map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    println(s"""{"metric":"scalecheck","sf_dir":"$sfDir","cpus":"$cpus",""" +
      s""""queries":$qs}""")
    spark.stop()
  }
}
