package graft
import org.apache.spark.sql.SparkSession

/** Benchmark harness: times every declared query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Hygiene (round-1..3 verdicts):
  *  - a warmup pass primes JVM/JIT, codegen compiler and the parquet footer
  *    cache before any timing, so the first-timed query doesn't absorb
  *    session warmup cost and totals are comparable across rounds;
  *  - failures are NOT swallowed into the total: a failed query reports -1
  *    and is listed in "failed", and the total covers successes only;
  *  - "sf" is emitted as the numeric scale factor parsed from the dir name;
  *  - the emitted line is kept SHORT. The driver captures only the last
  *    ~2000 characters of output and parses the JSON line out of that tail;
  *    round 3's line (130 per-query entries, ~3.4k chars) overflowed the
  *    window and the round's numbers were lost ("parsed": null in
  *    BENCH_r03.json). The line now carries the total over ALL queries plus
  *    per-query times for a fixed headline subset, and the full per-query
  *    map is written to bench_full.json for inspection.
  */
object Bench {
  /** Headline queries whose individual times go on the emitted JSON line
    * (one-per-family representatives; the full map goes to bench_full.json). */
  private[graft] val headline: Seq[String] = Seq(
    "q_scan_parquet", "q_prune_files", "q_groupby_avg", "q_orderby_multi",
    "q_window_avg_day", "q_cte", "q_etl_gold",
    "q_join_broadcast", "q_join_shuffle", "q_join_asof", "q_join_range",
    "q_star_revenue", "q_join_bucketed",
    "q_agg_multi", "q_agg_distinct", "q_rollup_cube", "q_topk_group",
    "q_window_rank_lag", "q_pivot", "q_subqueries",
    "q_dedup_exact", "q_dedup_minhash", "q_dedup_ngram", "q_dedup_clusters",
    "q_similarity_topk", "q_similarity_ivf", "q_text_tfidf",
    "q_text_decontaminate", "q_corpus_pipeline", "q_corpus_pack",
    "q_multimodal_binary", "q_sample_hash",
    "q_stream_tumbling", "q_stream_session", "q_stream_join",
    "q_profile", "q_sessionize", "q_resample_ffill",
    "q_source_csv_roundtrip", "q_source_dsv2", "q_graph_pagerank",
    "q_join_dpp", "q_sink_manifest", "q_attribution", "q_anomaly_mad",
    "q_dedup_incremental", "q_agg_udaf",
    "q_join_spj", "q_mv_incremental", "q_text_bm25", "q_search_hybrid",
    "q_merge_dv", "q_mv_rewrite_rollup", "q_mv_incremental_join",
    "q_table_changes_update", "q_dedup_semantic")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus, appName = "graft-bench")
    Sessions.quietBoundedGlobalWindowWarnings() // keep the 2000-char tail signal-bearing

    // optional comma-separated query filter (local iteration only — the
    // driver invokes with no args and benches the full suite)
    val only: Option[Set[String]] =
      args.headOption.map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.forall(_.contains(q._1)))
    // Each query runs twice per pass and the SECOND run is timed: the first
    // run absorbs codegen compilation and JIT warmup, which on this VM
    // dominate sub-second queries by 10-40× and made round-1 totals
    // iteration-order noise. The timed run still executes the full plan
    // (scan → shuffle → count action).
    // A failure in EITHER run marks the query failed: the round-2 bench
    // swallowed a timed-run throw and reported a bogus "success" timing.
    def pass(queries: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)],
        warm: Boolean): Seq[(String, Double, Boolean)] = queries.map { case (name, fn) =>
      val warmOk = !warm ||
        (try { fn(spark, sfDir).count(); true }
         catch { case e: Throwable =>
           System.err.println(s"[bench] $name FAILED (warmup): ${e.getMessage}"); false
         })
      val t0 = System.nanoTime()
      val ok = warmOk &&
        (try { fn(spark, sfDir).count(); true }
         catch { case e: Throwable =>
           System.err.println(s"[bench] $name FAILED (timed run): ${e.getMessage}"); false
         })
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    // The WHOLE suite runs as two independent passes and every reported
    // number is the per-query MIN across passes (round-6 advice: this VM's
    // 0.3-14 s single-sample jitter whipsawed verdict totals across rounds
    // with zero code changes — two samples bound the noise). "runs" carries
    // both pass totals so a reader can see the spread. The HEADLINE subset
    // gets a THIRD timed sample (round-12 advice: a 0.54→0.73 s headline
    // regression was unattributable without a full re-run) — headline
    // numbers are min-of-3, and bench_full.json carries every per-query
    // sample so spread is readable without re-benching.
    val pass1 = pass(qs, warm = true)
    val pass2 = pass(qs, warm = true)
    val hlSet = headline.toSet
    val pass3 = pass(qs.filter(q => hlSet(q._1)), warm = false)
      .map(r => r._1 -> r).toMap
    val results = pass1.zip(pass2).map { case ((name, v1, ok1), (_, v2, ok2)) =>
      val extra = pass3.get(name).filter(_._3).map(_._2)
      val cands = Seq(v1 -> ok1, v2 -> ok2).filter(_._2).map(_._1) ++ extra
      (name, if (cands.isEmpty) -1.0 else cands.min,
        ok1 || ok2 || extra.isDefined)
    }
    val samples = pass1.zip(pass2).map { case ((name, v1, ok1), (_, v2, ok2)) =>
      val vs = Seq(if (ok1) v1 else -1.0, if (ok2) v2 else -1.0) ++
        pass3.get(name).map(r => if (r._3) r._2 else -1.0)
      name -> vs
    }.toMap
    def entries(rs: Seq[(String, Double, Boolean)]): String =
      rs.map { case (k, v, ok) =>
        "\"" + k + "\":" + (if (ok) f"$v%.3f" else "-1")
      }.mkString("{", ",", "}")
    def totalOf(rs: Seq[(String, Double, Boolean)]): Double =
      rs.filter(_._3).map(_._2).sum
    val failed = results.filterNot(_._3).map("\"" + _._1 + "\"").mkString("[", ",", "]")
    // "value" = SUM of the per-query minimums — by construction consistent
    // with the "queries" entries it ships beside, even when a query fails
    // in exactly one pass (min-of-pass-totals would silently drop such a
    // query's runtime from the headline while reporting it successful).
    // Same success population as prior rounds' one-pass totals, sampled at
    // the two-pass noise floor.
    val total = totalOf(results)
    val runs = f"[${totalOf(pass1)}%.3f,${totalOf(pass2)}%.3f]"
    val sf = sfDir.split("/").filter(_.nonEmpty).lastOption
      .map(_.stripPrefix("sf")).flatMap(s => scala.util.Try(s.toDouble).toOption)
      .getOrElse(0.0)
    // LIKE-FOR-LIKE guard: the pinned headline subset's total as its own
    // field — round-over-round comparison reads THIS number, so adding
    // queries to the suite no longer moves the comparable total.
    val headlineTotal = totalOf(results.filter(r => headline.contains(r._1)))
    def line(rs: Seq[(String, Double, Boolean)]): String =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","headline_total":$headlineTotal%.3f,"runs":$runs,"nq":${results.size},"queries":${entries(rs)},"failed":$failed,"sf":$sf}"""
    // Full map → file (stdout would overflow the driver's tail window; the
    // stack traces in round 2 showed stderr is merged into the same capture).
    // "samples" carries EVERY per-query timing ([pass1, pass2] — headline
    // queries add the third sample), so a regression's spread is readable
    // from the committed artifact without a re-bench.
    val samplesJson = samples.toSeq.sortBy(_._1).map { case (k, vs) =>
      "\"" + k + "\":[" + vs.map(v => f"$v%.3f").mkString(",") + "]"
    }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_full.json"),
      line(results).stripSuffix("}") + s""","samples":$samplesJson}""")
    // Emitted line: headline subset only, defensively trimmed to stay well
    // inside the 2000-char tail even if the subset grows.
    var head = results.filter(r => headline.contains(r._1))
    while (line(head).length > 1600 && head.nonEmpty) head = head.init
    println(line(head))
    spark.stop()
  }
}
