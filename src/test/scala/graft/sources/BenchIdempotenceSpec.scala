package graft.sources

import graft.{SparkEntry, SparkSuite}

/** Bench-harness idempotence: Bench (and any long-lived session) invokes
  * each declared query REPEATEDLY in one JVM, but Spark caches catalog
  * plugin instances per name — a query that re-points a catalog's `root`
  * conf at a fresh scratch dir and then resolves paths off that local
  * value breaks on the second call (BENCH_r09's q_reorg_purge failure).
  * This spec pins the contract for every catalog-staging query that
  * resolves a table directory or clones a per-JVM staged base: two
  * back-to-back invocations must both succeed and agree on row count. */
class BenchIdempotenceSpec extends SparkSuite {

  private val doubled = Seq(
    "q_reorg_purge", "q_meta_files", "q_meta_snapshots",
    "q_table_changes_merge", "q_table_changes_update",
    "q_table_changes_mixed", "q_tag_read", "q_embed_table",
    "q_mv_incremental_2src", "q_mv_rewrite_join_rollup",
    "q_delete_expr", "q_replace_where", "q_complex_table", "q_stream_cdf",
    "q_limit_pushdown", "q_generated_cols", "q_identity_cols",
    "q_default_cols", "q_topn_pushdown", "q_mv_cdf_refresh", "q_copy_into",
    "q_append_evolve", "q_row_tracking", "q_cluster_by",
    // the r14 memoized streaming fixtures: the second invocation drains
    // an already-complete checkpoint — the log must not duplicate
    "q_stream_semantic_dedup", "q_stream_minhash_dedup",
    "q_stream_knn_join", "q_stream_corpus_ingest",
    // r15 staged bases: the once-per-JVM bucketed pair, the churned
    // text-part fixture, the dedup SQL statements and the asof
    // compositions must all re-serve identically
    "q_join_bucketed", "q_meta_indexes_text_partitioned",
    "q_dedup_semantic_incremental_sql", "q_dedup_minhash_incremental_sql",
    "q_vector_search_asof_filtered", "q_vector_search_asof_pq",
    "q_vector_knn_join_asof_pq", "q_vector_search_asof_partitioned_pq",
    "q_vector_knn_join_asof_partitioned_pq", "q_text_bm25_asof_scoped_sql",
    "q_dedup_semantic_incremental_asof_sql",
    "q_dedup_minhash_incremental_asof_sql",
    "q_vector_knn_join_asof_filtered")

  doubled.foreach { name =>
    test(s"$name survives a second invocation in the same JVM") {
      val first = SparkEntry.queries(name)(spark, sfDir).count()
      val second = SparkEntry.queries(name)(spark, sfDir).count()
      assert(first > 0, s"$name returned no rows")
      assert(first == second,
        s"$name row count drifted across invocations: $first vs $second")
    }
  }
}
