package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Unit pins for the semantic-clustering tier ([[Clustering]]): the Lloyd
  * loop's convergence direction, the SemDeDup drop rule (threshold,
  * keep-the-outlier survivor, tie-break), and the size-derived k. The
  * cell-exact end-to-end results are driver-oracle-gated
  * (`q_embed_kmeans`, `q_dedup_semantic`); these tests pin the properties
  * a hash compare can't name. */
class ClusteringSpec extends SparkSuite {
  import spark.implicits._

  private val dim = 64
  private def vec(xs: (Int, Float)*): Array[Float] = {
    val a = new Array[Float](dim)
    xs.foreach { case (i, v) => a(i) = v }
    a
  }

  test("kFor: n/64 capped at √n, floor 8 — centroid table stays bounded") {
    assert(Clustering.kFor(0L) === 8L)
    assert(Clustering.kFor(50L) === 8L)
    assert(Clustering.kFor(500L) === 8L)     // n/64 regime (small corpus)
    assert(Clustering.kFor(4096L) === 64L)   // crossover: n/64 = √n
    assert(Clustering.kFor(1000000L) === 1000L) // √n cap regime
    // the 100 TB argument: at 1 B vectors the uncapped n/64 policy meant
    // ~16 M centroids (multi-GB broadcast); the √n cap keeps it ~32 k rows
    assert(Clustering.kFor(1000000000L) === 31623L)
  }

  test("kmeansAssign: refinement separates two blobs the anchor split mixes") {
    // two tight blobs on axes 0 and 1; anchors are the two LOWEST vec_ids,
    // which both sit in blob A — after refinement the centroids migrate and
    // the final assignment splits the blobs cleanly.
    val blobA = (0L to 5L).map(i => (i, vec(0 -> 1f, (i % 3 + 10).toInt -> 0.05f), 0))
    val blobB = (6L to 11L).map(i => (i, vec(1 -> 1f, (i % 3 + 20).toInt -> 0.05f), 1))
    val emb = (blobA ++ blobB).toDF("vec_id", "embedding", "label")
    val (assigned, _) = Clustering.kmeansAssign(emb, k = 2L, iters = 3)
    val byList = assigned.select($"list_id", $"label").distinct()
      .as[(Int, Int)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    // every cluster is label-pure and both labels are covered
    assert(byList.values.forall(_.size === 1))
    assert(byList.values.flatten.toSet === Set(0, 1))
  }

  test("semSurvivors: keeps the outlier, drops the centroid-adjacent dup") {
    // one cluster: u and v are near-dups (cos ≈ 1); w is ORTHOGONAL filler
    // (cos 0 to both, below τ). The centroid sits on axis 0, so v (larger
    // axis-0 component) is closer to it than u → the SemDeDup rule keeps u.
    val u = vec(0 -> 0.8f, 1 -> 0.6f)
    val v = vec(0 -> 0.81f, 1 -> 0.586f)
    val w = vec(2 -> 1f)
    val emb = Seq((10L, u, 0), (11L, v, 0), (12L, w, 0))
      .toDF("vec_id", "embedding", "label")
    val cents = Seq((0, vec(0 -> 1f))).toDF("c_id", "c_emb")
    val assigned = Similarity.assignLists(emb, cents)
    val kept = Clustering.semSurvivors(assigned, cents, n = 3L)
      .select($"vec_id").as[Long].collect().toSet
    assert(kept === Set(10L, 12L)) // u survives (lower c2c), filler untouched
  }

  test("semSurvivors: equal c2c ties break to the lower vec_id") {
    val a = vec(0 -> 1f)
    val emb = Seq((1L, a, 0), (2L, a, 0)).toDF("vec_id", "embedding", "label")
    val cents = Seq((0, a)).toDF("c_id", "c_emb")
    val assigned = Similarity.assignLists(emb, cents)
    val kept = Clustering.semSurvivors(assigned, cents, n = 2L)
      .select($"vec_id").as[Long].collect().toSet
    assert(kept === Set(1L))
  }

  test("semSurvivors: banding bounds candidates — same-cluster near-dups " +
      "in disjoint buckets both survive") {
    // n = 10 → band geometry (bands = 2, bits = 4): sign anchors are ids
    // 0..7. Anchor 0 (band 0) and anchor 4 (band 1) sit on axis 2; u (id
    // 8) and v (id 9) mirror each other across that hyperplane, so their
    // band keys differ in EVERY band — no shared bucket, no candidate
    // pair — while their mutual cosine (≈0.766) is far above τ and both
    // share cluster 0. The pre-banding cluster-only join would drop id 9
    // (equal c2c, lower-id witness); the banded join keeps both. This is
    // the structural candidate bound, pinned behaviorally.
    val e2 = vec(2 -> 1f)
    val anchors = Seq(
      0L -> e2, 1L -> vec(3 -> 1f), 2L -> vec(4 -> 1f), 3L -> vec(5 -> 1f),
      4L -> e2, 5L -> vec(6 -> 1f), 6L -> vec(7 -> 1f), 7L -> vec(8 -> 1f))
    val u = vec(0 -> 0.94f, 2 -> 0.342f)  // cos(u, e2) = 0.342 < τ
    val v = vec(0 -> 0.94f, 2 -> -0.342f) // cos(u, v) ≈ 0.766 ≥ τ
    val emb = (anchors ++ Seq(8L -> u, 9L -> v))
      .map { case (id, e) => (id, e, 0) }.toDF("vec_id", "embedding", "label")
    val cents = Seq((0, vec(0 -> 1f))).toDF("c_id", "c_emb")
    val assigned = Similarity.assignLists(emb, cents)
    val kept = Clustering.semSurvivors(assigned, cents, n = 10L)
      .select($"vec_id").as[Long].collect().toSet
    assert(Set(8L, 9L).subsetOf(kept),
      s"no shared band bucket → no candidate pair → both survive: $kept")
  }

  test("assignListsHier: COARSE PROBES trades fidelity — a boundary row " +
      "lands differently under c = 1") {
    // k = 4 centroids → coarse anchors are the 2 lowest c_ids (c0 = e0,
    // c1 = e1); c2 sits in c0's coarse cell, c3 in c1's. Row x's TOP
    // coarse cell is c0's, but its true nearest FINE centroid is c3 —
    // only visible through the runner-up cell. c = 2 finds it; c = 1
    // assigns x to its top cell's best (c0). The knob's fidelity trade,
    // pinned behaviorally (its recall cost at corpus scale is the
    // oracle-certified q_vector_search_recall_coarse).
    val cents = Seq(
      (0, vec(0 -> 1f)), (1, vec(1 -> 1f)),
      (2, vec(0 -> 0.9f, 2 -> 0.435f)), (3, vec(1 -> 0.6f, 3 -> 0.8f)))
      .toDF("c_id", "c_emb")
    val x = vec(0 -> 0.66f, 1 -> 0.2f, 3 -> 0.72f)
    val emb = Seq((100L, x, 0)).toDF("vec_id", "embedding", "label")
    def listOf(c: Int) = Similarity.assignListsHier(emb, cents, c)
      .select($"list_id").as[Int].collect().head
    assert(listOf(2) === 3, "two coarse cells surface the true argmax")
    assert(listOf(1) === 0, "one coarse cell misses the runner-up's cell")
    intercept[IllegalArgumentException] {
      Similarity.assignListsHier(emb, cents, 3)
    }
  }

  test("q_sample_cluster: per-cluster cap holds, sample is deterministic") {
    val d = "/root/testdata/sf0.001"
    val s1 = Clustering.queries("q_sample_cluster")(spark, d).collect()
    val s2 = Clustering.queries("q_sample_cluster")(spark, d).collect()
    assert(s1.toSeq == s2.toSeq, "hash-ordered sample must be reproducible")
    val perCluster = s1.groupBy(_.getInt(0)).view.mapValues(_.length)
    assert(perCluster.values.forall(_ <= 8), "cap is 8 per cluster")
    assert(perCluster.size > 1, "sample spans clusters")
  }

  test("q_dedup_semantic_incremental: batch-only output, corpus witnesses, " +
      "deterministic") {
    val d = "/root/testdata/sf0.001"
    val r1 = Clustering.queries("q_dedup_semantic_incremental")(spark, d)
      .collect()
    val r2 = Clustering.queries("q_dedup_semantic_incremental")(spark, d)
      .collect()
    assert(r1.toSeq == r2.toSeq, "incremental dedup must be reproducible")
    // every output row is a BATCH row (odd id); every witness is a
    // CORPUS row (even id)
    assert(r1.forall(_.getLong(0) % 2 == 1), "output rows are the batch")
    val dups = r1.filter(!_.isNullAt(1))
    // non-vacuous: the fixture plants batch-corpus near-dups (131 raw
    // cosine-qualifying pairs at sf0.001) — an emptied candidate join
    // (mismatched band anchors, inverted parity split) must FAIL here,
    // not pass a forall-over-empty
    assert(dups.nonEmpty, "planted batch-corpus near-dups must surface")
    assert(dups.length < r1.length, "never total collapse")
    assert(dups.forall(_.getLong(1) % 2 == 0), "witnesses come from the corpus")
    assert(dups.forall(r => r.getBoolean(2)), "is_dup tracks dup_of")
  }

  test("q_dedup_semantic on testdata: drops planted near-dups, partitions the corpus") {
    val d = "/root/testdata/sf0.001"
    val n = graft.Tables(spark, d, "embeddings").count()
    val kept = Clustering.queries("q_dedup_semantic")(spark, d).count()
    assert(kept > 0 && kept < n) // some drops, never total collapse
  }
}
