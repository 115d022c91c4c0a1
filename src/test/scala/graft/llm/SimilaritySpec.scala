package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Goldens for the similarity operators. The driver oracle checks the
  * scalar-projected `q_similarity_centroids`; the full array-form centroid
  * ([[Similarity.labelCentroids]]) is asserted here instead, because the
  * driver's pandas comparator cannot sort frames with array cells. */
class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  test("labelCentroids: exact mean vectors on a hand-built corpus") {
    val dim = 64
    def vec(hot: Int, v: Float) = { val a = new Array[Float](dim); a(hot) = v; a }
    // label 0: one-hot(0, 1.0) and one-hot(1, 1.0) → mean = [0.5, 0.5, 0, …]
    // label 1: single vector one-hot(2, 0.25)      → mean = itself
    val df = Seq(
      (0L, vec(0, 1f), 0),
      (1L, vec(1, 1f), 0),
      (2L, vec(2, 0.25f), 1)
    ).toDF("vec_id", "embedding", "label")
    val cents = Similarity.labelCentroids(df, col("label"))
      .orderBy("label")
      .select($"label", $"n_vecs", $"centroid")
      .as[(Int, Long, Seq[Double])].collect()

    val (l0, n0, c0) = cents(0)
    assert(l0 === 0 && n0 === 2L)
    assert(c0(0) === 0.5 && c0(1) === 0.5)
    assert(c0.drop(2).forall(_ === 0.0))

    val (l1, n1, c1) = cents(1)
    assert(l1 === 1 && n1 === 1L)
    assert(c1(2) === 0.25)
    assert(c1.zipWithIndex.filter(_._2 != 2).forall(_._1 === 0.0))
  }

  test("IVF k-means refinement: recall vs exact top-k does not regress, centroids are data-derived") {
    import org.apache.spark.sql.types.{FloatType, IntegerType}
    val emb = graft.Tables(spark, sfDir, "embeddings")
    val k = 10
    def topIds(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("vec_id").as[Long].collect().toSet
    val exact = topIds(Similarity.queries("q_similarity_topk")(spark, sfDir))
    val refinedIvf = topIds(Similarity.queries("q_similarity_ivf")(spark, sfDir))

    // anchor-only IVF (no refinement) for comparison
    val seed = emb.filter($"vec_id" < 8)
      .select($"vec_id".cast(IntegerType).as("c_id"), $"embedding".as("c_emb"))
    val a0 = Similarity.assignLists(emb, seed)
    val probe0 = a0.filter($"vec_id" === 0).select($"embedding".as("pv"), $"list_id".as("p_list"))
    val anchorIvf = topIds(a0.join(broadcast(probe0), $"list_id" === $"p_list")
      .select($"vec_id", PortableHash.dotFixed($"embedding", $"pv").as("sim"))
      .orderBy(desc("sim"), $"vec_id").limit(k))

    val refinedRecall = (refinedIvf & exact).size.toDouble / k
    val anchorRecall = (anchorIvf & exact).size.toDouble / k
    info(s"recall@$k: refined=$refinedRecall anchor=$anchorRecall")
    // "refined ≥ anchor" is NOT an invariant — one k-means step can move a
    // specific probe's true neighbors across list boundaries (observed at
    // sf0.01: 0.7 vs 0.9). The honest single-probe guarantees: the probe's
    // own result is always found (sim(probe, probe) is maximal and the
    // probe is in its own list) and recall stays in a useful band; the
    // cross-boundary fix is multi-probe (q_similarity_multiprobe).
    assert(refinedIvf.contains(0L), "probe's own vector missing from its list search")
    assert(refinedRecall >= 0.5, s"refined IVF recall too low: $refinedRecall")
    assert(anchorRecall >= 0.5, s"anchor IVF recall too low: $anchorRecall")

    // refined centroids must differ from the anchors (actually retrained)
    val refined = Similarity.labelCentroids(Similarity.assignLists(emb, seed), col("list_id"))
      .select($"list_id", transform($"centroid", _.cast(FloatType)).as("c_emb"))
    val anchorVecs = seed.select($"c_emb").as[Seq[Float]].collect().toSet
    val refinedVecs = refined.select($"c_emb").as[Seq[Float]].collect().toSet
    assert((refinedVecs -- anchorVecs).nonEmpty)
  }

  test("q_similarity_centroids scalar projection matches the array form") {
    val emb = graft.Tables(spark, sfDir, "embeddings")
    val full = Similarity.labelCentroids(emb, col("label"))
      .select($"label", $"centroid").as[(Int, Seq[Double])].collect().toMap
    val scal = Similarity.queries("q_similarity_centroids")(spark, sfDir)
      .select($"label", $"c1", $"c32", $"c64").as[(Int, Double, Double, Double)]
      .collect()
    assert(scal.nonEmpty)
    scal.foreach { case (label, c1, c32, c64) =>
      val arr = full(label)
      assert(c1 === arr(0) && c32 === arr(31) && c64 === arr(63))
    }
  }

  test("random projection: signs are mixed per projection and rows are discriminated") {
    val rows = Similarity.queries("q_embed_project")(spark, sfDir).collect()
    // non-degenerate sign matrix: every sampled projection takes both signs
    // across rows (a structured parity bug makes p_j a constant-sign
    // weighted sum of a unit vector's coordinates)
    Seq(2, 3, 4, 5).foreach { c =>
      val vals = rows.map(_.getLong(c))
      assert(vals.exists(_ > 0) && vals.exists(_ < 0),
        s"projection column $c never changes sign — degenerate sign matrix")
    }
    // projections discriminate: near-unique checksums across vectors
    val chk = rows.map(_.getLong(6))
    assert(chk.distinct.length > rows.length * 9 / 10, "projection checksums collide")
  }

  test("q_embed_quantize: codes bounded to int8, scale saturates the max element, error within half a step") {
    val rows = Similarity.queries("q_embed_quantize")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val qmin = r.getAs[Int]("qmin"); val qmax = r.getAs[Int]("qmax")
      assert(qmin >= -127 && qmax <= 127)
      // the max-|x| element maps to exactly ±127 by construction of scale
      assert(qmax === 127 || qmin === -127)
      // |code/scale - x| ≤ 0.5/scale = amax/254 (+1 fp ulp for the floors)
      assert(r.getAs[Long]("err_fp") <= r.getAs[Long]("amax_fp") / 254 + 1)
    }
  }

  test("q_embed_pq: codes in codebook range, anchors reconstruct exactly, ADC tracks exact similarity") {
    val rows = Similarity.queries("q_embed_pq")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val codeCols = (0 until 8).map(b => s"code$b")
    rows.foreach { r =>
      codeCols.foreach { c =>
        val code = r.getAs[Int](c); assert(code >= 0 && code < 4)
      }
    }
    // an anchor row's nearest sub-centroid is its own sub-vector in every
    // block, so its ADC score rebuilds the exact dot (up to the per-block
    // vs whole-vector fixed-point division rounding)
    rows.filter(_.getAs[Long]("vec_id") < 4).foreach { r =>
      assert(math.abs(r.getAs[Double]("sim_adc") - r.getAs[Double]("sim_exact")) < 1e-9)
    }
    // 4-entry codebooks are coarse but must still track the exact score
    val mae = rows.map(r =>
      math.abs(r.getAs[Double]("sim_adc") - r.getAs[Double]("sim_exact"))).sum / rows.length
    assert(mae < 0.5, s"ADC mean absolute error $mae")
  }

  test("q_knn_graph: candidates blocked by IVF list, within-list exact top-k") {
    val emb = graft.Tables(spark, sfDir, "embeddings")
    val seed = emb.filter($"vec_id" < 8)
      .select($"vec_id".cast("int").as("c_id"), $"embedding".as("c_emb"))
    val assigned = Similarity.assignLists(emb, seed)
      .select($"vec_id", $"list_id", $"embedding")
      .as[(Long, Int, Seq[Float])].collect()
    val byList = assigned.groupBy(_._2)

    // brute-force within-list top-3 with the same fixed-point dot + tie order
    def dotFp(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) =>
        math.floor(x.toDouble * y.toDouble * 1e12).toLong }.sum / 1e12
    val expect: Set[(Long, Int, Long, Int, Double)] =
      byList.toSeq.flatMap { case (_, members) =>
        members.toSeq.flatMap { case (src, lst, eSrc) =>
          members.toSeq.filter(_._1 != src)
            .map { case (dst, _, eDst) => (dst, dotFp(eSrc, eDst)) }
            .sortBy { case (dst, sim) => (-sim, dst) }.take(3)
            .zipWithIndex
            .map { case ((dst, sim), i) => (src, lst, dst, i + 1, sim) }
        }
      }.toSet

    val got = Similarity.queries("q_knn_graph")(spark, sfDir)
      .select($"src", $"list_id", $"dst", $"rank", $"sim")
      .as[(Long, Int, Long, Int, Double)].collect().toSet
    assert(got === expect)
    // candidate volume is Σ|list|², bounded by list granularity — every
    // source's neighbor count is capped by its own list population
    val listSize = byList.view.mapValues(_.length).toMap
    got.groupBy(_._1).foreach { case (src, edges) =>
      val lst = edges.head._2
      assert(edges.size <= math.min(3, listSize(lst) - 1))
    }
  }

  test("q_knn_graph_xlist: multi-list assignment recovers a boundary-straddling pair") {
    // 8 one-hot seed vectors (the IVF anchors) + a planted pair straddling
    // the list-0/list-1 boundary: vec 8 is mostly-e0 (home list 0,
    // runner-up 1), vec 9 mostly-e1 (home list 1, runner-up 0). Their
    // cosine ≈ 0.8 — nearest neighbors of each other — but they live in
    // different home lists, so the single-list kNN graph cannot see the
    // pair; the two-list form must.
    val dim = 64
    def unit(pairs: (Int, Float)*): Array[Float] = {
      val a = new Array[Float](dim); pairs.foreach { case (i, v) => a(i) = v }
      val n = math.sqrt(a.map(x => x.toDouble * x).sum).toFloat
      a.map(_ / n)
    }
    val rows = (0 until 8).map(i => (i.toLong, 0, unit(i -> 1f))) ++ Seq(
      (8L, 0, unit(0 -> 0.9f, 1 -> 0.45f)),
      (9L, 0, unit(1 -> 0.9f, 0 -> 0.45f)))
    val tmp = java.nio.file.Files.createTempDirectory("sim_spec_").toString
    rows.toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")

    def edges(q: String): Set[(Long, Long)] =
      Similarity.queries(q)(spark, tmp).select("src", "dst")
        .as[(Long, Long)].collect().toSet
    val single = edges("q_knn_graph")
    val multi = edges("q_knn_graph_xlist")
    assert(!single.contains((8L, 9L)), "single-list form unexpectedly crossed lists")
    assert(multi.contains((8L, 9L)), s"boundary pair not recovered: $multi")
    assert(multi.contains((9L, 8L)))
    // the multi-list candidate set is a superset per source, so its k-th
    // best similarity can only improve — spot-check on the real testdata
    val s1 = Similarity.queries("q_knn_graph")(spark, sfDir)
      .select($"src", $"rank", $"sim").as[(Long, Int, Double)].collect()
      .map { case (s, r, v) => (s, r) -> v }.toMap
    Similarity.queries("q_knn_graph_xlist")(spark, sfDir)
      .select($"src", $"rank", $"sim").as[(Long, Int, Double)].collect()
      .foreach { case (s, r, v) =>
        s1.get((s, r)).foreach(v1 =>
          assert(v >= v1 - 1e-12, s"src $s rank $r regressed: $v < $v1"))
      }
  }

  test("local assigners are cell-identical to the frame-derived forms") {
    // the r14 job-graph cut swaps serve paths onto the DRIVER-COMPUTED
    // assigners; this pins the hash contract they rest on — per-row
    // list_id equality with the frame-derived two-level assignment,
    // globally and per partition, on a tie-heavy synthetic geometry
    val dim = 8
    val rnd = new scala.util.Random(7)
    def v(): Array[Float] =
      Array.fill(dim)((rnd.nextInt(5) - 2) * 0.25f)
    val emb = (0 until 300).map(i =>
        (i.toLong, 0, v(), (i % 3).toString))
      .toDF("vec_id", "label", "embedding", "part")
    val cents = (0 until 3).flatMap(p => (0 until 11).map(c =>
        ((p * 100 + c) % 97, v(), p.toString)))
      .distinct
      .toDF("c_id", "c_emb", "part")
    for (coarse <- Seq(1, 2)) {
      val frameG = Similarity.assignListsHier(
          emb.select("vec_id", "label", "embedding"),
          cents.where($"part" === "0").select("c_id", "c_emb"), coarse)
        .select("vec_id", "list_id").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val localG = Similarity.assignListsHierLocal(
          emb.select("vec_id", "label", "embedding"),
          cents.where($"part" === "0").select("c_id", "c_emb"), coarse)
        .select("vec_id", "list_id").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(frameG == localG, s"global local ≠ frame at coarse=$coarse")
      val frameP = Similarity.assignListsHierByPart(emb, cents, coarse)
        .select("part", "vec_id", "list_id").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
      val localP = Similarity.assignListsHierByPartLocal(emb, cents, coarse)
        .select("part", "vec_id", "list_id").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
      assert(frameP == localP, s"by-part local ≠ frame at coarse=$coarse")
      assert(frameP.nonEmpty && frameG.nonEmpty)
    }
  }
}
