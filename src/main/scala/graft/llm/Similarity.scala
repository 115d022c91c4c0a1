package graft.llm

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType, IntegerType, LongType}

import graft.Tables
import graft.queries.QueryModule
import PortableHash._

/** Vector-similarity search over `embeddings` (SURVEY.md §2 B14 + the
  * north-star similarity-search mandate).
  *
  * Two paths, mirroring how a production ANN pipeline scales:
  *  - `q_similarity_topk` — exact brute-force cosine top-k against a probe
  *    vector: the probe is a broadcast single row, the dot product is a
  *    per-row higher-order fold (zero shuffle), and `orderBy(...).limit(k)`
  *    compiles to `TakeOrderedAndProjectExec` (bounded per-partition heap,
  *    no global sort). This is the correctness baseline; it scans all
  *    vectors — O(n) per probe.
  *  - `q_similarity_ivf` — IVF-style pruning: vectors are assigned to the
  *    nearest of 8 data-derived centroids (broadcast); the probe searches
  *    ONLY its own centroid's bucket. At 100 TB this is the scale path: the
  *    scan is cut by ~n_lists× (here 8×), and bucket assignment is a
  *    per-row computation against broadcast centroids — no shuffle.
  *
  * Embeddings are unit-norm (checked in testdata), so cosine = dot product.
  * Dot products use [[PortableHash.dotFixed]] (exact fixed-point, engine-
  * portable) so both queries are cell-exact against the DuckDB oracle.
  */
object Similarity extends QueryModule {

  private val TopK = 10
  private val NumLists = 8
  private val NumProbes = 5   // q_similarity_multiprobe probe-set size
  private val TopPerProbe = 3
  private val ProbeSalt = 32  // phase-1 buckets per probe (bounds collect_list)
  private val KnnK = 3        // q_knn_graph neighbors per vector

  /** List count for the kNN-GRAPH blocked joins — sized so the EXPECTED
    * LIST SIZE stays constant (~64) as the corpus grows: the graph's
    * candidate volume is Σ_l |list_l|² ≈ n · avg_list, so a FIXED list
    * count (the pre-r16 NumLists = 8) made it n²/8 — the sf1 scale
    * audit measured the 10× corpus at 70× the cost. With n/64 lists the
    * volume is ~64·n — linear, the production IVF-graph shape (at true
    * 100 TB scale the flat broadcast assigner below hands over to the
    * two-level [[assignLists2Level]] family, same blocking). Floors at
    * the legacy 8 so every corpus ≤ 512 rows (sf0.01's 200) keeps the
    * original geometry — oracle hashes unchanged. */
  private def graphLists(n: Long): Long = math.max(8L, n / 64L)
  private[graft] val PqM = 8   // q_embed_pq: subspace blocks
  private[graft] val PqDim = 8 // dims per block (PqM × PqDim = 64)
  private[graft] val PqK = 4   // centroids per subspace codebook (q_embed_pq)
  /** The index tier's TRAINED codebook geometry
    * ([[graft.sources.VectorIndex]]): 16 Lloyd-trained codewords per
    * subspace (production PQ trains 256 per 8-dim block; 16 keeps the
    * oracle replay tractable while exercising the same machinery), seeded
    * from the PqCbK lowest-anchor rows, trained on a deterministic
    * ~PqTrainCap-row decimation (permute stream PqTrainJ — distinct from
    * clusterSample's 3 and the IVF training sample's 11). */
  private[graft] val PqCbK = 16
  private[graft] val PqTrainCap = 1024L
  private[graft] val PqTrainJ = 13

  /** PQ primitives shared by `q_embed_pq` and the vector index's
    * PQ-candidate tier ([[graft.sources.VectorIndex]]): one 8-dim block
    * of a 64-dim vector, its min-L2 codebook code ((x·x − 2·x·c) + c·c
    * fixed-point assembly, first-min tie-break), and the asymmetric
    * (ADC) probe score — Σ_b dot(probe_b, centroid[code_b]_b),
    * left-assoc, every double op in the oracle's order. `cents` is an
    * array<struct<c_id, c_emb>> column sorted by c_id. */
  private[graft] def pqBlock(c: org.apache.spark.sql.Column, b: Int) =
    slice(c, b * PqDim + 1, PqDim)
  private[graft] def pqCode(cents: org.apache.spark.sql.Column,
      emb: org.apache.spark.sql.Column, b: Int): org.apache.spark.sql.Column = {
    val xb = pqBlock(emb, b)
    val d2s = transform(cents, st => {
      val cb = pqBlock(st.getField("c_emb"), b)
      (dotFixed(xb, xb) - lit(2.0) * dotFixed(xb, cb)) + dotFixed(cb, cb)
    })
    (array_position(d2s, array_min(d2s)) - 1).cast(IntegerType)
  }
  private[graft] def pqAdc(cents: org.apache.spark.sql.Column,
      probe: org.apache.spark.sql.Column,
      code: Int => org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until PqM).map { b =>
      val cb = pqBlock(
        element_at(cents, code(b) + lit(1)).getField("c_emb"), b)
      dotFixed(pqBlock(probe, b), cb)
    }.reduce(_ + _)

  /** Exact per-group mean vectors via [[graft.functions.VectorSumFixed]]:
    * one 64-long buffer per group through the partial/final aggregate —
    * never an explode to (row × dim). Shared by `q_similarity_centroids`
    * (scalar projection), the SimilaritySpec golden, and the IVF k-means
    * refinement step. Output: (<groupCol>, n_vecs, centroid array<double>).
    */
  def labelCentroids(emb: org.apache.spark.sql.DataFrame,
                     groupCol: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame =
    emb.groupBy(groupCol)
      .agg(count(lit(1)).as("n_vecs"),
        graft.functions.VectorSumFixed.sum(col("embedding"), 64).as("vsum"))
      .select(groupCol, col("n_vecs"),
        transform(col("vsum"), x => x / col("n_vecs")).as("centroid"))

  /** Assign each vector to its max-dot centroid: `cents` is a small
    * (c_id, c_emb array<float>) table, collapsed to ONE broadcast array row
    * (sorted by c_id) so assignment is pure per-row arithmetic against the
    * broadcast — zero shuffle of the embedding table, any list-id sparsity
    * handled by indexing the struct back out (argmax position → c_id).
    * First-max tie-break (array_position) matches DuckDB list_position. */
  def assignLists(emb: org.apache.spark.sql.DataFrame,
                  cents: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // the one-row panel is LOCALIZED (r15 — the r14 kmeans-loop rule
    // applied to the flat assigner too): its broadcast launches no job
    // inside the consuming action, so an assignment costs exactly the
    // panel collect + one codegen stage
    val centArr = Clustering.localize(cents
      .agg(array_sort(collect_list(struct(col("c_id"), col("c_emb")))).as("cents")))
    emb.crossJoin(broadcast(centArr))
      .withColumn("dots",
        transform(col("cents"), st => dotFixed(col("embedding"), st.getField("c_emb"))))
      .withColumn("pos", array_position(col("dots"), array_max(col("dots"))).cast(IntegerType))
      .withColumn("list_id", element_at(col("cents"), col("pos")).getField("c_id"))
      .select(col("vec_id"), col("label"), col("embedding"), col("list_id"))
  }

  /** TWO-LEVEL (coarse-quantizer) assignment — the 100 TB shape of
    * [[assignLists]] for CORPUS-DERIVED k (k ≈ √n,
    * [[Clustering.kFor]]): a flat assignment does k dots per row against
    * one broadcast array row — O(n·k) work and an unbounded broadcast
    * as k grows with the corpus. Here the only per-row broadcast is the
    * ⌈√k⌉ COARSE anchors (the ⌈√k⌉ lowest-c_id centroids); each row
    * takes its max-dot coarse anchor, then an EQUI-JOIN on that coarse
    * id against the grouped centroid table resolves the fine argmax
    * within the row's coarse cell — O(n·√k) work, broadcast bounded by
    * the centroid table itself (√n rows at k = √n). Deterministic and
    * oracle-replayable: anchors are a pure function of the centroid set
    * (lowest ids), every argmax is first-position tie-break on the
    * c_id-sorted array, and an anchor centroid always self-assigns (so
    * no coarse cell a row can map to is ever empty). Assignment is
    * hierarchical-IVF approximate — a row sees only the fine centroids
    * of its TOP-`coarseProbes` coarse cells (masked-max runner-up, the
    * [[assignLists2]] idiom applied at the coarse level). Probing two
    * cells (the default) is the standard fidelity knob for a coarse
    * quantizer and keeps boundary rows from landing in the wrong list;
    * `coarseProbes = 1` halves the per-row fine work for geometries
    * where boundary drift is acceptable — a DECLARED policy (`CREATE
    * VECTOR INDEX … COARSE PROBES c`) like LISTS/SAMPLE/PROBES, with
    * its recall cost oracle-certified by `q_vector_search_recall_coarse`.
    * The oracle replays the same c-cell rule, so results stay
    * cell-exact. */
  def assignListsHier(emb: org.apache.spark.sql.DataFrame,
                      cents: org.apache.spark.sql.DataFrame,
                      coarseProbes: Int = 2): org.apache.spark.sql.DataFrame = {
    if (coarseProbes < 1 || coarseProbes > 2)
      throw new IllegalArgumentException(
        s"COARSE PROBES $coarseProbes — the two-level assigner probes 1 " +
          "or 2 coarse cells (more cells trades toward a flat assignment; " +
          "tune LISTS for finer geometry instead)")
    // coarse anchors: the ⌈√k⌉ lowest-c_id centroids, one broadcast row.
    // anch and byG are each referenced twice downstream but NOT
    // materialized here: every caller hands in a cents frame that is
    // already bounded-source (a checkpointed k-row loop table or a
    // parquet sidecar), so the worst-case re-evaluation is a k-row
    // aggregate — while an eager localCheckpoint is a full Spark JOB,
    // and this function runs 3× per 2-round Lloyd build. Identical
    // broadcast subtrees also reuse their exchange within a query.
    val anch = cents
      .agg(array_sort(collect_list(struct(col("c_id"), col("c_emb")))).as("all"))
      .select(slice(col("all"), lit(1),
        ceil(sqrt(size(col("all")))).cast(IntegerType)).as("anc"))
    def ancDots(embCol: org.apache.spark.sql.Column) =
      transform(col("anc"), st => dotFixed(embCol, st.getField("c_emb")))
    // fine centroid → coarse cell; an anchor ALWAYS self-assigns, so
    // every reachable coarse id holds at least its own anchor centroid
    val centsG = cents.crossJoin(broadcast(anch))
      .withColumn("adots", ancDots(col("c_emb")))
      .withColumn("g",
        when(exists(col("anc"), st => st.getField("c_id") === col("c_id")),
          col("c_id"))
        .otherwise(element_at(col("anc"),
          array_position(col("adots"), array_max(col("adots"))).cast(IntegerType))
          .getField("c_id")))
      .select(col("c_id"), col("c_emb"), col("g"))
    // per-cell centroid arrays (≈√k entries each), keyed by coarse id —
    // the TABLE side of the assignment equi-join
    val byG = centsG.groupBy("g")
      .agg(array_sort(collect_list(struct(col("c_id"), col("c_emb")))).as("gc"))
    // rows → top-c coarse cells (per-row masked-max against the bounded
    // anchor row; with a single anchor — or COARSE PROBES 1 — g2
    // degenerates to g1 and the fine argmax sees one cell)
    val withP1 = emb.crossJoin(broadcast(anch))
      .withColumn("adots", ancDots(col("embedding")))
      .withColumn("p1",
        array_position(col("adots"), array_max(col("adots"))).cast(IntegerType))
    val withP2 =
      if (coarseProbes == 1) withP1.withColumn("p2", col("p1"))
      else withP1
        .withColumn("md", zip_with(col("adots"),
          sequence(lit(1), size(col("adots"))),
          (x, i) => when(i === col("p1"), lit(-1e18)).otherwise(x)))
        .withColumn("p2", array_position(col("md"), array_max(col("md"))).cast(IntegerType))
    val rowsG = withP2
      .select(col("vec_id"), col("label"), col("embedding"),
        element_at(col("anc"), col("p1")).getField("c_id").as("g1"),
        element_at(col("anc"), col("p2")).getField("c_id").as("g2"))
    // the coarse EQUI-JOINs (both broadcast) + fine argmax over the
    // union of the two cells' centroids, c_id-sorted for the tie-break
    val b1 = byG.select(col("g").as("g1"), col("gc").as("gc1"))
    val b2 = byG.select(col("g").as("g2"), col("gc").as("gc2"))
    rowsG.join(broadcast(b1), "g1").join(broadcast(b2), "g2")
      .withColumn("cand",
        when(col("g1") === col("g2"), col("gc1"))
          .otherwise(array_sort(concat(col("gc1"), col("gc2")))))
      .withColumn("dots",
        transform(col("cand"), st => dotFixed(col("embedding"), st.getField("c_emb"))))
      .withColumn("pos", array_position(col("dots"), array_max(col("dots"))).cast(IntegerType))
      .withColumn("list_id", element_at(col("cand"), col("pos")).getField("c_id"))
      .select(col("vec_id"), col("label"), col("embedding"), col("list_id"))
  }

  /** [[assignListsHier]] with the centroid-derived legs computed
    * DRIVER-SIDE (r14): `cents` is collected (k ≈ √n rows — the
    * probe-list metadata class, ≤ ~32k rows at 10⁹ vectors), the anchor
    * slice, coarse-cell assignment and per-cell centroid arrays are
    * built in Scala with the exact fixed-point argmax the DataFrame
    * legs compute (⌊a·b·10¹²⌋ accumulation, first-max tie-break), and
    * the row side joins BROADCAST LOCAL relations — the whole
    * assignment becomes ONE codegen stage over `emb` with zero
    * shuffles and zero AQE stage-job barriers, where the frame-derived
    * version pays a job per broadcast leg. Per-row results are
    * cell-identical to [[assignListsHier]] (the Lloyd family's hash
    * contract); the row-side expressions are shared verbatim. */
  def assignListsHierLocal(emb: org.apache.spark.sql.DataFrame,
                           cents: org.apache.spark.sql.DataFrame,
                           coarseProbes: Int = 2): org.apache.spark.sql.DataFrame = {
    if (coarseProbes < 1 || coarseProbes > 2)
      throw new IllegalArgumentException(
        s"COARSE PROBES $coarseProbes — the two-level assigner probes 1 " +
          "or 2 coarse cells (more cells trades toward a flat assignment; " +
          "tune LISTS for finer geometry instead)")
    val spark = emb.sparkSession
    val all: Array[(Int, Array[Float])] =
      cents.select(col("c_id"), col("c_emb")).collect()
        .map(r => (r.getInt(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    if (all.isEmpty)
      return emb.where(lit(false))
        .select(col("vec_id"), col("label"), col("embedding"),
          lit(0).as("list_id"))
    // the exact fixed-point dot ([[graft.functions.FixedPointDotProduct]])
    def dotFx(a: Array[Float], b: Array[Float]): Double = {
      val n = math.min(a.length, b.length)
      var acc = 0L
      var i = 0
      while (i < n) {
        acc += math.floor(a(i).toDouble * b(i).toDouble * 1.0e12).toLong
        i += 1
      }
      acc / 1.0e12
    }
    // first-max tie-break — array_position(dots, array_max(dots))
    def argmaxFirst(ds: Array[Double]): Int = {
      var bi = 0; var bv = ds(0); var i = 1
      while (i < ds.length) { if (ds(i) > bv) { bv = ds(i); bi = i }; i += 1 }
      bi
    }
    val nAnc = math.ceil(math.sqrt(all.length.toDouble)).toInt
    val anc = all.take(nAnc)
    val gOf: Map[Int, Int] = all.map { case (cid, cemb) =>
      cid -> (if (anc.exists(_._1 == cid)) cid
        else anc(argmaxFirst(anc.map(a => dotFx(cemb, a._2))))._1)
    }.toMap
    val byG: Seq[(Int, Array[(Int, Array[Float])])] =
      all.groupBy(t => gOf(t._1)).toSeq.sortBy(_._1)
        .map { case (g, arr) => (g, arr.sortBy(_._1)) }
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{ArrayType, StructField, StructType}
    val stT = StructType(Seq(StructField("c_id", IntegerType),
      StructField("c_emb", ArrayType(FloatType))))
    def cellRow(arr: Array[(Int, Array[Float])]): Seq[Row] =
      arr.toSeq.map { case (i, e) => Row(i, e.toSeq) }
    val anchDf = spark.createDataFrame(
      java.util.Arrays.asList(Row(cellRow(anc))),
      StructType(Seq(StructField("anc", ArrayType(stT)))))
    def gcDf(gname: String, aname: String) = spark.createDataFrame(
      java.util.Arrays.asList(byG.map { case (g, arr) =>
        Row(g, cellRow(arr))
      }: _*),
      StructType(Seq(StructField(gname, IntegerType),
        StructField(aname, ArrayType(stT)))))
    // the row side — [[assignListsHier]]'s expressions verbatim, over
    // the local legs
    def ancDots(embCol: org.apache.spark.sql.Column) =
      transform(col("anc"), st => dotFixed(embCol, st.getField("c_emb")))
    val withP1 = emb.crossJoin(broadcast(anchDf))
      .withColumn("adots", ancDots(col("embedding")))
      .withColumn("p1",
        array_position(col("adots"), array_max(col("adots"))).cast(IntegerType))
    val withP2 =
      if (coarseProbes == 1) withP1.withColumn("p2", col("p1"))
      else withP1
        .withColumn("md", zip_with(col("adots"),
          sequence(lit(1), size(col("adots"))),
          (x, i) => when(i === col("p1"), lit(-1e18)).otherwise(x)))
        .withColumn("p2", array_position(col("md"), array_max(col("md"))).cast(IntegerType))
    val rowsG = withP2
      .select(col("vec_id"), col("label"), col("embedding"),
        element_at(col("anc"), col("p1")).getField("c_id").as("g1"),
        element_at(col("anc"), col("p2")).getField("c_id").as("g2"))
    rowsG.join(broadcast(gcDf("g1", "gc1")), "g1")
      .join(broadcast(gcDf("g2", "gc2")), "g2")
      .withColumn("cand",
        when(col("g1") === col("g2"), col("gc1"))
          .otherwise(array_sort(concat(col("gc1"), col("gc2")))))
      .withColumn("dots",
        transform(col("cand"), st => dotFixed(col("embedding"), st.getField("c_emb"))))
      .withColumn("pos", array_position(col("dots"), array_max(col("dots"))).cast(IntegerType))
      .withColumn("list_id", element_at(col("cand"), col("pos")).getField("c_id"))
      .select(col("vec_id"), col("label"), col("embedding"), col("list_id"))
  }

  /** [[assignListsHierByPart]] with the centroid-derived legs computed
    * DRIVER-SIDE (r14 — the [[assignListsHierLocal]] trick keyed by
    * part): the cents sidecar is Σ_p k_p rows (metadata class), so
    * every partition's anchor slice, coarse-cell assignment and
    * per-cell arrays build in Scala (exact fixed-point argmax,
    * first-max tie-breaks) and the row side joins BROADCAST LOCAL
    * relations on (part[, g]) — one codegen stage for ALL partitions,
    * zero per-leg exchange jobs. Per-row results are cell-identical to
    * [[assignListsHierByPart]]. */
  def assignListsHierByPartLocal(emb: org.apache.spark.sql.DataFrame,
      cents: org.apache.spark.sql.DataFrame,
      coarseProbes: Int = 2): org.apache.spark.sql.DataFrame = {
    if (coarseProbes < 1 || coarseProbes > 2)
      throw new IllegalArgumentException(
        s"COARSE PROBES $coarseProbes — the two-level assigner probes 1 " +
          "or 2 coarse cells (more cells trades toward a flat assignment; " +
          "tune LISTS for finer geometry instead)")
    val spark = emb.sparkSession
    val all: Array[(String, Int, Array[Float])] =
      cents.select(col("part"), col("c_id"), col("c_emb")).collect()
        .map(r => (r.getString(0), r.getInt(1), r.getSeq[Float](2).toArray))
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{ArrayType, StringType, StructField,
      StructType}
    val stT = StructType(Seq(StructField("c_id", IntegerType),
      StructField("c_emb", ArrayType(FloatType))))
    if (all.isEmpty)
      return emb.where(lit(false))
        .select(col("part"), col("vec_id"), col("label"), col("embedding"),
          lit(0).as("list_id"))
    def dotFx(a: Array[Float], b: Array[Float]): Double = {
      val n = math.min(a.length, b.length)
      var acc = 0L
      var i = 0
      while (i < n) {
        acc += math.floor(a(i).toDouble * b(i).toDouble * 1.0e12).toLong
        i += 1
      }
      acc / 1.0e12
    }
    def argmaxFirst(ds: Array[Double]): Int = {
      var bi = 0; var bv = ds(0); var i = 1
      while (i < ds.length) { if (ds(i) > bv) { bv = ds(i); bi = i }; i += 1 }
      bi
    }
    def cellRow(arr: Array[(Int, Array[Float])]): Seq[Row] =
      arr.toSeq.map { case (i, e) => Row(i, e.toSeq) }
    val perPart = all.groupBy(_._1).toSeq.sortBy(_._1).map { case (pv, rows) =>
      val slice = rows.map(t => (t._2, t._3)).sortBy(_._1)
      val anc = slice.take(math.ceil(math.sqrt(slice.length.toDouble)).toInt)
      val gOf: Map[Int, Int] = slice.map { case (cid, cemb) =>
        cid -> (if (anc.exists(_._1 == cid)) cid
          else anc(argmaxFirst(anc.map(a => dotFx(cemb, a._2))))._1)
      }.toMap
      val byG = slice.groupBy(t => gOf(t._1)).toSeq.sortBy(_._1)
        .map { case (g, arr) => (g, arr.sortBy(_._1)) }
      (pv, anc, byG)
    }
    val anchDf = spark.createDataFrame(
      java.util.Arrays.asList(perPart.map { case (pv, anc, _) =>
        Row(pv, cellRow(anc))
      }: _*),
      StructType(Seq(StructField("part", StringType),
        StructField("anc", ArrayType(stT)))))
    def gcDf(gname: String, aname: String) = spark.createDataFrame(
      java.util.Arrays.asList(perPart.flatMap { case (pv, _, byG) =>
        byG.map { case (g, arr) => Row(pv, g, cellRow(arr)) }
      }: _*),
      StructType(Seq(StructField("part", StringType),
        StructField(gname, IntegerType),
        StructField(aname, ArrayType(stT)))))
    def ancDots(embCol: org.apache.spark.sql.Column) =
      transform(col("anc"), st => dotFixed(embCol, st.getField("c_emb")))
    val withP1 = emb.join(broadcast(anchDf), "part")
      .withColumn("adots", ancDots(col("embedding")))
      .withColumn("p1",
        array_position(col("adots"), array_max(col("adots"))).cast(IntegerType))
    val withP2 =
      if (coarseProbes == 1) withP1.withColumn("p2", col("p1"))
      else withP1
        .withColumn("md", zip_with(col("adots"),
          sequence(lit(1), size(col("adots"))),
          (x, i) => when(i === col("p1"), lit(-1e18)).otherwise(x)))
        .withColumn("p2", array_position(col("md"), array_max(col("md"))).cast(IntegerType))
    val rowsG = withP2
      .select(col("part"), col("vec_id"), col("label"), col("embedding"),
        element_at(col("anc"), col("p1")).getField("c_id").as("g1"),
        element_at(col("anc"), col("p2")).getField("c_id").as("g2"))
    rowsG.join(broadcast(gcDf("g1", "gc1")), Seq("part", "g1"))
      .join(broadcast(gcDf("g2", "gc2")), Seq("part", "g2"))
      .withColumn("cand",
        when(col("g1") === col("g2"), col("gc1"))
          .otherwise(array_sort(concat(col("gc1"), col("gc2")))))
      .withColumn("dots",
        transform(col("cand"), st => dotFixed(col("embedding"), st.getField("c_emb"))))
      .withColumn("pos", array_position(col("dots"), array_max(col("dots"))).cast(IntegerType))
      .withColumn("list_id", element_at(col("cand"), col("pos")).getField("c_id"))
      .select(col("part"), col("vec_id"), col("label"), col("embedding"),
        col("list_id"))
  }

  /** PART-KEYED twin of [[assignListsHier]] — every partition's sub-
    * geometry assigns in ONE dataflow (r14: the per-pin driver loop's
    * replacement in the BY PARTITION serve paths). `emb` carries a
    * `part` column beside (vec_id, label, embedding); `cents` is the
    * sidecar shape (part, c_id, c_emb). Each row sees ONLY its own
    * partition's centroids — anchors, coarse cells and the fine argmax
    * are all derived per part, so the per-row result is cell-identical
    * to running [[assignListsHier]] once per partition slice (what the
    * serve-path hash contract depends on). The crossJoins of the flat
    * shape become broadcast equi-joins on `part`: the anchor table is
    * one row per partition and the cell map sums to the centroid
    * sidecar itself — both metadata-class at any partition count, and
    * the Spark-job count is zero (pure plan composition). */
  def assignListsHierByPart(emb: org.apache.spark.sql.DataFrame,
                            cents: org.apache.spark.sql.DataFrame,
                            coarseProbes: Int = 2): org.apache.spark.sql.DataFrame = {
    if (coarseProbes < 1 || coarseProbes > 2)
      throw new IllegalArgumentException(
        s"COARSE PROBES $coarseProbes — the two-level assigner probes 1 " +
          "or 2 coarse cells (more cells trades toward a flat assignment; " +
          "tune LISTS for finer geometry instead)")
    val anch = cents.groupBy("part")
      .agg(array_sort(collect_list(struct(col("c_id"), col("c_emb")))).as("all"))
      .select(col("part"), slice(col("all"), lit(1),
        ceil(sqrt(size(col("all")))).cast(IntegerType)).as("anc"))
    def ancDots(embCol: org.apache.spark.sql.Column) =
      transform(col("anc"), st => dotFixed(embCol, st.getField("c_emb")))
    val centsG = cents.join(broadcast(anch), "part")
      .withColumn("adots", ancDots(col("c_emb")))
      .withColumn("g",
        when(exists(col("anc"), st => st.getField("c_id") === col("c_id")),
          col("c_id"))
        .otherwise(element_at(col("anc"),
          array_position(col("adots"), array_max(col("adots"))).cast(IntegerType))
          .getField("c_id")))
      .select(col("part"), col("c_id"), col("c_emb"), col("g"))
    val byG = centsG.groupBy("part", "g")
      .agg(array_sort(collect_list(struct(col("c_id"), col("c_emb")))).as("gc"))
    val withP1 = emb.join(broadcast(anch), "part")
      .withColumn("adots", ancDots(col("embedding")))
      .withColumn("p1",
        array_position(col("adots"), array_max(col("adots"))).cast(IntegerType))
    val withP2 =
      if (coarseProbes == 1) withP1.withColumn("p2", col("p1"))
      else withP1
        .withColumn("md", zip_with(col("adots"),
          sequence(lit(1), size(col("adots"))),
          (x, i) => when(i === col("p1"), lit(-1e18)).otherwise(x)))
        .withColumn("p2", array_position(col("md"), array_max(col("md"))).cast(IntegerType))
    val rowsG = withP2
      .select(col("part"), col("vec_id"), col("label"), col("embedding"),
        element_at(col("anc"), col("p1")).getField("c_id").as("g1"),
        element_at(col("anc"), col("p2")).getField("c_id").as("g2"))
    val b1 = byG.select(col("part"), col("g").as("g1"), col("gc").as("gc1"))
    val b2 = byG.select(col("part"), col("g").as("g2"), col("gc").as("gc2"))
    rowsG.join(broadcast(b1), Seq("part", "g1"))
      .join(broadcast(b2), Seq("part", "g2"))
      .withColumn("cand",
        when(col("g1") === col("g2"), col("gc1"))
          .otherwise(array_sort(concat(col("gc1"), col("gc2")))))
      .withColumn("dots",
        transform(col("cand"), st => dotFixed(col("embedding"), st.getField("c_emb"))))
      .withColumn("pos", array_position(col("dots"), array_max(col("dots"))).cast(IntegerType))
      .withColumn("list_id", element_at(col("cand"), col("pos")).getField("c_id"))
      .select(col("part"), col("vec_id"), col("label"), col("embedding"),
        col("list_id"))
  }

  /** Top-2 list assignment: like [[assignLists]] but keeps BOTH the nearest
    * and the second-nearest centroid id — the standard multi-assignment
    * recall knob for blocked ANN (a vector near a list boundary is indexed
    * under both sides, so boundary-straddling neighbor pairs share at least
    * one list). Same shape: broadcast centroid array, per-row arithmetic,
    * zero shuffle. The runner-up is found by masking the argmax position
    * out of the dots array and taking the max again — first-position
    * tie-break both times, mirroring DuckDB `list_position`. */
  def assignLists2(emb: org.apache.spark.sql.DataFrame,
                   cents: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // localized panel — same rationale as [[assignLists]] (r15)
    val centArr = Clustering.localize(cents
      .agg(array_sort(collect_list(struct(col("c_id"), col("c_emb")))).as("cents")))
    emb.crossJoin(broadcast(centArr))
      .withColumn("dots",
        transform(col("cents"), st => dotFixed(col("embedding"), st.getField("c_emb"))))
      .withColumn("p1", array_position(col("dots"), array_max(col("dots"))).cast(IntegerType))
      .withColumn("dots2", zip_with(col("dots"),
        sequence(lit(1), size(col("dots"))),
        (x, i) => when(i === col("p1"), lit(-1e18)).otherwise(x)))
      .withColumn("p2", array_position(col("dots2"), array_max(col("dots2"))).cast(IntegerType))
      .select(col("vec_id"), col("embedding"),
        element_at(col("cents"), col("p1")).getField("c_id").as("l1"),
        element_at(col("cents"), col("p2")).getField("c_id").as("l2"))
  }

  /** Exact brute-force cosine top-k vs probe vec_id=0 (B14a body — shared
    * with the recall audit). */
  private def exactTopkDf(s: org.apache.spark.sql.SparkSession, d: String) = {
    val emb = Tables(s, d, "embeddings")
    val probe = emb.filter(col("vec_id") === 0).select(col("embedding").as("pv"))
    emb.crossJoin(broadcast(probe))
      .select(col("vec_id"), col("label"),
        dotFixed(col("embedding"), col("pv")).as("sim"))
      .orderBy(desc("sim"), col("vec_id"))
      .limit(TopK)
  }

  /** IVF search with one k-means refinement (B14b body — shared with the
    * recall audit). */
  private def ivfTopkDf(s: org.apache.spark.sql.SparkSession, d: String) = {
    val emb = Tables(s, d, "embeddings")
    val seed = emb.filter(col("vec_id") < NumLists)
      .select(col("vec_id").cast(IntegerType).as("c_id"), col("embedding").as("c_emb"))
    val assigned0 = assignLists(emb, seed)
    val refined = labelCentroids(assigned0, col("list_id"))
      .select(col("list_id").cast(IntegerType).as("c_id"),
        transform(col("centroid"), _.cast(FloatType)).as("c_emb"))
    val assigned1 = assignLists(emb, refined)
    val probe = assigned1.filter(col("vec_id") === 0)
      .select(col("embedding").as("pv"), col("list_id").as("p_list"))
    assigned1.join(broadcast(probe), col("list_id") === col("p_list"))
      .select(col("vec_id"), col("label"), col("list_id"),
        dotFixed(col("embedding"), col("pv")).as("sim"))
      .orderBy(desc("sim"), col("vec_id"))
      .limit(TopK)
  }

  def queries: Map[String, Q] = Map(
    // B14a — exact brute-force cosine top-k vs probe vec_id=0.
    "q_similarity_topk" -> (exactTopkDf _),

    // ANN QUALITY AUDIT through the correctness gate: recall@10 of the IVF
    // search vs the exact top-k, as a 1-row metric both engines must agree
    // on cell-exactly. This is the number a production ANN deployment
    // monitors; keeping it a declared query means a regression in the
    // bucketing/refinement logic fails the oracle, not just a unit test.
    "q_similarity_recall" -> ((s, d) => {
      val overlap = exactTopkDf(s, d).select(col("vec_id"))
        .join(ivfTopkDf(s, d).select(col("vec_id")), "vec_id")
      overlap.agg(
        count(lit(1)).cast(IntegerType).as("n_overlap"),
        (count(lit(1)).cast(DoubleType) / TopK).as("recall_at_10"))
    }),

    // FILTERED VECTOR SEARCH — ANN under a metadata predicate (the
    // retrieval shape every RAG deployment actually serves: "nearest
    // docs WHERE label ∈ …"). The predicate composes BEFORE the
    // candidate join — it lands on the scan side of the list equi-join,
    // so the search costs O(matching rows in the probed list), never a
    // post-filter of an unfiltered top-k (which silently returns < k
    // when the filter is selective — the classic filtered-ANN bug).
    // Same broadcast-centroid assignment as the IVF tier; the ORACLE
    // mirrors assignment + filter + probe join exactly, so a wrong
    // pre/post-filter order changes the returned set and hash-fails.
    "q_similarity_filtered" -> ((s, d) => {
      val emb = Tables(s, d, "embeddings")
      val seed = emb.filter(col("vec_id") < NumLists)
        .select(col("vec_id").cast(IntegerType).as("c_id"),
          col("embedding").as("c_emb"))
      val assigned = assignLists(emb, seed)
      val probe = assigned.filter(col("vec_id") === 0)
        .select(col("embedding").as("pv"), col("list_id").as("p_list"))
      assigned.filter(col("label").isin(2, 5, 7)) // the metadata predicate
        .join(broadcast(probe), col("list_id") === col("p_list"))
        .select(col("vec_id"), col("label"),
          dotFixed(col("embedding"), col("pv")).as("sim"))
        .orderBy(desc("sim"), col("vec_id")).limit(TopK)
    }),

    // HYBRID RETRIEVAL — reciprocal-rank fusion of the lexical (BM25,
    // Text.bm25PerDoc) and dense (fixed-point cosine vs probe vec_id=0)
    // rankers: rrf = Σ 1/(60 + rank) over the rankers that surfaced the
    // id in their top-50 (the Cormack/Clarke RRF constant). The fusion a
    // RAG stack actually serves. Scale shape: each side reduces to a
    // bounded top-50 FIRST (TakeOrdered — no global sort survives), ranks
    // assign inside the 50-row candidate set (a deliberate tiny global
    // window), and the fusion is a 50×50 full-outer join. The RRF doubles
    // are two exact unit fractions added once — engine-portable, so the
    // whole fused ranking sits under the oracle gate.
    "q_search_hybrid" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val K = 50
      val bmW = Window.orderBy(desc("score_fx"), col("doc_id"))
      val bm = graft.llm.Text.bm25PerDoc(s, d)
        .orderBy(desc("score_fx"), col("doc_id")).limit(K)
        .withColumn("r_bm25", row_number().over(bmW).cast(IntegerType))
        .select(col("doc_id").as("id"), col("r_bm25"))
      val emb = Tables(s, d, "embeddings")
      val probe = emb.filter(col("vec_id") === 0).select(col("embedding").as("pv"))
      val cosW = Window.orderBy(desc("sim"), col("vec_id"))
      val cos = emb.crossJoin(broadcast(probe))
        .select(col("vec_id"), dotFixed(col("embedding"), col("pv")).as("sim"))
        .orderBy(desc("sim"), col("vec_id")).limit(K)
        .withColumn("r_cos", row_number().over(cosW).cast(IntegerType))
        .select(col("vec_id").as("id"), col("r_cos"))
      bm.join(cos, Seq("id"), "full_outer")
        .withColumn("rrf",
          coalesce(lit(1.0) / (lit(60) + col("r_bm25")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + col("r_cos")), lit(0.0)))
        .orderBy(desc("rrf"), col("id")).limit(10)
        .select(col("id"), col("r_bm25"), col("r_cos"), col("rrf"))
    }),

    // Centroid computation per label — the custom-AGGREGATE tier: one
    // fixed-point vector-sum aggregate per group (partial+final merge of a
    // 64-long buffer) instead of exploding to (row × dim) before the
    // shuffle. This is the accumulation step IVF/k-means training runs at
    // scale; exactness of the fixed-point sums makes it oracle-checkable.
    // The declared output is scalar-only (sampled dimensions + a fixed-point
    // checksum over all 64): the driver's pandas comparator cannot sort
    // frames with raw array cells (round-2 ERR). The full array form is
    // [[labelCentroids]], golden-tested in SimilaritySpec.
    "q_similarity_centroids" -> ((s, d) =>
      labelCentroids(Tables(s, d, "embeddings"), col("label"))
        .select(col("label"), col("n_vecs"),
          element_at(col("centroid"), 1).as("c1"),
          element_at(col("centroid"), 16).as("c16"),
          element_at(col("centroid"), 32).as("c32"),
          element_at(col("centroid"), 48).as("c48"),
          element_at(col("centroid"), 64).as("c64"),
          aggregate(col("centroid"), lit(0L),
            (acc, x) => acc + floor(x * lit(1e6))).as("cchk"))
        .orderBy("label")),

    // B14b — IVF-bucketed ANN with one k-means refinement iteration:
    //  1. seed 8 lists from anchor vectors (vec_id < 8);
    //  2. assign every vector to its max-dot anchor (broadcast, per-row);
    //  3. RETRAIN: per-list mean via the fixed-point VectorSumFixed
    //     aggregate ([[labelCentroids]] — never an explode to row × dim),
    //     narrowed to float (IEEE round-to-nearest, identical both engines);
    //  4. reassign every vector to its max-dot refined centroid;
    //  5. the probe searches ONLY its own refined list.
    // This is the honest IVF training/search loop at 100 TB scale: steps
    // 2/4 are per-row math against broadcast centroids (no shuffle), step 3
    // is one partial+final aggregate over k×64 longs.
    "q_similarity_ivf" -> (ivfTopkDf _),

    // RANDOM PROJECTION (Johnson-Lindenstrauss, ±1 variant): 64 dims → 16
    // via a deterministic sign matrix derived from a hash of (dim, proj) —
    // no projection matrix to ship, any executor regenerates signs locally.
    // This is the cheap dimensionality-reduction step before clustering /
    // approximate distances at 100 TB: pure per-row arithmetic in the scan
    // (zero shuffle), fixed-point 1e9 accumulation so both engines agree
    // bit-exactly. Declared output: sampled projections + a checksum over
    // all 16 (driver comparator takes no arrays).
    // Projections come from the codegen'd RandomProjectSigns expression —
    // one fused primitive loop per row (sign(i, j) = +1 iff bit 5 of the
    // mixed key is 0: parity of a product of odd multipliers is structured;
    // a divided bit is not). The interpreted HOF twin lives in
    // ExpressionsSpec as the cross-check.
    "q_embed_project" -> ((s, d) =>
      Tables(s, d, "embeddings")
        .select(col("vec_id"), col("label"),
          graft.functions.RandomProjectSigns.project(col("embedding"), 16).as("p"))
        .select(col("vec_id"), col("label"),
          element_at(col("p"), 1).as("p0"), element_at(col("p"), 6).as("p5"),
          element_at(col("p"), 11).as("p10"), element_at(col("p"), 16).as("p15"),
          aggregate(col("p"), lit(0L), _ + _).as("pchk"))
        .orderBy("vec_id")),

    // k-NN GRAPH construction (the structure behind diversity sampling,
    // semantic dedup and graph-based curation): for EVERY vector, its k
    // nearest neighbors within its IVF list. Never all-pairs: candidates
    // are blocked on the IVF list id from [[assignLists]] (round-4 verdict
    // finding #3 — the previous `label` block key is an accident of the
    // testdata; list ids are data-derived, geometry-aware, and their count
    // parameterizes with corpus size like every IVF deployment). The
    // candidate join is an equi-join on list_id, the per-source ranking is
    // a window over ONE hash partitioning on src — candidate volume is
    // Σ_l |list_l|², bounded by the list granularity, not n². Multi-list
    // assignment (q_similarity_multiprobe's probe pattern) is the recall
    // knob for neighbors straddling a list boundary.
    "q_knn_graph" -> ((s, d) => {
      // fanned out (r15): the one-row-group test layout plans the whole
      // candidate join + partial top-k on ONE task otherwise
      val emb = Clustering.fanOut(Tables(s, d, "embeddings"))
      val seed = emb.filter(col("vec_id") < graphLists(emb.count()))
        .select(col("vec_id").cast(IntegerType).as("c_id"), col("embedding").as("c_emb"))
      val assigned = assignLists(emb, seed)
      val x = assigned.select(col("list_id"), col("vec_id").as("src"), col("embedding").as("e_src"))
      val y = assigned.select(col("list_id"), col("vec_id").as("dst"), col("embedding").as("e_dst"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("src").orderBy(desc("sim"), col("dst"))
      x.join(y, Seq("list_id")).filter(col("src") =!= col("dst"))
        .select(col("list_id"), col("src"), col("dst"),
          dotFixed(col("e_src"), col("e_dst")).as("sim"))
        .withColumn("rank", row_number().over(w).cast(IntegerType))
        .filter(col("rank") <= KnnK)
        .select("list_id", "src", "dst", "rank", "sim")
        .orderBy("src", "rank")
    }),

    // k-NN graph with MULTI-LIST candidates — the recall knob the
    // single-list form documents: every vector is indexed under its two
    // nearest lists ([[assignLists2]]), sources search their own nearest
    // list, so a neighbor pair straddling a list boundary still shares a
    // list whenever either side's runner-up list is the other's home. The
    // join stays an equi-join on list_id (candidate volume ≤ 2× the
    // single-list form — same Σ|list|² scaling, a constant-factor recall/
    // cost trade every production multi-assignment index makes). A dst's
    // two lists are distinct, so (src, dst) candidates stay unique without
    // a distinct.
    "q_knn_graph_xlist" -> ((s, d) => {
      val emb = Clustering.fanOut(Tables(s, d, "embeddings"))
      val seed = emb.filter(col("vec_id") < graphLists(emb.count()))
        .select(col("vec_id").cast(IntegerType).as("c_id"), col("embedding").as("c_emb"))
      val a2 = assignLists2(emb, seed)
      val x = a2.select(col("l1").as("list_id"), col("vec_id").as("src"),
        col("embedding").as("e_src"))
      // array_distinct: with a single centroid the masked runner-up falls
      // back to the argmax (l1 == l2) — without the dedup that degenerate
      // case would index a dst twice under one list and rank it at two
      // consecutive positions
      val y = a2.select(col("vec_id").as("dst"), col("embedding").as("e_dst"),
        explode(array_distinct(array(col("l1"), col("l2")))).as("list_id"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("src").orderBy(desc("sim"), col("dst"))
      x.join(y, Seq("list_id")).filter(col("src") =!= col("dst"))
        .select(col("src"), col("dst"), dotFixed(col("e_src"), col("e_dst")).as("sim"))
        .withColumn("rank", row_number().over(w).cast(IntegerType))
        .filter(col("rank") <= KnnK)
        .select("src", "dst", "rank", "sim")
        .orderBy("src", "rank")
    }),

    // B14d — int8 symmetric quantization of the embedding column: the
    // compression step every 100 TB vector store runs before indexing
    // (4× memory cut vs float32, SIMD-friendly integer dot products).
    // Per vector: scale = 127 / max|x_i|, code_i = floor(x_i·scale + 0.5)
    // (round-half-up — portable, unlike banker's rounding), plus the max
    // reconstruction error |code_i/scale − x_i| as a fixed-point scalar.
    // Pure per-row projection — no shuffle, stays in whole-stage codegen;
    // the declared output is scalar-only (sampled codes + checksums) per
    // the driver comparator's no-array rule.
    "q_embed_quantize" -> ((s, d) => {
      val x = col("embedding")
      val amax = array_max(transform(x, v => abs(v.cast(DoubleType))))
      val scale = lit(127.0) / amax
      val codes = transform(x, v => floor(v.cast(DoubleType) * scale + lit(0.5)).cast(IntegerType))
      val err = array_max(zip_with(codes, x,
        (c, v) => abs(c.cast(DoubleType) / scale - v.cast(DoubleType))))
      Tables(s, d, "embeddings")
        .select(col("vec_id"), col("label"),
          floor(amax * lit(1e9)).cast(LongType).as("amax_fp"),
          element_at(codes, 1).as("c1"),
          element_at(codes, 32).as("c32"),
          element_at(codes, 64).as("c64"),
          array_min(codes).as("qmin"),
          array_max(codes).as("qmax"),
          aggregate(codes, lit(0L), (a, c) => a + c.cast(LongType)).as("qsum"),
          floor(err * lit(1e9)).cast(LongType).as("err_fp"))
        .orderBy("vec_id")
    }),

    // B14e — PRODUCT QUANTIZATION: the compression side of the standard
    // 100 TB ANN architecture (IVF-PQ). The 64-dim vector is cut into 8
    // 8-dim subspaces; each block is replaced by the id of its nearest
    // codebook centroid (min L2, first-id tie-break) — 64 floats become 8
    // small codes. Distances to a probe are then approximated
    // asymmetrically (ADC): Σ_b dot(probe_b, centroid[code_b]_b), i.e.
    // table lookups instead of full-vector arithmetic. Codebooks are the
    // anchor rows' sub-vectors (broadcast; the k-means refinement loop is
    // q_similarity_ivf's — composable here the same way). Everything is
    // per-row math against broadcast codebooks — zero shuffle — and L2² is
    // assembled from fixed-point dots ((x·x − 2·x·c) + c·c, identical op
    // order both engines) so codes AND ADC scores are cell-exact.
    "q_embed_pq" -> ((s, d) => {
      val emb = Tables(s, d, "embeddings")
      val anchors = emb.filter(col("vec_id") < PqK)
        .agg(array_sort(collect_list(struct(
          col("vec_id").cast(IntegerType).as("c_id"),
          col("embedding").as("c_emb")))).as("cents"))
      val probe = emb.filter(col("vec_id") === 0).select(col("embedding").as("pv"))
      val base = emb.crossJoin(broadcast(anchors)).crossJoin(broadcast(probe))
      val withCodes = (0 until PqM).foldLeft(base) { (df, b) =>
        df.withColumn(s"code$b", pqCode(col("cents"), col("embedding"), b))
      }
      val adc = pqAdc(col("cents"), col("pv"), b => col(s"code$b"))
      withCodes.select(
        col("vec_id") +: col("label") +:
          (0 until PqM).map(b => col(s"code$b")) :+
          adc.as("sim_adc") :+
          dotFixed(col("embedding"), col("pv")).as("sim_exact"): _*)
        .orderBy("vec_id")
    }),

    // B14c — MULTI-probe top-k (batch ANN serving: k neighbors for EVERY
    // probe in a set, one pass). Naive plan: explode facts × probes, then
    // one window per probe_id — but with few probes that shuffles the whole
    // exploded fact table into |probes| partitions: a guaranteed straggler
    // at scale. Instead, two-phase top-k:
    //   phase 1 — salted local top-k: group by (probe, salt) where
    //     salt = vec_id mod 32, keep each bucket's k best via a bounded
    //     sorted-slice (collect per bucket is bounded by the salt fanout);
    //   phase 2 — exact top-k per probe over the ≤ salt×k survivors.
    // Lossless (any global top-k row is top-k in its bucket), and the heavy
    // shuffle is keyed by (probe, salt) — 32× the parallelism.
    "q_similarity_multiprobe" -> ((s, d) => {
      val emb = Tables(s, d, "embeddings")
      val probes = emb.filter(col("vec_id") < NumProbes)
        .agg(array_sort(collect_list(
          struct(col("vec_id").as("p_id"), col("embedding").as("p_emb")))).as("ps"))
      val scored = emb.crossJoin(broadcast(probes))
        .select(col("vec_id"), col("label"), col("embedding"), explode(col("ps")).as("p"))
        .filter(col("vec_id") =!= col("p.p_id"))
        .select(col("p.p_id").as("probe_id"), col("vec_id"), col("label"),
          dotFixed(col("embedding"), col("p.p_emb")).as("sim"))
      val local = scored
        .withColumn("salt", pmod(col("vec_id"), lit(ProbeSalt)))
        .groupBy("probe_id", "salt")
        .agg(slice(array_sort(collect_list(
          struct((-col("sim")).as("neg"), col("vec_id"), col("label"), col("sim")))),
          1, TopPerProbe).as("top"))
        .select(col("probe_id"), explode(col("top")).as("t"))
        .select(col("probe_id"), col("t.vec_id").as("vec_id"),
          col("t.label").as("label"), col("t.sim").as("sim"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("probe_id").orderBy(desc("sim"), col("vec_id"))
      local.withColumn("rank", row_number().over(w).cast(IntegerType))
        .filter(col("rank") <= TopPerProbe)
        .select("probe_id", "rank", "vec_id", "label", "sim")
        .orderBy("probe_id", "rank")
    })
  )

  private lazy val sqlExactTopk =
    s"""WITH probe AS (SELECT embedding AS pv FROM embeddings WHERE vec_id = 0)
       |SELECT vec_id, label, ${sqlDotFixed("embedding", "pv")} AS sim
       |FROM embeddings, probe
       |ORDER BY sim DESC, vec_id LIMIT $TopK""".stripMargin

  private lazy val sqlIvfTopk =
    s"""WITH seed AS (
       |  SELECT list(CAST(vec_id AS INTEGER) ORDER BY vec_id) AS ids,
       |         list(embedding ORDER BY vec_id) AS cl
       |  FROM embeddings WHERE vec_id < $NumLists),
       |a0 AS (
       |  SELECT e.vec_id, e.embedding, s.ids[list_position(dots, list_max(dots))] AS list_id
       |  FROM (
       |    SELECT e0.vec_id, e0.embedding,
       |      [${sqlDotFixed("e0.embedding", "s0.cl[i]")} for i in range(1, len(s0.cl) + 1)] AS dots
       |    FROM embeddings e0, seed s0) e, seed s),
       |u AS (
       |  SELECT list_id, i, CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000000000) AS BIGINT) AS v
       |  FROM a0, (SELECT unnest(range(1, 65)) AS i) r),
       |sv AS (SELECT list_id, i, CAST(SUM(v) AS BIGINT) AS s FROM u GROUP BY list_id, i),
       |n AS (SELECT list_id, COUNT(*) AS nv FROM a0 GROUP BY list_id),
       |cent1 AS (
       |  SELECT sv.list_id,
       |    list(CAST((CAST(s AS DOUBLE) / 1000000000000) / nv AS FLOAT) ORDER BY i) AS c
       |  FROM sv JOIN n ON sv.list_id = n.list_id GROUP BY sv.list_id, n.nv),
       |refined AS (
       |  SELECT list(list_id ORDER BY list_id) AS ids, list(c ORDER BY list_id) AS cl FROM cent1),
       |a1 AS (
       |  SELECT e.vec_id, e.label, e.embedding, r.ids[list_position(dots, list_max(dots))] AS list_id
       |  FROM (
       |    SELECT e0.vec_id, e0.label, e0.embedding,
       |      [${sqlDotFixed("e0.embedding", "r0.cl[ci]")} for ci in range(1, len(r0.cl) + 1)] AS dots
       |    FROM embeddings e0, refined r0) e, refined r),
       |probe AS (SELECT embedding AS pv, list_id AS p_list FROM a1 WHERE vec_id = 0)
       |SELECT a.vec_id, a.label, a.list_id, ${sqlDotFixed("a.embedding", "p.pv")} AS sim
       |FROM a1 a JOIN probe p ON a.list_id = p.p_list
       |ORDER BY sim DESC, a.vec_id LIMIT $TopK""".stripMargin

  def oracles: Map[String, String] = Map(
    "q_similarity_topk" -> sqlExactTopk,
    // Filtered ANN: seed assignment + metadata filter + probe-list join,
    // mirrored exactly — filter BEFORE the candidate join.
    "q_similarity_filtered" ->
      s"""WITH seed AS (
         |  SELECT list(CAST(vec_id AS INTEGER) ORDER BY vec_id) AS ids,
         |         list(embedding ORDER BY vec_id) AS cl
         |  FROM embeddings WHERE vec_id < $NumLists),
         |a0 AS (
         |  SELECT e.vec_id, e.label, e.embedding,
         |         s.ids[list_position(dots, list_max(dots))] AS list_id
         |  FROM (
         |    SELECT e0.vec_id, e0.label, e0.embedding,
         |      [${sqlDotFixed("e0.embedding", "s0.cl[i]")} for i in range(1, len(s0.cl) + 1)] AS dots
         |    FROM embeddings e0, seed s0) e, seed s),
         |probe AS (SELECT embedding AS pv, list_id AS p_list FROM a0 WHERE vec_id = 0)
         |SELECT a.vec_id, a.label, ${sqlDotFixed("a.embedding", "p.pv")} AS sim
         |FROM a0 a JOIN probe p ON a.list_id = p.p_list
         |WHERE a.label IN (2, 5, 7)
         |ORDER BY sim DESC, a.vec_id LIMIT $TopK""".stripMargin,
    // Hybrid fusion: both top-50 candidate sets independently mirrored,
    // fused with the same two unit fractions.
    "q_search_hybrid" ->
      s"""WITH bm AS (
         |  SELECT doc_id AS id,
         |    CAST(row_number() OVER (ORDER BY score_fx DESC, doc_id) AS INTEGER) AS r_bm25
         |  FROM (SELECT * FROM (${graft.llm.Text.sqlBm25PerDoc}) pd
         |        ORDER BY score_fx DESC, doc_id LIMIT 50)),
         |probe AS (SELECT embedding AS pv FROM embeddings WHERE vec_id = 0),
         |cosr AS (
         |  SELECT vec_id AS id,
         |    CAST(row_number() OVER (ORDER BY sim DESC, vec_id) AS INTEGER) AS r_cos
         |  FROM (SELECT vec_id, ${sqlDotFixed("embedding", "pv")} AS sim
         |        FROM embeddings, probe
         |        ORDER BY sim DESC, vec_id LIMIT 50))
         |SELECT COALESCE(bm.id, cosr.id) AS id, r_bm25, r_cos,
         |  COALESCE(CAST(1.0 AS DOUBLE) / (60 + r_bm25), CAST(0.0 AS DOUBLE)) +
         |  COALESCE(CAST(1.0 AS DOUBLE) / (60 + r_cos), CAST(0.0 AS DOUBLE)) AS rrf
         |FROM bm FULL OUTER JOIN cosr ON bm.id = cosr.id
         |ORDER BY rrf DESC, id LIMIT 10""".stripMargin,
    "q_embed_project" ->
      """WITH pr AS (
        |  SELECT vec_id, label,
        |    [list_sum([
        |       (CASE WHEN ((i * 2654435761 + j * 40503) >> 5) & 1 = 0
        |             THEN 1 ELSE -1 END)
        |       * CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000000) AS BIGINT)
        |     for i in range(1, 65)]) for j in range(0, 16)] AS p
        |  FROM embeddings)
        |SELECT vec_id, label,
        |  CAST(p[1] AS BIGINT) AS p0, CAST(p[6] AS BIGINT) AS p5,
        |  CAST(p[11] AS BIGINT) AS p10, CAST(p[16] AS BIGINT) AS p15,
        |  CAST(list_sum(p) AS BIGINT) AS pchk
        |FROM pr ORDER BY vec_id""".stripMargin,
    // Recall audit: overlap of the two (independently mirrored) top-k sets.
    "q_similarity_recall" ->
      s"""SELECT CAST(COUNT(*) AS INTEGER) AS n_overlap,
         |       CAST(COUNT(*) AS DOUBLE) / $TopK AS recall_at_10
         |FROM ($sqlExactTopk) e JOIN ($sqlIvfTopk) i USING (vec_id)""".stripMargin,
    "q_similarity_centroids" ->
      """WITH u AS (
        |  SELECT label, i, CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000000000) AS BIGINT) AS v
        |  FROM embeddings, (SELECT unnest(range(1, 65)) AS i) r),
        |s AS (SELECT label, i, CAST(SUM(v) AS BIGINT) AS sv FROM u GROUP BY label, i),
        |n AS (SELECT label, COUNT(*) AS n_vecs FROM embeddings GROUP BY label),
        |cent AS (
        |  SELECT s.label, n.n_vecs,
        |    list((CAST(sv AS DOUBLE) / 1000000000000) / n.n_vecs ORDER BY i) AS centroid
        |  FROM s JOIN n ON s.label = n.label
        |  GROUP BY s.label, n.n_vecs)
        |SELECT label, n_vecs,
        |  centroid[1] AS c1, centroid[16] AS c16, centroid[32] AS c32,
        |  centroid[48] AS c48, centroid[64] AS c64,
        |  CAST(list_sum([CAST(floor(x * 1000000) AS BIGINT) for x in centroid]) AS BIGINT) AS cchk
        |FROM cent ORDER BY label""".stripMargin,
    // Full mirror of the refine-then-search loop: seed assign → per-list
    // fixed-point mean (float-narrowed) → reassign → probe-list search.
    "q_similarity_ivf" -> sqlIvfTopk,
    // Within-list brute force + ranked window over the SAME seed IVF
    // assignment the Spark plan blocks on (the a0 CTE of sqlIvfTopk).
    "q_knn_graph" ->
      s"""WITH seed AS (
         |  SELECT list(CAST(vec_id AS INTEGER) ORDER BY vec_id) AS ids,
         |         list(embedding ORDER BY vec_id) AS cl
         |  FROM embeddings
         |  WHERE vec_id < (SELECT greatest(8, count(*) // 64) FROM embeddings)),
         |a0 AS (
         |  SELECT e.vec_id, e.embedding, s.ids[list_position(dots, list_max(dots))] AS list_id
         |  FROM (
         |    SELECT e0.vec_id, e0.embedding,
         |      [${sqlDotFixed("e0.embedding", "s0.cl[i]")} for i in range(1, len(s0.cl) + 1)] AS dots
         |    FROM embeddings e0, seed s0) e, seed s)
         |SELECT list_id, src, dst, rank, sim FROM (
         |  SELECT x.list_id, x.vec_id AS src, y.vec_id AS dst,
         |    CAST(row_number() OVER (
         |      PARTITION BY x.vec_id
         |      ORDER BY ${sqlDotFixed("x.embedding", "y.embedding")} DESC, y.vec_id)
         |      AS INTEGER) AS rank,
         |    ${sqlDotFixed("x.embedding", "y.embedding")} AS sim
         |  FROM a0 x JOIN a0 y
         |    ON x.list_id = y.list_id AND x.vec_id <> y.vec_id) t
         |WHERE rank <= $KnnK
         |ORDER BY src, rank""".stripMargin,
    // Same top-2 assignment (first-position tie-break at both argmax
    // steps), dst exploded under both lists, per-src ranked window.
    "q_knn_graph_xlist" ->
      s"""WITH seed AS (
         |  SELECT list(CAST(vec_id AS INTEGER) ORDER BY vec_id) AS ids,
         |         list(embedding ORDER BY vec_id) AS cl
         |  FROM embeddings
         |  WHERE vec_id < (SELECT greatest(8, count(*) // 64) FROM embeddings)),
         |sc AS (
         |  SELECT e0.vec_id, e0.embedding,
         |    [${sqlDotFixed("e0.embedding", "s0.cl[i]")} for i in range(1, len(s0.cl) + 1)] AS dots
         |  FROM embeddings e0, seed s0),
         |p1t AS (
         |  SELECT vec_id, embedding, dots,
         |         list_position(dots, list_max(dots)) AS p1
         |  FROM sc),
         |p2t AS (
         |  SELECT vec_id, embedding, p1,
         |    list_position(
         |      [CASE WHEN i = p1 THEN -1e18 ELSE dots[i] END for i in range(1, len(dots) + 1)],
         |      list_max(
         |      [CASE WHEN i = p1 THEN -1e18 ELSE dots[i] END for i in range(1, len(dots) + 1)]))
         |      AS p2
         |  FROM p1t),
         |a2 AS (
         |  SELECT t.vec_id, t.embedding, s.ids[t.p1] AS l1, s.ids[t.p2] AS l2
         |  FROM p2t t, seed s),
         |dsts AS (
         |  SELECT vec_id, embedding, l1 AS list_id FROM a2
         |  UNION SELECT vec_id, embedding, l2 FROM a2)
         |SELECT src, dst, rank, sim FROM (
         |  SELECT x.vec_id AS src, y.vec_id AS dst,
         |    CAST(row_number() OVER (
         |      PARTITION BY x.vec_id
         |      ORDER BY ${sqlDotFixed("x.embedding", "y.embedding")} DESC, y.vec_id)
         |      AS INTEGER) AS rank,
         |    ${sqlDotFixed("x.embedding", "y.embedding")} AS sim
         |  FROM a2 x JOIN dsts y
         |    ON x.l1 = y.list_id AND x.vec_id <> y.vec_id) t
         |WHERE rank <= $KnnK
         |ORDER BY src, rank""".stripMargin,
    // Mirrors the Spark block loops: same codebook (anchor sub-vectors,
    // c_id order), same (x·x − 2·x·c) + c·c assembly, same left-assoc ADC
    // sum — every double op in identical order.
    "q_embed_pq" -> {
      def blk(e: String, b: Int) = s"$e[${b * PqDim + 1} : ${(b + 1) * PqDim}]"
      def d2s(b: Int) = {
        val xb = blk("e.embedding", b); val cb = blk("c.cl[pq_ci]", b)
        s"[(${sqlDotFixed(xb, xb)} - 2 * ${sqlDotFixed(xb, cb)}) + ${sqlDotFixed(cb, cb)} " +
          s"for pq_ci in range(1, ${PqK + 1})]"
      }
      val codeCols = (0 until PqM).map(b =>
        s"CAST(list_position(${d2s(b)}, list_min(${d2s(b)})) - 1 AS INTEGER) AS code$b")
        .mkString(",\n|    ")
      val adc = (0 until PqM).map(b =>
        sqlDotFixed(blk("p.pv", b), blk(s"c.cl[k.code$b + 1]", b)))
        .mkString(" + ")
      s"""WITH c AS (
         |  SELECT list(embedding ORDER BY vec_id) AS cl
         |  FROM embeddings WHERE vec_id < $PqK),
         |p AS (SELECT embedding AS pv FROM embeddings WHERE vec_id = 0),
         |k AS (
         |  SELECT e.vec_id, e.label, e.embedding,
         |    $codeCols
         |  FROM embeddings e, c)
         |SELECT k.vec_id, k.label,
         |  ${(0 until PqM).map(b => s"k.code$b").mkString(", ")},
         |  $adc AS sim_adc,
         |  ${sqlDotFixed("k.embedding", "p.pv")} AS sim_exact
         |FROM k, c, p ORDER BY k.vec_id""".stripMargin
    },
    // Same per-row arithmetic sequence (IEEE doubles both engines).
    "q_embed_quantize" ->
      """WITH q AS (
        |  SELECT vec_id, label, embedding,
        |    127.0 / list_max([abs(CAST(x AS DOUBLE)) for x in embedding]) AS scale,
        |    list_max([abs(CAST(x AS DOUBLE)) for x in embedding]) AS amax
        |  FROM embeddings),
        |c AS (
        |  SELECT vec_id, label, scale, amax, embedding,
        |    [CAST(floor(CAST(x AS DOUBLE) * scale + 0.5) AS INTEGER) for x in embedding] AS codes
        |  FROM q)
        |SELECT vec_id, label,
        |  CAST(floor(amax * 1000000000) AS BIGINT) AS amax_fp,
        |  codes[1] AS c1, codes[32] AS c32, codes[64] AS c64,
        |  list_min(codes) AS qmin, list_max(codes) AS qmax,
        |  CAST(list_sum(codes) AS BIGINT) AS qsum,
        |  CAST(floor(list_max([abs(CAST(z[1] AS DOUBLE) / scale - CAST(z[2] AS DOUBLE)) for z in list_zip(codes, embedding)]) * 1000000000) AS BIGINT) AS err_fp
        |FROM c ORDER BY vec_id""".stripMargin,
    // Deliberately the BRUTE-FORCE per-probe ranking: hash-matching it
    // certifies the salted two-phase plan is lossless.
    "q_similarity_multiprobe" ->
      s"""WITH probes AS (
         |  SELECT vec_id AS p_id, embedding AS p_emb FROM embeddings WHERE vec_id < $NumProbes),
         |scored AS (
         |  SELECT p.p_id AS probe_id, e.vec_id, e.label,
         |    ${sqlDotFixed("e.embedding", "p.p_emb")} AS sim
         |  FROM embeddings e, probes p WHERE e.vec_id <> p.p_id),
         |ranked AS (
         |  SELECT *, CAST(row_number() OVER (
         |    PARTITION BY probe_id ORDER BY sim DESC, vec_id) AS INTEGER) AS rank
         |  FROM scored)
         |SELECT probe_id, rank, vec_id, label, sim FROM ranked
         |WHERE rank <= $TopPerProbe ORDER BY probe_id, rank""".stripMargin
  )
}
