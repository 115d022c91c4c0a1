package graft.sources

import java.nio.file.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType}

/** FILE-LEVEL IVF VECTOR INDEX over a managed table's `array<float>`
  * column — ANN with file skipping, the embedding twin of [[TextIndex]]:
  * the corpus is k-means-clustered once at build time, and a probe search
  * plans ONLY the files containing its cluster's members.
  *
  * The index stores two parquet sidecars under `_vecidx_<id>/` inside the
  * table directory:
  *  - `cents/` — the trained centroids `(c_id, c_emb)` (k×dim floats;
  *    plus a `part` column for BY PARTITION sub-indexes);
  *  - `posts/` — the list→file posting `(list_id, file)`: which files
  *    hold at least one vector of each cluster.
  * published by a props-only commit `vecidx.<col>` ([[Prop]]: index dir,
  * anchor column, SHA-256 digest over the indexed file names — the
  * [[TextIndex]] freshness contract — the assignment-algorithm version,
  * and the build's LISTS/SAMPLE/COARSE-PROBES/BY-PARTITION policy, so
  * serving always re-derives exactly as the build did).
  *
  * SEARCH SEMANTICS ARE EXACT IVF, file pruning is only I/O: a probe
  * assigns to its nearest stored centroid, candidate files come from the
  * posting list, and the scan re-derives each row's cluster from the SAME
  * broadcast centroids before filtering to the probe's list — so the
  * result equals the IVF query computed without any index (and the DuckDB
  * oracle replays it from the raw data). A stale index (file set changed)
  * RETRAINS on the fly from the declared anchor column — same output as a
  * fresh rebuild, no pruning — so correctness never depends on rebuild
  * discipline. Deletion vectors change no file names: the posting just
  * over-approximates and the scan-side filter is exact either way.
  *
  * Anchors are declared DDL-side (`CREATE VECTOR INDEX ON t (col)
  * ANCHORS (idCol)`): the k lowest idCol rows seed the one-refinement
  * Lloyd loop ([[graft.llm.Clustering.kmeansAssign]]), k corpus-derived
  * (n/64 capped at ⌈√n⌉, floor 8 — [[graft.llm.Clustering.kFor]]); row
  * assignment is the two-level coarse-quantizer join
  * ([[graft.llm.Similarity.assignListsHier]]), so build work is O(n·√k)
  * per Lloyd round and no broadcast exceeds the ≤√n-row centroid table.
  * Deterministic anchors are what make the trained geometry replayable
  * by an external oracle — the engine's reproducible-training-data story
  * applied to the index itself.
  *
  * Scale: build is the Lloyd loop's cost (broadcast assign + k×dim
  * fixed-point aggregate) plus one distinct over (list, file) — metadata
  * volume. Search reads k centroids and one posting list driver-side
  * (the usual planning class), then scans candidate files only: at 100 TB
  * a probe touches ~1/k of the table's files. */
object VectorIndex {
  private[sources] val PropPrefix = "vecidx."
  private val Iters = 1 // one Lloyd refinement — the IVF training standard

  /** Row-assignment algorithm version stamped into the prop: `h2` = the
    * two-level coarse-quantizer assignment
    * ([[graft.llm.Similarity.assignListsHier]]). Serving re-derives each
    * row's cluster with the CURRENT assigner, so an index whose postings
    * were written by a different assigner (the pre-h2 flat argmax) can
    * silently lose rows — a row in stored list A that re-derives to list
    * B never passes the list filter. A version mismatch therefore makes
    * the index STALE (the onStale policy applies) and [[refresh]]
    * migrates it with a full rebuild — the [[TextIndex]]
    * legacy-stats-format rule applied to geometry. */
  private[sources] val AssignVersion = "h2"

  /** Decoded `vecidx.<col>` prop. Legacy 3-field props (flat-assigner
    * builds) parse with `version = "flat"` and no build options; current
    * props carry the assignment version plus the build's
    * LISTS/SAMPLE/COARSE-PROBES policy so serve-time re-derivation and
    * stale in-query retrains replay what THIS build did, not the
    * defaults (a coarse-probe mismatch between build and serve would
    * silently drop rows, the same failure mode as the assigner-version
    * mismatch). */
  private[sources] final case class Prop(idxName: String, idCol: String,
      digest: String, version: String, lists: Option[Long],
      sample: Option[Long], coarse: Int = 2,
      partCol: Option[String] = None, dvDigest: Option[String] = None) {
    def isCurrent(curDigest: String): Boolean =
      digest == curDigest && version == AssignVersion
  }
  private[sources] def parseProp(v: String): Prop = v.split(";", -1) match {
    case Array(i, c, d) => Prop(i, c, d, "flat", None, None)
    case Array(i, c, d, ver, l, s) => Prop(i, c, d, ver,
      Some(l).filter(_ != "-").map(_.toLong),
      Some(s).filter(_ != "-").map(_.toLong))
    case Array(i, c, d, ver, l, s, cp) => Prop(i, c, d, ver,
      Some(l).filter(_ != "-").map(_.toLong),
      Some(s).filter(_ != "-").map(_.toLong), cp.toInt)
    case Array(i, c, d, ver, l, s, cp, pc) => Prop(i, c, d, ver,
      Some(l).filter(_ != "-").map(_.toLong),
      Some(s).filter(_ != "-").map(_.toLong), cp.toInt,
      Some(pc).filter(_ != "-"))
    case Array(i, c, d, ver, l, s, cp, pc, dvd) => Prop(i, c, d, ver,
      Some(l).filter(_ != "-").map(_.toLong),
      Some(s).filter(_ != "-").map(_.toLong), cp.toInt,
      Some(pc).filter(_ != "-"), Some(dvd).filter(_ != "-"))
    case _ => throw new IllegalStateException(
      s"unreadable vecidx prop '$v' — expected 3 (legacy) or 6-9 fields")
  }
  private def renderProp(idxName: String, idCol: String, digest: String,
      lists: Option[Long], sample: Option[Long], coarse: Int,
      partCol: Option[String] = None, dvDigest: String = "-"): String =
    Seq(idxName, idCol, digest, AssignVersion,
      lists.map(_.toString).getOrElse("-"),
      sample.map(_.toString).getOrElse("-"), coarse.toString,
      partCol.getOrElse("-"), dvDigest).mkString(";")

  /** The stale/legacy retrain shared by every in-query replay path:
    * exactly what a CREATE VECTOR INDEX rebuild would train — the
    * PERSISTED LISTS/SAMPLE policy (not the defaults), corpus-derived k
    * otherwise. */
  private def retrainGeometry(rows: DataFrame,
      p: Prop): (DataFrame, DataFrame) = retrainGeometry(rows, p, rows.count())

  private def retrainGeometry(rows: DataFrame, p: Prop,
      n: Long): (DataFrame, DataFrame) = {
    val k = p.lists.getOrElse(graft.llm.Clustering.kFor(n))
    p.sample match {
      case Some(cap) =>
        graft.llm.Clustering.kmeansAssignSampled(rows, k, Iters, cap, n,
          p.coarse)
      case None => graft.llm.Clustering.kmeansAssign(rows, k, Iters, p.coarse)
    }
  }

  /** The RANKED twin of [[retrainGeometry]] for BY PARTITION slices
    * (ranked seeds, sample-aware since r13) — what a slice rebuild
    * trains, replayed in-query by the stale paths. */
  private def retrainGeometryRanked(rows: DataFrame, p: Prop,
      n: Long): (DataFrame, DataFrame) = {
    val k = p.lists.getOrElse(graft.llm.Clustering.kFor(n))
    p.sample match {
      case Some(cap) =>
        graft.llm.Clustering.kmeansAssignRankedSampled(rows, k, Iters, cap,
          n, p.coarse)
      case None =>
        graft.llm.Clustering.kmeansAssignRanked(rows, k, Iters, p.coarse)
    }
  }

  /** What a QUERY does when it meets a stale index
    * (`spark.graft.index.onStale`): `retrain` (default) recomputes the
    * geometry from the declared anchors inside the query — always correct
    * and oracle-replayable from the current corpus, but at scale that is
    * a surprise full-table clustering per probe; `refresh` runs the
    * bounded incremental [[refresh]] first (dead postings drop, new files
    * assign against the stored geometry) and then serves from the index —
    * the production posture; `fail` refuses loudly, for deployments that
    * want rebuild discipline enforced rather than absorbed. */
  private[sources] def onStale(spark: SparkSession): String =
    spark.conf.get("spark.graft.index.onStale", "retrain") match {
      case p @ ("retrain" | "refresh" | "fail") => p
      case other => throw new IllegalArgumentException(
        s"spark.graft.index.onStale=$other — expected retrain|refresh|fail")
    }

  /** `onStale=refresh` makes a READ publish: the catch-up takes the
    * table's commit lock and writes a new `_manifest` version (index
    * prop swap) from inside a SELECT-shaped query. That is the intended
    * production posture — one reader absorbs the churn, every later
    * reader serves indexed — but it surprises deployments whose query
    * path holds read-only storage credentials (the publish would fail
    * halfway through a commit). `spark.graft.index.readOnly = true`
    * declares such a deployment: the refresh policy then refuses UP
    * FRONT with guidance, shared by both index tiers. */
  private[sources] def refuseRefreshIfReadOnly(spark: SparkSession,
      op: String): Unit =
    if (spark.conf.get("spark.graft.index.readOnly", "false").toBoolean)
      throw new IllegalStateException(
        s"$op: spark.graft.index.onStale=refresh would PUBLISH a new " +
          "index version from inside a read (commit lock + _manifest " +
          "write), but spark.graft.index.readOnly=true — use " +
          "onStale=retrain|fail, or run REFRESH … INDEX from a writer")

  private def staleRefused(op: String, table: String): Nothing =
    throw new IllegalStateException(
      s"$op: the vector index on $table is STALE and " +
        "spark.graft.index.onStale=fail — run REFRESH VECTOR INDEX (or " +
        "CREATE VECTOR INDEX to retrain) first")

  private def sha256(s: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
  private def digestOf(m: Manifest): String =
    sha256(m.entries.filter(_.rows > 0).map(_.name).sorted.mkString("\n"))

  /** DV-identity digest — the [[TextIndex.dvDigestOf]] contract shared
    * verbatim: serving freshness stays names-only (a DV'd row never
    * surfaces from a fetch, so pruning is always admissible), but a
    * dv-digest divergence tells [[refresh]] that posting/code/band rows
    * still carry dead vec_ids (wasting PQ rerank budget and candidate
    * fetches) until the touched files re-derive against the stored
    * geometry. */
  private def dvDigestOf(m: Manifest): String = TextIndex.dvDigestOf(m)

  /** The `(file, dv)` coverage sidecar — same two jobs as the text
    * tier's: drift attribution when the dv digest diverges, and coverage
    * for files whose rows are all deletion-vectored (no posting survives
    * the masked scan). */
  private def writeCovered(spark: SparkSession, idxDir: Path, m: Manifest,
      names: Seq[String]): Unit = {
    import spark.implicits._
    val byName = m.entries.map(e => e.name -> e.dv.map(_._1)).toMap
    names.map(n => (n, byName.get(n).flatten.orNull))
      .toDF("file", "dv")
      .coalesce(1).write.parquet(idxDir.resolve("covered").toString)
  }

  /** (covered files, drifted files) for a refresh: coverage from the
    * `covered/` sidecar when present (it alone records files whose rows
    * are ALL deletion-vectored), else `fallbackIndexed` (the legacy
    * posts-derived recovery); drift = covered files whose recorded dv
    * identity no longer matches (legacy fallback: any live indexed file
    * that currently carries a dv — conservative, bounded by the DV'd
    * files, and this refresh writes `covered/` so the next compares
    * exactly). */
  private def coverageAndDrift(spark: SparkSession, oldDir: Path,
      m: Manifest, fallbackIndexed: => Set[String])
      : (Set[String], Set[String]) = {
    val liveEntries = m.entries.filter(_.rows > 0)
    val coveredPath = oldDir.resolve("covered")
    if (java.nio.file.Files.exists(coveredPath)) {
      val rec = spark.read.parquet(coveredPath.toString).collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      (rec.keySet, liveEntries.filter(e => rec.contains(e.name) &&
        rec(e.name) != e.dv.map(_._1).orNull).map(_.name).toSet)
    } else {
      val indexed = fallbackIndexed
      (indexed, liveEntries
        .filter(e => indexed(e.name) && e.dv.isDefined)
        .map(_.name).toSet)
    }
  }

  private def scanFiles(spark: SparkSession, dir: Path,
      names: Seq[String]): DataFrame =
    spark.read.format("graft.sources.GraftManifestSink")
      .option("path", dir.toString)
      .option("files", names.mkString(","))
      .load()

  private def checkCols(m: Manifest, colName: String, idCol: String): Unit = {
    def field(c: String) =
      m.schema.fields.find(_.name.equalsIgnoreCase(c)).getOrElse(
        throw new IllegalArgumentException(
          s"CREATE VECTOR INDEX: column $c not in table schema " +
            s"(${m.schema.fieldNames.mkString(", ")})"))
    field(colName).dataType match {
      case ArrayType(FloatType, _) => ()
      case t => throw new IllegalArgumentException(
        s"CREATE VECTOR INDEX: column $colName is ${t.sql}, " +
          "only ARRAY<FLOAT> columns index")
    }
    field(idCol) // anchors column must exist; any orderable type works
  }

  /** Train (k-means, one refinement, anchors = k lowest `idCol` rows) and
    * publish. `lists` overrides the corpus-derived k
    * ([[graft.llm.Clustering.kFor]]) — the geometry is a POLICY: a
    * deployment whose SemDeDup/pair-join work dominates raises k for
    * smaller cells, one tuning recall-per-probe lowers it. `sample`
    * trains the quantizer on a deterministic ~sample-row subset and
    * assigns the full corpus once
    * ([[graft.llm.Clustering.kmeansAssignSampled]]) — the FAISS-style
    * build whose training cost is bounded regardless of corpus size.
    * `byPartition` trains ONE GEOMETRY PER PARTITION VALUE
    * ([[buildByPartition]]) so partition pruning composes with list
    * pruning. Returns (files indexed, clusters trained). */
  def build(spark: SparkSession, dir: Path, colName: String,
      idCol: String, lists: Option[Long] = None,
      sample: Option[Long] = None, coarse: Int = 2,
      byPartition: Boolean = false): (Long, Long) = {
    val m = Manifest.read(dir).getOrElse(
      throw new IllegalStateException(s"CREATE VECTOR INDEX: no manifest at $dir"))
    checkCols(m, colName, idCol)
    if (byPartition)
      return buildByPartition(spark, dir, m, colName, idCol, lists, sample,
        coarse)
    val names = m.entries.filter(_.rows > 0).map(_.name)
    val idxName = s"_vecidx_${java.util.UUID.randomUUID.toString.take(8)}"
    val idxDir = dir.resolve(idxName)
    val k = if (names.isEmpty) {
      // the index invariant: published ⇒ cents/posts exist (empty here),
      // so fresh searches answer empty and refresh remaps cleanly
      emptyCents(spark, withPart = false)
        .write.parquet(idxDir.resolve("cents").toString)
      emptyPosts(spark, withPart = false)
        .write.parquet(idxDir.resolve("posts").toString)
      0L
    } else {
      val base = scanFiles(spark, dir, names)
        .select(col(idCol).as("vec_id"), lit(0).as("label"),
          col(colName).as("embedding"), col("_file").as("file"))
      val n = base.count()
      val k = lists.map { l =>
        if (l < 1) throw new IllegalArgumentException(
          s"CREATE VECTOR INDEX: LISTS $l is invalid — at least 1 cluster")
        l
      }.getOrElse(graft.llm.Clustering.kFor(n))
      // the Lloyd loop seeds from rows with id < k (what makes the trained
      // geometry replayable by an external oracle) — a sparse id column
      // that leaves the anchor range empty must fail loudly, not train a
      // zero-centroid index
      if (base.filter(col("vec_id") < k).limit(1).count() == 0L)
        throw new IllegalArgumentException(
          s"CREATE VECTOR INDEX: anchor column $idCol has no values below " +
            s"k=$k — anchors are the k lowest-id rows, so the id range " +
            "must start at 0 (dense ids; re-key or pick another column)")
      val rows = base.select("vec_id", "label", "embedding")
      val (assigned, cents) = sample match {
        case Some(cap) =>
          if (cap < 1) throw new IllegalArgumentException(
            s"CREATE VECTOR INDEX: SAMPLE $cap is invalid — at least 1 row")
          graft.llm.Clustering.kmeansAssignSampled(rows, k, Iters, cap, n,
            coarse)
        case None => graft.llm.Clustering.kmeansAssign(rows, k, Iters, coarse)
      }
      cents.write.parquet(idxDir.resolve("cents").toString)
      // MATERIALIZE the (vec_id, list_id) assignment once: both the
      // postings write and the PQ codes write consume it, and the
      // assignment lineage is a full O(n·√k) pass — without the cut the
      // codes write would re-run it over the whole corpus. Two narrow
      // columns, spill-capable.
      val listsDf = assigned.select(col("vec_id"), col("list_id"))
        .localCheckpoint()
      // re-join the assignment to its files via the id column (the Lloyd
      // helper's schema is fixed); one shuffle on the id, distinct postings
      listsDf
        .join(base.select(col("vec_id"), col("file")), "vec_id")
        .select(col("list_id"), col("file")).distinct()
        .write.parquet(idxDir.resolve("posts").toString)
      writePqSidecars(idxDir, base, listsDf, n)
      writeBandSidecars(idxDir, base, listsDf, n)
      k
    }
    writeCovered(spark, idxDir, m, names)
    ManifestLock.withLock(dir) {
      val cur = Manifest.read(dir).getOrElse(m)
      Manifest.write(dir, cur.copy(props = cur.props +
        (PropPrefix + colName.toLowerCase ->
          renderProp(idxName, idCol, digestOf(m), lists, sample, coarse,
            dvDigest = dvDigestOf(m)))))
    }
    (names.length.toLong, k)
  }

  /** PER-PARTITION SUB-INDEXES (`CREATE VECTOR INDEX … BY PARTITION`):
    * one trained geometry + posting set per partition VALUE of the
    * table's declared partition column, so partition pruning composes
    * with list pruning — a partition-pinned probe loads ~k_p centroids
    * and plans ~1/k_p of ONE partition's files, never touching the rest
    * of the table (the DiskANN/Milvus partition-key serving shape).
    * Storage: the same `cents/`/`posts/` sidecars with a `part` string
    * column (the partition value through Spark's string cast) — the
    * whole centroid table is Σ_p k_p rows, still metadata-class.
    * Seeding is RANKED ([[graft.llm.Clustering.kmeansAssignRanked]]):
    * a sub-corpus's ids need not start at 0, so anchors are the k_p
    * lowest-id rows by rank — deterministic and oracle-replayable like
    * the dense-anchor rule. The driver loop is bounded by the partition
    * count (the usual planning-class iteration); each partition's Lloyd
    * work is the standard O(n_p·√k_p). SAMPLE composes per partition
    * (r13 — the r12 refusal was wrong at scale: ONE partition of a
    * 100 TB table can be terabytes, where sampled training is exactly
    * what keeps the sub-index buildable): each slice trains on its own
    * ranked-seeded decimation
    * ([[graft.llm.Clustering.kmeansAssignRankedSampled]]) and assigns
    * its full slice once. PQ sidecars are built PER PARTITION (r13):
    * ranked-seeded codebooks + codes keyed by `part`, so `RERANK …
    * USING PQ` serves pinned, multi-pin and global searches — ADC
    * compression is what bounds candidate I/O inside a terabyte
    * partition. */
  private def buildByPartition(spark: SparkSession, dir: Path, m: Manifest,
      colName: String, idCol: String, lists: Option[Long],
      sample: Option[Long], coarse: Int): (Long, Long) = {
    sample.foreach { cap =>
      if (cap < 1) throw new IllegalArgumentException(
        s"CREATE VECTOR INDEX: SAMPLE $cap is invalid — at least 1 row")
    }
    val partCols = Manifest.partitionCols(dir)
    if (partCols.size != 1) throw new IllegalArgumentException(
      "CREATE VECTOR INDEX … BY PARTITION: the table must be PARTITIONED " +
        s"BY exactly one column (found: ${partCols.mkString(", ")})")
    val partCol = partCols.head
    val names = m.entries.filter(_.rows > 0).map(_.name)
    val idxName = s"_vecidx_${java.util.UUID.randomUUID.toString.take(8)}"
    val idxDir = dir.resolve(idxName)
    var totalK = 0L
    if (names.nonEmpty) {
      // ONE scan, every slice trained in one part-keyed dataflow (r14 —
      // the build itself no longer loops the driver over partitions);
      // the string form of the partition value is what the sidecars
      // store and the serve-time pin compares against
      val base = scanFiles(spark, dir, names)
        .select(col(idCol).as("vec_id"), lit(0).as("label"),
          col(colName).as("embedding"), col("_file").as("file"),
          col(partCol).cast("string").as("part"))
      val (cents, posts, cb, codes, lshanch, bands, k) =
        buildPartitionSlices(spark, base, lists, sample, coarse)
      totalK = k
      emptyCents(spark, withPart = true).unionByName(cents)
        .write.parquet(idxDir.resolve("cents").toString)
      emptyPosts(spark, withPart = true).unionByName(posts)
        .write.parquet(idxDir.resolve("posts").toString)
      // per-partition PQ sidecars — every non-empty slice has a ranked
      // codebook (never empty, unlike the global id-bounded rule), so
      // presence is all-or-nothing per index version
      cb.coalesce(1).write.parquet(idxDir.resolve("pqcb").toString)
      codes.write.parquet(idxDir.resolve("codes").toString)
      // per-partition incremental-dedup sidecars (r14): slice-keyed LSH
      // panels + corpus band rows — what lets semDedupIncremental serve
      // a date-partitioned corpus without a second global index
      lshanch.coalesce(1)
        .write.parquet(idxDir.resolve("lshanch").toString)
      bands.write.parquet(idxDir.resolve("bands").toString)
    } else {
      // a published index ALWAYS has cents/posts sidecars — an empty
      // table publishes empty ones, so fresh searches answer empty and
      // refreshes remap cleanly instead of dying on a missing path
      emptyCents(spark, withPart = true)
        .write.parquet(idxDir.resolve("cents").toString)
      emptyPosts(spark, withPart = true)
        .write.parquet(idxDir.resolve("posts").toString)
    }
    writeCovered(spark, idxDir, m, names)
    ManifestLock.withLock(dir) {
      val cur = Manifest.read(dir).getOrElse(m)
      Manifest.write(dir, cur.copy(props = cur.props +
        (PropPrefix + colName.toLowerCase ->
          renderProp(idxName, idCol, digestOf(m), lists, sample, coarse,
            Some(partCol), dvDigest = dvDigestOf(m)))))
    }
    (names.length.toLong, totalK)
  }

  /** Empty sidecar frames with the exact stored schemas — what an empty
    * table's build publishes (the index invariant: published ⇒ cents/
    * posts exist), and the schema anchor for the slice unions. */
  private def emptyCents(spark: SparkSession, withPart: Boolean): DataFrame = {
    import org.apache.spark.sql.types._
    val fields = Seq(StructField("c_id", IntegerType),
      StructField("c_emb", ArrayType(FloatType))) ++
      (if (withPart) Seq(StructField("part", StringType)) else Nil)
    spark.createDataFrame(spark.sparkContext
      .emptyRDD[org.apache.spark.sql.Row], StructType(fields))
  }
  private def emptyPosts(spark: SparkSession, withPart: Boolean): DataFrame = {
    import org.apache.spark.sql.types._
    val fields = (if (withPart) Seq(StructField("part", StringType)) else Nil) ++
      Seq(StructField("list_id", IntegerType), StructField("file", StringType))
    spark.createDataFrame(spark.sparkContext
      .emptyRDD[org.apache.spark.sql.Row], StructType(fields))
  }

  /** Train EVERY partition value's sub-geometry + sidecars from `base`
    * (vec_id, label, embedding, file, part) in ONE part-keyed dataflow
    * (r14 — formerly a sequential per-slice driver loop: per-slice
    * count + Lloyd + codebook + band jobs made the BUILD itself
    * O(parts) in driver round-trips at a daily-partitioned table).
    * Per part this trains exactly what the per-slice loop trained —
    * ranked SAMPLE-aware Lloyd ([[graft.llm.Clustering
    * .kmeansAssignRankedByPart]]), ranked PQ codebooks
    * ([[trainPqCodebookRankedByPart]]), per-slice size-derived LSH
    * geometry + RANKED panels — so the sidecar CONTENTS are
    * row-identical and every serve-path hash holds. The one driver
    * read is a bounded parts-row counts collect (it sizes each
    * slice's LSH geometry and the returned Σk). Returns
    * (cents, posts, pqcb, codes, lshanch, bands, Σ k_p). */
  private def buildPartitionSlices(spark: SparkSession, base: DataFrame,
      lists: Option[Long], sample: Option[Long], coarse: Int)
      : (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame, DataFrame,
         Long) = {
    import graft.llm.Similarity
    lists.foreach { l =>
      if (l < 1) throw new IllegalArgumentException(
        s"CREATE VECTOR INDEX: LISTS $l is invalid — at least 1 cluster")
    }
    val rows = base.select(col("part"), col("vec_id"), col("label"),
      col("embedding"))
    val (assigned, cents) = graft.llm.Clustering.kmeansAssignRankedByPart(
      rows, Iters, coarse, lists, sample)
    // MATERIALIZE the (part, vec_id, list_id) assignment once: postings,
    // PQ codes and band rows all consume it — three narrow columns,
    // spill-capable (the global build's materialization rule)
    val listsDf = assigned.select(col("part"), col("vec_id"),
      col("list_id")).localCheckpoint()
    // every assignment join below keys on (part, vec_id), never vec_id
    // alone (r15 advice): the ANCHORS id only has to be unique WITHIN a
    // partition, and a date-partitioned corpus commonly repeats ids
    // across slices — a vec_id-only join would cross-wire list_ids
    // between partitions silently
    val files = base.select(col("part"), col("vec_id"), col("file"))
    val posts = listsDf.join(files, Seq("part", "vec_id"))
      .select(col("part"), col("list_id"), col("file")).distinct()
    // per-part RANKED codebooks + codes (each slice's pair equals the
    // per-slice trainer's — the C242 stale-replay helper, reused);
    // MATERIALIZED once: the sidecar write and the encode broadcast
    // both consume it (Σ_p × PqCbK rows)
    val cb = trainPqCodebookRankedByPart(
      base.select(col("part"), col("vec_id"), col("embedding")))
      .coalesce(1).localCheckpoint()
    val cbArrByPart = cb.groupBy("part")
      .agg(array_sort(collect_list(struct(col("c_id"), col("c_emb"))))
        .as("cents"))
    val codes = (0 until Similarity.PqM).foldLeft(
        base.select(col("part"), col("vec_id"), col("embedding"))
          .join(broadcast(cbArrByPart), "part")) { (df, b) =>
        df.withColumn(s"code$b",
          Similarity.pqCode(col("cents"), col("embedding"), b))
      }
      .join(listsDf, Seq("part", "vec_id"))
      .join(files, Seq("part", "vec_id"))
      .select(Seq(col("part"), col("vec_id"), col("list_id"),
        col("file")) ++
        (0 until Similarity.PqM).map(b => col(s"code$b")): _*)
    // per-slice LSH geometry from slice sizes (ONE bounded parts-row
    // collect) + RANKED anchor panels via a rank window — the
    // incremental-dedup sidecar pair, every slice in one pass
    val counts = rows.groupBy("part").count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val geo0 = spark.createDataFrame(counts.toSeq.map { case (pv, n) =>
      val (nb, bt) = graft.llm.Dedup.embeddingLshParams(n)
      (pv, nb, bt)
    }).toDF("part", "n_bands", "bits")
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy("part").orderBy("vec_id")
    val anchByPart = rows.select(col("part"), col("vec_id"),
        col("embedding"))
      .withColumn("rk", row_number().over(wr))
      .join(broadcast(geo0.select(col("part"),
        (col("n_bands") * col("bits")).as("slots"))), "part")
      .where(col("rk") <= col("slots"))
      .groupBy("part")
      .agg(array_sort(collect_list(struct(col("vec_id").as("a_id"),
        col("embedding").as("a_emb")))).as("anchors"))
    val lshanch = geo0.join(anchByPart, "part")
      .select(col("part"), col("n_bands"), col("bits"), col("anchors"))
      .coalesce(1).localCheckpoint()
    val bands = graft.llm.Dedup.embeddingBandRowsByPart(
        base.select(col("part"), col("vec_id"), col("embedding"),
          col("file")),
        lshanch, carry = Seq("file"))
      .join(listsDf, Seq("part", "vec_id"))
      .select(col("part"), col("vec_id"), col("band"), col("bkey"),
        col("list_id"), col("file"))
    val totalK = counts.map { case (_, n) =>
      lists.getOrElse(graft.llm.Clustering.kFor(n))
    }.sum
    (cents.select(col("c_id"), col("c_emb"), col("part")), posts,
      cb.select(col("c_id"), col("c_emb"), col("part")), codes, lshanch,
      bands, totalK)
  }

  /** The pin(s) a BY PARTITION probe must carry: some conjunct of the
    * predicate of shape `<partCol> = <literal>` (either side) or
    * `<partCol> IN (<literals>)` — the multi-pin serving shape ("search
    * these two dates"). Literals route to sub-indexes through the SAME
    * rendering the build used: cast to the TABLE's partition-column
    * type, then to string — so a DATE pin renders "2024-06-01" (not the
    * internal day count), and an integer literal against a DOUBLE
    * partition renders "1.0". A literal that cannot cast to the
    * partition type pins nothing (it can match no partition); a
    * predicate with no pinning conjunct returns None (the loud no-pin
    * refusal). */
  private[sources] def partitionPins(predicate: org.apache.spark.sql.Column,
      partCol: String,
      partType: org.apache.spark.sql.types.DataType): Option[Seq[String]] = {
    import org.apache.spark.sql.catalyst.expressions.{And, EqualTo,
      Expression, In, Literal}
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute,
      UnresolvedFunction}
    def fname(f: UnresolvedFunction): String =
      f.nameParts.last.toLowerCase(java.util.Locale.ROOT)
    // the Column AST arrives two ways: parsed SQL (`EqualTo`/`In`/`And`)
    // or the operator DSL (ColumnNode → `UnresolvedFunction("=" | "in" |
    // "and")`)
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case f: UnresolvedFunction if fname(f) == "and" =>
        f.arguments.flatMap(conjuncts)
      case x => Seq(x)
    }
    def nameOf(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.nameParts.last)
      case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
        Some(a.name)
      case _ => None
    }
    def isPart(e: Expression): Boolean =
      nameOf(e).exists(_.equalsIgnoreCase(partCol))
    def lits(es: Seq[Expression]): Option[Seq[Literal]] =
      if (es.forall(_.isInstanceOf[Literal]))
        Some(es.map(_.asInstanceOf[Literal]))
      else None
    def pinsOf(e: Expression): Option[Seq[Literal]] = e match {
      case EqualTo(a, l: Literal) if isPart(a) => Some(Seq(l))
      case EqualTo(l: Literal, a) if isPart(a) => Some(Seq(l))
      case In(a, vs) if isPart(a) => lits(vs)
      case f: UnresolvedFunction
        if (fname(f) == "=" || fname(f) == "==") && f.arguments.size == 2 =>
        f.arguments match {
          case Seq(a, l: Literal) if isPart(a) => Some(Seq(l))
          case Seq(l: Literal, a) if isPart(a) => Some(Seq(l))
          case _ => None
        }
      case f: UnresolvedFunction
        if fname(f) == "in" && f.arguments.headOption.exists(isPart) =>
        lits(f.arguments.tail)
      case _ => None
    }
    // a pin literal that cannot cast to the partition type refuses
    // LOUDLY: a plain ANSI scan would raise the same cast error at
    // evaluation, and silently answering empty would hide the typo
    def litStr(l: Literal): String =
      try {
        val tz = Some(org.apache.spark.sql.internal.SQLConf.get
          .sessionLocalTimeZone)
        Option(org.apache.spark.sql.catalyst.expressions.Cast(
          org.apache.spark.sql.catalyst.expressions.Cast(l, partType, tz),
          org.apache.spark.sql.types.StringType, tz).eval(null))
          .map(_.toString).getOrElse(throw new IllegalArgumentException(""))
      } catch {
        case _: Exception => throw new IllegalArgumentException(
          s"VECTOR SEARCH: partition pin value $l does not cast to " +
            s"$partCol's type (${partType.sql})")
      }
    conjuncts(org.apache.spark.sql.GraftExpressionBridge
        .catalystExpression(predicate))
      .flatMap(pinsOf).headOption
      .map(_.map(litStr).distinct)
  }

  /** PQ candidate-compression sidecars ([[searchPq]]): `pqcb/` — the
    * TRAINED codebook ([[trainPqCodebook]]: per-subspace Lloyd over a
    * deterministic sample, seeded from the lowest-anchor rows, so the
    * compression is oracle-replayable like the centroids) — and
    * `codes/` — per-row `(vec_id, list_id, file, code0..7)`, ~PqM small
    * ints instead of dim floats. At 100 TB the ADC pre-rank reads this
    * narrow sidecar instead of the embedding column — the 4-16×
    * candidate-I/O cut of the standard IVF-PQ architecture. Skipped
    * (with no published marker) when the anchor id range has no rows
    * below PqCbK — [[searchPq]] then refuses loudly. */
  /** One-row codebook array from a (c_id, c_emb) relation. */
  private def pqCbArr(cb: DataFrame): DataFrame =
    cb.agg(
      array_sort(collect_list(struct(col("c_id"), col("c_emb")))).as("cents"))

  /** PQ-encode `rows` (needs an `embedding` column) against the one-row
    * codebook array — adds code0..code{PqM-1}. Shared by build, refresh
    * and the stale-retrain replay. */
  private def encodePq(rows: DataFrame, cbArr: DataFrame): DataFrame = {
    import graft.llm.Similarity
    (0 until Similarity.PqM)
      .foldLeft(rows.crossJoin(broadcast(cbArr))) { (df, b) =>
        df.withColumn(s"code$b",
          Similarity.pqCode(col("cents"), col("embedding"), b))
      }
  }

  /** TRAIN the per-subspace PQ codebook: production PQ (Jégou et al.
    * 2011) runs k-means per 8-dim block; this is that, made
    * deterministic and oracle-replayable like every trained artifact in
    * the index tier. Seeds = the blocks of the PqCbK lowest-anchor rows;
    * training rows = a deterministic hash decimation to ~PqTrainCap rows
    * (anchors force-included — the C214 bounded-build rule, so codebook
    * training cost is constant at any corpus size); ONE Lloyd refinement:
    * every training row's block takes its min-L2 seed codeword (the same
    * fixed-point (x·x − 2·x·c) + c·c assembly as encoding, first-min
    * tie-break), then each (subspace, code) cell re-centers to its
    * fixed-point mean (float-narrowed); a codeword no training block
    * chose keeps its seed value. The codewords assemble back into
    * COMPOSITE 64-dim rows (row j's block b = codeword j of subspace b),
    * so the stored `pqcb/` sidecar, [[encodePq]] and the ADC scorer are
    * unchanged — only the geometry the codes quantize against improves.
    * Dataflow: one codegen pass over the sample + one (PqM × PqCbK)-cell
    * aggregate — never a per-row collect. Returns (c_id = 0-based
    * codeword position, c_emb); empty when no row sits below PqCbK. */
  private[sources] def trainPqCodebook(base: DataFrame, n: Long): DataFrame = {
    import graft.llm.Similarity.{PqCbK, PqTrainCap, PqTrainJ}
    import graft.llm.PortableHash.permute
    val seeds = base.filter(col("vec_id") < PqCbK)
      .select(col("vec_id").cast(IntegerType).as("c_id"),
        col("embedding").as("c_emb"))
    if (seeds.limit(1).count() == 0) return seeds
    val m = math.max(1L, n / PqTrainCap)
    trainPqCodebookFrom(seeds, base.where(
      permute(col("vec_id"), PqTrainJ) % m === 0 || col("vec_id") < PqCbK))
  }

  /** [[trainPqCodebook]] with RANKED seeding — the BY PARTITION slices'
    * rule: a sub-corpus's ids need not start at 0, so the codebook seeds
    * are the PqCbK LOWEST-id rows BY RANK (c_id = 0-based rank, the
    * [[graft.llm.Clustering.kmeansAssignRanked]] convention) and the
    * training decimation force-includes them through the ranked id cap.
    * Never empty for a non-empty slice — the id-bounded rule can come up
    * empty on sparse ranges; ranked cannot. */
  private[sources] def trainPqCodebookRanked(base: DataFrame,
      n: Long): DataFrame = {
    import graft.llm.Similarity.{PqCbK, PqTrainCap, PqTrainJ}
    import graft.llm.PortableHash.permute
    val seeds = base.orderBy("vec_id").limit(PqCbK)
      .withColumn("c_id",
        (row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy("vec_id")) - 1).cast(IntegerType))
      .select(col("c_id"), col("embedding").as("c_emb"))
    val m = math.max(1L, n / PqTrainCap)
    val cap = graft.llm.Clustering.rankedIdCap(
      base.select(col("vec_id")), PqCbK)
    trainPqCodebookFrom(seeds, base.where(
      permute(col("vec_id"), PqTrainJ) % m === 0 || col("vec_id") <= cap))
  }

  /** The shared Lloyd refinement of a PQ codebook from explicit seeds +
    * training rows (one coding pass + one (PqM × PqCbK)-cell aggregate —
    * see [[trainPqCodebook]] for the full contract). */
  private def trainPqCodebookFrom(seeds: DataFrame,
      train: DataFrame): DataFrame = {
    import graft.llm.Similarity.{PqM, PqDim, pqBlock, pqCode}
    // one broadcast row, referenced by the coding pass AND the
    // empty-codeword fallback — materialize once
    val seedArr = pqCbArr(seeds).localCheckpoint()
    val coded = (0 until PqM).foldLeft(train.crossJoin(broadcast(seedArr))) {
      (df, b) => df.withColumn(s"code$b",
        pqCode(col("cents"), col("embedding"), b))
    }
    val flat = coded.select(posexplode(array((0 until PqM).map(b =>
        struct(lit(b).as("b"), col(s"code$b").as("code"),
          pqBlock(col("embedding"), b).as("blk"))): _*)).as(Seq("p", "s")))
      .select(col("s.b").as("b"), col("s.code").as("code"),
        col("s.blk").as("blk"))
    val means = flat.groupBy("b", "code")
      .agg(count(lit(1)).as("nv"),
        graft.functions.VectorSumFixed.sum(col("blk"), PqDim).as("vs"))
      .select(col("b"), col("code"),
        transform(col("vs"), x => (x / col("nv")).cast(FloatType)).as("c8"))
    val seedFlat = seedArr
      .select(posexplode(col("cents")).as(Seq("j", "st")))
      .select(col("j").cast(IntegerType).as("code"),
        col("st.c_emb").as("emb"))
      .select(col("code"), posexplode(array((0 until PqM).map(b =>
          struct(lit(b).as("b"), pqBlock(col("emb"), b).as("sblk"))): _*))
        .as(Seq("p", "s")))
      .select(col("code"), col("s.b").as("b"), col("s.sblk").as("sblk"))
    seedFlat.join(means, Seq("b", "code"), "left")
      .select(col("code"),
        struct(col("b"), coalesce(col("c8"), col("sblk")).as("cblk")).as("bb"))
      .groupBy("code")
      .agg(flatten(transform(array_sort(collect_list(col("bb"))),
        st => st.getField("cblk"))).as("c_emb"))
      .select(col("code").as("c_id"), col("c_emb"))
  }

  /** [[trainPqCodebookRanked]] for EVERY partition slice in ONE
    * part-keyed dataflow (r14 — the stale-replay path of the partitioned
    * PQ tier): per-part ranked seeds (the PqCbK lowest-id rows by rank),
    * per-part decimation with the ranked id cap, one coding pass + one
    * (part × PqM × PqCbK)-cell aggregate. Each slice's rows equal
    * [[trainPqCodebookRanked]] run per slice — the hash contract.
    * `base` carries (part, vec_id, embedding); output
    * (part, c_id, c_emb). */
  private def trainPqCodebookRankedByPart(base: DataFrame): DataFrame = {
    import graft.llm.Similarity.{PqCbK, PqTrainCap, PqTrainJ, PqM, PqDim,
      pqBlock, pqCode}
    import graft.llm.PortableHash.permute
    import org.apache.spark.sql.types.LongType
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("part").orderBy("vec_id")
    val ranked = base.select(col("part"), col("vec_id"), col("embedding"))
      .withColumn("rk", row_number().over(w))
    val seedRows = ranked.where(col("rk") <= PqCbK)
    // one row per part: the decimation modulus + ranked force-include cap
    val pol = base.groupBy("part").agg(count(lit(1)).as("n"))
      .select(col("part"), greatest(lit(1L),
        floor(col("n") / lit(PqTrainCap)).cast(LongType)).as("m"))
      .join(seedRows.groupBy("part")
        .agg(max(col("vec_id").cast(LongType)).as("idcap")), "part")
    val train = base.join(broadcast(pol), "part")
      .where(permute(col("vec_id"), PqTrainJ) % col("m") === 0 ||
        col("vec_id") <= col("idcap"))
      .select(col("part"), col("vec_id"), col("embedding"))
    // per-part seed arrays — consumed by the coding pass AND the
    // empty-codeword fallback; materialize once
    val seedArr = seedRows
      .select(col("part"), (col("rk") - 1).cast(IntegerType).as("c_id"),
        col("embedding").as("c_emb"))
      .groupBy("part")
      .agg(array_sort(collect_list(struct(col("c_id"), col("c_emb"))))
        .as("cents"))
      .coalesce(1).localCheckpoint()
    val coded = (0 until PqM).foldLeft(
        train.join(broadcast(seedArr), "part")) { (df, b) =>
      df.withColumn(s"code$b", pqCode(col("cents"), col("embedding"), b))
    }
    val flat = coded.select(col("part"),
        posexplode(array((0 until PqM).map(b =>
          struct(lit(b).as("b"), col(s"code$b").as("code"),
            pqBlock(col("embedding"), b).as("blk"))): _*)).as(Seq("px", "s")))
      .select(col("part"), col("s.b").as("b"), col("s.code").as("code"),
        col("s.blk").as("blk"))
    val means = flat.groupBy("part", "b", "code")
      .agg(count(lit(1)).as("nv"),
        graft.functions.VectorSumFixed.sum(col("blk"), PqDim).as("vs"))
      .select(col("part"), col("b"), col("code"),
        transform(col("vs"),
          x => (x / col("nv")).cast(FloatType)).as("c8"))
    val seedFlat = seedArr
      .select(col("part"), posexplode(col("cents")).as(Seq("j", "st")))
      .select(col("part"), col("j").cast(IntegerType).as("code"),
        col("st.c_emb").as("emb"))
      .select(col("part"), col("code"),
        posexplode(array((0 until PqM).map(b =>
          struct(lit(b).as("b"), pqBlock(col("emb"), b).as("sblk"))): _*))
        .as(Seq("px", "s")))
      .select(col("part"), col("code"), col("s.b").as("b"),
        col("s.sblk").as("sblk"))
    seedFlat.join(means, Seq("part", "b", "code"), "left")
      .select(col("part"), col("code"),
        struct(col("b"),
          coalesce(col("c8"), col("sblk")).as("cblk")).as("bb"))
      .groupBy("part", "code")
      .agg(flatten(transform(array_sort(collect_list(col("bb"))),
        st => st.getField("cblk"))).as("c_emb"))
      .select(col("part"), col("code").as("c_id"), col("c_emb"))
  }

  /** LSH band-key sidecars for the incremental-SemDeDup tier — the C69
    * stored-signature pattern applied to embeddings, so a daily batch
    * never re-hashes or re-clusters the corpus:
    *  - `lshanch/` — ONE row: the geometry (n_bands, bits, from
    *    [[graft.llm.Dedup.embeddingLshParams]] over the build corpus) and
    *    the stored anchor panel ([[graft.llm.Dedup.bandAnchorsRanked]] —
    *    RANKED, so sparse id ranges still fill every hyperplane slot);
    *  - `bands/` — per corpus row × band: (vec_id, band, bkey, list_id,
    *    file) — which sign-band buckets the row occupies, its stored
    *    cluster, and the file holding its embedding. Narrow like `codes/`
    *    (four ints/longs + the file name), written once per build and
    *    remapped file-bounded on refresh.
    * A batch then derives ITS band keys against the stored panel and
    * joins this sidecar — per-batch cost is O(\|batch\| × bucket), and
    * only candidate FILES are ever scanned for corpus embeddings. */
  private def writeBandSidecars(idxDir: Path, base: DataFrame,
      lists: DataFrame, n: Long): Unit = {
    val (nBands, bits) = graft.llm.Dedup.embeddingLshParams(n)
    // consumed twice (the sidecar write + the band derivation's
    // broadcast) — materialize the one-row panel
    val anch = graft.llm.Dedup.bandAnchorsRanked(
        base.select(col("vec_id"), col("embedding")), nBands, bits)
      .select(lit(nBands).as("n_bands"), lit(bits).as("bits"),
        col("anchors"))
      .localCheckpoint()
    anch.coalesce(1).write.parquet(idxDir.resolve("lshanch").toString)
    graft.llm.Dedup.embeddingBandRowsWith(
        base.select(col("vec_id"), col("embedding"), col("file")),
        anch.select(col("anchors")), nBands, bits, carry = Seq("file"))
      .join(lists, "vec_id")
      .select(col("vec_id"), col("band"), col("bkey"), col("list_id"),
        col("file"))
      .write.parquet(idxDir.resolve("bands").toString)
  }

  private def writePqSidecars(idxDir: Path,
      base: DataFrame, lists: DataFrame, n: Long): Unit = {
    import graft.llm.Similarity
    val cb = trainPqCodebook(base, n)
    if (cb.limit(1).count() == 0) return
    cb.coalesce(1).write.parquet(idxDir.resolve("pqcb").toString)
    val coded = encodePq(base, pqCbArr(cb))
    coded.join(lists, "vec_id")
      .select(Seq(col("vec_id"), col("list_id"), col("file")) ++
        (0 until Similarity.PqM).map(b => col(s"code$b")): _*)
      .write.parquet(idxDir.resolve("codes").toString)
  }

  /** Refresh a stale index KEEPING the trained geometry — how a
    * production IVF index absorbs table churn without retraining.
    * Postings are (list, file) pairs, so ANY file-set divergence remaps
    * in one bounded pass: dead files' postings DROP (their rows left the
    * live set — OPTIMIZE/DELETE/MERGE rewrote or removed them), new
    * files' rows assign against the STORED centroids (per-row broadcast
    * math over the new files only) and their postings union in. Search
    * stays exact w.r.t. the stored centroids because rows re-derive
    * their cluster from the same array — after a pure compaction
    * (identical rows, new layout) the refreshed index answers exactly
    * what a full retrain would, at the cost of scanning only the
    * rewritten files. After a DELETE/MERGE the kept geometry is a
    * corpus-level approximation (standard IVF operations practice); the
    * oracle-certified recall audits monitor the drift, and CREATE VECTOR
    * INDEX retrains on demand. Returns (files newly indexed,
    * remapped-after-rewrite?). */
  def refresh(spark: SparkSession, dir: Path, colName: String): (Long, Boolean) = {
    val m = Manifest.read(dir).getOrElse(
      throw new IllegalStateException(s"REFRESH VECTOR INDEX: no manifest at $dir"))
    val key = PropPrefix + colName.toLowerCase
    val prop = m.props.getOrElse(key, throw new IllegalStateException(
      s"REFRESH VECTOR INDEX: no vector index on $colName — CREATE it first"))
    val p = parseProp(prop)
    if (p.isCurrent(digestOf(m)) && p.dvDigest.contains(dvDigestOf(m)))
      return (0L, false)
    if (p.version != AssignVersion)
      // postings written by a different row assigner don't commute with
      // the serve-time re-derivation — migrate with a full rebuild under
      // the build's own LISTS/SAMPLE policy (the TextIndex
      // legacy-stats-format rule applied to geometry)
      return (build(spark, dir, colName, p.idCol, p.lists, p.sample,
        p.coarse, byPartition = p.partCol.isDefined)._1, true)
    if (p.partCol.isDefined)
      return refreshByPartition(spark, dir, key, colName, m, p)
    val (oldIdx, idCol) = (p.idxName, p.idCol)
    val oldDir = dir.resolve(oldIdx)
    val (indexedFiles, drift) = coverageAndDrift(spark, oldDir, m,
      spark.read.parquet(oldDir.resolve("posts").toString)
        .select(col("file")).distinct().collect().map(_.getString(0)).toSet)
    val live = m.entries.filter(_.rows > 0).map(_.name)
    val newFiles = live.filterNot(f => indexedFiles(f) && !drift(f))
    val dead = ((indexedFiles -- live.toSet) ++ drift).toSeq.sorted
    if (p.isCurrent(digestOf(m)) && newFiles.isEmpty && dead.isEmpty) {
      // names fresh, nothing drifted — the dv digest was just unknown
      // (pre-dv-digest prop): upgrade the prop (and missing coverage) in
      // place, no sidecar rewrite. The exists-check + write runs UNDER
      // the commit lock so concurrent auto-refresh readers never race
      // the covered/ parquet write (r14 advice).
      ManifestLock.withLock(dir) {
        if (!java.nio.file.Files.exists(oldDir.resolve("covered")))
          writeCovered(spark, oldDir, m, live)
        val cur = Manifest.read(dir).getOrElse(m)
        Manifest.write(dir, cur.copy(props = cur.props +
          (key -> renderProp(oldIdx, idCol, digestOf(m), p.lists, p.sample,
            p.coarse, dvDigest = dvDigestOf(m)))))
      }
      return (0L, false)
    }
    val cents = spark.read.parquet(oldDir.resolve("cents").toString)
    val kept = spark.read.parquet(oldDir.resolve("posts").toString)
      .where(!col("file").isin(dead: _*))
    val newRows =
      if (newFiles.isEmpty) None
      else Some(scanFiles(spark, dir, newFiles)
        .select(col(idCol).as("vec_id"), lit(0).as("label"),
          col(colName).as("embedding"), col("_file").as("file")))
    // MATERIALIZE the new-file assignment once (bounded by the new
    // files): the postings write and the PQ codes write both consume it
    val newLists = newRows.map { rows =>
      graft.llm.Similarity.assignListsHierLocal(
          rows.select("vec_id", "label", "embedding"), cents, p.coarse)
        .select(col("vec_id"), col("list_id"))
        .join(rows.select(col("vec_id"), col("file")), "vec_id")
        .localCheckpoint()
    }
    val posts = newLists.fold(kept)(nl =>
      kept.unionByName(nl.select(col("list_id"), col("file")).distinct()))
    val idxName = s"_vecidx_${java.util.UUID.randomUUID.toString.take(8)}"
    val idxDir = dir.resolve(idxName)
    cents.write.parquet(idxDir.resolve("cents").toString)
    posts.write.parquet(idxDir.resolve("posts").toString)
    // the PQ sidecars ride the refresh: the codebook is trained state
    // (carried, like the centroids); codes remap like postings — dead
    // files' rows drop, new files' rows code against the stored codebook
    if (java.nio.file.Files.exists(oldDir.resolve("pqcb"))) {
      import graft.llm.Similarity
      val cbDf = spark.read.parquet(oldDir.resolve("pqcb").toString)
      cbDf.coalesce(1).write.parquet(idxDir.resolve("pqcb").toString)
      val keptCodes = spark.read.parquet(oldDir.resolve("codes").toString)
        .where(!col("file").isin(dead: _*))
      val codes = (newRows, newLists) match {
        case (Some(rows), Some(nl)) =>
          val coded = encodePq(rows, pqCbArr(cbDf))
          keptCodes.unionByName(
            coded.join(nl.select(col("vec_id"), col("list_id")), "vec_id")
              .select(Seq(col("vec_id"), col("list_id"), col("file")) ++
                (0 until Similarity.PqM).map(b => col(s"code$b")): _*))
        case _ => keptCodes
      }
      codes.write.parquet(idxDir.resolve("codes").toString)
    }
    // the band sidecars ride the refresh exactly like the PQ pair: the
    // anchor panel + geometry are trained state (carried, like the
    // centroids and the codebook); band rows remap like postings — dead
    // files' rows drop, new files' rows hash against the STORED panel
    // (an index built before the incremental tier has no sidecar and
    // stays without one until a full rebuild)
    if (java.nio.file.Files.exists(oldDir.resolve("lshanch"))) {
      val anchDf = spark.read.parquet(oldDir.resolve("lshanch").toString)
        .localCheckpoint()
      anchDf.coalesce(1).write.parquet(idxDir.resolve("lshanch").toString)
      val keptBands = spark.read.parquet(oldDir.resolve("bands").toString)
        .where(!col("file").isin(dead: _*))
      val bands = (newRows, newLists) match {
        case (Some(rows), Some(nl)) =>
          val meta = anchDf.select(col("n_bands"), col("bits"))
            .collect().head
          keptBands.unionByName(
            graft.llm.Dedup.embeddingBandRowsWith(
                rows.select(col("vec_id"), col("embedding")),
                anchDf.select(col("anchors")), meta.getInt(0), meta.getInt(1))
              .join(nl, "vec_id")
              .select(col("vec_id"), col("band"), col("bkey"),
                col("list_id"), col("file")))
        case _ => keptBands
      }
      bands.write.parquet(idxDir.resolve("bands").toString)
    }
    writeCovered(spark, idxDir, m, live)
    ManifestLock.withLock(dir) {
      val cur = Manifest.read(dir).getOrElse(m)
      Manifest.write(dir, cur.copy(props = cur.props +
        (key -> renderProp(idxName, idCol, digestOf(m), p.lists, p.sample,
          p.coarse, dvDigest = dvDigestOf(m)))))
    }
    (newFiles.length.toLong, dead.nonEmpty)
  }

  /** Partition-scoped refresh of a BY PARTITION index: only partitions
    * whose file set changed retrain (dead files' partitions ∪ new files'
    * partitions); every other partition's sub-geometry and postings
    * carry over untouched — the bounded-churn story specialized to
    * partitions: compacting or appending one day of a date-partitioned
    * table retrains ONE day's sub-index, never the table's. (Unlike the
    * global index, a changed partition RETRAINS rather than remaps: its
    * geometry is partition-local, so retraining it is already bounded by
    * the partition — the same argument that lets BY PARTITION skip
    * SAMPLE.) */
  private def refreshByPartition(spark: SparkSession, dir: Path,
      key: String, colName: String, m: Manifest, p: Prop): (Long, Boolean) = {
    val partCol = p.partCol.get
    val oldDir = dir.resolve(p.idxName)
    val oldCents = spark.read.parquet(oldDir.resolve("cents").toString)
    val oldPosts = spark.read.parquet(oldDir.resolve("posts").toString)
    val (indexedFiles, drift) = coverageAndDrift(spark, oldDir, m,
      oldPosts.select(col("file")).distinct()
        .collect().map(_.getString(0)).toSet)
    val live = m.entries.filter(_.rows > 0).map(_.name)
    val newFiles = live.filterNot(f => indexedFiles(f) && !drift(f))
    val dead = ((indexedFiles -- live.toSet) ++ drift).toSeq.sorted
    if (p.isCurrent(digestOf(m)) && newFiles.isEmpty && dead.isEmpty) {
      // names fresh, nothing drifted — upgrade the pre-dv-digest prop
      // (and missing coverage) in place, no slice retrain; the
      // exists-check + write runs UNDER the commit lock (r14 advice)
      ManifestLock.withLock(dir) {
        if (!java.nio.file.Files.exists(oldDir.resolve("covered")))
          writeCovered(spark, oldDir, m, live)
        val cur = Manifest.read(dir).getOrElse(m)
        Manifest.write(dir, cur.copy(props = cur.props +
          (key -> renderProp(p.idxName, p.idCol, digestOf(m), p.lists,
            p.sample, p.coarse, p.partCol, dvDigest = dvDigestOf(m)))))
      }
      return (0L, false)
    }
    val deadParts =
      if (dead.isEmpty) Seq.empty[String]
      else oldPosts.where(col("file").isin(dead: _*))
        .select("part").distinct().collect().map(_.getString(0)).toSeq
    val newParts =
      if (newFiles.isEmpty) Seq.empty[String]
      else scanFiles(spark, dir, newFiles)
        .select(col(partCol).cast("string").as("part"))
        .distinct().collect().map(_.getString(0)).toSeq
    val affected = (deadParts ++ newParts).distinct.sorted
    val keptCents = oldCents.where(!col("part").isin(affected: _*))
    val keptPosts = oldPosts.where(!col("part").isin(affected: _*))
    // the affected partitions' CURRENT rows: their surviving old files
    // plus the new files (each partition-pure by the clustering contract)
    val affOldFiles = oldPosts.where(col("part").isin(affected: _*))
      .select("file").distinct().collect().map(_.getString(0))
      .filter(live.contains).toSeq
    val affFiles = (affOldFiles ++ newFiles).distinct
    val rebuilt: Option[(DataFrame, DataFrame, DataFrame, DataFrame,
        DataFrame, DataFrame, Long)] =
      if (affFiles.isEmpty) None
      else Some(buildPartitionSlices(spark,
        scanFiles(spark, dir, affFiles)
          .select(col(p.idCol).as("vec_id"), lit(0).as("label"),
            col(colName).as("embedding"), col("_file").as("file"),
            col(partCol).cast("string").as("part"))
          // the affected values only: a surviving file that mixes an
          // unaffected partition's rows must not retrain that slice
          .where(col("part").isin(affected: _*)),
        p.lists, p.sample, p.coarse))
    val idxName = s"_vecidx_${java.util.UUID.randomUUID.toString.take(8)}"
    val idxDir = dir.resolve(idxName)
    rebuilt.fold(keptCents)(r => keptCents.unionByName(r._1))
      .write.parquet(idxDir.resolve("cents").toString)
    rebuilt.fold(keptPosts)(r => keptPosts.unionByName(r._2))
      .write.parquet(idxDir.resolve("posts").toString)
    // PQ rides the partition-scoped refresh: unaffected partitions'
    // codebooks + codes carry over byte-identical, affected partitions'
    // retrain with their slice (a pre-PQ partitioned index stays
    // without sidecars until a full rebuild — mixed per-partition
    // presence would break the all-or-nothing serve check)
    if (java.nio.file.Files.exists(oldDir.resolve("pqcb"))) {
      val keptCb = spark.read.parquet(oldDir.resolve("pqcb").toString)
        .where(!col("part").isin(affected: _*))
      val keptCodes = spark.read.parquet(oldDir.resolve("codes").toString)
        .where(!col("part").isin(affected: _*))
      rebuilt.fold(keptCb)(r => keptCb.unionByName(r._3)).coalesce(1)
        .write.parquet(idxDir.resolve("pqcb").toString)
      rebuilt.fold(keptCodes)(r => keptCodes.unionByName(r._4))
        .write.parquet(idxDir.resolve("codes").toString)
    }
    // the incremental-dedup sidecars ride like the PQ pair: unaffected
    // partitions' panels + band rows carry over, affected partitions'
    // retrain with their slice (a pre-r14 partitioned index stays
    // without them until a full rebuild — all-or-nothing presence)
    if (java.nio.file.Files.exists(oldDir.resolve("lshanch"))) {
      val keptAnch = spark.read.parquet(oldDir.resolve("lshanch").toString)
        .where(!col("part").isin(affected: _*))
      val keptBands = spark.read.parquet(oldDir.resolve("bands").toString)
        .where(!col("part").isin(affected: _*))
      rebuilt.fold(keptAnch)(r => keptAnch.unionByName(r._5)).coalesce(1)
        .write.parquet(idxDir.resolve("lshanch").toString)
      rebuilt.fold(keptBands)(r => keptBands.unionByName(r._6))
        .write.parquet(idxDir.resolve("bands").toString)
    }
    writeCovered(spark, idxDir, m, live)
    ManifestLock.withLock(dir) {
      val cur = Manifest.read(dir).getOrElse(m)
      Manifest.write(dir, cur.copy(props = cur.props +
        (key -> renderProp(idxName, p.idCol, digestOf(m), p.lists, p.sample,
          p.coarse, p.partCol, dvDigest = dvDigestOf(m)))))
    }
    (newFiles.length.toLong, dead.nonEmpty)
  }

  /** SemDeDup over the index's TRAINED geometry — the amortization story:
    * one clustering pays for search ([[search]]), diversity sampling, AND
    * near-dup pruning. No file pruning here (dedup reads every row); the
    * saving is skipping the Lloyd loop — a fresh index reduces dedup to
    * one broadcast assignment plus the bounded within-cluster pair join.
    * Stale index retrains on the fly (identical output to a rebuild).
    * Output: (vec_id, label, list_id, c2c) survivors — the
    * [[graft.llm.Clustering.semSurvivors]] keep-the-outlier rule. */
  def semDedup(spark: SparkSession, table: String, colName: String,
      labelCol: String): DataFrame =
    rowsAndCentsByPart(spark, table, colName, labelCol,
        "SEMANTIC DEDUP") match {
      case Some((rows, cents, coarse)) =>
        // BY PARTITION (r14 — the r13 refusal lifted): SemDeDup runs
        // per slice against the stored sub-geometries in one
        // part-keyed dataflow — candidates require a shared partition
        // AND cluster AND sign-band bucket, each slice under its OWN
        // size-derived banding
        graft.llm.Clustering.semSurvivorsByPart(
          graft.llm.Similarity.assignListsHierByPartLocal(rows, cents, coarse),
          cents)
      case None =>
        val (rows, cents, coarse) = rowsAndCents(spark, table, colName,
          labelCol, "SEMANTIC DEDUP")
        // the corpus count sizes the banded pair join's LSH geometry —
        // the same pre-planning cardinality read the LSH dedup tier does
        graft.llm.Clustering.semSurvivors(
          graft.llm.Similarity.assignListsHierLocal(rows, cents, coarse),
          cents, rows.count())
    }

  /** INCREMENTAL SemDeDup against the index's STORED artifacts — the
    * daily-ingest shape with NOTHING corpus-sized recomputed per batch
    * (the r12 verdict's weak item, resolved): batch rows assign against
    * the stored centroids (per-row broadcast math), derive band keys
    * against the stored anchor panel (`lshanch/`), and join the stored
    * corpus band sidecar (`bands/` — the C69 stored-signature pattern);
    * corpus embeddings are fetched ONLY from the candidate buckets' files
    * (the sidecar carries each row's file). A batch row is a dup iff some
    * corpus row in a shared (cluster ∩ sign-band bucket) sits within
    * cosine τ — the curated corpus always wins; min-id witness reported.
    * Per-batch cost: O(\|batch\| × bucket) join work + a scan of candidate
    * files only — at 100 TB a daily ingest touches ~\|batch\|/corpus of
    * the table's files, never the corpus.
    *
    * `batch` carries the table's own id + embedding columns (external
    * rows: ids are the caller's keys, reported back as-is). Output:
    * (vec_id, dup_of, is_dup) per batch row. Stale index: the onStale
    * policy applies; `retrain` replays geometry + panel + bands in-query
    * (exactly a rebuild's answer). */
  def semDedupIncremental(spark: SparkSession, table: String,
      colName: String, batch: DataFrame): DataFrame =
    semDedupIncrementalAttempt(spark, table, colName, batch,
      allowRefresh = true)

  private def semDedupIncrementalAttempt(spark: SparkSession, table: String,
      colName: String, batch: DataFrame,
      allowRefresh: Boolean): DataFrame = {
    import graft.llm.{Clustering, Dedup, Similarity}
    import graft.llm.PortableHash.dotFixed
    val op = "SEMANTIC DEDUP INCREMENTAL"
    val mt = resolveTable(spark, table, op)
    val m = Manifest.read(mt.dir).getOrElse(
      throw new IllegalStateException(s"$op: no manifest at ${mt.dir}"))
    val prop = m.props.getOrElse(PropPrefix + colName.toLowerCase,
      throw new IllegalStateException(
        s"$op: no vector index on $table ($colName) — CREATE VECTOR INDEX " +
          "first (its build writes the band sidecars this serves from)"))
    val p = parseProp(prop)
    val names = m.entries.filter(_.rows > 0).map(_.name)
    val b0 = batch.select(col(p.idCol).as("vec_id"), lit(0).as("label"),
      col(colName).as("embedding"))
    def result(matched: DataFrame): DataFrame =
      b0.select(col("vec_id"))
        .join(matched, col("vec_id") === col("vn"), "left")
        .select(col("vec_id"), col("dup_of"),
          col("dup_of").isNotNull.as("is_dup"))
        .orderBy("vec_id")
    def fused(batchBands: DataFrame, corpusBands: DataFrame): DataFrame =
      batchBands.join(corpusBands,
          col("band") === col("oband") && col("bkey") === col("obkey") &&
            col("l_n") === col("l_o") &&
            dotFixed(col("e_n"), col("e_o")) >= Clustering.SemThreshold)
        .groupBy("vn").agg(min(col("vo")).as("dup_of"))
    def batchBandsOf(cents: DataFrame, anchorArr: DataFrame,
        nBands: Int, bits: Int): DataFrame =
      Dedup.embeddingBandRowsWith(
          Similarity.assignListsHierLocal(b0, cents, p.coarse),
          anchorArr, nBands, bits, carry = Seq("embedding", "list_id"))
        .select(col("vec_id").as("vn"), col("band"), col("bkey"),
          col("embedding").as("e_n"), col("list_id").as("l_n"))

    // the partitioned batch routes each row to ITS OWN partition's
    // geometry by the table's partition column — candidates (and dup
    // verdicts) stay within-partition, the date-partitioned corpus rule
    def partKeyBatch(pc: String): DataFrame =
      batch.select(col(p.idCol).as("vec_id"), lit(0).as("label"),
        col(colName).as("embedding"), col(pc).cast("string").as("part"))

    if (p.isCurrent(digestOf(m))) {
      val idxDir = mt.dir.resolve(p.idxName)
      if (!java.nio.file.Files.exists(idxDir.resolve("lshanch")))
        throw new IllegalStateException(
          s"$op: the index on $table ($colName) predates the band " +
            "sidecars — re-run CREATE VECTOR INDEX to materialize them")
      p.partCol match {
        case Some(pc) =>
          // BY PARTITION (r14): batch rows assign against their own
          // partition's stored centroids, derive band keys against its
          // stored panel (per-slice geometry — the part-keyed fold), and
          // join the part-keyed bands sidecar; only candidate buckets'
          // files are scanned for corpus embeddings. ONE dataflow, one
          // bounded driver collect — the C224 serving contract composed
          // with partition routing.
          val cents = spark.read.parquet(idxDir.resolve("cents").toString)
          val geo = spark.read.parquet(idxDir.resolve("lshanch").toString)
          val batchBands = Dedup.embeddingBandRowsByPart(
              Similarity.assignListsHierByPartLocal(partKeyBatch(pc), cents,
                p.coarse),
              geo, carry = Seq("embedding", "list_id"))
            .select(col("part"), col("vec_id").as("vn"), col("band"),
              col("bkey"), col("embedding").as("e_n"),
              col("list_id").as("l_n"))
          val corpusBands = spark.read
            .parquet(idxDir.resolve("bands").toString)
            .select(col("part").as("opart"), col("vec_id").as("vo"),
              col("band").as("oband"), col("bkey").as("obkey"),
              col("list_id").as("l_o"), col("file"))
          val cand = batchBands.join(corpusBands,
              col("part") === col("opart") &&
                col("band") === col("oband") &&
                col("bkey") === col("obkey") && col("l_n") === col("l_o"))
            .select(col("part"), col("vn"), col("e_n"), col("vo"),
              col("file"))
            .localCheckpoint()
          val candFiles = cand.select("file").distinct()
            .collect().map(_.getString(0))
          val matched =
            if (candFiles.isEmpty) {
              val idType = m.schema.fields
                .find(_.name.equalsIgnoreCase(p.idCol)).map(_.dataType)
                .getOrElse(org.apache.spark.sql.types.LongType)
              spark.range(0).select(col("id").cast(idType).as("vn"),
                col("id").cast(idType).as("dup_of"))
            } else {
              // fetch keys on (part, id), not id alone (r15 advice):
              // ids only need be unique within a partition, so the
              // corpus row must come from the candidate's OWN slice
              val corpusEmb = scanFiles(spark, mt.dir, candFiles.toSeq)
                .select(col(p.partCol.get).cast("string").as("part"),
                  col(p.idCol).as("vo"), col(colName).as("e_o"))
              cand.join(corpusEmb, Seq("part", "vo"))
                .where(dotFixed(col("e_n"), col("e_o")) >=
                  Clustering.SemThreshold)
                .groupBy("vn").agg(min(col("vo")).as("dup_of"))
            }
          return result(matched)
        case None => ()
      }
      val cents = spark.read.parquet(idxDir.resolve("cents").toString)
      val anchDf = spark.read.parquet(idxDir.resolve("lshanch").toString)
        .localCheckpoint() // 1 row; read for meta AND the broadcast panel
      val meta = anchDf.select(col("n_bands"), col("bits")).collect().head
      val batchBands = batchBandsOf(cents, anchDf.select(col("anchors")),
        meta.getInt(0), meta.getInt(1))
      // candidate pairs straight off the sidecar (no corpus scan yet);
      // materialized once — they drive BOTH the candidate-file planning
      // and the embedding fetch join
      val cand = batchBands.join(
          spark.read.parquet(idxDir.resolve("bands").toString)
            .select(col("vec_id").as("vo"), col("band").as("oband"),
              col("bkey").as("obkey"), col("list_id").as("l_o"),
              col("file")),
          col("band") === col("oband") && col("bkey") === col("obkey") &&
            col("l_n") === col("l_o"))
        .select(col("vn"), col("e_n"), col("vo"), col("file"))
        .localCheckpoint()
      val candFiles = cand.select("file").distinct()
        .collect().map(_.getString(0))
      val matched =
        if (candFiles.isEmpty) {
          val idType = m.schema.fields
            .find(_.name.equalsIgnoreCase(p.idCol)).map(_.dataType)
            .getOrElse(org.apache.spark.sql.types.LongType)
          spark.range(0).select(col("id").cast(idType).as("vn"),
            col("id").cast(idType).as("dup_of"))
        } else {
          // ONLY the candidate buckets' files are scanned for embeddings
          // — the bounded-fetch contract VectorIndexSpec pins
          val corpusEmb = scanFiles(spark, mt.dir, candFiles.toSeq)
            .select(col(p.idCol).as("vo"), col(colName).as("e_o"))
          cand.join(corpusEmb, "vo")
            .where(dotFixed(col("e_n"), col("e_o")) >=
              Clustering.SemThreshold)
            .groupBy("vn").agg(min(col("vo")).as("dup_of"))
        }
      result(matched)
    } else onStale(spark) match {
      case "fail" => staleRefused(op, table)
      case "refresh" if allowRefresh =>
        refuseRefreshIfReadOnly(spark, op)
        refresh(spark, mt.dir, colName)
        semDedupIncrementalAttempt(spark, table, colName, batch,
          allowRefresh = false)
      case _ if p.partCol.isDefined =>
        // in-query replay of the PARTITIONED build artifacts (per-slice
        // ranked geometry + per-slice panel + bands), one part-keyed
        // dataflow — exactly a partitioned rebuild's answer, minus the
        // file-bounded fetch. The per-slice LSH geometry derives from
        // slice sizes via ONE bounded collect (parts rows).
        val pc = p.partCol.get
        val rows = scanFiles(spark, mt.dir, names)
          .select(col(p.idCol).as("vec_id"), lit(0).as("label"),
            col(colName).as("embedding"),
            col(pc).cast("string").as("part"))
        val geo0 = spark.createDataFrame(
          rows.groupBy("part").count().collect().toSeq.map { r =>
            val (nb, bt) = Dedup.embeddingLshParams(r.getLong(1))
            (r.getString(0), nb, bt)
          }).toDF("part", "n_bands", "bits")
        // the ranked anchor panel per part — bandAnchorsRanked's
        // orderBy-limit, replayed as a rank window bounded per part
        val wr = org.apache.spark.sql.expressions.Window
          .partitionBy("part").orderBy("vec_id")
        val anch = rows.select(col("part"), col("vec_id"), col("embedding"))
          .withColumn("rk", row_number().over(wr))
          .join(broadcast(geo0.select(col("part"),
            (col("n_bands") * col("bits")).as("slots"))), "part")
          .where(col("rk") <= col("slots"))
          .groupBy("part")
          .agg(array_sort(collect_list(struct(col("vec_id").as("a_id"),
            col("embedding").as("a_emb")))).as("anchors"))
        val geo = geo0.join(anch, "part").coalesce(1).localCheckpoint()
        val (corpusAssigned, cents) = retrainGeometryRankedByPart(rows, p)
        val corpusBands = Dedup.embeddingBandRowsByPart(corpusAssigned,
            geo, carry = Seq("embedding", "list_id"))
          .select(col("part").as("opart"), col("vec_id").as("vo"),
            col("band").as("oband"), col("bkey").as("obkey"),
            col("embedding").as("e_o"), col("list_id").as("l_o"))
        val batchBands = Dedup.embeddingBandRowsByPart(
            Similarity.assignListsHierByPartLocal(partKeyBatch(pc), cents,
              p.coarse),
            geo, carry = Seq("embedding", "list_id"))
          .select(col("part"), col("vec_id").as("vn"), col("band"),
            col("bkey"), col("embedding").as("e_n"),
            col("list_id").as("l_n"))
        result(batchBands.join(corpusBands,
            col("part") === col("opart") && col("band") === col("oband") &&
              col("bkey") === col("obkey") && col("l_n") === col("l_o") &&
              dotFixed(col("e_n"), col("e_o")) >= Clustering.SemThreshold)
          .groupBy("vn").agg(min(col("vo")).as("dup_of")))
      case _ =>
        // in-query replay of the build artifacts (geometry + ranked
        // panel + corpus bands) — exactly a rebuild's answer, minus the
        // file-bounded fetch; the corpus side carries embeddings inline
        val rows = scanFiles(spark, mt.dir, names)
          .select(col(p.idCol).as("vec_id"), lit(0).as("label"),
            col(colName).as("embedding"))
        val n = rows.count()
        val (corpusAssigned, cents) = retrainGeometry(rows, p, n)
        val (nBands, bits) = Dedup.embeddingLshParams(n)
        val anch = Dedup.bandAnchorsRanked(
          rows.select(col("vec_id"), col("embedding")), nBands, bits)
          .localCheckpoint() // broadcast by BOTH band derivations
        val corpusBands = Dedup.embeddingBandRowsWith(corpusAssigned, anch,
            nBands, bits, carry = Seq("embedding", "list_id"))
          .select(col("vec_id").as("vo"), col("band").as("oband"),
            col("bkey").as("obkey"), col("embedding").as("e_o"),
            col("list_id").as("l_o"))
        result(fused(batchBandsOf(cents, anch, nBands, bits), corpusBands))
    }
  }

  /** TIME-TRAVEL incremental SemDeDup (r15 — the C238 audit posture for
    * the curation tier): answer "which of these rows were near-dups of
    * the corpus AS OF version v" — reproducing an ingest batch's
    * admission verdicts exactly as they were computed, after the corpus
    * moved on. The snapshot manifest's own `vecidx.` prop serves its
    * HISTORICAL sidecars (centroids, anchor panel, band rows), the
    * candidate-bucket fetch pins both the files and the snapshot's DV
    * state, so corpus rows added (or deletion-vectored) after the
    * version neither witness nor un-witness any batch row. A snapshot
    * whose index was stale or reaped replays the build artifacts over
    * the snapshot rows (per-slice ranked for BY PARTITION). Output
    * (vec_id, dup_of, is_dup) like [[semDedupIncremental]]. */
  def semDedupIncrementalAsOf(spark: SparkSession, table: String,
      colName: String, batch: DataFrame, version: Int): DataFrame = {
    import graft.llm.{Clustering, Dedup, Similarity}
    import graft.llm.PortableHash.dotFixed
    val op = "SEMANTIC DEDUP INCREMENTAL AS OF"
    val mt = resolveTable(spark, table, op)
    val m = Manifest.readSnapshot(mt.dir, version).getOrElse(
      throw new IllegalArgumentException(
        s"$op: snapshot $version expired or never existed at ${mt.dir}"))
    val p = parseProp(m.props.getOrElse(PropPrefix + colName.toLowerCase,
      throw new IllegalStateException(
        s"$op: no vector index on $table ($colName) existed as of " +
          s"version $version — the snapshot carries no vecidx prop")))
    val names = m.entries.filter(_.rows > 0).map(_.name)
    def snapScan(fs: Seq[String]): DataFrame =
      spark.read.format("graft.sources.GraftManifestSink")
        .option("path", mt.dir.toString)
        .option("snapshot", version.toString)
        .option("files", fs.mkString(","))
        .load()
    val b0 = batch.select(col(p.idCol).as("vec_id"), lit(0).as("label"),
      col(colName).as("embedding"))
    def result(matched: DataFrame): DataFrame =
      b0.select(col("vec_id"))
        .join(matched, col("vec_id") === col("vn"), "left")
        .select(col("vec_id"), col("dup_of"),
          col("dup_of").isNotNull.as("is_dup"))
        .orderBy("vec_id")
    def fused(batchBands: DataFrame, corpusBands: DataFrame): DataFrame =
      batchBands.join(corpusBands,
          col("band") === col("oband") && col("bkey") === col("obkey") &&
            col("l_n") === col("l_o") &&
            dotFixed(col("e_n"), col("e_o")) >= Clustering.SemThreshold)
        .groupBy("vn").agg(min(col("vo")).as("dup_of"))
    def batchBandsOf(cents: DataFrame, anchorArr: DataFrame,
        nBands: Int, bits: Int): DataFrame =
      Dedup.embeddingBandRowsWith(
          Similarity.assignListsHierLocal(b0, cents, p.coarse),
          anchorArr, nBands, bits, carry = Seq("embedding", "list_id"))
        .select(col("vec_id").as("vn"), col("band"), col("bkey"),
          col("embedding").as("e_n"), col("list_id").as("l_n"))
    def partKeyBatch(pc: String): DataFrame =
      batch.select(col(p.idCol).as("vec_id"), lit(0).as("label"),
        col(colName).as("embedding"), col(pc).cast("string").as("part"))
    val idxDir = mt.dir.resolve(p.idxName)
    val servable = p.isCurrent(digestOf(m)) &&
      Seq("cents", "lshanch", "bands").forall(s =>
        java.nio.file.Files.exists(idxDir.resolve(s)))
    if (servable) {
      p.partCol match {
        case Some(pc) =>
          // BY PARTITION at the version: batch rows assign against
          // their partition's HISTORICAL centroids/panels, join the
          // historical band sidecar, and fetch corpus embeddings from
          // candidate-bucket files through the snapshot-pinned scan,
          // keyed (part, vec_id)
          val cents = spark.read.parquet(idxDir.resolve("cents").toString)
          val geo = spark.read.parquet(idxDir.resolve("lshanch").toString)
          val batchBands = Dedup.embeddingBandRowsByPart(
              Similarity.assignListsHierByPartLocal(partKeyBatch(pc),
                cents, p.coarse),
              geo, carry = Seq("embedding", "list_id"))
            .select(col("part"), col("vec_id").as("vn"), col("band"),
              col("bkey"), col("embedding").as("e_n"),
              col("list_id").as("l_n"))
          val corpusBands = spark.read
            .parquet(idxDir.resolve("bands").toString)
            .select(col("part").as("opart"), col("vec_id").as("vo"),
              col("band").as("oband"), col("bkey").as("obkey"),
              col("list_id").as("l_o"), col("file"))
          val cand = batchBands.join(corpusBands,
              col("part") === col("opart") &&
                col("band") === col("oband") &&
                col("bkey") === col("obkey") && col("l_n") === col("l_o"))
            .select(col("part"), col("vn"), col("e_n"), col("vo"),
              col("file"))
            .localCheckpoint()
          val candFiles = cand.select("file").distinct()
            .collect().map(_.getString(0))
          val matched =
            if (candFiles.isEmpty) {
              val idType = m.schema.fields
                .find(_.name.equalsIgnoreCase(p.idCol)).map(_.dataType)
                .getOrElse(org.apache.spark.sql.types.LongType)
              spark.range(0).select(col("id").cast(idType).as("vn"),
                col("id").cast(idType).as("dup_of"))
            } else {
              val corpusEmb = snapScan(candFiles.toSeq)
                .select(col(pc).cast("string").as("part"),
                  col(p.idCol).as("vo"), col(colName).as("e_o"))
              cand.join(corpusEmb, Seq("part", "vo"))
                .where(dotFixed(col("e_n"), col("e_o")) >=
                  Clustering.SemThreshold)
                .groupBy("vn").agg(min(col("vo")).as("dup_of"))
            }
          result(matched)
        case None =>
          val cents = spark.read.parquet(idxDir.resolve("cents").toString)
          val anchDf = spark.read
            .parquet(idxDir.resolve("lshanch").toString)
            .localCheckpoint()
          val meta = anchDf.select(col("n_bands"), col("bits"))
            .collect().head
          val batchBands = batchBandsOf(cents,
            anchDf.select(col("anchors")), meta.getInt(0), meta.getInt(1))
          val cand = batchBands.join(
              spark.read.parquet(idxDir.resolve("bands").toString)
                .select(col("vec_id").as("vo"), col("band").as("oband"),
                  col("bkey").as("obkey"), col("list_id").as("l_o"),
                  col("file")),
              col("band") === col("oband") && col("bkey") === col("obkey") &&
                col("l_n") === col("l_o"))
            .select(col("vn"), col("e_n"), col("vo"), col("file"))
            .localCheckpoint()
          val candFiles = cand.select("file").distinct()
            .collect().map(_.getString(0))
          val matched =
            if (candFiles.isEmpty) {
              val idType = m.schema.fields
                .find(_.name.equalsIgnoreCase(p.idCol)).map(_.dataType)
                .getOrElse(org.apache.spark.sql.types.LongType)
              spark.range(0).select(col("id").cast(idType).as("vn"),
                col("id").cast(idType).as("dup_of"))
            } else {
              val corpusEmb = snapScan(candFiles.toSeq)
                .select(col(p.idCol).as("vo"), col(colName).as("e_o"))
              cand.join(corpusEmb, "vo")
                .where(dotFixed(col("e_n"), col("e_o")) >=
                  Clustering.SemThreshold)
                .groupBy("vn").agg(min(col("vo")).as("dup_of"))
            }
          result(matched)
      }
    } else p.partCol match {
      case Some(pc) =>
        // stale/reaped snapshot, partitioned: replay the per-slice
        // build artifacts over the SNAPSHOT rows (ranked geometry,
        // per-slice size-derived panels, band rows) in one part-keyed
        // dataflow — a partitioned rebuild's answer at the version
        val rows = snapScan(names)
          .select(col(p.idCol).as("vec_id"), lit(0).as("label"),
            col(colName).as("embedding"),
            col(pc).cast("string").as("part"))
        val geo0 = spark.createDataFrame(
          rows.groupBy("part").count().collect().toSeq.map { r =>
            val (nb, bt) = Dedup.embeddingLshParams(r.getLong(1))
            (r.getString(0), nb, bt)
          }).toDF("part", "n_bands", "bits")
        val wr = org.apache.spark.sql.expressions.Window
          .partitionBy("part").orderBy("vec_id")
        val anch = rows.select(col("part"), col("vec_id"), col("embedding"))
          .withColumn("rk", row_number().over(wr))
          .join(broadcast(geo0.select(col("part"),
            (col("n_bands") * col("bits")).as("slots"))), "part")
          .where(col("rk") <= col("slots"))
          .groupBy("part")
          .agg(array_sort(collect_list(struct(col("vec_id").as("a_id"),
            col("embedding").as("a_emb")))).as("anchors"))
        val geo = geo0.join(anch, "part").coalesce(1).localCheckpoint()
        val (corpusAssigned, cents) = retrainGeometryRankedByPart(rows, p)
        val corpusBands = Dedup.embeddingBandRowsByPart(corpusAssigned,
            geo, carry = Seq("embedding", "list_id"))
          .select(col("part").as("opart"), col("vec_id").as("vo"),
            col("band").as("oband"), col("bkey").as("obkey"),
            col("embedding").as("e_o"), col("list_id").as("l_o"))
        val batchBands = Dedup.embeddingBandRowsByPart(
            Similarity.assignListsHierByPartLocal(partKeyBatch(pc), cents,
              p.coarse),
            geo, carry = Seq("embedding", "list_id"))
          .select(col("part"), col("vec_id").as("vn"), col("band"),
            col("bkey"), col("embedding").as("e_n"),
            col("list_id").as("l_n"))
        result(batchBands.join(corpusBands,
            col("part") === col("opart") && col("band") === col("oband") &&
              col("bkey") === col("obkey") && col("l_n") === col("l_o") &&
              dotFixed(col("e_n"), col("e_o")) >= Clustering.SemThreshold)
          .groupBy("vn").agg(min(col("vo")).as("dup_of")))
      case None =>
        // stale/reaped snapshot, global: replay geometry + ranked panel
        // + corpus bands over the snapshot rows
        val rows = snapScan(names)
          .select(col(p.idCol).as("vec_id"), lit(0).as("label"),
            col(colName).as("embedding"))
        val n = rows.count()
        val (corpusAssigned, cents) = retrainGeometry(rows, p, n)
        val (nBands, bits) = Dedup.embeddingLshParams(n)
        val anch = Dedup.bandAnchorsRanked(
          rows.select(col("vec_id"), col("embedding")), nBands, bits)
          .localCheckpoint()
        val corpusBands = Dedup.embeddingBandRowsWith(corpusAssigned, anch,
            nBands, bits, carry = Seq("embedding", "list_id"))
          .select(col("vec_id").as("vo"), col("band").as("oband"),
            col("bkey").as("obkey"), col("embedding").as("e_o"),
            col("list_id").as("l_o"))
        result(fused(batchBandsOf(cents, anch, nBands, bits), corpusBands))
    }
  }

  /** Diversity-balanced sampling over the index's TRAINED geometry — the
    * third leg of the amortization ([[search]], [[semDedup]]): each stored
    * cluster's capped hash-ordered members, with zero clustering work in
    * the query when the index is fresh. Stale index retrains (identical
    * output to a rebuild). Output: (list_id, rk, vec_id, label). */
  def clusterSample(spark: SparkSession, table: String, colName: String,
      labelCol: String): DataFrame =
    rowsAndCentsByPart(spark, table, colName, labelCol,
        "CLUSTER SAMPLE") match {
      case Some((rows, cents, coarse)) =>
        // BY PARTITION (r14): every SLICE's clusters contribute their
        // capped hash-ordered members; part rides the output (slice
        // list ids collide across partitions by construction)
        graft.llm.Clustering.clusterSampleByPart(
          graft.llm.Similarity.assignListsHierByPartLocal(rows, cents, coarse))
      case None =>
        val (rows, cents, coarse) = rowsAndCents(spark, table, colName,
          labelCol, "CLUSTER SAMPLE")
        graft.llm.Clustering.clusterSample(
          graft.llm.Similarity.assignListsHierLocal(rows, cents, coarse))
    }

  /** INDEX-BACKED kNN JOIN — "for each batch row, its k nearest CORPUS
    * rows": the retrieval/augmentation join (RAG candidate fetch, label
    * propagation, hard-negative mining) served from the STORED geometry
    * with NOTHING corpus-sized recomputed per batch. Each batch row
    * takes its home list by per-row broadcast math against the stored
    * centroids (flat argmax — the probe rule [[search]] uses), corpus
    * candidates fetch from ONLY the probed lists' posting files (each
    * fetched row re-derives its stored cluster, so the list equi-join is
    * exact w.r.t. the kept geometry), and a ranked window per batch row
    * takes the top-k. IVF-approximate like [[search]]: a neighbor
    * outside a batch row's home list doesn't surface — the documented
    * recall trade the audits monitor. Per-batch cost: Σ probed-list
    * sizes of join work + a scan of the probed lists' files — a small
    * batch reads a handful of the corpus's files, never the corpus.
    * `batch` carries the table's own id + embedding columns; output
    * `(vec_id, rank, nn_id, sim)`, rank 1..k per batch row (no
    * self-exclusion: the batch is external — an exact corpus copy is
    * legitimately rank 1). Stale index: the onStale policy (`retrain`
    * replays geometry in-query — exactly a rebuild's answer, no pruning;
    * `refresh` = the bounded catch-up; `fail` refuses). */
  def knnJoin(spark: SparkSession, table: String, colName: String,
      batch: DataFrame, k: Int): DataFrame =
    knnJoinAttempt(spark, table, colName, batch, k, None,
      allowRefresh = true)

  /** FILTERED kNN JOIN — the predicate narrows the CANDIDATES before
    * each batch row's top-k (the filtered-ANN rule applied to the batch
    * join: filtering the output would under-fill every row's k). The
    * predicate references the table's own columns and evaluates
    * scan-side over the probed lists' files — pushdown and zone-map file
    * skipping stack with the posting pruning. */
  def knnJoinWhere(spark: SparkSession, table: String, colName: String,
      batch: DataFrame, k: Int,
      predicate: org.apache.spark.sql.Column): DataFrame =
    knnJoinAttempt(spark, table, colName, batch, k, Some(predicate),
      allowRefresh = true)

  private def knnJoinAttempt(spark: SparkSession, table: String,
      colName: String, batch: DataFrame, k: Int,
      predicate: Option[org.apache.spark.sql.Column],
      allowRefresh: Boolean): DataFrame = {
    import graft.llm.Similarity
    import graft.llm.PortableHash.dotFixed
    val op = "KNN JOIN"
    val mt = resolveTable(spark, table, op)
    val m = Manifest.read(mt.dir).getOrElse(
      throw new IllegalStateException(s"$op: no manifest at ${mt.dir}"))
    val prop = m.props.getOrElse(PropPrefix + colName.toLowerCase,
      throw new IllegalStateException(
        s"$op: no vector index on $table ($colName) — CREATE VECTOR INDEX " +
          "first"))
    val p = parseProp(prop)
    val b0 = batch.select(col(p.idCol).as("vec_id"), lit(0).as("label"),
      col(colName).as("embedding"))
    def rekey(df: DataFrame): DataFrame =
      df.select(col(p.idCol).as("vec_id"), lit(0).as("label"),
        col(colName).as("embedding"))
    // per-(batch row, candidate) pairs with each row's local top-k — the
    // building block both the global path and the per-pin sub-joins use
    def rankedPairs(bAssigned: DataFrame,
        corpusAssigned: DataFrame): DataFrame = {
      val x = bAssigned.select(col("vec_id").as("bid"),
        col("embedding").as("e_n"), col("list_id"))
      val y = corpusAssigned.select(col("list_id"),
        col("vec_id").as("nn_id"), col("embedding").as("e_o"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("bid").orderBy(desc("sim"), col("nn_id"))
      x.join(y, Seq("list_id"))
        .select(col("bid"), col("nn_id"),
          dotFixed(col("e_n"), col("e_o")).as("sim"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= k)
        .select(col("bid"), col("nn_id"), col("sim"))
    }
    def finish(pairs: DataFrame): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("bid").orderBy(desc("sim"), col("nn_id"))
      pairs
        .withColumn("rank", row_number().over(w)
          .cast(org.apache.spark.sql.types.IntegerType))
        .filter(col("rank") <= k)
        .select(col("bid").as("vec_id"), col("rank"), col("nn_id"),
          col("sim"))
        .orderBy("vec_id", "rank")
    }
    def ranked(bAssigned: DataFrame, corpusAssigned: DataFrame): DataFrame =
      finish(rankedPairs(bAssigned, corpusAssigned))
    if (p.isCurrent(digestOf(m))) {
      val idxDir = mt.dir.resolve(p.idxName)
      p.partCol match {
        case Some(pc) =>
          // BY PARTITION (r13): pinned pins route to their OWN
          // sub-geometries, each contributing a per-(batch row, pin)
          // top-k; the global per-row top-k ranks the ≤ pins×k union.
          // NO pin = all partitions (the C225 rule applied to the batch
          // join — corpus-wide kNN joins without a second global index).
          // ONE part-keyed dataflow for any pin count (r14): the batch
          // assigns under EVERY pin's geometry in one fan-out pass,
          // candidate files come from one posting-sidecar join (the
          // single driver collect), and the candidate scan re-derives
          // each corpus row under ITS OWN partition's geometry — job
          // count independent of the partition count.
          val cents0 = spark.read.parquet(idxDir.resolve("cents").toString)
          val posts0 = spark.read.parquet(idxDir.resolve("posts").toString)
          val pins = predicate.flatMap(
            partitionPins(_, pc, partTypeOf(m, pc)))
          val centsP = pins.fold(cents0)(ps =>
            cents0.where(col("part").isin(ps: _*)))
          // |batch| × pins rows; an unseen pin value has no centroids
          // and contributes nothing. MATERIALIZED once: it drives the
          // candidate-file planning AND the ranked candidate join.
          val bAssigned = assignBatchAllParts(b0, centsP).localCheckpoint()
          val cand = posts0.join(
              bAssigned.select("part", "list_id").distinct(),
              Seq("part", "list_id"))
            .select("file").distinct().collect().map(_.getString(0))
          if (cand.isEmpty)
            finish(b0.select(col("vec_id").as("bid"),
              col("vec_id").as("nn_id"), lit(0L).as("sim"))
              .where(lit(false)))
          else {
            val scan0 = scanFiles(spark, mt.dir, cand.toSeq)
            val scanP = predicate.fold(scan0)(scan0.where)
              .select(col(p.idCol).as("vec_id"), lit(0).as("label"),
                col(colName).as("embedding"),
                col(pc).cast("string").as("part"))
            val corpusP = pins.fold(scanP)(ps =>
              scanP.where(col("part").isin(ps: _*)))
            val corpusAssigned = Similarity.assignListsHierByPartLocal(
              corpusP, centsP, p.coarse)
            // per-(batch row, part) top-k — the old per-pin rankedPairs
            // — then the global per-row top-k over the union
            val wpp = org.apache.spark.sql.expressions.Window
              .partitionBy("bid", "part").orderBy(desc("sim"), col("nn_id"))
            val pairs = bAssigned
              .select(col("part"), col("vec_id").as("bid"),
                col("embedding").as("e_n"), col("list_id"))
              .join(corpusAssigned.select(col("part"), col("list_id"),
                  col("vec_id").as("nn_id"), col("embedding").as("e_o")),
                Seq("part", "list_id"))
              .select(col("bid"), col("part"), col("nn_id"),
                dotFixed(col("e_n"), col("e_o")).as("sim"))
              .withColumn("rk", row_number().over(wpp))
              .filter(col("rk") <= k)
              .select(col("bid"), col("nn_id"), col("sim"))
            finish(pairs)
          }
        case None =>
          val cents = spark.read.parquet(idxDir.resolve("cents").toString)
          // MATERIALIZE the batch assignment once: it drives BOTH the
          // probed-list planning and the candidate join (bounded by the
          // batch)
          val bAssigned = Similarity.assignLists(b0, cents).localCheckpoint()
          val probed = bAssigned.select("list_id").distinct()
            .collect().map(_.getInt(0)).toSeq
          val candFiles =
            if (probed.isEmpty) Seq.empty[String]
            else spark.read.parquet(idxDir.resolve("posts").toString)
              .where(col("list_id").isin(probed: _*))
              .select("file").distinct().collect().map(_.getString(0)).toSeq
          // the predicate narrows the candidate rows INSIDE the probed
          // files' scan (pushdown + zone-map skipping apply) BEFORE the
          // re-derivation and the per-row top-k
          val candScan =
            if (candFiles.isEmpty) spark.table(table).where(lit(false))
            else scanFiles(spark, mt.dir, candFiles)
          val corpusAssigned = Similarity.assignListsHierLocal(
            rekey(predicate.fold(candScan)(candScan.where)), cents, p.coarse)
          ranked(bAssigned, corpusAssigned)
      }
    } else onStale(spark) match {
      case "fail" => staleRefused(op, table)
      case "refresh" if allowRefresh =>
        refuseRefreshIfReadOnly(spark, op)
        refresh(spark, mt.dir, colName)
        knnJoinAttempt(spark, table, colName, batch, k, predicate,
          allowRefresh = false)
      case _ =>
        // in-query replay of the build geometry — exactly a rebuild's
        // answer, minus the file-bounded fetch; the geometry trains on
        // the FULL corpus (or, BY PARTITION, per pinned slice with
        // ranked seeding — the sub-index rule), the predicate narrows
        // candidates only
        val names = m.entries.filter(_.rows > 0).map(_.name)
        val all = scanFiles(spark, mt.dir, names)
        p.partCol match {
          case Some(pc) =>
            // pinned partitions retrain their ranked, SAMPLE-aware
            // sub-geometries in ONE part-keyed dataflow (r14 — formerly
            // a sequential per-pin kmeans loop that also ignored the
            // persisted SAMPLE policy), the batch fans out under every
            // pin's retrained geometry, and per-(row, part) top-ks
            // union into the global per-row top-k — a rebuild's answer.
            val pins = predicate.flatMap(
              partitionPins(_, pc, partTypeOf(m, pc)))
            def partKey(df: DataFrame): DataFrame = {
              val keyed = df.select(col(p.idCol).as("vec_id"),
                lit(0).as("label"), col(colName).as("embedding"),
                col(pc).cast("string").as("part"))
              pins.fold(keyed)(ps => keyed.where(col("part").isin(ps: _*)))
            }
            val cents = retrainGeometryRankedByPart(partKey(all), p)._2
            val bAssigned = assignBatchAllParts(b0, cents)
            val corpusAssigned = Similarity.assignListsHierByPartLocal(
              partKey(predicate.fold(all)(all.where)), cents, p.coarse)
            val wpp = org.apache.spark.sql.expressions.Window
              .partitionBy("bid", "part").orderBy(desc("sim"), col("nn_id"))
            finish(bAssigned
              .select(col("part"), col("vec_id").as("bid"),
                col("embedding").as("e_n"), col("list_id"))
              .join(corpusAssigned.select(col("part"), col("list_id"),
                  col("vec_id").as("nn_id"), col("embedding").as("e_o")),
                Seq("part", "list_id"))
              .select(col("bid"), col("part"), col("nn_id"),
                dotFixed(col("e_n"), col("e_o")).as("sim"))
              .withColumn("rk", row_number().over(wpp))
              .filter(col("rk") <= k)
              .select(col("bid"), col("nn_id"), col("sim")))
          case None =>
            val rows = rekey(all)
            val (_, cents) = retrainGeometry(rows, p, rows.count())
            val corpusAssigned = Similarity.assignListsHierLocal(
              rekey(predicate.fold(all)(all.where)), cents, p.coarse)
            ranked(Similarity.assignLists(b0, cents), corpusAssigned)
        }
    }
  }

  /** PQ-COMPRESSED kNN JOIN — [[knnJoin]] with the C213 two-stage
    * candidate cut applied per batch row: the ADC pre-rank runs over the
    * NARROW codes sidecar of the probed lists (embeddings unread), each
    * batch row keeps its ADC-top-`rerank` survivors, and ONLY the
    * survivors' rows fetch embeddings (their ≤ \|batch\|×rerank files,
    * broadcast id semi-join) for the exact fixed-point rerank. At 100 TB
    * the candidate scan is the batch join's whole cost — reading PqM
    * small ints per candidate instead of dim×4 B of floats is the same
    * 4-16× I/O cut searchPq makes, here amortized across the batch.
    * Approximation explicit and bounded exactly like [[searchPq]]: exact
    * top-k among each row's ADC-top-rerank. Output and policies match
    * [[knnJoin]]. */
  def knnJoinPq(spark: SparkSession, table: String, colName: String,
      batch: DataFrame, k: Int, rerank: Int = 50): DataFrame =
    knnJoinPqAttempt(spark, table, colName, batch, k, rerank, None,
      allowRefresh = true)

  /** FILTERED PQ kNN JOIN — the predicate semi-joins the codes BEFORE
    * each row's ADC rerank cutoff (the filtered-PQ rule per batch row: a
    * selective filter must never under-fill any row's rerank budget);
    * the probed lists' files scan for the predicate columns only. */
  def knnJoinPqWhere(spark: SparkSession, table: String, colName: String,
      batch: DataFrame, k: Int, rerank: Int,
      predicate: org.apache.spark.sql.Column): DataFrame =
    knnJoinPqAttempt(spark, table, colName, batch, k, rerank,
      Some(predicate), allowRefresh = true)

  private def knnJoinPqAttempt(spark: SparkSession, table: String,
      colName: String, batch: DataFrame, k: Int, rerank: Int,
      predicate: Option[org.apache.spark.sql.Column],
      allowRefresh: Boolean): DataFrame = {
    import graft.llm.Similarity
    import graft.llm.PortableHash.dotFixed
    val op = "KNN JOIN PQ"
    val mt = resolveTable(spark, table, op)
    val m = Manifest.read(mt.dir).getOrElse(
      throw new IllegalStateException(s"$op: no manifest at ${mt.dir}"))
    val prop = m.props.getOrElse(PropPrefix + colName.toLowerCase,
      throw new IllegalStateException(
        s"$op: no vector index on $table ($colName) — CREATE VECTOR INDEX " +
          "first"))
    val p = parseProp(prop)
    val b0 = batch.select(col(p.idCol).as("vec_id"), lit(0).as("label"),
      col(colName).as("embedding"))
    val wAdc = org.apache.spark.sql.expressions.Window
      .partitionBy("bid").orderBy(desc("sim_adc"), col("vec_id"))
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy("bid").orderBy(desc("sim"), col("nn_id"))
    def rankTop(pairs: DataFrame): DataFrame =
      pairs
        .withColumn("rank", row_number().over(wTop)
          .cast(org.apache.spark.sql.types.IntegerType))
        .filter(col("rank") <= k)
        .select(col("bid").as("vec_id"), col("rank"), col("nn_id"),
          col("sim"))
        .orderBy("vec_id", "rank")
    if (p.isCurrent(digestOf(m))) {
      val idxDir = mt.dir.resolve(p.idxName)
      if (!java.nio.file.Files.exists(idxDir.resolve("pqcb")))
        throw new IllegalStateException(
          s"$op: the index on $table ($colName) has no PQ codebook — " +
            "re-run CREATE VECTOR INDEX, or use knnJoin")
      p.partCol match {
        case Some(pc) =>
          // BY PARTITION (r14): the batch fans out under every pin's
          // geometry, its ADC pre-rank runs per (batch row, pin) over
          // that pin's OWN codes against that pin's OWN ranked codebook
          // (one part-keyed join — no per-pin loop), and only the
          // per-pin survivors' files fetch embeddings for the exact
          // per-row rerank — the C226 part-keyed codebooks serving the
          // batch join.
          val cents0 = spark.read.parquet(idxDir.resolve("cents").toString)
          val posts0 = spark.read.parquet(idxDir.resolve("posts").toString)
          val cb0 = spark.read.parquet(idxDir.resolve("pqcb").toString)
          val codesAll = spark.read.parquet(
            idxDir.resolve("codes").toString)
          val pins = predicate.flatMap(
            partitionPins(_, pc, partTypeOf(m, pc)))
          val centsP = pins.fold(cents0)(ps =>
            cents0.where(col("part").isin(ps: _*)))
          val bAssigned = assignBatchAllParts(b0, centsP).localCheckpoint()
          val bcodes = bAssigned
            .select(col("part"), col("vec_id").as("bid"),
              col("embedding").as("e_n"), col("list_id"))
            .join(codesAll, Seq("part", "list_id"))
          // the predicate narrows each pin's codes BEFORE the per-row
          // rerank cutoff (the filtered-PQ rule per batch row and pin)
          val bcodesF = predicate match {
            case None => bcodes
            case Some(pred) =>
              val pFiles = posts0.join(
                  bAssigned.select("part", "list_id").distinct(),
                  Seq("part", "list_id"))
                .select("file").distinct().collect().map(_.getString(0))
              if (pFiles.isEmpty) bcodes.where(lit(false))
              else {
                val match0 = scanFiles(spark, mt.dir, pFiles.toSeq)
                  .where(pred)
                  .select(col(p.idCol).as("vec_id"),
                    col(pc).cast("string").as("part"))
                val matching = pins.fold(match0)(ps =>
                  match0.where(col("part").isin(ps: _*)))
                bcodes.join(matching, Seq("part", "vec_id"), "left_semi")
              }
          }
          val cbByPart = cb0.groupBy("part")
            .agg(array_sort(collect_list(struct(col("c_id"), col("c_emb"))))
              .as("cents"))
          val wAdcP = org.apache.spark.sql.expressions.Window
            .partitionBy("bid", "part")
            .orderBy(desc("sim_adc"), col("vec_id"))
          val top = bcodesF.join(broadcast(cbByPart), "part")
            .withColumn("sim_adc",
              Similarity.pqAdc(col("cents"), col("e_n"),
                b => col(s"code$b")))
            .withColumn("rk", row_number().over(wAdcP))
            .filter(col("rk") <= rerank)
            .select(col("bid"), col("e_n"), col("part"), col("vec_id"),
              col("file"))
            .localCheckpoint()
          val candFiles = top.select("file").distinct()
            .collect().map(_.getString(0))
          val pairs =
            if (candFiles.isEmpty)
              top.select(col("bid"), col("vec_id").as("nn_id"),
                lit(0L).as("sim")).where(lit(false))
            // the fetch keys on (part, vec_id), not vec_id alone (r15
            // advice): ids only need be unique within a partition
            else scanFiles(spark, mt.dir, candFiles.toSeq)
              .select(col(pc).cast("string").as("part"),
                col(p.idCol).as("vec_id"), col(colName).as("e_o"))
              .join(broadcast(top), Seq("part", "vec_id"))
              .select(col("bid"), col("vec_id").as("nn_id"),
                dotFixed(col("e_n"), col("e_o")).as("sim"))
          return rankTop(pairs)
        case None => ()
      }
      val cents = spark.read.parquet(idxDir.resolve("cents").toString)
      val bAssigned = Similarity.assignLists(b0, cents).localCheckpoint()
      val probed = bAssigned.select("list_id").distinct()
        .collect().map(_.getInt(0)).toSeq
      val cbArr = pqCbArr(spark.read.parquet(idxDir.resolve("pqcb").toString))
      // ADC pre-rank per batch row over the narrow codes of the probed
      // lists — embeddings unread; survivors MATERIALIZE once (≤
      // |batch|×rerank rows) to drive the file pruning and the fetch
      val codesAll =
        if (probed.isEmpty)
          spark.read.parquet(idxDir.resolve("codes").toString)
            .where(lit(false))
        else spark.read.parquet(idxDir.resolve("codes").toString)
          .where(col("list_id").isin(probed: _*))
      // the predicate narrows the codes BEFORE each row's rerank cutoff
      // (the filtered-PQ rule): the probed lists' files scan for the
      // predicate columns only, matching ids semi-join the codes
      val codes0 = predicate match {
        case None => codesAll
        case Some(pred) =>
          val pFiles =
            if (probed.isEmpty) Array.empty[String]
            else spark.read.parquet(idxDir.resolve("posts").toString)
              .where(col("list_id").isin(probed: _*))
              .select("file").distinct().collect().map(_.getString(0))
          if (pFiles.isEmpty) codesAll.where(lit(false))
          else codesAll.join(
            scanFiles(spark, mt.dir, pFiles.toSeq).where(pred)
              .select(col(p.idCol).as("vec_id")),
            Seq("vec_id"), "left_semi")
      }
      val top = bAssigned
        .select(col("vec_id").as("bid"), col("embedding").as("e_n"),
          col("list_id"))
        .join(codes0, Seq("list_id"))
        .crossJoin(broadcast(cbArr))
        .withColumn("sim_adc",
          Similarity.pqAdc(col("cents"), col("e_n"), b => col(s"code$b")))
        .withColumn("rk", row_number().over(wAdc))
        .filter(col("rk") <= rerank)
        .select(col("bid"), col("e_n"), col("vec_id"), col("file"))
        .localCheckpoint()
      val candFiles = top.select("file").distinct()
        .collect().map(_.getString(0))
      val pairs =
        if (candFiles.isEmpty)
          top.select(col("bid"), col("vec_id").as("nn_id"),
            lit(0L).as("sim")).where(lit(false))
        else scanFiles(spark, mt.dir, candFiles.toSeq)
          .select(col(p.idCol).as("vec_id"), col(colName).as("e_o"))
          .join(broadcast(top), "vec_id")
          .select(col("bid"), col("vec_id").as("nn_id"),
            dotFixed(col("e_n"), col("e_o")).as("sim"))
      rankTop(pairs)
    } else onStale(spark) match {
      case "fail" => staleRefused(op, table)
      case "refresh" if allowRefresh =>
        refuseRefreshIfReadOnly(spark, op)
        refresh(spark, mt.dir, colName)
        knnJoinPqAttempt(spark, table, colName, batch, k, rerank,
          predicate, allowRefresh = false)
      case _ if p.partCol.isDefined =>
        // in-query replay of the PARTITIONED pipeline (r14): every
        // pinned partition's ranked SAMPLE-aware geometry + ranked
        // codebook + codes in ONE part-keyed dataflow, per-(row, pin)
        // ADC cutoff, exact rerank, global per-row top-k — a
        // partitioned rebuild's answer, no pruning.
        val pc = p.partCol.get
        val names = m.entries.filter(_.rows > 0).map(_.name)
        val all = scanFiles(spark, mt.dir, names)
        val pins = predicate.flatMap(
          partitionPins(_, pc, partTypeOf(m, pc)))
        def partKey(df: DataFrame): DataFrame = {
          val keyed = df.select(col(p.idCol).as("vec_id"),
            lit(0).as("label"), col(colName).as("embedding"),
            col(pc).cast("string").as("part"))
          pins.fold(keyed)(ps => keyed.where(col("part").isin(ps: _*)))
        }
        val rowsP = partKey(all)
        val (corpusAssigned, cents) = retrainGeometryRankedByPart(rowsP, p)
        val cbArrByPart = trainPqCodebookRankedByPart(
            rowsP.select(col("part"), col("vec_id"), col("embedding")))
          .groupBy("part")
          .agg(array_sort(collect_list(struct(col("c_id"), col("c_emb"))))
            .as("cents"))
        val codedAll = (0 until graft.llm.Similarity.PqM).foldLeft(
            corpusAssigned.join(broadcast(cbArrByPart), "part")) {
          (df, b) => df.withColumn(s"code$b",
            graft.llm.Similarity.pqCode(col("cents"), col("embedding"), b))
        }.drop("cents")
        val coded = predicate match {
          case None => codedAll
          case Some(pred) => codedAll.join(
            partKey(all.where(pred)).select(col("part"), col("vec_id")),
            Seq("part", "vec_id"), "left_semi")
        }
        val bAssigned = assignBatchAllParts(b0, cents)
        val wAdcP = org.apache.spark.sql.expressions.Window
          .partitionBy("bid", "part").orderBy(desc("sim_adc"), col("vec_id"))
        val top = bAssigned
          .select(col("part"), col("vec_id").as("bid"),
            col("embedding").as("e_n"), col("list_id"))
          .join(coded.drop("embedding", "label"), Seq("part", "list_id"))
          .join(broadcast(cbArrByPart), "part")
          .withColumn("sim_adc",
            Similarity.pqAdc(col("cents"), col("e_n"), b => col(s"code$b")))
          .withColumn("rk", row_number().over(wAdcP))
          .filter(col("rk") <= rerank)
          .select(col("bid"), col("e_n"), col("part"), col("vec_id"))
        // rerank keys on (part, vec_id), not vec_id alone (r15 advice):
        // ids only need be unique within a partition
        val pairs = top
          .join(corpusAssigned.select(col("part"), col("vec_id"),
            col("embedding").as("e_o")), Seq("part", "vec_id"))
          .select(col("bid"), col("vec_id").as("nn_id"),
            dotFixed(col("e_n"), col("e_o")).as("sim"))
        rankTop(pairs)
      case _ =>
        // in-query replay: geometry + codebook training + codes under
        // the persisted policy — a fresh rebuild's answer, no pruning;
        // the predicate still narrows the coded candidates before each
        // row's cutoff
        val names = m.entries.filter(_.rows > 0).map(_.name)
        val rows = scanFiles(spark, mt.dir, names)
          .select(col(p.idCol).as("vec_id"), lit(0).as("label"),
            col(colName).as("embedding"))
        val n = rows.count()
        val (corpusAssigned, cents) = retrainGeometry(rows, p, n)
        val cb = trainPqCodebook(
          rows.select(col("vec_id"), col("embedding")), n)
        if (cb.isEmpty) throw new IllegalStateException(
          s"$op: no PQ codebook trains (no rows below the anchor cap) — " +
            "use knnJoin")
        val cbArr = pqCbArr(cb)
        val codedAll = encodePq(
          corpusAssigned.select(col("vec_id"), col("embedding"),
            col("list_id")), cbArr)
        val coded = predicate match {
          case None => codedAll
          case Some(pred) => codedAll.join(
            scanFiles(spark, mt.dir, names).where(pred)
              .select(col(p.idCol).as("vec_id")),
            Seq("vec_id"), "left_semi")
        }
        val bAssigned = Similarity.assignLists(b0, cents)
        val top = bAssigned
          .select(col("vec_id").as("bid"), col("embedding").as("e_n"),
            col("list_id"))
          .join(coded.drop("embedding", "cents"), Seq("list_id"))
          .crossJoin(broadcast(cbArr))
          .withColumn("sim_adc",
            Similarity.pqAdc(col("cents"), col("e_n"), b => col(s"code$b")))
          .withColumn("rk", row_number().over(wAdc))
          .filter(col("rk") <= rerank)
          .select(col("bid"), col("e_n"), col("vec_id"))
        val pairs = top
          .join(corpusAssigned.select(col("vec_id"), col("embedding")
            .as("e_o")), "vec_id")
          .select(col("bid"), col("vec_id").as("nn_id"),
            dotFixed(col("e_n"), col("e_o")).as("sim"))
        rankTop(pairs)
    }
  }

  /** TIME-TRAVEL-CONSISTENT ANN — search a TABLE SNAPSHOT with the
    * index version that covered it: the snapshot manifest carries the
    * `vecidx.` prop AS OF that commit, so when its digest matches the
    * snapshot's own file set (and the sidecar dir hasn't been VACUUMed)
    * the HISTORICAL posting lists prune and the candidate scan pins
    * both the files and the snapshot — DV state as of the version, so a
    * later merge-on-read DELETE doesn't leak backward and a
    * since-deleted row still ranks where it did. The text tier's C200
    * guard solved the inverse hazard (a pinned scan must never prune
    * against the CURRENT posting list); this is the positive
    * capability: prune against the snapshot's OWN list. A snapshot
    * whose index is stale or whose sidecars were reaped retrains
    * in-query over the snapshot rows under the prop's persisted policy
    * — always correct, no pruning (the retrain posture; `refresh` would
    * mutate CURRENT state to serve the past, so the onStale policy
    * deliberately does not apply). BY PARTITION snapshots serve their
    * own sub-geometries (r14); WHERE/PQ compose at the version (r15).
    * Output: (vec_id, list_id, sim), like [[search]]. */
  def searchAsOf(spark: SparkSession, table: String, colName: String,
      probe: Array[Float], topK: Int, version: Int,
      probes: Int = 1): DataFrame =
    searchAsOfAttempt(spark, table, colName, probe, topK, version, probes,
      None, None)

  /** FILTERED time travel (r15 — the C238 refusal lifted): reproduce
    * yesterday's FILTERED RAG serve — the predicate narrows the
    * snapshot's candidates BEFORE the top-k (the filtered-ANN rule,
    * evaluated against the snapshot's own rows and DV state, so the
    * filter set is exactly what it was at the version). On a BY
    * PARTITION snapshot the predicate's partition pins route to the
    * snapshot's own sub-geometries, like [[searchWhere]]. */
  def searchAsOfWhere(spark: SparkSession, table: String, colName: String,
      probe: Array[Float], topK: Int, version: Int, probes: Int,
      predicate: org.apache.spark.sql.Column): DataFrame =
    searchAsOfAttempt(spark, table, colName, probe, topK, version, probes,
      Some(predicate), None)

  /** PQ time travel (r15): the snapshot dir carries its OWN `pqcb/` +
    * `codes/` sidecars, so the compressed serve replays at the version —
    * ADC pre-rank over the historical codes, exact rerank pinned to the
    * snapshot scan. An optional predicate semi-joins the codes BEFORE
    * each cutoff (the filtered-PQ rule), evaluated against the
    * snapshot's rows. On a BY PARTITION snapshot every pin serves its
    * OWN historical codebook/codes (part-local ADC cutoff and top-k,
    * then the global top-k) — the fresh partitioned PQ dataflow with
    * every read pinned to the version. */
  def searchAsOfPq(spark: SparkSession, table: String, colName: String,
      probe: Array[Float], topK: Int, version: Int, probes: Int,
      rerank: Int,
      predicate: Option[org.apache.spark.sql.Column] = None): DataFrame =
    searchAsOfAttempt(spark, table, colName, probe, topK, version, probes,
      predicate, Some(rerank))

  private def searchAsOfAttempt(spark: SparkSession, table: String,
      colName: String, probe: Array[Float], topK: Int, version: Int,
      probes: Int, predicate: Option[org.apache.spark.sql.Column],
      rerankPq: Option[Int]): DataFrame = {
    import graft.llm.Similarity
    val op = "VECTOR SEARCH AS OF"
    val mt = resolveTable(spark, table, op)
    val m = Manifest.readSnapshot(mt.dir, version).getOrElse(
      throw new IllegalArgumentException(
        s"$op: snapshot $version expired or never existed at ${mt.dir}"))
    val p = parseProp(m.props.getOrElse(PropPrefix + colName.toLowerCase,
      throw new IllegalStateException(
        s"$op: no vector index on $table ($colName) existed as of " +
          s"version $version — the snapshot carries no vecidx prop")))
    val names = m.entries.filter(_.rows > 0).map(_.name)
    val pv = typedLit(probe.toSeq)
    def snapScan(fs: Seq[String]): DataFrame =
      spark.read.format("graft.sources.GraftManifestSink")
        .option("path", mt.dir.toString)
        .option("snapshot", version.toString)
        .option("files", fs.mkString(","))
        .load()
    def rekey(df: DataFrame): DataFrame =
      df.select(col(p.idCol).as("vec_id"), lit(0).as("label"),
        col(colName).as("embedding"))
    def rank(rows: DataFrame, cents: DataFrame,
        pLists: Seq[Int]): DataFrame =
      Similarity.assignListsHierLocal(rows, cents, p.coarse)
        .where(col("list_id").isin(pLists: _*))
        .select(col("vec_id"), col("list_id"),
          graft.llm.PortableHash.dotFixed(col("embedding"), pv).as("sim"))
        .orderBy(desc("sim"), col("vec_id")).limit(topK)
    rerankPq.foreach { rerank =>
      // RERANK USING PQ × VERSION AS OF (r15): the historical sidecar
      // dir carries the snapshot's own pqcb/codes, so the compressed
      // serve replays exactly at the version; an optional predicate
      // narrows the codes BEFORE the cutoff against the snapshot's rows
      p.partCol.foreach { pc =>
        // BY PARTITION × PQ × time travel (the last vector time-travel
        // refusal, lifted): every pin ADC-ranks the snapshot's OWN
        // per-partition codes against its OWN ranked codebook, the
        // exact rerank fetches through the snapshot-pinned scan keyed
        // on (part, vec_id), part-local top-k then the global top-k —
        // the fresh partitioned PQ dataflow with every read pinned to
        // the version. Stale/reaped → part-keyed ranked SAMPLE-aware
        // replay (geometry + codebooks + codes) over the snapshot rows.
        val idxDirP = mt.dir.resolve(p.idxName)
        val servableP = p.isCurrent(digestOf(m)) &&
          Seq("cents", "posts", "pqcb", "codes").forall(s =>
            java.nio.file.Files.exists(idxDirP.resolve(s)))
        val pins = predicate.flatMap(
          partitionPins(_, pc, partTypeOf(m, pc)))
        val wAdcP = org.apache.spark.sql.expressions.Window
          .partitionBy("part").orderBy(desc("sim_adc"), col("vec_id"))
        val wkP = org.apache.spark.sql.expressions.Window
          .partitionBy("part").orderBy(desc("sim"), col("vec_id"))
        if (servableP) {
          val cents0 = spark.read.parquet(
            idxDirP.resolve("cents").toString)
          val centsP = pins.fold(cents0)(ps =>
            cents0.where(col("part").isin(ps: _*)))
          val probed = probePairsOf(centsP, probe, probes)
          val codesProbed = spark.read
            .parquet(idxDirP.resolve("codes").toString)
            .join(broadcast(probed), Seq("part", "list_id"))
          val codes = predicate match {
            case None => codesProbed
            case Some(pred) =>
              val pFiles = spark.read
                .parquet(idxDirP.resolve("posts").toString)
                .join(probed, Seq("part", "list_id"))
                .select("file").distinct().collect().map(_.getString(0))
              if (pFiles.isEmpty) codesProbed.where(lit(false))
              else {
                val match0 = snapScan(pFiles.toSeq).where(pred)
                  .select(col(p.idCol).as("vec_id"),
                    col(pc).cast("string").as("part"))
                val matching = pins.fold(match0)(ps =>
                  match0.where(col("part").isin(ps: _*)))
                codesProbed.join(matching, Seq("part", "vec_id"),
                  "left_semi")
              }
          }
          val cbByPart = spark.read
            .parquet(idxDirP.resolve("pqcb").toString)
            .groupBy("part")
            .agg(array_sort(collect_list(struct(col("c_id"), col("c_emb"))))
              .as("cents"))
          val top = codes.join(broadcast(cbByPart), "part")
            .withColumn("sim_adc",
              Similarity.pqAdc(col("cents"), pv, b => col(s"code$b")))
            .withColumn("ark", row_number().over(wAdcP))
            .where(col("ark") <= rerank)
            .select(col("part"), col("vec_id"), col("list_id"),
              col("file"))
            .localCheckpoint()
          val cand = top.select("file").distinct()
            .collect().map(_.getString(0))
          if (cand.isEmpty) return emptyResult(spark, m, p.idCol)
          return snapScan(cand.toSeq)
            .select(col(p.idCol).as("vec_id"),
              col(colName).as("embedding"),
              col(pc).cast("string").as("part"))
            .join(broadcast(top.select(col("part"), col("vec_id"),
              col("list_id"))), Seq("part", "vec_id"))
            .select(col("part"), col("vec_id"), col("list_id"),
              graft.llm.PortableHash.dotFixed(col("embedding"), pv)
                .as("sim"))
            .withColumn("prk", row_number().over(wkP))
            .where(col("prk") <= topK)
            .select(col("vec_id"), col("list_id"), col("sim"))
            .orderBy(desc("sim"), col("vec_id")).limit(topK)
        } else {
          val all = snapScan(names)
          def partKeyP(df: DataFrame): DataFrame = {
            val keyed = df.select(col(p.idCol).as("vec_id"),
              lit(0).as("label"), col(colName).as("embedding"),
              col(pc).cast("string").as("part"))
            pins.fold(keyed)(ps => keyed.where(col("part").isin(ps: _*)))
          }
          val rowsP = partKeyP(all)
          val (assigned, cents) = retrainGeometryRankedByPart(rowsP, p)
          val cbArrByPart = trainPqCodebookRankedByPart(
              rowsP.select(col("part"), col("vec_id"), col("embedding")))
            .groupBy("part")
            .agg(array_sort(collect_list(
              struct(col("c_id"), col("c_emb")))).as("cents"))
          val probed = probePairsOf(cents, probe, probes)
          val inLists = assigned.join(broadcast(probed),
            Seq("part", "list_id"))
          val candRows = predicate match {
            case None => inLists
            case Some(pred) => inLists.join(
              partKeyP(all.where(pred)).select(col("part"), col("vec_id")),
              Seq("part", "vec_id"), "left_semi")
          }
          return (0 until Similarity.PqM).foldLeft(
              candRows.join(broadcast(cbArrByPart), "part")) { (df, b) =>
              df.withColumn(s"code$b",
                Similarity.pqCode(col("cents"), col("embedding"), b))
            }
            .withColumn("sim_adc",
              Similarity.pqAdc(col("cents"), pv, b => col(s"code$b")))
            .withColumn("ark", row_number().over(wAdcP))
            .where(col("ark") <= rerank)
            .select(col("part"), col("vec_id"), col("list_id"),
              graft.llm.PortableHash.dotFixed(col("embedding"), pv)
                .as("sim"))
            .withColumn("prk", row_number().over(wkP))
            .where(col("prk") <= topK)
            .select(col("vec_id"), col("list_id"), col("sim"))
            .orderBy(desc("sim"), col("vec_id")).limit(topK)
        }
      }
      import graft.llm.PortableHash.dotFixed
      def exactTop(cand: DataFrame): DataFrame =
        cand.select(col("vec_id"), col("list_id"),
            dotFixed(col("embedding"), pv).as("sim"))
          .orderBy(desc("sim"), col("vec_id")).limit(topK)
      val idxDir = mt.dir.resolve(p.idxName)
      val servable = p.isCurrent(digestOf(m)) &&
        Seq("cents", "posts", "pqcb", "codes").forall(s =>
          java.nio.file.Files.exists(idxDir.resolve(s)))
      if (servable) {
        val cents = spark.read.parquet(idxDir.resolve("cents").toString)
        val pLists = probeListsOf(cents, probe, probes)
        val codes0 = spark.read.parquet(idxDir.resolve("codes").toString)
          .where(col("list_id").isin(pLists: _*))
        val codes = predicate match {
          case None => codes0
          case Some(pred) =>
            val pFiles = spark.read
              .parquet(idxDir.resolve("posts").toString)
              .where(col("list_id").isin(pLists: _*))
              .select("file").distinct().collect().map(_.getString(0))
            if (pFiles.isEmpty) return emptyResult(spark, m, p.idCol)
            // the snapshot-pinned scan evaluates the predicate against
            // the version's rows and DV state — a row deleted AFTER the
            // version still matches, a row appended after never does
            val matching = snapScan(pFiles.toSeq).where(pred)
              .select(col(p.idCol).as("vec_id"))
            codes0.join(matching, Seq("vec_id"), "left_semi")
        }
        val cbArr = pqCbArr(
          spark.read.parquet(idxDir.resolve("pqcb").toString))
        val top = codes.crossJoin(broadcast(cbArr))
          .withColumn("sim_adc",
            Similarity.pqAdc(col("cents"), pv, b => col(s"code$b")))
          .orderBy(desc("sim_adc"), col("vec_id")).limit(rerank)
          .select(col("vec_id"), col("list_id"), col("file"))
          .localCheckpoint()
        val cand = top.select("file").distinct()
          .collect().map(_.getString(0))
        if (cand.isEmpty) return emptyResult(spark, m, p.idCol)
        return exactTop(snapScan(cand.toSeq)
          .select(col(p.idCol).as("vec_id"), col(colName).as("embedding"))
          .join(broadcast(top.select(col("vec_id"), col("list_id"))),
            "vec_id"))
      } else {
        // stale snapshot index (or reaped sidecars): replay geometry +
        // codebook + codes over the SNAPSHOT rows under the persisted
        // policy — what a rebuild at that version would have answered
        val all = snapScan(names)
        val rows = rekey(all)
        val n = rows.count()
        val (assigned, cents) = retrainGeometry(rows, p, n)
        val cb = trainPqCodebook(rows, n)
        if (cb.limit(1).count() == 0) throw new IllegalStateException(
          s"$op: no PQ codebook trains at snapshot $version (no rows " +
            "below the anchor cap) — use searchAsOf")
        val cbArr = pqCbArr(cb)
        val inLists = assigned.where(col("list_id").isin(
          probeListsOf(cents, probe, probes): _*))
        val candRows = predicate match {
          case None => inLists
          case Some(pred) => inLists.join(
            all.where(pred).select(col(p.idCol).as("vec_id")),
            Seq("vec_id"), "left_semi")
        }
        val top = encodePq(candRows, cbArr)
          .withColumn("sim_adc",
            Similarity.pqAdc(col("cents"), pv, b => col(s"code$b")))
          .orderBy(desc("sim_adc"), col("vec_id")).limit(rerank)
        return exactTop(top)
      }
    }
    p.partCol.foreach { pc =>
      // BY PARTITION time travel (r14 — formerly a refusal): the
      // snapshot's OWN sub-geometries serve the pins-are-all-partitions
      // union, one part-keyed dataflow over the snapshot-pinned scan;
      // per-part top-k then the global top-k. Stale/reaped → part-keyed
      // ranked SAMPLE-aware retrain over the snapshot rows.
      def partKey(df: DataFrame): DataFrame =
        df.select(col(p.idCol).as("vec_id"), lit(0).as("label"),
          col(colName).as("embedding"), col(pc).cast("string").as("part"))
      def rankByPart(assigned: DataFrame, probed: DataFrame): DataFrame = {
        val wp = org.apache.spark.sql.expressions.Window
          .partitionBy("part").orderBy(desc("sim"), col("vec_id"))
        assigned.join(broadcast(probed), Seq("part", "list_id"))
          .select(col("part"), col("vec_id"), col("list_id"),
            graft.llm.PortableHash.dotFixed(col("embedding"), pv).as("sim"))
          .withColumn("prk", row_number().over(wp))
          .where(col("prk") <= topK)
          .select(col("vec_id"), col("list_id"), col("sim"))
          .orderBy(desc("sim"), col("vec_id")).limit(topK)
      }
      val idxDirP = mt.dir.resolve(p.idxName)
      val servableP = p.isCurrent(digestOf(m)) &&
        java.nio.file.Files.exists(idxDirP.resolve("cents")) &&
        java.nio.file.Files.exists(idxDirP.resolve("posts"))
      // the predicate's partition pins route to the snapshot's OWN
      // sub-geometries (the multi-pin serving shape, at the version);
      // the full predicate then narrows candidates before the top-k
      val pins = predicate.flatMap(partitionPins(_, pc, partTypeOf(m, pc)))
      if (servableP) {
        val cents0 = spark.read.parquet(idxDirP.resolve("cents").toString)
        val cents = pins.fold(cents0)(ps =>
          cents0.where(col("part").isin(ps: _*)))
        val probed = probePairsOf(cents, probe, probes)
        val cand = spark.read.parquet(idxDirP.resolve("posts").toString)
          .join(probed, Seq("part", "list_id"))
          .select("file").distinct().collect().map(_.getString(0))
        if (cand.isEmpty) return emptyResult(spark, m, p.idCol)
        val scanned = snapScan(cand.toSeq)
        return rankByPart(graft.llm.Similarity.assignListsHierByPartLocal(
          partKey(predicate.fold(scanned)(scanned.where)), cents,
          p.coarse), probed)
      } else {
        val all = snapScan(names)
        val rows = partKey(all)
        val (assigned, cents) = retrainGeometryRankedByPart(rows, p)
        val centsP = pins.fold(cents)(ps =>
          cents.where(col("part").isin(ps: _*)))
        val candRows = predicate match {
          case None => assigned
          case Some(pred) => assigned.join(
            all.where(pred).select(col(pc).cast("string").as("part"),
              col(p.idCol).as("vec_id")),
            Seq("part", "vec_id"), "left_semi")
        }
        return rankByPart(candRows, probePairsOf(centsP, probe, probes))
      }
    }
    val idxDir = mt.dir.resolve(p.idxName)
    // servable = digest-fresh AND every sidecar the serve path reads is
    // present (cents/ AND posts/) — a partially reaped or half-written
    // historical dir takes the documented retrain fallback instead of
    // an opaque parquet path error (r14 advice)
    val servable = p.isCurrent(digestOf(m)) &&
      java.nio.file.Files.exists(idxDir.resolve("cents")) &&
      java.nio.file.Files.exists(idxDir.resolve("posts"))
    if (servable) {
      val cents = spark.read.parquet(idxDir.resolve("cents").toString)
      val pLists = probeListsOf(cents, probe, probes)
      val cand = spark.read.parquet(idxDir.resolve("posts").toString)
        .where(col("list_id").isin(pLists: _*))
        .select("file").distinct().collect().map(_.getString(0))
      if (cand.isEmpty) return emptyResult(spark, m, p.idCol)
      // the predicate narrows the snapshot's candidates BEFORE the
      // top-k (the filtered-ANN rule, at the version's own DV state)
      val scanned = snapScan(cand.toSeq)
      rank(rekey(predicate.fold(scanned)(scanned.where)), cents, pLists)
    } else {
      // the snapshot's index was stale (or its sidecars reaped):
      // retrain over the SNAPSHOT rows under the persisted policy —
      // exactly what a rebuild at that version would have answered
      val all = snapScan(names)
      val rows = rekey(all)
      val (_, cents) = retrainGeometry(rows, p, rows.count())
      rank(rekey(predicate.fold(all)(all.where)), cents,
        probeListsOf(cents, probe, probes))
    }
  }

  /** TIME-TRAVEL kNN JOIN (r14) — [[knnJoin]] against a TABLE SNAPSHOT
    * with the index version that covered it: reproducing yesterday's
    * RAG candidate fetch (the C238 motivation) needs the BATCH JOIN,
    * not just the single-probe search. Snapshot resolution is
    * [[searchAsOf]]'s — the snapshot manifest's OWN `vecidx.` prop, the
    * candidate scan pinned to both the historical files and the
    * snapshot's DV state, so later appends/deletes never leak backward.
    * Servable = digest-fresh AND every sidecar the serve reads present
    * (cents/ + posts/); otherwise the in-query retrain replays what a
    * rebuild at that version would have trained (the retrain posture —
    * refresh would mutate CURRENT state to serve the past). BY
    * PARTITION snapshots fan the batch out under every historical pin
    * (r14). Output (vec_id, rank, nn_id, sim) like [[knnJoin]]. */
  def knnJoinAsOf(spark: SparkSession, table: String, colName: String,
      batch: DataFrame, k: Int, version: Int,
      predicate: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    import graft.llm.Similarity
    import graft.llm.PortableHash.dotFixed
    val op = "VECTOR KNN JOIN AS OF"
    val mt = resolveTable(spark, table, op)
    val m = Manifest.readSnapshot(mt.dir, version).getOrElse(
      throw new IllegalArgumentException(
        s"$op: snapshot $version expired or never existed at ${mt.dir}"))
    val p = parseProp(m.props.getOrElse(PropPrefix + colName.toLowerCase,
      throw new IllegalStateException(
        s"$op: no vector index on $table ($colName) existed as of " +
          s"version $version — the snapshot carries no vecidx prop")))
    val names = m.entries.filter(_.rows > 0).map(_.name)
    def snapScan(fs: Seq[String]): DataFrame =
      spark.read.format("graft.sources.GraftManifestSink")
        .option("path", mt.dir.toString)
        .option("snapshot", version.toString)
        .option("files", fs.mkString(","))
        .load()
    def rekey(df: DataFrame): DataFrame =
      df.select(col(p.idCol).as("vec_id"), lit(0).as("label"),
        col(colName).as("embedding"))
    val b0 = batch.select(col(p.idCol).as("vec_id"), lit(0).as("label"),
      col(colName).as("embedding"))
    def finish(bAssigned: DataFrame, corpusAssigned: DataFrame): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("bid").orderBy(desc("sim"), col("nn_id"))
      bAssigned.select(col("vec_id").as("bid"),
          col("embedding").as("e_n"), col("list_id"))
        .join(corpusAssigned.select(col("list_id"),
          col("vec_id").as("nn_id"), col("embedding").as("e_o")),
          Seq("list_id"))
        .select(col("bid"), col("nn_id"),
          dotFixed(col("e_n"), col("e_o")).as("sim"))
        .withColumn("rank", row_number().over(w)
          .cast(org.apache.spark.sql.types.IntegerType))
        .filter(col("rank") <= k)
        .select(col("bid").as("vec_id"), col("rank"), col("nn_id"),
          col("sim"))
        .orderBy("vec_id", "rank")
    }
    p.partCol.foreach { pc =>
      // BY PARTITION time travel for the batch join (r14): the
      // snapshot's OWN sub-geometries serve the unpinned union — the
      // batch fans out under every historical pin, per-(row, pin)
      // top-ks union into the global per-row top-k, all over the
      // snapshot-pinned scan; stale/reaped → part-keyed ranked
      // SAMPLE-aware retrain over the snapshot rows.
      def partKey(df: DataFrame): DataFrame =
        df.select(col(p.idCol).as("vec_id"), lit(0).as("label"),
          col(colName).as("embedding"), col(pc).cast("string").as("part"))
      def finishByPart(bAssigned: DataFrame,
          corpusAssigned: DataFrame): DataFrame = {
        val wpp = org.apache.spark.sql.expressions.Window
          .partitionBy("bid", "part").orderBy(desc("sim"), col("nn_id"))
        val wb = org.apache.spark.sql.expressions.Window
          .partitionBy("bid").orderBy(desc("sim"), col("nn_id"))
        bAssigned.select(col("part"), col("vec_id").as("bid"),
            col("embedding").as("e_n"), col("list_id"))
          .join(corpusAssigned.select(col("part"), col("list_id"),
            col("vec_id").as("nn_id"), col("embedding").as("e_o")),
            Seq("part", "list_id"))
          .select(col("bid"), col("part"), col("nn_id"),
            dotFixed(col("e_n"), col("e_o")).as("sim"))
          .withColumn("rk", row_number().over(wpp))
          .filter(col("rk") <= k)
          .withColumn("rank", row_number().over(wb)
            .cast(org.apache.spark.sql.types.IntegerType))
          .filter(col("rank") <= k)
          .select(col("bid").as("vec_id"), col("rank"), col("nn_id"),
            col("sim"))
          .orderBy("vec_id", "rank")
      }
      val idxDirP = mt.dir.resolve(p.idxName)
      val servableP = p.isCurrent(digestOf(m)) &&
        java.nio.file.Files.exists(idxDirP.resolve("cents")) &&
        java.nio.file.Files.exists(idxDirP.resolve("posts"))
      // the predicate's partition pins route to the snapshot's own
      // sub-geometries; the full predicate then narrows CANDIDATES
      // before each row's top-k (the filtered-ANN rule, at the
      // version's rows and DV state) — r15
      val pins = predicate.flatMap(partitionPins(_, pc, partTypeOf(m, pc)))
      if (servableP) {
        val cents0 = spark.read.parquet(idxDirP.resolve("cents").toString)
        val cents = pins.fold(cents0)(ps =>
          cents0.where(col("part").isin(ps: _*)))
        val bAssigned = assignBatchAllParts(b0, cents).localCheckpoint()
        val cand = spark.read.parquet(idxDirP.resolve("posts").toString)
          .join(bAssigned.select("part", "list_id").distinct(),
            Seq("part", "list_id"))
          .select("file").distinct().collect().map(_.getString(0))
        if (cand.isEmpty)
          return finish(b0.select(col("vec_id"), col("embedding"),
            lit(0).as("list_id")).where(lit(false)),
            b0.select(col("vec_id"), col("embedding"),
              lit(0).as("list_id")).where(lit(false)))
        val scanned = snapScan(cand.toSeq)
        return finishByPart(bAssigned,
          graft.llm.Similarity.assignListsHierByPartLocal(
            partKey(predicate.fold(scanned)(scanned.where)), cents,
            p.coarse))
      } else {
        val all = snapScan(names)
        val rowsP = partKey(all)
        val keyedP = pins.fold(rowsP)(ps =>
          rowsP.where(col("part").isin(ps: _*)))
        val (corpusAssigned, cents) = retrainGeometryRankedByPart(keyedP, p)
        val candRows = predicate match {
          case None => corpusAssigned
          case Some(pred) => corpusAssigned.join(
            partKey(all.where(pred)).select(col("part"), col("vec_id")),
            Seq("part", "vec_id"), "left_semi")
        }
        return finishByPart(assignBatchAllParts(b0, cents), candRows)
      }
    }
    val idxDir = mt.dir.resolve(p.idxName)
    val servable = p.isCurrent(digestOf(m)) &&
      java.nio.file.Files.exists(idxDir.resolve("cents")) &&
      java.nio.file.Files.exists(idxDir.resolve("posts"))
    if (servable) {
      val cents = spark.read.parquet(idxDir.resolve("cents").toString)
      // MATERIALIZE the batch assignment once — probed-list planning AND
      // the candidate join (bounded by the batch), as in [[knnJoin]]
      val bAssigned = Similarity.assignLists(b0, cents).localCheckpoint()
      val probed = bAssigned.select("list_id").distinct()
        .collect().map(_.getInt(0)).toSeq
      val candFiles =
        if (probed.isEmpty) Seq.empty[String]
        else spark.read.parquet(idxDir.resolve("posts").toString)
          .where(col("list_id").isin(probed: _*))
          .select("file").distinct().collect().map(_.getString(0)).toSeq
      if (candFiles.isEmpty)
        finish(bAssigned.where(lit(false)),
          bAssigned.select(col("vec_id"), col("embedding"), col("list_id"))
            .where(lit(false)))
      else {
        // the predicate narrows corpus CANDIDATES before each row's
        // top-k (the filtered-ANN rule), evaluated against the
        // snapshot's rows and DV state — r15
        val scanned = snapScan(candFiles)
        finish(bAssigned, Similarity.assignListsHierLocal(
          rekey(predicate.fold(scanned)(scanned.where)), cents, p.coarse))
      }
    } else {
      // stale snapshot index (or reaped sidecars): retrain over the
      // SNAPSHOT rows under the persisted policy — a rebuild's answer
      val all = snapScan(names)
      val rows = rekey(all)
      val (_, cents) = retrainGeometry(rows, p, rows.count())
      finish(Similarity.assignLists(b0, cents),
        Similarity.assignListsHierLocal(
          rekey(predicate.fold(all)(all.where)), cents, p.coarse))
    }
  }

  /** TIME-TRAVEL PQ kNN JOIN (r15 — completing the C238 matrix):
    * [[knnJoinPq]] against a TABLE SNAPSHOT — per-row ADC cutoff over
    * the snapshot's OWN `codes/` sidecar against its OWN stored
    * codebook, survivors' embeddings fetched through the snapshot-pinned
    * scan for the exact per-row rerank. Servable = digest-fresh AND all
    * four sidecars present; otherwise the in-query replay trains
    * geometry + codebook + codes over the snapshot rows (the retrain
    * posture). A BY PARTITION snapshot serves each pin's OWN
    * historical codebook/codes with the per-(row, pin) ADC cutoff
    * (r15 — the matrix completed). Output (vec_id, rank, nn_id,
    * sim). */
  def knnJoinAsOfPq(spark: SparkSession, table: String, colName: String,
      batch: DataFrame, k: Int, version: Int, rerank: Int = 50,
      predicate: Option[org.apache.spark.sql.Column] = None)
      : DataFrame = {
    import graft.llm.Similarity
    import graft.llm.PortableHash.dotFixed
    val op = "VECTOR KNN JOIN PQ AS OF"
    val mt = resolveTable(spark, table, op)
    val m = Manifest.readSnapshot(mt.dir, version).getOrElse(
      throw new IllegalArgumentException(
        s"$op: snapshot $version expired or never existed at ${mt.dir}"))
    val p = parseProp(m.props.getOrElse(PropPrefix + colName.toLowerCase,
      throw new IllegalStateException(
        s"$op: no vector index on $table ($colName) existed as of " +
          s"version $version — the snapshot carries no vecidx prop")))
    val names = m.entries.filter(_.rows > 0).map(_.name)
    def snapScan(fs: Seq[String]): DataFrame =
      spark.read.format("graft.sources.GraftManifestSink")
        .option("path", mt.dir.toString)
        .option("snapshot", version.toString)
        .option("files", fs.mkString(","))
        .load()
    val b0 = batch.select(col(p.idCol).as("vec_id"), lit(0).as("label"),
      col(colName).as("embedding"))
    val wAdc = org.apache.spark.sql.expressions.Window
      .partitionBy("bid").orderBy(desc("sim_adc"), col("vec_id"))
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy("bid").orderBy(desc("sim"), col("nn_id"))
    def rankTop(pairs: DataFrame): DataFrame =
      pairs
        .withColumn("rank", row_number().over(wTop)
          .cast(org.apache.spark.sql.types.IntegerType))
        .filter(col("rank") <= k)
        .select(col("bid").as("vec_id"), col("rank"), col("nn_id"),
          col("sim"))
        .orderBy("vec_id", "rank")
    val idxDir = mt.dir.resolve(p.idxName)
    val servable = p.isCurrent(digestOf(m)) &&
      Seq("cents", "posts", "pqcb", "codes").forall(s =>
        java.nio.file.Files.exists(idxDir.resolve(s)))
    p.partCol.foreach { pc =>
      // BY PARTITION × PQ × time travel for the BATCH join (r15 — the
      // matrix completed): the batch fans out under every HISTORICAL
      // pin, per-(row, pin) ADC cutoff over the snapshot's own codes
      // against its own ranked codebooks, survivors fetch through the
      // snapshot-pinned scan keyed on (part, vec_id). Stale/reaped →
      // part-keyed ranked SAMPLE-aware replay over the snapshot rows.
      val wAdcP = org.apache.spark.sql.expressions.Window
        .partitionBy("bid", "part").orderBy(desc("sim_adc"), col("vec_id"))
      val pins = predicate.flatMap(
        partitionPins(_, pc, partTypeOf(m, pc)))
      if (servable) {
        val cents0 = spark.read.parquet(idxDir.resolve("cents").toString)
        val cents = pins.fold(cents0)(ps =>
          cents0.where(col("part").isin(ps: _*)))
        val bAssigned = assignBatchAllParts(b0, cents).localCheckpoint()
        val cbByPart = spark.read
          .parquet(idxDir.resolve("pqcb").toString)
          .groupBy("part")
          .agg(array_sort(collect_list(struct(col("c_id"), col("c_emb"))))
            .as("cents"))
        // the predicate narrows each pin's codes BEFORE the per-row
        // rerank cutoff (the filtered-PQ rule), evaluated against the
        // snapshot's rows and DV state
        val codes0 = spark.read.parquet(idxDir.resolve("codes").toString)
        val codes = predicate match {
          case None => codes0
          case Some(pred) =>
            val pFiles = spark.read
              .parquet(idxDir.resolve("posts").toString)
              .join(bAssigned.select("part", "list_id").distinct(),
                Seq("part", "list_id"))
              .select("file").distinct().collect().map(_.getString(0))
            if (pFiles.isEmpty) codes0.where(lit(false))
            else {
              val match0 = snapScan(pFiles.toSeq).where(pred)
                .select(col(p.idCol).as("vec_id"),
                  col(pc).cast("string").as("part"))
              val matching = pins.fold(match0)(ps =>
                match0.where(col("part").isin(ps: _*)))
              codes0.join(matching, Seq("part", "vec_id"), "left_semi")
            }
        }
        val top = bAssigned
          .select(col("part"), col("vec_id").as("bid"),
            col("embedding").as("e_n"), col("list_id"))
          .join(codes, Seq("part", "list_id"))
          .join(broadcast(cbByPart), "part")
          .withColumn("sim_adc",
            Similarity.pqAdc(col("cents"), col("e_n"), b => col(s"code$b")))
          .withColumn("rk", row_number().over(wAdcP))
          .filter(col("rk") <= rerank)
          .select(col("bid"), col("e_n"), col("part"), col("vec_id"),
            col("file"))
          .localCheckpoint()
        val candFiles = top.select("file").distinct()
          .collect().map(_.getString(0))
        val pairs =
          if (candFiles.isEmpty)
            top.select(col("bid"), col("vec_id").as("nn_id"),
              lit(0L).as("sim")).where(lit(false))
          else snapScan(candFiles.toSeq)
            .select(col(pc).cast("string").as("part"),
              col(p.idCol).as("vec_id"), col(colName).as("e_o"))
            .join(broadcast(top), Seq("part", "vec_id"))
            .select(col("bid"), col("vec_id").as("nn_id"),
              dotFixed(col("e_n"), col("e_o")).as("sim"))
        return rankTop(pairs)
      } else {
        val all = snapScan(names)
        def partKeyP(df: DataFrame): DataFrame = {
          val keyed = df.select(col(p.idCol).as("vec_id"),
            lit(0).as("label"), col(colName).as("embedding"),
            col(pc).cast("string").as("part"))
          pins.fold(keyed)(ps => keyed.where(col("part").isin(ps: _*)))
        }
        val rowsP = partKeyP(all)
        val (corpusAssigned, cents) = retrainGeometryRankedByPart(rowsP, p)
        val cbArrByPart = trainPqCodebookRankedByPart(
            rowsP.select(col("part"), col("vec_id"), col("embedding")))
          .groupBy("part")
          .agg(array_sort(collect_list(struct(col("c_id"), col("c_emb"))))
            .as("cents"))
        val codedAll = (0 until Similarity.PqM).foldLeft(
            corpusAssigned.join(broadcast(cbArrByPart), "part")) {
          (df, b) => df.withColumn(s"code$b",
            Similarity.pqCode(col("cents"), col("embedding"), b))
        }.drop("cents")
        val coded = predicate match {
          case None => codedAll
          case Some(pred) => codedAll.join(
            partKeyP(all.where(pred)).select(col("part"), col("vec_id")),
            Seq("part", "vec_id"), "left_semi")
        }
        val top = assignBatchAllParts(b0, cents)
          .select(col("part"), col("vec_id").as("bid"),
            col("embedding").as("e_n"), col("list_id"))
          .join(coded.drop("embedding", "label"), Seq("part", "list_id"))
          .join(broadcast(cbArrByPart), "part")
          .withColumn("sim_adc",
            Similarity.pqAdc(col("cents"), col("e_n"), b => col(s"code$b")))
          .withColumn("rk", row_number().over(wAdcP))
          .filter(col("rk") <= rerank)
          .select(col("bid"), col("e_n"), col("part"), col("vec_id"))
        val pairs = top
          .join(corpusAssigned.select(col("part"), col("vec_id"),
            col("embedding").as("e_o")), Seq("part", "vec_id"))
          .select(col("bid"), col("vec_id").as("nn_id"),
            dotFixed(col("e_n"), col("e_o")).as("sim"))
        return rankTop(pairs)
      }
    }
    if (servable) {
      val cents = spark.read.parquet(idxDir.resolve("cents").toString)
      val bAssigned = Similarity.assignLists(b0, cents).localCheckpoint()
      val probed = bAssigned.select("list_id").distinct()
        .collect().map(_.getInt(0)).toSeq
      val cbArr = pqCbArr(
        spark.read.parquet(idxDir.resolve("pqcb").toString))
      val codes0 =
        if (probed.isEmpty)
          spark.read.parquet(idxDir.resolve("codes").toString)
            .where(lit(false))
        else spark.read.parquet(idxDir.resolve("codes").toString)
          .where(col("list_id").isin(probed: _*))
      // the predicate narrows the codes BEFORE each row's rerank cutoff,
      // evaluated against the snapshot's rows and DV state
      val codesAll = predicate match {
        case None => codes0
        case Some(pred) =>
          val pFiles =
            if (probed.isEmpty) Array.empty[String]
            else spark.read.parquet(idxDir.resolve("posts").toString)
              .where(col("list_id").isin(probed: _*))
              .select("file").distinct().collect().map(_.getString(0))
          if (pFiles.isEmpty) codes0.where(lit(false))
          else codes0.join(
            snapScan(pFiles.toSeq).where(pred)
              .select(col(p.idCol).as("vec_id")),
            Seq("vec_id"), "left_semi")
      }
      val top = bAssigned
        .select(col("vec_id").as("bid"), col("embedding").as("e_n"),
          col("list_id"))
        .join(codesAll, Seq("list_id"))
        .crossJoin(broadcast(cbArr))
        .withColumn("sim_adc",
          Similarity.pqAdc(col("cents"), col("e_n"), b => col(s"code$b")))
        .withColumn("rk", row_number().over(wAdc))
        .filter(col("rk") <= rerank)
        .select(col("bid"), col("e_n"), col("vec_id"), col("file"))
        .localCheckpoint()
      val candFiles = top.select("file").distinct()
        .collect().map(_.getString(0))
      val pairs =
        if (candFiles.isEmpty)
          top.select(col("bid"), col("vec_id").as("nn_id"),
            lit(0L).as("sim")).where(lit(false))
        else snapScan(candFiles.toSeq)
          .select(col(p.idCol).as("vec_id"), col(colName).as("e_o"))
          .join(broadcast(top), "vec_id")
          .select(col("bid"), col("vec_id").as("nn_id"),
            dotFixed(col("e_n"), col("e_o")).as("sim"))
      rankTop(pairs)
    } else {
      // stale snapshot index (or reaped sidecars): replay geometry +
      // codebook + codes over the SNAPSHOT rows under the persisted
      // policy — what a rebuild at that version would have answered
      val rows = snapScan(names)
        .select(col(p.idCol).as("vec_id"), lit(0).as("label"),
          col(colName).as("embedding"))
      val n = rows.count()
      val (corpusAssigned, cents) = retrainGeometry(rows, p, n)
      val cb = trainPqCodebook(
        rows.select(col("vec_id"), col("embedding")), n)
      if (cb.isEmpty) throw new IllegalStateException(
        s"$op: no PQ codebook trains at snapshot $version (no rows " +
          "below the anchor cap) — use knnJoinAsOf")
      val cbArr = pqCbArr(cb)
      val codedAll = encodePq(
        corpusAssigned.select(col("vec_id"), col("embedding"),
          col("list_id")), cbArr)
      val coded = predicate match {
        case None => codedAll
        case Some(pred) => codedAll.join(
          snapScan(names).where(pred).select(col(p.idCol).as("vec_id")),
          Seq("vec_id"), "left_semi")
      }
      val top = Similarity.assignLists(b0, cents)
        .select(col("vec_id").as("bid"), col("embedding").as("e_n"),
          col("list_id"))
        .join(coded.drop("embedding", "cents"), Seq("list_id"))
        .crossJoin(broadcast(cbArr))
        .withColumn("sim_adc",
          Similarity.pqAdc(col("cents"), col("e_n"), b => col(s"code$b")))
        .withColumn("rk", row_number().over(wAdc))
        .filter(col("rk") <= rerank)
        .select(col("bid"), col("e_n"), col("vec_id"))
      val pairs = top
        .join(corpusAssigned.select(col("vec_id"), col("embedding")
          .as("e_o")), "vec_id")
        .select(col("bid"), col("vec_id").as("nn_id"),
          dotFixed(col("e_n"), col("e_o")).as("sim"))
      rankTop(pairs)
    }
  }

  /** The named table must analyze to this engine's [[ManifestTable]] —
    * shared by every index-tier query surface. */
  private def resolveTable(spark: SparkSession, table: String,
      op: String): ManifestTable =
    spark.table(table).queryExecution.analyzed.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
        if r.table.isInstanceOf[ManifestTable] =>
        r.table.asInstanceOf[ManifestTable]
    }.getOrElse(throw new UnsupportedOperationException(
      s"$op: $table is not a graft manifest table"))

  /** The probe's `probes` nearest centroids of `cents` (dot desc, c_id
    * asc — the same first-max tie-break as row assignment). One small
    * driver-side collect; planning-class work. */
  private def probeListsOf(cents: DataFrame, probe: Array[Float],
      probes: Int): Seq[Int] = {
    val pv = typedLit(probe.toSeq)
    cents.select(col("c_id"),
        graft.llm.PortableHash.dotFixed(col("c_emb"), pv).as("pd"))
      .orderBy(desc("pd"), col("c_id")).limit(probes)
      .collect().map(_.getInt(0)).toSeq
  }

  /** The PART-KEYED twin of [[probeListsOf]] — EVERY partition's probe
    * lists in one relation (r14): a ranked window over `part` on the
    * cents sidecar yields (part, list_id) pairs with exactly the per-pin
    * rule (dot desc, c_id asc, top `probes`), as a FRAME rather than a
    * per-pin collect — the replacement for the sequential driver loop
    * the r13 verdict flagged. Zero Spark jobs; ≤ parts×probes rows. */
  private def probePairsOf(cents: DataFrame, probe: Array[Float],
      probes: Int): DataFrame = {
    val pv = typedLit(probe.toSeq)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("part").orderBy(desc("pd"), col("c_id"))
    cents.select(col("part"), col("c_id"),
        graft.llm.PortableHash.dotFixed(col("c_emb"), pv).as("pd"))
      .withColumn("prk", row_number().over(w))
      .where(col("prk") <= probes)
      .select(col("part"), col("c_id").as("list_id"))
  }

  /** Batch rows × EVERY partition's flat geometry, one fan-out dataflow
    * (r14, the BY PARTITION kNN-join batch assignment): each batch row
    * takes its max-dot home list per part's sorted centroid array — the
    * [[graft.llm.Similarity.assignLists]] argmax, replayed under every
    * sub-geometry at once. \|batch\| × parts rows (the semantics of an
    * unpinned partitioned batch join — every pin must be probed), with
    * zero driver round-trips. */
  private def assignBatchAllParts(b0: DataFrame,
      cents: DataFrame): DataFrame = {
    val centArr = cents.groupBy("part")
      .agg(array_sort(collect_list(struct(col("c_id"), col("c_emb"))))
        .as("cents"))
    b0.crossJoin(broadcast(centArr))
      .withColumn("dots", transform(col("cents"), st =>
        graft.llm.PortableHash.dotFixed(col("embedding"),
          st.getField("c_emb"))))
      .withColumn("pos",
        array_position(col("dots"), array_max(col("dots")))
          .cast(IntegerType))
      .withColumn("list_id",
        element_at(col("cents"), col("pos")).getField("c_id"))
      .select(col("part"), col("vec_id"), col("embedding"), col("list_id"))
  }

  /** The stale-replay retrain for BY PARTITION indexes as ONE part-keyed
    * dataflow (r14) — every affected partition's ranked, SAMPLE-aware
    * sub-geometry ([[graft.llm.Clustering.kmeansAssignRankedByPart]])
    * under the persisted policy, replacing the per-pin sequential
    * kmeans loop (which also ignored the persisted SAMPLE — the r13
    * advice item). */
  private def retrainGeometryRankedByPart(rows: DataFrame,
      p: Prop): (DataFrame, DataFrame) =
    graft.llm.Clustering.kmeansAssignRankedByPart(rows, Iters, p.coarse,
      p.lists, p.sample)

  /** The PARTITIONED twin of [[rowsAndCents]] (r14): for a BY PARTITION
    * index, all live rows part-keyed plus the stored (fresh) or
    * part-keyed-retrained (stale, ranked + SAMPLE-aware) per-slice
    * centroids. Returns None for a global index — callers fall through
    * to the global resolution. */
  private def rowsAndCentsByPart(spark: SparkSession, table: String,
      colName: String, labelCol: String, op: String)
      : Option[(DataFrame, DataFrame, Int)] = {
    val mt = resolveTable(spark, table, op)
    val m = Manifest.read(mt.dir).getOrElse(
      throw new IllegalStateException(s"$op: no manifest at ${mt.dir}"))
    val prop = m.props.getOrElse(PropPrefix + colName.toLowerCase,
      throw new IllegalStateException(
        s"$op: no vector index on $table ($colName)"))
    val p = parseProp(prop)
    val pc = p.partCol.getOrElse(return None)
    val names = m.entries.filter(_.rows > 0).map(_.name)
    val rows = scanFiles(spark, mt.dir, names)
      .select(col(p.idCol).as("vec_id"), col(labelCol).as("label"),
        col(colName).as("embedding"), col(pc).cast("string").as("part"))
    def stored(idx: String) =
      spark.read.parquet(mt.dir.resolve(idx).resolve("cents").toString)
    val cents =
      if (p.isCurrent(digestOf(m))) stored(p.idxName)
      else onStale(spark) match {
        case "fail" => staleRefused(op, table)
        case "refresh" =>
          refuseRefreshIfReadOnly(spark, op)
          refresh(spark, mt.dir, colName)
          val cur = Manifest.read(mt.dir).getOrElse(m)
          stored(parseProp(cur.props(PropPrefix + colName.toLowerCase))
            .idxName)
        case _ => retrainGeometryRankedByPart(
          rows.select(col("part"), col("vec_id"), lit(0).as("label"),
            col("embedding")), p)._2
      }
    Some((rows, cents, p.coarse))
  }

  /** Shared resolution for the trained-geometry compositions: all live
    * rows re-keyed to the Lloyd helper's schema, the stored (fresh) or
    * retrained (stale) centroids, and the build's coarse-probe count
    * (serve-time re-derivation must assign exactly as the build did). */
  private def rowsAndCents(spark: SparkSession, table: String,
      colName: String, labelCol: String, op: String)
      : (DataFrame, DataFrame, Int) = {
    val mt = resolveTable(spark, table, op)
    val m = Manifest.read(mt.dir).getOrElse(
      throw new IllegalStateException(s"$op: no manifest at ${mt.dir}"))
    val prop = m.props.getOrElse(PropPrefix + colName.toLowerCase,
      throw new IllegalStateException(
        s"$op: no vector index on $table ($colName)"))
    val p = parseProp(prop)
    // unreachable-by-construction safety net: every composition caller
    // tries [[rowsAndCentsByPart]] first, so a partitioned index never
    // reaches this global resolution
    if (p.partCol.isDefined) throw new UnsupportedOperationException(
      s"$op: BY PARTITION indexes route through the part-keyed " +
        "resolution — this global path must not see one")
    val names = m.entries.filter(_.rows > 0).map(_.name)
    val rows = scanFiles(spark, mt.dir, names)
      .select(col(p.idCol).as("vec_id"), col(labelCol).as("label"),
        col(colName).as("embedding"))
    def stored(idx: String) =
      spark.read.parquet(mt.dir.resolve(idx).resolve("cents").toString)
    val cents =
      if (p.isCurrent(digestOf(m))) stored(p.idxName)
      else onStale(spark) match {
        case "fail" => staleRefused(op, table)
        case "refresh" =>
          refuseRefreshIfReadOnly(spark, op)
          refresh(spark, mt.dir, colName)
          val cur = Manifest.read(mt.dir).getOrElse(m)
          stored(parseProp(cur.props(PropPrefix + colName.toLowerCase)).idxName)
        case _ => retrainGeometry(rows, p)._2
      }
    (rows, cents, p.coarse)
  }

  /** Drop the index prop (idempotent); the dir becomes VACUUM-reapable. */
  def drop(spark: SparkSession, dir: Path, colName: String): Unit =
    ManifestLock.withLock(dir) {
      Manifest.read(dir).foreach { cur =>
        val key = PropPrefix + colName.toLowerCase
        if (cur.props.contains(key))
          Manifest.write(dir, cur.copy(props = cur.props - key))
      }
    }

  /** IVF top-k for `probe` over the indexed column: rows of the probe's
    * `probes` nearest clusters ranked by exact fixed-point dot (multi-
    * probe is the standard IVF recall knob: boundary-straddling neighbors
    * surface at ~probes× candidate cost, still Σ\|list\| — never the
    * table). Fresh index → candidate files from the union of the probed
    * posting lists; stale → retrain on the fly (same result, no pruning).
    * Output: the id column, `sim`, `list_id`. */
  def search(spark: SparkSession, table: String, colName: String,
      probe: Array[Float], topK: Int, probes: Int = 1): DataFrame =
    searchWhere(spark, table, colName, probe, topK, probes, lit(true))

  /** FILTERED IVF search — the predicate composes BEFORE the top-k (the
    * classic filtered-ANN correctness trap: filtering a top-k's output
    * under-fills the result; the filter must narrow the CANDIDATES). The
    * predicate references the table's own columns and is evaluated
    * scan-side over the probed lists' files — file pruning and metadata
    * filtering stack. */
  def searchWhere(spark: SparkSession, table: String, colName: String,
      probe: Array[Float], topK: Int, probes: Int,
      predicate: org.apache.spark.sql.Column): DataFrame =
    searchWhereAttempt(spark, table, colName, probe, topK, probes,
      predicate, allowRefresh = true)

  /** One serve attempt. `allowRefresh` bounds the stale→refresh→re-serve
    * recursion to a SINGLE catch-up: if a concurrent writer re-stales
    * the table between the refresh's digest stamp and this re-check, the
    * second attempt falls through to the in-query retrain (or the fail
    * policy) instead of chasing the writer unboundedly. */
  private def searchWhereAttempt(spark: SparkSession, table: String,
      colName: String, probe: Array[Float], topK: Int, probes: Int,
      predicate: org.apache.spark.sql.Column,
      allowRefresh: Boolean): DataFrame = {
    val mt = resolveTable(spark, table, "VECTOR SEARCH")
    val m = Manifest.read(mt.dir).getOrElse(
      throw new IllegalStateException(s"VECTOR SEARCH: no manifest at ${mt.dir}"))
    val prop = m.props.getOrElse(PropPrefix + colName.toLowerCase,
      throw new IllegalStateException(
        s"VECTOR SEARCH: no vector index on $table ($colName) — " +
          s"CREATE VECTOR INDEX ON $table ($colName) ANCHORS (<idCol>) first"))
    val p = parseProp(prop)
    val names = m.entries.filter(_.rows > 0).map(_.name)

    def ranked(rows: DataFrame, cents: DataFrame,
        pLists: Seq[Int]): DataFrame = {
      val assigned = graft.llm.Similarity.assignListsHierLocal(rows, cents, p.coarse)
      val pv = typedLit(probe.toSeq)
      assigned.where(col("list_id").isin(pLists: _*))
        .select(col("vec_id"), col("list_id"),
          graft.llm.PortableHash.dotFixed(col("embedding"), pv).as("sim"))
        .orderBy(desc("sim"), col("vec_id")).limit(topK)
    }
    // the Lloyd helper's fixed input schema
    def rekey(df: DataFrame): DataFrame =
      df.select(col(p.idCol).as("vec_id"), lit(0).as("label"),
        col(colName).as("embedding"))
    if (p.isCurrent(digestOf(m))) {
      val idxDir = mt.dir.resolve(p.idxName)
      p.partCol match {
        case Some(pc) =>
          // BY PARTITION: route to each pinned partition's OWN
          // sub-geometry — its centroids probe, its postings prune, and
          // NOTHING of any other partition is read (partition pruning
          // composes with list pruning). Multi-pin (IN): per-pin top-k
          // first, global top-k over the ≤ pins×k union. NO pin = all
          // partitions (the same union generalized): corpus-wide search
          // over the sub-geometries without a second global index.
          // ONE part-keyed dataflow for ANY pin count (r14 — the per-pin
          // sequential driver loop was the r13 weak item): probe lists
          // come from a ranked window over `part` on the cents sidecar,
          // candidate files from one posting-sidecar join (the single
          // driver collect — bounded metadata, job count independent of
          // the partition count), and the candidate scan assigns each row
          // against ITS OWN partition's geometry via the part-keyed
          // two-level assigner, part-local top-k before the global one.
          val cents0 = spark.read.parquet(idxDir.resolve("cents").toString)
          val posts0 = spark.read.parquet(idxDir.resolve("posts").toString)
          val pins = partitionPins(predicate, pc, partTypeOf(m, pc))
          val centsP = pins.fold(cents0)(ps =>
            cents0.where(col("part").isin(ps: _*)))
          // (part, list_id) probe pairs — an unseen pin value has no
          // centroids and contributes nothing, like the old per-pin skip
          val probed = probePairsOf(centsP, probe, probes)
          val cand = posts0.join(probed, Seq("part", "list_id"))
            .select("file").distinct().collect().map(_.getString(0))
          if (cand.isEmpty) emptyResult(spark, m, p.idCol)
          else {
            // the pin filter on the scanned rows matters for MULTI-pin:
            // the partition-pure layout is best-effort (an unclustered
            // append can mix values in one file), and the probed-pairs
            // join alone keys each row to its OWN partition's geometry —
            // the pin filter additionally drops unpinned partitions'
            // rows riding in shared files
            val rows0 = scanFiles(spark, mt.dir, cand.toSeq)
              .where(predicate)
              .select(col(p.idCol).as("vec_id"), lit(0).as("label"),
                col(colName).as("embedding"),
                col(pc).cast("string").as("part"))
            val rowsP = pins.fold(rows0)(ps =>
              rows0.where(col("part").isin(ps: _*)))
            val assigned = graft.llm.Similarity.assignListsHierByPartLocal(
              rowsP, centsP, p.coarse)
            val pv = typedLit(probe.toSeq)
            val wp = org.apache.spark.sql.expressions.Window
              .partitionBy("part").orderBy(desc("sim"), col("vec_id"))
            assigned.join(broadcast(probed), Seq("part", "list_id"))
              .select(col("part"), col("vec_id"), col("list_id"),
                graft.llm.PortableHash.dotFixed(col("embedding"), pv)
                  .as("sim"))
              .withColumn("prk", row_number().over(wp))
              .where(col("prk") <= topK)
              .select(col("vec_id"), col("list_id"), col("sim"))
              .orderBy(desc("sim"), col("vec_id")).limit(topK)
          }
        case None =>
          val cents = spark.read.parquet(idxDir.resolve("cents").toString)
          // probe lists, then their posting files — two small metadata
          // reads
          val pLists = probeListsOf(cents, probe, probes)
          val cand = spark.read.parquet(idxDir.resolve("posts").toString)
            .where(col("list_id").isin(pLists: _*))
            .select("file").distinct().collect().map(_.getString(0))
          if (cand.isEmpty) return emptyResult(spark, m, p.idCol)
          // the metadata predicate narrows CANDIDATES, before the top-k
          // — applied on the raw scan so it sees the table's own column
          // names
          ranked(rekey(scanFiles(spark, mt.dir, cand.toSeq)
            .where(predicate)), cents, pLists)
      }
    } else onStale(spark) match {
      case "fail" => staleRefused("VECTOR SEARCH", table)
      case "refresh" if allowRefresh =>
        // bounded catch-up (dead postings drop, new files assign against
        // the stored geometry; a legacy-assigner index rebuilds), then
        // serve from the now-fresh index — pruning included
        refuseRefreshIfReadOnly(spark, "VECTOR SEARCH")
        refresh(spark, mt.dir, colName)
        searchWhereAttempt(spark, table, colName, probe, topK, probes,
          predicate, allowRefresh = false)
      case _ =>
        // retrain from the declared anchors over the CURRENT rows under
        // the build's persisted LISTS/SAMPLE policy — exactly what a
        // rebuild would answer, minus the file pruning. The geometry
        // trains on the UNFILTERED corpus (it is a corpus-level
        // artifact) — or, BY PARTITION, on the pinned partition's rows
        // (ranked seeding, the sub-index rule); the predicate narrows
        // only the ranked candidates.
        val all = scanFiles(spark, mt.dir, names)
        p.partCol match {
          case Some(pc) =>
            // pinned partitions retrain their ranked, SAMPLE-aware
            // sub-geometries in ONE part-keyed dataflow (r14 — formerly
            // a sequential per-pin kmeans loop that also ignored the
            // persisted SAMPLE policy), then each predicate-matching
            // candidate ranks against its own partition's geometry:
            // part-local top-k, global top-k over the ≤ pins×k union —
            // the fresh path's multi-pin semantics, replayed.
            val pins = partitionPins(predicate, pc, partTypeOf(m, pc))
            def partKey(df: DataFrame): DataFrame = {
              val keyed = df.select(col(p.idCol).as("vec_id"),
                lit(0).as("label"), col(colName).as("embedding"),
                col(pc).cast("string").as("part"))
              pins.fold(keyed)(ps => keyed.where(col("part").isin(ps: _*)))
            }
            val cents = retrainGeometryRankedByPart(partKey(all), p)._2
            val probed = probePairsOf(cents, probe, probes)
            val assigned = graft.llm.Similarity.assignListsHierByPartLocal(
              partKey(all.where(predicate)), cents, p.coarse)
            val pv = typedLit(probe.toSeq)
            val wp = org.apache.spark.sql.expressions.Window
              .partitionBy("part").orderBy(desc("sim"), col("vec_id"))
            assigned.join(broadcast(probed), Seq("part", "list_id"))
              .select(col("part"), col("vec_id"), col("list_id"),
                graft.llm.PortableHash.dotFixed(col("embedding"), pv)
                  .as("sim"))
              .withColumn("prk", row_number().over(wp))
              .where(col("prk") <= topK)
              .select(col("vec_id"), col("list_id"), col("sim"))
              .orderBy(desc("sim"), col("vec_id")).limit(topK)
          case None =>
            val cents = retrainGeometry(rekey(all), p)._2
            ranked(rekey(all.where(predicate)), cents,
              probeListsOf(cents, probe, probes))
        }
    }
  }

  private def partTypeOf(m: Manifest,
      pc: String): org.apache.spark.sql.types.DataType =
    m.schema.fields.find(_.name.equalsIgnoreCase(pc)).map(_.dataType)
      .getOrElse(org.apache.spark.sql.types.StringType)

  /** The zero-candidate result, in the SAME schema as the ranked path:
    * vec_id in the ID COLUMN'S declared type (not a hard-coded BIGINT —
    * callers unioning across calls would hit a type mismatch on an
    * INT-keyed table), list_id INT, sim DOUBLE. */
  private def emptyResult(spark: SparkSession, m: Manifest,
      idCol: String): DataFrame = {
    val idType = m.schema.fields
      .find(_.name.equalsIgnoreCase(idCol)).map(_.dataType)
      .getOrElse(org.apache.spark.sql.types.LongType)
    spark.range(0).select(col("id").cast(idType).as("vec_id"),
      lit(0).as("list_id"), lit(0.0).as("sim"))
  }

  /** IVF-PQ top-k — the candidate-COMPRESSION path of the standard 100 TB
    * ANN architecture: the probe's `probes` lists' rows are pre-ranked by
    * the asymmetric (ADC) score over the stored PQ codes — a scan of the
    * NARROW `codes/` sidecar (PqM small ints per row), never the embedding
    * column — and only the top `rerank` survivors have their embeddings
    * fetched (broadcast id semi-join against the posting files) for the
    * exact fixed-point rerank. Approximation is explicit and bounded: the
    * result is the exact top-k AMONG the ADC-top-`rerank` candidates of
    * the probed lists (raise `rerank` toward the list size and it
    * converges on [[search]]); every step is deterministic — codebook =
    * the PqK lowest-anchor rows, first-min/first-max tie-breaks,
    * fixed-point scores — so the DuckDB oracle replays the whole pipeline
    * from raw data. Stale index: the onStale policy applies; `retrain`
    * replays geometry + codes in-query (same answer a rebuild would give,
    * no pruning). Deletion vectors (the BM25 deleted-docs rule's analog):
    * a DV'd row never RANKS — the exact-rerank scan drops it — but its
    * stored code can occupy a rerank slot until the next REFRESH, which
    * since the dv-digest tier sees DV-only churn and re-derives exactly
    * the touched files' codes (`t$indexes` reports the interim
    * `dv_drift`); result membership is always live-exact either way.
    * Output: (vec_id, list_id, sim). */
  def searchPq(spark: SparkSession, table: String, colName: String,
      probe: Array[Float], topK: Int, probes: Int = 1,
      rerank: Int = 50): DataFrame =
    searchPqAttempt(spark, table, colName, probe, topK, probes, rerank,
      predicate = None, allowRefresh = true)

  /** FILTERED IVF-PQ search — the RAG serving shape at 100 TB: a
    * metadata predicate AND compressed candidates in one query. The
    * predicate composes BEFORE the ADC rerank cutoff (the filtered-ANN
    * rule, applied at the compression tier: filtering the ADC top-r's
    * OUTPUT would under-fill the rerank budget whenever the filter is
    * selective). Dataflow: the probed lists' files are scanned once for
    * the predicate columns ONLY (pushdown applies; the embedding column
    * is not read), the matching ids semi-join the narrow codes sidecar,
    * ADC pre-ranks the survivors, and only the top-`rerank` fetch
    * embeddings for the exact rerank — so the result is the exact top-k
    * among the ADC-top-`rerank` of the PREDICATE-MATCHING rows of the
    * probed lists, deterministic and oracle-replayable. */
  def searchPqWhere(spark: SparkSession, table: String, colName: String,
      probe: Array[Float], topK: Int, probes: Int, rerank: Int,
      predicate: org.apache.spark.sql.Column): DataFrame =
    searchPqAttempt(spark, table, colName, probe, topK, probes, rerank,
      predicate = Some(predicate), allowRefresh = true)

  /** One PQ serve attempt — `allowRefresh` bounds the
    * stale→refresh→re-serve recursion exactly as in
    * [[searchWhereAttempt]]. */
  private def searchPqAttempt(spark: SparkSession, table: String,
      colName: String, probe: Array[Float], topK: Int, probes: Int,
      rerank: Int, predicate: Option[org.apache.spark.sql.Column],
      allowRefresh: Boolean): DataFrame = {
    import graft.llm.Similarity
    val mt = resolveTable(spark, table, "VECTOR SEARCH PQ")
    val m = Manifest.read(mt.dir).getOrElse(
      throw new IllegalStateException(s"VECTOR SEARCH PQ: no manifest at ${mt.dir}"))
    val prop = m.props.getOrElse(PropPrefix + colName.toLowerCase,
      throw new IllegalStateException(
        s"VECTOR SEARCH PQ: no vector index on $table ($colName)"))
    val p = parseProp(prop)
    val names = m.entries.filter(_.rows > 0).map(_.name)
    val pv = typedLit(probe.toSeq)

    def noPqCodebook(): Nothing = throw new IllegalStateException(
      s"VECTOR SEARCH PQ: the index on $table ($colName) has no PQ " +
        s"codebook — either the anchor id range had no rows below " +
        s"${Similarity.PqCbK}, or a BY PARTITION index predates the " +
        "per-partition PQ tier; re-run CREATE VECTOR INDEX, or use " +
        "search/searchWhere")

    def exactTop(cand: DataFrame): DataFrame =
      cand.select(col("vec_id"), col("list_id"),
          graft.llm.PortableHash.dotFixed(col("embedding"), pv).as("sim"))
        .orderBy(desc("sim"), col("vec_id")).limit(topK)

    if (p.isCurrent(digestOf(m))) {
      val idxDir = mt.dir.resolve(p.idxName)
      if (!java.nio.file.Files.exists(idxDir.resolve("pqcb"))) noPqCodebook()
      p.partCol match {
        case Some(pc) =>
          // BY PARTITION (r13): every pin ADC-ranks ITS OWN codes against
          // ITS OWN ranked codebook, reranks exactly within its files,
          // and the global top-k ranks the ≤ pins×k union — the same
          // multi-pin shape as searchWhere, with the compression tier's
          // two-stage candidate cut inside each pin. No pin = all
          // partitions (the C225 union). ONE part-keyed dataflow (r14):
          // probe pairs from the ranked cents window, per-part ADC
          // cutoff via a (part)-keyed window against per-part broadcast
          // codebooks, one survivor-file collect, one rerank scan with
          // part-local then global top-k — two driver collects total,
          // independent of the partition count.
          val cents0 = spark.read.parquet(idxDir.resolve("cents").toString)
          val posts0 = spark.read.parquet(idxDir.resolve("posts").toString)
          val cb0 = spark.read.parquet(idxDir.resolve("pqcb").toString)
          val codesAll = spark.read.parquet(idxDir.resolve("codes").toString)
          val pins = predicate.flatMap(
            partitionPins(_, pc, partTypeOf(m, pc)))
          val centsP = pins.fold(cents0)(ps =>
            cents0.where(col("part").isin(ps: _*)))
          val probed = probePairsOf(centsP, probe, probes)
          val codesProbed = codesAll.join(broadcast(probed),
            Seq("part", "list_id"))
          // the predicate narrows each pin's codes BEFORE its rerank
          // cutoff (the filtered-PQ rule, per pin): the probed lists'
          // files scan for the predicate columns only, matching
          // (part, id) pairs semi-join the codes
          val codes = predicate match {
            case None => codesProbed
            case Some(pred) =>
              val pFiles = posts0.join(probed, Seq("part", "list_id"))
                .select("file").distinct().collect().map(_.getString(0))
              if (pFiles.isEmpty) codesProbed.where(lit(false))
              else {
                val match0 = scanFiles(spark, mt.dir, pFiles.toSeq)
                  .where(pred)
                  .select(col(p.idCol).as("vec_id"),
                    col(pc).cast("string").as("part"))
                val matching = pins.fold(match0)(ps =>
                  match0.where(col("part").isin(ps: _*)))
                codesProbed.join(matching, Seq("part", "vec_id"),
                  "left_semi")
              }
          }
          val cbByPart = cb0.groupBy("part")
            .agg(array_sort(collect_list(struct(col("c_id"), col("c_emb"))))
              .as("cents"))
          val wAdcP = org.apache.spark.sql.expressions.Window
            .partitionBy("part").orderBy(desc("sim_adc"), col("vec_id"))
          val top = codes.join(broadcast(cbByPart), "part")
            .withColumn("sim_adc",
              Similarity.pqAdc(col("cents"), pv, b => col(s"code$b")))
            .withColumn("ark", row_number().over(wAdcP))
            .where(col("ark") <= rerank)
            .select(col("part"), col("vec_id"), col("list_id"), col("file"))
            .localCheckpoint()
          val cand = top.select("file").distinct()
            .collect().map(_.getString(0))
          if (cand.isEmpty) return emptyResult(spark, m, p.idCol)
          val wkP = org.apache.spark.sql.expressions.Window
            .partitionBy("part").orderBy(desc("sim"), col("vec_id"))
          return scanFiles(spark, mt.dir, cand.toSeq)
            .select(col(p.idCol).as("vec_id"), col(colName).as("embedding"),
              col(pc).cast("string").as("part"))
            .join(broadcast(top.select(col("part"), col("vec_id"),
              col("list_id"))), Seq("part", "vec_id"))
            .select(col("part"), col("vec_id"), col("list_id"),
              graft.llm.PortableHash.dotFixed(col("embedding"), pv)
                .as("sim"))
            .withColumn("prk", row_number().over(wkP))
            .where(col("prk") <= topK)
            .select(col("vec_id"), col("list_id"), col("sim"))
            .orderBy(desc("sim"), col("vec_id")).limit(topK)
        case None => ()
      }
      val cents = spark.read.parquet(idxDir.resolve("cents").toString)
      val pLists = probeListsOf(cents, probe, probes)
      val cbArr = pqCbArr(spark.read.parquet(idxDir.resolve("pqcb").toString))
      // ADC pre-rank over the NARROW codes sidecar (list filter pushed to
      // the parquet scan) — the embedding column is never read here. A
      // predicate narrows the codes FIRST (before the rerank cutoff):
      // the probed lists' files are scanned for the predicate columns
      // only and the matching ids semi-join the codes — at 100 TB that
      // scan touches ~1/k of the files and never the embedding column.
      // The survivors are MATERIALIZED (≤rerank rows): they drive both
      // the file pruning and the broadcast id semi-join below.
      val codes0 = spark.read.parquet(idxDir.resolve("codes").toString)
        .where(col("list_id").isin(pLists: _*))
      val codes = predicate match {
        case None => codes0
        case Some(pred) =>
          val pFiles = spark.read.parquet(idxDir.resolve("posts").toString)
            .where(col("list_id").isin(pLists: _*))
            .select("file").distinct().collect().map(_.getString(0))
          if (pFiles.isEmpty) return emptyResult(spark, m, p.idCol)
          val matching = scanFiles(spark, mt.dir, pFiles.toSeq).where(pred)
            .select(col(p.idCol).as("vec_id"))
          codes0.join(matching, Seq("vec_id"), "left_semi")
      }
      val top = codes
        .crossJoin(broadcast(cbArr))
        .withColumn("sim_adc",
          Similarity.pqAdc(col("cents"), pv, b => col(s"code$b")))
        .orderBy(desc("sim_adc"), col("vec_id")).limit(rerank)
        .select(col("vec_id"), col("list_id"), col("file"))
        .localCheckpoint()
      // exact rerank touches ONLY the survivors: their ≤rerank FILES are
      // the scan (codes carry the file column), and the broadcast id
      // semi-join narrows rows within them
      val cand = top.select("file").distinct()
        .collect().map(_.getString(0))
      if (cand.isEmpty) return emptyResult(spark, m, p.idCol)
      val rows = scanFiles(spark, mt.dir, cand.toSeq)
        .select(col(p.idCol).as("vec_id"), col(colName).as("embedding"))
        .join(broadcast(top.select(col("vec_id"), col("list_id"))), "vec_id")
      exactTop(rows)
    } else onStale(spark) match {
      case "fail" => staleRefused("VECTOR SEARCH PQ", table)
      case "refresh" if allowRefresh =>
        refuseRefreshIfReadOnly(spark, "VECTOR SEARCH PQ")
        refresh(spark, mt.dir, colName)
        searchPqAttempt(spark, table, colName, probe, topK, probes, rerank,
          predicate, allowRefresh = false)
      case _ =>
        // in-query replay of the WHOLE pipeline (geometry + codebook
        // training + codes) under the build's persisted LISTS/SAMPLE
        // policy, so the answer matches a fresh rebuild's — no pruning,
        // same determinism
        val all = scanFiles(spark, mt.dir, names)
        p.partCol match {
          case Some(pc) =>
            // pinned partitions replay ranked slice retrain + ranked
            // codebook + codes + per-pin ADC cutoff + per-pin exact
            // top-k + global top-k in ONE part-keyed dataflow (r14 —
            // formerly a sequential per-pin loop)
            val pins = predicate.flatMap(
              partitionPins(_, pc, partTypeOf(m, pc)))
            def partKey(df: DataFrame): DataFrame = {
              val keyed = df.select(col(p.idCol).as("vec_id"),
                lit(0).as("label"), col(colName).as("embedding"),
                col(pc).cast("string").as("part"))
              pins.fold(keyed)(ps => keyed.where(col("part").isin(ps: _*)))
            }
            val rowsP = partKey(all)
            val (assigned, cents) = retrainGeometryRankedByPart(rowsP, p)
            val cbArrByPart = trainPqCodebookRankedByPart(
                rowsP.select(col("part"), col("vec_id"), col("embedding")))
              .groupBy("part")
              .agg(array_sort(collect_list(
                struct(col("c_id"), col("c_emb")))).as("cents"))
            val probed = probePairsOf(cents, probe, probes)
            val inLists = assigned.join(broadcast(probed),
              Seq("part", "list_id"))
            val candRows = predicate match {
              case None => inLists
              case Some(pred) => inLists.join(
                partKey(all.where(pred)).select(col("part"), col("vec_id")),
                Seq("part", "vec_id"), "left_semi")
            }
            val wAdcP = org.apache.spark.sql.expressions.Window
              .partitionBy("part").orderBy(desc("sim_adc"), col("vec_id"))
            val wkP = org.apache.spark.sql.expressions.Window
              .partitionBy("part").orderBy(desc("sim"), col("vec_id"))
            return (0 until Similarity.PqM).foldLeft(
                candRows.join(broadcast(cbArrByPart), "part")) { (df, b) =>
                df.withColumn(s"code$b",
                  Similarity.pqCode(col("cents"), col("embedding"), b))
              }
              .withColumn("sim_adc",
                Similarity.pqAdc(col("cents"), pv, b => col(s"code$b")))
              .withColumn("ark", row_number().over(wAdcP))
              .where(col("ark") <= rerank)
              .select(col("part"), col("vec_id"), col("list_id"),
                graft.llm.PortableHash.dotFixed(col("embedding"), pv)
                  .as("sim"))
              .withColumn("prk", row_number().over(wkP))
              .where(col("prk") <= topK)
              .select(col("vec_id"), col("list_id"), col("sim"))
              .orderBy(desc("sim"), col("vec_id")).limit(topK)
          case None => ()
        }
        val rows = all
          .select(col(p.idCol).as("vec_id"), lit(0).as("label"),
            col(colName).as("embedding"))
        val n = rows.count()
        val (assigned, cents) = retrainGeometry(rows, p, n)
        val cb = trainPqCodebook(rows, n)
        // same loud refusal as the fresh path: an empty codebook would
        // NULL every ADC score and silently rank garbage candidates
        if (cb.limit(1).count() == 0) noPqCodebook()
        val cbArr = pqCbArr(cb)
        val inLists = assigned.where(col("list_id").isin(
          probeListsOf(cents, probe, probes): _*))
        // predicate before the cutoff, as in the fresh path
        val candRows = predicate match {
          case None => inLists
          case Some(pred) => inLists.join(
            all.where(pred).select(col(p.idCol).as("vec_id")),
            Seq("vec_id"), "left_semi")
        }
        val coded = encodePq(candRows, cbArr)
        val top = coded
          .withColumn("sim_adc",
            Similarity.pqAdc(col("cents"), pv, b => col(s"code$b")))
          .orderBy(desc("sim_adc"), col("vec_id")).limit(rerank)
        exactTop(top)
    }
  }
}
