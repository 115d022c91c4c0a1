package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FILE-LEVEL INVERTED TOKEN INDEX over a managed table's string column —
  * the text-search analog of the zone-map/bloom tier: a sidecar relation
  * `(token, file)` that lets a token-match query plan ONLY the files that
  * can contain the token (Hudi's metadata-table indexing idea, applied to
  * whitespace tokens; the engine's tokenizer — `split(col, ' ')` — is the
  * same one the text-analysis family declares, so index admission equals
  * query semantics).
  *
  * Storage + freshness contract:
  *  - the index is a parquet directory `_tokenidx_<id>` INSIDE the table
  *    directory (written distributed, one shuffle on token), published by
  *    a props-only manifest commit `tokenidx.<col> = <dir>;<digest>` where
  *    digest = SHA-256 over the SORTED indexed file names;
  *  - a read recomputes the digest from the CURRENT manifest: equal →
  *    candidates come from the index and the scan pins `.option("files")`;
  *    different (append/OPTIMIZE/DELETE rewrote the file set) → silent
  *    full-scan fallback, so CORRECTNESS NEVER DEPENDS ON REBUILD
  *    DISCIPLINE (the MV freshness-guard rule). Deletion vectors change no
  *    file names: a DV'd row just makes the index over-approximate, and
  *    the exact predicate re-applies scan-side either way;
  *  - `DROP TEXT INDEX` removes the prop; the orphaned `_tokenidx_*` dir
  *    (and any superseded rebuild) is reaped by VACUUM's reachability
  *    pass, never inline — maintenance must not race a concurrent reader
  *    that already resolved the prop.
  *
  * Scale: the index is ~(distinct tokens × covering files) rows — metadata
  * volume. Lookup reads one token's posting list (file names, O(#files)
  * worst case for a stop-word — the same driver-side planning class as
  * every metadata path here); the data scan then touches only candidate
  * files. At 100 TB a rare-token search plans a handful of files instead
  * of the table. */
object TextIndex {
  private[sources] val PropPrefix = "tokenidx."

  private def sha256(s: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Digest of a manifest's indexed-file set (names only, order-free). */
  private[sources] def digestOf(m: Manifest): String =
    sha256(m.entries.filter(_.rows > 0).map(_.name).sorted.mkString("\n"))

  private def scanFiles(spark: SparkSession, dir: Path,
      names: Seq[String]): DataFrame =
    spark.read.format("graft.sources.GraftManifestSink")
      .option("path", dir.toString)
      .option("files", names.mkString(","))
      .load()

  /** Build (or rebuild) the index for `colName`: one distributed pass over
    * the current live rows, one shuffle keyed on token, one props-only
    * commit. Returns (files indexed, distinct tokens). */
  def build(spark: SparkSession, dir: Path, colName: String): (Long, Long) = {
    val m = Manifest.read(dir).getOrElse(
      throw new IllegalStateException(s"CREATE TEXT INDEX: no manifest at $dir"))
    val field = m.schema.fields.find(_.name.equalsIgnoreCase(colName)).getOrElse(
      throw new IllegalArgumentException(
        s"CREATE TEXT INDEX: column $colName not in table schema " +
          s"(${m.schema.fieldNames.mkString(", ")})"))
    if (field.dataType != org.apache.spark.sql.types.StringType)
      throw new IllegalArgumentException(
        s"CREATE TEXT INDEX: column $colName is ${field.dataType.sql}, " +
          "only STRING columns index")
    val names = m.entries.filter(_.rows > 0).map(_.name)
    val idxName = s"_tokenidx_${java.util.UUID.randomUUID.toString.take(8)}"
    val postings =
      if (names.isEmpty) spark.emptyDataFrame
        .select(lit("").as("token"), lit("").as("file")).limit(0)
      else scanFiles(spark, dir, names)
        .select(col("_file").as("file"),
          explode(split(col(field.name), " ")).as("token"))
        .where(length(col("token")) > 0)
        .select(col("token"), col("file")).distinct()
    postings.write.parquet(dir.resolve(idxName).toString)
    val nTokens = spark.read.parquet(dir.resolve(idxName).toString)
      .select(col("token")).distinct().count()
    // props-only publish under the table's commit lock: the index dir and
    // the file-set digest it covers swap in atomically
    ManifestLock.withLock(dir) {
      val cur = Manifest.read(dir).getOrElse(m)
      Manifest.write(dir, cur.copy(props =
        cur.props + (PropPrefix + field.name -> s"$idxName;${digestOf(m)}")))
    }
    (names.length.toLong, nTokens)
  }

  /** Refresh a stale index. APPEND-ONLY staleness (every indexed file
    * still live) refreshes INCREMENTALLY: only the new files tokenize, the
    * delta postings union with the stored ones into a new sidecar — at
    * 100 TB a daily ingest re-indexes the day, not the corpus. Any other
    * divergence (OPTIMIZE/DELETE rewrote files) falls back to a full
    * [[build]]. A fresh index is a no-op. Returns (files newly indexed,
    * full-rebuild?). */
  def refresh(spark: SparkSession, dir: Path, colName: String): (Long, Boolean) = {
    val m = Manifest.read(dir).getOrElse(
      throw new IllegalStateException(s"REFRESH TEXT INDEX: no manifest at $dir"))
    val key = m.props.keys.find(_.equalsIgnoreCase(PropPrefix + colName))
      .getOrElse(throw new IllegalStateException(
        s"REFRESH TEXT INDEX: no text index on $colName — CREATE it first"))
    val Array(oldIdx, oldDig) = m.props(key).split(";", 2)
    if (oldDig == digestOf(m)) return (0L, false)
    // which files did the stored index cover? Recorded nowhere — recover
    // them from the posting sidecar itself (distinct file, a metadata read)
    val indexedFiles = spark.read.parquet(dir.resolve(oldIdx).toString)
      .select(col("file")).distinct().collect().map(_.getString(0)).toSet
    val live = m.entries.filter(_.rows > 0).map(_.name)
    val appended = live.filterNot(indexedFiles)
    if (!indexedFiles.subsetOf(live.toSet))
      // an indexed file left the live set: rewrite happened — full rebuild
      return (build(spark, dir, colName)._1, true)
    val idxName = s"_tokenidx_${java.util.UUID.randomUUID.toString.take(8)}"
    val delta = scanFiles(spark, dir, appended)
      .select(col("_file").as("file"),
        explode(split(col(colName), " ")).as("token"))
      .where(length(col("token")) > 0)
      .select(col("token"), col("file")).distinct()
    spark.read.parquet(dir.resolve(oldIdx).toString).unionByName(delta)
      .write.parquet(dir.resolve(idxName).toString)
    ManifestLock.withLock(dir) {
      val cur = Manifest.read(dir).getOrElse(m)
      Manifest.write(dir, cur.copy(props =
        cur.props + (key -> s"$idxName;${digestOf(m)}")))
    }
    (appended.length.toLong, false)
  }

  /** Drop the index prop (idempotent); the dir becomes VACUUM-reapable. */
  def drop(spark: SparkSession, dir: Path, colName: String): Unit =
    ManifestLock.withLock(dir) {
      Manifest.read(dir).foreach { cur =>
        val key = cur.props.keys.find(_.equalsIgnoreCase(PropPrefix + colName))
        key.foreach(k => Manifest.write(dir, cur.copy(props = cur.props - k)))
      }
    }

  /** The posting list for `term` when a FRESH index exists on `colName`:
    * `Some(candidate file names)` (possibly empty — the token is absent
    * from the corpus), `None` when no index is published or it is stale.
    * One small driver-side parquet read — planning-class work, shared by
    * [[search]] and the transparent rewrite rule
    * ([[graft.plans.IndexedFilterRewrite]]). */
  def candidateFiles(spark: SparkSession, dir: Path, colName: String,
      term: String): Option[Seq[String]] = {
    val m = Manifest.read(dir).getOrElse(return None)
    m.props.collectFirst {
      case (k, v) if k.equalsIgnoreCase(PropPrefix + colName) => v
    }.flatMap { v =>
      val Array(idxName, dig) = v.split(";", 2)
      if (dig != digestOf(m)) None
      else Some(spark.read.parquet(dir.resolve(idxName).toString)
        .where(col("token") === term)
        .select(col("file")).distinct().collect().map(_.getString(0)).toSeq)
    }
  }

  /** All rows whose tokenized `colName` contains `term`. Index-assisted
    * when a FRESH index exists (candidate files from the posting list,
    * exact predicate re-applied scan-side); full scan otherwise. */
  def search(spark: SparkSession, table: String, colName: String,
      term: String): DataFrame = {
    val mt = spark.table(table).queryExecution.analyzed.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
        if r.table.isInstanceOf[ManifestTable] =>
        r.table.asInstanceOf[ManifestTable]
    }.getOrElse(throw new UnsupportedOperationException(
      s"TEXT SEARCH: $table is not a graft manifest table"))
    val pred = array_contains(split(col(colName), " "), term)
    candidateFiles(spark, mt.dir, colName, term) match {
      case Some(cand) if cand.isEmpty => spark.table(table).where(lit(false))
      case Some(cand) => scanFiles(spark, mt.dir, cand).where(pred)
      case None => spark.table(table).where(pred)
    }
  }
}
