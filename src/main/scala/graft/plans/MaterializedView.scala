package graft.plans

import java.nio.file.Path
import java.util.Base64

import org.apache.spark.sql.{DataFrame, GraftExpressionBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, Sort, SubqueryAlias}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.{GraftCatalog, Manifest, ManifestTable}

/** MATERIALIZED VIEWS over manifest tables, with INCREMENTAL refresh riding
  * the snapshot trail (the lakehouse MV-maintenance story):
  *
  *  - `CREATE MATERIALIZED VIEW t AS <query>` evaluates the query PINNED to
  *    the source's current snapshot, stores the result as an ordinary
  *    manifest table, and records (query, source dir, source version) in
  *    the MV table's own manifest props — the MV is fully self-describing.
  *  - `REFRESH MATERIALIZED VIEW t` diffs the source's snapshot trail
  *    against the recorded version. When the window is APPEND-ONLY (every
  *    old file still live, byte-identical entry, no new deletion vectors)
  *    and the query is a DECOMPOSABLE aggregate (GROUP BY + COUNT / SUM /
  *    MIN / MAX over Project/Filter of the one source), the refresh
  *    aggregates ONLY the files added since the last refresh and merges the
  *    partials into the stored result: counts and sums add, mins and maxes
  *    fold — cost O(|MV| + |new data|), NEVER a rescan of the 100 TB
  *    source. Any other shape (joins, AVG, DISTINCT, a rewrite in the
  *    window, a recreated source) falls back to a full recompute — a
  *    correctness-first downgrade, never a wrong incremental answer.
  *
  * Both paths publish through the sink's atomic truncate-overwrite commit,
  * which preserves the MV props; the recorded source version advances in a
  * second metadata-only swap. Readers see the old MV or the new one, never
  * a partial.
  *
  * Not decomposable by design: AVG (final form is not mergeable — declare
  * SUM + COUNT and divide at read), DISTINCT aggregates, and double SUMs
  * are merged in floating point (bit-exactness across refresh histories is
  * not promised for doubles; use DECIMAL or integer columns where it is).
  */
object MaterializedView {
  /** MV metadata keys (raw manifest props — engine-owned, so they never
    * surface through SHOW TBLPROPERTIES). The query stores base64ed: SQL
    * text carries newlines the line-oriented manifest cannot hold. */
  private[graft] val QueryProp = "mv.query64"
  private[graft] val SourceDirProp = "mv.sourceDir"
  private[graft] val SourceVersionProp = "mv.sourceVersion"

  private def b64(s: String): String =
    Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))
  private[plans] def unb64(s: String): String =
    new String(Base64.getDecoder.decode(s), "UTF-8")

  /** The ONE manifest-table relation of a plan, when the plan reads exactly
    * one (the incremental contract's source). */
  private def soleSource(plan: LogicalPlan): Option[(DataSourceV2Relation, ManifestTable)] =
    plan.collect {
      case r: DataSourceV2Relation if r.table.isInstanceOf[ManifestTable] =>
        (r, r.table.asInstanceOf[ManifestTable])
    } match {
      case Seq(one) => Some(one)
      case _ => None
    }

  /** Re-pin the plan's (sole) manifest relation to an explicit snapshot
    * and/or file subset — plan surgery via the relation's own read options,
    * so the aggregate/filter/project structure above evaluates unchanged. */
  private def pinned(spark: SparkSession, plan: LogicalPlan,
      snapshot: Option[Int], files: Option[Seq[String]]): DataFrame = {
    val surgered = plan.transform {
      case r: DataSourceV2Relation if r.table.isInstanceOf[ManifestTable] =>
        val opts = new java.util.HashMap[String, String](r.options)
        snapshot.foreach(v => opts.put("snapshot", v.toString))
        files.foreach(fs => opts.put("files", fs.mkString(",")))
        r.copy(options = new CaseInsensitiveStringMap(opts))
    }
    GraftExpressionBridge.ofRows(spark, surgered)
  }

  /** Decomposable-aggregate shape: Aggregate over Project/Filter/alias of
    * one relation, every output either a grouping expression or an alias
    * of an unfiltered COUNT/SUM/MIN/MAX. Returns the per-output merge plan:
    * (output column name, merge function name) — "key" groups, the rest
    * fold with the named SQL aggregate. */
  private def decompose(plan: LogicalPlan): Option[Seq[(String, String)]] = {
    def okChild(p: LogicalPlan): Boolean = p match {
      case f: Filter => f.condition.deterministic && okChild(f.child)
      case pr: Project => pr.projectList.forall(_.deterministic) && okChild(pr.child)
      case s: SubqueryAlias => okChild(s.child)
      case r: DataSourceV2Relation => r.table.isInstanceOf[ManifestTable]
      case _ => false
    }
    def strip(p: LogicalPlan): LogicalPlan = p match {
      case s: Sort => strip(s.child) // MV storage order is irrelevant
      case other => other
    }
    strip(plan) match {
      case Aggregate(_, aggExprs, child, _) if okChild(child) =>
        val cols = aggExprs.map(mergeOf)
        if (cols.forall(_.isDefined) && cols.exists(_.exists(_._2 != "key")))
          Some(cols.flatten)
        else None
      case _ => None
    }
  }

  private def mergeOf(e: NamedExpression): Option[(String, String)] = e match {
    case a: AttributeReference => Some(a.name -> "key")
    case Alias(child, name) =>
      val aggs = child.collect { case ae: AggregateExpression => ae }
      if (aggs.isEmpty)
        // a grouping expression in the output (year(ts), …) — deterministic
        // per row, so it re-derives identically on the delta side
        if (child.deterministic) Some(name -> "key") else None
      else if (aggs.length == 1 && child == aggs.head) aggs.head match {
        case AggregateExpression(fn, Complete, false, None, _) => fn match {
          case _: Count => Some(name -> "sum") // counts add
          case _: Sum => Some(name -> "sum")
          case _: Min => Some(name -> "min")
          case _: Max => Some(name -> "max")
          case _ => None // AVG & friends: final form not mergeable
        }
        case _ => None // DISTINCT / FILTER forms: not mergeable
      }
      else None // expressions OF aggregates (sum(x)/count(x)): not mergeable
    case _ => None
  }

  /** Fold delta partials into the stored MV: union, group by the key
    * columns, merge each aggregate column with its fold function. Works on
    * FINAL values because count/sum/min/max finals ARE their partials. */
  private def merge(old: DataFrame, delta: DataFrame,
      cols: Seq[(String, String)]): DataFrame = {
    import org.apache.spark.sql.functions._
    val keys = cols.collect { case (n, "key") => n }
    val folds = cols.collect { case (n, f) if f != "key" =>
      (f match {
        case "sum" => sum(col(n))
        case "min" => min(col(n))
        case "max" => max(col(n))
      }).as(n)
    }
    val merged = old.unionByName(delta).groupBy(keys.map(col): _*)
      .agg(folds.head, folds.tail: _*)
    // keep the MV's declared column order AND types (re-summing widens
    // decimal precision; the stored schema is already the query's own
    // sum-widened type, so the cast is the identity unless the value
    // genuinely overflows — where a full recompute would overflow too)
    merged.select(cols.map { case (n, _) =>
      col(n).cast(old.schema(n).dataType).as(n) }: _*)
  }

  /** Entry versions that must be UNCHANGED for the window to count as
    * append-only: same physical file, same row count, same deletion-vector
    * sidecar (a new DV is a logical delete — not an append). */
  private def entryKey(e: graft.sources.ManifestFile): (String, Long, Option[String]) =
    (e.name, e.rows, e.dv.map(_._1))

  // ---------------------------------------------------------------- create --

  def create(spark: SparkSession, target: String, query: String): Unit = {
    val analyzed = spark.sql(query).queryExecution.analyzed
    val anyManifest = analyzed.collect {
      case r: DataSourceV2Relation if r.table.isInstanceOf[ManifestTable] => r
    }
    if (anyManifest.isEmpty) throw new UnsupportedOperationException(
      "CREATE MATERIALIZED VIEW: the query must read at least one graft " +
        "manifest table (the refresh machinery rides the snapshot trail)")
    // ONE manifest source → the incremental contract: pin the evaluation to
    // its newest snapshot so the recorded version is EXACTLY what the
    // stored result reflects (a commit landing mid-CTAS must not leak rows
    // the next refresh would re-add). Multi-source queries (joins) are
    // full-refresh MVs: no pinning, no recorded version.
    val single = soleSource(analyzed)
    val v0 = single.map(s => Manifest.snapshotVersions(s._2.dir).lastOption)
    val df = single match {
      case Some(_) => pinned(spark, analyzed, v0.flatten, None)
      case None => GraftExpressionBridge.ofRows(spark, analyzed)
    }
    df.writeTo(target).create()
    val mvDir = ManifestTarget.of(spark, target, "CREATE MATERIALIZED VIEW").dir
    stamp(mvDir, Map(QueryProp -> b64(query)) ++ single.map(s =>
      SourceDirProp -> s._2.dir.toAbsolutePath.toString) ++
      v0.map(v => SourceVersionProp -> v.getOrElse(0).toString))
  }

  /** Metadata-only props update through the same atomic swap as every
    * schema change. */
  private def stamp(mvDir: Path, kv: Map[String, String]): Unit =
    graft.sources.ManifestLock.withLock(mvDir) {
      val m = Manifest.read(mvDir).getOrElse(throw new IllegalStateException(
        s"materialized view: no manifest at $mvDir"))
      Manifest.write(mvDir, m.copy(props = m.props ++ kv))
    }

  // --------------------------------------------------------------- refresh --

  /** Refresh; returns (mode, rows) where mode ∈ {noop, incremental, full}. */
  def refresh(spark: SparkSession, target: String): (String, Long) = {
    val mvDir = ManifestTarget.of(spark, target, "REFRESH MATERIALIZED VIEW").dir
    val props = Manifest.read(mvDir).map(_.props).getOrElse(Map.empty)
    val query = props.get(QueryProp).map(unb64).getOrElse(
      throw new UnsupportedOperationException(
        s"REFRESH MATERIALIZED VIEW: $target is not a materialized view " +
          "(no stored query)"))
    val v0 = props.get(SourceVersionProp).map(_.toInt).getOrElse(0)
    val recordedDir = props.get(SourceDirProp)

    val analyzed = spark.sql(query).queryExecution.analyzed
    val src = soleSource(analyzed)
    val srcDir = src.map(_._2.dir)
    val v1 = srcDir.flatMap(d => Manifest.snapshotVersions(d).lastOption).getOrElse(0)
    if (src.isDefined &&
      recordedDir.contains(srcDir.get.toAbsolutePath.toString) && v1 == v0)
      return ("noop", spark.table(target).count())

    // append-only window: the recorded snapshot still exists, every entry of
    // it survives byte-identically in the current manifest, and the source
    // is still the table the MV was defined over
    val incremental: Option[DataFrame] = for {
      (_, tbl) <- src
      if recordedDir.contains(tbl.dir.toAbsolutePath.toString)
      cols <- decompose(analyzed)
      m1 <- Manifest.read(tbl.dir)
      m0 <- if (v0 == 0) Some(Manifest(m1.schema, Seq.empty))
            else Manifest.readSnapshot(tbl.dir, v0)
      oldKeys = m0.entries.map(entryKey).toSet
      curKeys = m1.entries.map(entryKey).toSet
      if oldKeys.subsetOf(curKeys)
      added = m1.entries.filterNot(e => oldKeys(entryKey(e)))
      // the stored result, PINNED to its newest archived snapshot: the
      // truncate-overwrite below swaps the manifest, but the pinned scan
      // resolved its file list against the immutable archived version and
      // superseded data files stay on disk until VACUUM — so the merge can
      // read the MV it replaces without a driver-side materialization
      mvSnap <- Manifest.snapshotVersions(mvDir).lastOption
      oldMv = spark.read.format("graft.sources.GraftManifestSink")
        .option("path", mvDir.toString).option("snapshot", mvSnap.toString).load()
      delta = pinned(spark, analyzed, Some(v1), Some(added.map(_.name)))
    } yield merge(oldMv, delta, cols)

    val (mode, result) = incremental match {
      case Some(df) => ("incremental", df)
      case None => ("full", pinned(spark, analyzed, Some(v1).filter(_ > 0), None))
    }
    result.writeTo(target).overwrite(org.apache.spark.sql.functions.lit(true))
    stamp(mvDir, Map(SourceVersionProp -> v1.toString) ++
      src.map(s => SourceDirProp -> s._2.dir.toAbsolutePath.toString))
    (mode, spark.table(target).count()) // metadata-only count pushdown
  }
}
