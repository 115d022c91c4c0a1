package graft.plans

import java.nio.file.Path

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.sources.Manifest

/** TRANSPARENT MATERIALIZED-VIEW REWRITING (the Calcite/warehouse
  * `enable_query_rewrite` feature): a query whose optimized plan EQUALS a
  * registered MV's definition is answered from the STORED result instead
  * of recomputing — `SELECT source, count(*) … GROUP BY source` over a
  * 100 TB table becomes a scan of a |groups|-row table.
  *
  * Opt-in per MV via [[MvRewrite.register]] (the analyzed + optimized
  * definition, the MV's relation, and its freshness lineage are captured
  * once). At plan time the rule:
  *
  *  1. checks FRESHNESS — the MV's recorded source version must still be
  *     the source table's CURRENT version (one cached manifest stat; a
  *     stale MV is simply not substituted, correctness never depends on
  *     refresh discipline);
  *  2. compares `plan.canonicalized` against the definition's (exprIds
  *     and aliases normalized — textually different but semantically
  *     identical spellings match; anything else misses);
  *  3. substitutes a Project over the MV's relation that re-binds the MV's
  *     columns to the ORIGINAL plan's output exprIds, so parents resolve
  *     unchanged.
  *
  * Registered as a POST-HOC RESOLUTION rule: at the end of analysis both
  * the incoming plan and the stored definition are plain analyzed trees
  * (`DataSourceV2Relation`s, before scan pushdown manufactures per-query
  * scan instances that never compare equal), so canonicalized equality is
  * meaningful; the substituted MV scan then optimizes like any other. */
object MvRewrite extends Rule[LogicalPlan] {

  /** One registered MV: its optimized definition, the scan to substitute,
    * and the freshness lineage (source dir + the version the stored
    * result reflects — re-read per refresh via the MV's own props). */
  private case class Registered(mvTable: String, defn: LogicalPlan,
      relation: DataSourceV2Relation, mvDir: Path)

  private val registry = TrieMap.empty[String, Registered]

  /** Registration analyzes the MV's own definition query — with the rule
    * ACTIVE. Without a guard, re-registering a fresh MV (or registering a
    * second MV whose definition equals an existing one) would substitute a
    * registered MV into the stored defn itself, so future user queries no
    * longer canonically match. The flag makes apply() a no-op on this
    * thread while the defn is being captured. */
  private val registering = new ThreadLocal[Boolean] {
    override def initialValue(): Boolean = false
  }

  /** Register `mvTable` (a `CREATE MATERIALIZED VIEW` product) for
    * transparent rewriting in this JVM's sessions. */
  def register(spark: SparkSession, mvTable: String): Unit = {
    val mvDir = ManifestTarget.of(spark, mvTable, "MV REWRITE").dir
    val props = Manifest.read(mvDir).map(_.props).getOrElse(Map.empty)
    val query = props.get(MaterializedView.QueryProp)
      .map(MaterializedView.unb64).getOrElse(throw new IllegalArgumentException(
        s"MV REWRITE: $mvTable is not a materialized view"))
    registering.set(true)
    val (defn, rel) = try {
      val d = spark.sql(query).queryExecution.analyzed
      val r = spark.table(mvTable).queryExecution.analyzed.collectFirst {
        case r: DataSourceV2Relation => r
      }.getOrElse(throw new IllegalStateException(
        s"MV REWRITE: $mvTable did not analyze to a DSv2 relation"))
      (d, r)
    } finally registering.set(false)
    registry.put(mvTable, Registered(mvTable, defn, rel, mvDir))
  }

  /** Drop a registration (tests; or after DROP TABLE). */
  def unregister(mvTable: String): Unit = registry.remove(mvTable)

  /** The MV reflects its sources' CURRENT state: every recorded version ==
    * that source's newest snapshot (all reads hit the manifest cache).
    * Join MVs record several sources; ALL must be unchanged. */
  private def fresh(r: Registered): Boolean = {
    val props = Manifest.read(r.mvDir).map(_.props).getOrElse(Map.empty)
    val recorded = MaterializedView.recordedSources(props)
    recorded.nonEmpty && recorded.forall { case (d, v) =>
      Manifest.snapshotVersions(java.nio.file.Paths.get(d))
        .lastOption.getOrElse(0) == v
    }
  }

  private def matches(p: LogicalPlan, r: Registered,
      fresh: Registered => Boolean): Boolean =
    p.output.length == r.defn.output.length &&
      p.output.zip(r.defn.output).forall { case (a, b) => a.dataType == b.dataType } &&
      p.canonicalized == r.defn.canonicalized &&
      fresh(r)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (registry.isEmpty || registering.get()) return plan
    // freshness (a manifest stat read) memoized per apply() invocation —
    // a plan with many candidate subtrees checks each MV's version once
    val freshness = scala.collection.mutable.Map.empty[String, Boolean]
    val cachedFresh: Registered => Boolean =
      r => freshness.getOrElseUpdate(r.mvTable, fresh(r))
    plan.transformUp {
      case p if p.resolved =>
        registry.values.find(matches(p, _, cachedFresh)) match {
          case Some(r) =>
            logInfo(s"MV rewrite: answering a subtree from ${r.mvTable}")
            // re-bind the MV's columns to the ORIGINAL output exprIds so
            // every parent reference resolves unchanged; a fresh relation
            // instance keeps attribute ids unique across substitutions
            val rel = r.relation.newInstance()
            Project(p.output.zip(rel.output).map { case (orig, c) =>
              Alias(c, orig.name)(exprId = orig.exprId)
            }, rel)
          case None => p
        }
    }
  }
}
