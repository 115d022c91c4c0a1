package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{ArrayContains, AttributeReference, Expression, Literal, PredicateHelper, StringSplit}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.StringType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.{ManifestTable, TextIndex}

/** TRANSPARENT token-index pruning (the secondary-index experience — no
  * special search API): a filter carrying the engine's own token-match
  * idiom,
  *
  * {{{ WHERE array_contains(split(col, ' '), 'term') }}}
  *
  * over a manifest table with a FRESH text index on `col` is rewritten to
  * scan only the posting list's files — plain SQL gets the same file
  * skipping [[graft.sources.TextIndex.search]] provides. The predicate
  * itself is NEVER removed: candidate files over-approximate (a file can
  * hold the token only in rows other conjuncts reject), so the scan-side
  * re-check keeps the rewrite purely an I/O optimization — semantics are
  * untouched even if the index lied.
  *
  * Post-hoc resolution tier (the [[MvRewrite]] pattern): the analyzed
  * tree still has plain `DataSourceV2Relation`s whose options the rewrite
  * can pin (`files=`), before scan planning. Freshness is re-checked per
  * query against the CURRENT manifest digest
  * ([[graft.sources.TextIndex.candidateFiles]]) — a stale index simply
  * does not rewrite, correctness never depends on rebuild discipline.
  * A `VERSION AS OF` read prunes against the SNAPSHOT's OWN posting
  * sidecar when its digest matches
  * ([[graft.sources.TextIndex.candidateFilesAsOf]], r16 — the SQL twin
  * of `searchAsOf`): a post-version decoy holding the token is never
  * planned, and a snapshot with no servable index scans unpruned. The
  * C200 guard's substance stands — a pinned scan never prunes against
  * the CURRENT manifest's lists. Explicitly option-pinned reads
  * (`files=` / `snapshot=` / `changesFrom=`) stay untouched: those are
  * engine-internal serve paths that already pinned their files.
  *
  * The posting lookup is one small driver-side parquet read per matching
  * query — the same planning-cost class as zone-map pruning. */
object IndexedFilterRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private def spark: SparkSession = SparkSession.active

  /** The manifest relation under a Filter's (possibly alias-wrapped)
    * child — catalog tables analyze as `SubqueryAlias(DataSourceV2Relation)`. */
  private def relationOf(p: LogicalPlan): Option[DataSourceV2Relation] =
    p match {
      case r: DataSourceV2Relation => Some(r)
      case a: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias =>
        relationOf(a.child)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, child) if relationOf(child).exists { r =>
          r.table.isInstanceOf[ManifestTable] &&
            !r.options.containsKey("files") &&
            !r.options.containsKey("snapshot") &&
            !r.options.containsKey("changesFrom")
        } =>
      val r = relationOf(child).get
      val mt = r.table.asInstanceOf[ManifestTable]
      // a VERSION AS OF table pins its snapshot INTERNALLY — the
      // current-manifest digest says nothing about that file set, so a
      // pinned read resolves candidates against the SNAPSHOT's own
      // posting sidecar instead (r16); any miss serves unpruned
      val snap = mt.pinnedSnapshot
      // EVERY token-match conjunct participates: a row matching
      // `has(t1) AND has(t2)` can only live in a file holding BOTH tokens,
      // so the candidate set is the INTERSECTION of the posting lists —
      // multi-term SQL filters skip the union's complement too. Only the
      // default full split (limit = -1) matches the index's tokenizer: an
      // explicit limit (split(col, ' ', 2)) leaves spaces inside the
      // trailing token, so a spaced "term" could match rows the single-
      // token posting lookup would wrongly pin to zero files.
      val tokenPreds: Seq[(String, String)] =
        splitConjunctivePredicates(cond).collect {
          case ArrayContains(
              StringSplit(a: AttributeReference,
                Literal(sep, StringType), Literal(lim, _)),
              Literal(term, StringType))
            if sep != null && sep.toString == " " && term != null &&
              lim == -1 && r.output.exists(_.exprId == a.exprId) =>
            (a.name, term.toString)
        }
      val lists: Seq[Seq[String]] = tokenPreds.flatMap {
        case (colName, term) => snap match {
          case Some(v) =>
            TextIndex.candidateFilesAsOf(spark, mt.dir, colName, term, v)
          case None =>
            TextIndex.candidateFiles(spark, mt.dir, colName, term)
        }
      }
      val hit: Option[Seq[String]] =
        if (lists.isEmpty) None
        else Some(lists.map(_.toSet).reduce(_ intersect _).toSeq.sorted)
      hit match {
        case Some(cand) =>
          val names = if (cand.isEmpty) "" else cand.mkString(",")
          val withFiles = new java.util.HashMap[String, String](r.options)
          // an empty posting list still pins (files= matches nothing):
          // the absent-token query plans ZERO files
          withFiles.put("files", names)
          val pinned = r.copy(options = new CaseInsensitiveStringMap(withFiles))
          f.copy(child = child.transformUp {
            case rel: DataSourceV2Relation if rel eq r => pinned
          })
        case None => f
      }
  }
}
