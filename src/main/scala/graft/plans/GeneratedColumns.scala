package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Add, Alias, Attribute, Cast, Expression, Literal, MonotonicallyIncreasingID, Multiply, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{AppendData, LogicalPlan, OverwriteByExpression, Project, V2WriteCommand}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{LongType, StructField}

import graft.sources.{Manifest, ManifestTable}

/** OUTPUT RESOLUTION for writes into generated/identity-column manifest
  * tables (the Delta architecture, scoped per table): such tables declare
  * `ACCEPT_ANY_SCHEMA` — Spark's strict output resolution would otherwise
  * refuse the legitimate write that OMITS the computed columns — and this
  * injected resolution rule takes its place:
  *
  *  - a write that omits a `GENERATED ALWAYS AS (expr)` column gets it
  *    COMPUTED: the stored expression parses, its attributes bind to the
  *    incoming query's columns by name, and the value casts to the
  *    declared type — per-row, inside the write's own projection, fully
  *    codegen'd (no shuffle, no extra pass);
  *  - a write that PROVIDES a generated column is legal — the CREATE-time
  *    auto CHECK property (`col <=> CAST(expr AS t)`) validates every row
  *    at the writer, so a wrong explicit value aborts the job before the
  *    commit (the table is untouched);
  *  - an identity column (`GENERATED ALWAYS AS IDENTITY`) fills with
  *    `base + step * monotonically_increasing_id()` where `base` extends
  *    the table's committed high-water mark — DISTRIBUTED assignment
  *    (each task derives ids from its partition ordinal; nothing
  *    serializes through the driver), unique and monotone per partition
  *    with gaps, the documented Delta identity contract. Explicit values
  *    are refused for ALWAYS and accepted for BY DEFAULT;
  *  - provided columns resolve BY NAME (`writeTo(t).append()`, INSERT
  *    with a column list) or BY POSITION (plain `INSERT INTO t VALUES`) —
  *    positional writes may carry either the full width or exactly the
  *    non-computed columns in table order;
  *  - the commit advances the high-water mark from the committed files'
  *    own zone maps and fails loudly on a concurrent-writer id-range
  *    collision ([[Manifest.identityCommitProps]]); the write builder's
  *    exact-schema guard backstops any path this rule doesn't see.
  *
  * The rule tags the rewritten command so re-analysis passes skip it (the
  * rewritten query's schema matches the table exactly, including the
  * columns it computed — indistinguishable from a legal explicit write).
  */
object ResolveGeneratedWrites extends Rule[LogicalPlan] {

  private val Rewritten = TreeNodeTag[Boolean]("graft.generatedWriteResolved")

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case a @ AppendData(r: DataSourceV2Relation, query, _, isByName, _, _)
        if query.resolved && a.getTagValue(Rewritten).isEmpty &&
          eligible(r).isDefined =>
      rewrite(a, r, query, isByName)
    case o @ OverwriteByExpression(r: DataSourceV2Relation, _, query, _, isByName, _, _)
        if query.resolved && o.getTagValue(Rewritten).isEmpty &&
          eligible(r).isDefined =>
      rewrite(o, r, query, isByName)
  }

  private def autoMergeOn: Boolean =
    conf.getConfString("spark.graft.schema.autoMerge", "false") == "true"

  /** The table's (generated, identity) contract, when it has one — or any
    * manifest table when write-time schema evolution is on (the rule then
    * owns by-name alignment, since ACCEPT_ANY_SCHEMA stood Spark's
    * resolution down). */
  private def eligible(r: DataSourceV2Relation)
    : Option[(Map[String, String], Map[String, Manifest.IdentitySpec])] =
    r.table match {
      case t: ManifestTable =>
        val props = Manifest.read(t.dir).map(_.props).getOrElse(Map.empty)
        val gens = Manifest.generatedCols(props)
        val ids = Manifest.identityCols(props)
        if (gens.nonEmpty || ids.nonEmpty || autoMergeOn) Some((gens, ids))
        else None
      case _ => None
    }

  private def rewrite(cmd: V2WriteCommand, r: DataSourceV2Relation,
      query: LogicalPlan, isByName: Boolean): LogicalPlan = {
    val t = r.table.asInstanceOf[ManifestTable]
    val props = Manifest.read(t.dir).map(_.props).getOrElse(Map.empty)
    val gens = Manifest.generatedCols(props)
    val ids = Manifest.identityCols(props)
    val fields = t.schema().fields.toSeq
    def genOf(f: StructField): Option[String] =
      gens.collectFirst { case (n, sql) if n.equalsIgnoreCase(f.name) => sql }
    def idOf(f: StructField): Option[Manifest.IdentitySpec] =
      ids.collectFirst { case (n, s) if n.equalsIgnoreCase(f.name) => s }

    // which table column each incoming attribute provides; under
    // autoMerge, SOURCE-ONLY columns ride along as extras — the write
    // builder ADDs them to the table at execution (write-time evolution)
    val extras: Seq[Attribute] =
      if (isByName && autoMergeOn)
        query.output.filterNot(qa =>
          fields.exists(_.name.equalsIgnoreCase(qa.name)))
      else Seq.empty
    val provided: Map[String, Attribute] =
      if (isByName) {
        query.output.filterNot(qa =>
          extras.exists(_.exprId == qa.exprId)).map { qa =>
          val f = fields.find(_.name.equalsIgnoreCase(qa.name)).getOrElse(
            throw new IllegalArgumentException(
              s"write to ${t.name()}: column ${qa.name} is not in the table " +
                s"schema (${fields.map(_.name).mkString(", ")}) — set " +
                "spark.graft.schema.autoMerge=true to evolve the table"))
          f.name.toLowerCase -> qa
        }.toMap
      } else {
        // positional: the full width, or exactly the non-computed columns
        // in table order (the natural INSERT INTO t VALUES shape)
        val slots: Seq[StructField] =
          if (query.output.length == fields.length) fields
          else {
            val bare = fields.filter(f => genOf(f).isEmpty && idOf(f).isEmpty)
            if (query.output.length == bare.length) bare
            else throw new IllegalArgumentException(
              s"write to ${t.name()}: a positional write must carry " +
                s"${fields.length} columns (the full schema) or " +
                s"${bare.length} (the non-generated, non-identity columns " +
                s"${bare.map(_.name).mkString(", ")} in order); got " +
                s"${query.output.length}")
          }
        slots.zip(query.output).map { case (f, qa) => f.name.toLowerCase -> qa }.toMap
      }

    val projections: Seq[NamedExpression] = fields.map { f =>
      provided.get(f.name.toLowerCase) match {
        case Some(attr) =>
          idOf(f).foreach { spec =>
            if (!spec.allowExplicit) throw new IllegalArgumentException(
              s"write to ${t.name()}: column ${f.name} is GENERATED ALWAYS " +
                "AS IDENTITY — explicit values are not accepted (declare " +
                "GENERATED BY DEFAULT AS IDENTITY to allow them)")
          }
          Alias(castTo(attr, f), f.name)()
        case None => genOf(f) match {
          case Some(sql) =>
            val parsed = SparkSession.active.sessionState.sqlParser
              .parseExpression(sql)
            // bind the stored expression's column references to the
            // incoming query's attributes ourselves — name resolution must
            // follow the TABLE's columns, not whatever aliases analysis
            // would pick; functions resolve in the analyzer's fixpoint
            val bound = parsed.transformUp {
              case u: UnresolvedAttribute if u.nameParts.length == 1 =>
                provided.getOrElse(u.nameParts.head.toLowerCase,
                  throw new IllegalArgumentException(
                    s"write to ${t.name()}: generated column ${f.name} " +
                      s"computes from ${u.nameParts.head}, which this write " +
                      "does not provide"))
            }
            Alias(Cast(bound, f.dataType), f.name)()
          case None => idOf(f) match {
            case Some(spec) =>
              val base = props.get(Manifest.IdHwmPrefix + f.name)
                .map(_.toLong + spec.step).getOrElse(spec.start)
              val expr: Expression = Add(Literal(base, LongType),
                Multiply(Literal(spec.step, LongType), MonotonicallyIncreasingID()))
              Alias(Cast(expr, f.dataType), f.name)()
            case None =>
              // a DEFAULT contract fills the omission (Spark's own output
              // resolution is stood down on ACCEPT_ANY_SCHEMA tables, so
              // this rule owns defaults here too)
              Manifest.defaultCols(props).collectFirst {
                case (n, sql) if n.equalsIgnoreCase(f.name) => sql
              } match {
                case Some(sql) =>
                  Alias(Literal.create(
                    Manifest.foldDefault(sql, f.dataType, f.name), f.dataType),
                    f.name)()
                case None => throw new IllegalArgumentException(
                  s"write to ${t.name()}: no data for column ${f.name} " +
                    s"(write provides ${query.output.map(_.name).mkString(", ")})")
              }
          }
        }
      }
    }
    val out = cmd.withNewQuery(Project(
      projections ++ extras.map(a => Alias(a, a.name)()), query))
    out.setTagValue(Rewritten, true)
    out
  }

  private def castTo(attr: Attribute, f: StructField): Expression =
    if (attr.dataType == f.dataType) attr else Cast(attr, f.dataType)
}
