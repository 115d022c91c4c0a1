package graft.plans

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{StringType, StructType}

/** Parser-tier extension (`SparkSessionExtensions.injectParser`) — the last
  * of the four public extension tiers (the others: expressions/functions,
  * optimizer rule, planner strategy — `functions/GraftExtensions`). Adds ONE
  * maintenance statement for the manifest-committed sink
  * ([[graft.sources.GraftManifestSink]]):
  *
  * {{{ VACUUM MANIFEST '<table dir>' }}}
  *
  * deletes files the commit protocol made unreachable — staged leftovers
  * from crashed attempts (everything under `_staging/`) and data files no manifest
  * references (from torn pre-commit failures) — and reports one row per
  * file removed. The analog of Delta's `VACUUM`, scoped to this sink.
  *
  * Everything that is not this statement delegates VERBATIM to Spark's own
  * parser — the extension adds syntax without forking the grammar.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  private val Vacuum = """(?is)\s*VACUUM\s+MANIFEST\s+'([^']+)'\s*;?\s*""".r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case Vacuum(dir) => VacuumManifestCommand(dir)
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

/** Driver-side maintenance: every file under `_staging/` is by definition
  * uncommitted (commit MOVES files out of staging before the manifest swap),
  * and any `part-*` data file absent from the manifest is unreachable. Both
  * are safe to reap at any time — a concurrent commit can only reference
  * files it just moved OUT of staging itself. */
case class VacuumManifestCommand(dir: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("file", StringType, nullable = false)(),
    AttributeReference("reason", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val root = Paths.get(dir)
    if (!Files.isDirectory(root)) return Seq.empty
    val committed: Set[String] = graft.sources.Manifest.read(root)
      .map(_.files.map(_._1).toSet).getOrElse(Set.empty)
    val staging = root.resolve("_staging")
    val staged =
      if (Files.isDirectory(staging))
        Files.list(staging).iterator().asScala.toSeq.map { p =>
          Files.deleteIfExists(p); Row(s"_staging/${p.getFileName}", "staged-uncommitted")
        }
      else Seq.empty
    val orphans = Files.list(root).iterator().asScala.toSeq
      .filter(p => Files.isRegularFile(p))
      .filter(p => p.getFileName.toString.startsWith("part-"))
      .filterNot(p => committed(p.getFileName.toString))
      .map { p => Files.deleteIfExists(p); Row(p.getFileName.toString, "unmanifested") }
    staged ++ orphans
  }
}
