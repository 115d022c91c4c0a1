package graft.plans

import java.time.{LocalDate, ZoneOffset}

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** Optimizer rule (the (c)-tier `Rule[LogicalPlan]` extension): rewrite
  * `year(ts) = <const>` into the equivalent half-open timestamp range
  *
  *   ts >= 'Y-01-01 00:00:00' AND ts < '(Y+1)-01-01 00:00:00'
  *
  * Why it matters at scale: `year(ts) = 1995` applies a function to the
  * column, so the parquet reader cannot use row-group/page min-max stats —
  * the scan reads EVERYTHING and filters per row. The rewritten range is
  * sargable: it reaches `FileSourceScanExec` as PushedFilters and skips
  * whole row groups (asserted in PlanSpec). Generalizes the reference's
  * driver-side month pruning (pasta1_etl/src/main.py:158-163) into a plan
  * rewrite any query benefits from automatically.
  *
  * Semantics-preserving notes:
  *  - the cast year() sees is the session-timezone calendar; the range
  *    literals are built for UTC, so the rule only fires when the session
  *    timezone IS UTC (this engine pins it — Sessions.scala);
  *  - null in → null out on both forms (a null ts fails both predicates);
  *  - only integer-literal equality is rewritten, either operand order.
  */
object YearPredicateRewrite extends Rule[LogicalPlan] {

  private def microsAtYearStart(y: Int): Long =
    LocalDate.of(y, 1, 1).atStartOfDay(ZoneOffset.UTC).toInstant.getEpochSecond * 1000000L

  private def daysAtYearStart(y: Int): Int =
    LocalDate.of(y, 1, 1).toEpochDay.toInt

  /** The sargable range twin of `year(child) = y`, when child is a
    * timestamp cast to date (how the analyzer resolves year(ts)) or a bare
    * date column. */
  private def rangeFor(child: Expression, y: Int): Option[Expression] = child match {
    case Cast(ts, DateType, _, _) if ts.dataType == TimestampType =>
      Some(And(
        GreaterThanOrEqual(ts, Literal(microsAtYearStart(y), TimestampType)),
        LessThan(ts, Literal(microsAtYearStart(y + 1), TimestampType))))
    case d if d.dataType == DateType =>
      Some(And(
        GreaterThanOrEqual(d, Literal(daysAtYearStart(y), DateType)),
        LessThan(d, Literal(daysAtYearStart(y + 1), DateType))))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (SQLConf.get.sessionLocalTimeZone != "UTC") return plan
    plan.transformAllExpressions {
      case eq @ EqualTo(Year(child), IntegerLiteral(y)) =>
        rangeFor(child, y).getOrElse(eq)
      case eq @ EqualTo(IntegerLiteral(y), Year(child)) =>
        rangeFor(child, y).getOrElse(eq)
    }
  }
}
