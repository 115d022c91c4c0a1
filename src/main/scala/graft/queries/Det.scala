package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Determinism helpers for DuckDB-oracle hash parity (SURVEY.md §7.5, §7.6).
  *
  * Summing doubles is order-dependent, and Spark's partial/final aggregation
  * order differs from DuckDB's — `round(sum(x),4)` still flaps once the sum's
  * absolute error exceeds 5e-5 (guaranteed at sf0.1 magnitudes). Instead we
  * accumulate **exactly** in DECIMAL(18,4) and convert the exact result to
  * DOUBLE once. The double→DECIMAL(18,4) cast itself is deterministic across
  * engines NOT because inputs carry ≤4 decimal digits (testdata doubles
  * don't), but because exact decimal half-way points (k·5e-5) are
  * unrepresentable in binary doubles — so Spark's HALF_UP and DuckDB's
  * rounding can never disagree on any representable input. Narrowing the
  * scale or changing the rounding mode would break this invariant.
  * Same-valued decimals convert to bit-identical doubles on both engines.
  */
object Det {
  private val Dec = DecimalType(18, 4)

  /** Order-independent deterministic SUM of a double column. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast(DoubleType)

  /** Deterministic AVG = exact decimal sum / non-null count (double division
    * of identical operands is identical on both engines). */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** DuckDB oracle fragment equivalent to [[dsum]]. */
  def sqlSum(x: String): String = s"CAST(SUM(CAST($x AS DECIMAL(18,4))) AS DOUBLE)"

  /** DuckDB oracle fragment equivalent to [[davg]]. */
  def sqlAvg(x: String): String = s"(${sqlSum(x)} / COUNT($x))"
}
