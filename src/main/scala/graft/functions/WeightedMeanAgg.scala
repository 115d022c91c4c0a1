package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The PUBLIC typed aggregation surface (`Aggregator[IN, BUF, OUT]` +
  * `functions.udaf`) — the user-facing tier below the repo's Catalyst
  * `TypedImperativeAggregate`s (`VectorSumFixed`, `BloomFilterBuild`,
  * `CountMinBuild`): no Catalyst internals, still fully partial/final —
  * `reduce` runs map-side, `merge` combines executor partials, so the
  * shuffle carries one (Σwx, Σw) pair per group at any scale.
  *
  * Semantics: weighted mean with EXACT decimal accumulation — inputs are
  * quantized to scale 4 (the repo-wide determinism contract, `queries/Det`),
  * products re-quantized to scale 4 (the value DuckDB's
  * `CAST(x * w AS DECIMAL(...,4))` yields — exact when inputs carry ≤2
  * decimals, as the testdata's price × quantity does), and the single
  * double division at the end runs on identical operands on any IEEE
  * engine — hash-reproducible against the DuckDB oracle, unlike a
  * double-streaming weighted mean whose value depends on partial order.
  */
object WeightedMeanAgg extends Aggregator[(Double, Double), (JBigDecimal, JBigDecimal), Double] {

  private def q4(x: Double): JBigDecimal =
    JBigDecimal.valueOf(x).setScale(4, RoundingMode.HALF_UP)

  override def zero: (JBigDecimal, JBigDecimal) =
    (JBigDecimal.ZERO, JBigDecimal.ZERO)

  override def reduce(b: (JBigDecimal, JBigDecimal), in: (Double, Double)):
      (JBigDecimal, JBigDecimal) = {
    val (x, w) = in
    (b._1.add(q4(x).multiply(q4(w)).setScale(4, RoundingMode.HALF_UP)),
      b._2.add(q4(w)))
  }

  override def merge(a: (JBigDecimal, JBigDecimal), b: (JBigDecimal, JBigDecimal)):
      (JBigDecimal, JBigDecimal) = (a._1.add(b._1), a._2.add(b._2))

  /** Long-units conversion before the double division: DuckDB's direct
    * DECIMAL→DOUBLE cast is not correctly rounded above 2^53 (same finding
    * as `q_agg_stats`); exact integer units → double is, on every engine. */
  override def finish(b: (JBigDecimal, JBigDecimal)): Double =
    if (b._2.signum == 0) Double.NaN
    else (b._1.movePointRight(4).longValueExact.toDouble / 1e4) / b._2.doubleValue

  override def bufferEncoder: Encoder[(JBigDecimal, JBigDecimal)] =
    Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
