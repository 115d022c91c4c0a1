package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

/** Semantics tests for the round-3 additions to the relational surface:
  * the data-quality rule battery, windowed distinct counts, and the
  * LATERAL correlated-subquery form. (All three are also hash-checked
  * against the DuckDB oracle; these tests pin the invariants the oracle
  * can't express — rule outcomes on clean data, cross-checks against
  * independent formulations, and decorrelation of the lateral plan.) */
class QualitySurfaceSpec extends SparkSuite {

  test("q_dq_checks: the driver testdata passes every rule") {
    val rows = Features.queries("q_dq_checks")(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("rule")).toSeq ===
      Seq("fk_customer", "has_rows", "pk_unique", "price_positive",
        "priority_complete", "status_in_set"))
    rows.foreach { r =>
      assert(r.getAs[Boolean]("ok"), s"rule ${r.getAs[String]("rule")} failed")
      assert(r.getAs[Long]("violations") === 0L)
    }
  }

  test("q_window_distinct: agrees with the independent groupBy countDistinct, running count is monotone") {
    val df = Aggs.queries("q_window_distinct")(spark, sfDir)
    val perCust = df.groupBy("o_custkey")
      .agg(max("n_prio_total").as("w_total"), max("n_prio_sofar").as("sofar_max"),
        min("n_prio_total").as("w_total_min"))
    val direct = Tables(spark, sfDir, "orders").groupBy("o_custkey")
      .agg(countDistinct("o_orderpriority").cast("int").as("d_total"))
    val joined = perCust.join(direct, "o_custkey")
    // every row of a customer carries the same total; the running count
    // reaches exactly that total; both equal the direct distinct count
    assert(joined.filter(col("w_total") =!= col("w_total_min")).count() === 0L)
    assert(joined.filter(col("w_total") =!= col("d_total")).count() === 0L)
    assert(joined.filter(col("sofar_max") =!= col("d_total")).count() === 0L)
    assert(df.filter(col("n_prio_sofar") > col("n_prio_total")).count() === 0L)
  }

  test("q_lateral: top-2-per-customer semantics and a decorrelated (single-pass) plan") {
    val df = SetsScalars.queries("q_lateral")(spark, sfDir)
    val rows = df.collect()
    val byCust = rows.groupBy(_.getAs[Long]("c_custkey"))
    assert(byCust.values.forall(_.length <= 2))
    // cross-check against the window formulation of the same ask
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(desc("o_totalprice"), col("o_orderkey"))
    val expect = Tables(spark, sfDir, "orders")
      .join(Tables(spark, sfDir, "customer")
          .filter(col("c_mktsegment") === "MACHINERY")
          .select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .select(col("c_custkey"), col("o_orderkey"), col("o_totalprice"))
      .orderBy("c_custkey", "o_orderkey").collect()
    assert(rows.toSeq === expect.toSeq)
    // Catalyst must decorrelate the LIMIT subquery into a ranked join —
    // a per-customer re-execution would show up as a recursive subquery
    // node; the decorrelated plan runs the orders scan once.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window") || plan.contains("TakeOrdered"),
      s"expected a decorrelated ranked join, got:\n$plan")
  }
}
