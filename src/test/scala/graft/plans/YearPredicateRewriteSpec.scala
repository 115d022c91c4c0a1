package graft.plans

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

/** The year(ts)=Y rewrite must fire exactly where it is semantics-
  * preserving: integer-literal equality over timestamp/date columns — and
  * nowhere else. */
class YearPredicateRewriteSpec extends SparkSuite {

  private def lineitem = Tables(spark, sfDir, "lineitem")

  private def optimized(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  test("equality over a timestamp column rewrites to a sargable range") {
    val p = optimized(lineitem.filter(year(col("l_shipdate")) === 1995))
    assert(!p.contains("year("), p.take(600))
    assert(p.contains(">=") && p.contains("<"), p.take(600))
  }

  test("equality over a DATE column rewrites too") {
    val p = optimized(lineitem
      .withColumn("d", col("l_shipdate").cast("date"))
      .filter(year(col("d")) === 1996))
    assert(!p.contains("year("), p.take(600))
  }

  test("inequalities and IN are left alone") {
    val gt = optimized(lineitem.filter(year(col("l_shipdate")) > 1995))
    assert(gt.contains("year("), gt.take(600))
    val in = optimized(lineitem.filter(year(col("l_shipdate")).isin(1995, 1996)))
    assert(in.contains("year("), in.take(600))
  }

  test("rewrite preserves results, including both literal orders") {
    val expected = lineitem
      .filter(col("l_shipdate") >= lit("1995-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1996-01-01 00:00:00").cast("timestamp")).count()
    assert(lineitem.filter(year(col("l_shipdate")) === 1995).count() === expected)
    assert(lineitem.filter(lit(1995) === year(col("l_shipdate"))).count() === expected)
  }
}
