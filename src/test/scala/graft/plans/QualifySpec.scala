package graft.plans

import graft.SparkSuite

/** The QUALIFY dialect extension (r14): the post-window filter rewrites
  * to the subquery it abbreviates, while `qualify` as a plain IDENTIFIER
  * (non-reserved in Spark) keeps parsing untouched, and inline OVER(...)
  * predicates refuse with guidance. */
class QualifySpec extends SparkSuite {
  import spark.implicits._

  test("QUALIFY filters on window aliases; trailing ORDER BY survives") {
    Seq((1, 10), (1, 20), (1, 30), (2, 5), (2, 50))
      .toDF("g", "v").createOrReplaceTempView("qlf_t")
    val rows = spark.sql(
      """SELECT g, v,
        |  row_number() OVER (PARTITION BY g ORDER BY v DESC) AS rk
        |FROM qlf_t
        |QUALIFY rk <= 2
        |ORDER BY g, rk""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(rows.toSeq == Seq((1, 30, 1), (1, 20, 2), (2, 50, 1), (2, 5, 2)),
      rows.toSeq.toString)
  }

  test("qualify as an identifier parses untouched") {
    Seq((1, 2)).toDF("qualify", "v").createOrReplaceTempView("qlf_id")
    // as a projected column, and in a WHERE — both delegate to Spark
    assert(spark.sql("SELECT qualify FROM qlf_id")
      .collect().head.getInt(0) == 1)
    assert(spark.sql("SELECT v FROM qlf_id WHERE qualify = 1")
      .collect().head.getInt(0) == 2)
    // inside a string literal, untouched
    assert(spark.sql("SELECT 'QUALIFY rk <= 2' AS s FROM qlf_id")
      .collect().head.getString(0) == "QUALIFY rk <= 2")
  }

  test("inline OVER(...) in the predicate refuses with guidance") {
    Seq((1, 2)).toDF("g", "v").createOrReplaceTempView("qlf_ov")
    val e = intercept[IllegalArgumentException] {
      spark.sql("SELECT g, v FROM qlf_ov " +
        "QUALIFY row_number() OVER (ORDER BY v) = 1")
    }
    assert(e.getMessage.contains("alias"), e.getMessage)
  }

  test("unspaced operator before identifier `qualify` delegates (r15)") {
    Seq((1, 2)).toDF("qualify", "v").createOrReplaceTempView("qlf_op")
    // `b=qualify` used to leave `B=` as the last token (not in the
    // banned set) and mangle the statement into `… WHERE b=) …`
    assert(spark.sql("SELECT v FROM qlf_op WHERE 1=qualify")
      .collect().head.getInt(0) == 2)
    assert(spark.sql("SELECT v FROM qlf_op WHERE qualify<=1")
      .collect().head.getInt(0) == 2)
  }

  test("top-level WITH … QUALIFY rewrites (r15)") {
    Seq((1, 10), (1, 20), (2, 5), (2, 50))
      .toDF("g", "v").createOrReplaceTempView("qlf_w")
    val rows = spark.sql(
      """WITH base AS (SELECT g, v FROM qlf_w)
        |SELECT g, v,
        |  row_number() OVER (PARTITION BY g ORDER BY v DESC) AS rk
        |FROM base
        |QUALIFY rk = 1
        |ORDER BY g""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(rows.toSeq == Seq((1, 20, 1), (2, 50, 1)), rows.toSeq.toString)
  }

  test("QUALIFY inside a CTE arm rewrites (r15)") {
    Seq((1, 10), (1, 20), (2, 5), (2, 50))
      .toDF("g", "v").createOrReplaceTempView("qlf_cte")
    val rows = spark.sql(
      """WITH ranked AS (
        |  SELECT g, v,
        |    row_number() OVER (PARTITION BY g ORDER BY v DESC) AS rk
        |  FROM qlf_cte
        |  QUALIFY rk = 1
        |)
        |SELECT g, v FROM ranked ORDER BY g""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(rows.toSeq == Seq((1, 20), (2, 50)), rows.toSeq.toString)
  }

  test("CTE arm QUALIFY + main-body QUALIFY compose (r15)") {
    Seq((1, 10), (1, 20), (2, 5), (2, 50), (3, 7))
      .toDF("g", "v").createOrReplaceTempView("qlf_cte2")
    val rows = spark.sql(
      """WITH ranked AS (
        |  SELECT g, v,
        |    row_number() OVER (PARTITION BY g ORDER BY v DESC) AS rk
        |  FROM qlf_cte2
        |  QUALIFY rk = 1
        |)
        |SELECT g, v, row_number() OVER (ORDER BY v DESC) AS vrk
        |FROM ranked
        |QUALIFY vrk <= 2
        |ORDER BY vrk""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(rows.toSeq == Seq((2, 50), (1, 20)), rows.toSeq.toString)
  }
}
