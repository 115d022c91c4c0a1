package graft.plans

import java.nio.file.Files

import graft.SparkSuite

/** `MERGE INTO t USING (subquery) AS s ON …` — the Delta/ANSI subquery
  * source: the balanced paren group after USING is extracted (outside
  * quoted literals) and the command evaluates it instead of resolving a
  * table name. The common production shape is a deduplicating
  * pre-aggregation over a raw feed. */
class MergeSubquerySpec extends SparkSuite {
  import spark.implicits._

  private lazy val cat = {
    val root = Files.createTempDirectory("graft_msub_").toString
    spark.conf.set("spark.sql.catalog.graftmsub", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftmsub.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftmsub.ns")
    "graftmsub"
  }

  test("a subquery source merges like its equivalent view") {
    cat
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "v")
      .coalesce(1).writeTo(s"$cat.ns.t").create()
    // raw feed with per-key duplicates: the subquery keeps the max —
    // exactly the cardinality-violating shape a bare USING would reject
    Seq((2L, 21.0), (2L, 22.0), (9L, 90.0)).toDF("id", "v")
      .createOrReplaceTempView("msub_feed")
    spark.sql(
      s"""MERGE INTO $cat.ns.t t
         |USING (SELECT id, max(v) AS v FROM msub_feed GROUP BY id) AS s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""".stripMargin)
    assert(spark.table(s"$cat.ns.t").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet ==
      Set((1L, 10.0), (2L, 22.0), (3L, 30.0), (9L, 90.0)))
  }

  test("quoted parens inside the subquery don't break the extraction; " +
    "NMBS clauses compose") {
    cat
    Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("k", "v")
      .coalesce(1).writeTo(s"$cat.ns.t2").create()
    spark.sql(
      s"""MERGE INTO $cat.ns.t2 t
         |USING (SELECT concat('(', 'b', ')') AS junk, 'b' AS k, 20 AS v) s
         |ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED BY SOURCE AND t.k = 'c' THEN DELETE""".stripMargin)
    assert(spark.table(s"$cat.ns.t2").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("a", 1L), ("b", 20L)))
  }
}
