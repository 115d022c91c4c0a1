package graft.plans
import java.nio.file.Files
import graft.SparkSuite
class MvDebug3Spec extends SparkSuite {
  import spark.implicits._
  test("debug analyzed-level match") {
    val d = Files.createTempDirectory("graft_mvd3_").toString
    spark.conf.set("spark.sql.catalog.gm3", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gm3.root", d)
    spark.sql("CREATE NAMESPACE gm3.q")
    spark.sql("CREATE TABLE gm3.q.docs (doc_id BIGINT, source STRING, n_chars BIGINT)")
    (1L to 30L).map(i => (i, s"s${i % 3}", i * 3L)).toDF("doc_id", "source", "n_chars")
      .writeTo("gm3.q.docs").append()
    val Q = "SELECT source, count(*) AS n FROM gm3.q.docs GROUP BY source"
    val a1 = spark.sql(Q).queryExecution.analyzed
    val a2 = spark.sql(Q).queryExecution.analyzed
    info("a1:\n" + a1.treeString)
    info("canonEQ: " + (a1.canonicalized == a2.canonicalized))
    a1.canonicalized.children.zip(a2.canonicalized.children).foreach { case (x, y) =>
      info("childEQ " + x.getClass.getSimpleName + ": " + (x == y)) }
  }
}
