package graft.sources

import java.nio.file.Files

import graft.SparkSuite

/** Table features (the Delta protocol idea): a table that REQUIRES a
  * feature refuses readers and writers that don't implement it — forward
  * compatibility fails loudly, never silently misreads. */
class TableFeaturesSpec extends SparkSuite {
  import spark.implicits._

  private def freshCatalog(tag: String): String = {
    val root = Files.createTempDirectory(s"graft_feat_$tag").toString
    spark.conf.set(s"spark.sql.catalog.$tag", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$tag.root", root)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $tag.ns")
    tag
  }

  test("known required features pass; unknown ones refuse reads AND writes") {
    val cat = freshCatalog("feat1")
    val t = s"$cat.ns.t"
    spark.sql(s"CREATE TABLE $t (id BIGINT)")
    Seq(1L, 2L).toDF("id").writeTo(t).append()
    // a feature this engine implements: both directions keep working
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES " +
      "('feature.required.deletionVectors' = 'true')")
    assert(spark.table(t).count() == 2L)
    Seq(3L).toDF("id").writeTo(t).append()
    // a feature from the future: reads and writes refuse loudly
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES " +
      "('feature.required.quantumCompression' = 'true')")
    val r = intercept[Exception] { spark.table(t).count() }
    assert(r.getMessage.contains("quantumCompression"), r.getMessage)
    val w = intercept[Exception] { Seq(4L).toDF("id").writeTo(t).append() }
    assert(w.getMessage.contains("quantumCompression"), w.getMessage)
    // UNSET restores both directions
    spark.sql(s"ALTER TABLE $t UNSET TBLPROPERTIES " +
      "('feature.required.quantumCompression')")
    assert(spark.table(t).count() == 3L)
    Seq(4L).toDF("id").writeTo(t).append()
    assert(spark.table(t).count() == 4L)
  }

  test("feature requirements surface in t$properties for governance") {
    val cat = freshCatalog("feat2")
    val t = s"$cat.ns.t"
    spark.sql(s"CREATE TABLE $t (id BIGINT) TBLPROPERTIES " +
      "('feature.required.rowTracking' = 'true')")
    Seq(1L).toDF("id").writeTo(t).append()
    val props = spark.sql(s"SELECT key FROM $cat.ns.`t$$properties`")
      .collect().map(_.getString(0))
    assert(props.contains("feature.required.rowTracking"))
  }
}
