package graft.plans

import java.nio.file.Files

import graft.SparkSuite

/** MERGE schema evolution (`spark.graft.schema.autoMerge=true`): a star
  * action's source-only columns ADD to the target metadata-only; target
  * columns the source lacks keep (update) or NULL-fill (insert). Off by
  * default — drift must be opted into. */
class MergeEvolveSpec extends SparkSuite {
  import spark.implicits._

  private def freshTable(tag: String): String = {
    val root = Files.createTempDirectory(s"graft_mev_$tag").toString
    spark.conf.set(s"spark.sql.catalog.$tag", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$tag.root", root)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $tag.ns")
    Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("id", "name", "v").coalesce(1).writeTo(s"$tag.ns.t").create()
    s"$tag.ns.t"
  }

  test("autoMerge adds source-only columns; keep/null semantics hold") {
    val t = freshTable("mev1")
    // source: id matches 2 (update) and brings 9 (insert); extra column
    // `score`, and it LACKS target column `v`
    Seq((2L, "B", 0.5), (9L, "I", 0.9))
      .toDF("id", "name", "score").createOrReplaceTempView("mev1_src")
    spark.conf.set("spark.graft.schema.autoMerge", "true")
    try spark.sql(
      s"""MERGE INTO $t t USING mev1_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    finally spark.conf.set("spark.graft.schema.autoMerge", "false")

    val out = spark.table(t).orderBy("id").collect()
    assert(spark.table(t).schema.fieldNames.toSeq == Seq("id", "name", "v", "score"))
    // untouched row: score NULL
    assert(out(0).getString(1) == "a" && out(0).getLong(2) == 10L && out(0).isNullAt(3))
    // updated row: new values, `v` KEPT (source lacks it), score populated
    assert(out(1).getString(1) == "B" && out(1).getLong(2) == 20L &&
      out(1).getDouble(3) == 0.5)
    // inserted row: `v` NULL-filled
    assert(out(3).getLong(0) == 9L && out(3).isNullAt(2) &&
      out(3).getDouble(3) == 0.9)
  }

  test("off by default: star merge does not evolve the schema") {
    val t = freshTable("mev2")
    Seq((2L, "B", 99L, 0.5)).toDF("id", "name", "v", "score")
      .createOrReplaceTempView("mev2_src")
    spark.sql(
      s"""MERGE INTO $t t USING mev2_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    assert(spark.table(t).schema.fieldNames.toSeq == Seq("id", "name", "v"))
    assert(spark.table(t).where("id = 2").collect()(0).getLong(2) == 99L)
  }

  test("off by default: a source missing target columns is refused") {
    val t = freshTable("mev3")
    Seq((2L, "B")).toDF("id", "name").createOrReplaceTempView("mev3_src")
    val e = intercept[IllegalArgumentException] {
      spark.sql(
        s"""MERGE INTO $t t USING mev3_src s ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    }
    assert(e.getMessage.contains("every target column"))
  }

  test("autoMerge without a star action does not evolve") {
    val t = freshTable("mev4")
    Seq((2L, 0.5)).toDF("id", "score").createOrReplaceTempView("mev4_src")
    spark.conf.set("spark.graft.schema.autoMerge", "true")
    try spark.sql(
      s"""MERGE INTO $t t USING mev4_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET name = 'hit'""".stripMargin)
    finally spark.conf.set("spark.graft.schema.autoMerge", "false")
    assert(spark.table(t).schema.fieldNames.toSeq == Seq("id", "name", "v"))
    assert(spark.table(t).where("id = 2").collect()(0).getString(1) == "hit")
  }
}
