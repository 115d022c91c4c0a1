package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSuite

/** `REORG TABLE … APPLY (PURGE)` — the SCOPED deletion-vector purge:
  * only DV-bearing files rewrite; everything else keeps its name; time
  * travel still reads through the vectors; a vector-free table no-ops. */
class ReorgSpec extends SparkSuite {
  import spark.implicits._

  private def freshCatalog(tag: String): (String, java.nio.file.Path) = {
    val root = Files.createTempDirectory(s"graft_reorg_$tag").toString
    spark.conf.set(s"spark.sql.catalog.$tag", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$tag.root", root)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $tag.ns")
    (tag, Paths.get(root).resolve("ns"))
  }

  test("REORG purges only the vectored files; others keep their names") {
    val (cat, ns) = freshCatalog("reorgspec1")
    spark.sql(s"CREATE TABLE $cat.ns.t (id BIGINT, grp STRING) " +
      "TBLPROPERTIES ('delete.dv' = 'true')")
    // 4 files clustered by grp → the DELETE's vectors land in exactly one
    val df = (0L until 400L).map(i => (i, s"g${i % 4}")).toDF("id", "grp")
    df.repartition(4, df("grp")).writeTo(s"$cat.ns.t").append()
    spark.sql(s"DELETE FROM $cat.ns.t WHERE grp = 'g1' AND id < 200")
    val dir = ns.resolve("t")
    val before = Manifest.read(dir).get.entries
    val vectored = before.filter(_.dv.isDefined).map(_.name).toSet
    val plain = before.filter(_.dv.isEmpty).map(_.name).toSet
    assert(vectored.nonEmpty && plain.nonEmpty)

    val out = spark.sql(s"REORG TABLE $cat.ns.t APPLY (PURGE)").collect()(0)
    assert(out.getInt(0) == vectored.size) // files_purged

    val after = Manifest.read(dir).get.entries
    assert(after.forall(_.dv.isEmpty), "vectors survived the purge")
    // the scoped contract: every non-vectored file survives BY NAME
    assert(plain.subsetOf(after.map(_.name).toSet))
    // and no vectored original is still referenced
    assert(after.map(_.name).toSet.intersect(vectored).isEmpty)
    // row semantics unchanged: the complement, exactly
    assert(spark.table(s"$cat.ns.t").count() == 400 - 50)
    assert(spark.table(s"$cat.ns.t")
      .where("grp = 'g1' AND id < 200").count() == 0)
  }

  test("time travel pre-REORG still reads through the vectors") {
    val (cat, ns) = freshCatalog("reorgspec2")
    spark.sql(s"CREATE TABLE $cat.ns.t (id BIGINT) " +
      "TBLPROPERTIES ('delete.dv' = 'true')")
    (0L until 100L).toDF("id").coalesce(1).writeTo(s"$cat.ns.t").append()
    spark.sql(s"DELETE FROM $cat.ns.t WHERE id < 10")
    val dir = ns.resolve("t")
    val preReorg = Manifest.snapshotVersions(dir).last
    spark.sql(s"REORG TABLE $cat.ns.t APPLY (PURGE)")
    // the archived post-DELETE snapshot keeps its vectored view
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.t VERSION AS OF $preReorg")
      .collect()(0).getLong(0) == 90)
    assert(spark.table(s"$cat.ns.t").count() == 90)
  }

  test("a vector-free table no-ops as (0, 0)") {
    val (cat, _) = freshCatalog("reorgspec3")
    spark.sql(s"CREATE TABLE $cat.ns.t (id BIGINT)")
    (0L until 10L).toDF("id").writeTo(s"$cat.ns.t").append()
    val out = spark.sql(s"REORG TABLE $cat.ns.t APPLY (PURGE)").collect()(0)
    assert(out.getInt(0) == 0 && out.getInt(1) == 0)
  }
}
