package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSuite

/** Row-level CDF with pre/post images (ManifestTable.changes): appends
  * surface as inserts, deletes as delete pre-images (file-drop and
  * deletion-vector shapes alike), and copy-on-write rewrites as exact
  * update_preimage/update_postimage pairs — carried rows cancel. */
class ChangeFeedSpec extends SparkSuite {
  import spark.implicits._

  private lazy val rootDir = {
    val d = Files.createTempDirectory("graft_cdf_").toString
    spark.conf.set("spark.sql.catalog.graftcdf", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftcdf.root", d)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcdf.q")
    d
  }

  private def changes(dir: java.nio.file.Path, from: Int, to: Int) =
    ManifestTable.changes(spark, dir, from, to)
      .select("id", "v", "_change_type", "_commit_version")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2), r.getInt(3)))
      .toSet

  test("insert, update (COW), and delete commits yield exact images") {
    rootDir
    spark.sql("CREATE TABLE graftcdf.q.t (id BIGINT, v DOUBLE)")
    val dir = Paths.get(rootDir, "q", "t")
    (1L to 10L).map(i => (i, i * 1.0)).toDF("id", "v").coalesce(1)
      .writeTo("graftcdf.q.t").append()
    val v1 = Manifest.snapshotVersions(dir).last
    (11L to 12L).map(i => (i, i * 1.0)).toDF("id", "v").coalesce(1)
      .writeTo("graftcdf.q.t").append()
    val v2 = Manifest.snapshotVersions(dir).last
    spark.sql("UPDATE graftcdf.q.t SET v = v + 100 WHERE id IN (3, 11)")
    val v3 = Manifest.snapshotVersions(dir).last
    spark.sql("DELETE FROM graftcdf.q.t WHERE id = 7")
    val v4 = Manifest.snapshotVersions(dir).last

    // append window: plain inserts
    assert(changes(dir, v1, v2) ==
      Set((11L, 11.0, "insert", v2), (12L, 12.0, "insert", v2)))
    // update window: ONLY the two changed rows, both images; the other
    // rows of the rewritten files cancelled
    assert(changes(dir, v2, v3) == Set(
      (3L, 3.0, "update_preimage", v3), (3L, 103.0, "update_postimage", v3),
      (11L, 11.0, "update_preimage", v3), (11L, 111.0, "update_postimage", v3)))
    // delete window: the removed row as a delete pre-image
    assert(changes(dir, v3, v4) == Set((7L, 7.0, "delete", v4)))
    // the whole window composes all three commit shapes
    val all = changes(dir, v1, v4)
    assert(all.count(_._3 == "insert") == 2)
    assert(all.count(_._3 == "update_preimage") == 2)
    assert(all.count(_._3 == "update_postimage") == 2)
    assert(all.count(_._3 == "delete") == 1)
    assert(all.size == 7)
  }

  test("deletion-vector deletes surface as delete pre-images too") {
    rootDir
    spark.sql("CREATE TABLE graftcdf.q.dv (id BIGINT, v DOUBLE) " +
      "TBLPROPERTIES ('delete.dv' = 'true')")
    val dir = Paths.get(rootDir, "q", "dv")
    (1L to 20L).map(i => (i, i * 1.0)).toDF("id", "v").coalesce(1)
      .writeTo("graftcdf.q.dv").append()
    val v1 = Manifest.snapshotVersions(dir).last
    spark.sql("DELETE FROM graftcdf.q.dv WHERE id IN (4, 9)")
    val v2 = Manifest.snapshotVersions(dir).last
    assert(changes(dir, v1, v2) ==
      Set((4L, 4.0, "delete", v2), (9L, 9.0, "delete", v2)))
  }
}
