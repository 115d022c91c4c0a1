package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSuite

/** Post-commit auto-compaction ([[ManifestTable.maybeAutoCompact]]):
  * a TBLPROPERTIES('autoCompact'='true') table compacts itself once its
  * sub-target live files reach the threshold; opted-out tables never do. */
class AutoCompactSpec extends SparkSuite {
  import spark.implicits._

  private lazy val rootDir = {
    val d = Files.createTempDirectory("graft_ac_").toString
    spark.conf.set("spark.sql.catalog.graftac", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftac.root", d)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftac.q")
    d
  }

  test("trickle appends self-compact at the threshold; rows survive exactly") {
    rootDir
    spark.conf.set("spark.graft.autoCompact.minFiles", "5")
    try {
      spark.sql("CREATE TABLE graftac.q.t (id BIGINT, v STRING) " +
        "TBLPROPERTIES ('autoCompact' = 'true')")
      (1 to 6).foreach { i =>
        Seq((i.toLong, s"v$i")).toDF("id", "v").coalesce(1)
          .writeTo("graftac.q.t").append()
      }
      val dir = Paths.get(rootDir, "q", "t")
      val files = Manifest.read(dir).get.entries.count(_.rows > 0)
      assert(files < 5,
        s"6 single-row appends should have auto-compacted, live files = $files")
      assert(spark.table("graftac.q.t").orderBy("id").collect()
        .map(_.getLong(0)).toSeq == (1L to 6L),
        "compaction must preserve every row exactly")
    } finally spark.conf.unset("spark.graft.autoCompact.minFiles")
  }

  test("tables without the property never self-compact") {
    rootDir
    spark.conf.set("spark.graft.autoCompact.minFiles", "3")
    try {
      spark.sql("CREATE TABLE graftac.q.n (id BIGINT)")
      (1 to 5).foreach { i =>
        Seq(i.toLong).toDF("id").coalesce(1).writeTo("graftac.q.n").append()
      }
      val dir = Paths.get(rootDir, "q", "n")
      assert(Manifest.read(dir).get.entries.count(_.rows > 0) == 5,
        "an opted-out table must keep its file-per-append layout")
    } finally spark.conf.unset("spark.graft.autoCompact.minFiles")
  }

  test("a data stream over an auto-compacted table stays exactly-once") {
    rootDir
    spark.conf.set("spark.graft.autoCompact.minFiles", "4")
    try {
      spark.sql("CREATE TABLE graftac.q.s (id BIGINT) " +
        "TBLPROPERTIES ('autoCompact' = 'true')")
      (1 to 5).foreach { i =>
        Seq(i.toLong).toDF("id").coalesce(1).writeTo("graftac.q.s").append()
      }
      val dir = Paths.get(rootDir, "q", "s")
      assert(Manifest.read(dir).get.entries.count(_.rows > 0) < 4)
      // the auto-compact layout commit is dataChange=false: a fresh data
      // stream over the table delivers each row exactly once
      val ckpt = Files.createTempDirectory("graft_ac_ck_").toString
      val out = spark.readStream.format("graft.sources.GraftManifestSink")
        .option("path", dir.toString).load()
      val q = out.writeStream.format("memory").queryName("ac_stream")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      val got = spark.table("ac_stream").collect().map(_.getLong(0)).sorted.toSeq
      assert(got == (1L to 5L), s"stream must deliver exactly once, got $got")
    } finally spark.conf.unset("spark.graft.autoCompact.minFiles")
  }
}
