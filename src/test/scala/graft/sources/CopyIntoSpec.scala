package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSuite

/** `COPY INTO` ([[ManifestTable.copyInto]]): idempotent file-level
  * ingestion — each source file loads exactly once, the loaded-set
  * sidecar commits atomically with the data, and re-runs copy only what
  * appeared since. */
class CopyIntoSpec extends SparkSuite {
  import spark.implicits._

  private lazy val rootDir = {
    val d = Files.createTempDirectory("graft_copy_").toString
    spark.conf.set("spark.sql.catalog.graftcp", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftcp.root", d)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcp.q")
    d
  }

  private def stageParquet(dir: java.nio.file.Path, name: String,
      rows: Seq[(Long, String)]): Unit = {
    val tmp = Files.createTempDirectory("graft_cpstage_")
    rows.toDF("id", "v").coalesce(1).write.mode("overwrite")
      .parquet(tmp.toString)
    val part = Files.list(tmp).iterator()
    val f = Iterator.continually(part).takeWhile(_.hasNext).map(_.next())
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.move(f, dir.resolve(name))
  }

  test("each source file loads exactly once; later files load on re-run") {
    rootDir
    val src = Files.createTempDirectory("graft_cpsrc_")
    stageParquet(src, "a.parquet", Seq((1L, "x"), (2L, "y")))
    stageParquet(src, "b.parquet", Seq((3L, "z")))
    spark.sql("CREATE TABLE graftcp.q.t (id BIGINT, v STRING)")
    val Array(r1) = spark.sql(
      s"COPY INTO graftcp.q.t FROM '$src' FILEFORMAT = PARQUET").collect()
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2)) == (2L, 3L, 0L),
      s"first copy: $r1")
    // idempotent re-run: nothing copies
    val Array(r2) = spark.sql(
      s"COPY INTO graftcp.q.t FROM '$src' FILEFORMAT = PARQUET").collect()
    assert((r2.getLong(0), r2.getLong(2)) == (0L, 2L), s"re-run: $r2")
    assert(spark.table("graftcp.q.t").count() == 3)
    // a NEW file loads alone
    stageParquet(src, "c.parquet", Seq((4L, "w")))
    val Array(r3) = spark.sql(
      s"COPY INTO graftcp.q.t FROM '$src' FILEFORMAT = PARQUET").collect()
    assert((r3.getLong(0), r3.getLong(1), r3.getLong(2)) == (1L, 1L, 2L),
      s"incremental copy: $r3")
    assert(spark.table("graftcp.q.t").orderBy("id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("PATTERN filters; CSV reads with the table schema; missing column fails") {
    rootDir
    val src = Files.createTempDirectory("graft_cpsrc2_")
    Files.write(src.resolve("d1.csv"), "id,v\n10,a\n11,b\n".getBytes("UTF-8"))
    Files.write(src.resolve("d2.csv"), "id,v\n12,c\n".getBytes("UTF-8"))
    Files.write(src.resolve("skip.txt"), "not,data\n".getBytes("UTF-8"))
    spark.sql("CREATE TABLE graftcp.q.c (id BIGINT, v STRING)")
    val Array(r) = spark.sql(s"COPY INTO graftcp.q.c FROM '$src' " +
      "FILEFORMAT = CSV PATTERN = '*.csv'").collect()
    assert((r.getLong(0), r.getLong(1)) == (2L, 3L), s"csv copy: $r")
    assert(spark.table("graftcp.q.c").orderBy("id").collect()
      .map(r2 => (r2.getLong(0), r2.getString(1))).toSeq ==
      Seq((10L, "a"), (11L, "b"), (12L, "c")))
    // a source lacking a table column refuses in COPY terms
    val src3 = Files.createTempDirectory("graft_cpsrc3_")
    stageParquetMissing(src3)
    spark.sql("CREATE TABLE graftcp.q.m (id BIGINT, v STRING)")
    val e = intercept[Exception] {
      spark.sql(s"COPY INTO graftcp.q.m FROM '$src3' FILEFORMAT = PARQUET").collect()
    }
    assert(e.getMessage.contains("lacks table column"))
    assert(spark.table("graftcp.q.m").count() == 0, "failed copy must not commit")
  }

  private def stageParquetMissing(dir: java.nio.file.Path): Unit = {
    val tmp = Files.createTempDirectory("graft_cpstage_")
    Seq(1L, 2L).toDF("id").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).iterator()
    val f = Iterator.continually(part).takeWhile(_.hasNext).map(_.next())
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.move(f, dir.resolve("only_id.parquet"))
  }

  test("the loaded-set sidecar survives a deep vacuum") {
    rootDir
    val src = Files.createTempDirectory("graft_cpsrc4_")
    stageParquet(src, "a.parquet", Seq((1L, "x")))
    spark.sql("CREATE TABLE graftcp.q.vv (id BIGINT, v STRING)")
    spark.sql(s"COPY INTO graftcp.q.vv FROM '$src' FILEFORMAT = PARQUET").collect()
    spark.conf.set("spark.graft.vacuum.stagingMinAgeMs", "0")
    try spark.sql("VACUUM graftcp.q.vv RETAIN 1 SNAPSHOTS").collect()
    finally spark.conf.unset("spark.graft.vacuum.stagingMinAgeMs")
    val dir = Paths.get(rootDir, "q", "vv")
    val log = Manifest.read(dir).get.props(Manifest.CopyLogProp)
    assert(Files.exists(dir.resolve(log)),
      "deep vacuum must keep the CURRENT copy log")
    val Array(r) = spark.sql(
      s"COPY INTO graftcp.q.vv FROM '$src' FILEFORMAT = PARQUET").collect()
    assert((r.getLong(0), r.getLong(2)) == (0L, 1L),
      s"idempotency must survive the vacuum: $r")
  }
}
