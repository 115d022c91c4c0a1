package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSuite

/** `ALTER TABLE … SET PARTITIONING` — partition evolution as a
  * metadata-only swap of the clustering contract: old files keep their
  * clustering (zone maps still prune), new writes follow the new layout,
  * and a changed bucket count self-invalidates stale purity tags (the
  * table withholds SPJ) until OPTIMIZE re-tags every file. */
class PartitionEvolutionSpec extends SparkSuite {
  import spark.implicits._

  private lazy val rootDir = {
    val d = Files.createTempDirectory("graft_pevo_").toString
    spark.conf.set("spark.sql.catalog.graftpe", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftpe.root", d)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftpe.q")
    d
  }

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def transformsOf(table: String): Seq[String] =
    spark.sessionState.catalogManager.catalog("graftpe")
      .asInstanceOf[GraftCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("q"), table))
      .partitioning().map(_.toString).toSeq

  test("identity -> days(ts) evolution is metadata-only and un-partitioning works") {
    rootDir
    spark.sql("""CREATE TABLE graftpe.q.ev (src STRING, ts TIMESTAMP, v BIGINT)
                 PARTITIONED BY (src)""")
    Seq(("a", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L))
      .toDF("src", "ts", "v").writeTo("graftpe.q.ev").append()
    val dir = Paths.get(rootDir, "q", "ev")
    val filesBefore = Manifest.read(dir).get.entries.map(_.name)

    spark.sql("ALTER TABLE graftpe.q.ev SET PARTITIONING (days(ts))")
    assert(transformsOf("ev").exists(_.toLowerCase.contains("days")))
    // no file was rewritten
    assert(Manifest.read(dir).get.entries.map(_.name) == filesBefore)
    // new writes land and reads see everything
    Seq(("b", java.sql.Timestamp.valueOf("2024-02-01 00:00:00"), 2L))
      .toDF("src", "ts", "v").writeTo("graftpe.q.ev").append()
    assert(spark.table("graftpe.q.ev").count() == 2L)

    spark.sql("ALTER TABLE graftpe.q.ev SET PARTITIONING ()")
    assert(transformsOf("ev").isEmpty)
    assert(spark.table("graftpe.q.ev").count() == 2L)
  }

  test("bucket-count evolution withholds SPJ until OPTIMIZE re-tags the files") {
    rootDir
    spark.sql("""CREATE TABLE graftpe.q.a (ck BIGINT, v DOUBLE)
                 PARTITIONED BY (bucket(4, ck))""")
    spark.sql("""CREATE TABLE graftpe.q.b (ck BIGINT, w DOUBLE)
                 PARTITIONED BY (bucket(8, ck))""")
    (1L to 200L).map(i => (i, i * 1.0)).toDF("ck", "v")
      .repartition(2).writeTo("graftpe.q.a").append()
    (1L to 200L).map(i => (i, i * 2.0)).toDF("ck", "w")
      .repartition(2).writeTo("graftpe.q.b").append()

    val dirA = Paths.get(rootDir, "q", "a")
    // files are tagged for count 4 on ck
    assert(Manifest.read(dirA).get.entries.forall(
      _.stats.ranges.contains(Manifest.bucketStatKey(4, "ck"))))

    spark.sql("ALTER TABLE graftpe.q.a SET PARTITIONING (bucket(8, ck))")
    val old = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def joinPlan: String = spark.table("graftpe.q.a")
        .join(spark.table("graftpe.q.b"), "ck")
        .queryExecution.executedPlan.toString
      // stale @bucket4 tags self-invalidate under the new count: the scan
      // must NOT claim key-grouped partitioning, so the join shuffles
      assert(joinPlan.contains("Exchange hashpartitioning"),
        "stale bucket tags must withhold SPJ after a count change")

      // OPTIMIZE rewrites through the fanout writer (the scratch manifest
      // carries the bucket transform) and re-tags every file for count 8
      spark.sql("OPTIMIZE graftpe.q.a")
      assert(Manifest.read(dirA).get.entries.forall(
        _.stats.ranges.contains(Manifest.bucketStatKey(8, "ck"))))
      // both sides now co-bucketed at 8: zero shuffles again
      assert(!joinPlan.contains("Exchange hashpartitioning"),
        s"post-OPTIMIZE join must be shuffle-free:\n$joinPlan")
      // and the data survived both the evolution and the rewrite
      assert(spark.table("graftpe.q.a").count() == 200L)
      assert(spark.table("graftpe.q.a").join(spark.table("graftpe.q.b"), "ck")
        .count() == 200L)
    } finally old match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("same-count bucket-COLUMN evolution also withholds SPJ until re-tagged") {
    rootDir
    spark.sql("""CREATE TABLE graftpe.q.colswap (ck BIGINT, ok BIGINT, v DOUBLE)
                 PARTITIONED BY (bucket(4, ck))""")
    spark.sql("""CREATE TABLE graftpe.q.colother (ok BIGINT, w DOUBLE)
                 PARTITIONED BY (bucket(4, ok))""")
    (1L to 200L).map(i => (i, 1000L - i, i * 1.0)).toDF("ck", "ok", "v")
      .repartition(2).writeTo("graftpe.q.colswap").append()
    (801L to 999L).map(i => (i, i * 2.0)).toDF("ok", "w")
      .repartition(2).writeTo("graftpe.q.colother").append()
    val dir = Paths.get(rootDir, "q", "colswap")
    // tags were written for bucket(4, ck)
    assert(Manifest.read(dir).get.entries.forall(
      _.stats.ranges.contains(Manifest.bucketStatKey(4, "ck"))))

    // evolve to the SAME count over a DIFFERENT column: the count matches
    // but the files were hashed on ck, not ok — a purity claim here would
    // silently drop rows from a storage-partitioned join on ok
    spark.sql("ALTER TABLE graftpe.q.colswap SET PARTITIONING (bucket(4, ok))")
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      def join = spark.table("graftpe.q.colswap")
        .join(spark.table("graftpe.q.colother"), "ok")
      assert(join.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"),
        "ck-hashed files must withhold SPJ under bucket(4, ok)")
      assert(join.count() == 199L) // and the join stays complete

      // OPTIMIZE re-buckets on ok; SPJ comes back shuffle-free and complete
      spark.sql("OPTIMIZE graftpe.q.colswap")
      assert(Manifest.read(dir).get.entries.forall(
        _.stats.ranges.contains(Manifest.bucketStatKey(4, "ok"))))
      assert(!join.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"),
        "post-OPTIMIZE join on ok must be shuffle-free")
      assert(join.count() == 199L)
    }
  }

  test("SET PARTITIONING validates like CREATE TABLE") {
    rootDir
    spark.sql("CREATE TABLE graftpe.q.val (id BIGINT, d DOUBLE)")
    Seq((1L, 1.0)).toDF("id", "d").writeTo("graftpe.q.val").append()
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE graftpe.q.val SET PARTITIONING (nope)")
    }
    assert(e1.getMessage.contains("not in schema"))
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE graftpe.q.val SET PARTITIONING (bucket(4, d))")
    }
    assert(e2.getMessage.contains("bucket"))
    val e3 = intercept[Exception] {
      spark.sql("ALTER TABLE graftpe.q.val SET PARTITIONING (days(id))")
    }
    assert(e3.getMessage.contains("date/timestamp"))
  }
}
