package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSuite

/** `CLUSTER BY` (liquid-clustering DDL): the spec lowers onto the sink's
  * value-clustering machinery — range-clustered writes, zone-map pruning,
  * and OPTIMIZE re-clustering by the declared spec. */
class ClusterBySpec extends SparkSuite {
  import spark.implicits._

  private lazy val rootDir = {
    val d = Files.createTempDirectory("graft_cb_").toString
    spark.conf.set("spark.sql.catalog.graftcb", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftcb.root", d)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcb.q")
    d
  }

  test("CLUSTER BY declares, round-trips, and clusters writes for pruning") {
    rootDir
    spark.sql("CREATE TABLE graftcb.q.t (id BIGINT, v DOUBLE) CLUSTER BY (id) " +
      "TBLPROPERTIES ('write.targetFileSize' = '2000')")
    // partitioning() reports the declared spec back
    val parts = spark.sql("DESCRIBE TABLE EXTENDED graftcb.q.t").collect()
      .map(_.getString(0))
    val t = spark.sessionState.catalogManager.catalog("graftcb")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("q"), "t"))
    assert(t.partitioning().exists(_.name == "cluster_by"),
      s"partitioning must report cluster_by, got ${t.partitioning().mkString(", ")}")
    val _ = parts
    // a SCATTERED write range-clusters by the spec: per-file id ranges
    // are disjoint, so a point-range predicate prunes files
    (1L to 900L).map(i => (i, i * 1.5)).toDF("id", "v")
      .repartition(8) // deliberately scattered input
      .writeTo("graftcb.q.t").append()
    val dir = Paths.get(rootDir, "q", "t")
    val entries = Manifest.read(dir).get.entries.filter(_.rows > 0)
    assert(entries.length > 1, "fixture needs several files")
    val ranges = entries.map(_.stats.ranges("id"))
    // the contract: a range predicate prunes MOST files via the zone maps
    // (the write range-clusters; parallel writer tasks may interleave a
    // couple of files per range, so per-file strict disjointness is not
    // promised — per-range-group disjointness is)
    val hit = ranges.count(_._1 <= BigDecimal(100))
    assert(hit <= math.max(2, entries.length / 3),
      s"id <= 100 should touch a small file subset, hit $hit of " +
        s"${entries.length}: $ranges")
  }

  test("OPTIMIZE without ZORDER re-clusters by the declared spec") {
    rootDir
    spark.sql("CREATE TABLE graftcb.q.o (id BIGINT, v DOUBLE) CLUSTER BY (id)")
    // several appends each cover the FULL id range → overlapping files
    (0 until 3).foreach { k =>
      (1L to 300L).map(i => (i, (i + k).toDouble)).toDF("id", "v")
        .coalesce(1).writeTo("graftcb.q.o").append()
    }
    val dir = Paths.get(rootDir, "q", "o")
    val before = Manifest.read(dir).get.entries.filter(_.rows > 0)
      .map(_.stats.ranges("id"))
    assert(before.forall(r => r._1 == BigDecimal(1) && r._2 == BigDecimal(300)),
      s"fixture files must overlap fully, got $before")
    spark.sql("OPTIMIZE graftcb.q.o")
    val after = Manifest.read(dir).get.entries.filter(_.rows > 0)
      .map(_.stats.ranges("id")).sortBy(_._1)
    assert(spark.table("graftcb.q.o").count() == 900)
    assert(after.length == 1 || after.sliding(2).forall {
      case Seq(a, b) => a._2 <= b._1; case _ => true },
      s"OPTIMIZE must leave id-disjoint files, got $after")
  }

  test("CLUSTER BY refuses unknown and duplicate columns") {
    rootDir
    intercept[Exception] {
      spark.sql("CREATE TABLE graftcb.q.bad (id BIGINT) CLUSTER BY (nope)")
    }
    intercept[Exception] {
      spark.sql("CREATE TABLE graftcb.q.bad2 (id BIGINT, v DOUBLE) " +
        "CLUSTER BY (id, id)")
    }
  }
}
