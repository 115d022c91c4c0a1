package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSuite

/** Storage-partitioned joins over bucket-partitioned manifest tables:
  * the fanout writer must produce bucket-pure files tagged with their
  * bucket id, the scan must report `KeyGroupedPartitioning(bucket(n,col))`,
  * and a join of two co-bucketed tables on the bucket column must plan
  * with NO shuffle exchange on either side (the Iceberg SPJ model). */
class SpjSpec extends SparkSuite {
  import spark.implicits._

  private lazy val rootDir = {
    val d = Files.createTempDirectory("graft_spj_").toString
    spark.conf.set("spark.sql.catalog.graftspj", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftspj.root", d)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftspj.q")
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

  test("fanout writer produces bucket-pure files tagged with their bucket id") {
    rootDir
    spark.sql("""CREATE TABLE graftspj.q.purity (id BIGINT, v DOUBLE)
                 PARTITIONED BY (bucket(4, id))""")
    (1L to 400L).map(i => (i, i * 0.5)).toDF("id", "v")
      .repartition(3) // several tasks, arbitrary row placement
      .writeTo("graftspj.q.purity").append()

    val dir = Paths.get(rootDir, "q", "purity")
    val m = Manifest.read(dir).get
    assert(m.entries.nonEmpty)
    // every file carries the purity tag with lo == hi in [0, 4)
    val tags = m.entries.map { e =>
      val r = e.stats.ranges.get(Manifest.bucketStatKey(4, "id"))
      assert(r.isDefined, s"${e.name} lacks the bucket tag")
      assert(r.get._1 == r.get._2 && r.get._1 >= 0 && r.get._1 < 4)
      e.name -> r.get._1.toInt
    }.toMap
    // and the tag is TRUE: re-hash every row of every file
    val rows = spark.table("graftspj.q.purity")
      .selectExpr("id", "_file").as[(Long, String)].collect()
    rows.foreach { case (id, f) =>
      assert(BucketHash.ofLong(id, 4) == tags(f),
        s"row $id sits in $f tagged ${tags(f)}")
    }
    // all 4 buckets materialized across the table
    assert(tags.values.toSet == Set(0, 1, 2, 3))
  }

  test("co-bucketed join on the bucket column plans with zero shuffles") {
    rootDir
    spark.sql("""CREATE TABLE graftspj.q.cust (ck BIGINT, name STRING)
                 PARTITIONED BY (bucket(4, ck))""")
    spark.sql("""CREATE TABLE graftspj.q.ord (ok BIGINT, ck BIGINT, amt DOUBLE)
                 PARTITIONED BY (bucket(4, ck))""")
    (1L to 100L).map(i => (i, s"c$i")).toDF("ck", "name")
      .repartition(2).writeTo("graftspj.q.cust").append()
    (1L to 500L).map(i => (i, i % 120L + 1L, i * 1.0)).toDF("ok", "ck", "amt")
      .repartition(3).writeTo("graftspj.q.ord").append()

    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true") {
      val j = spark.table("graftspj.q.cust")
        .join(spark.table("graftspj.q.ord"), "ck")
        .groupBy("ck").count()
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"SPJ join must not shuffle either side:\n$plan")
      // and the join is RIGHT: mirror with plain DataFrames
      val expected = (1L to 500L).map(i => i % 120L + 1L).filter(_ <= 100L)
        .groupBy(identity).map { case (k, v) => (k, v.size.toLong) }.toMap
      val got = j.as[(Long, Long)].collect().toMap
      assert(got == expected)
    }
  }

  test("one-side shuffle: a plain side shuffles INTO the bucket layout via the V2 function") {
    rootDir
    spark.sql("""CREATE TABLE graftspj.q.fact (ck BIGINT, amt DOUBLE)
                 PARTITIONED BY (bucket(4, ck))""")
    (1L to 300L).map(i => (i % 80L + 1L, i * 1.0)).toDF("ck", "amt")
      .repartition(3).writeTo("graftspj.q.fact").append()
    // the OTHER side is a plain in-memory frame — no bucket layout at all
    val dim = (1L to 80L).map(i => (i, s"d$i")).toDF("ck", "name")
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.sources.v2.bucketing.shuffle.enabled" -> "true") {
      val j = spark.table("graftspj.q.fact").join(dim, "ck")
      val plan = j.queryExecution.executedPlan.toString
      // the bucketed side reads in place; ONLY the plain side exchanges —
      // Spark EVALUATES the catalog's bucket function to route its rows,
      // which is the end-to-end proof the V2 function and the fanout
      // writer share one hash (a mismatch would lose every misrouted row)
      val exchanges = "Exchange".r.findAllIn(plan).length
      assert(exchanges == 1,
        s"expected exactly the plain side's exchange, got $exchanges:\n$plan")
      assert(j.count() == 300L, "every fact row must find its dim row")
    }
  }

  test("a file without the purity tag withholds SPJ and the join still works") {
    rootDir
    spark.sql("""CREATE TABLE graftspj.q.mix (ck BIGINT, v DOUBLE)
                 PARTITIONED BY (bucket(4, ck))""")
    (1L to 50L).map(i => (i, i * 1.0)).toDF("ck", "v")
      .writeTo("graftspj.q.mix").append()
    // a PATH-addressed append whose schema misses the bucket column type
    // match is impossible here, so simulate a legacy file: strip the tag
    val dir = Paths.get(rootDir, "q", "mix")
    val m = Manifest.read(dir).get
    val untagged = m.entries.head
    val stripped = untagged.copy(stats = ColumnStats(
      untagged.stats.ranges - Manifest.bucketStatKey(4, "ck"),
      untagged.stats.incomplete, untagged.stats.strRanges,
      untagged.stats.bloomsRaw, untagged.stats.ndvRaw))
    Manifest.write(dir, Manifest(m.schema,
      stripped +: m.entries.tail, m.props))

    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = spark.table("graftspj.q.mix")
        .join(spark.table("graftspj.q.mix").selectExpr("ck AS ck2", "v AS v2"),
          $"ck" === $"ck2")
      // falls back to a shuffled join — but stays correct
      assert(j.count() == 50L)
    }
  }
}
