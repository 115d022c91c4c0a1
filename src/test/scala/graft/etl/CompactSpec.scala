package graft.etl

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

/** Compaction must shrink the file count to the size-derived target while
  * preserving every row, and per-partition compaction must keep the
  * partition layout intact. */
class CompactSpec extends SparkSuite {

  test("flat directory: many small files compact to size-targeted few, rows preserved") {
    val dir = graft.Scratch.dir("graft_compact_") + "/orders"
    val orders = Tables(spark, sfDir, "orders")
    orders.repartition(64).write.parquet(dir)   // simulate append fragmentation
    val expected = orders.count()

    val beforeStats = Compact.layoutStats(dir)
    assert(beforeStats.files >= 32, s"setup should fragment, got ${beforeStats.files}")
    // target ≈ 1/4 of the data per file → ~4 files
    val (before, after) = Compact.directory(spark, dir, targetBytes = beforeStats.bytes / 4)
    assert(before.files === beforeStats.files)
    assert(after.files <= 8 && after.files >= 1, s"got ${after.files} files")
    assert(spark.read.parquet(dir).count() === expected, "no row may be lost")
  }

  test("sortBy re-clusters: each output file covers a disjoint key range") {
    val dir = graft.Scratch.dir("graft_compact_") + "/sorted"
    Tables(spark, sfDir, "orders").repartition(16).write.parquet(dir)
    val stats = Compact.layoutStats(dir)
    Compact.directory(spark, dir, targetBytes = stats.bytes / 3, sortBy = Some("o_orderkey"))
    // per-file [min,max] of the sort key must not overlap across files
    import spark.implicits._
    val ranges = spark.read.parquet(dir)
      .select(col("o_orderkey"), input_file_name().as("f"))
      .groupBy("f").agg(min("o_orderkey").as("lo"), max("o_orderkey").as("hi"))
      .as[(String, Long, Long)].collect().sortBy(_._2)
    ranges.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) => assert(hi1 <= lo2, "file ranges overlap")
      case _ =>
    }
  }

  test("q_compact_roundtrip recipe: 24-file layout shrinks and loses nothing") {
    // the declared-query shape (EtlQueries.q_compact_roundtrip), pinned
    // here so the oracle gate certifies content while this certifies the
    // file count actually shrank
    val dir = graft.Scratch.dir("graft_compact_") + "/roundtrip"
    val src = Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    src.repartition(24).write.parquet(dir)
    val before = Compact.layoutStats(dir)
    assert(before.files >= 24)
    Compact.directory(spark, dir, targetBytes = 256L * 1024 * 1024,
      sortBy = Some("o_orderkey"))
    val after = Compact.layoutStats(dir)
    assert(after.files < before.files / 4,
      s"compaction must collapse the layout: ${before.files} -> ${after.files}")
    assert(spark.read.parquet(dir).count() === src.count())
  }

  test("partitioned layout compacts per partition and keeps partition dirs") {
    val root = graft.Scratch.dir("graft_compact_") + "/part"
    val orders = Tables(spark, sfDir, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
    orders.repartition(8).write.partitionBy("o_year").parquet(root)
    val before = Compact.layoutStats(root)
    val (_, after) = Compact.partitioned(spark, root, targetBytes = Long.MaxValue)
    assert(after.files < before.files, s"${before.files} -> ${after.files}")
    val back = spark.read.parquet(root)
    assert(back.count() === orders.count())
    assert(back.select("o_year").distinct().count() ===
      orders.select("o_year").distinct().count(), "partition dirs must survive")
  }
}
