package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSuite

/** Z-order: bit-level correctness of the Morton interleave, and the layout
  * property it exists for — per-file min-max ranges narrow on BOTH
  * dimensions, where a single-column sort leaves the second dimension
  * full-width per file. */
class ZOrderSpec extends SparkSuite {
  import spark.implicits._

  test("interleave: monotone per dimension, distinct on a grid, SQL = driver impl") {
    // driver-side properties
    for (a <- Seq(Int.MinValue, -5, 0, 7, Int.MaxValue); b <- Seq(Int.MinValue, -1, 0, 9, Int.MaxValue)) {
      if (a < Int.MaxValue) assert(ZOrder.interleave(a, b) < ZOrder.interleave(a + 1, b))
      if (b < Int.MaxValue) assert(ZOrder.interleave(a, b) < ZOrder.interleave(a, b + 1))
    }
    // SQL function parity on generated pairs (codegen path)
    val g = Gen.chooseNum(Int.MinValue, Int.MaxValue)
    val pairs = (0 until 300).flatMap(i => Gen.zip(g, g).apply(Gen.Parameters.default, Seed(41L + i)))
    val rows = pairs.toDF("a", "b").selectExpr("a", "b", "zorder64(a, b) AS z")
      .as[(Int, Int, Long)].collect()
    rows.foreach { case (a, b, z) => assert(z === ZOrder.interleave(a, b)) }
    assert(rows.map(_._3).distinct.length === rows.map(r => (r._1, r._2)).distinct.length)
  }

  test("interleave3: monotone per dimension at 21-bit granularity, SQL = driver impl") {
    // monotone per dimension for steps that survive the top-21-bit cut
    val step = 1 << 11 // one unit of the kept granularity
    for (a <- Seq(Int.MinValue, -(1 << 20), 0, 1 << 20);
         b <- Seq(Int.MinValue, -3 * step, 0, 5 * step);
         c <- Seq(Int.MinValue, -step, 0, 7 * step)) {
      assert(ZOrder.interleave3(a, b, c) < ZOrder.interleave3(a + step, b, c))
      assert(ZOrder.interleave3(a, b, c) < ZOrder.interleave3(a, b + step, c))
      assert(ZOrder.interleave3(a, b, c) < ZOrder.interleave3(a, b, c + step))
    }
    // truncation is order-preserving, never order-breaking
    assert(ZOrder.interleave3(0, 0, 0) <= ZOrder.interleave3(1, 0, 0))
    // SQL function parity (codegen path)
    val g = Gen.chooseNum(Int.MinValue, Int.MaxValue)
    val triples = (0 until 200).flatMap(i =>
      Gen.zip(g, g, g).apply(Gen.Parameters.default, Seed(97L + i)))
    triples.toDF("a", "b", "c")
      .selectExpr("a", "b", "c", "zorder3(a, b, c) AS z")
      .as[(Int, Int, Int, Long)].collect()
      .foreach { case (a, b, c, z) => assert(z === ZOrder.interleave3(a, b, c)) }
  }

  test("z-ordered layout narrows per-file ranges on BOTH dimensions; single-sort only on one") {
    val grid = spark.range(256L * 256L).select(
      (col("id") / 256).cast("int").as("d1"),
      (col("id") % 256).cast("int").as("d2"))

    def spans(dir: String): (Double, Double) = {
      val byFile = spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg((max("d1") - min("d1")).as("s1"), (max("d2") - min("d2")).as("s2"))
        .agg(avg("s1"), avg("s2")).head()
      (byFile.getDouble(0), byFile.getDouble(1))
    }

    val base = graft.Scratch.dir("graft_zorder_")
    grid.withColumn("z", expr("zorder64(d1, d2)"))
      .repartitionByRange(16, col("z")).sortWithinPartitions("z")
      .drop("z").write.parquet(s"$base/zorder")
    grid.repartitionByRange(16, col("d1")).sortWithinPartitions("d1")
      .write.parquet(s"$base/d1sort")

    val (z1, z2) = spans(s"$base/zorder")
    val (s1, s2) = spans(s"$base/d1sort")
    assert(z1 <= 128 && z2 <= 128, s"z-order must bound both dims, got ($z1, $z2)")
    assert(s1 <= 32, s"d1 sort must bound d1 tightly, got $s1")
    assert(s2 >= 200, s"d1 sort leaves d2 full-width per file, got $s2")
  }
}
