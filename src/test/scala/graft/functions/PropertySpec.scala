package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSuite

/** Property-style batteries: ScalaCheck generators (fixed seed →
  * reproducible) produce a few hundred adversarial inputs per custom
  * expression; ONE Spark job evaluates the expression column and every row
  * is compared against an independent driver-side reference
  * implementation. Catches codegen/eval divergence and boundary bugs that
  * example-based tests miss. */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  test("nfc_normalize equals java.text.Normalizer for adversarial unicode") {
    // mix ascii, combining marks, precomposed chars, surrogate-pair emoji
    val unit = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(3)),
      Gen.oneOf("é", "Å", "ȫ", "é", "Å",
        "😀", "का", "á̂̃", " ", ""))
    val strGen = Gen.listOfN(6, unit).map(_.mkString)
    val inputs = sample(strGen, 300, 7L).distinct
    val got = inputs.toDF("s").selectExpr("s", "nfc_normalize(s) AS n")
      .as[(String, String)].collect()
    assert(got.length === inputs.length)
    got.foreach { case (s, n) =>
      assert(n === Normalizer.normalize(s, Normalizer.Form.NFC), s"input: ${s.codePoints().toArray.mkString(",")}")
    }
  }

  test("sorted_array_intersect_count equals Set intersection size") {
    val arrGen = Gen.listOf(Gen.chooseNum(0L, 40L)).map(_.distinct.sorted)
    val pairGen = Gen.zip(arrGen, arrGen)
    val inputs = sample(pairGen, 300, 11L)
    val got = inputs.toDF("a", "b")
      .selectExpr("a", "b", "sorted_array_intersect_count(a, b) AS c")
      .as[(Seq[Long], Seq[Long], Int)].collect()
    got.foreach { case (a, b, c) =>
      assert(c === a.toSet.intersect(b.toSet).size, s"a=$a b=$b")
    }
  }

  test("fixed_point_dot equals driver-side floor-sum for random float vectors") {
    val f = Gen.chooseNum(-4.0f, 4.0f)
    val vecGen = Gen.listOfN(8, f)
    val inputs = sample(Gen.zip(vecGen, vecGen), 300, 13L)
    val got = inputs.toDF("a", "b")
      .selectExpr("a", "b", "fixed_point_dot(a, b) AS d")
      .as[(Seq[Float], Seq[Float], Double)].collect()
    got.foreach { case (a, b, d) =>
      val ref = a.zip(b).map { case (x, y) =>
        math.floor(x.toDouble * y.toDouble * 1.0e12).toLong }.sum / 1.0e12
      assert(d === ref, s"a=$a b=$b")
    }
  }

  test("bloom filter: zero false negatives over random key sets") {
    val keysGen = Gen.nonEmptyListOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))
    sample(keysGen, 20, 17L).foreach { keys =>
      val bytes = keys.toDF("k")
        .agg(BloomFilterJoin.build(col("k"), math.max(keys.size, 8).toLong, 0.03))
        .head().getAs[Array[Byte]](0)
      val hits = keys.toDF("k")
        .filter(BloomFilterJoin.mightContain(lit(bytes), col("k"))).count()
      assert(hits === keys.size.toLong,
        s"every inserted key must probe true (keys=${keys.take(5)}...)")
    }
  }

  test("native top-k per group equals window form on random skewed data") {
    val rowGen = Gen.zip(Gen.chooseNum(0, 5), Gen.chooseNum(-1000, 1000))
    Seq(23L, 29L, 31L).foreach { seed =>
      val rows = sample(rowGen, 400, seed).zipWithIndex
        .map { case ((g, v), i) => (g, v, i.toLong) }
      val df = rows.toDF("g", "v", "id").repartition(7)
      val native = graft.plans.TopK
        .perGroup(df, Seq("g"), Seq("v" -> true, "id" -> false), 5)
        .select("g", "v", "id").as[(Int, Int, Long)].collect().toSet
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("g").orderBy(desc("v"), col("id"))
      val window = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
        .select("g", "v", "id").as[(Int, Int, Long)].collect().toSet
      assert(native === window, s"seed=$seed")
    }
  }
}
