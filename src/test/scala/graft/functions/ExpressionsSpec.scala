package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Edge-case tests for the custom Catalyst expressions (empty arrays,
  * length mismatches, nulls, interpreted-vs-codegen agreement). */
class ExpressionsSpec extends SparkSuite {
  import spark.implicits._

  test("random_project_signs ≡ the interpreted HOF formulation, null-safe, SQL-callable") {
    import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}
    val NP = 16
    val emb = graft.Tables(spark, sfDir, "embeddings").select("vec_id", "embedding")
    // interpreted higher-order twin of the codegen expression
    def hofProj(j: Int) = aggregate(
      sequence(lit(1), lit(64)), lit(0L),
      (acc, i) => acc +
        when(shiftright(i.cast(LongType) * 2654435761L + lit(j.toLong) * 40503L, 5)
          .bitwiseAND(lit(1L)) === 0, 1L).otherwise(-1L) *
        floor(element_at(col("embedding"), i.cast(IntegerType))
          .cast(DoubleType) * 1e9).cast(LongType))
    val both = emb.select(col("vec_id"),
      RandomProjectSigns.project(col("embedding"), NP).as("fast"),
      array((0 until NP).map(hofProj): _*).as("slow"))
    assert(both.filter(col("fast") =!= col("slow")).count() == 0,
      "codegen projection diverges from the HOF formulation")
    // null array → null result; SQL registration works
    val r = spark.sql("SELECT random_project_signs(CAST(NULL AS ARRAY<FLOAT>), 4) AS p")
      .head()
    assert(r.isNullAt(0))
    assert(spark.sql(
      "SELECT size(random_project_signs(array(CAST(1.0 AS FLOAT)), 4)) AS n")
      .head().getInt(0) == 4)
  }

  test("fixed_point_dot: empty arrays, length mismatch, null propagation") {
    val df = Seq(
      (1, Seq(1.5f, 2.0f), Seq(2.0f, 3.0f)),   // 3.0 + 6.0
      (2, Seq.empty[Float], Seq.empty[Float]), // 0
      (3, Seq(1.0f, 1.0f, 1.0f), Seq(2.0f))    // min length → 2
    ).toDF("id", "a", "b")
    val got = df.select($"id", FixedPointDotProduct.dot($"a", $"b").as("d"))
      .orderBy("id").as[(Int, Double)].collect()
    assert(got === Array((1, 9.0), (2, 0.0), (3, 2.0)))
    val withNull = df.withColumn("n", lit(null).cast("array<float>"))
      .select(FixedPointDotProduct.dot($"a", $"n")).head()
    assert(withNull.isNullAt(0))
  }

  test("sorted_array_intersect_count: disjoint, identical, empty") {
    val df = Seq(
      (1, Seq(1L, 5L, 9L), Seq(5L, 9L, 12L)), // 2
      (2, Seq(1L, 2L), Seq(3L, 4L)),          // 0
      (3, Seq(7L, 8L), Seq(7L, 8L)),          // 2
      (4, Seq.empty[Long], Seq(1L))           // 0
    ).toDF("id", "a", "b")
    val got = df.select($"id", SortedArrayIntersectCount.count($"a", $"b").as("c"))
      .orderBy("id").as[(Int, Int)].collect()
    assert(got === Array((1, 2), (2, 0), (3, 2), (4, 0)))
  }

  test("shingle hashes: k=1 hashes each token; k=2 equals hashing the joined string") {
    val df = Seq((1, Seq("ab", "cd", "ef"))).toDF("id", "t")
    val k1 = df.select(ShingleHashes.shingles($"t", 1)).head().getSeq[Long](0)
    assert(k1.length === 3)
    val k2 = df.select(ShingleHashes.shingles($"t", 2)).head().getSeq[Long](0)
    // "ab cd" via the portable polynomial char hash (ASCII bytes)
    val expect = "ab cd".getBytes("UTF-8").foldLeft(0L)((h, c) => (h * 31 + (c & 0xff)) % 2147483647L)
    assert(k2.head === expect)
    // shorter than k → empty, not an error
    val short = Seq((1, Seq("x"))).toDF("id", "t")
      .select(ShingleHashes.shingles($"t", 2)).head().getSeq[Long](0)
    assert(short.isEmpty)
  }

  test("minhash signature of an empty hash array is all Long.MaxValue (documented sentinel)") {
    val sig = Seq((1, Seq.empty[Long])).toDF("id", "hv")
      .select(ShingleHashes.minhashSignature($"hv", 4)).head().getSeq[Long](0)
    assert(sig === Seq.fill(4)(Long.MaxValue))
  }

  test("nfc_normalize composes combining sequences, is idempotent, propagates null") {
    val decomposed = "Cafe\u0301 nai\u0308ve A\u030A"   // 3 combining marks
    val composed = "Caf\u00e9 na\u00efve \u00c5"
    val df = Seq((1, decomposed), (2, composed), (3, "plain ascii"), (4, null.asInstanceOf[String]))
      .toDF("id", "s")
    val got = df.selectExpr("id", "nfc_normalize(s) AS n", "nfc_normalize(nfc_normalize(s)) AS nn")
      .orderBy("id").collect()
    assert(got(0).getString(1) === composed)
    assert(got(1).getString(1) === composed)            // already-NFC unchanged
    assert(got(2).getString(1) === "plain ascii")
    assert(got(3).isNullAt(1), "null in -> null out")
    got.filterNot(_.isNullAt(1)).foreach(r => assert(r.getString(1) === r.getString(2), "idempotent"))
  }

  test("vector_sum_fixed merges across partitions to the exact elementwise sum") {
    val df = (1 to 100).map(i => (i % 3, Array(0.25f, -0.5f, 1.0f)))
      .toDF("g", "v").repartition(8)
    val got = df.groupBy("g").agg(VectorSumFixed.sum($"v", 3).as("s"))
      .orderBy("g").collect()
    got.foreach { r =>
      val n = (1 to 100).count(_ % 3 == r.getInt(0))
      val s = r.getSeq[Double](1)
      assert(s(0) === 0.25 * n && s(1) === -0.5 * n && s(2) === 1.0 * n)
    }
  }
}
