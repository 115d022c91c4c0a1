package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

/** The native bounded-heap top-k-per-group operator must be value-identical
  * to the ranked-window form, across phases (partial heaps → candidate
  * shuffle → final merge) and edge cases. */
class TopKPerGroupSpec extends SparkSuite {

  private def orders = Tables(spark, sfDir, "orders")
    .select("o_orderpriority", "o_orderkey", "o_totalprice")

  private def windowForm(k: Int) = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
    orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
  }

  test("native top-k per group equals the ranked-window form") {
    for (k <- Seq(1, 3, 17)) {
      val native = TopK.perGroup(orders, Seq("o_orderpriority"),
        Seq("o_totalprice" -> true, "o_orderkey" -> false), k)
        .orderBy("o_orderpriority", "o_orderkey").collect()
      val window = windowForm(k)
        .orderBy("o_orderpriority", "o_orderkey").collect()
      assert(native.toSeq == window.toSeq, s"k=$k mismatch")
    }
  }

  test("k larger than every group returns all rows") {
    val n = orders.count()
    val all = TopK.perGroup(orders, Seq("o_orderpriority"),
      Seq("o_totalprice" -> true, "o_orderkey" -> false), n.toInt + 10)
    assert(all.count() == n)
  }

  test("physical plan runs both phases with the candidate-only exchange between") {
    val p = TopK.perGroup(orders, Seq("o_orderpriority"),
      Seq("o_totalprice" -> true, "o_orderkey" -> false), 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("TopKPerGroup(partial"), p.take(1200))
    assert(p.contains("TopKPerGroup(final"), p.take(1200))
    assert(p.contains("Exchange hashpartitioning(o_orderpriority"), p.take(1200))
  }

  test("unknown column names are rejected with a clear error") {
    val err = intercept[IllegalArgumentException] {
      TopK.perGroup(orders, Seq("nope"), Seq("o_totalprice" -> true), 3)
    }
    assert(err.getMessage.contains("no column 'nope'"))
  }
}
