package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** The full (c)-tier whole-operator extension from the build rules: a custom
  * `LogicalPlan` node + `SparkStrategy` + physical `SparkPlan`, registered
  * through `SparkSessionExtensions.injectPlannerStrategy` (GraftExtensions).
  *
  * Semantics: keep the first `k` rows of each group under `sortOrder` —
  * exactly `row_number() OVER (PARTITION BY g ORDER BY s) <= k` (the shape
  * of the reference's windowed analytics generalized to ranked pruning;
  * basis: pasta2_analytics/src/main.py:41-48).
  *
  * Why a native operator instead of the window form: `WindowExec` shuffles
  * EVERY row to its group's partition and fully sorts it before rank
  * pruning — at 100 TB the shuffle is the whole table and a hot group is a
  * straggler sort. This operator runs in two phases, mirroring partial/final
  * aggregation:
  *
  *   1. partial (map-side): per input partition, one bounded heap of size k
  *      per group seen — O(groups·k) memory, no sort, no shuffle;
  *   2. exchange: only the ≤ partitions·groups·k survivors shuffle on the
  *      group key (vs. all rows for WindowExec);
  *   3. final: same bounded-heap merge on the co-located candidates.
  *
  * The declared query `q_topk_group_native` is oracle-checked against the
  * same DuckDB SQL as the window form, proving the rewrite is
  * value-identical; PlanSpec asserts both phases appear in the physical
  * plan.
  */
case class TopKPerGroup(
    groupExprs: Seq[Attribute],
    sortOrder: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Plans the logical node as partial-over-final bounded-heap execs; the
  * required ClusteredDistribution on the final phase makes EnsureRequirements
  * insert the (candidate-only) hash exchange between them. */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(groupExprs, sortOrder, k, child) =>
      val partial = TopKPerGroupExec(groupExprs, sortOrder, k, partial = true, planLater(child))
      TopKPerGroupExec(groupExprs, sortOrder, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    groupExprs: Seq[Attribute],
    sortOrder: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override def simpleString(maxFields: Int): String = {
    val phase = if (partial) "partial" else "final"
    s"TopKPerGroup($phase, k=$k, groups=${groupExprs.mkString(",")})"
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupExprsL = groupExprs
    val sortOrderL = sortOrder
    val kL = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupExprsL, childOutput)
      val ord = GenerateOrdering.generate(sortOrderL, childOutput)
      // Per group: a max-heap (head = worst kept row under the target
      // order) bounded at k — replace the head when a better row arrives.
      val worstFirst = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = ord.compare(b, a)
      }
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        var heap = heaps.get(keyProj(row))
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kL, worstFirst)
          heaps.put(keyProj(row).copy(), heap)
        }
        if (heap.size < kL) heap.add(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) { heap.poll(); heap.add(row.copy()) }
      }
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Public API: `TopK.perGroup(df, groups, Seq(col -> desc?), k)`. Attributes
  * are resolved by name against the analyzed child so the constructed node
  * enters analysis already resolved. */
object TopK {
  def perGroup(df: DataFrame, groupCols: Seq[String],
               orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    val child = df.queryExecution.analyzed
    def attr(name: String): Attribute = child.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"TopK.perGroup: no column '$name' in ${child.output.map(_.name).mkString(", ")}"))
    val sortOrder = orderBy.map { case (name, desc) =>
      SortOrder(attr(name), if (desc) Descending else Ascending)
    }
    GraftExpressionBridge.ofRows(df.sparkSession,
      TopKPerGroup(groupCols.map(attr), sortOrder, k, child))
  }
}
