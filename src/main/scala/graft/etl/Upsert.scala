package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MERGE INTO (upsert) semantics on immutable parquet — the operation the
  * reference's Delta lineage implies (bronze append + gold rebuild,
  * pasta1_etl/src/main.py:191-239) but never implements: matched keys take
  * the update row, unmatched update rows are inserts, unmatched base rows
  * survive.
  *
  * Scale design: union + keep-winner-per-key, not a full-outer join — one
  * hash shuffle on the key (same cost as the join would pay), no per-column
  * null-coalescing projection, and N update batches compose by unioning N
  * inputs into the same single shuffle. The per-key winner is picked by a
  * bounded `row_number` over (priority DESC): group sizes are
  * 1 + duplicates-per-key, so no hot-partition risk regardless of corpus
  * size. The DuckDB oracle intentionally uses the FULL OUTER JOIN
  * formulation — two different algorithms must agree cell-exactly.
  */
object Upsert {

  /** Apply `updates` over `base` by `keys`. Both frames must share the
    * schema; `updates` must carry at most one row per key (the reference
    * batch contract — matched `row_number` output is otherwise
    * tie-dependent). */
  def keyed(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val tagged = base.withColumn("__priority", lit(0))
      .unionByName(updates.withColumn("__priority", lit(1)))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(desc("__priority"))
    tagged
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__priority", "__rn")
  }

  /** Apply a CDC changelog (rows carrying `opCol` ∈ {I, U, D}) over `base`:
    * U/I rows upsert their key, D rows delete it. Same union +
    * keep-winner-per-key shape as [[keyed]] — ONE hash shuffle — with the
    * delete applied by filtering winners whose op is D. This is the
    * change-data-feed apply step a lakehouse table runs per sync; a join
    * formulation would pay the same shuffle and a second pass for deletes.
    * `changes` must carry at most one row per key (last-wins batches
    * compact upstream). */
  def applyChanges(base: DataFrame, changes: DataFrame, keys: Seq[String],
                   opCol: String): DataFrame = {
    val tagged = base.withColumn("__op", lit("B"))
      .unionByName(changes.withColumnRenamed(opCol, "__op"))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(when(col("__op") === "B", 0).otherwise(1).desc)
    tagged
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("__op") =!= "D")
      .drop("__op", "__rn")
  }
}
