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
}
