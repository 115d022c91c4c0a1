package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Slowly-changing-dimension Type 2: apply a change batch to a dimension
  * snapshot while KEEPING history — changed keys get their current row
  * closed (`is_current=false`, `valid_to=<new version>`) plus a new current
  * row; unchanged keys pass through. The reference rebuilds its dimension
  * outputs wholesale each run (pasta1_etl/src/main.py:191-239 — gold is
  * recomputed, history lost); SCD2 is the warehouse-standard alternative a
  * 100 TB deployment needs when the dimension is too big to rebuild.
  *
  * Scale design: like [[Upsert.keyed]], this is union + ONE window over the
  * key — a single hash shuffle, no join. Per-key group size is
  * 1 + changes-per-key (bounded), so no hot partitions. A join formulation
  * would pay the same shuffle and then a second pass to null-extend; the
  * DuckDB oracle deliberately states the join/CASE formulation so the two
  * algorithms must agree cell-exactly.
  */
object Scd {

  /** Version the `base` snapshot (all rows version 1, current) against one
    * `changes` batch (at most one row per key) landing as `newVersion`. */
  def type2(base: DataFrame, changes: DataFrame, keys: Seq[String],
            newVersion: Int): DataFrame = {
    val tagged = base.withColumn("__src", lit(0))
      .unionByName(changes.withColumn("__src", lit(1)))
    val w = Window.partitionBy(keys.map(col): _*)
    tagged
      .withColumn("__chg", max(col("__src")).over(w))
      .withColumn("version",
        when(col("__src") === 0, lit(1)).otherwise(lit(newVersion)))
      .withColumn("is_current",
        col("__src") === 1 || col("__chg") === 0)
      .withColumn("valid_to",
        when(col("__src") === 0 && col("__chg") === 1, lit(newVersion))
          .otherwise(lit(null)).cast(IntegerType))
      .drop("__src", "__chg")
  }
}
