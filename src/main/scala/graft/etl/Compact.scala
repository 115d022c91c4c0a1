package graft.etl

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Small-file compaction — the maintenance pass every incremental sink
  * eventually needs: the reference's bronze layer appends one batch per
  * monthly file per run (pasta1_etl/src/main.py:191-194), so a year of
  * runs leaves thousands of KB-scale parquet files whose per-file open +
  * footer + task-schedule overhead dominates scan time long before 100 TB.
  *
  * Strategy: size the output by DATA VOLUME, not file count — measure the
  * layout, target `ceil(totalBytes / targetBytes)` output files, rewrite
  * with `repartition(n)` (round-robin; an optional sort column instead
  * re-clusters for min-max pruning at the cost of a range shuffle), then
  * atomically swap directories. Partitioned layouts compact per partition
  * directory, preserving the partition columns in the path (each partition
  * sizes independently — a hot partition gets more files, an empty one
  * none).
  */
object Compact {

  case class Stats(files: Int, bytes: Long)

  /** Parquet data files under `dir`, recursively (skips _SUCCESS etc.). */
  def layoutStats(dir: String): Stats = {
    val files = listParquet(Paths.get(dir))
    Stats(files.size, files.map(Files.size).sum)
  }

  private def listParquet(root: Path): Seq[Path] =
    Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
      .toSeq

  /** Compact one flat parquet directory to ~targetBytes files. Returns the
    * (before, after) stats. `sortBy` re-clusters rows (range partition +
    * sort within files) so row-group min-max stats prune on that column. */
  def directory(spark: SparkSession, dir: String, targetBytes: Long,
                sortBy: Option[String] = None): (Stats, Stats) = {
    val before = layoutStats(dir)
    val n = math.max(1, math.ceil(before.bytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(dir)
    val tmp = dir.stripSuffix("/") + "__compacting"
    val writer = sortBy match {
      case Some(c) => df.repartitionByRange(n, col(c)).sortWithinPartitions(c)
      case None => df.repartition(n)
    }
    writer.write.mode("overwrite").parquet(tmp)
    swap(Paths.get(dir), Paths.get(tmp))
    (before, layoutStats(dir))
  }

  /** Compact a `partitionBy` layout per partition directory (leaf dirs that
    * directly hold parquet files), preserving the partition paths. */
  def partitioned(spark: SparkSession, root: String, targetBytes: Long): (Stats, Stats) = {
    val before = layoutStats(root)
    leafDirs(Paths.get(root)).foreach { leaf =>
      directory(spark, leaf.toString, targetBytes)
    }
    (before, layoutStats(root))
  }

  private def leafDirs(root: Path): Seq[Path] =
    Files.walk(root).iterator().asScala
      .filter(Files.isDirectory(_))
      .filter(d => Files.list(d).iterator().asScala
        .exists(f => f.toString.endsWith(".parquet") && Files.isRegularFile(f)))
      .toSeq

  /** Atomic-ish directory swap: old layout is removed only after the new
    * one is fully written (crash between the two deletes leaves the
    * `__compacting` dir to reconcile, never a half-deleted layout). */
  private def swap(dir: Path, tmp: Path): Unit = {
    val trash = Paths.get(dir.toString + "__old")
    deleteRecursively(trash)
    Files.move(dir, trash)
    Files.move(tmp, dir)
    deleteRecursively(trash)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
}
