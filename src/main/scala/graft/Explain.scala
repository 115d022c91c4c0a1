package graft

/** Plan + timing diagnostic for one declared query:
  * `runMain graft.Explain <queryName> [sfDir] [reps]` prints the formatted
  * physical plan, then executes the query `reps` times and prints each
  * wall-clock. Repeated timings matter on this VM: single-run wall-clock
  * swings 10-40×, so a perf conclusion needs at least two in-JVM runs.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = Sessions.local(cpus, appName = "graft-explain")
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).explain("formatted")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      println(f"[explain] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
