package graft
import org.apache.spark.sql.SparkSession

/** Benchmark harness: times every declared query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Hygiene (round-1 verdict):
  *  - a warmup pass primes JVM/JIT, codegen compiler and the parquet footer
  *    cache before any timing, so the first-timed query doesn't absorb
  *    session warmup cost and totals are comparable across rounds;
  *  - failures are NOT swallowed into the total: a failed query reports -1
  *    and is listed in "failed", and the total covers successes only;
  *  - "sf" is emitted as the numeric scale factor parsed from the dir name.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus, appName = "graft-bench")

    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
    // Each query runs twice and the SECOND run is timed: the first run
    // absorbs codegen compilation and JIT warmup, which on this VM dominate
    // sub-second queries by 10-40× and made round-1 totals iteration-order
    // noise. The timed run still executes the full plan (scan → shuffle →
    // count action).
    // A failure in EITHER run marks the query failed: the round-2 bench
    // swallowed a timed-run throw and reported a bogus "success" timing.
    val results = qs.map { case (name, fn) =>
      val warmOk =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED (warmup): ${e.getMessage}"); false
        }
      val t0 = System.nanoTime()
      val ok = warmOk &&
        (try { fn(spark, sfDir).count(); true }
         catch { case e: Throwable =>
           System.err.println(s"[bench] $name FAILED (timed run): ${e.getMessage}"); false
         })
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val perQuery = results.map { case (k, v, ok) =>
      "\"" + k + "\":" + (if (ok) f"$v%.3f" else "-1")
    }.mkString("{", ",", "}")
    val failed = results.filterNot(_._3).map("\"" + _._1 + "\"").mkString("[", ",", "]")
    val total = results.filter(_._3).map(_._2).sum
    val sf = sfDir.split("/").filter(_.nonEmpty).lastOption
      .map(_.stripPrefix("sf")).flatMap(s => scala.util.Try(s.toDouble).toOption)
      .getOrElse(0.0)
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$perQuery,"failed":$failed,"sf":$sf}""")
    spark.stop()
  }
}
