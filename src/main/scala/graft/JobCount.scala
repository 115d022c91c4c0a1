package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageSubmitted}

/** Diagnostic main: per-query Spark job + stage counts (warm second run),
  * the deterministic twin of wall-clock benching on a jittery VM. */
object JobCount {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: graft.JobCount <query[,query...]> " +
        "(env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, JOBCOUNT_AQE, " +
        "JOBCOUNT_VERBOSE, JOBCOUNT_PLAN)")
      sys.exit(2)
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // same parallelism derivation as Bench: fanOut-dependent queries must
    // see the bench's partitioning, not a hardcoded 32 (r16 advice)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus, appName = "graft-jobcount")
    sys.env.get("JOBCOUNT_AQE").foreach(v =>
      spark.conf.set("spark.sql.adaptive.enabled", v))
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val stages = new java.util.concurrent.atomic.AtomicInteger()
    val descs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val names = j.stageInfos.map(_.name.take(60)).mkString(" | ")
        starts.put(j.jobId, (j.time, names))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(starts.remove(j.jobId)).foreach { case (t0, names) =>
          descs.add(f"job ${j.jobId} ${(j.time - t0) / 1000.0}%.3fs: $names")
        }
      }
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit = stages.incrementAndGet()
    })
    val names = args.head.split(",").toSeq
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      fn(spark, sfDir).count() // warm
      Thread.sleep(300)
      jobs.set(0); stages.set(0); descs.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[jobcount] $n jobs=${jobs.get} stages=${stages.get} t=$dt%.3f")
      if (sys.env.contains("JOBCOUNT_VERBOSE"))
        descs.forEach(x => println(s"[jobdesc] $x"))
      if (sys.env.contains("JOBCOUNT_PLAN"))
        println(fn(spark, sfDir).queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
