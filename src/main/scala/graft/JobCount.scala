package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageSubmitted}
import org.apache.spark.sql.SparkSession

/** Deterministic perf twin of wall-clock benching on a jittery VM:
  * per-query Spark job + stage counts of the WARM (second) execution.
  * Counts are scoped to a per-measurement job group so concurrent session
  * activity can't leak in, and they are a property of the PLAN + data —
  * stable run-to-run where wall-clock swings 10-40×. `JobCountSpec` pins
  * the counts of the most expensive queries; `JOBCOUNT_OUT=<file>` writes
  * the full artifact the round commits (JOBCOUNT_r{N}.json).
  *
  * Args: comma-separated query names, or `--headline` for the bench's
  * headline subset. Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
  * JOBCOUNT_OUT, JOBCOUNT_AQE, JOBCOUNT_VERBOSE, JOBCOUNT_PLAN. */
object JobCount {

  /** Jobs + stages submitted by `body`, counted via a unique job group —
    * group ids are thread-local and propagate through SQLExecution's
    * captured local properties into broadcast-exchange threads, so the
    * count covers exactly the measured action.
    *
    * The body runs with AQE DISABLED (saved/restored around the
    * measurement): under AQE, job count is genuinely TIMING-DEPENDENT —
    * stage-materialization futures race with replanning, so identical
    * runs of the same build flipped 47/48 (and 49/50 with exchange
    * reuse off; probed 20× on identical data). With AQE off, jobs =
    * driver-issued actions + plan-determined broadcast/subquery
    * executions — a pure plan property, measured 10/10 identical. The
    * counts are a COMPLEXITY FINGERPRINT, not the production execution
    * mode (the engine runs AQE everywhere else); determinism is the
    * entire point of this gate. */
  def measure(spark: SparkSession)(body: => Unit): (Int, Int) = {
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try measureAsConfigured(spark)(body)
    finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  /** [[measure]] without the AQE override — counts under the session's
    * own configuration (load-sensitive under AQE; see [[measure]]). */
  def measureAsConfigured(spark: SparkSession)(body: => Unit): (Int, Int) = {
    val group = s"graft-jobcount-${java.util.UUID.randomUUID()}"
    val sentinel = group + "-sentinel"
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val stages = new java.util.concurrent.atomic.AtomicInteger()
    val seen = new java.util.concurrent.CountDownLatch(1)
    val l = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        j.properties.getProperty("spark.jobGroup.id") match {
          case `group` =>
            jobs.incrementAndGet()
            stages.addAndGet(j.stageInfos.size)
            ()
          case `sentinel` => seen.countDown()
          case _ => ()
        }
      }
    }
    spark.sparkContext.addSparkListener(l)
    spark.sparkContext.setJobGroup(group, "graft job-count measurement",
      interruptOnCancel = false)
    try body
    finally {
      spark.sparkContext.clearJobGroup()
      // The listener bus is ASYNC, so the measured jobs' start events may
      // still be in flight here. A fixed quiet-window poll is load-
      // sensitive (under a full-suite run the bus can lag in bursts
      // longer than any chosen window — the 47≠48 flake): instead run a
      // SENTINEL job in its own group after the body completes. Events
      // deliver to a listener in posting order, and every measured
      // action returned before the sentinel was submitted, so seeing the
      // sentinel's start proves every measured start was delivered.
      spark.sparkContext.setJobGroup(sentinel, "listener drain sentinel",
        interruptOnCancel = false)
      try spark.sparkContext.parallelize(Seq(1), 1).count()
      finally spark.sparkContext.clearJobGroup()
      seen.await(60, java.util.concurrent.TimeUnit.SECONDS)
      spark.sparkContext.removeSparkListener(l)
    }
    (jobs.get(), stages.get())
  }

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: graft.JobCount <query[,query...]|--headline> " +
        "(env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, JOBCOUNT_OUT, " +
        "JOBCOUNT_AQE, JOBCOUNT_VERBOSE, JOBCOUNT_PLAN)")
      sys.exit(2)
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // same parallelism derivation as Bench: fanOut-dependent queries must
    // see the bench's partitioning, not a hardcoded 32 (r16 advice)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus, appName = "graft-jobcount")
    Sessions.quietBoundedGlobalWindowWarnings()
    sys.env.get("JOBCOUNT_AQE").foreach(v =>
      spark.conf.set("spark.sql.adaptive.enabled", v))
    val descs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    if (sys.env.contains("JOBCOUNT_VERBOSE")) {
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onJobStart(j: SparkListenerJobStart): Unit = {
          val names = j.stageInfos.map(_.name.take(60)).mkString(" | ")
          starts.put(j.jobId, (j.time, names))
        }
        override def onJobEnd(j: SparkListenerJobEnd): Unit = {
          Option(starts.remove(j.jobId)).foreach { case (t0, names) =>
            descs.add(f"job ${j.jobId} ${(j.time - t0) / 1000.0}%.3fs: $names")
          }
        }
      })
    }
    val names =
      if (args.head == "--headline") Bench.headline
      else args.head.split(",").toSeq
    val out = scala.collection.mutable.LinkedHashMap.empty[String, (Int, Int, Double)]
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      fn(spark, sfDir).count() // warm: JIT, codegen, fixture staging, caches
      Thread.sleep(200)
      descs.clear()
      val t0 = System.nanoTime()
      val (jobs, stages) = measure(spark) { fn(spark, sfDir).count() }
      val dt = (System.nanoTime() - t0) / 1e9
      out(n) = (jobs, stages, dt)
      println(f"[jobcount] $n jobs=$jobs stages=$stages t=$dt%.3f")
      if (sys.env.contains("JOBCOUNT_VERBOSE"))
        descs.forEach(x => println(s"[jobdesc] $x"))
      if (sys.env.contains("JOBCOUNT_PLAN"))
        println(fn(spark, sfDir).queryExecution.executedPlan.toString.take(4000))
    }
    sys.env.get("JOBCOUNT_OUT").foreach { path =>
      val sf = sfDir.split("/").filter(_.nonEmpty).lastOption
        .map(_.stripPrefix("sf"))
        .flatMap(s => scala.util.Try(s.toDouble).toOption).getOrElse(0.0)
      val qs = out.map { case (k, (j, s, t)) =>
        f""""$k":{"jobs":$j,"stages":$s,"t":$t%.3f}"""
      }.mkString("{", ",", "}")
      // "aqe" records the MEASUREMENT mode — measure() always counts
      // with AQE off (the deterministic fingerprint); the session's own
      // AQE setting only governs the warm runs
      val json = s"""{"metric":"jobcount","sf":$sf,"cpus":"$cpus",""" +
        s""""aqe":"off-during-measure",""" +
        s""""nq":${out.size},"queries":$qs}"""
      java.nio.file.Files.write(java.nio.file.Paths.get(path),
        json.getBytes("UTF-8"))
      println(s"[jobcount] wrote $path")
    }
    spark.stop()
  }
}
