package graft

import org.apache.spark.sql.SparkSession

/** Session bootstrap (SURVEY.md §2 A27 — twin of the reference's builders at
  * pasta1_etl/src/main.py:274-298 and pasta2_analytics/src/main.py:57-80).
  *
  * One place owns the session configuration the engine depends on:
  *  - UTC session timezone (README.md:10 — timestamps are GMT);
  *  - `nanosAsLong` so TIMESTAMP(NANOS) parquet (events.ts) is readable;
  *  - shuffle partitions sized to the parallelism (the harness pins them to
  *    the CPU count — 200 defaults on local data are pure task overhead; on
  *    a real cluster size this to cores × executors or rely on AQE
  *    coalescing).
  *
  * The reference's S3A credential/endpoint settings (main.py:281-288) are a
  * deployment concern, accepted as the `extraConfs` map rather than being
  * hardcoded — local runs read the local FS.
  */
object Sessions {

  /** Local session with the engine's required configs; `cpus` also sizes
    * `spark.sql.shuffle.partitions`. */
  def local(cpus: String, appName: String = "graft",
      extraConfs: Map[String, String] = Map.empty): SparkSession = {
    val b = SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // unadjusted (no-UTC-flag) parquet timestamps read as TimestampType
      // under the UTC session zone, not TIMESTAMP_NTZ — the testdata's
      // micros timestamps carry no zone flag, and the engine (like the
      // reference) works in zoned TimestampType end-to-end
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // graft's custom expressions as SQL functions (fixed_point_dot, …)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      // storage-partitioned joins: group DSv2 partitions by reported
      // partition key (bucket-pure manifest files) so co-bucketed joins
      // plan with no exchange — inert for every other source
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      // catalog tables (bucketed layouts) land in /tmp, not the repo cwd
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.ui.enabled", "false")
    extraConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Silence WindowExec's "No Partition Defined" warning for the driver's
    * Verify/Bench runs. The engine's only global windows are DELIBERATE
    * tiny-table prefix sums over per-day reductions (q_interval_overlap's
    * day offsets, q_skyline's frontier — both calendar-bounded), but each
    * emits one WARN per execution and the flood drowns real signal in the
    * driver's 2000-char output capture. ScalaTest suites do NOT call this
    * — an accidental global window still surfaces its canary there. */
  def quietBoundedGlobalWindowWarnings(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
}
