package graft.sources

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The manifest-committed DSv2 sink must be exactly-once at the job level:
  * data becomes visible only through the driver-side manifest swap; staged,
  * stray and failed-job files are never readable; append accumulates;
  * truncate-overwrite replaces atomically. */
class ManifestSinkSpec extends SparkSuite {
  import spark.implicits._

  private val Fmt = "graft.sources.GraftManifestSink"

  private def freshDir(): String =
    Files.createTempDirectory("graft_manifest_").toString

  private def sample = Seq(
    (1L, "alpha", 1.5), (2L, "beta", 2.5), (3L, "gamma", 3.5),
    (4L, "delta", 4.5), (5L, "epsilon", 5.5), (6L, "zeta", 6.5))
    .toDF("id", "name", "score").repartition(3)

  test("write → read roundtrip through the committed manifest") {
    val dir = freshDir()
    sample.write.format(Fmt).option("path", dir).mode("append").save()
    val back = spark.read.format(Fmt).option("path", dir).load()
    assert(back.schema.fieldNames.toSeq == Seq("id", "name", "score"))
    assert(back.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet == sample.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet)
    // the manifest lists exactly the data files on disk (3 partitions → ≤3 files)
    val m = Manifest.read(Paths.get(dir)).get
    assert(m.files.nonEmpty && m.files.map(_._2).sum == 6L)
    m.files.foreach { case (f, _) => assert(Files.exists(Paths.get(dir, f)), f) }
  }

  test("append accumulates; overwrite truncates the current view; snapshots time-travel") {
    val dir = freshDir()
    sample.write.format(Fmt).option("path", dir).mode("append").save()
    sample.write.format(Fmt).option("path", dir).mode("append").save()
    assert(spark.read.format(Fmt).option("path", dir).load().count() == 12L)
    val oldFiles = Manifest.read(Paths.get(dir)).get.files.map(_._1)

    Seq((9L, "only", 9.9)).toDF("id", "name", "score")
      .write.format(Fmt).option("path", dir).mode("overwrite").save()
    val after = spark.read.format(Fmt).option("path", dir).load().collect()
    assert(after.length == 1 && after.head.getLong(0) == 9L)
    // overwritten files remain on disk — archived snapshots still reference
    // them, so every past version stays readable
    oldFiles.foreach(f => assert(Files.exists(Paths.get(dir, f)), s"$f reaped early"))
    def snap(v: Int) = spark.read.format(Fmt)
      .option("path", dir).option("snapshot", v.toString).load().count()
    assert(snap(1) == 6L && snap(2) == 12L && snap(3) == 1L)

    // snapshot expiry: RETAIN 1 keeps only the current version → the
    // overwritten files become unreachable and vacuum reaps them (age 0:
    // the files were written moments ago)
    val reaped = spark.sql(
      s"VACUUM MANIFEST '$dir' RETAIN 1 SNAPSHOTS OLDER THAN 0 MINUTES").collect()
    assert(reaped.count(_.getString(1) == "snapshot-expired") == 2)
    oldFiles.foreach(f => assert(!Files.exists(Paths.get(dir, f)), s"$f not reaped"))
    assert(spark.read.format(Fmt).option("path", dir).load().count() == 1L)
    intercept[Exception] { snap(1) } // expired snapshot no longer readable
  }

  test("staged and stray files are invisible to readers") {
    val dir = freshDir()
    sample.write.format(Fmt).option("path", dir).mode("append").save()
    // a crashed attempt's staged leftover + a stray unmanifested data file
    Files.write(Paths.get(dir, "_staging", "part-9-999-deadbeef.tsv"),
      "77\tghost\t7.7\n".getBytes)
    Files.write(Paths.get(dir, "part-stray.tsv"), "88\tstray\t8.8\n".getBytes)
    val back = spark.read.format(Fmt).option("path", dir).load()
    assert(back.count() == 6L)
    assert(!back.collect().exists(r => r.getLong(0) == 77L || r.getLong(0) == 88L))
  }

  test("a failed job leaves the previous table state fully intact") {
    val dir = freshDir()
    sample.write.format(Fmt).option("path", dir).mode("append").save()
    val before = spark.read.format(Fmt).option("path", dir).load().collect().toSet
    val poison = udf((id: Long) => {
      if (id == 4L) throw new RuntimeException("poisoned row"); id
    })
    intercept[Exception] {
      sample.withColumn("id", poison($"id"))
        .write.format(Fmt).option("path", dir).mode("append").save()
    }
    val after = spark.read.format(Fmt).option("path", dir).load()
    assert(after.collect().toSet == before, "failed job changed visible data")
    assert(after.count() == 6L)
  }

  test("nulls and control characters survive the roundtrip") {
    val dir = freshDir()
    val tricky = Seq(
      (1L, Some("tab\there"), Some(1.0)),
      (2L, Some("line\nbreak and back\\slash"), None),
      (3L, None, Some(3.0)))
      .toDF("id", "name", "score")
    tricky.write.format(Fmt).option("path", dir).mode("append").save()
    val back = spark.read.format(Fmt).option("path", dir).load()
      .collect().map(r => (r.getLong(0),
        Option(r.getString(1)), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(back == Set(
      (1L, Some("tab\there"), Some(1.0)),
      (2L, Some("line\nbreak and back\\slash"), None),
      (3L, None, Some(3.0))))
  }

  test("VACUUM MANIFEST reaps unreachable files; the delegating parser keeps normal SQL") {
    val dir = freshDir()
    sample.write.format(Fmt).option("path", dir).mode("append").save()
    Files.write(Paths.get(dir, "_staging", "part-9-999-dead.tsv"), "1\tx\t1.0\n".getBytes)
    Files.write(Paths.get(dir, "part-stray.tsv"), "2\ty\t2.0\n".getBytes)

    // default age threshold: NEITHER the fresh staged file (possibly an
    // in-flight attempt) NOR the fresh unmanifested root file (possibly
    // promoted-but-not-yet-committed) is reaped
    val safe = spark.sql(s"VACUUM MANIFEST '$dir'").collect()
    assert(safe.isEmpty, safe.mkString(", "))
    assert(Files.exists(Paths.get(dir, "_staging", "part-9-999-dead.tsv")))
    assert(Files.exists(Paths.get(dir, "part-stray.tsv")))

    // opting into age 0 (SQL clause beats conf beats default) reaps
    // crash leftovers immediately
    val out = spark.sql(s"VACUUM MANIFEST '$dir' OLDER THAN 0 MINUTES").collect()
    assert(out.map(_.getString(1)).sorted.toSeq ==
      Seq("staged-uncommitted", "unreachable"))
    assert(!Files.exists(Paths.get(dir, "part-stray.tsv")))
    assert(!Files.list(Paths.get(dir, "_staging")).iterator().hasNext)
    // committed data untouched, and everything else still parses via delegate
    assert(spark.read.format(Fmt).option("path", dir).load().count() == 6L)
    assert(spark.sql("SELECT 1 + 1 AS two").head().getInt(0) == 2)
  }

  test("RETAIN 0 SNAPSHOTS is rejected instead of silently behaving as RETAIN 1") {
    val dir = freshDir()
    sample.write.format(Fmt).option("path", dir).mode("append").save()
    val e = intercept[IllegalArgumentException] {
      spark.sql(s"VACUUM MANIFEST '$dir' RETAIN 0 SNAPSHOTS")
    }
    assert(e.getMessage.contains("RETAIN 0"))
  }

  test("stray non-numeric _manifest.v* names never break version parsing") {
    val dir = freshDir()
    sample.write.format(Fmt).option("path", dir).mode("append").save()
    // editor backup + leftover tmp — must be ignored, not NumberFormatException
    Files.write(Paths.get(dir, "_manifest.v1~"), "junk".getBytes)
    Files.write(Paths.get(dir, "_manifest.v2.tmp"), "junk".getBytes)
    assert(Manifest.snapshotVersions(Paths.get(dir)) == Seq(1))
    assert(spark.read.format(Fmt).option("path", dir).load().count() == 6L)
    sample.write.format(Fmt).option("path", dir).mode("append").save() // still writable
    assert(Manifest.snapshotVersions(Paths.get(dir)) == Seq(1, 2))
  }

  test("zone maps skip whole files on pushed numeric predicates") {
    val dir = freshDir()
    // range-partitioned by id → disjoint per-file [min, max] ranges
    (1L to 90L).map(i => (i, s"name$i", i * 1.5)).toDF("id", "name", "score")
      .repartitionByRange(3, $"id")
      .write.format(Fmt).option("path", dir).mode("append").save()
    val m = Manifest.read(Paths.get(dir)).get
    assert(m.entries.length == 3)
    m.entries.foreach(e => assert(e.stats.ranges.contains("id")
      && e.stats.ranges.contains("score"), e))

    def planned(df: org.apache.spark.sql.DataFrame): (Int, Int) = {
      val desc = df.queryExecution.executedPlan.toString
      val Re = """files=(\d+)/(\d+)""".r.unanchored
      desc match { case Re(k, t) => (k.toInt, t.toInt) }
    }
    val base = spark.read.format(Fmt).option("path", dir).load()
    // a selective equality hits exactly one file's range
    val one = base.filter($"id" === 7L)
    assert(planned(one) == ((1, 3)), planned(one).toString)
    assert(one.collect().map(_.getLong(0)).toSeq == Seq(7L))
    // a range predicate on the double column prunes too
    val hi = base.filter($"score" > 100.0) // ids > 66.7 → last file only
    assert(planned(hi) == ((1, 3)))
    assert(hi.count() == 90L - 67L + 1)
    // an impossible predicate reads zero files but stays correct
    val none = base.filter($"id" > 1000L)
    assert(planned(none) == ((0, 3)) && none.count() == 0L)
    // non-prunable predicates read everything and stay correct
    assert(base.filter($"name" === "name42").count() == 1L)
  }

  test("runtime filters prune whole files via the zone maps") {
    import org.apache.spark.sql.sources.{In, EqualTo, GreaterThan}
    val dir = freshDir()
    (1L to 90L).map(i => (i, i * 1.5)).toDF("id", "score")
      .repartitionByRange(3, $"id")
      .write.format(Fmt).option("path", dir).mode("append").save()
    val m = Manifest.read(Paths.get(dir)).get
    val scan = new ManifestScan(Paths.get(dir), m.schema, m.schema, m.entries, 3)
    assert(scan.planInputPartitions().length == 3)
    // a broadcast-join build side arriving as a runtime IN-set keeps only
    // the files whose [min, max] can hold any of the values
    scan.filter(Array[org.apache.spark.sql.sources.Filter](In("id", Array(7L, 12L))))
    assert(scan.planInputPartitions().length == 1)
    // further filters compose; an impossible conjunction plans zero files
    scan.filter(Array[org.apache.spark.sql.sources.Filter](GreaterThan("id", 1000L)))
    assert(scan.planInputPartitions().length == 0)
    // fresh scan: unknown shapes and stat-less columns never prune
    val scan2 = new ManifestScan(Paths.get(dir), m.schema, m.schema, m.entries, 3)
    scan2.filter(Array[org.apache.spark.sql.sources.Filter](EqualTo("nope", "x")))
    assert(scan2.planInputPartitions().length == 3)
  }

  test("LIMIT pushdown plans the minimal covering file prefix; filters refuse it") {
    // a DV-mode CATALOG table: deletes keep file identity and manifest
    // order, so the covering-prefix arithmetic is observable end to end
    val root = freshDir()
    spark.conf.set("spark.sql.catalog.graftlim", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftlim.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftlim.q")
    spark.sql("CREATE TABLE graftlim.q.t (id BIGINT, name STRING) " +
      "TBLPROPERTIES ('delete.dv' = 'true')")
    // 3 files × 30 rows, in a known commit order
    (0 until 3).foreach { b =>
      (1L to 30L).map(i => (b * 30 + i, s"v$i")).toDF("id", "name")
        .coalesce(1).writeTo("graftlim.q.t").append()
    }
    def scansOf(df: org.apache.spark.sql.DataFrame): Seq[ManifestScan] = {
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[ManifestScan] = {
        import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
        val here = p match {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
            if b.scan.isInstanceOf[ManifestScan] => Seq(b.scan.asInstanceOf[ManifestScan])
          case _ => Seq.empty
        }
        val kids = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: QueryStageExec => Seq(q.plan)
          case _ => p.children
        }
        here ++ kids.flatMap(walk)
      }
      walk(df.queryExecution.executedPlan)
    }
    def t = spark.table("graftlim.q.t")

    // LIMIT 10 < one file's rows → exactly 1 file planned, 10 rows out
    val l10 = t.limit(10)
    assert(l10.collect().length == 10)
    assert(scansOf(l10).head.plannedFiles == 1)

    // LIMIT 45 spans two files → 2 planned; Spark's Limit still cuts to 45
    val l45 = t.limit(45)
    assert(l45.collect().length == 45)
    assert(scansOf(l45).head.plannedFiles == 2)

    // LIMIT beyond the table plans everything and returns everything
    val lBig = t.limit(500)
    assert(lBig.collect().length == 90)
    assert(scansOf(lBig).head.plannedFiles == 3)

    // a filter below the limit refuses the push: residual predicates may
    // kill the whole prefix, so every surviving file must stay planned —
    // and the rows must be the FILTERED rows, never a prefix artifact
    val fl = t.filter($"id" > 80L).limit(5)
    val got = fl.collect().map(_.getLong(0)).toSet
    assert(got.size == 5 && got.forall(_ > 80L), got.toString)
    assert(scansOf(fl).head.plannedFiles >= 1) // zone maps may still prune

    // deletion vectors: liveRows (not physical rows) drive the prefix.
    // The vectorized file re-publishes at the END of the manifest, so
    // recompute the covering prefix from the live counts in manifest order
    spark.sql("DELETE FROM graftlim.q.t WHERE id <= 25")
    val live = Manifest.read(Paths.get(root, "q", "t")).get.entries.map(_.liveRows)
    assert(live.sum == 65L && live.contains(5L), live.toString) // 25 vectored away
    def prefix(n: Long): Int = {
      var acc = 0L
      live.takeWhile { r => val need = acc < n; acc += r; need }.length
    }
    for (n <- Seq(25, 32, 61)) {
      val l = t.limit(n)
      assert(l.collect().length == n)
      assert(scansOf(l).head.plannedFiles == prefix(n),
        s"LIMIT $n planned ${scansOf(l).head.plannedFiles}, want ${prefix(n)} of $live")
    }
  }

  test("TopN pushdown prunes files provably outside the rank bound") {
    val root = freshDir()
    spark.conf.set("spark.sql.catalog.grafttop", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.grafttop.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS grafttop.q")
    spark.sql("CREATE TABLE grafttop.q.t (id BIGINT, name STRING) " +
      "TBLPROPERTIES ('delete.dv' = 'true')")
    // 3 value-clustered files: [1,30], [31,60], [61,90]
    (0 until 3).foreach { b =>
      (1L to 30L).map(i => (b * 30 + i, s"v$i")).toDF("id", "name")
        .coalesce(1).writeTo("grafttop.q.t").append()
    }
    def scansOf(df: org.apache.spark.sql.DataFrame): Seq[ManifestScan] = {
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[ManifestScan] = {
        import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
        val here = p match {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
            if b.scan.isInstanceOf[ManifestScan] => Seq(b.scan.asInstanceOf[ManifestScan])
          case _ => Seq.empty
        }
        val kids = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: QueryStageExec => Seq(q.plan)
          case _ => p.children
        }
        here ++ kids.flatMap(walk)
      }
      walk(df.queryExecution.executedPlan)
    }
    def t = spark.table("grafttop.q.t")

    // DESC top-10 lives entirely in the last file — 1 of 3 planned
    val d10 = t.orderBy($"id".desc).limit(10)
    assert(d10.collect().map(_.getLong(0)).toSeq == (90L to 81L by -1))
    assert(scansOf(d10).head.plannedFiles == 1,
      s"DESC LIMIT 10 planned ${scansOf(d10).head.plannedFiles} of 3")

    // ASC top-10 lives in the first — 1 of 3
    val a10 = t.orderBy($"id".asc).limit(10)
    assert(a10.collect().map(_.getLong(0)).toSeq == (1L to 10L))
    assert(scansOf(a10).head.plannedFiles == 1)

    // DESC top-40 spans two files — 2 of 3
    val d40 = t.orderBy($"id".desc).limit(40)
    assert(d40.collect().map(_.getLong(0)).toSeq == (90L to 51L by -1))
    assert(scansOf(d40).head.plannedFiles == 2)

    // a tie-breaker after the leading key keeps leading-key pruning sound
    val tie = t.orderBy($"id".desc, $"name".asc).limit(5)
    assert(tie.collect().map(_.getLong(0)).toSeq == (90L to 86L by -1))
    assert(scansOf(tie).head.plannedFiles == 1)

    // a filter refuses the push — residuals could kill the counted rows
    val fl = t.filter($"name" =!= "v1").orderBy($"id".desc).limit(5)
    assert(fl.collect().map(_.getLong(0)).toSeq ==
      Seq(90L, 89L, 88L, 87L, 86L))
    assert(scansOf(fl).head.plannedFiles == 3)

    // deletion vectors: live rows drive the accumulation, physical ranges
    // stay sound — after deleting the top 5, the last file still covers
    spark.sql("DELETE FROM grafttop.q.t WHERE id > 85")
    val d10b = t.orderBy($"id".desc).limit(10)
    assert(d10b.collect().map(_.getLong(0)).toSeq == (85L to 76L by -1))
    assert(scansOf(d10b).head.plannedFiles == 1,
      "DV'd last file still covers the top-10 alone")

    // an OVERLAPPING layout prunes nothing and stays correct
    spark.sql("DROP TABLE grafttop.q.t")
    spark.sql("CREATE TABLE grafttop.q.t (id BIGINT, name STRING)")
    (0 until 3).foreach { b =>
      (1L to 30L).map(i => (i * 3 + b, s"w$i")).toDF("id", "name")
        .coalesce(1).writeTo("grafttop.q.t").append()
    }
    val ov = t.orderBy($"id".desc).limit(4)
    assert(ov.collect().map(_.getLong(0)).toSeq == Seq(92L, 91L, 90L, 89L))
    assert(scansOf(ov).head.plannedFiles == 3,
      "overlapping ranges cannot be pruned")
  }

  test("broadcast-join DPP prunes manifest files at runtime, end to end") {
    import org.apache.spark.sql.functions.broadcast
    val dir = freshDir()
    (1L to 90L).map(i => (i, i * 1.5)).toDF("id", "score")
      .repartitionByRange(3, $"id")
      .write.format(Fmt).option("path", dir).mode("append").save()
    val fact = spark.read.format(Fmt).option("path", dir).load()
    // selective build side → Spark injects a dynamicpruning IN-filter into
    // the V2 scan; candidate ids {7, 457, 907} only intersect file 1's range
    val dim = spark.range(0, 1000).toDF("id").filter($"id" % 450 === 7L)
    val j = fact.join(broadcast(dim), "id")
    val rows = j.collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(7L))
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"), plan.take(800))
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[ManifestScan] = {
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      val here = p match {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
          if b.scan.isInstanceOf[ManifestScan] => Seq(b.scan.asInstanceOf[ManifestScan])
        case _ => Seq.empty
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => p.children
      }
      here ++ kids.flatMap(scans)
    }
    val scan = scans(j.queryExecution.executedPlan).head
    assert(scan.plannedFiles == 1,
      s"runtime IN-set should prune to 1 of 3 files, planned ${scan.plannedFiles}")
  }

  test("column statistics aggregate the zone maps soundly for CBO") {
    val dir = freshDir()
    sample.write.format(Fmt).option("path", dir).mode("append").save()
    // one file carries a NULL score beside a real value → the column's
    // nullCount must be unknown while min/max stay valid bounds for the
    // non-null values
    Seq((Some(7L), Some("eta"), Option.empty[Double]),
        (Some(8L), Some("theta"), Some(7.5)))
      .toDF("id", "name", "score").coalesce(1)
      .write.format(Fmt).option("path", dir).mode("append").save()
    val stats = new ManifestScanBuilder(Paths.get(dir), None).build()
      .asInstanceOf[ManifestScan].estimateStatistics()
    assert(stats.numRows().getAsLong == 8L)
    val cols = stats.columnStats().asScala.map { case (k, v) => k.toString -> v }
    // id: every file has a complete range, never a null
    val id = cols("id")
    assert(id.min().get() == java.lang.Long.valueOf(1L))
    assert(id.max().get() == java.lang.Long.valueOf(8L))
    assert(id.nullCount().getAsLong == 0L)
    // score: ranges still bound the non-null values; nullCount is UNKNOWN
    // (a file flagged the column incomplete), never claimed as 0
    val score = cols("score")
    assert(score.min().get() == java.lang.Double.valueOf(1.5))
    assert(score.max().get() == java.lang.Double.valueOf(7.5))
    assert(!score.nullCount().isPresent)
    // strings carry no numeric range → no column-stat claim
    assert(!cols.contains("name"))
  }

  test("manifest read cache: unchanged tables stat instead of reparse; any commit invalidates") {
    val dir = freshDir()
    sample.write.format(Fmt).option("path", dir).mode("append").save()
    Manifest.clearReadCache()
    val c0 = Manifest.fileParseCount.get()
    val m1 = Manifest.read(Paths.get(dir)).get
    assert(Manifest.fileParseCount.get() == c0 + 1)
    // second read of the unchanged table: stat only, same instance
    val m2 = Manifest.read(Paths.get(dir)).get
    assert(Manifest.fileParseCount.get() == c0 + 1, "unchanged read must not reparse")
    assert(m1 eq m2)
    // a commit swaps in a fresh inode → the next read reparses and sees it
    sample.write.format(Fmt).option("path", dir).mode("append").save()
    val m3 = Manifest.read(Paths.get(dir)).get
    assert(m3.entries.map(_.rows).sum == 12L, "cache must never hide a commit")
    // a DIRECT manifest write (ALTER-style RMW) invalidates just the same
    Manifest.write(Paths.get(dir), m3.copy(props = m3.props + ("x" -> "y")))
    assert(Manifest.read(Paths.get(dir)).get.props.get("x").contains("y"))
  }

  test("StartsWith and IsNull prune whole files via the zone maps") {
    val dir = freshDir()
    // three files clustered by name prefix; exactly one carries a NULL score
    Seq((1L, "apple", Some(1.0)), (2L, "avocado", Some(2.0)))
      .toDF("id", "name", "score").coalesce(1)
      .write.format(Fmt).option("path", dir).mode("append").save()
    Seq((3L, "banana", Option.empty[Double]), (4L, "blueberry", Some(4.0)))
      .toDF("id", "name", "score").coalesce(1)
      .write.format(Fmt).option("path", dir).mode("append").save()
    Seq((5L, "cherry", Some(5.0)), (6L, "cranberry", Some(6.0)))
      .toDF("id", "name", "score").coalesce(1)
      .write.format(Fmt).option("path", dir).mode("append").save()

    def planned(df: org.apache.spark.sql.DataFrame): (Int, Int) = {
      val Re = """files=(\d+)/(\d+)""".r.unanchored
      df.queryExecution.executedPlan.toString match { case Re(k, t) => (k.toInt, t.toInt) }
    }
    val base = () => spark.read.format(Fmt).option("path", dir).load()
    // LIKE 'b%' overlaps only the middle file's [banana, blueberry] range
    val b = base().filter($"name".startsWith("b"))
    assert(planned(b) == ((1, 3)), planned(b).toString)
    assert(b.collect().map(_.getString(1)).sorted.toSeq == Seq("banana", "blueberry"))
    // a prefix past every range reads nothing and stays correct
    val z = base().filter($"name".startsWith("zz"))
    assert(planned(z) == ((0, 3)) && z.count() == 0L)
    // IS NULL keeps ONLY the file whose range is incomplete
    val n = base().filter($"score".isNull)
    assert(planned(n) == ((1, 3)), planned(n).toString)
    assert(n.collect().map(_.getLong(0)).toSeq == Seq(3L))
    // IS NULL on a never-null column reads nothing
    val nn = base().filter($"name".isNull)
    assert(planned(nn) == ((0, 3)) && nn.count() == 0L)
  }

  test("aggregate pushdown: COUNT/MIN/MAX answer metadata-only, with sound refusals") {
    val dir = freshDir()
    (1L to 90L).map(i => (i, s"name$i", i * 1.5)).toDF("id", "name", "score")
      .repartitionByRange(3, $"id")
      .write.format(Fmt).option("path", dir).mode("append").save()
    val base = () => spark.read.format(Fmt).option("path", dir).load()
    def isAggScan(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.executedPlan.toString.contains("GraftManifestAggScan")

    // whole-table COUNT(*) / MIN / MAX: one metadata row, zero file opens
    val q = base().agg(count(lit(1)).as("n"), min($"id").as("lo"),
      max($"score").as("hi"))
    assert(isAggScan(q), q.queryExecution.executedPlan.toString)
    val r = q.head()
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) == ((90L, 1L, 135.0)))
    // count(col) on a never-null column pushes too
    val qc = base().agg(count($"name").as("n"))
    assert(isAggScan(qc) && qc.head().getLong(0) == 90L)

    // a FILTERED aggregate must not be answered from metadata
    val qf = base().filter($"id" > 10L).agg(count(lit(1)))
    assert(!isAggScan(qf))
    assert(qf.head().getLong(0) == 80L)

    // NULLs block count(col) pushdown and the answer stays exact
    Seq((Some(91L), Option.empty[String], Some(1.0)))
      .toDF("id", "name", "score").coalesce(1)
      .write.format(Fmt).option("path", dir).mode("append").save()
    val qn = base().agg(count($"name").as("n"))
    assert(!isAggScan(qn))
    assert(qn.head().getLong(0) == 90L)
    // count(*) still pushes; min/max too (the null was in name only...
    // but score is now incomplete-free? the new file has score=1.0) —
    // min must reflect the appended row
    val q2 = base().agg(count(lit(1)).as("n"), min($"score").as("lo"))
    assert(isAggScan(q2))
    assert((q2.head().getLong(0), q2.head().getDouble(1)) == ((91L, 1.0)))

    // a deletion vector blocks MIN/MAX (a vectored row could be the
    // extremum) but COUNT(*) stays metadata-exact on LIVE rows: vector
    // ordinal 0 of the first file (id=1, the global min) directly
    val m = Manifest.read(Paths.get(dir)).get
    val victim = m.entries.find(_.stats.ranges.get("id").exists(_._1 == 1)).get
    val dvName = DeletionVector.write(Paths.get(dir), Array(0L))
    Manifest.write(Paths.get(dir), m.copy(entries = m.entries.map(e =>
      if (e.name == victim.name) e.copy(dv = Some((dvName, 1L))) else e)))
    val q3 = base().agg(count(lit(1)).as("n"))
    assert(isAggScan(q3) && q3.head().getLong(0) == 90L,
      "count(*) must be live-row exact under deletion vectors")
    val q4 = base().agg(min($"id").as("lo"))
    assert(!isAggScan(q4), "a vectored file must block min/max pushdown")
    assert(q4.head().getLong(0) == 2L)
  }

  test("aggregate pushdown covers FLOAT and DECIMAL min/max exactly") {
    val dir = freshDir()
    spark.sql(
      """SELECT id, CAST(id * 0.5 AS FLOAT) AS f,
        |  CAST(CAST(id AS DECIMAL(10,2)) / 8 AS DECIMAL(10,2)) AS d
        |FROM RANGE(1, 101)""".stripMargin)
      .repartitionByRange(4, $"id")
      .write.format(Fmt).option("path", dir).mode("append").save()
    val q = spark.read.format(Fmt).option("path", dir).load()
      .agg(min($"f").as("flo"), max($"f").as("fhi"),
        min($"d").as("dlo"), max($"d").as("dhi"))
    assert(q.queryExecution.executedPlan.toString.contains("GraftManifestAggScan"),
      q.queryExecution.executedPlan.toString)
    val r = q.head()
    assert(r.getFloat(0) == 0.5f && r.getFloat(1) == 50.0f)
    assert(r.getDecimal(2) == new java.math.BigDecimal("0.13") ||
      r.getDecimal(2) == new java.math.BigDecimal("0.12"), r.getDecimal(2))
    assert(r.getDecimal(3) == new java.math.BigDecimal("12.50"))
    // a float NaN flags the range incomplete and blocks min/max soundly
    spark.sql("SELECT CAST(200 AS BIGINT) AS id, CAST('NaN' AS FLOAT) AS f, " +
      "CAST(1 AS DECIMAL(10,2)) AS d").coalesce(1)
      .write.format(Fmt).option("path", dir).mode("append").save()
    val qn = spark.read.format(Fmt).option("path", dir).load()
      .agg(max($"f").as("fhi"))
    assert(!qn.queryExecution.executedPlan.toString.contains("GraftManifestAggScan"),
      "NaN must block float min/max pushdown")
    assert(qn.head().getFloat(0).isNaN)
  }

  test("sparse line index splits a large file into exact byte-range partitions") {
    val dir = freshDir()
    System.setProperty("graft.write.indexStride", "100")
    try {
      (0L until 1000L).map(i => (i, s"name$i")).toDF("id", "name")
        .coalesce(1).write.format(Fmt).option("path", dir).mode("append").save()
    } finally System.clearProperty("graft.write.indexStride")
    val e = Manifest.read(Paths.get(dir)).get.entries.head
    assert(e.lineIndex.length == 11, // stride + 10 offsets (lines 0,100..900)
      s"index: ${e.lineIndex.toSeq}")
    assert(e.lineIndex(0) == 100L && e.lineIndex(1) == 0L)

    spark.conf.set("spark.graft.scan.splitRows", "200")
    try {
      val base = () => spark.read.format(Fmt).option("path", dir).load()
      // 10 offsets grouped by 200/100=2 strides → 5 partitions, 1 file
      assert(base().rdd.getNumPartitions == 5)
      assert(base().count() == 1000L)
      assert(base().agg(org.apache.spark.sql.functions.sum($"id")).head().getLong(0)
        == (0L until 1000L).sum)
      // _pos stays the PHYSICAL ordinal across split boundaries
      val pos = spark.read.format(Fmt).option("path", dir).load()
        .selectExpr("id", "_pos").where("id IN (0, 199, 200, 999)")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(pos == Map(0L -> 0L, 199L -> 199L, 200L -> 200L, 999L -> 999L))
      // a deletion vector spanning split boundaries skips exactly its
      // ordinals — including one ON a boundary line
      val m = Manifest.read(Paths.get(dir)).get
      val dvName = DeletionVector.write(Paths.get(dir), Array(200L, 555L))
      Manifest.write(Paths.get(dir), m.copy(entries =
        m.entries.map(_.copy(dv = Some((dvName, 2L))))))
      assert(base().count() == 998L)
      assert(base().where("id IN (200, 555)").count() == 0L)
      assert(base().where("id IN (199, 201, 554, 556)").count() == 4L)
    } finally spark.conf.unset("spark.graft.scan.splitRows")

    // without the conf the default threshold leaves small files unsplit
    assert(spark.read.format(Fmt).option("path", dir).load()
      .rdd.getNumPartitions == 1)
  }

  test("NDV column statistics: merged KMV sketches land within 10%, withheld when any file lacks one") {
    val dir = freshDir()
    val schema2 = Seq((1L, "x")).toDF("id", "cat").schema
    Manifest.write(Paths.get(dir),
      Manifest(schema2, Seq.empty, Map(Manifest.NdvColsProp -> "id,cat")))
    // 10,000 distinct ids via OVERLAPPING appends (0–5999 and 4000–9999):
    // the union merge must not double-count the 2000 shared keys
    (0L until 6000L).map(i => (i, s"c${i % 37}")).toDF("id", "cat")
      .repartition(3).write.format(Fmt).option("path", dir).mode("append").save()
    (4000L until 10000L).map(i => (i, s"c${i % 37}")).toDF("id", "cat")
      .repartition(3).write.format(Fmt).option("path", dir).mode("append").save()
    def colStats = new ManifestScanBuilder(Paths.get(dir), None).build()
      .asInstanceOf[ManifestScan].estimateStatistics().columnStats().asScala
      .map { case (k, v) => k.toString -> v }
    val idNdv = colStats("id").distinctCount().getAsLong
    assert(math.abs(idNdv - 10000L) <= 1000L,
      s"NDV for id: $idNdv, want 10000 ±10%")
    // a column with fewer than K distinct values is EXACT (the sketch is
    // its complete hash set) — and strings get stats through NDV alone
    assert(colStats("cat").distinctCount().getAsLong == 37L)
    // soundness (the C94 rule): one live file without a sketch must
    // withhold the table-level claim, not skew it
    val m = Manifest.read(Paths.get(dir)).get
    Manifest.write(Paths.get(dir), m.copy(props = m.props - Manifest.NdvColsProp))
    Seq((100000L, "zz")).toDF("id", "cat").coalesce(1)
      .write.format(Fmt).option("path", dir).mode("append").save()
    assert(!colStats("id").distinctCount().isPresent,
      "sketch-less live file must withhold NDV")
    assert(!colStats.contains("cat"), "no range, no sketch → no claim")
  }

  test("TSV codec and zone-map stats roundtrip adversarial values") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.types.UTF8String
    val schema = StructType(Seq(
      StructField("l", LongType), StructField("s", StringType),
      StructField("d", DoubleType), StructField("b", BooleanType),
      StructField("i", IntegerType)))
    val idx = (0 until schema.length).toArray // identity wanted->cell map
    // adversarial strings: every escaped char, the null marker itself,
    // NUL bytes, unicode — plus numeric extremes and NaN
    val strings = Seq("", "\t", "\n", "\r", "\\", "\\N", "\\\\N", "a\tb\nc\rd\\e",
      "N", " nul ", "日本語 😀", "trailing\\")
    val longs = Seq(Long.MinValue, -1L, 0L, Long.MaxValue)
    val doubles = Seq(Double.MinPositiveValue, -0.0, 0.0, 1.5e308, -1.7e-300, Double.NaN)
    val cases = for {
      (s, k) <- strings.zipWithIndex
      l = longs(k % longs.length); d = doubles(k % doubles.length)
    } yield InternalRow(l, UTF8String.fromString(s), d, k % 2 == 0, k - 5)
    (cases :+ InternalRow(null, null, null, null, null)).foreach { row =>
      val back = GraftManifestSink.parse(
        GraftManifestSink.render(row, schema), idx, schema)
      (0 until schema.length).foreach { i =>
        if (row.isNullAt(i)) assert(back.isNullAt(i), s"col $i not null")
        else schema.fields(i).dataType match {
          case LongType => assert(back.getLong(i) == row.getLong(i))
          case IntegerType => assert(back.getInt(i) == row.getInt(i))
          case BooleanType => assert(back.getBoolean(i) == row.getBoolean(i))
          case StringType =>
            assert(back.getUTF8String(i).toString == row.getUTF8String(i).toString)
          case DoubleType =>
            val (a, b) = (back.getDouble(i), row.getDouble(i))
            assert(a == b || (a.isNaN && b.isNaN), s"$a vs $b")
        }
      }
    }
    // zone-map serialization: negative, fractional, huge magnitudes
    val st = ColumnStats(Map(
      "x" -> (BigDecimal(Long.MinValue), BigDecimal(Long.MaxValue)),
      "y" -> (BigDecimal("-1.5E308"), BigDecimal("2.225E-308")),
      "z" -> (BigDecimal(-0.0), BigDecimal("0.1"))))
    assert(ColumnStats.parse(st.render).ranges == st.ranges)
    assert(ColumnStats.parse(ColumnStats.empty.render) == ColumnStats.empty)
  }

  test("zone-map proofs are sound: mightMatch never loses a row, mustMatchAll never overclaims") {
    import org.apache.spark.sql.sources._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
      (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

    val valGen = Gen.chooseNum(-20L, 20L)
    val fileGen = Gen.nonEmptyListOf(valGen) // one numeric column "c"
    val filterGen: Gen[Filter] = {
      val leaf = Gen.oneOf(
        valGen.map(v => EqualTo("c", v): Filter),
        valGen.map(v => GreaterThan("c", v): Filter),
        valGen.map(v => GreaterThanOrEqual("c", v): Filter),
        valGen.map(v => LessThan("c", v): Filter),
        valGen.map(v => LessThanOrEqual("c", v): Filter),
        Gen.nonEmptyListOf(valGen).map(vs => In("c", vs.toArray): Filter))
      for { a <- leaf; b <- leaf; f <- Gen.oneOf(a, And(a, b), Or(a, b)) } yield f
    }
    def eval(f: Filter, v: Long): Boolean = f match {
      case EqualTo(_, x: Long) => v == x
      case GreaterThan(_, x: Long) => v > x
      case GreaterThanOrEqual(_, x: Long) => v >= x
      case LessThan(_, x: Long) => v < x
      case LessThanOrEqual(_, x: Long) => v <= x
      case In(_, xs) => xs.exists(_ == v)
      case And(l, r) => eval(l, v) && eval(r, v)
      case Or(l, r) => eval(l, v) || eval(r, v)
      case AlwaysTrue() => true
      case other => fail(s"unexpected filter $other")
    }

    val files = sample(fileGen, 120, 11L)
    val filters = sample(filterGen, 120, 23L)
    for (rows <- files; f <- filters) {
      val st = ColumnStats(Map("c" -> ((BigDecimal(rows.min), BigDecimal(rows.max)))))
      val any = rows.exists(eval(f, _))
      val all = rows.forall(eval(f, _))
      // soundness: a pruned file (mightMatch false) must contain NO match
      if (!ManifestScanBuilder.mightMatch(f, st)) assert(!any,
        s"mightMatch pruned a matching file: $f over [${rows.min},${rows.max}]")
      // soundness: a metadata-deleted file (mustMatchAll true) must be ALL matches
      if (ManifestScanBuilder.mustMatchAll(f, st)) assert(all,
        s"mustMatchAll overclaimed: $f over [${rows.min},${rows.max}]")
      // stat-less columns can never prune or prove
      assert(ManifestScanBuilder.mightMatch(f, ColumnStats.empty))
      assert(!ManifestScanBuilder.mustMatchAll(f, ColumnStats.empty))
    }
  }

  test("NULL and NaN cells mark the zone map incomplete instead of lying or crashing") {
    val dir = freshDir()
    // NaN/Infinity and NULL are supported cell values — the write must
    // succeed and the range must be flagged incomplete, not fabricated
    Seq((1L, Some(Double.NaN)), (2L, Some(2.5)), (3L, None),
      (4L, Some(Double.PositiveInfinity)))
      .toDF("id", "score").coalesce(1)
      .write.format(Fmt).option("path", dir).mode("append").save()
    val e = Manifest.read(Paths.get(dir)).get.entries.head
    assert(e.stats.ranges("id") == ((BigDecimal(1), BigDecimal(4))))
    assert(e.stats.ranges("score") == ((BigDecimal(2.5), BigDecimal(2.5))))
    assert(e.stats.incomplete == Set("score"))
    // round-trips through the manifest text format
    assert(ColumnStats.parse(e.stats.render, Paths.get(dir)) == e.stats)
    // an incomplete column can still PRUNE (NaN/NULL rows match nothing)…
    import org.apache.spark.sql.sources.GreaterThan
    assert(!ManifestScanBuilder.mightMatch(GreaterThan("score", 9.0), e.stats))
    // …but can never PROVE a full-file match for metadata DELETE
    assert(!ManifestScanBuilder.mustMatchAll(GreaterThan("score", 0.0), e.stats))
    // NaN as a pushed filter value never prunes (and never throws)
    assert(ManifestScanBuilder.mightMatch(GreaterThan("score", Double.NaN), e.stats))
    // data still reads back intact
    val back = spark.read.format(Fmt).option("path", dir).load().collect()
    assert(back.length == 4)
  }

  test("date, timestamp and string zone maps skip whole files") {
    import java.sql.{Date, Timestamp}
    val dir = freshDir()
    // three week-disjoint files (one append each): ts ranges and source
    // strings both disjoint per file
    (0 until 3).foreach { week =>
      val rows = (0 until 30).map { i =>
        val day = week * 7 + 1 + i % 7
        ((week * 30 + i).toLong, Timestamp.valueOf(f"2026-01-$day%02d 12:00:00"),
          Date.valueOf(f"2026-01-$day%02d"), s"src${('a' + week).toChar}")
      }
      rows.toDF("id", "ts", "d", "source").coalesce(1)
        .write.format(Fmt).option("path", dir).mode("append").save()
    }
    val m = Manifest.read(Paths.get(dir)).get
    assert(m.entries.length == 3)
    m.entries.foreach { e =>
      assert(e.stats.ranges.contains("ts") && e.stats.ranges.contains("d"), e)
      assert(e.stats.strRanges.contains("source"), e)
    }
    def planned(df: org.apache.spark.sql.DataFrame): (Int, Int) = {
      val desc = df.queryExecution.executedPlan.toString
      val Re = """files=(\d+)/(\d+)""".r.unanchored
      desc match { case Re(k, t) => (k.toInt, t.toInt) }
    }
    val base = spark.read.format(Fmt).option("path", dir).load()
    // timestamp range predicate: only week-2 rows → 1 of 3 files
    val week2 = base.filter($"ts" >= Timestamp.valueOf("2026-01-08 00:00:00")
      && $"ts" < Timestamp.valueOf("2026-01-15 00:00:00"))
    assert(planned(week2) == ((1, 3)), planned(week2).toString)
    assert(week2.count() == 30L)
    // date equality prunes on the int-days range
    val day = base.filter($"d" === Date.valueOf("2026-01-16"))
    assert(planned(day) == ((1, 3)))
    assert(day.count() > 0)
    // string equality prunes via the UTF-8-ordered string range
    val srcB = base.filter($"source" === "srcb")
    assert(planned(srcB) == ((1, 3)))
    assert(srcB.count() == 30L)
    // a string nobody wrote plans zero files but stays correct
    val ghost = base.filter($"source" === "zzz")
    assert(planned(ghost) == ((0, 3)) && ghost.count() == 0L)
    // values round-trip exactly (codec carries internal days/micros)
    val got = base.filter($"id" === 31L).collect().head
    assert(got.getTimestamp(1) == Timestamp.valueOf("2026-01-09 12:00:00"))
    assert(got.getDate(2) == Date.valueOf("2026-01-09"))
  }

  test("string bounds truncate with widening: prune stays sound, manifest stays small") {
    val dir = freshDir()
    val longA = "a" * 200 + "tail-we-must-not-lose"
    val longZ = "z" * 200
    Seq((1L, longA), (2L, "middle"), (3L, longZ)).toDF("id", "s").coalesce(1)
      .write.format(Fmt).option("path", dir).mode("append").save()
    val e = Manifest.read(Paths.get(dir)).get.entries.head
    val (lo64, hi64) = e.stats.strRanges("s")
    assert(ColumnStats.unb64(lo64).length <= ColumnStats.StatMaxBytes)
    assert(ColumnStats.unb64(hi64).length <= ColumnStats.StatMaxBytes)
    // the widened range still contains every written value...
    import org.apache.spark.sql.sources.{EqualTo, GreaterThan, LessThan}
    Seq(longA, "middle", longZ).foreach { v =>
      assert(ManifestScanBuilder.mightMatch(EqualTo("s", v), e.stats), v.take(20))
    }
    // ...still prunes far-away values on both sides...
    assert(!ManifestScanBuilder.mightMatch(LessThan("s", "A"), e.stats))
    assert(!ManifestScanBuilder.mightMatch(EqualTo("s", "ÿÿ"), e.stats))
    // ...and widened bounds only ever make proofs MORE conservative: all
    // rows are <= longZ (it is the max), but the widened upper bound sits
    // beyond longZ, so the metadata-DELETE proof is (safely) rejected
    import org.apache.spark.sql.sources.LessThanOrEqual
    assert(!ManifestScanBuilder.mustMatchAll(LessThanOrEqual("s", longZ), e.stats))
    // while a proof that holds against the widened range is still found
    assert(ManifestScanBuilder.mustMatchAll(GreaterThan("s", "A"), e.stats))
    // reads are unaffected
    val back = spark.read.format(Fmt).option("path", dir).load()
    assert(back.filter($"s" === longA).count() == 1L)
  }

  test("NULL strings mark the range incomplete: prune allowed, prove blocked") {
    val dir = freshDir()
    Seq((1L, Some("alpha")), (2L, Some("beta")), (3L, None: Option[String]))
      .toDF("id", "s").coalesce(1)
      .write.format(Fmt).option("path", dir).mode("append").save()
    val e = Manifest.read(Paths.get(dir)).get.entries.head
    assert(e.stats.strRanges.contains("s") && e.stats.incomplete == Set("s"))
    assert(ColumnStats.parse(e.stats.render, Paths.get(dir)) == e.stats)
    import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThanOrEqual}
    // range ["alpha","beta"] prunes s > "zzz"…
    assert(!ManifestScanBuilder.mightMatch(GreaterThanOrEqual("s", "zzz"), e.stats))
    // …but the NULL row blocks any full-file proof
    assert(!ManifestScanBuilder.mustMatchAll(LessThanOrEqual("s", "zzz"), e.stats))
  }

  test("string zone-map proofs are sound under random filters and truncation") {
    import org.apache.spark.sql.sources._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
      (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))
    // short alphabet + varying lengths maximizes boundary collisions; some
    // strings exceed StatMaxBytes to exercise widening truncation
    val valGen = for {
      n <- Gen.chooseNum(0, 3)
      base <- Gen.listOfN(n, Gen.oneOf("a", "b", "é", "z"))
      pad <- Gen.oneOf("", "", "", "a" * 70)
    } yield base.mkString + pad
    val fileGen = Gen.nonEmptyListOf(valGen)
    val filterGen: Gen[Filter] = {
      val leaf = Gen.oneOf(
        valGen.map(v => EqualTo("c", v): Filter),
        valGen.map(v => GreaterThan("c", v): Filter),
        valGen.map(v => GreaterThanOrEqual("c", v): Filter),
        valGen.map(v => LessThan("c", v): Filter),
        valGen.map(v => LessThanOrEqual("c", v): Filter),
        Gen.nonEmptyListOf(valGen).map(vs => In("c", vs.toArray): Filter),
        valGen.map(v => StringStartsWith("c", v): Filter))
      for { a <- leaf; b <- leaf; f <- Gen.oneOf(a, And(a, b), Or(a, b)) } yield f
    }
    def bytes(s: String) = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    def cmp(a: String, b: String) = ColumnStats.cmpBytes(bytes(a), bytes(b))
    def eval(f: Filter, v: String): Boolean = f match {
      case EqualTo(_, x: String) => cmp(v, x) == 0
      case GreaterThan(_, x: String) => cmp(v, x) > 0
      case GreaterThanOrEqual(_, x: String) => cmp(v, x) >= 0
      case LessThan(_, x: String) => cmp(v, x) < 0
      case LessThanOrEqual(_, x: String) => cmp(v, x) <= 0
      case In(_, xs) => xs.exists(x => cmp(v, x.asInstanceOf[String]) == 0)
      case StringStartsWith(_, x: String) =>
        bytes(v).startsWith(bytes(x).toSeq) // byte-prefix = the prune's region
      case And(l, r) => eval(l, v) && eval(r, v)
      case Or(l, r) => eval(l, v) || eval(r, v)
      case AlwaysTrue() => true
      case other => fail(s"unexpected filter $other")
    }
    // the stats a writer would commit: byte-order min/max, widened-truncated
    def statsOf(rows: Seq[String]): ColumnStats = {
      val lo = rows.minBy(identity)(Ordering.fromLessThan[String](cmp(_, _) < 0))
      val hi = rows.maxBy(identity)(Ordering.fromLessThan[String](cmp(_, _) < 0))
      ColumnStats.truncUpper(bytes(hi)) match {
        case Some(h) => ColumnStats(Map.empty, Set.empty,
          Map("c" -> ((ColumnStats.b64(ColumnStats.truncLower(bytes(lo))),
            ColumnStats.b64(h)))))
        case None => ColumnStats.empty
      }
    }
    val files = sample(fileGen, 120, 31L)
    val filters = sample(filterGen, 120, 43L)
    for (rows <- files; f <- filters) {
      val st = statsOf(rows)
      val any = rows.exists(eval(f, _))
      val all = rows.forall(eval(f, _))
      if (!ManifestScanBuilder.mightMatch(f, st))
        assert(!any, s"pruned a matching file: $f over $rows")
      if (ManifestScanBuilder.mustMatchAll(f, st))
        assert(all, s"mustMatchAll overclaimed: $f over $rows")
    }
  }

  test("legacy manifests without widths or string stats still parse") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_legacy_")
    // a round-6-format manifest: no props line, 3-field entry, numeric stats
    Files.write(dir.resolve("part-0-0-old.tsv"), "1\talpha\t1.5\n2\tbeta\t2.5\n".getBytes)
    Files.write(dir.resolve("_manifest"),
      "id:long\tname:string\tscore:double\npart-0-0-old.tsv\t2\tid=1,2;score=1.5,2.5\n".getBytes)
    val m = Manifest.read(dir).get
    assert(m.props.isEmpty)
    assert(m.entries.head.cols == 3) // defaults to its manifest's schema width
    assert(m.entries.head.stats.strRanges.isEmpty)
    val back = spark.read.format(Fmt).option("path", dir.toString).load()
    assert(back.count() == 2L)
    assert(back.schema == StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("score", DoubleType))))
  }

  test("column pruning reaches the manifest reader") {
    val dir = freshDir()
    sample.write.format(Fmt).option("path", dir).mode("append").save()
    val df = spark.read.format(Fmt).option("path", dir).load().select("id")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cols=id"), plan.take(800))
    assert(df.as[Long].collect().sorted.toSeq == (1L to 6L))
  }

  test("UPDATE's WHERE translator is exact on every shape it claims") {
    import org.apache.spark.sql.sources._
    def t(sql: String): Option[Filter] = {
      val parsed = spark.sessionState.sqlParser.parseExpression(sql)
      ManifestTable.conjuncts(parsed).map(ManifestTable.exprFilter) match {
        case Seq(one) => one
        case many => // AND splits: re-fold for the assertion
          if (many.forall(_.isDefined)) Some(many.flatten.reduce(And(_, _))) else None
      }
    }
    assert(t("id < 5").contains(LessThan("id", 5)))
    assert(t("5 > id").contains(LessThan("id", 5)), "flipped operands must flip the comparison")
    assert(t("5 <= id").contains(GreaterThanOrEqual("id", 5)))
    assert(t("id = 'web'").contains(EqualTo("id", "web")), "string literals unwrap from UTF8String")
    assert(t("v >= 1.5").contains(GreaterThanOrEqual("v", new java.math.BigDecimal("1.5"))))
    assert(t("id BETWEEN 2 AND 7").contains(
      And(GreaterThanOrEqual("id", 2), LessThanOrEqual("id", 7))))
    assert(t("id < 5 AND v > 1").contains(
      And(LessThan("id", 5), GreaterThan("v", 1))))
    assert(t("id = 1 OR id = 9").contains(Or(EqualTo("id", 1), EqualTo("id", 9))))
    assert(t("id IN (1, 2, 3)").exists {
      case In("id", vs) => vs.toSeq == Seq(1, 2, 3)
      case _ => false
    })
    assert(t("t.id < 5").contains(LessThan("id", 5)), "qualified names strip to the column")
    // shapes with no exact zone-map reading must refuse, not approximate
    assert(t("id + 1 < 5").isEmpty)
    assert(t("abs(id) < 5").isEmpty)
    assert(t("id IN (1, NULL)").isEmpty)
    assert(t("id = NULL").isEmpty)
    assert(t("NOT (id < 5)").isEmpty, "NOT is not translated — prune less, never wrong")
    // untranslatable conjunct inside an AND: the other side still prunes
    val parsed = spark.sessionState.sqlParser.parseExpression("id < 5 AND abs(v) > 1")
    val usable = ManifestTable.conjuncts(parsed).flatMap(ManifestTable.exprFilter)
    assert(usable == Seq(LessThan("id", 5)))
  }

  test("stats parse lazily: no-filter plans parse nothing, blooms decode only for probed columns") {
    val dir = freshDir()
    // bloom config is a TABLE property — seed a schema-only manifest
    // carrying it, then append (the writer reads bloomCols from the dir)
    val schema3 = Seq((1L, "x", 1.0)).toDF("id", "name", "score").schema
    Manifest.write(Paths.get(dir),
      Manifest(schema3, Seq.empty, Map(Manifest.BloomColsProp -> "id")))
    (1L to 60L).map(i => (i, s"name$i", i * 1.5)).toDF("id", "name", "score")
      .repartitionByRange(3, $"id")
      .write.format(Fmt).option("path", dir).mode("append").save()
    assert(Manifest.read(Paths.get(dir)).get.entries
      .forall(_.stats.blooms.contains("id")), "blooms must exist for the test")
    val base = () => spark.read.format(Fmt).option("path", dir).load()

    // a plan with NO pushable filter must consult no stats at all
    // (the manifest cache would hand back the entries force-checked above,
    // so drop it — the laziness claim is about FRESH entry instances)
    Manifest.clearReadCache()
    val p0 = ColumnStats.parseCount.get()
    base().queryExecution.executedPlan // full planning, no execution needed
    assert(ColumnStats.parseCount.get() == p0,
      "no-filter planning must not parse any stats line")

    // a range filter parses stats but never base64-decodes a bloom
    Manifest.clearReadCache()
    val d0 = FileBloom.deserCount.get()
    base().filter($"score" > 50.0).queryExecution.executedPlan
    assert(ColumnStats.parseCount.get() > p0, "range filter consults stats")
    assert(FileBloom.deserCount.get() == d0,
      "range predicates must not decode blooms")

    // an IN probe on the bloom'd column decodes each file's bloom ONCE,
    // not once per probed value
    Manifest.clearReadCache()
    val d1 = FileBloom.deserCount.get()
    base().filter($"id".isin(7L, 8L, 9L, 10L, 11L)).queryExecution.executedPlan
    val decoded = FileBloom.deserCount.get() - d1
    assert(decoded > 0 && decoded <= 3,
      s"5-value IN over 3 files decoded $decoded blooms (want ≤3, one per file)")
  }

  test("planning latency over a 10,000-file manifest stays metadata-cheap") {
    val dir = Files.createTempDirectory("graft_manifest_10k_")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.DoubleType)))
    // synthetic manifest: 10k entries with realistic stats lines incl. a
    // bloom section (~2.7 KB base64 each). Planning never opens data
    // files, so the entries may point at absent files.
    val b = new FileBloom.Builder
    (0 until 200).foreach(i => b.add(FileBloom.hashLong(i.toLong)))
    val bloom = b.result().get
    val entries = (0 until 10000).map { i =>
      val lo = i * 100L; val hi = lo + 99L
      ManifestFile.raw(f"part-$i%05d.tsv", 100L,
        s"id=$lo,$hi;score=$lo.5,$hi.5%id=$bloom", schema.length)
    }
    Manifest.write(dir, Manifest(schema, entries))

    def planMillis(f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Long = {
      val t0 = System.nanoTime()
      f(spark.read.format(Fmt).option("path", dir.toString).load())
        .queryExecution.executedPlan
      (System.nanoTime() - t0) / 1000000
    }
    // warm once (session/codegen init), then pin with the manifest cache
    // DROPPED before each measurement — the pin is about a cold plan's
    // parse cost, and the bound is generous for this VM's jitter; a
    // regression to eager per-plan bloom splitting (10k × 2.7 KB) or
    // per-value decode blows far past it.
    planMillis(identity)
    Manifest.clearReadCache()
    val noFilter = planMillis(identity)
    Manifest.clearReadCache()
    val ranged = planMillis(_.filter($"score" > 999999.0))
    Manifest.clearReadCache()
    val probed = planMillis(_.filter($"id" === 123456L))
    assert(noFilter < 2000, s"no-filter planning took $noFilter ms over 10k files")
    assert(ranged < 4000, s"range-filter planning took $ranged ms over 10k files")
    assert(probed < 4000, s"bloom-probe planning took $probed ms over 10k files")
  }
}
