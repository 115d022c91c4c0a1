package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSuite, SparkEntry, Tables}

/** Property tests for the analytics / split / survivorship / kNN surface —
  * invariants a correct implementation must satisfy independently of the
  * DuckDB oracle (which certifies exact values at sf0.01). */
class AnalyticsSpec extends SparkSuite {

  test("funnel step counts are monotonically non-increasing") {
    val r = SparkEntry.queries("q_funnel")(spark, sfDir).head()
    val (s1, s2, s3) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(s1 >= s2 && s2 >= s3, s"funnel not monotone: $s1, $s2, $s3")
    assert(s1 > 0, "no users completed step 1 — degenerate testdata")
  }

  test("cohort retention: offset-0 cell exists per cohort and dominates") {
    val rows = SparkEntry.queries("q_cohort_retention")(spark, sfDir).collect()
    val byCohort = rows.groupBy(_.getInt(0))
    byCohort.foreach { case (cohort, rs) =>
      val at0 = rs.find(_.getInt(1) == 0)
      assert(at0.isDefined, s"cohort $cohort missing offset-0 row")
      val n0 = at0.get.getLong(2)
      rs.foreach { r =>
        assert(r.getLong(2) <= n0,
          s"cohort $cohort offset ${r.getInt(1)}: ${r.getLong(2)} > offset-0 $n0")
      }
    }
  }

  test("argmax matches independent per-segment max/min of the value column") {
    val got = SparkEntry.queries("q_agg_argmax")(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(3)))).toMap
    val exp = Tables(spark, sfDir, "customer")
      .groupBy("c_mktsegment")
      .agg(max("c_acctbal").as("hi"), min("c_acctbal").as("lo"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got == exp)
  }

  test("interval overlap peak matches a driver-side sweep over the same sessions") {
    val r = SparkEntry.queries("q_interval_overlap")(spark, sfDir).head()
    val (nSessions, peak) = (r.getLong(0), r.getLong(1))
    // independent reference: sessionize in Scala from the raw events
    val evs = Tables(spark, sfDir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val gap = 1800L * 1000000L
    val sessions = evs.groupBy(_._1).values.flatMap { es =>
      val sorted = es.map(e => (e._2, e._3)).sortBy(identity)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var (s0, e0) = (sorted.head._1, sorted.head._1)
      sorted.tail.foreach { case (t, _) =>
        if (t - e0 > gap) { out += ((s0, e0)); s0 = t }
        e0 = t
      }
      out += ((s0, e0))
      out
    }.toSeq
    assert(sessions.size.toLong == nSessions)
    val pts = sessions.flatMap { case (s, e) => Seq((s, 1), (e + 1, -1)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    var (cur, best) = (0L, 0L)
    pts.foreach { case (_, d) => cur += d; best = math.max(best, cur) }
    assert(best == peak, s"driver sweep peak $best != query peak $peak")
  }

  test("split assignment is per-doc stable: independent of which other docs exist") {
    val bucket = pmod(col("doc_id") * lit(2654435761L), lit(100L))
    val split = when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    val full = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), split.as("s")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val half = Tables(spark, sfDir, "documents")
      .filter(pmod(col("doc_id"), lit(2)) === 0)
      .select(col("doc_id"), split.as("s")).collect()
    half.foreach { r =>
      assert(full(r.getLong(0)) == r.getString(1), s"doc ${r.getLong(0)} moved split")
    }
    // and the three splits are all non-empty at the 80/10/10 thresholds
    assert(full.values.toSet == Set("train", "val", "test"))
  }

  test("survivor: exactly one canonical per cluster, with max length, min id on ties") {
    val rows = SparkEntry.queries("q_dedup_survivor")(spark, sfDir).collect()
    val chars = Tables(spark, sfDir, "documents").select("doc_id", "n_chars")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getLong(1)).foreach { case (cl, rs) =>
      val canon = rs.filter(_.getInt(4) == 1)
      assert(canon.length == 1, s"cluster $cl has ${canon.length} canonicals")
      val cid = canon.head.getLong(0)
      assert(rs.forall(_.getLong(3) == cid), s"cluster $cl disagrees on canonical")
      assert(rs.forall(_.getLong(2) == rs.length), s"cluster $cl size mismatch")
      val maxChars = rs.map(r => chars(r.getLong(0))).max
      assert(chars(cid) == maxChars, s"cluster $cl canonical not longest")
      val tied = rs.map(_.getLong(0)).filter(id => chars(id) == maxChars)
      assert(cid == tied.min, s"cluster $cl tie not broken by min doc_id")
    }
  }

  test("kNN graph: neighbors stay in their IVF list, ranks dense, sims non-increasing") {
    // brute-force within-list equivalence lives in SimilaritySpec; here:
    // structural invariants of the declared output
    val rows = SparkEntry.queries("q_knn_graph")(spark, sfDir).collect()
    rows.groupBy(_.getLong(1)).foreach { case (src, rs) =>
      val sorted = rs.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq == (1 to sorted.length),
        s"src $src ranks not dense")
      assert(sorted.length <= 3 && sorted.nonEmpty)
      assert(sorted.map(_.getInt(0)).distinct.length == 1,
        s"src $src reported under multiple IVF lists")
      sorted.foreach(r => assert(r.getLong(2) != src, s"src $src is its own neighbor"))
      val sims = sorted.map(_.getDouble(4))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b },
        s"src $src sims not non-increasing")
    }
  }

  test("recursive tree: heap levels have 2^d nodes starting at key 2^d - 1") {
    val rows = SparkEntry.queries("q_recursive_tree")(spark, sfDir).collect()
    val n = Tables(spark, sfDir, "customer").count()
    // depth is capped at 7 → the walk covers the first min(n, 2^8 − 1) keys
    assert(rows.map(_.getLong(1)).sum == math.min(n, 255L), "recursion lost nodes")
    rows.sortBy(_.getInt(0)).dropRight(1).foreach { r => // full levels
      val d = r.getInt(0)
      assert(r.getLong(1) == (1L << d), s"depth $d has ${r.getLong(1)} nodes")
      assert(r.getLong(2) == (1L << d) - 1, s"depth $d min key ${r.getLong(2)}")
    }
  }

  test("feature hash: bucket counts partition the token count") {
    val df = SparkEntry.queries("q_feature_hash")(spark, sfDir)
    val bad = df.filter(
      (2 until 18).map(i => col(df.columns(i))).reduce(_ + _) =!= col("n_tok"))
    assert(bad.count() == 0, "bucket counts don't sum to n_tok")
  }

  test("attribution: every purchase credited exactly once, to a valid channel") {
    val rows = SparkEntry.queries("q_attribution")(spark, sfDir).collect()
    val valid = Set("ch0", "ch1", "ch2", "ch3", "direct")
    assert(rows.forall(r => valid(r.getString(0))), "unexpected channel label")
    val nPurchases = Tables(spark, sfDir, "events")
      .filter(col("event_type") === "purchase").count()
    assert(rows.map(_.getLong(1)).sum == nPurchases,
      "attributed purchase count != total purchases")
    // driver-side independent last-touch replay over the raw event stream
    val evs = Tables(spark, sfDir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        col("event_type"), get_json_object(col("props"), "$.k").cast("int").as("k"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getInt(4)))
    val expected = evs.groupBy(_._1).values.flatMap { es =>
      var last: String = null
      es.sortBy(e => (e._2, e._3)).flatMap {
        case (_, _, _, "click", k) => last = s"ch${k % 4}"; None
        case (_, _, _, "purchase", _) => Some(Option(last).getOrElse("direct"))
        case _ => None
      }
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected, s"per-channel counts diverge: $got vs $expected")
  }

  test("seq pattern: converted flag agrees with an ordered driver-side scan") {
    val rows = SparkEntry.queries("q_seq_pattern")(spark, sfDir).collect()
    val evs = Tables(spark, sfDir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.map(_.getLong(1)).sum == evs.length, "n_events doesn't cover all events")
    val byUser = evs.groupBy(_._1).view
      .mapValues(_.sortBy(e => (e._2, e._3)).map(_._4).toSeq).toMap
    rows.foreach { r =>
      val types = byUser(r.getLong(0))
      val conv = types.zipWithIndex.exists { case (t, i) =>
        t == "click" && types.drop(i + 1).contains("purchase")
      }
      assert(r.getBoolean(2) == conv, s"user ${r.getLong(0)} converted flag wrong")
      val errRepeat = types.count(_ == "error") >= 2
      assert(r.getBoolean(3) == errRepeat, s"user ${r.getLong(0)} error_repeat wrong")
    }
  }

  test("gap detect: reported cells are truly empty and the count closes") {
    val missing = SparkEntry.queries("q_gap_detect")(spark, sfDir)
    val observed = Tables(spark, sfDir, "events")
      .select(col("event_type"), date_trunc("hour", col("ts")).as("hour_ts"))
      .distinct()
    assert(missing.join(observed, Seq("event_type", "hour_ts")).count() == 0,
      "a reported gap cell has events")
    val Array(nTypes, nHours) = Tables(spark, sfDir, "events")
      .agg(countDistinct("event_type"),
        (floor(unix_micros(max(col("ts"))) / 3600000000L) -
          floor(unix_micros(min(col("ts"))) / 3600000000L) + 1))
      .collect().map(r => (r.getLong(0), r.getLong(1))).flatMap(t => Seq(t._1, t._2))
    assert(missing.count() + observed.count() == nTypes * nHours,
      "missing + observed cells != full grid")
  }

  test("skyline: single-pass window frontier equals brute-force Pareto dominance") {
    val got = SparkEntry.queries("q_skyline")(spark, sfDir).collect()
      .map(r => (r.getDate(0).toString, r.getDouble(1))).toSet
    val pts = Tables(spark, sfDir, "orders")
      .select(to_date(col("o_orderdate")).as("d"), col("o_totalprice"))
      .collect().map(r => (r.getDate(0), r.getDouble(1)))
    val byDay = pts.groupBy(_._1).view.mapValues(_.map(_._2).min).toSeq
    // quadratic dominance definition: on the frontier iff no strictly more
    // recent day is as cheap or cheaper
    val frontier = byDay.filter { case (d, p) =>
      !byDay.exists { case (d2, p2) => d2.after(d) && p2 <= p }
    }.map { case (d, p) => (d.toString, p) }.toSet
    assert(got == frontier, s"frontier mismatch: $got vs $frontier")
    assert(got.nonEmpty && got.size < byDay.size, "degenerate frontier")
  }

  test("skyline3: anti-join frontier equals brute-force 3-objective dominance") {
    val got = SparkEntry.queries("q_skyline3")(spark, sfDir).collect()
      .map(r => (r.getDate(0).toString, r.getDouble(1), r.getLong(2))).toSet
    val byDay = Tables(spark, sfDir, "orders")
      .select(to_date(col("o_orderdate")).as("d"), col("o_totalprice"))
      .collect().map(r => (r.getDate(0), r.getDouble(1)))
      .groupBy(_._1).view
      .mapValues(v => (v.map(_._2).min, v.size.toLong)).toSeq
      .map { case (d, (p, n)) => (d, p, n) }
    // quadratic dominance: (recency MAX, price MIN, volume MAX), at least
    // one strict
    val frontier = byDay.filter { case (d, p, n) =>
      !byDay.exists { case (d2, p2, n2) =>
        !d2.before(d) && p2 <= p && n2 >= n &&
          (d2.after(d) || p2 < p || n2 > n)
      }
    }.map { case (d, p, n) => (d.toString, p, n) }.toSet
    assert(got == frontier, s"frontier mismatch: $got vs $frontier")
    assert(got.nonEmpty && got.size < byDay.size, "degenerate frontier")
    // 3-objective frontier strictly contains the 2-objective one: adding an
    // objective can only admit more Pareto-optimal points
    val sky2 = SparkEntry.queries("q_skyline")(spark, sfDir).collect()
      .map(r => (r.getDate(0).toString, r.getDouble(1))).toSet
    assert(sky2.forall { case (d, p) => got.exists(g => g._1 == d && g._2 == p) },
      "2-objective frontier point missing from the 3-objective frontier")
  }

  test("target encoding shrinks each category mean toward the global mean") {
    val rows = SparkEntry.queries("q_feature_target_encode")(spark, sfDir).collect()
    val data = Tables(spark, sfDir, "orders")
      .select(col("o_orderpriority"), col("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val gMean = data.map(_._2).sum / data.length
    rows.foreach { r =>
      val xs = data.filter(_._1 == r.getString(0)).map(_._2)
      val cMean = xs.sum / xs.length
      val enc = r.getDouble(2)
      val (lo, hi) = (math.min(cMean, gMean), math.max(cMean, gMean))
      assert(enc >= lo - 1e-6 && enc <= hi + 1e-6,
        s"${r.getString(0)}: enc $enc outside [$lo, $hi]")
      // with n >> M the encoding stays near the category mean
      assert(math.abs(enc - cMean) < math.abs(cMean - gMean) + 1e-6)
    }
  }

  test("OLS closed form tracks a naive double-precision fit to 1e-9 relative") {
    val rows = SparkEntry.queries("q_regr_ols")(spark, sfDir).collect()
    val data = Tables(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    rows.foreach { r =>
      val xs = data.filter(_._1 == r.getString(0))
      val n = xs.length.toDouble
      val (sx, sy) = (xs.map(_._2).sum, xs.map(_._3).sum)
      val sxx = xs.map(v => v._2 * v._2).sum
      val sxy = xs.map(v => v._2 * v._3).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val icept = (sy - slope * sx) / n
      assert(math.abs(r.getDouble(2) - slope) <= 1e-9 * math.abs(slope),
        s"${r.getString(0)} slope ${r.getDouble(2)} vs naive $slope")
      assert(math.abs(r.getDouble(3) - icept) <= 1e-9 * math.abs(icept),
        s"${r.getString(0)} intercept ${r.getDouble(3)} vs naive $icept")
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0, "r2 out of [0,1]")
    }
  }

  test("PIT join: freshness honors the 7-day validity window") {
    val rows = SparkEntry.queries("q_join_pit")(spark, sfDir).collect()
    val evs = Tables(spark, sfDir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val valid = 7L * 86400L * 1000000L
    val byUser = evs.groupBy(_._1).view.mapValues(_.sortBy(e => (e._2, e._3))).toMap
    rows.foreach { r =>
      val clicks = byUser(r.getLong(1))
      // replay: the last signup/purchase at or before this click
      val click = clicks.find(_._3 == r.getLong(0)).get
      val upd = clicks.takeWhile(e =>
          e._2 < click._2 || (e._2 == click._2 && e._3 <= click._3))
        .filter(e => e._4 == "signup" || e._4 == "purchase").lastOption
      val fresh = upd.exists(u => click._2 - u._2 <= valid)
      assert(r.getBoolean(3) == fresh, s"event ${r.getLong(0)} freshness wrong")
      if (fresh) assert(r.getDouble(2) == upd.get._5,
        s"event ${r.getLong(0)} carried wrong profile value")
      else assert(r.isNullAt(2), s"event ${r.getLong(0)} stale but non-null")
    }
    // the 7-day expiry actually bites on this data: both outcomes occur
    assert(rows.exists(_.getBoolean(3)) && rows.exists(!_.getBoolean(3)))
  }

  test("windowed dedup: kept = first of each burst; drops are within-gap repeats") {
    val rows = SparkEntry.queries("q_dedup_windowed")(spark, sfDir).collect()
    val ts = Tables(spark, sfDir, "events")
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gap = 1800L * 1000000L
    rows.groupBy(r => (r.getLong(1), r.getString(2))).foreach { case (_, rs) =>
      val ordered = rs.sortBy(r => (ts(r.getLong(0)), r.getLong(0)))
      var prevUs = Long.MinValue / 2
      ordered.foreach { r =>
        val us = ts(r.getLong(0))
        val expectKept = us - prevUs > gap
        assert(r.getBoolean(3) == expectKept,
          s"event ${r.getLong(0)} kept=${r.getBoolean(3)}, expected $expectKept")
        prevUs = us // gap measured to the previous OCCURRENCE (burst chain)
      }
    }
    assert(rows.exists(!_.getBoolean(3)), "no duplicates suppressed — degenerate data")
  }

  test("typed flatMapGroups sessionization ≡ declarative window sessionization") {
    val typed = SparkEntry.queries("q_typed_sessions")(spark, sfDir).collect()
    val sql = SparkEntry.queries("q_sessionize")(spark, sfDir).collect()
    assert(typed.length == sql.length)
    typed.zip(sql).foreach { case (t, s) =>
      assert(t.toSeq == s.toSeq, s"typed row $t != declarative row $s")
    }
  }

  test("moving median tracks a driver-side trailing-window replay") {
    val got = SparkEntry.queries("q_window_median")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val evs = Tables(spark, sfDir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    evs.groupBy(_._1).values.foreach { es =>
      val ordered = es.sortBy(e => (e._2, e._3))
      ordered.indices.foreach { i =>
        val win = ordered.slice(math.max(0, i - 10), i + 1).map(_._4).toSeq
        val exp = median(win)
        val act = got(ordered(i)._3)
        assert(math.abs(act - exp) < 1e-9,
          s"event ${ordered(i)._3}: median $act vs replay $exp")
      }
    }
  }

  test("MAD outliers: thresholds from medians, outlier count matches a replay") {
    val rows = SparkEntry.queries("q_anomaly_mad")(spark, sfDir).collect()
    val vals = Tables(spark, sfDir, "events")
      .select(col("event_type"), col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    rows.foreach { r =>
      val xs = vals.filter(_._1 == r.getString(0)).map(_._2).toSeq
      assert(r.getLong(1) == xs.length)
      val med = median(xs)
      val devs = xs.map(v => math.abs(v - med))
      val mad = median(devs)
      assert(math.abs(r.getDouble(2) - med) < 1e-9, s"median mismatch for ${r.getString(0)}")
      assert(math.abs(r.getDouble(3) - mad) < 1e-9, s"MAD mismatch for ${r.getString(0)}")
      assert(r.getLong(4) == devs.count(_ > 3.0 * r.getDouble(3)),
        s"outlier count mismatch for ${r.getString(0)}")
      assert(r.getLong(4) < r.getLong(1), "all rows flagged outliers")
    }
  }
}
