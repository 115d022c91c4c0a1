package graft.plans

import java.nio.file.{Files, Paths}

import graft.SparkSuite
import graft.sources.Manifest

/** Materialized views over manifest tables: CREATE stores the pinned query
  * result; REFRESH is INCREMENTAL (delta aggregate + partial merge) for
  * decomposable aggregates over append-only windows, and falls back to a
  * full recompute — never a wrong answer — everywhere else. */
class MaterializedViewSpec extends SparkSuite {
  import spark.implicits._

  private lazy val rootDir = {
    val d = Files.createTempDirectory("graft_mv_").toString
    spark.conf.set("spark.sql.catalog.graftmv", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftmv.root", d)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftmv.q")
    d
  }

  private def recompute(sql: String): Set[Row] = spark.sql(sql).collect().toSet
  private type Row = org.apache.spark.sql.Row

  test("incremental refresh merges only the added files and matches a recompute") {
    rootDir
    spark.sql("CREATE TABLE graftmv.q.ev (k STRING, n BIGINT, v BIGINT)")
    def batch(rows: Seq[(String, Long, Long)]): Unit =
      rows.toDF("k", "n", "v").coalesce(1).writeTo("graftmv.q.ev").append()
    batch(Seq(("a", 1L, 10L), ("a", 2L, 20L), ("b", 3L, 5L)))

    val q = """SELECT k, count(*) AS cnt, sum(v) AS sv, min(n) AS mn, max(n) AS mx
              |FROM graftmv.q.ev GROUP BY k""".stripMargin
    spark.sql(s"CREATE MATERIALIZED VIEW graftmv.q.mv AS $q")
    assert(spark.table("graftmv.q.mv").collect().toSet ==
      recompute(q.replace("graftmv.q.ev", "graftmv.q.ev")))

    // append a second batch (new keys AND updates to old keys)
    batch(Seq(("a", 0L, 100L), ("c", 9L, 7L)))
    val Array(r) = spark.sql("REFRESH MATERIALIZED VIEW graftmv.q.mv").collect()
    assert(r.getString(0) == "incremental", s"expected incremental, got $r")
    assert(spark.table("graftmv.q.mv").collect().toSet == recompute(q))

    // second refresh with no source change: noop
    val Array(r2) = spark.sql("REFRESH MATERIALIZED VIEW graftmv.q.mv").collect()
    assert(r2.getString(0) == "noop")
  }

  test("a delete in the window forces a FULL refresh that still matches") {
    rootDir
    spark.sql("CREATE TABLE graftmv.q.ev2 (k STRING, v BIGINT)")
    def batch(rows: Seq[(String, Long)]): Unit =
      rows.toDF("k", "v").coalesce(1).writeTo("graftmv.q.ev2").append()
    batch(Seq(("a", 1L), ("a", 2L)))
    batch(Seq(("b", 3L), ("b", 4L)))
    val q = "SELECT k, sum(v) AS sv FROM graftmv.q.ev2 GROUP BY k"
    spark.sql(s"CREATE MATERIALIZED VIEW graftmv.q.mv2 AS $q")

    // drop a whole file (aligned delete) — the old snapshot's entry set is
    // no longer a subset of the current one
    spark.sql("DELETE FROM graftmv.q.ev2 WHERE v <= 2")
    batch(Seq(("c", 9L)))
    val Array(r) = spark.sql("REFRESH MATERIALIZED VIEW graftmv.q.mv2").collect()
    assert(r.getString(0) == "full", s"expected full, got $r")
    assert(spark.table("graftmv.q.mv2").collect().toSet == recompute(q))
  }

  test("non-decomposable queries (AVG) always recompute and stay correct") {
    rootDir
    spark.sql("CREATE TABLE graftmv.q.ev3 (k STRING, v BIGINT)")
    Seq(("a", 10L), ("b", 20L)).toDF("k", "v")
      .writeTo("graftmv.q.ev3").append()
    val q = "SELECT k, avg(v) AS av FROM graftmv.q.ev3 GROUP BY k"
    spark.sql(s"CREATE MATERIALIZED VIEW graftmv.q.mv3 AS $q")
    Seq(("a", 30L)).toDF("k", "v").writeTo("graftmv.q.ev3").append()
    val Array(r) = spark.sql("REFRESH MATERIALIZED VIEW graftmv.q.mv3").collect()
    assert(r.getString(0) == "full")
    assert(spark.table("graftmv.q.mv3").collect().toSet == recompute(q))
  }

  test("the MV is self-describing and survives filters and grouping expressions") {
    rootDir
    spark.sql("CREATE TABLE graftmv.q.ev4 (k STRING, ts TIMESTAMP, v BIGINT)")
    def batch(rows: Seq[(String, String, Long)]): Unit =
      rows.map { case (k, t, v) => (k, java.sql.Timestamp.valueOf(t), v) }
        .toDF("k", "ts", "v").coalesce(1).writeTo("graftmv.q.ev4").append()
    batch(Seq(("a", "2024-01-03 10:00:00", 5L), ("a", "2024-02-01 10:00:00", 6L)))
    val q = """SELECT k, year(ts) AS y, month(ts) AS m, count(*) AS cnt, sum(v) AS sv
              |FROM graftmv.q.ev4 WHERE v > 0 GROUP BY k, year(ts), month(ts)""".stripMargin
    spark.sql(s"CREATE MATERIALIZED VIEW graftmv.q.mv4 AS $q")
    batch(Seq(("a", "2024-02-10 11:00:00", 7L), ("b", "2024-03-01 00:00:00", -1L)))
    val Array(r) = spark.sql("REFRESH MATERIALIZED VIEW graftmv.q.mv4").collect()
    assert(r.getString(0) == "incremental")
    assert(spark.table("graftmv.q.mv4").collect().toSet == recompute(q))

    // the stored metadata is inspectable engine-side
    val props = Manifest.read(Paths.get(rootDir, "q", "mv4")).get.props
    assert(props.contains(MaterializedView.QueryProp))
    assert(props(MaterializedView.SourceDirProp).endsWith("q/ev4"))
  }

  test("CDF-driven refresh: deletes and updates maintain a COUNT/SUM MV incrementally") {
    rootDir
    spark.sql("CREATE TABLE graftmv.q.cev (k STRING, v BIGINT)")
    def batch(rows: Seq[(String, Long)]): Unit =
      rows.toDF("k", "v").coalesce(1).writeTo("graftmv.q.cev").append()
    batch(Seq(("a", 1L), ("a", 2L), ("b", 3L)))
    batch(Seq(("b", 4L), ("c", 5L)))
    val q = """SELECT k, count(*) AS cnt, sum(v) AS sv
              |FROM graftmv.q.cev GROUP BY k""".stripMargin
    spark.sql(s"CREATE MATERIALIZED VIEW graftmv.q.cmv AS $q")

    // a window with a DELETE, an UPDATE (group-moving), and an append —
    // no append-only window exists, but the change feed replays the exact
    // multiset delta and the IVM fold applies
    spark.sql("DELETE FROM graftmv.q.cev WHERE k = 'c'") // whole group gone
    spark.sql("UPDATE graftmv.q.cev SET k = 'b', v = v + 100 WHERE v = 1")
    batch(Seq(("d", 9L)))
    val Array(r) = spark.sql("REFRESH MATERIALIZED VIEW graftmv.q.cmv").collect()
    assert(r.getString(0) == "incremental", s"expected incremental, got $r")
    assert(spark.table("graftmv.q.cmv").collect().toSet == recompute(q))
    // the fully-deleted group must LEAVE the MV, as a recompute would
    assert(!spark.table("graftmv.q.cmv").collect().exists(_.getString(0) == "c"),
      "fully-deleted group 'c' must disappear from the MV")

    // and a later plain append still refreshes incrementally on top
    batch(Seq(("a", 50L)))
    val Array(r2) = spark.sql("REFRESH MATERIALIZED VIEW graftmv.q.cmv").collect()
    assert(r2.getString(0) == "incremental")
    assert(spark.table("graftmv.q.cmv").collect().toSet == recompute(q))
  }

  test("CDF-driven refresh maintains a fact ⋈ dim MV through a fact DELETE") {
    rootDir
    spark.sql("CREATE TABLE graftmv.q.cfact (k STRING, v BIGINT)")
    spark.sql("CREATE TABLE graftmv.q.cdim (k STRING, grp STRING)")
    Seq(("a", "g1"), ("b", "g1"), ("c", "g2")).toDF("k", "grp")
      .writeTo("graftmv.q.cdim").append()
    Seq(("a", 1L), ("a", 2L), ("b", 3L), ("c", 4L)).toDF("k", "v")
      .coalesce(1).writeTo("graftmv.q.cfact").append()
    val q = """SELECT d.grp, count(*) AS cnt, sum(f.v) AS sv
              |FROM graftmv.q.cfact f JOIN graftmv.q.cdim d ON f.k = d.k
              |GROUP BY d.grp""".stripMargin
    spark.sql(s"CREATE MATERIALIZED VIEW graftmv.q.cjmv AS $q")
    spark.sql("DELETE FROM graftmv.q.cfact WHERE v IN (2, 4)") // g2 vanishes
    val Array(r) = spark.sql("REFRESH MATERIALIZED VIEW graftmv.q.cjmv").collect()
    assert(r.getString(0) == "incremental", s"expected incremental, got $r")
    assert(spark.table("graftmv.q.cjmv").collect().toSet == recompute(q))
    assert(!spark.table("graftmv.q.cjmv").collect().exists(_.getString(0) == "g2"))
  }

  test("CDF refresh refuses MIN/MAX (retraction needs a rescan) and missing COUNT(*)") {
    rootDir
    // count(*) present but a MIN rides along: a delete forces full
    spark.sql("CREATE TABLE graftmv.q.mev (k STRING, v BIGINT)")
    Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("k", "v")
      .coalesce(1).writeTo("graftmv.q.mev").append()
    val q = """SELECT k, count(*) AS cnt, min(v) AS mv
              |FROM graftmv.q.mev GROUP BY k""".stripMargin
    spark.sql(s"CREATE MATERIALIZED VIEW graftmv.q.mmv AS $q")
    spark.sql("DELETE FROM graftmv.q.mev WHERE v = 1")
    val Array(r) = spark.sql("REFRESH MATERIALIZED VIEW graftmv.q.mmv").collect()
    assert(r.getString(0) == "full", s"MIN under retraction must recompute, got $r")
    assert(spark.table("graftmv.q.mmv").collect().toSet == recompute(q))
    // sums only, no count(*): no liveness witness → full
    spark.sql("CREATE TABLE graftmv.q.sev (k STRING, v BIGINT)")
    Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
      .coalesce(1).writeTo("graftmv.q.sev").append()
    val q2 = "SELECT k, sum(v) AS sv FROM graftmv.q.sev GROUP BY k"
    spark.sql(s"CREATE MATERIALIZED VIEW graftmv.q.smv AS $q2")
    spark.sql("DELETE FROM graftmv.q.sev WHERE k = 'a'")
    val Array(r2) = spark.sql("REFRESH MATERIALIZED VIEW graftmv.q.smv").collect()
    assert(r2.getString(0) == "full", s"no COUNT(*) witness must recompute, got $r2")
    assert(spark.table("graftmv.q.smv").collect().toSet == recompute(q2))
  }

  test("CREATE rejects a query that reads no manifest table at all") {
    rootDir
    val df = Seq((1L, "x")).toDF("id", "s")
    df.createOrReplaceTempView("mv_plain")
    val e = intercept[UnsupportedOperationException] {
      spark.sql("CREATE MATERIALIZED VIEW graftmv.q.bad AS SELECT * FROM mv_plain")
    }
    assert(e.getMessage.contains("at least one"))
  }

  test("fact ⋈ dim MV refreshes INCREMENTALLY from appended fact files; a dim change falls back to full") {
    rootDir
    spark.sql("CREATE TABLE graftmv.q.fact (k STRING, v BIGINT)")
    spark.sql("CREATE TABLE graftmv.q.d (k STRING, grp STRING)")
    Seq(("a", "g1"), ("b", "g2"), ("c", "g1")).toDF("k", "grp")
      .coalesce(1).writeTo("graftmv.q.d").append()
    Seq(("a", 1L), ("b", 2L)).toDF("k", "v").coalesce(1)
      .writeTo("graftmv.q.fact").append()
    val q = """SELECT grp, count(*) AS cnt, sum(v) AS sv, max(v) AS mx
              |FROM graftmv.q.fact JOIN graftmv.q.d USING (k)
              |GROUP BY grp""".stripMargin
    spark.sql(s"CREATE MATERIALIZED VIEW graftmv.q.mvfj AS $q")
    assert(spark.table("graftmv.q.mvfj").collect().toSet == recompute(q))

    // append-only fact growth, dim untouched: the refresh must aggregate
    // only the new fact files joined to the pinned dim and fold partials
    Seq(("a", 10L), ("c", 5L)).toDF("k", "v").coalesce(1)
      .writeTo("graftmv.q.fact").append()
    val Array(r1) = spark.sql("REFRESH MATERIALIZED VIEW graftmv.q.mvfj").collect()
    assert(r1.getString(0) == "incremental", s"expected incremental, got $r1")
    assert(spark.table("graftmv.q.mvfj").collect().toSet == recompute(q))

    // noop when neither side moved
    val Array(r2) = spark.sql("REFRESH MATERIALIZED VIEW graftmv.q.mvfj").collect()
    assert(r2.getString(0) == "noop")

    // BOTH sides appended (r10): the inclusion–exclusion expansion
    // Δf⋈D ∪ F⋈Δd ∪ Δf⋈Δd covers every cross term — the new dim row must
    // pick up the OLD fact rows it matches ("d" matches nothing old here,
    // but "g2"-group folding exercises F⋈Δd) and the new fact row joins
    // the new dim row through Δf⋈Δd
    Seq(("d", "g2")).toDF("k", "grp").coalesce(1).writeTo("graftmv.q.d").append()
    Seq(("d", 100L)).toDF("k", "v").coalesce(1).writeTo("graftmv.q.fact").append()
    val Array(r3) = spark.sql("REFRESH MATERIALIZED VIEW graftmv.q.mvfj").collect()
    assert(r3.getString(0) == "incremental", s"expected incremental, got $r3")
    assert(spark.table("graftmv.q.mvfj").collect().toSet == recompute(q))

    // fact-only growth still refreshes incrementally
    Seq(("d", 7L), ("b", 3L)).toDF("k", "v").coalesce(1)
      .writeTo("graftmv.q.fact").append()
    val Array(r4) = spark.sql("REFRESH MATERIALIZED VIEW graftmv.q.mvfj").collect()
    assert(r4.getString(0) == "incremental", s"expected incremental, got $r4")
    assert(spark.table("graftmv.q.mvfj").collect().toSet == recompute(q))
  }

  test("two-source append window: new dim rows re-match OLD fact rows " +
    "through the F⋈Δ cross term") {
    rootDir
    spark.sql("CREATE TABLE graftmv.q.f2 (k STRING, v BIGINT)")
    spark.sql("CREATE TABLE graftmv.q.d2 (k STRING, grp STRING)")
    Seq(("a", "g1")).toDF("k", "grp").coalesce(1).writeTo("graftmv.q.d2").append()
    // "b" has NO dim match at create time
    Seq(("a", 1L), ("b", 2L), ("b", 4L)).toDF("k", "v").coalesce(1)
      .writeTo("graftmv.q.f2").append()
    val q = """SELECT grp, count(*) AS cnt, sum(v) AS sv
              |FROM graftmv.q.f2 JOIN graftmv.q.d2 USING (k)
              |GROUP BY grp""".stripMargin
    spark.sql(s"CREATE MATERIALIZED VIEW graftmv.q.mv2s AS $q")
    assert(spark.table("graftmv.q.mv2s").collect().toSet == recompute(q))
    // the new dim row RESURRECTS the old unmatched fact rows (F⋈Δd), the
    // new fact rows join old and new dims (Δf⋈D, Δf⋈Δd) — a delta missing
    // any term diverges from the recompute
    Seq(("b", "g2"), ("c", "g1")).toDF("k", "grp").coalesce(1)
      .writeTo("graftmv.q.d2").append()
    Seq(("a", 10L), ("b", 20L), ("c", 30L)).toDF("k", "v").coalesce(1)
      .writeTo("graftmv.q.f2").append()
    val Array(r) = spark.sql("REFRESH MATERIALIZED VIEW graftmv.q.mv2s").collect()
    assert(r.getString(0) == "incremental", s"expected incremental, got $r")
    assert(spark.table("graftmv.q.mv2s").collect().toSet == recompute(q))
    // a rewrite in one window (DELETE) composes with the other side's
    // append through the CDF terms: count(*)+sum only, so the change-feed
    // delta applies and the refresh STAYS incremental — and exact
    spark.sql("DELETE FROM graftmv.q.f2 WHERE k = 'a' AND v = 1")
    Seq(("d", "g2")).toDF("k", "grp").coalesce(1).writeTo("graftmv.q.d2").append()
    val Array(r2) = spark.sql("REFRESH MATERIALIZED VIEW graftmv.q.mv2s").collect()
    assert(r2.getString(0) == "incremental", s"expected incremental, got $r2")
    assert(spark.table("graftmv.q.mv2s").collect().toSet == recompute(q))
  }

  test("an OUTER-join MV always refreshes full (delta is not linear)") {
    rootDir
    spark.sql("CREATE TABLE graftmv.q.fo (k STRING, v BIGINT)")
    spark.sql("CREATE TABLE graftmv.q.do (k STRING, grp STRING)")
    Seq(("a", "g1"), ("z", "g9")).toDF("k", "grp").writeTo("graftmv.q.do").append()
    Seq(("a", 1L)).toDF("k", "v").writeTo("graftmv.q.fo").append()
    // RIGHT join keyed on the dim: an appended fact row can flip a
    // previously-unmatched dim row — delta aggregation would double-count
    val q = """SELECT grp, count(v) AS cnt
              |FROM graftmv.q.fo RIGHT JOIN graftmv.q.do USING (k)
              |GROUP BY grp""".stripMargin
    spark.sql(s"CREATE MATERIALIZED VIEW graftmv.q.mvoj AS $q")
    Seq(("z", 5L)).toDF("k", "v").writeTo("graftmv.q.fo").append()
    val Array(r) = spark.sql("REFRESH MATERIALIZED VIEW graftmv.q.mvoj").collect()
    assert(r.getString(0) == "full", s"outer joins must recompute, got $r")
    assert(spark.table("graftmv.q.mvoj").collect().toSet == recompute(q))
  }

  test("a JOIN materialized view refreshes incrementally when both sides " +
    "append, and stays right") {
    rootDir
    spark.sql("CREATE TABLE graftmv.q.f (k STRING, v BIGINT)")
    spark.sql("CREATE TABLE graftmv.q.dim (k STRING, grp STRING)")
    Seq(("a", 1L), ("b", 2L)).toDF("k", "v").writeTo("graftmv.q.f").append()
    Seq(("a", "g1"), ("b", "g2")).toDF("k", "grp").writeTo("graftmv.q.dim").append()
    val q = """SELECT grp, sum(v) AS sv
              |FROM graftmv.q.f JOIN graftmv.q.dim USING (k) GROUP BY grp""".stripMargin
    spark.sql(s"CREATE MATERIALIZED VIEW graftmv.q.mvj AS $q")
    assert(spark.table("graftmv.q.mvj").collect().toSet == recompute(q))
    // both sides append: the r10 inclusion–exclusion delta fires — and
    // stays right
    Seq(("a", 10L), ("c", 5L)).toDF("k", "v").writeTo("graftmv.q.f").append()
    Seq(("c", "g1")).toDF("k", "grp").writeTo("graftmv.q.dim").append()
    val Array(r) = spark.sql("REFRESH MATERIALIZED VIEW graftmv.q.mvj").collect()
    assert(r.getString(0) == "incremental", s"expected incremental, got $r")
    assert(spark.table("graftmv.q.mvj").collect().toSet == recompute(q))
  }
}
