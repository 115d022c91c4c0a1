package graft.plans

import java.nio.file.Files

import graft.SparkSuite

/** Transparent MV rewriting: a query whose plan equals a registered MV's
  * definition is answered from the stored result — and ONLY while the MV
  * is fresh (its recorded source version is the source's current one). */
class MvRewriteSpec extends SparkSuite {
  import spark.implicits._

  private lazy val rootDir = {
    val d = Files.createTempDirectory("graft_mvr_").toString
    spark.conf.set("spark.sql.catalog.graftmvr", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftmvr.root", d)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftmvr.q")
    d
  }

  private val Q =
    "SELECT source, count(*) AS n, sum(n_chars) AS sc FROM graftmvr.q.docs GROUP BY source"

  private def plansFromMv(sql: String): Boolean =
    spark.sql(sql).queryExecution.optimizedPlan.toString.contains("q.mv")

  test("an equal query is answered from the MV; staleness and mismatch are not") {
    rootDir
    spark.sql("CREATE TABLE graftmvr.q.docs (doc_id BIGINT, source STRING, n_chars BIGINT)")
    (1L to 300L).map(i => (i, s"s${i % 5}", i * 3L)).toDF("doc_id", "source", "n_chars")
      .writeTo("graftmvr.q.docs").append()
    spark.sql(s"CREATE MATERIALIZED VIEW graftmvr.q.mv AS $Q")
    val expected = spark.sql(Q).collect().toSet
    MvRewrite.register(spark, "graftmvr.q.mv")
    try {
      // the SAME query (even spelled differently) now scans the MV
      assert(plansFromMv(Q), "equal query must plan from the stored MV")
      assert(plansFromMv(
        """SELECT source, count(*) AS cnt, sum(n_chars) AS total
          |FROM graftmvr.q.docs GROUP BY source""".stripMargin),
        "alias spelling must not defeat the match (canonicalized compare)")
      assert(spark.sql(Q).collect().toSet == expected)
      // an aggregate SUBSET of the MV's outputs rolls up from it (the
      // rollup tier — same keys are a subset of themselves) and matches
      val sub = "SELECT source, count(*) AS n FROM graftmvr.q.docs GROUP BY source"
      assert(plansFromMv(sub), "an output-subset aggregate must fold from the MV")
      assert(spark.sql(sub).collect().toSet ==
        expected.map(r => org.apache.spark.sql.Row(r.getString(0), r.getLong(1))))
      // a genuinely DIFFERENT query is untouched: un-stored aggregate...
      assert(!plansFromMv(
        "SELECT source, min(doc_id) AS m FROM graftmvr.q.docs GROUP BY source"))
      // ...or a different input (filter below the aggregate)
      assert(!plansFromMv(
        s"SELECT source, count(*) AS n, sum(n_chars) AS sc " +
          "FROM graftmvr.q.docs WHERE n_chars > 10 GROUP BY source"))
      // and the MV composes as a SUBTREE of a bigger query
      val top = spark.sql(s"SELECT max(sc) AS m FROM ($Q)")
      assert(top.queryExecution.optimizedPlan.toString.contains("q.mv"))
      assert(top.head().getLong(0) ==
        expected.map(_.getLong(2)).max)

      // STALENESS GUARD: a new source commit makes the MV stale — the
      // query silently recomputes from the source (fresh answer, no MV)
      (301L to 310L).map(i => (i, "s0", 1L)).toDF("doc_id", "source", "n_chars")
        .writeTo("graftmvr.q.docs").append()
      assert(!plansFromMv(Q), "a stale MV must never answer a query")
      val freshExpected = spark.sql(Q).collect().toSet
      assert(freshExpected != expected)
      // REFRESH restores freshness and the rewrite resumes
      spark.sql("REFRESH MATERIALIZED VIEW graftmvr.q.mv")
      assert(plansFromMv(Q), "a refreshed MV must answer again")
      assert(spark.sql(Q).collect().toSet == freshExpected)
    } finally MvRewrite.unregister("graftmvr.q.mv")
    // unregistered: back to the source
    assert(!plansFromMv(Q))
  }

  test("rollup rewrite: a coarser GROUP BY re-aggregates the stored MV") {
    rootDir
    spark.sql("CREATE TABLE graftmvr.q.ev (k STRING, d STRING, n BIGINT, v BIGINT)")
    (1L to 400L).map(i => (s"k${i % 4}", s"d${i % 10}", i, i * 2L))
      .toDF("k", "d", "n", "v").writeTo("graftmvr.q.ev").append()
    // fine-grain MV: keys (k, d), all four fold families + the AVG inputs
    val mvQ = """SELECT k, d, count(*) AS cnt, sum(v) AS sv, min(n) AS mn,
                |  max(n) AS mx, sum(n) AS sn, count(n) AS cn
                |FROM graftmvr.q.ev GROUP BY k, d""".stripMargin
    spark.sql(s"CREATE MATERIALIZED VIEW graftmvr.q.mvr AS $mvQ")
    MvRewrite.register(spark, "graftmvr.q.mvr")
    try {
      // coarser grain (k only): every aggregate folds from the MV
      val roll = """SELECT k, count(*) AS c, sum(v) AS s, min(n) AS lo,
                   |  max(n) AS hi, avg(n) AS an
                   |FROM graftmvr.q.ev GROUP BY k""".stripMargin
      val expected = {
        MvRewrite.unregister("graftmvr.q.mvr")
        try spark.sql(roll).collect().toSet
        finally MvRewrite.register(spark, "graftmvr.q.mvr")
      }
      assert(plansFromMv(roll), "subset GROUP BY must roll up from the MV")
      assert(spark.sql(roll).collect().toSet == expected)
      // and the rolled-up plan no longer reads the source table
      assert(!spark.sql(roll).queryExecution.optimizedPlan.toString
        .contains("q.ev"), "rollup must not scan the source")

      // the global grain is NOT rolled up (empty GROUP BY has the
      // empty-input row-count edge); it recomputes and stays correct
      val global = "SELECT count(*) AS c FROM graftmvr.q.ev"
      assert(!plansFromMv(global))

      // a KEY-ONLY WHERE composes with the rollup: the predicate is
      // constant per fine-grain group, so it filters MV rows pre-fold
      val filtered = """SELECT d, count(*) AS c, sum(v) AS s
                       |FROM graftmvr.q.ev WHERE k IN ('k1', 'k3')
                       |GROUP BY d""".stripMargin
      val filteredExpected = {
        MvRewrite.unregister("graftmvr.q.mvr")
        try spark.sql(filtered).collect().toSet
        finally MvRewrite.register(spark, "graftmvr.q.mvr")
      }
      assert(plansFromMv(filtered), "a key-only WHERE must roll up from the MV")
      assert(!spark.sql(filtered).queryExecution.optimizedPlan.toString
        .contains("q.ev"))
      assert(spark.sql(filtered).collect().toSet == filteredExpected)

      // non-subset keys (d not needed — n is no MV key) are untouched
      assert(!plansFromMv(
        "SELECT n, count(*) AS c FROM graftmvr.q.ev GROUP BY n"))
      // non-decomposable aggregates are untouched (no sum(v*v) stored)
      assert(!plansFromMv(
        "SELECT k, sum(v * v) AS s2 FROM graftmvr.q.ev GROUP BY k"))
      // a different source (filter) is untouched
      assert(!plansFromMv(
        "SELECT k, sum(v) AS s FROM graftmvr.q.ev WHERE n > 10 GROUP BY k"))

      // freshness guards the rollup too: append → stale → recompute
      Seq(("k1", "d3", 1000L, 1L)).toDF("k", "d", "n", "v")
        .writeTo("graftmvr.q.ev").append()
      assert(!plansFromMv(roll), "a stale MV must not serve rollups")
      val freshExpected = spark.sql(roll).collect().toSet
      assert(freshExpected != expected)
      spark.sql("REFRESH MATERIALIZED VIEW graftmvr.q.mvr")
      assert(plansFromMv(roll))
      assert(spark.sql(roll).collect().toSet == freshExpected)
    } finally MvRewrite.unregister("graftmvr.q.mvr")
  }

  test("rollup over a JOIN MV: the fine-grain fact⋈dim MV answers the " +
    "coarse grain; staleness and non-subset stay untouched") {
    rootDir
    spark.sql("CREATE TABLE graftmvr.q.jf (k STRING, v BIGINT)")
    spark.sql("CREATE TABLE graftmvr.q.jd (k STRING, grp STRING, sub STRING)")
    Seq(("a", "g1", "x"), ("b", "g2", "y"), ("c", "g1", "z"))
      .toDF("k", "grp", "sub").writeTo("graftmvr.q.jd").append()
    (1L to 300L).map(i => (s"${('a' + (i % 3).toInt).toChar}", i * 2L))
      .toDF("k", "v").writeTo("graftmvr.q.jf").append()
    // fine-grain JOIN MV: keys (grp, sub) over fact⋈dim
    val mvQ = """SELECT grp, sub, count(*) AS cnt, sum(v) AS sv, max(v) AS mx
                |FROM graftmvr.q.jf JOIN graftmvr.q.jd USING (k)
                |GROUP BY grp, sub""".stripMargin
    spark.sql(s"CREATE MATERIALIZED VIEW graftmvr.q.mvjr AS $mvQ")
    MvRewrite.register(spark, "graftmvr.q.mvjr")
    try {
      // the coarse grain folds from the stored join result — the C142
      // (canonically-equal inner-join input) admission composing with the
      // C143 grain-subset matcher
      val roll = """SELECT grp, count(*) AS c, sum(v) AS s, max(v) AS hi
                   |FROM graftmvr.q.jf JOIN graftmvr.q.jd USING (k)
                   |GROUP BY grp""".stripMargin
      val expected = {
        MvRewrite.unregister("graftmvr.q.mvjr")
        try spark.sql(roll).collect().toSet
        finally MvRewrite.register(spark, "graftmvr.q.mvjr")
      }
      assert(plansFromMv(roll), "join rollup must plan from the stored MV")
      assert(!spark.sql(roll).queryExecution.optimizedPlan.toString.contains("q.jf"),
        "join rollup must not rescan the fact")
      assert(spark.sql(roll).collect().toSet == expected)
      // non-subset: grouping by a non-key aborts the rollup
      assert(!plansFromMv(
        """SELECT k, count(*) AS c FROM graftmvr.q.jf JOIN graftmvr.q.jd
          |USING (k) GROUP BY k""".stripMargin))
      // a DIFFERENT join input (filtered fact) is untouched
      assert(!plansFromMv(
        """SELECT grp, count(*) AS c FROM graftmvr.q.jf JOIN graftmvr.q.jd
          |USING (k) WHERE v > 100 GROUP BY grp""".stripMargin))
      // staleness: EITHER side moving kills the rewrite (dim append here)
      Seq(("d", "g2", "w")).toDF("k", "grp", "sub")
        .writeTo("graftmvr.q.jd").append()
      assert(!plansFromMv(roll), "a stale join MV must not serve rollups")
      assert(spark.sql(roll).collect().toSet == expected) // d matches no fact
      spark.sql("REFRESH MATERIALIZED VIEW graftmvr.q.mvjr")
      assert(plansFromMv(roll), "a refreshed join MV must serve again")
      assert(spark.sql(roll).collect().toSet == expected)
    } finally MvRewrite.unregister("graftmvr.q.mvjr")
  }

  test("re-registration and equal-definition MVs don't poison the registry") {
    rootDir
    spark.sql("CREATE TABLE graftmvr.q.docs2 (doc_id BIGINT, source STRING, n_chars BIGINT)")
    (1L to 100L).map(i => (i, s"s${i % 3}", i)).toDF("doc_id", "source", "n_chars")
      .writeTo("graftmvr.q.docs2").append()
    val q = "SELECT source, count(*) AS n FROM graftmvr.q.docs2 GROUP BY source"
    spark.sql(s"CREATE MATERIALIZED VIEW graftmvr.q.mv2 AS $q")
    val expected = spark.sql(q).collect().toSet
    MvRewrite.register(spark, "graftmvr.q.mv2")
    try {
      assert(plansFromMv(q))
      // RE-registering a fresh, registered MV analyzes its own definition
      // while the rule is live: without the reentrancy guard the stored
      // defn would itself be substituted, and user queries would stop
      // matching canonically from then on
      MvRewrite.register(spark, "graftmvr.q.mv2")
      assert(plansFromMv(q),
        "re-registration must not substitute the MV into its own stored defn")
      assert(spark.sql(q).collect().toSet == expected)

      // a SECOND MV with the SAME definition: registration must capture the
      // raw source plan, not a rewrite through mv2
      spark.sql(s"CREATE MATERIALIZED VIEW graftmvr.q.mv2b AS $q")
      MvRewrite.register(spark, "graftmvr.q.mv2b")
      try {
        val plan = spark.sql(q).queryExecution.optimizedPlan.toString
        assert(plan.contains("q.mv2"), s"query must still plan from an MV:\n$plan")
        assert(spark.sql(q).collect().toSet == expected)
      } finally MvRewrite.unregister("graftmvr.q.mv2b")
    } finally MvRewrite.unregister("graftmvr.q.mv2")
  }
}
