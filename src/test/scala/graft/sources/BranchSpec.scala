package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSuite

/** Named branches + write-audit-publish: CREATE BRANCH forks the current
  * snapshot metadata-only, writes address `t@b` in isolation from main,
  * FAST FORWARD publishes the branch state as main's next version iff
  * main never advanced, and abandoned branches drop without a trace. */
class BranchSpec extends SparkSuite {
  import spark.implicits._

  private lazy val rootDir = {
    val d = Files.createTempDirectory("graft_br_").toString
    spark.conf.set("spark.sql.catalog.graftbr", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftbr.root", d)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftbr.q")
    d
  }

  test("write-audit-publish round-trip: branch write -> audit -> fast forward -> main serves it") {
    rootDir
    spark.sql("CREATE TABLE graftbr.q.t (id BIGINT, v DOUBLE)")
    (1L to 100L).map(i => (i, i * 1.0)).toDF("id", "v").coalesce(1)
      .writeTo("graftbr.q.t").append()
    val dir = Paths.get(rootDir, "q", "t")

    // fork: metadata-only (no data files under the branch dir)
    spark.sql("ALTER TABLE graftbr.q.t CREATE BRANCH audit")
    val bdir = dir.resolve("_branch_audit")
    assert(Files.exists(bdir.resolve("_manifest")))
    val s0 = Files.list(bdir)
    try assert(!scala.jdk.CollectionConverters.IteratorHasAsScala(s0.iterator())
      .asScala.exists(_.getFileName.toString.startsWith("part-")),
      "branching must copy no data files")
    finally s0.close()

    // WRITE: appends + a row-level op land on the branch only
    (101L to 110L).map(i => (i, 0.0)).toDF("id", "v").coalesce(1)
      .writeTo("graftbr.q.`t@audit`").append()
    spark.sql("UPDATE graftbr.q.`t@audit` SET v = -1.0 WHERE id = 5")
    // AUDIT: the branch sees its writes; main does not
    assert(spark.table("graftbr.q.`t@audit`").count() == 110L)
    assert(spark.sql("SELECT v FROM graftbr.q.`t@audit` WHERE id = 5")
      .head().getDouble(0) == -1.0)
    assert(spark.table("graftbr.q.t").count() == 100L)
    assert(spark.sql("SELECT v FROM graftbr.q.t WHERE id = 5")
      .head().getDouble(0) == 5.0)

    // PUBLISH: main serves the branch state; the ref is spent
    val preSnaps = Manifest.snapshotVersions(dir).length
    spark.sql("ALTER TABLE graftbr.q.t FAST FORWARD BRANCH audit")
    assert(spark.table("graftbr.q.t").count() == 110L)
    assert(spark.sql("SELECT v FROM graftbr.q.t WHERE id = 5")
      .head().getDouble(0) == -1.0)
    assert(!Files.exists(bdir), "published branch must be dropped")
    // published as ONE new main version; pre-publish state time-travels
    assert(Manifest.snapshotVersions(dir).length == preSnaps + 1)
    assert(spark.sql(
      s"SELECT count(*) FROM graftbr.q.t VERSION AS OF ${preSnaps}")
      .head().getLong(0) == 100L)
    // and main's post-publish state is self-contained: files moved home
    assert(Manifest.read(dir).get.entries.forall(e =>
      Files.exists(Manifest.resolveData(Manifest.resolveChain(dir), e.name))))
  }

  test("a diverged main refuses the fast forward; drop abandons the branch cleanly") {
    rootDir
    spark.sql("CREATE TABLE graftbr.q.d (id BIGINT, v DOUBLE)")
    (1L to 50L).map(i => (i, i * 1.0)).toDF("id", "v").coalesce(1)
      .writeTo("graftbr.q.d").append()
    spark.sql("ALTER TABLE graftbr.q.d CREATE BRANCH wip")
    (1000L to 1004L).map(i => (i, 0.0)).toDF("id", "v").coalesce(1)
      .writeTo("graftbr.q.`d@wip`").append()
    // main moves past the fork point
    (51L to 60L).map(i => (i, i * 1.0)).toDF("id", "v").coalesce(1)
      .writeTo("graftbr.q.d").append()
    val e = intercept[java.util.ConcurrentModificationException] {
      spark.sql("ALTER TABLE graftbr.q.d FAST FORWARD BRANCH wip")
    }
    assert(e.getMessage.contains("not a fast-forward"))
    // nothing published; main intact
    assert(spark.table("graftbr.q.d").count() == 60L)
    // abandon: the branch dir and its local files vanish
    val bdir = Paths.get(rootDir, "q", "d", "_branch_wip")
    assert(Files.exists(bdir))
    spark.sql("ALTER TABLE graftbr.q.d DROP BRANCH wip")
    assert(!Files.exists(bdir))
    assert(spark.table("graftbr.q.d").count() == 60L)
  }

  test("VACUUM on main keeps files an outstanding branch references; drop frees them") {
    rootDir
    spark.sql("CREATE TABLE graftbr.q.v (id BIGINT, x DOUBLE)")
    (1L to 30L).map(i => (i, i * 1.0)).toDF("id", "x").coalesce(1)
      .writeTo("graftbr.q.v").append()
    val dir = Paths.get(rootDir, "q", "v")
    val origFiles = Manifest.read(dir).get.entries.map(_.name)
    spark.sql("ALTER TABLE graftbr.q.v CREATE BRANCH keepme")
    // main REPLACES the original file; only the branch references it now
    spark.sql("UPDATE graftbr.q.v SET x = 0 WHERE id = 1")
    assert(!Manifest.read(dir).get.entries.map(_.name).toSet
      .exists(origFiles.contains), "main must have moved off the original file")

    spark.conf.set("spark.graft.vacuum.stagingMinAgeMs", "0")
    try {
      spark.sql("VACUUM graftbr.q.v RETAIN 1 SNAPSHOTS")
      // the branch still reads its fork state — its files survived
      assert(spark.table("graftbr.q.`v@keepme`").count() == 30L)
      assert(spark.sql("SELECT x FROM graftbr.q.`v@keepme` WHERE id = 1")
        .head().getDouble(0) == 1.0)
      origFiles.foreach(f => assert(Files.exists(dir.resolve(f)),
        s"branch-referenced $f must survive vacuum"))

      // abandoned branch: its pins lift and the next vacuum reaps
      spark.sql("ALTER TABLE graftbr.q.v DROP BRANCH keepme")
      spark.sql("VACUUM graftbr.q.v RETAIN 1 SNAPSHOTS")
      origFiles.foreach(f => assert(!Files.exists(dir.resolve(f)),
        s"unreferenced $f must be reaped after the branch drops"))
      assert(spark.table("graftbr.q.v").count() == 30L)
    } finally spark.conf.unset("spark.graft.vacuum.stagingMinAgeMs")
  }

  test("branch bookkeeping: double create refused, unknown branch refused, names validated") {
    rootDir
    spark.sql("CREATE TABLE graftbr.q.b (id BIGINT)")
    Seq(1L, 2L).toDF("id").writeTo("graftbr.q.b").append()
    spark.sql("ALTER TABLE graftbr.q.b CREATE BRANCH x")
    assert(Branch.list(Paths.get(rootDir, "q", "b")) == Seq("x"))
    // SHOW BRANCHES: name, fork version, live rows (metadata-only)
    val rows = spark.sql("SHOW BRANCHES graftbr.q.b").collect()
    assert(rows.length == 1 && rows.head.getString(0) == "x" &&
      rows.head.getLong(2) == 2L, rows.mkString(", "))
    intercept[Exception] { spark.sql("ALTER TABLE graftbr.q.b CREATE BRANCH x") }
    intercept[Exception] { spark.sql("ALTER TABLE graftbr.q.b DROP BRANCH nope") }
    intercept[Exception] { spark.sql("ALTER TABLE graftbr.q.b FAST FORWARD BRANCH nope") }
    spark.sql("ALTER TABLE graftbr.q.b DROP BRANCH x")
    assert(Branch.list(Paths.get(rootDir, "q", "b")).isEmpty)
  }
}
