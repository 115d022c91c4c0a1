package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSuite

/** Metadata tables (`` t$files `` / `` t$snapshots ``): queryable
  * relations over manifest state — totals agree with the data, sizes are
  * physical, snapshots are monotone in time, branch addressing composes,
  * and a `$`-suffixed name that is NOT a known kind stays an ordinary
  * (missing) table. */
class MetadataTablesSpec extends SparkSuite {
  import spark.implicits._

  private def freshCatalog(tag: String): String = {
    val root = Files.createTempDirectory(s"graft_meta_$tag").toString
    spark.conf.set(s"spark.sql.catalog.$tag", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$tag.root", root)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $tag.ns")
    tag
  }

  test("$files totals agree with the table; sizes are physical") {
    val cat = freshCatalog("metaspec1")
    spark.sql(s"CREATE TABLE $cat.ns.t (id BIGINT, grp STRING)")
    val df = (0L until 300L).map(i => (i, s"g${i % 3}")).toDF("id", "grp")
    df.repartition(3, df("grp")).writeTo(s"$cat.ns.t").append()
    val files = spark.sql(s"SELECT * FROM $cat.ns.`t$$files`").collect()
    // hash collisions may fold 3 groups into fewer partitions; every
    // listed file is non-empty either way
    assert(files.nonEmpty && files.forall(_.getLong(1) > 0L))
    assert(files.map(_.getLong(1)).sum == 300L) // n_rows
    assert(files.map(_.getLong(2)).sum == spark.table(s"$cat.ns.t").count())
    assert(files.forall(_.getLong(3) > 0L)) // size_bytes
    assert(files.forall(!_.getBoolean(4))) // no vectors yet
  }

  test("$files reflects deletion vectors; $snapshots is monotone") {
    val cat = freshCatalog("metaspec2")
    spark.sql(s"CREATE TABLE $cat.ns.t (id BIGINT) " +
      "TBLPROPERTIES ('delete.dv' = 'true')")
    (0L until 100L).toDF("id").coalesce(1).writeTo(s"$cat.ns.t").append()
    (100L until 200L).toDF("id").coalesce(1).writeTo(s"$cat.ns.t").append()
    spark.sql(s"DELETE FROM $cat.ns.t WHERE id < 20")
    val files = spark.sql(
      s"SELECT n_rows, live_rows, has_dv FROM $cat.ns.`t$$files` ORDER BY n_rows, live_rows")
      .collect()
    assert(files.map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
      == Seq((100L, 80L, true), (100L, 100L, false)))
    val snaps = spark.sql(
      s"SELECT version, n_rows, committed_at FROM $cat.ns.`t$$snapshots` ORDER BY version")
      .collect()
    // create (0 rows) + 2 appends + delete — totals replay the history
    assert(snaps.map(_.getLong(1)).toSeq == Seq(0L, 100L, 200L, 180L))
    val times = snaps.map(_.getTimestamp(2).getTime)
    assert(times.zip(times.tail).forall { case (a, b) => a <= b })
  }

  test("metadata relations compose as SQL (join files to snapshots)") {
    val cat = freshCatalog("metaspec3")
    spark.sql(s"CREATE TABLE $cat.ns.t (id BIGINT)")
    (0L until 50L).toDF("id").coalesce(1).writeTo(s"$cat.ns.t").append()
    val joined = spark.sql(
      s"""SELECT s.n_rows AS snap_rows, sum(f.live_rows) AS file_rows
         |FROM $cat.ns.`t$$snapshots` s CROSS JOIN $cat.ns.`t$$files` f
         |WHERE s.version = (SELECT max(version) FROM $cat.ns.`t$$snapshots`)
         |GROUP BY s.n_rows""".stripMargin).collect()(0)
    assert(joined.getLong(0) == joined.getLong(1))
  }

  test("branch addressing composes: t@b$files reads the branch state") {
    val cat = freshCatalog("metaspec4")
    spark.sql(s"CREATE TABLE $cat.ns.t (id BIGINT)")
    (0L until 30L).toDF("id").coalesce(1).writeTo(s"$cat.ns.t").append()
    spark.sql(s"ALTER TABLE $cat.ns.t CREATE BRANCH dev")
    (30L until 40L).toDF("id").coalesce(1).writeTo(s"$cat.ns.`t@dev`").append()
    assert(spark.sql(s"SELECT sum(live_rows) FROM $cat.ns.`t@dev$$files`")
      .collect()(0).getLong(0) == 40L)
    assert(spark.sql(s"SELECT sum(live_rows) FROM $cat.ns.`t$$files`")
      .collect()(0).getLong(0) == 30L)
  }

  test("$refs lists branches and tags with pins and live counts") {
    val cat = freshCatalog("metaspec6")
    spark.sql(s"CREATE TABLE $cat.ns.t (id BIGINT)")
    (0L until 20L).toDF("id").coalesce(1).writeTo(s"$cat.ns.t").append()
    spark.sql(s"ALTER TABLE $cat.ns.t CREATE TAG rel")
    spark.sql(s"ALTER TABLE $cat.ns.t CREATE BRANCH dev")
    (20L until 25L).toDF("id").coalesce(1).writeTo(s"$cat.ns.`t@dev`").append()
    val refs = spark.sql(
      s"SELECT name, kind, n_rows FROM $cat.ns.`t$$refs` ORDER BY name")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(refs == Seq(("dev", "branch", 25L), ("rel", "tag", 20L)))
    // composes as SQL: total rows pinned by immutable refs
    assert(spark.sql(s"SELECT sum(n_rows) FROM $cat.ns.`t$$refs` " +
      "WHERE kind = 'tag'").head().getLong(0) == 20L)
  }

  test("$properties lists USER props only, as a composable relation") {
    val cat = freshCatalog("metaspec6")
    spark.sql(s"CREATE TABLE $cat.ns.p (id BIGINT) " +
      "TBLPROPERTIES ('team' = 'data-eng', 'delete.dv' = 'true')")
    Seq(1L).toDF("id").writeTo(s"$cat.ns.p").append()
    val props = spark.sql(s"SELECT * FROM $cat.ns.`p$$properties`").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("team").contains("data-eng"))
    assert(props.get("delete.dv").contains("true"))
    // engine bookkeeping (epoch watermarks, row bases, partition contract)
    // must NOT leak into the user-facing relation
    assert(props.keys.forall(k => !k.contains("rowbase") &&
      !k.startsWith("mv.") && !k.contains("epoch")), props.toString)
    // composes as SQL
    val n = spark.sql(s"SELECT count(*) AS n FROM $cat.ns.`p$$properties` " +
      "WHERE key LIKE 'delete%'").collect().head.getLong(0)
    assert(n == 1L)
    // SET/UNSET round-trips through the relation
    spark.sql(s"ALTER TABLE $cat.ns.p SET TBLPROPERTIES ('tier' = 'gold')")
    spark.sql(s"ALTER TABLE $cat.ns.p UNSET TBLPROPERTIES ('team')")
    val props2 = spark.sql(s"SELECT * FROM $cat.ns.`p$$properties`").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props2.get("tier").contains("gold") && !props2.contains("team"))
  }

  test("$partitions: per-file ranges of the declared layout columns") {
    val cat = freshCatalog("metaspec7")
    spark.sql(s"CREATE TABLE $cat.ns.t (id BIGINT, grp STRING) " +
      "PARTITIONED BY (grp)")
    // two commits with disjoint group ranges → degenerate-per-commit ranges
    Seq((1L, "a"), (2L, "a")).toDF("id", "grp").coalesce(1)
      .writeTo(s"$cat.ns.t").append()
    Seq((3L, "b")).toDF("id", "grp").coalesce(1).writeTo(s"$cat.ns.t").append()
    val rows = spark.sql(s"SELECT col, kind, min_value, max_value, complete, " +
      s"live_rows FROM $cat.ns.`t$$partitions` ORDER BY min_value").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1), r.getString(2),
      r.getString(3), r.getBoolean(4), r.getLong(5))).toSeq ==
      Seq(("grp", "partition", "a", "a", true, 2L),
        ("grp", "partition", "b", "b", true, 1L)))
    // numeric layout column renders its decimal zone-map encoding
    spark.sql(s"CREATE TABLE $cat.ns.n (id BIGINT) PARTITIONED BY (id)")
    Seq(5L, 9L).toDF("id").coalesce(1).writeTo(s"$cat.ns.n").append()
    val nr = spark.sql(s"SELECT col, min_value, max_value " +
      s"FROM $cat.ns.`n$$partitions`").collect()
    assert(nr.map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
      == Seq(("id", "5", "9")))
    // CLUSTER BY tables report kind 'cluster'
    spark.sql(s"CREATE TABLE $cat.ns.c (id BIGINT, g STRING) CLUSTER BY (g)")
    Seq((1L, "x")).toDF("id", "g").writeTo(s"$cat.ns.c").append()
    val cr = spark.sql(s"SELECT col, kind FROM $cat.ns.`c$$partitions`").collect()
    assert(cr.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("g", "cluster")))
    // an unpartitioned table has no layout to report
    spark.sql(s"CREATE TABLE $cat.ns.u (id BIGINT)")
    Seq(1L).toDF("id").writeTo(s"$cat.ns.u").append()
    assert(spark.sql(s"SELECT * FROM $cat.ns.`u$$partitions`").count() == 0L)
  }

  test("$indexes: per-partition rows attribute staleness to the " +
      "partitions whose file set changed") {
    val cat = freshCatalog("metaspec8")
    val t = s"$cat.ns.v"
    spark.sql(s"CREATE TABLE $t (vec_id BIGINT, label INT, " +
      "embedding ARRAY<FLOAT>) PARTITIONED BY (label)")
    def vec(hot: Int): Array[Float] = {
      val a = new Array[Float](64); a(hot) = 1f; a
    }
    (0L to 5L).map(i => (i, 0, vec(0))).toDF("vec_id", "label", "embedding")
      .coalesce(1).writeTo(t).append()
    (6L to 11L).map(i => (i, 1, vec(1))).toDF("vec_id", "label", "embedding")
      .coalesce(1).writeTo(t).append()
    spark.sql(s"CREATE VECTOR INDEX ON $t (embedding) ANCHORS (vec_id) " +
      "BY PARTITION")
    def partRows() = spark.sql(s"SELECT fresh, details FROM " +
        s"$cat.ns.`v$$indexes` WHERE kind = 'vector-part' ORDER BY details")
      .collect().map(r => (r.getBoolean(0), r.getString(1))).toSeq
    // k reports the LIVE sub-geometry (stored non-empty centroids): a
    // slice of identical vectors collapses to one cluster
    assert(partRows() == Seq(
      (true, "part=0 k=1 files=1"), (true, "part=1 k=1 files=1")))
    // churn partition 1 AND introduce a brand-new partition value: only
    // those two attribute stale; partition 0 stays fresh
    Seq((12L, 1, vec(1))).toDF("vec_id", "label", "embedding")
      .coalesce(1).writeTo(t).append()
    Seq((13L, 2, vec(2))).toDF("vec_id", "label", "embedding")
      .coalesce(1).writeTo(t).append()
    assert(partRows() == Seq(
      (true, "part=0 k=1 files=1"),
      (false, "part=1 k=1 files=1"),
      (false, "part=2 k=0 files=0")),
      s"stale attribution: ${partRows()}")
    // the partition-scoped refresh brings every row back fresh
    spark.sql(s"REFRESH VECTOR INDEX ON $t (embedding)")
    assert(partRows() == Seq(
      (true, "part=0 k=1 files=1"), (true, "part=1 k=1 files=2"),
      (true, "part=2 k=1 files=1")))
  }

  test("an unknown $suffix stays an ordinary missing table") {
    val cat = freshCatalog("metaspec5")
    spark.sql(s"CREATE TABLE $cat.ns.t (id BIGINT)")
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.ns.`t$$bogus`").collect()
    }
    assert(e.getMessage.toLowerCase.contains("not") ||
      e.getMessage.toLowerCase.contains("cannot"))
  }
}
