package graft.sources

import java.nio.file.Files

import graft.SparkSuite

/** DEFAULT column values (the `defcol.` manifest contract surfaced through
  * [[ManifestTable.columns]]): Spark's own output resolution fills omitted
  * columns, DEFAULT keywords and `SET c = DEFAULT`; SET/DROP DEFAULT apply
  * to future writes only; defaults compose with generated/identity tables
  * (where the injected resolution rule owns the fill). */
class DefaultColumnsSpec extends SparkSuite {
  import spark.implicits._

  private lazy val rootDir = {
    val d = Files.createTempDirectory("graft_def_").toString
    spark.conf.set("spark.sql.catalog.graftdef", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftdef.root", d)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftdef.q")
    d
  }

  test("insert shapes: column-list omission, DEFAULT keyword, explicit override") {
    rootDir
    spark.sql("""CREATE TABLE graftdef.q.t (
      id BIGINT, status STRING DEFAULT 'new', score DOUBLE DEFAULT 0.5)""")
    spark.sql("INSERT INTO graftdef.q.t (id) VALUES (1)")
    spark.sql("INSERT INTO graftdef.q.t VALUES (2, DEFAULT, DEFAULT)")
    spark.sql("INSERT INTO graftdef.q.t VALUES (3, 'x', 9.0)")
    val rows = spark.table("graftdef.q.t").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(rows == Seq((1L, "new", 0.5), (2L, "new", 0.5), (3L, "x", 9.0)))
  }

  test("SET DEFAULT is future-writes-only; DROP DEFAULT reverts to NULL fill") {
    rootDir
    spark.sql("CREATE TABLE graftdef.q.fw (id BIGINT, v STRING DEFAULT 'a')")
    spark.sql("INSERT INTO graftdef.q.fw (id) VALUES (1)")
    spark.sql("ALTER TABLE graftdef.q.fw ALTER COLUMN v SET DEFAULT 'b'")
    spark.sql("INSERT INTO graftdef.q.fw (id) VALUES (2)")
    spark.sql("ALTER TABLE graftdef.q.fw ALTER COLUMN v DROP DEFAULT")
    spark.sql("INSERT INTO graftdef.q.fw (id) VALUES (3)")
    val rows = spark.table("graftdef.q.fw").orderBy("id")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    assert(rows == Seq((1L, Some("a")), (2L, Some("b")), (3L, None)),
      "committed rows keep their values; the new default applies forward only")
  }

  test("UPDATE SET c = DEFAULT writes the declared default (NULL when none)") {
    rootDir
    spark.sql("""CREATE TABLE graftdef.q.u (
      id BIGINT, v STRING DEFAULT 'd', w STRING)""")
    spark.sql("INSERT INTO graftdef.q.u VALUES (1, 'x', 'y'), (2, 'p', 'q')")
    spark.sql("UPDATE graftdef.q.u SET v = DEFAULT, w = DEFAULT WHERE id = 1")
    val rows = spark.table("graftdef.q.u").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSeq
    assert(rows == Seq((1L, "d", None), (2L, "p", Some("q"))))
  }

  test("defaults compose with identity tables (the ACCEPT_ANY_SCHEMA path)") {
    rootDir
    spark.sql("""CREATE TABLE graftdef.q.c (
      rid BIGINT GENERATED ALWAYS AS IDENTITY,
      v STRING, tag STRING DEFAULT 'auto')""")
    // byName write omits BOTH the identity and the defaulted column —
    // the injected rule fills each
    Seq("a", "b").toDF("v").writeTo("graftdef.q.c").append()
    val rows = spark.table("graftdef.q.c").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq.sorted
    assert(rows == Seq(("a", "auto"), ("b", "auto")))
    assert(spark.table("graftdef.q.c").select("rid").distinct().count() == 2)
  }

  test("DDL guards: non-constant default, bad cast, ADD COLUMN DEFAULT, computed columns") {
    rootDir
    val e1 = intercept[Exception] {
      spark.sql("CREATE TABLE graftdef.q.g1 (id BIGINT, r DOUBLE DEFAULT rand())")
    }
    assert(e1.getMessage.toLowerCase.contains("constant") ||
      e1.getMessage.toLowerCase.contains("default"))
    val e2 = intercept[Exception] {
      spark.sql("CREATE TABLE graftdef.q.g2 (id BIGINT, n BIGINT DEFAULT 'abc')")
    }
    assert(e2.getMessage.toLowerCase.contains("default") ||
      e2.getMessage.toLowerCase.contains("cast"))
    spark.sql("CREATE TABLE graftdef.q.g3 (id BIGINT, v STRING)")
    val e3 = intercept[Exception] {
      spark.sql("ALTER TABLE graftdef.q.g3 ADD COLUMN extra STRING DEFAULT 'x'")
    }
    assert(e3.getMessage.contains("NULL-fill") || e3.getMessage.contains("DEFAULT"))
    spark.sql("""CREATE TABLE graftdef.q.g4 (
      id BIGINT GENERATED ALWAYS AS IDENTITY, v STRING)""")
    val e4 = intercept[Exception] {
      spark.sql("ALTER TABLE graftdef.q.g4 ALTER COLUMN id SET DEFAULT 7")
    }
    assert(e4.getMessage.contains("generated/identity"))
  }

  test("RENAME carries the default; DROP COLUMN reaps it") {
    rootDir
    spark.sql("CREATE TABLE graftdef.q.r (id BIGINT, v STRING DEFAULT 'd')")
    spark.sql("ALTER TABLE graftdef.q.r RENAME COLUMN v TO w")
    spark.sql("INSERT INTO graftdef.q.r (id) VALUES (1)")
    assert(spark.table("graftdef.q.r").collect().head.getString(1) == "d",
      "renamed column keeps its default")
    spark.sql("ALTER TABLE graftdef.q.r DROP COLUMN w")
    spark.sql("ALTER TABLE graftdef.q.r ADD COLUMN w STRING")
    spark.sql("INSERT INTO graftdef.q.r (id) VALUES (2)")
    val re = spark.table("graftdef.q.r").where("id = 2").collect().head
    assert(re.isNullAt(1), "re-added column must not resurrect the old default")
  }
}
