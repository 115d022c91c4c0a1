package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSuite

/** The V2 catalog must make manifest tables SQL-addressable end-to-end:
  * CREATE / INSERT (through the sink's atomic commit) / SELECT / RENAME /
  * DROP, with manifest-invisible files staying invisible by name too. */
class GraftCatalogSpec extends SparkSuite {
  import spark.implicits._

  private lazy val rootDir = {
    val d = Files.createTempDirectory("graft_catalog_").toString
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftcat.root", d)
    d
  }

  test("CREATE / INSERT / SELECT round-trips through the catalog by name") {
    rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.corpus")
    spark.sql("CREATE TABLE graftcat.corpus.docs (doc_id BIGINT, body STRING)")
    // created-but-unwritten: schema visible, zero rows
    assert(spark.table("graftcat.corpus.docs").count() == 0L)
    assert(spark.table("graftcat.corpus.docs").schema.fieldNames.toSeq ==
      Seq("doc_id", "body"))

    Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("doc_id", "body")
      .writeTo("graftcat.corpus.docs").append()
    val got = spark.sql("SELECT doc_id, body FROM graftcat.corpus.docs ORDER BY doc_id")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")))

    // second INSERT appends through a second manifest commit
    spark.sql("INSERT INTO graftcat.corpus.docs VALUES (4, 'delta')")
    assert(spark.table("graftcat.corpus.docs").count() == 4L)

    // SHOW TABLES sees it; a bare directory without a manifest is invisible
    Files.createDirectories(Paths.get(rootDir, "corpus", "not_a_table"))
    val listed = spark.sql("SHOW TABLES IN graftcat.corpus")
      .select("tableName").as[String].collect().toSet
    assert(listed.contains("docs") && !listed.contains("not_a_table"))
  }

  test("DELETE FROM is metadata-only: whole files drop, partial deletes are rejected") {
    rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.del")
    spark.sql("CREATE TABLE graftcat.del.t (id BIGINT, v DOUBLE)")
    // three single-partition batches → exactly three files with disjoint
    // zone-map ranges (VALUES alone splits one row per partition)
    def batch(ids: Seq[Long]): Unit =
      ids.map(i => (i, i * 1.0)).toDF("id", "v").coalesce(1)
        .writeTo("graftcat.del.t").append()
    batch(Seq(1L, 2L, 3L)); batch(Seq(11L, 12L, 13L)); batch(Seq(21L, 22L, 23L))
    assert(spark.table("graftcat.del.t").count() == 9L)

    // predicate covers file 1's entire [1, 3] range → metadata-only drop
    spark.sql("DELETE FROM graftcat.del.t WHERE id < 10")
    assert(spark.table("graftcat.del.t").select("id").as[Long].collect().sorted.toSeq
      == Seq(11L, 12L, 13L, 21L, 22L, 23L))

    // predicate cuts through file [11, 13] → needs a rewrite → rejected,
    // and the table is untouched
    intercept[Exception] { spark.sql("DELETE FROM graftcat.del.t WHERE id = 12") }
    assert(spark.table("graftcat.del.t").count() == 6L)

    // a file containing NULLs in the predicate column must never be
    // metadata-deleted — the NULL rows do not match the predicate, and the
    // zone map (built from non-null cells only) cannot see them
    Seq((Some(31L), 1.0), (Some(32L), 2.0), (None: Option[Long], 3.0))
      .toDF("id", "v").coalesce(1).writeTo("graftcat.del.t").append()
    intercept[Exception] { spark.sql("DELETE FROM graftcat.del.t WHERE id <= 40") }
    assert(spark.table("graftcat.del.t").count() == 9L)

    // the dropped file stays reachable through the archived snapshot taken
    // just before the delete (history: create, 3 inserts, delete, insert)
    val dir = s"$rootDir/del/t"
    val snaps = Manifest.snapshotVersions(java.nio.file.Paths.get(dir))
    val before = spark.read.format("graft.sources.GraftManifestSink")
      .option("path", dir).option("snapshot", (snaps.max - 2).toString).load()
    assert(before.count() == 9L)
  }

  test("RENAME and DROP are metadata operations on the manifest directory") {
    rootDir
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.tmp")
    spark.sql("CREATE TABLE graftcat.tmp.a (k BIGINT)")
    spark.sql("INSERT INTO graftcat.tmp.a VALUES (42)")
    spark.sql("ALTER TABLE graftcat.tmp.a RENAME TO tmp.b")
    assert(spark.table("graftcat.tmp.b").count() == 1L)
    intercept[Exception] { spark.table("graftcat.tmp.a").count() }
    spark.sql("DROP TABLE graftcat.tmp.b")
    intercept[Exception] { spark.table("graftcat.tmp.b").count() }
  }
}
