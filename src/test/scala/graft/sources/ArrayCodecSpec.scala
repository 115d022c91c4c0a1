package graft.sources

import java.nio.file.Files

import graft.SparkSuite

/** ARRAY / BINARY columns in catalog-managed manifest tables (the
  * round-9 "complex types" gap): the TSV codec renders them as base64
  * frames, so the lakehouse tier can hold embedding and multimodal
  * payload tables. Round-trips must be bit-exact (IEEE 754 float bits,
  * raw binary bytes), and the full DML surface — DELETE, UPDATE,
  * OPTIMIZE, SHALLOW CLONE, time travel, ADD COLUMN — must carry the
  * cells through copy-on-write rewrites unchanged. */
class ArrayCodecSpec extends SparkSuite {
  import spark.implicits._

  private lazy val rootDir = {
    val d = Files.createTempDirectory("graft_arr_").toString
    spark.conf.set("spark.sql.catalog.graftarr", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftarr.root", d)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftarr.q")
    d
  }

  test("array<float> round-trips bit-exactly, nulls and empties included") {
    rootDir
    spark.sql("CREATE TABLE graftarr.q.emb (id BIGINT, v ARRAY<FLOAT>)")
    val rows = Seq(
      (1L, Array(1.0f, -2.5f, Float.MinPositiveValue, 3.4e38f)),
      (2L, Array.empty[Float]),
      (3L, null.asInstanceOf[Array[Float]]),
      (4L, Array(0.1f, Float.NaN, Float.NegativeInfinity)))
    rows.toDF("id", "v").coalesce(1).writeTo("graftarr.q.emb").append()
    val back = spark.table("graftarr.q.emb").orderBy("id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getSeq[Float](1).toArray))
    assert(back(0)._2.toSeq == rows(0)._2.toSeq)
    assert(back(1)._2.isEmpty)
    assert(back(2)._2 == null)
    // NaN compares by bits, not ==
    assert(back(3)._2.map(java.lang.Float.floatToIntBits).toSeq ==
      rows(3)._2.map(java.lang.Float.floatToIntBits).toSeq)
  }

  test("null elements inside arrays survive; string arrays keep any chars") {
    rootDir
    spark.sql("CREATE TABLE graftarr.q.s " +
      "(id BIGINT, xs ARRAY<STRING>, ns ARRAY<BIGINT>)")
    Seq(
      (1L, Seq("plain", "tab\tsep", "nl\nline", "back\\slash", ""),
        Seq[java.lang.Long](7L, null, 9L)),
      (2L, Seq.empty[String], Seq.empty[java.lang.Long]))
      .toDF("id", "xs", "ns").coalesce(1).writeTo("graftarr.q.s").append()
    val r = spark.table("graftarr.q.s").orderBy("id").collect()
    assert(r(0).getSeq[String](1) ==
      Seq("plain", "tab\tsep", "nl\nline", "back\\slash", ""))
    assert(r(0).getSeq[java.lang.Long](2) == Seq(7L, null, 9L))
    assert(r(1).getSeq[String](1).isEmpty)
  }

  test("binary columns round-trip raw bytes; nested arrays parse") {
    rootDir
    spark.sql("CREATE TABLE graftarr.q.b " +
      "(id BIGINT, payload BINARY, grid ARRAY<ARRAY<INT>>)")
    val blob = Array.tabulate[Byte](256)(i => i.toByte) // every byte value
    Seq((1L, blob, Seq(Seq(1, 2), Seq(3)))).toDF("id", "payload", "grid")
      .coalesce(1).writeTo("graftarr.q.b").append()
    val r = spark.table("graftarr.q.b").collect().head
    assert(r.getAs[Array[Byte]]("payload").toSeq == blob.toSeq)
    assert(r.getSeq[Seq[Int]](2) == Seq(Seq(1, 2), Seq(3)))
  }

  test("DML carries array cells through rewrites: DELETE, UPDATE, " +
    "OPTIMIZE, CLONE, time travel, ADD COLUMN") {
    rootDir
    spark.sql("CREATE TABLE graftarr.q.dml (id BIGINT, v ARRAY<FLOAT>)")
    val mk = (i: Long) => (i, Array.tabulate(8)(j => (i * 10 + j) * 0.5f))
    (1L to 10L).map(mk).toDF("id", "v").coalesce(1)
      .writeTo("graftarr.q.dml").append()
    val dir = java.nio.file.Paths.get(rootDir, "q", "dml")
    val v1 = Manifest.snapshotVersions(dir).last
    spark.sql("DELETE FROM graftarr.q.dml WHERE id % 3 = 0") // expression tier
    spark.sql("UPDATE graftarr.q.dml SET id = id + 100 WHERE id = 1")
    spark.sql("OPTIMIZE graftarr.q.dml")
    val want = (1L to 10L).filterNot(_ % 3 == 0)
      .map(i => (if (i == 1) 101L else i) -> mk(i)._2.toSeq).toMap
    val got = spark.table("graftarr.q.dml").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(got == want, "array cells must survive COW rewrites unchanged")
    // time travel reads the pre-DML arrays
    val at1 = spark.read.format("graft.sources.GraftManifestSink")
      .option("path", dir.toString).option("snapshot", v1.toString).load()
    assert(at1.count() == 10)
    // clone diverges without touching the source's arrays
    spark.sql("CREATE TABLE graftarr.q.dml2 SHALLOW CLONE graftarr.q.dml")
    spark.sql("DELETE FROM graftarr.q.dml2 WHERE id > 100")
    assert(spark.table("graftarr.q.dml").count() == 7)
    assert(spark.table("graftarr.q.dml2").count() == 6)
    // ADD COLUMN of an array type passes the supported-type gate and
    // NULL-fills old files
    spark.sql("ALTER TABLE graftarr.q.dml ADD COLUMN tags ARRAY<STRING>")
    assert(spark.table("graftarr.q.dml").where("tags IS NULL").count() == 7)
  }

  test("struct and map columns round-trip, with nulls and nesting") {
    rootDir
    spark.sql("CREATE TABLE graftarr.q.sm (id BIGINT, " +
      "meta STRUCT<width: INT, height: INT, label: STRING>, " +
      "hdr MAP<STRING, STRING>, " +
      "deep STRUCT<tags: ARRAY<STRING>, score: DOUBLE>)")
    spark.sql(
      """INSERT INTO graftarr.q.sm VALUES
        |  (1, named_struct('width', 640, 'height', 480, 'label', 'cat'),
        |   map('a', '1', 'tab', 'x\ty'),
        |   named_struct('tags', array('x', 'y'), 'score', 0.5)),
        |  (2, named_struct('width', CAST(NULL AS INT), 'height', 7,
        |      'label', CAST(NULL AS STRING)),
        |   map('only', CAST(NULL AS STRING)), CAST(NULL AS
        |   STRUCT<tags: ARRAY<STRING>, score: DOUBLE>))""".stripMargin)
    val r = spark.table("graftarr.q.sm").orderBy("id").collect()
    val m1 = r(0).getStruct(1)
    assert((m1.getInt(0), m1.getInt(1), m1.getString(2)) == (640, 480, "cat"))
    assert(r(0).getMap[String, String](2) == Map("a" -> "1", "tab" -> "x\ty"))
    assert(r(0).getStruct(3).getSeq[String](0) == Seq("x", "y"))
    val m2 = r(1).getStruct(1)
    assert(m2.isNullAt(0) && m2.getInt(1) == 7 && m2.isNullAt(2))
    assert(r(1).getMap[String, String](2) == Map("only" -> null))
    assert(r(1).isNullAt(3))
    // DML carries complex cells through COW rewrites
    spark.sql("UPDATE graftarr.q.sm SET id = id + 10 WHERE id = 1")
    val u = spark.table("graftarr.q.sm").where("id = 11").collect().head
    assert(u.getStruct(1).getString(2) == "cat")
    assert(u.getMap[String, String](2)("tab") == "x\ty")
  }

  test("schema header round-trips array/binary names incl. containsNull") {
    rootDir
    spark.sql("CREATE TABLE graftarr.q.hdr " +
      "(a ARRAY<FLOAT>, b ARRAY<ARRAY<STRING>>, c BINARY, " +
      "d ARRAY<DECIMAL(10,2)>)")
    val dir = java.nio.file.Paths.get(rootDir, "q", "hdr")
    val m = Manifest.read(dir).get
    import org.apache.spark.sql.types._
    assert(m.schema("a").dataType == ArrayType(FloatType))
    assert(m.schema("b").dataType == ArrayType(ArrayType(StringType)))
    assert(m.schema("c").dataType == BinaryType)
    assert(m.schema("d").dataType == ArrayType(DecimalType(10, 2)))
    // struct/map names round-trip through the recursive grammar too
    spark.sql("CREATE TABLE graftarr.q.hdr2 " +
      "(s STRUCT<a: INT, b: ARRAY<STRING>, c: MAP<STRING, DOUBLE>>, " +
      "m MAP<BIGINT, STRUCT<x: INT>>)")
    val m2 = Manifest.read(java.nio.file.Paths.get(rootDir, "q", "hdr2")).get
    assert(m2.schema("s").dataType == StructType(Seq(
      StructField("a", IntegerType), StructField("b", ArrayType(StringType)),
      StructField("c", MapType(StringType, DoubleType)))))
    assert(m2.schema("m").dataType ==
      MapType(LongType, StructType(Seq(StructField("x", IntegerType)))))
  }
}
