package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.queries.QueryModule

/** Multimodal / nested-column operators (SURVEY.md §2 B16 + the north-star
  * multimodal mandate).
  *
  * Two layers:
  *  1. Declared queries — JSON props parsing (`from_json` /
  *     `get_json_object`) and opaque-binary column plumbing (media payload
  *     as `binary` + typed metadata), both oracle-checked.
  *  2. [[MultimodalPipeline]] — the decode / feature-extract path a real
  *     image/audio pipeline needs: typed `Dataset[MediaRecord]`,
  *     `mapPartitions` batch-style processing (the JVM analog of an Arrow
  *     batch UDF), deterministic STUB decoder (no image libs in this
  *     container — the Spark-side plumbing (schema, batching, partitioning)
  *     is real and unit-tested; swap `decodeStub` for a JNI/codec call in
  *     production).
  */
object Multimodal extends QueryModule {

  def queries: Map[String, Q] = Map(
    // B16 — parse the events.props JSON string into typed fields, both via
    // schema-driven from_json (codegen'd JsonToStructs) and path-driven
    // get_json_object.
    "q_multimodal_cols" -> ((s, d) =>
      Tables(s, d, "events")
        .withColumn("p", from_json(col("props"), StructType(Seq(StructField("k", IntegerType)))))
        .select(
          col("event_id"),
          col("p").getField("k").as("props_k"),
          get_json_object(col("props"), "$.k").cast(IntegerType).as("props_k2"))
        .orderBy("event_id")),

    // Spark 4 VARIANT: parse the props JSON into the open semi-structured
    // type (binary-encoded, no schema declared up front) and extract typed
    // leaves with variant_get — the modern path for ragged event payloads
    // where from_json's fixed schema is too rigid; try_variant_get returns
    // NULL (not an error) for absent paths. Per-row codegen projection, no
    // shuffle.
    "q_multimodal_variant" -> ((s, d) =>
      Tables(s, d, "events")
        .select(col("event_id"),
          expr("variant_get(parse_json(props), '$.k', 'int')").as("k"),
          expr("try_variant_get(parse_json(props), '$.missing', 'string')")
            .as("missing_field"))
        .orderBy("event_id")),

    // Nested-JSON roundtrip: build a nested struct+array document per row,
    // serialize with to_json, parse back with from_json, and surface the
    // recovered leaves — proving serializer ∘ parser = identity on the
    // nested shapes event pipelines actually ship (including double
    // round-trip through JSON text, which Jackson guarantees shortest-
    // round-trip). The oracle states the original values directly; only
    // the recovered leaves are compared (raw JSON text is engine-
    // formatting-specific, deliberately not part of the contract).
    "q_json_roundtrip" -> ((s, d) => {
      val nestedSchema = StructType(Seq(
        StructField("id", LongType),
        StructField("meta", StructType(Seq(
          StructField("t", StringType), StructField("v", DoubleType)))),
        StructField("ids", ArrayType(LongType))))
      Tables(s, d, "events")
        .withColumn("js", to_json(struct(
          col("event_id").as("id"),
          struct(col("event_type").as("t"), col("value").as("v")).as("meta"),
          array(col("user_id"), col("user_id") + 1).as("ids"))))
        .withColumn("p", from_json(col("js"), nestedSchema))
        .select(col("event_id"),
          col("p.meta.t").as("rt_type"),
          col("p.meta.v").as("rt_value"),
          element_at(col("p.ids"), 2).as("rt_id2"))
        .orderBy("event_id")
    }),

    // Content-addressed dedup: the canonical MULTIMODAL dedup key is a
    // digest of the payload bytes — two media files are "the same" iff
    // their bytes hash equal, no decode needed. Digests (md5 + sha2-256,
    // both codegen'd) are computed in the scan, so the dedup shuffle
    // carries 48-byte digests, never payloads — at 100 TB of media that is
    // the difference between shuffling hashes and shuffling the lake. A
    // deterministic re-crawl batch (keys ≡0 mod 10, shifted ids) provides
    // the byte-identical duplicates; min-id canonicalization mirrors
    // q_dedup_exact.
    "q_multimodal_hash" -> ((s, d) => {
      val docs = Tables(s, d, "documents").select("doc_id", "text")
      val recrawl = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L)
      docs.unionByName(recrawl)
        .withColumn("content", col("text").cast(BinaryType))
        .select(col("doc_id"),
          md5(col("content")).as("digest"),
          sha2(col("content"), 256).as("digest256"))
        .groupBy("digest", "digest256")
        .agg(min("doc_id").as("canonical_id"), count(lit(1)).as("n_copies"))
        .orderBy("canonical_id")
    }),

    // Opaque-binary plumbing: text payload treated as a binary media column
    // with typed metadata; "features" here are decode-free byte statistics
    // (the oracle-checkable subset — the stubbed decoder lives in
    // MultimodalPipeline and is unit-tested instead).
    "q_multimodal_binary" -> ((s, d) =>
      Tables(s, d, "documents")
        .withColumn("content", col("text").cast(BinaryType))
        .select(
          col("doc_id"),
          length(col("content")).cast(LongType).as("n_bytes"),
          ascii(col("text").substr(lit(1), lit(1))).cast(IntegerType).as("first_byte"),
          col("source"),
          col("lang"))
        .orderBy("doc_id"))
  )

  def oracles: Map[String, String] = Map(
    "q_json_roundtrip" ->
      """SELECT event_id, event_type AS rt_type, value AS rt_value,
        |  user_id + 1 AS rt_id2
        |FROM events ORDER BY event_id""".stripMargin,
    "q_multimodal_hash" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0)
        |SELECT md5(text) AS digest, sha256(text) AS digest256,
        |       min(doc_id) AS canonical_id, COUNT(*) AS n_copies
        |FROM corpus GROUP BY 1, 2 ORDER BY canonical_id""".stripMargin,
    "q_multimodal_variant" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
        |  CAST(NULL AS VARCHAR) AS missing_field
        |FROM events ORDER BY event_id""".stripMargin,
    "q_multimodal_cols" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS props_k,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS props_k2
        |FROM events ORDER BY event_id""".stripMargin,
    "q_multimodal_binary" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(ascii(substr(text, 1, 1)) AS INTEGER) AS first_byte,
        |  source, lang
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}

/** Typed media record: opaque payload + structured metadata, the schema a
  * 100 TB image/audio lake would carry (payload stays opaque bytes until the
  * last possible operator; metadata is columnar and prunable). */
final case class MediaMeta(mediaType: String, source: String, declaredBytes: Long)
final case class MediaRecord(id: Long, content: Array[Byte], meta: MediaMeta)
final case class MediaFeatures(
    id: Long, mediaType: String, nBytes: Long,
    width: Int, height: Int, histogram: Array[Float])

/** Decode/feature-extract plumbing. `mapPartitions` processes records in
  * partition-sized batches — the JVM analog of an Arrow-batch UDF: one
  * decoder instantiation per partition, streaming iterator, no per-row
  * setup. The decode itself is a STUB (deterministic fake — this container
  * has no image/audio codecs); everything around it is real. */
object MultimodalPipeline {

  /** STUB decoder: deterministic fake "decode" deriving dimensions and a
    * 4-bin byte histogram from the payload bytes. Replace with a real codec
    * (e.g. javax.imageio / ffmpeg JNI) in production — the signature is the
    * contract: bytes in, fixed-width features out. */
  def decodeStub(content: Array[Byte]): (Int, Int, Array[Float]) = {
    val n = content.length
    val width = 16 + (n % 64)
    val height = 16 + ((n / 64) % 64)
    val hist = new Array[Float](4)
    var i = 0
    while (i < n) { hist((content(i) & 0xff) / 64) += 1f; i += 1 }
    if (n > 0) { var b = 0; while (b < 4) { hist(b) /= n.toFloat; b += 1 } }
    (width, height, hist)
  }

  /** Batch feature extraction: one decoder context per partition, rows
    * streamed through it. Partitioning of the input is preserved — callers
    * repartition by id/size upstream if decode cost is skewed. */
  def extractFeatures(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // per-partition decoder setup would go here (codec handles, buffers)
      it.map { r =>
        val (w, h, hist) = decodeStub(r.content)
        MediaFeatures(r.id, r.meta.mediaType, r.content.length.toLong, w, h, hist)
      }
    }
  }

  /** Frame-sample stub: pick every `stride`-th byte as a "frame" marker —
    * stands in for video frame sampling; the plumbing (explode to one row
    * per frame, bounded by maxFrames) is the real part. */
  def sampleFrames(records: Dataset[MediaRecord], stride: Int, maxFrames: Int): DataFrame = {
    import records.sparkSession.implicits._
    records.flatMap { r =>
      r.content.grouped(stride).take(maxFrames).zipWithIndex.map { case (chunk, idx) =>
        (r.id, idx, chunk.length, chunk.headOption.map(_ & 0xff).getOrElse(0))
      }
    }.toDF("id", "frame_idx", "frame_bytes", "first_byte")
  }

  /** Documents table → typed media records (text payload as opaque bytes). */
  def fromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("source"), col("n_chars"))
      .as[(Long, String, String, Long)]
      .map { case (id, text, source, nChars) =>
        MediaRecord(id, text.getBytes("UTF-8"), MediaMeta("text/plain", source, nChars))
      }
  }
}
