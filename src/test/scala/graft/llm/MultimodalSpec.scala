package graft.llm

import graft.SparkSuite

/** Tests for the opaque-binary media plumbing: typed schema, per-partition
  * batch decode (stubbed), frame sampling shapes, determinism. */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  test("decode stub is deterministic and histogram-normalized") {
    val bytes = "some media payload bytes".getBytes("UTF-8")
    val (w1, h1, hist1) = MultimodalPipeline.decodeStub(bytes)
    val (w2, h2, hist2) = MultimodalPipeline.decodeStub(bytes)
    assert(w1 === w2 && h1 === h2 && hist1.toSeq === hist2.toSeq)
    assert(math.abs(hist1.sum - 1f) < 1e-5)
    assert(w1 >= 16 && h1 >= 16)
  }

  test("feature extraction runs distributed over the documents-as-media table") {
    val records = MultimodalPipeline.fromDocuments(spark, sfDir)
    val feats = MultimodalPipeline.extractFeatures(records)
    val rows = feats.collect()
    assert(rows.length === records.count().toInt)
    // features are a pure function of the payload: re-running matches
    val rows2 = MultimodalPipeline.extractFeatures(records).collect()
    assert(rows.map(_.id).sorted === rows2.map(_.id).sorted)
    val byId = rows2.map(r => r.id -> r).toMap
    rows.foreach { r =>
      val o = byId(r.id)
      assert(r.nBytes === o.nBytes && r.width === o.width && r.height === o.height)
      assert(r.histogram.toSeq === o.histogram.toSeq)
    }
    // payload length survives the typed round-trip
    assert(rows.forall(r => r.nBytes > 0 && r.mediaType === "text/plain"))
  }

  test("frame sampling respects stride and maxFrames bounds") {
    val records = MultimodalPipeline.fromDocuments(spark, sfDir)
    val frames = MultimodalPipeline.sampleFrames(records, stride = 32, maxFrames = 4)
    val perDoc = frames.groupBy("id").count().collect()
    assert(perDoc.forall(_.getLong(1) <= 4))
    val sizes = frames.select("frame_bytes").as[Int].collect()
    assert(sizes.forall(s => s > 0 && s <= 32))
  }
}
