package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Multimodal binary-column plumbing: container round trip, metadata
  * decode, mapPartitions feature batch shape, frame explode/reassembly.
  */
class MultimodalSpec extends SparkSpec {

  test("GR container round trip") {
    val payload = "some fake pixel data".getBytes("UTF-8")
    val blob = Multimodal.encodeBlob(payload, 640, 480, 3, 7)
    val m = Multimodal.decodeMeta(blob)
    assert(m.width === 640 && m.height === 480)
    assert(m.channels === 3 && m.codec === 7)
    assert(m.payload_bytes === payload.length)
    assert(blob.drop(Multimodal.HeaderLen).sameElements(payload))
  }

  test("decode rejects non-container bytes") {
    intercept[IllegalArgumentException] {
      Multimodal.decodeMeta("notGR".getBytes)
    }
  }

  test("media table meta matches source document stats") {
    val rows = Multimodal.m01MediaMeta(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length === docs.size)
    rows.foreach { r =>
      val n = docs(r.getAs[Long]("doc_id"))
      assert(r.getAs[Int]("width") === (n % 64 + 1).toInt)
      assert(r.getAs[Int]("height") === (n % 48 + 1).toInt)
    }
  }

  test("features are an L1-normalized 16-bin histogram") {
    val feats = Multimodal.extractFeatures(
      Multimodal.mediaTable(spark, sf).limit(20))
      .select("features").collect()
    feats.foreach { r =>
      val v = r.getSeq[Float](0)
      assert(v.length === 16)
      assert(math.abs(v.map(_.toDouble).sum - 1.0) < 1e-3)
      v.foreach(x => assert(x >= 0f && x <= 1f))
    }
  }

  test("frame explode reassembles to the original payload") {
    val media = Multimodal.mediaTable(spark, sf).limit(5)
    val frames = Multimodal.frameSample(media, 64)
      .orderBy("doc_id", "frame_idx").collect()
      .groupBy(_.getAs[Long]("doc_id"))
    val original = media.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("blob"))
      .toMap
    frames.foreach { case (id, fs) =>
      val joined = fs.sortBy(_.getAs[Int]("frame_idx"))
        .flatMap(_.getAs[Array[Byte]]("frame"))
      assert(joined.sameElements(
        original(id).drop(Multimodal.HeaderLen)))
    }
  }

  test("zero-payload blob still appears in frame counts with n_frames=0") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val media = Seq(
      (1L, Multimodal.encodeBlob(Array.empty[Byte], 4, 4, 3, 1)),
      (2L, Multimodal.encodeBlob(Array.fill[Byte](600)(7), 4, 4, 3, 1)))
      .toDF("doc_id", "blob")
    val rolled = Multimodal.frameCounts(media, 256)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(rolled === Map(1L -> ((0L, 0L)), 2L -> ((3L, 600L))))
  }

  test("resize rewrites dimensions and preserves payload") {
    val media = Multimodal.mediaTable(spark, sf).limit(3)
    val resized = Multimodal.withMeta(
      Multimodal.resize(media, 32, 24))
      .select("width", "height", "payload_bytes").collect()
    val origBytes = Multimodal.withMeta(media)
      .select("payload_bytes").collect().map(_.getInt(0)).sorted
    assert(resized.forall(r => r.getAs[Int]("width") === 32 &&
      r.getAs[Int]("height") === 24))
    assert(resized.map(_.getAs[Int]("payload_bytes")).sorted
      .sameElements(origBytes))
  }
}
