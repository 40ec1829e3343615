package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def media = {
    import spark.implicits._
    Multimodal.fromBinary(
      spark.range(20).select(col("id"), concat(lit("payload-"), col("id")).cast("binary").as("payload")),
      "video")
  }

  test("decode → sample → resize → features keeps shapes and is deterministic") {
    val frames = Multimodal.decodeFrames(media, frameCount = 6)
    assert(frames.count() === 120)
    val sampled = Multimodal.sampleFrames(frames, stride = 2)
    assert(sampled.count() === 60)
    val resized = Multimodal.resize(sampled, 4, 4)
    val r = resized.head()
    assert(r.width === 4 && r.height === 4 && r.pixels.length === 4 * 4 * 3)
    val feats = Multimodal.features(resized, dims = 16)
    assert(feats.count() === 60)
    val v = feats.orderBy("id", "frame_idx").head().getAs[scala.collection.Seq[Float]]("vec").toList
    assert(v.length === 16)
    assert(math.abs(v.sum - 1.0f) < 1e-4, "histogram features are normalized")
    // determinism: same input → same features
    val v2 = Multimodal.features(Multimodal.resize(
      Multimodal.sampleFrames(Multimodal.decodeFrames(media, 6), 2), 4, 4), 16)
      .orderBy("id", "frame_idx").head().getAs[scala.collection.Seq[Float]]("vec").toList
    assert(v === v2)
  }

  test("feature vectors plug into the similarity ops") {
    val feats = Multimodal.features(Multimodal.decodeFrames(media, 2), dims = 8)
      .filter(col("frame_idx") === 0)
      .select((col("id")).as("id"), col("vec"))
    val top = graft.functions.Similarity.bruteForceTopK(feats, feats.filter(col("id") < 2), k = 3)
    assert(top.count() === 6)
  }
}
