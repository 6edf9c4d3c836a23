package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decode plumbing: deterministic features, full coverage, fixed dim") {
    val corpus = Multimodal.syntheticCorpus(spark, 30)
    val feats = Multimodal.decodeStub(corpus).collect()
    assert(feats.length == 30)
    assert(feats.forall(_.feature.length == Multimodal.FeatureDim))
    assert(feats.forall(f => f.byte_entropy > 0 && f.byte_entropy <= 8.0))
    // deterministic: second run identical
    val again = Multimodal.decodeStub(corpus).collect()
    assert(feats.sortBy(_.media_id).zip(again.sortBy(_.media_id)).forall {
      case (a, b) => a.feature.sameElements(b.feature) &&
        a.byte_entropy == b.byte_entropy
    })
  }

  test("resize stub bounds payload and metadata, deterministic") {
    val corpus = Multimodal.syntheticCorpus(spark, 20)
    val resized = Multimodal.resizeStub(corpus, 8).collect()
    assert(resized.forall(_.bytes.length <= 64))
    assert(resized.forall(r => r.width <= 8 && r.height <= 8))
    val again = Multimodal.resizeStub(corpus, 8).collect()
    assert(resized.sortBy(_.media_id).zip(again.sortBy(_.media_id))
      .forall { case (a, b) => a.bytes.sameElements(b.bytes) })
  }

  test("frame sampling multiplies video rows at the requested cadence") {
    val corpus = Multimodal.syntheticCorpus(spark, 30).toDF()
    val frames = Multimodal.sampleFrames(corpus, 500L)
    val perVideo = frames.groupBy("media_id").count().collect()
    assert(perVideo.nonEmpty)
    val durations = corpus.filter($"kind" === "video")
      .select($"media_id", $"duration_ms").as[(Long, Long)].collect().toMap
    perVideo.foreach { r =>
      val expect = durations(r.getLong(0)) / 500L + 1
      assert(r.getLong(1) == expect)
    }
  }
}
