package graft

import graft.multimodal.MediaPipeline

/** Multimodal plumbing: schema, batch shape, and determinism of the
  * partition-parallel decode-stub pipeline. */
class MediaPipelineSpec extends SparkSpec {

  test("feature extraction is distributed, deterministic, schema-stable") {
    val media = MediaPipeline.mediaTable(spark, sfDir)
    val feats = MediaPipeline.extractFeatures(media)

    val rows = feats.collect()
    assert(rows.length == media.count())
    // frame math: n_frames = ceil(payload_len / stride)
    rows.foreach { f =>
      val expect =
        (f.payload_len + MediaPipeline.FrameStride - 1) / MediaPipeline.FrameStride
      assert(f.n_frames == expect)
      assert(f.frame_checksums.length == f.n_frames)
      assert(f.mean_byte > 0.0 && f.mean_byte < 256.0)
    }
    // deterministic across runs (stub decoder has no hidden state)
    val again = MediaPipeline.extractFeatures(media).collect()
    assert(rows.map(_.frame_checksums).toSeq == again.map(_.frame_checksums).toSeq)
  }

  test("repartitioning does not change extracted features") {
    val media = MediaPipeline.mediaTable(spark, sfDir)
    val a = MediaPipeline.extractFeatures(media)
      .collect().map(f => f.media_id -> f.frame_checksums).toMap
    val b = MediaPipeline.extractFeatures(media.repartition(7))
      .collect().map(f => f.media_id -> f.frame_checksums).toMap
    assert(a == b)
  }
}
