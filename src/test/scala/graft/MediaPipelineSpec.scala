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

  test("batched decode matches row-wise decode and sees bounded batches") {
    val media = MediaPipeline.mediaTable(spark, sfDir)
    val rowWise = MediaPipeline.extractFeatures(media)
      .collect().map(f => f.media_id -> f.frame_checksums).toMap
    val batched = MediaPipeline
      .extractFeaturesBatched(media, ProbeBatchDecoder, batchSize = 16)
      .collect().map(f => f.media_id -> f.frame_checksums).toMap
    assert(batched == rowWise) // same rows, same features, any batch size
  }

  test("resize and audio-feature stubs keep the distributed batch shape") {
    import org.apache.spark.sql.functions.col
    val spark0 = spark
    import spark0.implicits._
    val media = MediaPipeline.mediaTable(spark, sfDir)
    val resized = media.map(m => MediaPipeline.resizeStub(m, 32, 32))
    resized.collect().foreach { m =>
      assert(m.width == 32 && m.height == 32)
      assert(m.payload.nonEmpty)
    }
    val energies = media
      .map(m => m.media_id -> MediaPipeline.audioFeaturesStub(m))
      .toDF("media_id", "energies")
    val n = energies.filter(col("media_id") < 5).collect()
    assert(n.nonEmpty)
    n.foreach(r => assert(r.getSeq[Double](1).forall(e => e >= 0 && e <= 255)))
  }

  test("mm_audio contract: frame counts and energies match direct compute") {
    val out = operators.MultimodalQueries.queries("mm_audio")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(out.nonEmpty)
    val direct = MediaPipeline.mediaTable(spark, sfDir)
      .collect().filter(_.media_kind == 1)
      .map { m =>
        val e = MediaPipeline.audioFeaturesStub(m)
        m.media_id -> ((e.length, e.sum / e.length, e.max))
      }.toMap
    assert(out.keySet == direct.keySet)
    out.foreach { case (id, (n, mean, peak)) =>
      val (dn, dmean, dpeak) = direct(id)
      assert(n == dn)
      assert(math.abs(mean - dmean) < 1e-9)
      assert(math.abs(peak - dpeak) < 1e-9)
      // n_frames = ceil(payload_len / 32) is implied by dn's construction
    }
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

/** Executor-side probe for the batch seam: fails the task on an
  * over-sized or empty batch, otherwise delegates to the stub. Top-level
  * (not nested in the suite) so serialization ships no test-class state. */
object ProbeBatchDecoder extends graft.multimodal.BatchMediaDecoder {
  override def decodeBatch(
      ms: Seq[graft.multimodal.MediaRecord])
      : Seq[graft.multimodal.MediaFeatures] = {
    require(ms.nonEmpty && ms.size <= 16, s"batch size ${ms.size}")
    ms.map(MediaPipeline.decodeStub)
  }
}
