package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Typed media record: opaque binary payload + structured metadata.
  * The 100 TB layout: payloads live in parquet BINARY columns (or object
  * storage with a pointer column), metadata columns enable partition
  * pruning and predicate pushdown before a single byte is decoded. */
final case class MediaRecord(
    media_id: Long,
    media_kind: Int, // 0=image 1=audio 2=video
    width: Int,
    height: Int,
    payload: Array[Byte])

/** Decoded per-media features — the output schema of feature extraction. */
final case class MediaFeatures(
    media_id: Long,
    media_kind: Int,
    payload_len: Int,
    n_frames: Int,
    mean_byte: Double,
    frame_checksums: Seq[Long])

/** Multimodal decode / feature-extract plumbing (north-star).
  *
  * The decode step is a STUB: this container has no image/audio codecs, so
  * `decodeStub` computes deterministic fake "frames" (fixed-stride byte
  * chunks) and per-frame checksums. The distributed shape is real:
  * `mapPartitions` over a `Dataset[MediaRecord]` — one decoder
  * initialization per partition (exactly where a JNI codec or an ONNX
  * session would be constructed once and reused), streaming iterator in /
  * iterator out (no partition materialization), feature rows out. Swap
  * `decodeStub` for a real codec call and nothing else changes.
  */
/** The codec seam: implement this once per real format and pass it to
  * [[MediaPipeline.extractFeatures]] — the distributed plumbing does not
  * change. Must be Serializable (ships to executors); heavyweight native
  * resources belong in a lazy per-JVM field, initialized on first decode
  * within a task. */
trait MediaDecoder extends Serializable {
  def decode(m: MediaRecord): MediaFeatures
}

/** Batch form of the codec seam: real decoders and feature extractors are
  * vectorized (a GPU inference session or SIMD codec wants a fixed-size
  * batch of payloads per call, amortizing per-call overhead — the same
  * reason `mapInPandas` hands pandas a record BATCH, not a row). The
  * contract: `decodeBatch(ms)` returns exactly one features row per input
  * record, in input order. */
trait BatchMediaDecoder extends Serializable {
  def decodeBatch(ms: Seq[MediaRecord]): Seq[MediaFeatures]
}

object MediaPipeline {

  /** Frame stride in bytes for the fake frame-sampler. */
  val FrameStride = 64

  /** STUB decoder — deterministic fake standing in for a real codec.
    * Real implementation would parse `payload` with an image/audio/video
    * library; unavailable in this environment by design. */
  object StubDecoder extends MediaDecoder {
    override def decode(m: MediaRecord): MediaFeatures = decodeStub(m)
  }

  def decodeStub(m: MediaRecord): MediaFeatures = {
    val frames = m.payload.grouped(FrameStride).toSeq
    val checksums = frames.map(f =>
      f.foldLeft(0L)((acc, b) => (acc * 1000003L + (b & 0xff)) % 1000000007L))
    val meanByte =
      if (m.payload.isEmpty) 0.0
      else m.payload.map(b => (b & 0xff).toDouble).sum / m.payload.length
    MediaFeatures(m.media_id, m.media_kind, m.payload.length,
      frames.size, meanByte, checksums)
  }

  /** Media table synthesized from documents (testdata has no media files);
    * schema and batch shape match what a real ingest would produce. */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        col("doc_id").as("media_id"),
        (col("n_chars") % 3).cast("int").as("media_kind"),
        (col("n_chars") % 64 + 16).cast("int").as("width"),
        (col("n_chars") % 48 + 16).cast("int").as("height"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRecord]
  }

  /** STUB resize — deterministic byte downsample standing in for an image
    * resize: keep every stride-th byte so output size tracks the target
    * dimension ratio. Real implementation swaps in a codec + scaler; the
    * schema (binary in, binary out + new dims) is what downstream sees. */
  def resizeStub(m: MediaRecord, targetW: Int, targetH: Int): MediaRecord = {
    val ratio = math.max(1,
      math.ceil(m.width.toDouble * m.height / (targetW.toDouble * targetH))
        .toInt)
    val out = m.payload.zipWithIndex.collect {
      case (b, i) if i % ratio == 0 => b
    }
    m.copy(width = targetW, height = targetH, payload = out)
  }

  /** STUB audio features — frame energies (mean |byte|) per fixed-length
    * frame, the shape of an MFCC/energy extractor's output. */
  def audioFeaturesStub(m: MediaRecord, frameLen: Int = 32): Seq[Double] =
    m.payload.grouped(frameLen).map { f =>
      if (f.isEmpty) 0.0
      else f.map(b => math.abs(b.toDouble)).sum / f.length
    }.toSeq

  /** Partition-parallel feature extraction. `mapPartitions` (not `map`) so
    * per-partition decoder setup cost is amortized — the pattern that
    * matters when the stub becomes a real codec. */
  def extractFeatures(
      media: Dataset[MediaRecord],
      decoder: MediaDecoder = StubDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real codec/session initialization would happen here, once per task
      it.map(decoder.decode)
    }
  }

  /** STUB batch decoder — delegates to the row stub; a real one would
    * issue ONE vectorized call over the whole batch. */
  object StubBatchDecoder extends BatchMediaDecoder {
    override def decodeBatch(ms: Seq[MediaRecord]): Seq[MediaFeatures] =
      ms.map(decodeStub)
  }

  /** Batched partition-parallel feature extraction: the partition iterator
    * is re-chunked into fixed-size record batches and each batch goes to
    * the decoder in one call — the Arrow/`mapInPandas` batch shape, in
    * typed Scala. `grouped` on the iterator stays streaming: at most one
    * batch of payloads is resident per task, so batch size bounds task
    * memory no matter how large the partition is. */
  def extractFeaturesBatched(
      media: Dataset[MediaRecord],
      decoder: BatchMediaDecoder = StubBatchDecoder,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    require(batchSize > 0, s"batchSize must be positive: $batchSize")
    media.mapPartitions { it =>
      // a real vectorized session would be constructed here, once per task
      it.grouped(batchSize).flatMap(decoder.decodeBatch)
    }
  }

  /** Full pipeline as a DataFrame for ad-hoc inspection. */
  def features(spark: SparkSession, sfDir: String): DataFrame =
    extractFeatures(mediaTable(spark, sfDir)).toDF()
}
