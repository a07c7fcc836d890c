package graft.operators

import graft.QueryGroup
import graft.multimodal.{MediaPipeline, MediaShardStore}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multimodal-column operators (north-star): media as opaque `BINARY`
  * payloads with typed metadata, plus decode/feature-extract plumbing.
  *
  * The testdata has no media files, so payloads are synthesized
  * deterministically from `documents.text` bytes (UTF-8) — the *Spark-side
  * plumbing* is the real deliverable: binary columns, typed metadata
  * structs, partition-parallel feature extraction, and a batch shape that
  * swaps to real codecs by replacing one function
  * (see [[graft.multimodal.MediaPipeline]] for the typed mapPartitions
  * path with the stubbed decoder).
  *
  * This query entry keeps everything in Catalyst expressions so the DuckDB
  * oracle can verify the binary plumbing end-to-end (encode → slice → hex →
  * length are engine-portable).
  */
object MultimodalQueries extends QueryGroup {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // binary payload + typed metadata + header features, fully distributed
    "mm_meta" -> ((s, dir) => {
      Tables.scan(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          encode(col("text"), "UTF-8").as("payload"),
          // typed metadata derived deterministically from doc stats
          (col("n_chars") % 3).cast("int").as("media_kind"), // 0=img 1=aud 2=vid
          (col("n_chars") % 64 + 16).cast("int").as("width"),
          (col("n_chars") % 48 + 16).cast("int").as("height"))
        .select(col("doc_id"), col("source"), col("media_kind"),
          col("width"), col("height"),
          octet_length(col("payload")).as("payload_len"),
          substring(hex(col("payload")), 1, 16).as("header_hex"),
          // frame-sample plan: how many fixed-size chunks a frame-sampler
          // would emit at stride 64
          ceil(octet_length(col("payload")) / lit(64.0)).cast("long")
            .as("n_chunks"))
        .orderBy("doc_id")
    }),

    // resize through the typed mapPartitions seam (MediaPipeline stub:
    // deterministic stride-downsample standing in for a codec+scaler).
    // The stub's arithmetic is simple enough to state in SQL, so the
    // distributed seam gets a FULL oracle: output length must equal
    // ceil(len / ratio) with ratio = max(1, ceil(w*h / 1024)), and the
    // first payload byte survives downsampling (index 0 is kept).
    "mm_resize" -> ((s, dir) => {
      import s.implicits._
      MediaPipeline.mediaTable(s, dir)
        .mapPartitions { it =>
          // real scaler/codec init would happen once here, per task
          it.map(m => MediaPipeline.resizeStub(m, 32, 32))
        }
        .toDF()
        .select(col("media_id"), col("width"), col("height"),
          octet_length(col("payload")).as("payload_len"),
          substring(hex(col("payload")), 1, 2).as("first_byte_hex"))
        .orderBy("media_id")
    }),

    // feature extraction through the BATCHED codec seam
    // (MediaPipeline.extractFeaturesBatched: fixed-size record batches
    // per decoder call — the vectorized-session shape). The stub's
    // count-level outputs are SQL-expressible, so the batched plumbing
    // gets a FULL oracle on (len, frame count); the byte-level features
    // (mean, checksums) are pinned batched==row-wise in MediaPipelineSpec.
    "mm_features" -> ((s, dir) => {
      MediaPipeline
        .extractFeaturesBatched(MediaPipeline.mediaTable(s, dir))
        .toDF()
        .select(col("media_id"), col("media_kind"),
          col("payload_len"), col("n_frames"))
        .orderBy("media_id")
    }),

    // audio feature extraction over the stub seam: per-frame energies
    // (mean |signed byte| per 32-byte frame — the MFCC/energy extractor
    // shape, one row per frame). FULL oracle: the corpus is pure ASCII,
    // so payload byte i == codepoint of char i, and each frame energy is
    // an exact integer sum (≤ 32×127, every partial double sum exactly
    // representable) divided by the frame length — bit-identical between
    // engines with no float-summation-order hazard (which is why the
    // graded shape is per-frame, not the per-doc mean whose double
    // accumulation order DuckDB doesn't pin). MediaPipelineSpec keeps the
    // per-doc mean/peak contracts against the stub directly.
    "mm_audio" -> ((s, dir) => {
      import s.implicits._
      MediaPipeline.mediaTable(s, dir)
        .filter(col("media_kind") === 1) // audio rows only
        .as[graft.multimodal.MediaRecord]
        .mapPartitions { it =>
          it.flatMap { m =>
            MediaPipeline.audioFeaturesStub(m).iterator.zipWithIndex
              .map { case (e, i) => (m.media_id, i, e) }
          }
        }
        .toDF("media_id", "frame_idx", "energy")
        .orderBy("media_id", "frame_idx")
    }),

    // REAL image decode under a FULL hash oracle: a 500-image PNG corpus
    // (deterministic 16×8 rasters — pixel (x,y) of image d is a pure
    // integer formula) is encoded through the JDK's actual ImageIO PNG
    // writer, decoded back through [[MediaPipeline.JdkImageDecoder]], and
    // the decoder's per-ROW pixel checksums are compared against DuckDB
    // recomputing the same fold straight from the formula. PNG is
    // lossless, so ANY defect in the encode→decode round trip (wrong
    // pixel order, channel swap, row stride, premature stub fallback)
    // breaks the hash — this is the strongest oracle a real codec path
    // can carry. Distribution: ids flow through the same mapPartitions
    // codec seam as every decoder (one session init per task); the
    // doc_id<500 bound keeps the graded slice constant-cost at any SF.
    "mm_decode_png" -> ((s, dir) => {
      import s.implicits._
      val ids = Tables.scan(s, dir, "documents")
        .select(col("doc_id")).filter(col("doc_id") < 500).as[Long]
      ids.mapPartitions { it =>
        // real codec init once per task (ImageIO is in-JVM; a JNI codec
        // or GPU session would be constructed here)
        it.map { d =>
          MediaPipeline.JdkImageDecoder.decode(
            graft.multimodal.MediaRecord(d, 0, 16, 8,
              MediaPipeline.encodeSynthetic(d, 16, 8, "png")))
        }
      }.toDF()
        .select(col("media_id"),
          posexplode(col("frame_checksums")).as(Seq("y", "row_cs")))
        .orderBy("media_id", "y")
    }),

    // REAL JPEG decode + resize over the same synthetic corpus: JPEG is
    // lossy, so pixel values are codec-version-dependent — but decoded
    // DIMENSIONS are exact for any conformant decoder, and that is what
    // the oracle pins: ImageIO must parse the JPEG container (w=16, h=8;
    // a stub fallback emits -1s and breaks the hash), then
    // [[MediaPipeline.jdkResizeImage]] must produce a decodable 8×4
    // raster from it. Covers the meta/resize surface of a real JPEG
    // corpus end-to-end; pixel-level grading lives with the lossless
    // twin `mm_decode_png`.
    "mm_decode_jpeg" -> ((s, dir) => {
      import s.implicits._
      val ids = Tables.scan(s, dir, "documents")
        .select(col("doc_id")).filter(col("doc_id") < 500).as[Long]
      ids.mapPartitions { it =>
        it.map { d =>
          val jpg = MediaPipeline.encodeSynthetic(d, 16, 8, "jpg")
          val img = MediaPipeline.readImage(jpg)
          val (w, h) =
            if (img == null) (-1, -1) else (img.getWidth, img.getHeight)
          val resized = MediaPipeline.jdkResizeImage(
            graft.multimodal.MediaRecord(d, 0, 16, 8, jpg), 8, 4)
          val rimg = MediaPipeline.readImage(resized.payload)
          val (rw, rh) =
            if (rimg == null) (-1, -1) else (rimg.getWidth, rimg.getHeight)
          (d, w, h, rw, rh)
        }
      }.toDF("media_id", "width", "height", "r_width", "r_height")
        .orderBy("media_id")
    }),

    // media dedup by content checksum — the first gate of any multimodal
    // ingest (identical files arrive via many URLs). The digest is
    // computed MAP-SIDE, so the dedup shuffle carries a 32-hex-char key
    // per record instead of the media payload — at 100 TB of media that
    // is the difference between shuffling kilobyte keys and shuffling the
    // corpus. Deterministic keeper (min id), same policy as `dedup_exact`.
    // The digest goes through hex() only because DuckDB's md5 takes
    // VARCHAR, not BLOB — the oracle-portability cost; a production
    // deployment digests the BINARY column directly and halves the bytes
    // hashed. (At sf0.1 the corpus contains real byte-identical payload
    // groups; smaller SFs are all singletons — both states oracle-checked.)
    // frame sampling — the video-modality access pattern: from each media
    // payload emit every 4th fixed-size (64 B) frame as (index, offset,
    // length, header bytes) WITHOUT decoding — pure offset arithmetic and
    // byte slicing, the seek-and-slice a real container demuxer performs
    // before handing frames to a decoder (which at deploy time replaces
    // the slice via the MediaPipeline mapPartitions seam). Shapes: the
    // payload is hexed ONCE per media row BEFORE the frame explode (the
    // explode multiplies rows, not the encode work), everything is
    // map-side — zero shuffles, and at 100 TB the stride-4 sampling is
    // the 4× scan reducer it is in production frame pipelines.
    "mm_frames" -> ((s, dir) => {
      Tables.scan(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .select(col("doc_id"), hex(col("payload")).as("ph"),
          octet_length(col("payload")).as("plen"))
        .filter(col("plen") > 0)
        .select(col("doc_id"), col("ph"), col("plen"),
          explode(sequence(lit(0L),
            ceil(col("plen") / lit(64.0)).cast("long") - lit(1L),
            lit(4L))).as("fi"))
        .select(col("doc_id"), col("fi").cast("int").as("frame_idx"),
          (col("fi") * lit(64L)).as("frame_off"),
          least(lit(64L), col("plen").cast("long") - col("fi") * lit(64L))
            .as("frame_len"),
          col("ph").substr((col("fi") * lit(128L) + lit(1L)).cast("int"),
            lit(32)).as("frame_hex"))
        .orderBy("doc_id", "frame_idx")
    }),

    // WebDataset-style shard MANIFEST — the storage-layout decision of
    // every large multimodal corpus (tar/TFRecord shards): blobs packed
    // next-fit into 8 KiB-budget shards within doc_id blocks, manifest =
    // (doc, byte_len, shard, byte_off), the tar index random access
    // resolves through. The packing fold and its scale rationale live in
    // MediaShardStore (shared with the persisted save/fetch path, which
    // MediaPipelineSpec round-trips byte-for-byte with pruned reads);
    // the oracle restates the fold as a recursive CTE.
    "mm_shard_manifest" -> ((s, dir) => {
      MediaShardStore.manifest(
        Tables.scan(s, dir, "documents")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload")),
        8192L)
        .orderBy("doc_id")
    }),

    // SHARD FILL-FACTOR report over the manifest — the storage-ops
    // number behind every packed-blob layout decision (a shard fleet
    // with low fill wastes read amplification; one with many
    // singleton-overflow shards signals the budget is too small for
    // the blob distribution). Pure rollup of the manifest the store
    // already computes (shard grain, bounded by corpus/budget), with
    // the fill ratio as an exact permille of the 8 KiB budget and
    // oversize blobs (blobs that alone exceed the budget) counted
    // explicitly — next-fit gives them a dedicated shard, the
    // tar-layout convention.
    "mm_shard_stats" -> ((s, dir) => {
      MediaShardStore.manifest(
        Tables.scan(s, dir, "documents")
          .select(col("doc_id"), encode(col("text"), "UTF-8")
            .as("payload")), 8192L)
        .groupBy("shard_id")
        .agg(count(lit(1)).as("n_blobs"),
          sum(col("byte_len")).as("bytes"),
          sum(when(col("byte_len") > 8192L, 1L).otherwise(0L))
            .as("n_oversize"))
        .withColumn("fill_x1000", expr("(bytes * 1000) div 8192"))
        .orderBy("shard_id")
    }),

    "mm_dedup" -> ((s, dir) => {
      Tables.scan(s, dir, "documents")
        .select(col("doc_id"),
          md5(hex(encode(col("text"), "UTF-8"))).as("checksum"))
        .groupBy("checksum")
        .agg(min(col("doc_id")).as("keeper_id"),
          count(lit(1)).as("n_copies"))
        .orderBy("keeper_id")
    }),

    // REAL AUDIO decode under a FULL oracle — the audio twin of
    // mm_decode_png: 256 formula-synthesized 8-bit unsigned PCM samples
    // per doc are written through javax.sound's ACTUAL WAV writer,
    // parsed back through the ACTUAL reader, and the per-32-sample
    // frame energies (Σ|s−128|, exact ints) are computed from the
    // DECODED samples — unsigned-8-bit PCM is lossless, so any
    // container defect (header arithmetic, sample framing, a silent
    // stub fallback) breaks the hash. wav_len pins the canonical
    // 44-byte RIFF header + data; n_samples pins the declared frame
    // count surviving the round trip. Same mapPartitions codec seam
    // (one session per task) and constant 300-doc graded slice as the
    // image decoders.
    "mm_decode_wav" -> ((s, dir) => {
      import s.implicits._
      import javax.sound.sampled.{AudioFileFormat, AudioFormat,
        AudioInputStream, AudioSystem}
      val ids = Tables.scan(s, dir, "documents")
        .select(col("doc_id")).filter(col("doc_id") < 300).as[Long]
      ids.mapPartitions { it =>
        it.map { d =>
          val samples = Array.tabulate(256) { i =>
            ((d * 7 + i * 31L + (i.toLong * i) % 97) % 256).toByte
          }
          val fmt = new AudioFormat(8000f, 8, 1, false, false)
          val ais = new AudioInputStream(
            new java.io.ByteArrayInputStream(samples), fmt, 256)
          val bos = new java.io.ByteArrayOutputStream()
          AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
          val wav = bos.toByteArray
          val in2 = AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(wav))
          val pcm = try in2.readAllBytes() finally in2.close()
          val energies = pcm.grouped(32).map { fr =>
            fr.map(b => math.abs((b & 0xff) - 128).toLong).sum
          }.toArray
          (d, wav.length, pcm.length, energies)
        }
      }.toDF("media_id", "wav_len", "n_samples", "energies")
        .select(col("media_id"), col("wav_len"), col("n_samples"),
          posexplode(col("energies")).as(Seq("frame_idx", "energy")))
        .orderBy("media_id", "frame_idx")
    }),

    // PERCEPTUAL-HASH image near-dup — the visual-dedup gate of a
    // multimodal ingest (exact-checksum dedup misses re-encoded /
    // slightly-edited copies; aHash catches them). The pipeline is the
    // REAL one end to end: each image is encoded through ImageIO's PNG
    // writer and decoded back through the real codec, the 8×8 average
    // hash is computed from DECODED pixels (exact-integer luma proxy
    // 2r+5g+b; block mean vs global mean via the cross-multiplied
    // comparison s·64 > total — no division), and near-dups are found by
    // PIGEONHOLE BANDING: 4 bands × 16 bits, so any pair within hamming
    // 3 shares at least one identical band (threshold 2 ⇒ zero false
    // negatives) and candidate generation is a band-value equijoin —
    // hashes shuffle, never pixels, the property that holds at 100 TB
    // of media. Ids ≥400 are synthesized as one-pixel-perturbed copies
    // of id−400 (the near-dup ground truth); the oracle recomputes the
    // whole hash from the raster formula in SQL, so ANY codec defect
    // (channel swap, row order, lossy write) breaks the compare.
    // Constant graded slice (432 images) at every SF, like mm_decode_png.
    "mm_ahash_neardup" -> ((s, dir) => {
      import s.implicits._
      val ids = Tables.scan(s, dir, "documents")
        .select(col("doc_id")).filter(col("doc_id") < 432).as[Long]
      val hashes = ids.mapPartitions { it =>
        it.map { id =>
          val src = if (id >= 400) id - 400 else id
          // id-crossed gradients (src·x / src·y terms): unlike the
          // shared mm_decode_png raster, every image gets its OWN
          // slope, so base hashes are discriminative and the planted
          // pairs dominate the report instead of formula-wide
          // block-mean collisions
          val raster = new java.awt.image.BufferedImage(
            16, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var yy = 0
          while (yy < 8) {
            var xx = 0
            while (xx < 16) {
              val r = ((src * 31 + 7L * xx + 13L * yy + 3L * src * xx)
                % 256).toInt
              val g = ((src * 3 + 11L * xx + yy + 5L * src * yy)
                % 256).toInt
              val b = ((src * 5 + xx + 17L * yy + 7L * src * xx)
                % 256).toInt
              raster.setRGB(xx, yy, (r << 16) | (g << 8) | b)
              xx += 1
            }
            yy += 1
          }
          if (id >= 400) {
            // one-pixel edit: green += 128 (mod 256) at a formula spot
            val x0 = ((id * 5) % 16).toInt
            val y0 = ((id * 7) % 8).toInt
            val argb = raster.getRGB(x0, y0)
            val g2 = (((argb >> 8) & 0xff) + 128) % 256
            raster.setRGB(x0, y0, (argb & 0xff00ff) | (g2 << 8))
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(raster, "png", bos)
          val img = MediaPipeline.readImage(bos.toByteArray) // real decode
          val lum = Array.ofDim[Long](16, 8)
          var total = 0L
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 16) {
              val p = img.getRGB(x, y)
              val l = 2L * ((p >> 16) & 0xff) + 5L * ((p >> 8) & 0xff) +
                (p & 0xff)
              lum(x)(y) = l; total += l; x += 1
            }
            y += 1
          }
          // 8×8 block grid (2×1 px blocks); band k = block rows 2k,2k+1
          val bands = Array.fill(4)(0L)
          var by = 0
          while (by < 8) {
            var bx = 0
            while (bx < 8) {
              val s0 = lum(2 * bx)(by) + lum(2 * bx + 1)(by)
              if (s0 * 64 > total)
                bands(by / 2) |= 1L << ((by % 2) * 8 + bx)
              bx += 1
            }
            by += 1
          }
          (id, bands(0), bands(1), bands(2), bands(3))
        }
      }.toDF("id", "b0", "b1", "b2", "b3")
      val bandRows = hashes.select(col("id"),
        posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
          .as(Seq("band", "v")))
      val cand = bandRows.as("x").join(bandRows.as("y"),
          col("x.band") === col("y.band") && col("x.v") === col("y.v") &&
            col("x.id") < col("y.id"))
        .select(col("x.id").as("ia"), col("y.id").as("ib")).distinct()
      val h2 = (c: String) => hashes.select(col("id"),
        col("b0").as(s"${c}0"), col("b1").as(s"${c}1"),
        col("b2").as(s"${c}2"), col("b3").as(s"${c}3"))
      cand
        .join(h2("a").withColumnRenamed("id", "ia"), "ia")
        .join(h2("b").withColumnRenamed("id", "ib"), "ib")
        .select(col("ia"), col("ib"),
          expr("cast(bit_count(a0 ^ b0) + bit_count(a1 ^ b1) + " +
            "bit_count(a2 ^ b2) + bit_count(a3 ^ b3) as int)")
            .as("hamming"))
        .filter(col("hamming") <= 2)
        .orderBy("ia", "ib")
    }))

  val oracles: Map[String, String] = Map(
    // the PCM formula recomputed sample-by-sample; the canonical RIFF
    // header is 44 bytes, so wav_len = 300 pins the real writer's
    // container and the energies pin the real reader's samples
    "mm_decode_wav" ->
      """WITH ids AS (SELECT doc_id AS media_id FROM documents
        |  WHERE doc_id < 300),
        |sm AS (SELECT media_id, ii.i,
        |    (media_id * 7 + ii.i * 31 + (ii.i * ii.i) % 97) % 256 AS s
        |  FROM ids CROSS JOIN
        |    (SELECT unnest(range(0, 256)) AS i) ii),
        |fr AS (SELECT media_id, CAST(i // 32 AS INT) AS frame_idx,
        |    CAST(SUM(abs(s - 128)) AS BIGINT) AS energy
        |  FROM sm GROUP BY 1, 2)
        |SELECT media_id, 300 AS wav_len, 256 AS n_samples, frame_idx,
        |  energy
        |FROM fr ORDER BY media_id, frame_idx""".stripMargin,

    // the full aHash pipeline recomputed from the raster FORMULA
    // (pixel → exact luma → block bits → bands → pigeonhole join →
    // hamming verify); the engine's path must agree through a real
    // PNG encode/decode round trip
    "mm_ahash_neardup" ->
      """WITH ids AS (SELECT doc_id AS id FROM documents
        |  WHERE doc_id < 432),
        |px AS (SELECT i.id,
        |    CASE WHEN i.id >= 400 THEN i.id - 400 ELSE i.id END AS src,
        |    xs.x, ys.y
        |  FROM ids i
        |  CROSS JOIN (SELECT unnest(range(0, 16)) AS x) xs
        |  CROSS JOIN (SELECT unnest(range(0, 8)) AS y) ys),
        |lm AS (SELECT id, x, y,
        |    2 * ((src * 31 + 7 * x + 13 * y + 3 * src * x) % 256)
        |    + 5 * (CASE WHEN id >= 400 AND x = (id * 5) % 16
        |                 AND y = (id * 7) % 8
        |           THEN ((src * 3 + 11 * x + y + 5 * src * y) % 256
        |             + 128) % 256
        |           ELSE (src * 3 + 11 * x + y + 5 * src * y) % 256 END)
        |    + ((src * 5 + x + 17 * y + 7 * src * x) % 256) AS lum
        |  FROM px),
        |tot AS (SELECT id, CAST(SUM(lum) AS BIGINT) AS t FROM lm
        |  GROUP BY 1),
        |bs AS (SELECT id, y AS by, x // 2 AS bx,
        |    CAST(SUM(lum) AS BIGINT) AS s0
        |  FROM lm GROUP BY 1, 2, 3),
        |bits AS (SELECT b.id, b.by, b.bx,
        |    CASE WHEN s0 * 64 > t THEN 1 ELSE 0 END AS bit
        |  FROM bs b JOIN tot USING (id)),
        |bands AS (SELECT id, by // 2 AS band,
        |    CAST(SUM(CAST(bit AS BIGINT) << ((by % 2) * 8 + bx))
        |      AS BIGINT) AS v
        |  FROM bits GROUP BY 1, 2),
        |cand AS (SELECT x.id AS ia, y.id AS ib FROM bands x
        |  JOIN bands y ON x.band = y.band AND x.v = y.v
        |    AND x.id < y.id
        |  GROUP BY 1, 2),
        |hm AS (SELECT c.ia, c.ib,
        |    CAST(SUM(bit_count(xor(p.v, q.v))) AS INT) AS hamming
        |  FROM cand c JOIN bands p ON p.id = c.ia
        |  JOIN bands q ON q.id = c.ib AND q.band = p.band
        |  GROUP BY 1, 2)
        |SELECT ia, ib, hamming FROM hm WHERE hamming <= 2
        |ORDER BY ia, ib""".stripMargin,

    "mm_meta" ->
      """SELECT doc_id, source,
        |  CAST(n_chars % 3 AS INT) AS media_kind,
        |  CAST(n_chars % 64 + 16 AS INT) AS width,
        |  CAST(n_chars % 48 + 16 AS INT) AS height,
        |  CAST(octet_length(encode(text)) AS INT) AS payload_len,
        |  substr(hex(encode(text)), 1, 16) AS header_hex,
        |  CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT) AS n_chunks
        |FROM documents ORDER BY doc_id""".stripMargin,

    "mm_frames" ->
      """WITH m AS (SELECT doc_id, encode(text) AS payload FROM documents),
        |f AS (SELECT doc_id, hex(payload) AS ph,
        |    octet_length(payload) AS plen
        |  FROM m WHERE octet_length(payload) > 0),
        |s AS (SELECT doc_id, ph, plen,
        |  unnest(range(0, CAST(ceil(plen / 64.0) AS BIGINT), 4)) AS fi
        |  FROM f)
        |SELECT doc_id, CAST(fi AS INT) AS frame_idx,
        |  CAST(fi * 64 AS BIGINT) AS frame_off,
        |  CAST(least(64, plen - fi * 64) AS BIGINT) AS frame_len,
        |  substr(ph, CAST(fi * 128 + 1 AS BIGINT), 32) AS frame_hex
        |FROM s ORDER BY doc_id, frame_idx""".stripMargin,

    // the identical next-fit fold as a recursive CTE (the
    // curate_pack_sequences oracle pattern, bytes as the budget)
    "mm_shard_manifest" ->
      """WITH RECURSIVE t AS (SELECT doc_id,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |    CAST(doc_id // 64 AS BIGINT) AS block
        |  FROM documents),
        |r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY block
        |    ORDER BY doc_id) AS BIGINT) AS rn FROM t),
        |step AS (
        |  SELECT block, rn, doc_id, byte_len,
        |    CAST(0 AS BIGINT) AS seq, byte_len AS fill,
        |    CAST(0 AS BIGINT) AS off
        |  FROM r WHERE rn = 1
        |  UNION ALL
        |  SELECT r.block, r.rn, r.doc_id, r.byte_len,
        |    CASE WHEN s.fill + r.byte_len <= 8192 THEN s.seq
        |         ELSE s.seq + 1 END,
        |    CASE WHEN s.fill + r.byte_len <= 8192 THEN s.fill + r.byte_len
        |         ELSE r.byte_len END,
        |    CASE WHEN s.fill + r.byte_len <= 8192 THEN s.fill
        |         ELSE CAST(0 AS BIGINT) END
        |  FROM step s JOIN r ON r.block = s.block AND r.rn = s.rn + 1)
        |SELECT doc_id, byte_len,
        |  CAST(block * 64 + seq AS BIGINT) AS shard_id,
        |  off AS byte_off
        |FROM step ORDER BY doc_id""".stripMargin,

    // the same recursive next-fit fold, rolled up to shard grain
    "mm_shard_stats" ->
      """WITH RECURSIVE t AS (SELECT doc_id,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |    CAST(doc_id // 64 AS BIGINT) AS block
        |  FROM documents),
        |r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY block
        |    ORDER BY doc_id) AS BIGINT) AS rn FROM t),
        |step AS (
        |  SELECT block, rn, doc_id, byte_len,
        |    CAST(0 AS BIGINT) AS seq, byte_len AS fill,
        |    CAST(0 AS BIGINT) AS off
        |  FROM r WHERE rn = 1
        |  UNION ALL
        |  SELECT r.block, r.rn, r.doc_id, r.byte_len,
        |    CASE WHEN s.fill + r.byte_len <= 8192 THEN s.seq
        |         ELSE s.seq + 1 END,
        |    CASE WHEN s.fill + r.byte_len <= 8192 THEN s.fill + r.byte_len
        |         ELSE r.byte_len END,
        |    CASE WHEN s.fill + r.byte_len <= 8192 THEN s.fill
        |         ELSE CAST(0 AS BIGINT) END
        |  FROM step s JOIN r ON r.block = s.block AND r.rn = s.rn + 1)
        |SELECT CAST(block * 64 + seq AS BIGINT) AS shard_id,
        |  COUNT(*) AS n_blobs, CAST(SUM(byte_len) AS BIGINT) AS bytes,
        |  CAST(SUM(CASE WHEN byte_len > 8192 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_oversize,
        |  (CAST(SUM(byte_len) AS BIGINT) * 1000) // 8192 AS fill_x1000
        |FROM step GROUP BY 1 ORDER BY shard_id""".stripMargin,

    "mm_features" ->
      """SELECT doc_id AS media_id,
        |  CAST(n_chars % 3 AS INT) AS media_kind,
        |  CAST(octet_length(encode(text)) AS INT) AS payload_len,
        |  CAST(ceil(octet_length(encode(text)) / 64.0) AS INT) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,

    "mm_resize" ->
      """WITH m AS (SELECT doc_id AS media_id,
        |    CAST(n_chars % 64 + 16 AS INT) AS w0,
        |    CAST(n_chars % 48 + 16 AS INT) AS h0,
        |    octet_length(encode(text)) AS len,
        |    substr(hex(encode(text)), 1, 2) AS fb
        |  FROM documents),
        |r AS (SELECT media_id, len, fb,
        |    GREATEST(1, CAST(ceil(CAST(w0 AS DOUBLE) * h0 / 1024.0) AS INT))
        |      AS ratio
        |  FROM m)
        |SELECT media_id, CAST(32 AS INT) AS width, CAST(32 AS INT) AS height,
        |  CAST(ceil(CAST(len AS DOUBLE) / ratio) AS INT) AS payload_len,
        |  fb AS first_byte_hex
        |FROM r ORDER BY media_id""".stripMargin,

    // the decoder's row checksum recomputed from the pixel formula:
    // argb = 0xff000000 | r<<16 | g<<8 | b folded left-to-right over x
    // as (acc*1000003 + argb) % 1000000007 — keep in lockstep with
    // MediaPipeline.syntheticRaster AND JdkImageDecoder's fold
    "mm_decode_png" ->
      """SELECT d.doc_id AS media_id, CAST(y.y AS INT) AS y,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(range(16), x ->
        |      4278190080
        |      + ((d.doc_id + x * 7 + y.y * 13) % 256) * 65536
        |      + ((d.doc_id * 3 + x * 11 + y.y) % 256) * 256
        |      + ((d.doc_id * 5 + x + y.y * 17) % 256))),
        |    (acc, v) -> (acc * 1000003 + v) % 1000000007) AS row_cs
        |FROM documents d, (SELECT unnest(range(8)) AS y) y
        |WHERE d.doc_id < 500
        |ORDER BY media_id, y""".stripMargin,

    "mm_decode_jpeg" ->
      """SELECT doc_id AS media_id,
        |  CAST(16 AS INT) AS width, CAST(8 AS INT) AS height,
        |  CAST(8 AS INT) AS r_width, CAST(4 AS INT) AS r_height
        |FROM documents WHERE doc_id < 500
        |ORDER BY media_id""".stripMargin,

    // frame energies recomputed from codepoints (ASCII corpus ⇒ byte ==
    // codepoint): integer sum per ≤32-byte frame, double division — keep
    // in lockstep with MediaPipeline.audioFeaturesStub's frameLen
    "mm_audio" ->
      """WITH a AS (SELECT doc_id AS media_id, text, length(text) AS len
        |    FROM documents WHERE n_chars % 3 = 1),
        |f AS (SELECT media_id, len, text,
        |    unnest(range(CAST(ceil(len / 32.0) AS BIGINT))) AS frame_idx
        |  FROM a)
        |SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
        |  CAST(list_sum(list_transform(
        |      range(LEAST(32, len - frame_idx * 32)),
        |      i -> ascii(substr(text, CAST(frame_idx * 32 + i + 1 AS INT), 1))))
        |    AS DOUBLE) / LEAST(32, len - frame_idx * 32) AS energy
        |FROM f ORDER BY media_id, frame_idx""".stripMargin,

    "mm_dedup" ->
      """WITH p AS (SELECT doc_id, md5(hex(encode(text))) AS checksum
        |  FROM documents)
        |SELECT checksum, MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
        |FROM p GROUP BY checksum ORDER BY keeper_id""".stripMargin)
}
