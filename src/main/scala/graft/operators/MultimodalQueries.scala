package graft.operators

import graft.QueryGroup
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
    }))

  val oracles: Map[String, String] = Map(
    "mm_meta" ->
      """SELECT doc_id, source,
        |  CAST(n_chars % 3 AS INT) AS media_kind,
        |  CAST(n_chars % 64 + 16 AS INT) AS width,
        |  CAST(n_chars % 48 + 16 AS INT) AS height,
        |  CAST(octet_length(encode(text)) AS INT) AS payload_len,
        |  substr(hex(encode(text)), 1, 16) AS header_hex,
        |  CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT) AS n_chunks
        |FROM documents ORDER BY doc_id""".stripMargin)
}
