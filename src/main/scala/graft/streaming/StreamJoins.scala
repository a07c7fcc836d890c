package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming joins (SURVEY.md §2.C ops 14-15) — the "enrichment"
  * capability the reference declares for its processing layer
  * (reference: README.md:77 "Stream processing → Enriched data → ES").
  */
object StreamJoins {

  /** Op 14: stream-static join — enrich a CDC stream with a dimension
    * table. `broadcastDim = true` (default) hints the broadcast for
    * genuinely small dims; pass false for large dims so Catalyst picks a
    * non-broadcast strategy instead of OOMing on a forced hint — at
    * 100 TB the large-dim route is a pre-bucketed join. */
  def enrich(
      stream: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      broadcastDim: Boolean = true): DataFrame =
    stream.join(if (broadcastDim) broadcast(dim) else dim, keys, "left_outer")

  /** Op 15: stream-stream inner join with event-time bounds. Both sides
    * carry watermarks; the time-bound condition lets Spark evict join state
    * once the watermark passes — without it state grows forever. Mirrors
    * orders-stream ⋈ payments-stream in the reference's star workload
    * (reference: postgresql-connector.yaml:39). */
  def intervalJoin(
      left: DataFrame,
      leftTs: String,
      right: DataFrame,
      rightTs: String,
      key: String,
      lateness: String = "10 minutes",
      maxDelay: String = "5 minutes"): DataFrame = {
    val l = left.withWatermark(leftTs, lateness)
    val r = right.withWatermark(rightTs, lateness)
    l.join(r,
      l(key) === r(key) &&
        r(rightTs) >= l(leftTs) &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $maxDelay"),
      "inner")
      .drop(r(key)) // one unambiguous join-key column out
  }

  /** Temporal (as-of) stream-static enrichment: each event picks up the
    * dimension VERSION in effect at its event time — the newest history
    * row with the same key and `versionTime <= eventTime` — not merely
    * the current row. This is the lookup an SCD2 history table
    * ([[graft.operators.CdcQueries]] `cdc_scd2`) exists to serve, and
    * plain stream-static equi-join cannot express it (it has no "newest
    * at-or-before" ordering; an interval join needs the closed
    * `[valid_from, valid_to)` pair and still re-scans versions per
    * event).
    *
    * Runs per micro-batch through `foreachBatch` on the custom
    * [[graft.plans.AsOfJoin]] whole-operator exec: one hash exchange per
    * side on the key, one sort, one O(1)-state merge pass — per batch,
    * the exact plan the batch `join_asof_exec` query runs at 100 TB.
    * foreachBatch (not a continuous join) is the honest shape here:
    * Structured Streaming's own stream-static join re-executes the
    * static side per batch anyway, and as-of needs batch-local sorting,
    * so the micro-batch boundary is where this operator naturally lives.
    * Unmatched events (no version yet at event time) keep NULL dim
    * columns, so late-arriving dimension history never silently drops
    * events.
    *
    * Keys/times are LongType (ids / epoch micros — the [[AsOfJoin]]
    * contract). `sink` receives the enriched frame per batch; the caller
    * starts the returned writer (checkpointing, trigger, output mode are
    * deployment policy).
    */
  def temporalEnrich(
      stream: DataFrame,
      dimHistory: DataFrame,
      eventKey: String,
      dimKey: String,
      eventTimeUs: String,
      versionTimeUs: String)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      sink(graft.plans.AsOfJoin.asof(
        batch, dimHistory, eventKey, dimKey, eventTimeUs, versionTimeUs),
        batchId)
    }
}
