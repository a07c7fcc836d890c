package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
