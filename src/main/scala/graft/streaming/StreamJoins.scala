package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming joins (SURVEY.md §2.C ops 14-15) — the "enrichment"
  * capability the reference declares for its processing layer
  * (reference: README.md:77 "Stream processing → Enriched data → ES").
  */
object StreamJoins {

  /** Op 14: stream-static join — enrich a CDC stream with a dimension
    * table. The static side is broadcast when small (Catalyst decides via
    * autoBroadcastJoinThreshold); at 100 TB the dim is either broadcast or
    * pre-bucketed on the join key so the stream side never reshuffles. */
  def enrich(
      stream: DataFrame,
      dim: DataFrame,
      keys: Seq[String]): DataFrame =
    stream.join(broadcast(dim), keys, "left_outer")

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
