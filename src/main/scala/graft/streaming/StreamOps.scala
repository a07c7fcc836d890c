package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming operator surface (SURVEY.md §2.C ops 36-40, 42): watermarks,
  * tumbling/sliding/session windows, replay dedup, threshold alerts.
  *
  * Every builder takes an unbounded DataFrame (from Kafka, rate, or
  * MemoryStream in tests) and returns a transformed unbounded DataFrame —
  * the caller picks sink/trigger/output-mode. All state here is
  * watermark-bounded: at 100 TB/day the state store holds only the open
  * windows (or the dedup keys inside the watermark), not history.
  */
object StreamOps {

  /** Op 36+37: tumbling-window counts per group column, late data dropped
    * past the watermark. */
  def tumblingCounts(
      events: DataFrame,
      tsCol: String,
      groupCol: String,
      width: String = "1 minute",
      lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), width), col(groupCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col(groupCol), col("n"))

  /** Op 38 + op 20 analog: sliding-window sum with a threshold filter —
    * the Spark form of `kafka_consumer_lag_sum > 1000 for 5m`
    * (reference: helm-charts/cdc-system/templates/monitoring/
    * prometheus-rules.yaml:12-19). */
  def thresholdAlerts(
      metrics: DataFrame,
      tsCol: String,
      valueCol: String,
      width: String = "5 minutes",
      slide: String = "1 minute",
      threshold: Double = 1000.0,
      lateness: String = "10 minutes"): DataFrame =
    metrics
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), width, slide))
      .agg(sum(col(valueCol)).as("total"))
      .filter(col("total") > threshold)
      .select(col("window.start").as("w_start"),
        col("window.end").as("w_end"), col("total"))

  /** Op 39: session windows per key (gap-based). */
  def sessionCounts(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      gap: String = "10 minutes",
      lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col(keyCol),
        col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("n"))

  /** Op 40: at-least-once → effectively-once — drop replayed events by
    * source position within the watermark horizon. The reference's replay
    * window is bounded by the 5 s offset-flush interval
    * (prod-resources.yaml:20), so any watermark ≥ that bound is safe. */
  def dedupReplays(
      events: DataFrame,
      tsCol: String,
      offsetCols: Seq[String],
      lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(offsetCols)
}
