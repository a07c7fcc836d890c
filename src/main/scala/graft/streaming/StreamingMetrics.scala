package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** Op 43: stream monitoring — the Spark analog of the reference's
  * Prometheus scrape path (JMX → kafka-exporter → Prometheus rules,
  * reference: k8s-manifests/monitoring/prometheus-config.yaml:26-59,
  * prometheus-rules.yaml:12-19).
  *
  * Two layers, matching how the reference splits metrics and alerts:
  *   - [[ProgressRecorder]]: per-micro-batch throughput/latency/backlog
  *     from `StreamingQueryListener` (the JMX-scrape analog);
  *   - [[observed]]: in-stream named aggregates via `Dataset.observe`
  *     (the recording-rule analog) — counters ride along with the data,
  *     no second pass.
  */
object StreamingMetrics {

  final case class BatchMetrics(
      queryName: String,
      batchId: Long,
      inputRows: Long,
      inputRowsPerSec: Double,
      processedRowsPerSec: Double,
      batchDurationMs: Long)

  /** Listener capturing per-batch progress; inspectable in tests and
    * pollable the way Prometheus polls the exporter. */
  final class ProgressRecorder(maxEntries: Int = 10000)
      extends StreamingQueryListener {
    private val buf = new ConcurrentLinkedQueue[BatchMetrics]()

    override def onQueryStarted(event: QueryStartedEvent): Unit = ()
    override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(event: QueryProgressEvent): Unit = {
      val p = event.progress
      // ring-buffer bound: a 5 s trigger produces ~17k batches/day — an
      // unbounded listener would leak driver memory on long-lived streams
      while (buf.size() >= maxEntries) buf.poll()
      buf.add(BatchMetrics(
        Option(p.name).getOrElse(""),
        p.batchId,
        p.numInputRows,
        p.inputRowsPerSecond,
        p.processedRowsPerSecond,
        Option(p.durationMs.get("triggerExecution")).map(_.longValue)
          .getOrElse(0L)))
    }

    def snapshot: Seq[BatchMetrics] = buf.asScala.toSeq

    /** The consumer-lag-style alert condition
      * (`kafka_consumer_lag_sum > 1000`, prometheus-rules.yaml:13-14):
      * true when recent input outpaces processing. */
    def lagging(threshold: Double = 1000.0): Boolean =
      buf.asScala.lastOption.exists(m =>
        m.inputRowsPerSec - m.processedRowsPerSec > threshold)
  }

  /** Attach named in-stream counters (row count, null-key count) —
    * surfaced per batch via QueryProgress.observedMetrics. */
  def observed(df: DataFrame, keyCol: String): DataFrame =
    df.observe("cdc",
      count(lit(1)).as("rows"),
      count(when(col(keyCol).isNull, 1)).as("null_keys"))
}
