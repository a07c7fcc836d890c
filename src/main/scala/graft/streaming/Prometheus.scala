package graft.streaming

import graft.streaming.StreamingMetrics.BatchMetrics

/** Prometheus text exposition (format 0.0.4) for the engine's stream and
  * connector metrics — the scrape surface of the reference's monitoring
  * path (reference: k8s-manifests/monitoring/prometheus-config.yaml:26-59
  * scrapes kafka-connect/exporter HTTP endpoints;
  * prod-resources.yaml:96-97 exposes JMX for the same purpose). The
  * reference never computes metrics itself — it EXPOSES them and lets
  * Prometheus evaluate rules over the scraped series; this module is
  * that exposition side, and [[AlertRules]] is the rule side, so a spec
  * can close the loop scrape → series → sustained-rule evaluation
  * entirely in-process.
  *
  * Exposed families (all driver-local control-plane state — rendering
  * never touches executors or data):
  *   - `graft_connector_up{connector}`: 1 RUNNING / 0 PAUSED — the
  *     kafka-connect exporter's connector-state gauge;
  *   - `graft_stream_batches_total{query}`: micro-batches observed;
  *   - `graft_stream_input_rows_total{query}`: cumulative input rows
  *     (counter — Prometheus rates over it);
  *   - `graft_stream_input_rows_per_second{query}` /
  *     `graft_stream_processed_rows_per_second{query}`: last batch's
  *     rates (gauges — their difference is the consumer-lag condition
  *     of prometheus-rules.yaml:13-14);
  *   - `graft_stream_batch_duration_ms{query}`: last batch's trigger
  *     duration.
  */
object Prometheus {

  /** One parsed sample of a scrape: metric name, label map, value. */
  final case class Sample(
      name: String, labels: Map[String, String], value: Double)

  private def esc(v: String): String =
    v.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")

  private def line(name: String, labels: Seq[(String, String)],
      value: Double): String = {
    val ls =
      if (labels.isEmpty) ""
      else labels.map { case (k, v) => s"""$k="${esc(v)}"""" }
        .mkString("{", ",", "}")
    // Locale.ROOT: a comma decimal separator is not valid exposition
    val v = String.format(java.util.Locale.ROOT, "%s", Double.box(value))
    s"$name$ls $v"
  }

  /** Render the exposition document from a [[StreamingMetrics
    * .ProgressRecorder]] snapshot plus connector `(name, state)` pairs. */
  def render(batches: Seq[BatchMetrics],
      connectors: Seq[(String, String)]): String = {
    val sb = new StringBuilder
    def family(name: String, typ: String, help: String,
        samples: Seq[(Seq[(String, String)], Double)]): Unit = {
      sb ++= s"# HELP $name $help\n# TYPE $name $typ\n"
      samples.foreach { case (ls, v) => sb ++= line(name, ls, v) += '\n' }
    }
    family("graft_connector_up", "gauge",
      "Connector state: 1 = RUNNING, 0 = PAUSED.",
      connectors.sortBy(_._1).map { case (n, st) =>
        Seq("connector" -> n) -> (if (st == "RUNNING") 1.0 else 0.0)
      })
    val byQuery = batches.groupBy(_.queryName).toSeq.sortBy(_._1)
    family("graft_stream_batches_total", "counter",
      "Micro-batches observed per query.",
      byQuery.map { case (q, ms) =>
        Seq("query" -> q) -> ms.size.toDouble })
    family("graft_stream_input_rows_total", "counter",
      "Cumulative input rows per query.",
      byQuery.map { case (q, ms) =>
        Seq("query" -> q) -> ms.map(_.inputRows).sum.toDouble })
    family("graft_stream_input_rows_per_second", "gauge",
      "Last batch input rate.",
      byQuery.map { case (q, ms) =>
        Seq("query" -> q) -> ms.last.inputRowsPerSec })
    family("graft_stream_processed_rows_per_second", "gauge",
      "Last batch processing rate.",
      byQuery.map { case (q, ms) =>
        Seq("query" -> q) -> ms.last.processedRowsPerSec })
    family("graft_stream_batch_duration_ms", "gauge",
      "Last batch trigger duration.",
      byQuery.map { case (q, ms) =>
        Seq("query" -> q) -> ms.last.batchDurationMs.toDouble })
    sb.result()
  }

  private val SampleLine =
    """^([a-zA-Z_:][a-zA-Z0-9_:]*)(?:\{(.*)\})?\s+([^\s]+)\s*$""".r
  private val LabelPair =
    """([a-zA-Z_][a-zA-Z0-9_]*)="((?:[^"\\]|\\.)*)"""".r

  /** Parse an exposition document back into samples — the consumer half
    * a scrape loop needs to feed rule evaluation ([[AlertRules]]). NaN
    * values are preserved; comment/HELP/TYPE lines are skipped. */
  def parse(text: String): Seq[Sample] =
    text.linesIterator.filterNot(l => l.isEmpty || l.startsWith("#"))
      .flatMap {
        case SampleLine(name, rawLabels, v) =>
          val labels = Option(rawLabels).toSeq.flatMap(ls =>
            LabelPair.findAllMatchIn(ls).map(m =>
              m.group(1) -> m.group(2)
                .replace("\\n", "\n").replace("\\\"", "\"")
                .replace("\\\\", "\\")))
          // exposition floats include Go's signed infinities (histogram
          // +Inf buckets are ubiquitous); Scala's toDouble rejects them
          val value = v match {
            case "+Inf" | "Inf" => Double.PositiveInfinity
            case "-Inf"         => Double.NegativeInfinity
            case other          => other.toDouble
          }
          Some(Sample(name, labels.toMap, value))
        case _ => None
      }.toSeq
}
