package graft.streaming

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset}

/** Sustained-condition alert evaluation — the `for: 5m` semantics of the
  * reference's Prometheus alert rules (reference:
  * helm-charts/cdc-system/templates/monitoring/prometheus-rules.yaml:12-37
  * — `kafka_consumer_lag_sum > 1000` with `for: 5m`): a rule FIRES only
  * when its condition has held over every evaluation bucket of a
  * contiguous window, not on a single spike, and RESOLVES when the
  * condition first clears.
  *
  * Two forms, same semantics:
  *   - [[sustainedRuns]]: the batch/backfill form — maximal runs of
  *     contiguous violating buckets, found with the gaps-and-islands
  *     trick (bucket index minus per-key row_number is constant within a
  *     run). One window + one aggregate, both partitioned by rule key —
  *     scales as a per-key sort, never global.
  *   - [[sustainedAlerts]]: the standing streaming evaluator —
  *     `flatMapGroupsWithState` keyed by rule key over finalized bucket
  *     aggregates (the output of a tumbling-window count), emitting one
  *     `firing` transition when a run reaches `minRun` buckets and one
  *     `resolved` when a fired run breaks. State is O(1) per key (run
  *     start/length/fired flag), so a deployment with millions of
  *     (rule × label-set) series holds millions of tiny states — the
  *     state store shape Structured Streaming is built for.
  *
  * A missing bucket (no rows in that hour) is condition-FALSE at that
  * hour: the streaming evaluator detects the sequence gap on the next
  * bucket it sees and breaks the run, matching the batch islands form
  * (which only ever sees existing buckets but keys runs by bucket
  * CONTIGUITY, so a hole splits the island either way).
  */
object AlertRules {

  /** One finalized evaluation bucket: `n` rows for `key` in the hour `h`. */
  final case class Bucket(key: String, h: java.sql.Timestamp, n: Long)

  /** A fired/resolved transition of one rule key's sustained condition. */
  final case class Alert(
      key: String,
      status: String, // "firing" | "resolved"
      run_start: java.sql.Timestamp,
      at: java.sql.Timestamp,
      n_buckets: Long)

  // private[streaming], not private: the state encoder's generated code
  // must reach the accessors, and Scala `private` emits package-hostile
  // bytecode that Janino cannot call
  /** `folded` is the bounded set of recently-folded hour indexes (newest
    * [[FoldedWindow]] of them) — it distinguishes an at-least-once
    * REPLAY of an hour already folded (legitimate: ignore) from a LATE
    * first delivery of an hour never folded (an upstream contract
    * violation: the watermarked aggregation feeding this evaluator
    * finalizes a key's buckets in hour order, so a never-seen earlier
    * hour means the feed is broken — fail loudly, never silently drop
    * data). Indexes older than the window are treated as replays: far
    * beyond any real watermark delay, a replayed archive is the only
    * plausible source. */
  private[streaming] final case class RunState(
      startUs: Long, lastIdx: Long, len: Long, fired: Boolean,
      folded: Seq[Long] = Nil)

  private[streaming] val FoldedWindow = 64

  private val HourUs = 3600L * 1000 * 1000

  /** Batch form: maximal runs of ≥ `minRun` CONTIGUOUS hourly buckets
    * where the bucket count meets `threshold`, per key — over a bucket
    * table `(keyCol, h timestamp, n long)`. Returns
    * `(keyCol, run_start, run_end, n_hours, peak)`. */
  def sustainedRuns(
      buckets: DataFrame,
      keyCol: String,
      threshold: Long,
      minRun: Int): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy("h")
    buckets
      .filter(col("n") >= threshold)
      .withColumn("_rn", row_number().over(w))
      // hour index − per-key rank: constant exactly within a contiguous
      // violating run (the islands trick); casting ntz → timestamp is
      // UTC-session safe and required before unix_micros
      .withColumn("_grp",
        expr(s"unix_micros(cast(h as timestamp)) div $HourUs") - col("_rn"))
      .groupBy(col(keyCol), col("_grp"))
      .agg(min(col("h")).as("run_start"), max(col("h")).as("run_end"),
        count(lit(1)).as("n_hours"), max(col("n")).as("peak"))
      .filter(col("n_hours") >= minRun)
      .drop("_grp")
  }

  /** Streaming form: emits `firing` when a key's contiguous violating run
    * reaches `minRun` buckets (once per run — the pending→firing
    * transition, not a row per bucket) and `resolved` when a fired run
    * breaks (below-threshold bucket or a sequence gap). Input must be
    * finalized per-hour buckets (e.g. a watermarked tumbling count);
    * within a micro-batch, a key's buckets are folded in hour order. */
  def sustainedAlerts(
      buckets: Dataset[Bucket],
      threshold: Long,
      minRun: Int): Dataset[Alert] = {
    import buckets.sparkSession.implicits._
    buckets
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        evalKey(threshold, minRun))
  }

  private def evalKey(threshold: Long, minRun: Int)(
      key: String,
      incoming: Iterator[Bucket],
      state: GroupState[RunState]): Iterator[Alert] = {
    var st = state.getOption.getOrElse(RunState(0L, Long.MinValue, 0L, false))
    val out = Seq.newBuilder[Alert]
    def ts(us: Long) = new java.sql.Timestamp(us / 1000)
    def markFolded(idx: Long): Unit =
      st = st.copy(folded = (st.folded :+ idx).takeRight(FoldedWindow))
    for (b <- incoming.toSeq.sortBy(_.h.getTime)) {
      val us = b.h.getTime * 1000
      val idx = us / HourUs
      if (idx <= st.lastIdx && st.lastIdx != Long.MinValue) {
        // an hour at-or-before the fold frontier: a REPLAY of an hour
        // already folded carries no new information — ignore it rather
        // than treating it as a gap (which would spuriously resolve a
        // fired run and flap the alert). But an hour inside the recent
        // window that was NEVER folded is a late out-of-order first
        // delivery — the watermarked upstream finalizes buckets in hour
        // order, so this means the feed is broken; silently dropping it
        // would lose data, so fail loudly instead. RESTART IMPLICATION
        // (deliberate): the throw fails the whole streaming query, and a
        // restart from checkpoint replays the same input and throws
        // again — a poison pill by design, because the only cure is
        // fixing the upstream feed (or wiping the corrupted key's state);
        // auto-quarantining the key would convert a broken-feed signal
        // into silent per-key data loss.
        if (!st.folded.contains(idx) && idx > st.lastIdx - FoldedWindow)
          throw new IllegalStateException(
            s"sustainedAlerts($key): hour index $idx arrived after " +
              s"frontier ${st.lastIdx} but was never folded — upstream " +
              "must deliver watermark-finalized buckets in hour order")
      } else {
      // a run extends only when one is ACTIVE (len > 0) and this bucket is
      // the very next hour; after a clear bucket len is 0 (its idx is kept
      // purely for duplicate detection) so the next violation starts fresh
      val contiguous = idx == st.lastIdx + 1 && st.len > 0
      if (b.n >= threshold) {
        if (contiguous) st = st.copy(lastIdx = idx, len = st.len + 1)
        else {
          // a gap (or first bucket) breaks any fired run before the new
          // run starts — the condition was false at the missing hours
          if (st.fired)
            out += Alert(key, "resolved", ts(st.startUs), ts(us), st.len)
          st = RunState(us, idx, 1L, fired = false, st.folded)
        }
        if (st.len >= minRun && !st.fired) {
          out += Alert(key, "firing", ts(st.startUs), ts(us), st.len)
          st = st.copy(fired = true)
        }
      } else {
        if (st.fired)
          out += Alert(key, "resolved", ts(st.startUs), ts(us), st.len)
        // remember the hour we just folded so a re-delivery of it is
        // still recognized as a duplicate, not a fresh bucket
        st = RunState(0L, idx, 0L, fired = false, st.folded)
      }
      markFolded(idx)
      }
    }
    state.update(st)
    out.result().iterator
  }
}
