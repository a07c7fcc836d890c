package graft

import graft.streaming.{KeyedChange, StatefulCompaction, StreamOps, StreamingMetrics}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import java.sql.Timestamp

/** Structured-streaming operator behavior over MemoryStream micro-batches
  * (SURVEY.md §5.2.4): stateful compaction, replay dedup, windowed counts,
  * and progress metrics. */
class StreamingSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("stateful compaction upserts by key, keeps max-lsn, ignores replays") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[KeyedChange]
    val q = StatefulCompaction.compact(in.toDS())
      .writeStream.format("memory").queryName("compacted")
      .outputMode(OutputMode.Update).start()
    try {
      // batch 1: two inserts + an update for key 1
      in.addData(
        KeyedChange(1L, 10L, deleted = false, "v1"),
        KeyedChange(2L, 20L, deleted = false, "v2"),
        KeyedChange(1L, 15L, deleted = false, "v1b"))
      q.processAllAvailable()
      // batch 2: replay of (1,15) — must emit nothing; stale (2,5) — ditto;
      // delete of key 2 at lsn 25 — must emit a deleted marker
      in.addData(
        KeyedChange(1L, 15L, deleted = false, "v1b"),
        KeyedChange(2L, 5L, deleted = false, "stale"),
        KeyedChange(2L, 25L, deleted = true, "v2"))
      q.processAllAvailable()
      val out = spark.table("compacted")
        .groupBy($"key").agg(max(struct($"lsn", $"deleted", $"payload")).as("s"))
        .select($"key", $"s.lsn", $"s.deleted", $"s.payload")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
          r.getString(3))).toSet
      assert(out == Set((1L, 15L, false, "v1b"), (2L, 25L, true, "v2")))
      // replays/stale events emitted no extra rows in batch 2: total emitted
      // rows = 3 (key1 newest + key2 in batch 1, key2 delete in batch 2)
      assert(spark.table("compacted").count() == 3)
    } finally q.stop()
  }

  test("dedupReplays drops at-least-once duplicates within watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, Timestamp)]
    val deduped = StreamOps.dedupReplays(
      in.toDF().toDF("lsn", "ts"), "ts", Seq("lsn"))
    val q = deduped.writeStream.format("memory").queryName("deduped")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((1L, ts("2024-01-01 00:00:01")),
        (2L, ts("2024-01-01 00:00:02")))
      q.processAllAvailable()
      in.addData((1L, ts("2024-01-01 00:00:01")), // replayed
        (3L, ts("2024-01-01 00:00:03")))
      q.processAllAvailable()
      assert(spark.table("deduped").select("lsn").collect()
        .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("tumbling window counts close once the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Timestamp, String)]
    val counts = StreamOps.tumblingCounts(
      in.toDF().toDF("ts", "kind"), "ts", "kind",
      width = "1 minute", lateness = "1 minute")
    val q = counts.writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        (ts("2024-01-01 00:00:10"), "click"),
        (ts("2024-01-01 00:00:40"), "click"),
        (ts("2024-01-01 00:01:10"), "view"))
      q.processAllAvailable()
      // advance event time far enough to close the 00:00 window
      in.addData((ts("2024-01-01 00:05:00"), "view"))
      q.processAllAvailable()
      in.addData((ts("2024-01-01 00:09:00"), "view"))
      q.processAllAvailable()
      val rows = spark.table("tumbling")
        .select("w_start", "kind", "n").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
        .toSet
      assert(rows.contains(("2024-01-01 00:00:00.0", "click", 2L)))
    } finally q.stop()
  }

  test("threshold alerts fire only when the sliding sum exceeds the bound") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Timestamp, Double)]
    val alerts = StreamOps.thresholdAlerts(
      in.toDF().toDF("ts", "lag"), "ts", "lag",
      width = "5 minutes", slide = "1 minute", threshold = 1000.0,
      lateness = "1 minute")
    val q = alerts.writeStream.format("memory").queryName("alerts")
      .outputMode(OutputMode.Append).start()
    try {
      // minute 0: 600 (below); minute 2: 700 → windows covering both
      // minutes hold 1300 (above)
      in.addData((ts("2024-01-01 00:00:30"), 600.0),
        (ts("2024-01-01 00:02:30"), 700.0))
      q.processAllAvailable()
      in.addData((ts("2024-01-01 00:30:00"), 1.0)) // advance watermark
      q.processAllAvailable()
      val totals = spark.table("alerts").select("total").collect()
        .map(_.getDouble(0))
      assert(totals.nonEmpty && totals.forall(_ > 1000.0))
      assert(totals.contains(1300.0))
    } finally q.stop()
  }

  test("session windows merge within gap and split beyond it") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Timestamp, Long)]
    val sessions = StreamOps.sessionCounts(
      in.toDF().toDF("ts", "uid"), "ts", "uid",
      gap = "10 minutes", lateness = "1 minute")
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        (ts("2024-01-01 00:00:00"), 1L),
        (ts("2024-01-01 00:05:00"), 1L),  // same session (gap 5 < 10)
        (ts("2024-01-01 00:20:00"), 1L))  // new session (gap 15 > 10)
      q.processAllAvailable()
      in.addData((ts("2024-01-01 01:00:00"), 2L)) // advance watermark
      q.processAllAvailable()
      val rows = spark.table("sessions")
        .filter($"uid" === 1L).select("s_start", "n").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(1))).toSet
      assert(rows == Set(("2024-01-01 00:00:00.0", 2L),
        ("2024-01-01 00:20:00.0", 1L)))
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains the backlog and stops (snapshot replay)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val in = MemoryStream[Long]
    in.addData(1L to 100L: _*) // pre-existing backlog = the snapshot
    val q = in.toDF().toDF("k")
      .groupBy().count()
      .writeStream.format("memory").queryName("avnow")
      .outputMode(OutputMode.Complete)
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(30000) // AvailableNow terminates by itself
      assert(!q.isActive, "query should self-terminate after draining")
      assert(spark.table("avnow").collect().head.getLong(0) == 100L)
    } finally if (q.isActive) q.stop()
  }

  test("alerts round-trip through the Kafka re-publish shape") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.Sinks
    val in = MemoryStream[(Timestamp, Double)]
    // alert stream → Kafka-shaped control records (A11) → parse back:
    // the reference's alert → Alertmanager path as a topic round trip
    val shaped = Sinks.toKafkaShape(
      StreamOps.thresholdAlerts(in.toDF().toDF("ts", "lag"), "ts", "lag",
        width = "5 minutes", slide = "5 minutes", threshold = 1000.0,
        lateness = "1 minute"),
      keyCols = Seq("w_start"))
    val q = shaped.writeStream.format("memory").queryName("ctl")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((ts("2024-01-01 00:01:00"), 800.0),
        (ts("2024-01-01 00:02:00"), 900.0))
      q.processAllAvailable()
      in.addData((ts("2024-01-01 00:30:00"), 1.0)) // close the window
      q.processAllAvailable()
      val rows = spark.table("ctl").collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getString(0).contains("w_start"))
        val total = spark.range(1).select(
          get_json_object(lit(r.getString(1)), "$.total").cast("double"))
          .collect().head.getDouble(0)
        assert(total == 1700.0)
      }
    } finally q.stop()
  }

  test("progress metrics capture per-batch rows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rec = new StreamingMetrics.ProgressRecorder
    spark.streams.addListener(rec)
    val in = MemoryStream[Long]
    val q = StreamingMetrics.observed(in.toDF().toDF("key"), "key")
      .writeStream.format("memory").queryName("metered")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(1L, 2L, 3L)
      q.processAllAvailable()
      // listener events are async; wait briefly
      val deadline = System.currentTimeMillis() + 10000
      while (rec.snapshot.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(rec.snapshot.exists(_.inputRows == 3))
      assert(!rec.lagging())
    } finally {
      q.stop(); spark.streams.removeListener(rec)
    }
  }

  test("stream_session_live exercises cross-batch session merges (a " +
      "session extended by a later micro-batch's events) and withholds " +
      "unfinalized sessions") {
    import org.apache.spark.sql.expressions.Window
    val sfDir = "/root/testdata/sf0.01" // sf0.001's slice is too sparse
    val emitted = graft.operators.StreamQueries
      .sessionLiveSink(spark, sfDir)
      .select(col("user_id"),
        col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"))
    // recompute the harness's batch assignment (same ntile expression)
    // and count emitted sessions containing events from >1 feed batch —
    // the state-store MERGE path the graded query exists to exercise
    val batches = graft.sources.Tables.scan(spark, sfDir, "events")
      .filter(col("event_id") % 4 === 1)
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"))
      .withColumn("batch",
        ntile(5).over(Window.orderBy(col("ts"), col("event_id"))) - 1)
    val crossBatch = emitted.join(batches, Seq("user_id"))
      .filter(col("ts") >= col("s_start") && col("ts") < col("s_end"))
      .groupBy("user_id", "s_start")
      .agg(countDistinct(col("batch")).as("nb"))
      .filter(col("nb") > 1)
      .count()
    assert(crossBatch >= 1,
      s"no emitted session spans a micro-batch boundary — the feed's " +
        "slice/batching no longer exercises the session merge path")
    // Append-mode finalization: the last-arriving sessions (end above the
    // final watermark) must be absent from the emitted set — compare
    // against the batch session_window over the SAME slice and gap
    val all = batches
      .groupBy(session_window(col("ts"), "4 hours"), col("user_id"))
      .count().count()
    val live = emitted.count()
    assert(live > 0 && live < all,
      s"expected a strict finalized subset, got $live of $all sessions")
  }

  test("stream_join_live: matched rows equal the batch interval join, " +
      "null-pads are exactly the finalized unmatched lefts, and a match " +
      "crosses a micro-batch boundary") {
    import org.apache.spark.sql.expressions.Window
    // sf0.1: the only SF whose matched pairs straddle a batch cut (2 of
    // 275 under ntile(3) — DuckDB-counted; sf0.01's 27 matches all land
    // inside one batch, and ntile(5) had 0 cross even at sf0.1)
    val sfDir = "/root/testdata/sf0.1"
    val out = graft.operators.StreamQueries.joinLiveSink(spark, sfDir)
      .select(col("user_id"), col("l_eid"), col("r_eid"))
    val ev = graft.sources.Tables.scan(spark, sfDir, "events")
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"))
    val l = ev.filter(col("event_id") % 8 === 2)
      .select(col("event_id").as("l_eid"), col("user_id"),
        col("ts").as("l_ts"))
    val r = ev.filter(col("event_id") % 8 === 6)
      .select(col("event_id").as("r_eid"),
        col("user_id").as("r_uid"), col("ts").as("r_ts"))
    val batchTwin = l.join(r,
      col("r_uid") === col("user_id") && col("r_ts") >= col("l_ts")
        && col("r_ts") <= col("l_ts") + expr("interval 2 hours"))
      .select(col("user_id"), col("l_eid"), col("r_eid"))
    // the streaming matched set IS the batch interval join (ordered
    // feeds: nothing late, nothing evicted before its matches arrive)
    val matched = out.filter(col("r_eid").isNotNull)
    assert(matched.exceptAll(batchTwin).isEmpty
      && batchTwin.exceptAll(matched).isEmpty,
      "streaming matches must equal the batch interval join")
    assert(matched.count() > 0, "no matched rows at this SF")
    // null-pads: unmatched lefts whose window the final watermark passed
    // — and ONLY those (no unfinalized left may emit)
    val maxL = l.agg(max(col("l_ts"))).head().getTimestamp(0)
    val maxR = r.agg(max(col("r_ts"))).head().getTimestamp(0)
    val fwMs = // ms-truncated min-of-sources max, minus the 12 h delay
      (math.min(maxL.getTime, maxR.getTime)) - 12L * 3600 * 1000
    val unmatchedLefts = l.join(batchTwin.select("l_eid").distinct(),
        Seq("l_eid"), "left_anti")
    val finalized = unmatchedLefts
      .filter(col("l_ts") + expr("interval 2 hours")
        < to_timestamp(lit(fwMs / 1000.0)))
      .select("l_eid")
    val padded = out.filter(col("r_eid").isNull).select("l_eid")
    assert(padded.exceptAll(finalized).isEmpty
      && finalized.exceptAll(padded).isEmpty,
      "null-padded set must be exactly the finalized unmatched lefts")
    // cross-batch matching: at least one matched pair arrives in two
    // DIFFERENT micro-batches (the state-store path the grade exists
    // to exercise — recompute the harness's batch assignment)
    val jb = ev
      .filter(col("event_id") % 8 === 2 || col("event_id") % 8 === 6)
      .withColumn("batch",
        ntile(3).over(Window.orderBy(col("ts"), col("event_id"))) - 1)
      .select(col("event_id"), col("batch"))
    val cross = matched
      .join(jb.withColumnRenamed("batch", "lb"),
        col("l_eid") === col("event_id")).drop("event_id")
      .join(jb.withColumnRenamed("batch", "rb"),
        col("r_eid") === col("event_id"))
      .filter(col("lb") =!= col("rb"))
      .count()
    assert(cross >= 1,
      "no matched pair spans a micro-batch boundary — the batching no " +
        "longer exercises cross-trigger symmetric-hash state")
  }
}
