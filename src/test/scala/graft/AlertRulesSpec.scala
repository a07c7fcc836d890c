package graft

import graft.streaming.AlertRules
import graft.streaming.AlertRules.{Alert, Bucket}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import java.sql.Timestamp

/** Sustained-condition (`for: 5m`-style) alert evaluation: the batch
  * islands form and the standing flatMapGroupsWithState evaluator must
  * agree — one `firing` transition per sustained run, `resolved` on the
  * first clear, spikes never fire. */
class AlertRulesSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)
  private def hour(i: Int): Timestamp = ts(f"2024-01-01 $i%02d:00:00")

  // lag(key=a): hours 0..4 violating (run of 5), hour 5 clear, hours
  // 7..8 violating but split from 9 by a missing hour (gap at 6 relative
  // to nothing — 7..8 is len 2, never fires); key=b: a single spike.
  private val fixture = Seq(
    Bucket("a", hour(0), 9), Bucket("a", hour(1), 7), Bucket("a", hour(2), 5),
    Bucket("a", hour(3), 6), Bucket("a", hour(4), 8), Bucket("a", hour(5), 1),
    Bucket("a", hour(7), 9), Bucket("a", hour(8), 9),
    Bucket("b", hour(2), 42))

  test("batch sustainedRuns finds exactly the contiguous ≥minRun islands") {
    import spark.implicits._
    val runs = AlertRules.sustainedRuns(
      fixture.toDS().toDF("event_type", "h", "n"),
      keyCol = "event_type", threshold = 5L, minRun = 3)
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getLong(4)))
    // only a's 0..4 run qualifies: 7..8 is two hours, b is a spike
    assert(runs.toSeq == Seq(("a", hour(0), hour(4), 5L, 9L)))
  }

  test("streaming evaluator fires once per sustained run and resolves " +
      "on the first clear, across micro-batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Bucket]
    val q = AlertRules.sustainedAlerts(in.toDS(), threshold = 5L, minRun = 3)
      .writeStream.format("memory").queryName("alerts")
      .outputMode(OutputMode.Append).start()
    try {
      // split mid-run: state must carry the open run across batches
      in.addData(fixture.filter(_.h.before(hour(3))): _*)
      q.processAllAvailable()
      in.addData(fixture.filterNot(_.h.before(hour(3))): _*)
      q.processAllAvailable()
      val alerts = spark.table("alerts").as[Alert].collect()
        .sortBy(a => (a.key, a.at.getTime))
        .map(a => (a.key, a.status, a.run_start, a.at, a.n_buckets))
      assert(alerts.toSeq == Seq(
        // fires at the 3rd contiguous violating hour (pending→firing),
        // NOT again at hours 3/4; resolves at the hour-5 clear reporting
        // the run it closes; the 7..8 rump and b's spike never fire
        ("a", "firing", hour(0), hour(2), 3L),
        ("a", "resolved", hour(0), hour(5), 5L)))
    } finally q.stop()
  }

  test("streaming evaluator ignores re-delivered buckets (no flap) and " +
      "starts a fresh run right after a clear hour") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Bucket]
    val q = AlertRules.sustainedAlerts(in.toDS(), threshold = 5L, minRun = 3)
      .writeStream.format("memory").queryName("alerts_dup")
      .outputMode(OutputMode.Append).start()
    try {
      // hours 0..2 violating → fires at hour 2
      in.addData(Bucket("a", hour(0), 9), Bucket("a", hour(1), 7),
        Bucket("a", hour(2), 6))
      q.processAllAvailable()
      // hour 2 RE-DELIVERED (finalized bucket replayed): already folded,
      // must be a no-op — no spurious resolved, no run reset
      in.addData(Bucket("a", hour(2), 6))
      q.processAllAvailable()
      // hour 3 still violating: the run continues (would have restarted
      // at len 1 if the duplicate had reset state — caught below because
      // a reset run would re-fire at hour 5)
      in.addData(Bucket("a", hour(3), 8))
      q.processAllAvailable()
      // hour 4 clear → resolved; hours 5..7 violating → a NEW run that
      // fires at hour 7 with run_start hour 5 (exercises the
      // clear-then-adjacent-violation path where lastIdx is retained for
      // dup detection but must not seed run start/length)
      in.addData(Bucket("a", hour(4), 1), Bucket("a", hour(5), 9),
        Bucket("a", hour(6), 9), Bucket("a", hour(7), 9))
      q.processAllAvailable()
      val alerts = spark.table("alerts_dup").as[Alert].collect()
        .sortBy(_.at.getTime)
        .map(a => (a.status, a.run_start, a.at, a.n_buckets))
      assert(alerts.toSeq == Seq(
        ("firing", hour(0), hour(2), 3L),
        ("resolved", hour(0), hour(4), 4L),
        ("firing", hour(5), hour(7), 3L)))
    } finally q.stop()
  }

  test("streaming evaluator fails LOUDLY on a late never-folded bucket " +
      "instead of silently swallowing it as a duplicate") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Bucket]
    val q = AlertRules.sustainedAlerts(in.toDS(), threshold = 5L, minRun = 3)
      .writeStream.format("memory").queryName("alerts_late")
      .outputMode(OutputMode.Append).start()
    try {
      // hour 2 folded first; hour 1 then arrives for the FIRST time —
      // the watermarked upstream finalizes buckets in order, so this is
      // an upstream contract violation and must kill the query, not be
      // silently dropped as a replay
      in.addData(Bucket("a", hour(2), 9))
      q.processAllAvailable()
      in.addData(Bucket("a", hour(1), 9))
      val ex = intercept[Exception] { q.processAllAvailable() }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(ex).exists(c =>
        c.isInstanceOf[IllegalStateException] &&
          c.getMessage.contains("never folded")))
    } finally q.stop()
  }

  test("alert_availability: both availability rules fire non-vacuously " +
      "and every run respects its rule's condition and minRun") {
    val sf01 = "/root/testdata/sf0.01"
    val out = operators.StreamQueries.queries("alert_availability")(spark, sf01)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getTimestamp(2),
        r.getTimestamp(3), r.getLong(4)))
    val byRule = out.groupBy(_._1)
    assert(byRule.keySet == Set("ConnectDown", "ConnectorNotRunning"),
      "both availability rules must fire on this corpus")
    // ConnectDown is `for: 2 buckets`: every run spans ≥ 2 hours and its
    // span equals its bucket count (contiguity)
    byRule("ConnectDown").foreach { case (_, _, s, e, n) =>
      assert(n >= 2, "ConnectDown fired on a single down bucket")
      assert(e.getTime - s.getTime == (n - 1) * 3600000L,
        "run span must equal its contiguous bucket count")
    }
    byRule("ConnectorNotRunning").foreach { case (_, _, s, e, n) =>
      assert(n >= 1)
      assert(e.getTime - s.getTime == (n - 1) * 3600000L)
    }
    // every ConnectDown run is also not-RUNNING (DOWN ⊂ ¬RUNNING): each
    // down run must be contained in some not-running run of the same key
    byRule("ConnectDown").foreach { case (_, c, s, e, _) =>
      assert(byRule("ConnectorNotRunning").exists { case (_, c2, s2, e2, _) =>
        c2 == c && !s2.after(s) && !e2.before(e)
      }, s"down run [$s,$e] of $c not covered by a not-RUNNING run")
    }
  }

  test("availability rules: the standing streaming evaluator agrees with " +
      "the graded batch islands on the real scrape grid") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val sf01 = "/root/testdata/sf0.01"
    // rebuild one connector's dense hourly down-grid exactly as
    // alert_availability does (bounded: span-hours for one series)
    val ev = graft.sources.Tables.scan(spark, sf01, "events")
    val conn = "click"
    val perHour = ev.filter(col("event_type") === conn)
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n_ev"))
    val span = ev.agg(date_trunc("hour", min(col("ts"))).as("t0"),
      date_trunc("hour", max(col("ts"))).as("t1"))
    val downBuckets = span
      .select(explode(expr("sequence(t0, t1, interval 1 hour)")).as("h"))
      .join(perHour, Seq("h"), "left")
      .select(lit(conn).as("key"), col("h").cast("timestamp").as("h"),
        when(col("n_ev").isNull, 1L).otherwise(0L).as("n"))
      .as[Bucket].collect().sortBy(_.h.getTime)
    val in = MemoryStream[Bucket]
    val q = AlertRules.sustainedAlerts(in.toDS(), threshold = 1L, minRun = 2)
      .writeStream.format("memory").queryName("avail_stream")
      .outputMode(OutputMode.Append).start()
    try {
      // two micro-batches split mid-span: runs must survive the boundary
      val (a, b) = downBuckets.splitAt(downBuckets.length / 2)
      in.addData(a.toIndexedSeq: _*); q.processAllAvailable()
      in.addData(b.toIndexedSeq: _*); q.processAllAvailable()
      val firings = spark.table("avail_stream").as[Alert].collect()
        .filter(_.status == "firing").map(_.run_start).toSet
      // batch form over the same buckets: ≥2-bucket down islands
      val expected = graft.streaming.AlertRules.sustainedRuns(
        spark.createDataset(downBuckets.toIndexedSeq)
          .toDF("key", "h", "n"), "key", threshold = 1L, minRun = 2)
        .select("run_start").collect().map(_.getTimestamp(0)).toSet
      assert(expected.nonEmpty, "no ≥2h outage on this corpus — vacuous")
      assert(firings == expected,
        s"streaming firings $firings != batch islands $expected")
    } finally q.stop()
  }

  test("graded alert_sustained twin: islands over real hourly buckets " +
      "match an independent per-key scan") {
    // sf0.01, not the suite default sf0.001: ~1 event/hour there keeps
    // the n≥4 condition vacuously false (the driver's gate runs sf0.01)
    val sf01 = "/root/testdata/sf0.01"
    val out = operators.StreamQueries.queries("alert_sustained")(spark, sf01)
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty, "threshold must be non-vacuous on this corpus")
    // recompute naively from the bucket table on the driver (small:
    // types × hours) — the islands window must agree with a linear scan
    val buckets = graft.sources.Tables.scan(spark, sf01, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
    val expected = buckets.groupBy(_._1).toSeq.flatMap { case (k, bs) =>
      val sorted = bs.sortBy(_._2.getTime)
      val runs = scala.collection.mutable.ListBuffer
        .empty[scala.collection.mutable.ListBuffer[(Timestamp, Long)]]
      var lastIdx = Long.MinValue
      for ((_, h, n) <- sorted if n >= 4) {
        val idx = h.getTime / 3600000L
        if (idx != lastIdx + 1 || runs.isEmpty)
          runs += scala.collection.mutable.ListBuffer((h, n))
        else runs.last += ((h, n))
        lastIdx = idx
      }
      runs.filter(_.size >= 3).map(r =>
        (k, r.head._1, r.last._1, r.size.toLong, r.map(_._2).max))
    }
    assert(out.toSet == expected.toSet)
    assert(out.length == expected.length)
  }

  test("alert_consumer_lag: only the wedged partition fires, the run " +
      "starts exactly when cumulative backlog first crosses 1000, and " +
      "the healthy partition's steady one-bucket lag never alerts") {
    val sf01 = "/root/testdata/sf0.01"
    val out = graft.operators.StreamQueries
      .queries("alert_consumer_lag")(spark, sf01)
      .collect()
    assert(out.nonEmpty, "the wedged consumer must fire at sf0.01")
    assert(out.forall(_.getLong(0) == 0L),
      "only partition 0 (the wedged consumer) may alert")
    // recompute the crossing hour linearly: produced counts on partition
    // 0 after the freeze date, cumulative from the frozen offset
    val stall = Timestamp.valueOf("2024-01-12 00:00:00")
    val rows = graft.sources.Tables.scan(spark, sf01, "events")
      .filter(col("event_id") % 2 === 0)
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1)))
      .sortBy(_._1.getTime)
    var backlog = 0L
    var crossing: Option[Timestamp] = None
    for ((h, n) <- rows if !h.before(stall) && crossing.isEmpty) {
      backlog += n
      if (backlog > 1000L) crossing = Some(h)
    }
    assert(crossing.isDefined, "corpus too small to cross the threshold")
    assert(out.head.getTimestamp(1) == crossing.get,
      s"run_start ${out.head.getTimestamp(1)} != first crossing hour " +
        s"${crossing.get}")
  }

  test("text_ngram_counts: counts close against the per-doc token " +
      "lengths and df never exceeds count") {
    val sf01 = "/root/testdata/sf0.01"
    val out = graft.operators.TextQueries
      .queries("text_ngram_counts")(spark, sf01)
      .collect()
    assert(out.length == 40, s"expected 2×top-20, got ${out.length}")
    out.foreach { r =>
      val (n, gram, cnt, df) =
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))
      assert(gram.split(" ").length == n,
        s"'$gram' is not a $n-gram")
      assert(df >= 1 && df <= cnt, s"'$gram': df $df vs cnt $cnt")
    }
    // spot-verify the top bigram's corpus count with an independent
    // driver-side scan (substring-count over the normalized text)
    val top = out.filter(_.getLong(0) == 2L).maxBy(_.getLong(2))
    val (gram, cnt) = (top.getString(1), top.getLong(2))
    val recount = graft.sources.Tables.scan(spark, sf01, "documents")
      .select(lower(trim(col("text"))).as("t")).collect()
      .map { r =>
        val toks = r.getString(0).trim.split("\\s+")
        toks.sliding(2).count(_.mkString(" ") == gram)
      }.sum
    assert(recount.toLong == cnt,
      s"top bigram '$gram': reported $cnt != recounted $recount")
  }
}
