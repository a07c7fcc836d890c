package graft

import graft.streaming.{TxnApply, TxnApplied, TxnFeedEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Transactional apply (consumer side of transaction metadata): buffer a
  * transaction's data events until the END record confirms the count,
  * emit once, never re-emit on replay. */
class TxnApplySpec extends SparkSpec {

  private def ev(txid: Long, lsn: Long) =
    TxnFeedEvent(txid, "orders", lsn, end = false, expected = 0L)
  private def end(txid: Long, n: Long) =
    TxnFeedEvent(txid, "orders", 0L, end = true, expected = n)

  test("a transaction applies only when END confirms all events arrived") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[TxnFeedEvent]
    val q = TxnApply(in.toDS())
      .writeStream.format("memory").queryName("txn_apply_1")
      .outputMode(OutputMode.Update).start()
    try {
      // batch 1: two of three events + END — must stay buffered
      in.addData(ev(1, 10), ev(1, 11), end(1, 3))
      q.processAllAvailable()
      assert(spark.table("txn_apply_1").count() == 0)
      // batch 2: the missing event lands — tx 1 applies exactly now
      in.addData(ev(1, 12))
      q.processAllAvailable()
      val out = spark.table("txn_apply_1").as[TxnApplied].collect()
      assert(out.toSeq == Seq(TxnApplied(1, 3, 10, 12)))
    } finally q.stop()
  }

  test("replays never double-apply: duplicate events and a replayed END") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[TxnFeedEvent]
    val q = TxnApply(in.toDS())
      .writeStream.format("memory").queryName("txn_apply_2")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData(ev(7, 100), ev(7, 100), end(7, 2), ev(7, 101))
      q.processAllAvailable()
      assert(spark.table("txn_apply_2").count() == 1)
      // at-least-once: the whole transaction redelivered after apply
      in.addData(ev(7, 100), ev(7, 101), end(7, 2))
      q.processAllAvailable()
      assert(spark.table("txn_apply_2").count() == 1)
    } finally q.stop()
  }

  test("two collections sharing an lsn both count — (collection, lsn) identity") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[TxnFeedEvent]
    val q = TxnApply(in.toDS())
      .writeStream.format("memory").queryName("txn_apply_xl")
      .outputMode(OutputMode.Update).start()
    try {
      // the fixture design pairs same-key cross-table events into one tx
      // AT THE SAME LSN (orders insert 10k / users insert 10k, txid 5k);
      // an lsn-only dedup would discard the second as a replay and stall
      // the transaction forever
      in.addData(
        TxnFeedEvent(5, "orders", 10, end = false, 0L),
        TxnFeedEvent(5, "users", 10, end = false, 0L),
        end(5, 2))
      q.processAllAvailable()
      assert(spark.table("txn_apply_xl").as[TxnApplied].collect().toSeq ==
        Seq(TxnApplied(5, 2, 10, 10)))
    } finally q.stop()
  }

  test("an END declaring zero events never crashes the query") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[TxnFeedEvent]
    val q = TxnApply(in.toDS())
      .writeStream.format("memory").queryName("txn_apply_z")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData(end(9, 0), ev(1, 10), end(1, 1))
      q.processAllAvailable()
      // the empty transaction emits nothing (nothing to apply); the
      // real one still flows
      assert(spark.table("txn_apply_z").as[TxnApplied]
        .collect().map(_.txid).toSeq == Seq(1L))
    } finally q.stop()
  }

  test("batch twin: lag tears transactions, torn ones are held not torn-applied") {
    import org.apache.spark.sql.functions._
    val status = graft.operators.CdcQueries
      .queries("cdc_txn_apply")(spark, sfDir)
    // the lagging users topic must actually tear something, else the
    // query degenerates to "everything applied"
    assert(status.filter(!col("applied")).count() > 0)
    // fully-torn transactions (zero events arrived) are REPORTED, not
    // silently dropped — they are the ones a consumer most needs to see
    assert(status.filter(col("arrived") === 0).count() > 0)
    // a held transaction is always short of events — never over-counted,
    // never applied short
    assert(status.filter(col("arrived") > col("expected")).count() == 0)
    assert(status.filter(!col("applied") &&
      col("arrived") === col("expected")).count() == 0)
  }

  test("more distinct events than END declared fails loudly, not masked") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[TxnFeedEvent]
    val q = TxnApply(in.toDS())
      .writeStream.format("memory").queryName("txn_apply_over")
      .outputMode(OutputMode.Update).start()
    try {
      // END declares 1 event but two DISTINCT (collection, lsn) events
      // arrive — an upstream metadata/feed inconsistency that must not be
      // silently applied with a surplus-spanning lsn range
      in.addData(ev(3, 30), ev(3, 31), end(3, 1))
      val thrown = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(thrown).exists(c =>
        c.isInstanceOf[IllegalStateException] &&
          c.getMessage.contains("declared 1 events but 2")))
    } finally q.stop()
  }

  test("eviction mode: applied tombstones are dropped after the replay window; a later archive replay re-applies") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[TxnFeedEvent]
    // eviction mode: processAllAvailable can NEVER return under
    // ProcessingTimeTimeout (the engine always schedules another batch to
    // fire timeouts, so noNewData is never signaled) — poll the sink with
    // a deadline instead, per the operator's caller contract
    val q = TxnApply(in.toDS(), replayWindowMs = Some(1L))
      .writeStream.trigger(Trigger.ProcessingTime("250 milliseconds"))
      .format("memory").queryName("txn_apply_evict")
      .outputMode(OutputMode.Update).start()
    def awaitApplied(n: Long): Unit = {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (spark.table("txn_apply_evict").count() < n) {
        if (System.nanoTime() > deadline)
          fail(s"timed out waiting for $n applied records")
        Thread.sleep(100)
      }
    }
    try {
      in.addData(ev(4, 40), end(4, 1))
      awaitApplied(1)
      // the data-less timeout batches the trigger schedules fire the 1 ms
      // eviction on their own — no extra input needed; give them a moment
      Thread.sleep(1000)
      // beyond the replay window a redelivery is the archive-replay case:
      // the tombstone is gone, so the transaction applies again — which is
      // exactly what proves the state entry was evicted (bounded state)
      in.addData(ev(4, 40), end(4, 1))
      awaitApplied(2)
      assert(spark.table("txn_apply_evict").as[TxnApplied]
        .filter(_.txid == 4L).count() == 2)
    } finally q.stop()
  }

  test("batch twin: a lagging transaction topic reports expected = null") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ev = Seq((1L, "orders", 10L), (2L, "orders", 20L))
      .toDF("txid", "collection", "lsn")
    val meta = Seq((1L, 1L, 10L), (2L, 1L, 20L))
      .toDF("txid", "event_count", "max_lsn")
    // END records ride at the transaction's max lsn; the transaction
    // topic's consumer is at offset 15, so txn 2's END is still in flight
    val st = TxnApply.applyStatusBatch(ev, meta, endCutoff = 15L)
      .orderBy("txid").collect()
    assert(st(0).getAs[Long]("arrived") == 1L
      && st(0).getAs[Long]("expected") == 1L
      && st(0).getAs[Boolean]("applied"))
    // all of txn 2's data events arrived, but with its END unseen the
    // expected count is UNKNOWN (null), and it must not apply on count
    // coincidence — the branch the graded query's caught-up txn topic
    // never exercises
    assert(st(1).getAs[Long]("arrived") == 1L
      && st(1).isNullAt(st(1).fieldIndex("expected"))
      && !st(1).getAs[Boolean]("applied"))
  }

  test("independent transactions complete independently") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[TxnFeedEvent]
    val q = TxnApply(in.toDS())
      .writeStream.format("memory").queryName("txn_apply_3")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData(ev(1, 10), end(1, 1), ev(2, 20), end(2, 2))
      q.processAllAvailable()
      val done = spark.table("txn_apply_3").as[TxnApplied].collect()
      assert(done.map(_.txid).toSet == Set(1L)) // tx 2 still in flight
      in.addData(ev(2, 21))
      q.processAllAvailable()
      assert(spark.table("txn_apply_3").as[TxnApplied]
        .collect().map(_.txid).toSet == Set(1L, 2L))
    } finally q.stop()
  }
}
