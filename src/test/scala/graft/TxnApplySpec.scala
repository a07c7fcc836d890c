package graft

import graft.streaming.{TxnApply, TxnApplied, TxnFeedEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

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
