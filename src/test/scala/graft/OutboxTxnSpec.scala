package graft

import graft.operators.CdcOps
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Outbox Event Router (B7) + transaction-metadata reconstruction:
  * the two SMT-adjacent operators over the synthesized outbox and
  * multi-table changelogs. */
class OutboxTxnSpec extends SparkSpec {

  test("outbox router emits exactly the INSERTs, routed by aggregatetype") {
    val routed = CdcOps.outboxRoute(CdcOps.parsedOutbox(spark, sfDir))
    val events = Tables.scan(spark, sfDir, "events")

    // one routed record per source event — cleanup deletes (id%3==0) and
    // their tombstones must be invisible even though they are in the feed
    assert(routed.count() == events.count())
    assert(routed.filter(col("event_id") % 3 === 0).count() ==
      events.filter(col("event_id") % 3 === 0).count())

    // routing: topic = prefix + aggregatetype, key = aggregateid
    val bad = routed.join(events, "event_id")
      .filter(col("topic") =!= concat(lit("outbox.event."), col("event_type")) ||
        col("key") =!= col("user_id").cast("string"))
    assert(bad.count() == 0)
  }

  test("outbox payload survives the envelope round-trip verbatim") {
    val routed = CdcOps.outboxRoute(CdcOps.parsedOutbox(spark, sfDir))
    val events = Tables.scan(spark, sfDir, "events")
    // props is itself a JSON string — the worst case for a JSON-in-JSON
    // round trip (quotes must escape and unescape losslessly)
    val mismatched = routed.join(events, "event_id")
      .filter(!(col("payload") <=> col("props")))
    assert(mismatched.count() == 0)
  }

  test("custom topic prefix is honored") {
    val routed = CdcOps.outboxRoute(
      CdcOps.parsedOutbox(spark, sfDir), topicPrefix = "evt.")
    assert(routed.filter(!col("topic").startsWith("evt.")).count() == 0)
  }

  test("txn meta counts each replayed event once") {
    val meta = CdcOps.txnMeta(CdcOps.parsedOrders(spark, sfDir))
    // orders synthesis: every tx holds exactly ONE distinct orders event
    // (txId = lsn/2 with lsn strides of 10), and the k%20 replay shares
    // its update's lsn — so any event_count > 1 means the replay leaked
    // through the (collection, lsn) dedup
    assert(meta.filter(col("event_count") =!= 1).count() == 0)
    // ...and the replayed update's tx is present exactly once
    val k20 = Tables.scan(spark, sfDir, "orders")
      .filter(col("o_orderkey") % 20 === 0).count()
    assert(meta.filter(col("txid") % 5 === 2 && col("txid") % 10 === 2)
      .count() >= k20)
  }

  test("multi-table transactions report per-collection counts") {
    val meta = CdcOps.txnMeta(
      CdcOps.parsedOrders(spark, sfDir), CdcOps.parsedUsers(spark, sfDir))
    // same-key insert txs span both collections: customer keys are a
    // subset of order keys' range, so orders:1,users:1 rows must exist
    val both = meta.filter(col("data_collections") === "orders:1,users:1")
    assert(both.count() > 0)
    // event_count is the sum of the per-collection counts
    val parsedBad = meta.withColumn("parts",
        expr("aggregate(transform(split(data_collections, ','), " +
          "p -> CAST(element_at(split(p, ':'), 2) AS BIGINT)), " +
          "0L, (a, x) -> a + x)"))
      .filter(col("parts") =!= col("event_count"))
    assert(parsedBad.count() == 0)
  }
}
