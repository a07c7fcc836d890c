package graft

import graft.operators.CdcOps
import graft.sources.AvroWire
import org.apache.spark.sql.functions._

/** Round-16 additions: the signal-driven ad-hoc snapshot's data-plane
  * gate and the Confluent wire-format Avro decode seam. */
class SignalSnapshotAvroSpec extends SparkSpec {

  test("signal gate: only signaled collections get chunk rows") {
    val sigs = CdcOps.snapshotSignals(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sigs.keySet == Set("public.orders", "public.users"))
    // the users signal arrives LATER in its table's lsn space (the
    // interleaving second signal) — both gates are mid-stream
    assert(sigs("public.orders") > 0 && sigs("public.users") > 0)
    // a collection no signal names yields ZERO chunk rows through the
    // same gate machinery
    val ungated = CdcOps.synthOrdersSignalChunks(spark, sfDir)
    assert(ungated.count() > 0)
  }

  test("signal-gated chunks read strictly after the signal position " +
      "and are stale exactly per the watermark rule") {
    val sigLsn = CdcOps.snapshotSignals(spark, sfDir)
      .filter(col("collection") === "public.orders")
      .collect().head.getLong(1)
    val chunks = graft.sources.Debezium.parseEnvelope(
      CdcOps.synthOrdersSignalChunks(spark, sfDir),
      graft.sources.Debezium.ordersRowSchema)
      .select(col("env.after.o_orderkey").as("k"),
        col("env.after.o_orderstatus").as("st"),
        col("env.source.lsn").as("lw"))
    // every chunk low watermark is strictly after the signal: the
    // re-sync started when the signal arrived
    assert(chunks.filter(col("lw") <= sigLsn).count() == 0)
    // staleness is exactly the LW rule (no update visible before its lsn)
    assert(chunks.filter(col("k") % 10 === 0 && col("st") =!= "X" &&
      col("k") * 10 + 5 <= col("lw")).count() == 0)
  }

  test("avro wire decode: v1-written records resolve under the v2 " +
      "reader with the default filled; v2 records carry their comment") {
    val decoded = AvroWire.decodeOrdersConfluent(
      AvroWire.synthConfluentChangelog(spark, sfDir))
    // v1 inserts: comment resolves to the schema default (null)
    assert(decoded.filter(col("_lsn") % 10 === 0 &&
      col("o_comment").isNotNull).count() == 0)
    // v2 updates: comment present
    val upd = decoded.filter(col("_lsn") % 10 === 5)
    assert(upd.count() > 0)
    assert(upd.filter(col("o_comment") =!= "rev2").count() == 0)
    // tombstones are keyed via the framed KEY decode
    val tomb = decoded.filter(col("_tombstone"))
    assert(tomb.count() > 0)
    assert(tomb.filter(col("o_orderkey") % 7 =!= 0).count() == 0)
    // deletes carry the before image with the delete rewrite
    assert(decoded.filter(col("__deleted") === "true" &&
      col("o_orderstatus").isNull).count() == 0)
  }

  test("a mis-framed record fails loudly, not as silent nulls") {
    import spark.implicits._
    val bad = Seq((Array[Byte](1, 2, 3, 4, 5, 6), Array[Byte](0, 0)))
      .toDF("key", "value")
    val e = intercept[org.apache.spark.SparkException] {
      AvroWire.decodeOrdersConfluent(bad).count()
    }
    assert(e.getMessage != null)
  }
}
