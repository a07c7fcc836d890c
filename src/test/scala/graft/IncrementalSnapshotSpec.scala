package graft

import graft.operators.CdcOps
import graft.sources.{Debezium, Tables}
import org.apache.spark.sql.functions._

/** Incremental snapshot (A4'): chunked snapshot reads at per-chunk WAL
  * positions merged with the live stream through the standard compaction
  * window — the DBLog watermark reduction. */
class IncrementalSnapshotSpec extends SparkSpec {

  private def chunks =
    Debezium.parseEnvelope(
      CdcOps.synthOrdersSnapshotChunks(spark, sfDir),
      Debezium.ordersRowSchema)

  test("early chunks are genuinely stale (the merge has work to do)") {
    // a key whose update/delete postdates its chunk's low watermark shows
    // the PRE-event image in the chunk; if no such row existed, the query
    // would only be re-testing plain snapshot ∪ stream
    val stale = chunks
      .select(col("env.after.o_orderkey").as("k"),
        col("env.after.o_orderstatus").as("st"),
        col("env.source.lsn").as("lw"))
      .filter(col("k") % 10 === 0 && col("st") =!= "X")
    assert(stale.count() > 0)
    // ...and staleness is exactly the watermark rule: update not yet
    // visible at the chunk's read position
    assert(stale.filter(col("k") * 10 + 5 <= col("lw")).count() == 0)
  }

  test("chunk rows never show a state later than their watermark") {
    val bad = chunks
      .select(col("env.after.o_orderkey").as("k"),
        col("env.after.o_orderstatus").as("st"),
        col("env.source.lsn").as("lw"))
      .filter(col("st") === "X" && col("k") * 10 + 5 > col("lw"))
    assert(bad.count() == 0)
  }

  test("merged state equals the straight-compaction state") {
    val merged = CdcOps.ordersIncrementalSnapshot(spark, sfDir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val direct = CdcOps.ordersCompacted(spark, sfDir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    assert(merged.exceptAll(direct).count() == 0)
    assert(direct.exceptAll(merged).count() == 0)
  }

  test("keys deleted after their chunk's read are still deleted") {
    // chunk included the key (delete past LW), stream's delete must win
    val k = col("o_orderkey")
    val deletedKeys = Tables.scan(spark, sfDir, "orders")
      .filter(k % 7 === 0).select(k.as("dk"))
    val leaked = CdcOps.ordersIncrementalSnapshot(spark, sfDir)
      .join(deletedKeys, col("o_orderkey") === col("dk"), "left_semi")
    assert(leaked.count() == 0)
  }
}
