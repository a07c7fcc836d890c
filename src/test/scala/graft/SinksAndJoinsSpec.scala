package graft

import graft.operators.CdcOps
import graft.sources.Debezium
import graft.streaming.{Sinks, StreamJoins}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files
import java.sql.Timestamp

/** Sink idempotence, streaming joins, and the CdcPipeline builder API. */
class SinksAndJoinsSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("upsertByKey sink: replayed batches do not change sink state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_sink").toString + "/t"
    val in = MemoryStream[(Long, Long, String)]
    val q = Sinks.upsertByKey(
      in.toDF().toDF("k", "lsn", "v"), dir, "k", "lsn")
      .start()
    try {
      in.addData((1L, 10L, "a"), (2L, 20L, "b"))
      q.processAllAvailable()
      in.addData((1L, 10L, "a"), (1L, 15L, "a2")) // replay + newer
      q.processAllAvailable()
      val state = spark.read.parquet(dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(state == Set((1L, 15L, "a2"), (2L, 20L, "b")))
    } finally q.stop()
  }

  test("stream-static enrich broadcasts the dim side") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dim = Seq((1L, "BUILDING"), (2L, "MACHINERY")).toDF("k", "seg")
    val in = MemoryStream[Long]
    val q = StreamJoins.enrich(in.toDF().toDF("k"), dim, Seq("k"))
      .writeStream.format("memory").queryName("enriched").start()
    try {
      in.addData(1L, 2L, 3L)
      q.processAllAvailable()
      val rows = spark.table("enriched").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
      assert(rows == Set((1L, Some("BUILDING")), (2L, Some("MACHINERY")),
        (3L, None)))
    } finally q.stop()
  }

  test("stream-stream interval join matches only in-window pairs") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val orders = MemoryStream[(Long, Timestamp)]
    val pays = MemoryStream[(Long, Timestamp)]
    val joined = StreamJoins.intervalJoin(
      orders.toDF().toDF("k", "o_ts"), "o_ts",
      pays.toDF().toDF("k", "p_ts"), "p_ts",
      "k", lateness = "10 minutes", maxDelay = "5 minutes")
      .select("k")
    val q = joined.writeStream.format("memory").queryName("ssj").start()
    try {
      orders.addData((1L, ts("2024-01-01 00:00:00")),
        (2L, ts("2024-01-01 00:00:00")))
      pays.addData((1L, ts("2024-01-01 00:03:00")),  // within 5 min → match
        (2L, ts("2024-01-01 00:09:00")))             // beyond → no match
      q.processAllAvailable()
      assert(spark.table("ssj").collect().map(_.getLong(0)).toSeq == Seq(1L))
    } finally q.stop()
  }

  test("CdcPipeline builder materializes a configured table") {
    val cfg = CdcPipelineConfig(
      tables = Map("orders" -> Debezium.ordersRowSchema),
      keyColumns = Map("orders" -> Seq("o_orderkey")))
    val pipe = new CdcPipeline(cfg)
    val raw = CdcOps.synthOrdersChangelog(spark, sfDir)
    val current = pipe.table(raw, "orders")
    val expected = CdcOps.ordersCompacted(spark, sfDir)
    assert(current.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(current).count() == 0)
    intercept[IllegalArgumentException](pipe.unwrapped(raw, "nope"))
  }
}
