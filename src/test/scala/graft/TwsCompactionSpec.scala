package graft

import graft.streaming.{KeyedChange, TwsCompaction}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** transformWithState compaction must match the flatMapGroupsWithState
  * semantics: max-(lsn, deleted) wins, replays/stale events emit nothing. */
class TwsCompactionSpec extends SparkSpec {

  test("tws compaction upserts by position and ignores replays") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val in = MemoryStream[KeyedChange]
      val q = TwsCompaction.compact(in.toDS())
        .writeStream.format("memory").queryName("tws")
        .outputMode(OutputMode.Update).start()
      try {
        in.addData(
          KeyedChange(1L, 10L, deleted = false, "v1"),
          KeyedChange(2L, 20L, deleted = false, "v2"),
          KeyedChange(1L, 15L, deleted = false, "v1b"))
        q.processAllAvailable()
        in.addData(
          KeyedChange(1L, 15L, deleted = false, "v1b"), // replay
          KeyedChange(2L, 5L, deleted = false, "stale"),
          KeyedChange(2L, 25L, deleted = true, "v2"))
        q.processAllAvailable()
        val out = spark.table("tws")
          .groupBy($"key")
          .agg(max(struct($"lsn", $"deleted", $"payload")).as("s"))
          .select($"key", $"s.lsn", $"s.deleted", $"s.payload")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
            r.getString(3))).toSet
        assert(out == Set((1L, 15L, false, "v1b"), (2L, 25L, true, "v2")))
        assert(spark.table("tws").count() == 3) // no replay/stale emissions
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
