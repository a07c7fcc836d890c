package graft

import graft.plans.AsOfJoinPlan
import graft.streaming.StreamJoins
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import scala.collection.mutable

/** Stream-static TEMPORAL enrichment (streaming/StreamJoins.temporalEnrich):
  * every event must join the dimension version in effect at its EVENT time
  * via the custom as-of exec, across micro-batch boundaries. */
class StreamTemporalEnrichSpec extends SparkSpec {

  test("events join the version in effect at event time, per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // three versions of key 1, one of key 2 — valid-from in epoch micros
    val dim = Seq(
      (1L, 100L, "v1"), (1L, 200L, "v2"), (1L, 300L, "v3"),
      (2L, 150L, "p1"))
      .toDF("dim_key", "valid_from_us", "ver")

    val in = MemoryStream[(Long, Long)]
    val events = in.toDF().toDF("k", "t_us")

    val got = mutable.ArrayBuffer[(Long, Long, Option[String])]()
    var sawAsOfNode = false
    val q = StreamJoins.temporalEnrich(
      events, dim, "k", "dim_key", "t_us", "valid_from_us") { (df, _) =>
      // the batch plan must carry the custom whole-operator node (the only
      // strategy that can plan it is AsOfJoinStrategy, so execution
      // succeeding proves the custom exec ran)
      if (df.queryExecution.optimizedPlan
        .collectFirst { case p: AsOfJoinPlan => p }.nonEmpty)
        sawAsOfNode = true
      got ++= df.select("k", "t_us", "ver").collect().map(r =>
        (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getString(2))))
    }.start()

    try {
      in.addData((1L, 250L), (1L, 50L), (2L, 150L))
      q.processAllAvailable()
      // second batch: exact version boundary + just-before-first-version
      in.addData((1L, 300L), (2L, 149L), (3L, 500L))
      q.processAllAvailable()
    } finally q.stop()

    val expected = Set(
      (1L, 250L, Some("v2")),  // between v2@200 and v3@300 → v2
      (1L, 50L, None),         // before any version → NULL dim
      (2L, 150L, Some("p1")),  // inclusive at-or-before boundary
      (1L, 300L, Some("v3")),  // exact boundary picks the new version
      (2L, 149L, None),        // one tick before the only version
      (3L, 500L, None))        // key with no history at all
    assert(got.toSet === expected)
    assert(got.size === expected.size) // no duplicate emission across batches
    assert(sawAsOfNode, "batch plan never contained AsOfJoinPlan")
  }
}
