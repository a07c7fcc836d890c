package graft

import graft.plans.{AsOfJoin, AsOfJoinExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.functions._

/** Contracts for the whole-operator as-of join extension: row-identical
  * to the composed union-window form on real data, correct on handwritten
  * edge cases (ties, no-match, null keys, interleaved histories), and the
  * intended physical shape (one hash exchange per side, the custom exec
  * node in the plan). */
class AsOfJoinSpec extends SparkSpec {

  test("custom exec is row-identical to the composed join_asof operator") {
    val composed = SparkEntry.queries("join_asof")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val exec = SparkEntry.queries("join_asof_exec")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(exec == composed)
    assert(exec.nonEmpty)
  }

  test("edge cases: exact-time tie is inclusive, stale keys don't leak, " +
      "null keys and unmatched rows go NULL") {
    val spark0 = spark
    import spark0.implicits._
    val left = Seq(
      (1L, 100L, "e1"), // exact tie with right (1, 100) -> inclusive match
      (1L, 99L, "e2"),  // before any right row of key 1 -> NULL
      (2L, 500L, "e3"), // key 2's newest <=500 is (2, 400)
      (3L, 100L, "e4"), // key 3 has no right rows at all -> NULL
      (5L, 100L, "e5")  // key 5 only has a LATER right row -> NULL
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 100L, "r1-100"),
      (2L, 300L, "r2-300"),
      (2L, 400L, "r2-400"),
      (2L, 600L, "r2-600"), // in the future of e3 -> must not match
      (4L, 50L, "r4-50"),   // key with no left rows: flushes through
      (5L, 200L, "r5-200")
    ).toDF("k", "t", "v")
    val got = AsOfJoin.asof(left, right, "k", "k", "t", "t")
      .select(col("tag"), col("v"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got == Map(
      "e1" -> Some("r1-100"),
      "e2" -> None,
      "e3" -> Some("r2-400"),
      "e4" -> None,
      "e5" -> None))
  }

  test("optimizer rule: a left-only predicate above the as-of join " +
      "reaches the parquet scan; right-side conjuncts stay above") {
    val e = graft.sources.Tables.scan(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"))
    val o = graft.sources.Tables.scan(spark, sfDir, "orders")
      .select(col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("ot_us"),
        col("o_orderkey"))
    val joined = AsOfJoin.asof(e, o, "user_id", "o_custkey", "ts_us", "ot_us")
    val filtered = joined.filter(
      col("event_id") < 100 && col("o_orderkey").isNotNull)
    val planStr = filtered.queryExecution.executedPlan.toString
    // the left-only conjunct crossed the custom node and reached the scan
    assert(planStr.contains("LessThan(event_id,100)"),
      s"left predicate must reach PushedFilters:\n$planStr")
    // the right-side conjunct did NOT get pushed into the orders scan —
    // PushedFilters prints CamelCase, a residual FilterExec prints
    // lowercase, so the two spellings separate the cases cleanly
    assert(!planStr.contains("IsNotNull(o_orderkey)"),
      s"right predicate must not reach a scan:\n$planStr")
    assert(planStr.contains("isnotnull(o_orderkey"),
      s"right predicate must still evaluate above the join:\n$planStr")
    // and semantics are unchanged vs evaluating everything above
    val expected = joined.select(col("event_id"), col("o_orderkey"))
      .collect().count(r => r.getLong(0) < 100 && !r.isNullAt(1))
    assert(filtered.count() == expected)
  }

  test("physical plan: the custom exec node with one hash exchange per side") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = SparkEntry.queries("join_asof_exec")(spark, sfDir)
        .queryExecution.executedPlan
      assert(plan.collect { case e: AsOfJoinExec => e }.size == 1,
        s"expected AsOfJoinExec in:\n$plan")
      val hashShuffles = plan.collect {
        case e: ShuffleExchangeExec
            if e.outputPartitioning.isInstanceOf[HashPartitioning] => e
      }
      // left side key exchange + right side key exchange + the right
      // dedup aggregate's own (custkey, orderdate) exchange — which
      // cannot double as custkey clustering (multi-column hash does not
      // co-locate per custkey), so the join legitimately re-keys it
      assert(hashShuffles.size == 3,
        s"expected exactly 3 hash exchanges, got ${hashShuffles.size}:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
