package graft.operators

import graft.QueryGroup
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch-verifiable forms of the streaming operators (SURVEY.md §2.C ops
  * 37-40): the same `window()` / `session_window()` / dedup expressions run
  * identically over a bounded DataFrame, which is what makes them
  * DuckDB-oracle-checkable. The unbounded forms (watermarks, state store,
  * triggers) live in [[graft.streaming.StreamOps]] /
  * [[graft.streaming.StatefulCompaction]] and are covered by
  * StreamingSpec with MemoryStream sources.
  */
object StreamQueries extends QueryGroup {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // op 37: tumbling 1-minute windows per event_type
    "stream_tumbling" -> ((s, dir) => {
      Tables.scan(s, dir, "events")
        .groupBy(window(col("ts"), "1 minute"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("w_start"), col("event_type"),
          col("n"))
        .orderBy("w_start", "event_type")
    }),

    // op 38: sliding 5-minute windows, 1-minute slide — each event lands in
    // 5 overlapping windows
    "stream_sliding" -> ((s, dir) => {
      Tables.scan(s, dir, "events")
        .groupBy(window(col("ts"), "5 minutes", "1 minute"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("value") * 100).cast("long")).as("sum_cents"))
        .select(col("window.start").as("w_start"), col("n"),
          col("sum_cents"))
        .orderBy("w_start")
    }),

    // op 39: gap-based session windows per user (10-minute gap)
    "stream_session" -> ((s, dir) => {
      Tables.scan(s, dir, "events")
        .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"),
          col("session_window.start").as("s_start"),
          col("session_window.end").as("s_end"), col("n"))
        .orderBy("user_id", "s_start")
    }),

    // op 40 (batch form): at-least-once replay dedup — the log replayed
    // twice must collapse back to exactly the original rows
    "stream_dedup" -> ((s, dir) => {
      val ev = Tables.scan(s, dir, "events")
        .select("event_id", "user_id", "event_type", "value")
      ev.unionByName(ev)
        .dropDuplicates("event_id")
        .orderBy("event_id")
    }),

    // op 20' (the `for: 5m` half of alerting): sustained-condition alert
    // runs — hourly event counts per type that meet the threshold for ≥ 3
    // CONTIGUOUS hours (a spike alone never fires). Batch twin of the
    // standing evaluator [[graft.streaming.AlertRules.sustainedAlerts]];
    // the islands form here is also the backfill path a deployment runs
    // to score historical rule coverage.
    "alert_sustained" -> ((s, dir) => {
      graft.streaming.AlertRules.sustainedRuns(
        Tables.scan(s, dir, "events")
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("n")),
        keyCol = "event_type", threshold = 4L, minRun = 3)
        .orderBy("event_type", "run_start")
    }))

  val oracles: Map[String, String] = Map(
    "stream_tumbling" ->
      """SELECT date_trunc('minute', ts) AS w_start, event_type,
        |  COUNT(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,

    "stream_sliding" ->
      """SELECT date_trunc('minute', ts) - k.k * INTERVAL 1 MINUTE AS w_start,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_cents
        |FROM events CROSS JOIN (SELECT unnest(range(0, 5)) AS k) k
        |GROUP BY 1 ORDER BY w_start""".stripMargin,

    "stream_session" ->
      """WITH o AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |m AS (SELECT user_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        |  FROM o),
        |g AS (SELECT user_id, ts,
        |    SUM(CASE WHEN prev IS NULL OR ts - prev >= INTERVAL 10 MINUTE
        |      THEN 1 ELSE 0 END) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m)
        |SELECT user_id, MIN(ts) AS s_start,
        |  MAX(ts) + INTERVAL 10 MINUTE AS s_end, COUNT(*) AS n
        |FROM g GROUP BY user_id, sid ORDER BY user_id, s_start""".stripMargin,

    "stream_dedup" ->
      """SELECT DISTINCT event_id, user_id, event_type, value
        |FROM (SELECT * FROM events UNION ALL SELECT * FROM events)
        |ORDER BY event_id""".stripMargin,

    "alert_sustained" ->
      """WITH m AS (SELECT event_type, date_trunc('hour', ts) AS h,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |f AS (SELECT *,
        |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        |  FROM m WHERE n >= 4),
        |g AS (SELECT *, CAST(epoch(h) AS BIGINT) // 3600 - rn AS grp
        |  FROM f)
        |SELECT event_type, MIN(h) AS run_start, MAX(h) AS run_end,
        |  COUNT(*) AS n_hours, MAX(n) AS peak
        |FROM g GROUP BY event_type, grp
        |HAVING COUNT(*) >= 3
        |ORDER BY event_type, run_start""".stripMargin)
}
