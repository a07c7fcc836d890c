package graft.operators

import graft.QueryGroup
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Time-series operators over `events` (SURVEY.md §2.C op 48): resample to
  * a fixed grid with gap fill, and per-key time-range sliding statistics.
  *
  * Scale design: the minute spine is `sequence()`-generated from two global
  * scalars (min/max) and immediately redistributed (the 1-row bounds
  * aggregate would otherwise run the whole explode in one task), so gap
  * fill joins the spine against the aggregated (already small) per-minute
  * table — no shuffle of raw events beyond the one groupBy. Sliding stats use a RANGE window over
  * epoch seconds, partitioned by user — one hash shuffle, state bounded by
  * the window span per key.
  *
  * Determinism: moving sums of raw doubles are not order-stable across
  * engines, so sums use `floor(value*100)` integers (exact) — the
  * cents-quantized analytic, a standard trick for reproducible pipelines.
  */
object TimeSeriesQueries extends QueryGroup {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // resample to 1-minute grid per event_type with zero-filled gaps
    "ts_resample" -> ((s, dir) => {
      val ev = Tables.scan(s, dir, "events")
        .select(col("event_type"), date_trunc("minute", col("ts")).as("m"),
          col("value"))
      val agg = ev.groupBy("event_type", "m")
        .agg(count(lit(1)).as("n"),
          sum(floor(col("value") * 100).cast("long")).as("sum_cents"))
      val bounds = ev.agg(min(col("m")).as("lo"), max(col("m")).as("hi"))
      val spine = bounds
        .select(explode(sequence(col("lo"), col("hi"),
          expr("INTERVAL 1 MINUTE"))).as("m"))
        // the bounds aggregate is one row, so the explode runs in ONE task;
        // spread the generated minutes across the cluster before the
        // (×event_type) crossJoin and gap-fill join — for a multi-year
        // range the spine is millions of rows and must not serialize on a
        // single task. Hash on m: the gap-fill join below re-clusters on
        // (event_type, m) anyway, so round-robin vs hash is equivalent
        // work; hash keeps the stage deterministic.
        .repartition(col("m"))
        .crossJoin(ev.select("event_type").distinct())
      spine.join(agg, Seq("event_type", "m"), "left")
        .select(col("event_type"), col("m"),
          coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("sum_cents"), lit(0L)).as("sum_cents"))
        .orderBy("event_type", "m")
    }),

    // gap-fill by LINEAR INTERPOLATION — the numeric twin of ts_resample's
    // zero-fill: a missing minute takes the value on the line between the
    // nearest observed minutes (sensor/metric semantics, where zero-fill
    // would fabricate drops). Two RUNNING-frame window passes per series
    // carry the previous/next observation and its position — the "next"
    // side runs DESCENDING with the same unboundedPreceding..current
    // frame, because Spark's UnboundedFollowing frames rescan the
    // partition tail per row (O(n²) per series — measured as a hang on
    // the 216k-row spine) while running frames are one O(n) pass. No
    // self-join, no per-gap explode; edges (before first / after last
    // observation) stay NULL. Determinism: observations are exact cents; the
    // interpolation is the same single-IEEE-op expression tree in both
    // engines, so the doubles are bit-identical.
    "ts_interp" -> ((s, dir) => {
      val ev = Tables.scan(s, dir, "events")
        .select(col("event_type"), date_trunc("minute", col("ts")).as("m"),
          col("value"))
      val obs = ev.groupBy("event_type", "m")
        .agg((sum(floor(col("value") * 100).cast("long")).cast("double")
          / count(lit(1)).cast("double")).as("v"))
      val bounds = ev.agg(min(col("m")).as("lo"), max(col("m")).as("hi"))
      val spine = bounds
        .select(explode(sequence(col("lo"), col("hi"),
          expr("INTERVAL 1 MINUTE"))).as("m"))
        .repartition(col("m")) // same single-task-explode fix as ts_resample
        .crossJoin(ev.select("event_type").distinct())
      val mu = unix_micros(col("m").cast("timestamp"))
      val wPrev = Window.partitionBy("event_type").orderBy("m")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wNext = Window.partitionBy("event_type").orderBy(col("m").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(obs, Seq("event_type", "m"), "left")
        .withColumn("mu", mu)
        .withColumn("pv", last(col("v"), ignoreNulls = true).over(wPrev))
        .withColumn("pm",
          last(when(col("v").isNotNull, col("mu")), ignoreNulls = true)
            .over(wPrev))
        .withColumn("nv", last(col("v"), ignoreNulls = true).over(wNext))
        .withColumn("nm",
          last(when(col("v").isNotNull, col("mu")), ignoreNulls = true)
            .over(wNext))
        .select(col("event_type"), col("m"),
          when(col("v").isNotNull, col("v"))
            .otherwise(
              (col("nv") - col("pv"))
                * (col("mu") - col("pm")).cast("double")
                / (col("nm") - col("pm")).cast("double")
                + col("pv"))
            .as("v_cents"),
          col("v").isNotNull.cast("int").as("is_observed"))
        .orderBy("event_type", "m")
    }),

    // sessionized conversion funnel: gap-based sessions (islands form, the
    // batch twin of session_window), then per-session view→click→purchase
    // progression — the composed product-analytics shape over the events
    // stream. One shuffle for the session window, one for the rollup.
    "ts_funnel" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val sessions = Tables.scan(s, dir, "events")
        .withColumn("prev", lag(col("ts"), 1).over(w))
        .withColumn("new_s",
          when(col("prev").isNull
            || col("ts").cast("timestamp").cast("long")
              - col("prev").cast("timestamp").cast("long") >= 1800,
            1).otherwise(0))
        .withColumn("sid", sum(col("new_s")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      sessions
        .groupBy("user_id", "sid")
        .agg(
          max(when(col("event_type") === "view", 1).otherwise(0)).as("saw"),
          max(when(col("event_type") === "click", 1).otherwise(0))
            .as("clicked"),
          max(when(col("event_type") === "purchase", 1).otherwise(0))
            .as("purchased"))
        .agg(
          count(lit(1)).as("sessions"),
          sum(col("saw")).cast("long").as("with_view"),
          sum(when(col("saw") === 1 && col("clicked") === 1, 1).otherwise(0))
            .cast("long").as("view_then_click"),
          sum(when(col("saw") === 1 && col("clicked") === 1
            && col("purchased") === 1, 1).otherwise(0))
            .cast("long").as("full_funnel"))
    }),

    // z-score anomaly detection per event_type — population moments from
    // fixed-point integer sums (exact, order-independent, so both engines
    // derive bit-identical mean/σ), then flag |z| > 3 events
    "ts_anomaly" -> ((s, dir) => {
      val cents = floor(col("value") * 100).cast("long")
      val stats = Tables.scan(s, dir, "events")
        .groupBy("event_type")
        .agg(sum(cents).as("s1"), sum(cents * cents).as("s2"),
          count(lit(1)).as("n"))
        .select(col("event_type"),
          (col("s1").cast("double") / col("n")).as("mu"),
          sqrt((col("s2").cast("double") / col("n"))
            - (col("s1").cast("double") / col("n"))
            * (col("s1").cast("double") / col("n"))).as("sigma"))
      Tables.scan(s, dir, "events")
        .join(broadcast(stats), "event_type")
        .select(col("event_id"), col("event_type"),
          ((cents.cast("double") - col("mu")) / col("sigma")).as("z"))
        .filter(abs(col("z")) > 3.0)
        .orderBy("event_id")
    }),

    // cohort retention: users grouped by their first-seen day, activity
    // counted per whole-week offset from it — THE product-analytics
    // retention table. The cohort date comes from a min-window over the
    // user partition (one hash shuffle, no self-join back to events), and
    // the distinct-user rollup is the only other shuffle. Day arithmetic
    // (not week truncation) so both engines agree without sharing a
    // week-start convention; the day is emitted as a string so the hash
    // compare is date-representation-proof.
    "ts_cohort" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
      Tables.scan(s, dir, "events")
        .select(col("user_id"), col("ts").cast("date").as("d"))
        .withColumn("cohort", min(col("d")).over(w))
        .groupBy(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"),
          floor(datediff(col("d"), col("cohort")) / 7).as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("cohort_day", "week_offset")
    }),

    // per-user sliding 5-minute stats (RANGE frame over epoch seconds)
    "ts_sliding" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("epoch_s"))
        .rangeBetween(-300, 0)
      Tables.scan(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          unix_seconds(col("ts").cast("timestamp")).as("epoch_s"),
          floor(col("value") * 100).cast("long").as("cents"))
        .withColumn("n_5m", count(lit(1)).over(w))
        .withColumn("sum_cents_5m", sum(col("cents")).over(w))
        .withColumn("max_cents_5m", max(col("cents")).over(w))
        .orderBy("event_id")
    }),

    // interval merge (gaps-and-islands): each event opens a 5-minute
    // activity interval [ts, ts+300s); overlapping/touching intervals per
    // user merge into maximal activity spans. Since every interval has the
    // SAME length, interval overlap reduces to gap ≤ 300 s between
    // consecutive starts, so one lag + one running sum per user suffices —
    // no cross-row self-join. One hash shuffle on user_id; window state is
    // a single lag value, safe at any per-user history length.
    "ts_interval_merge" -> ((s, dir) => {
      val span = 300L
      val w = Window.partitionBy("user_id").orderBy("epoch_s", "event_id")
      val ev = Tables.scan(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          unix_seconds(col("ts").cast("timestamp")).as("epoch_s"))
      ev.withColumn("prev_s", lag("epoch_s", 1).over(w))
        .withColumn("new_island",
          when(col("prev_s").isNull
            || col("epoch_s") - col("prev_s") > span, 1L).otherwise(0L))
        .withColumn("island",
          sum("new_island").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "island")
        .agg(count(lit(1)).as("n_events"),
          min("epoch_s").as("start_s"),
          (max("epoch_s") + span).as("end_s"))
        .select(col("user_id"), col("island"), col("n_events"),
          col("start_s"), col("end_s"),
          (col("end_s") - col("start_s")).as("span_s"))
        .orderBy("user_id", "island")
    }),

    // counter-reset-aware increase — the PromQL `increase()` primitive
    // behind every counter panel on the reference's Grafana board
    // (restarts, task failures, `up` flaps): per series, a sample LOWER
    // than its predecessor means the counter reset, so that row
    // contributes its own value (growth since the reset), not a negative
    // delta. The fixture counter is synthesized deterministically from the
    // data (running cents per event_type, wrapped mod 100k so resets
    // actually occur) and the SAME construction runs in the oracle.
    // Per-hour increase = sum of reset-corrected per-row deltas; the
    // series' first sample contributes 0 (nothing to grow from), an
    // hour's first sample baselines against the previous hour's last —
    // the standard monotonized-counter rollup. Planning: one hash shuffle
    // on event_type shared by the running sum, the lag, and (key
    // superset) the hourly rollup; window state is O(1) per row. Integer
    // arithmetic end-to-end — hash-stable across engines.
    "ts_counter_rate" -> ((s, dir) => {
      val w = Window.partitionBy("event_type").orderBy("ts", "event_id")
      val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.scan(s, dir, "events")
        .select(col("event_type"), col("ts"), col("event_id"),
          floor(col("value") * 100).cast("long").as("cents"))
        .withColumn("counter", sum("cents").over(cum) % lit(100000L))
        .withColumn("prev", lag("counter", 1).over(w))
        .withColumn("delta",
          when(col("prev").isNull, 0L)
            .when(col("counter") >= col("prev"), col("counter") - col("prev"))
            .otherwise(col("counter")))
        .groupBy(col("event_type"),
          unix_micros(date_trunc("hour", col("ts")).cast("timestamp"))
            .as("hour_us"))
        .agg(sum("delta").as("increase"), count(lit(1)).as("n_samples"))
        .orderBy("event_type", "hour_us")
    }))

  val oracles: Map[String, String] = Map(
    "ts_resample" ->
      """WITH ev AS (SELECT event_type, date_trunc('minute', ts) AS m, value
        |  FROM events),
        |agg AS (SELECT event_type, m, COUNT(*) AS n,
        |    SUM(CAST(floor(value * 100) AS BIGINT)) AS sum_cents
        |  FROM ev GROUP BY 1, 2),
        |spine AS (SELECT t.m, e.event_type
        |  FROM (SELECT unnest(generate_series((SELECT MIN(m) FROM ev),
        |          (SELECT MAX(m) FROM ev), INTERVAL 1 MINUTE)) AS m) t
        |  CROSS JOIN (SELECT DISTINCT event_type FROM ev) e)
        |SELECT s.event_type, s.m,
        |  COALESCE(a.n, 0) AS n,
        |  CAST(COALESCE(a.sum_cents, 0) AS BIGINT) AS sum_cents
        |FROM spine s LEFT JOIN agg a
        |  ON s.event_type = a.event_type AND s.m = a.m
        |ORDER BY s.event_type, s.m""".stripMargin,

    // identical expression tree to the Spark side — single IEEE ops over
    // exact integer cents, so the interpolated doubles hash-match
    "ts_interp" ->
      """WITH ev AS (SELECT event_type, date_trunc('minute', ts) AS m, value
        |  FROM events),
        |obs AS (SELECT event_type, m,
        |    CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS DOUBLE)
        |      / CAST(COUNT(*) AS DOUBLE) AS v
        |  FROM ev GROUP BY 1, 2),
        |spine AS (SELECT t.m, e.event_type
        |  FROM (SELECT unnest(generate_series((SELECT MIN(m) FROM ev),
        |          (SELECT MAX(m) FROM ev), INTERVAL 1 MINUTE)) AS m) t
        |  CROSS JOIN (SELECT DISTINCT event_type FROM ev) e),
        |j AS (SELECT s.event_type, s.m, o.v, epoch_us(s.m) AS mu
        |  FROM spine s LEFT JOIN obs o
        |    ON s.event_type = o.event_type AND s.m = o.m),
        |w AS (SELECT event_type, m, v, mu,
        |    LAST_VALUE(v IGNORE NULLS) OVER wp AS pv,
        |    LAST_VALUE(CASE WHEN v IS NOT NULL THEN mu END IGNORE NULLS)
        |      OVER wp AS pm,
        |    FIRST_VALUE(v IGNORE NULLS) OVER wn AS nv,
        |    FIRST_VALUE(CASE WHEN v IS NOT NULL THEN mu END IGNORE NULLS)
        |      OVER wn AS nm
        |  FROM j
        |  WINDOW wp AS (PARTITION BY event_type ORDER BY m
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wn AS (PARTITION BY event_type ORDER BY m
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_type, m,
        |  CASE WHEN v IS NOT NULL THEN v
        |       ELSE (nv - pv) * CAST(mu - pm AS DOUBLE)
        |            / CAST(nm - pm AS DOUBLE) + pv END AS v_cents,
        |  CAST(v IS NOT NULL AS INT) AS is_observed
        |FROM w ORDER BY event_type, m""".stripMargin,

    "ts_cohort" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
        |c AS (SELECT user_id, d,
        |    MIN(d) OVER (PARTITION BY user_id) AS cohort FROM e)
        |SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day,
        |  CAST(FLOOR(date_diff('day', cohort, d) / 7.0) AS BIGINT)
        |    AS week_offset,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "ts_funnel" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    CAST(ts AS TIMESTAMP) AS ts,
        |    CAST(epoch(date_trunc('second', CAST(ts AS TIMESTAMP)))
        |      AS BIGINT) AS es
        |  FROM events),
        |m AS (SELECT *, lag(es) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM e),
        |g AS (SELECT *, SUM(CASE WHEN prev IS NULL OR es - prev >= 1800
        |      THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m),
        |sess AS (SELECT user_id, sid,
        |    MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS saw,
        |    MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS clicked,
        |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS purchased
        |  FROM g GROUP BY 1, 2)
        |SELECT COUNT(*) AS sessions,
        |  CAST(SUM(saw) AS BIGINT) AS with_view,
        |  CAST(SUM(CASE WHEN saw = 1 AND clicked = 1 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS view_then_click,
        |  CAST(SUM(CASE WHEN saw = 1 AND clicked = 1 AND purchased = 1
        |    THEN 1 ELSE 0 END) AS BIGINT) AS full_funnel
        |FROM sess""".stripMargin,

    "ts_anomaly" ->
      """WITH c AS (SELECT event_id, event_type,
        |    CAST(floor(value * 100) AS BIGINT) AS cents FROM events),
        |st AS (SELECT event_type,
        |    CAST(SUM(cents) AS DOUBLE) / COUNT(*) AS mu,
        |    sqrt(CAST(SUM(cents * cents) AS DOUBLE) / COUNT(*)
        |      - (CAST(SUM(cents) AS DOUBLE) / COUNT(*))
        |      * (CAST(SUM(cents) AS DOUBLE) / COUNT(*))) AS sigma
        |  FROM c GROUP BY event_type)
        |SELECT event_id, c.event_type,
        |  (CAST(cents AS DOUBLE) - mu) / sigma AS z
        |FROM c JOIN st ON c.event_type = st.event_type
        |WHERE abs((CAST(cents AS DOUBLE) - mu) / sigma) > 3.0
        |ORDER BY event_id""".stripMargin,

    "ts_sliding" ->
      """SELECT event_id, user_id,
        |  CAST(epoch(date_trunc('second', CAST(ts AS TIMESTAMP))) AS BIGINT) AS epoch_s,
        |  CAST(floor(value * 100) AS BIGINT) AS cents,
        |  COUNT(*) OVER w AS n_5m,
        |  CAST(SUM(CAST(floor(value * 100) AS BIGINT)) OVER w AS BIGINT)
        |    AS sum_cents_5m,
        |  MAX(CAST(floor(value * 100) AS BIGINT)) OVER w AS max_cents_5m
        |FROM events
        |WINDOW w AS (PARTITION BY user_id
        |  ORDER BY CAST(epoch(date_trunc('second', CAST(ts AS TIMESTAMP))) AS BIGINT)
        |  RANGE BETWEEN 300 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "ts_interval_merge" ->
      """WITH ev AS (SELECT event_id, user_id,
        |    CAST(epoch(date_trunc('second', CAST(ts AS TIMESTAMP)))
        |      AS BIGINT) AS epoch_s
        |  FROM events),
        |lagged AS (SELECT *,
        |    lag(epoch_s) OVER (PARTITION BY user_id
        |      ORDER BY epoch_s, event_id) AS prev_s
        |  FROM ev),
        |flagged AS (SELECT *,
        |    CASE WHEN prev_s IS NULL OR epoch_s - prev_s > 300
        |      THEN 1 ELSE 0 END AS new_island
        |  FROM lagged),
        |islands AS (SELECT *,
        |    CAST(SUM(new_island) OVER (PARTITION BY user_id
        |      ORDER BY epoch_s, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS island
        |  FROM flagged)
        |SELECT user_id, island, COUNT(*) AS n_events,
        |  MIN(epoch_s) AS start_s,
        |  MAX(epoch_s) + 300 AS end_s,
        |  MAX(epoch_s) + 300 - MIN(epoch_s) AS span_s
        |FROM islands GROUP BY user_id, island
        |ORDER BY user_id, island""".stripMargin,

    "ts_counter_rate" ->
      """WITH c AS (SELECT event_type, ts, event_id,
        |    CAST(SUM(CAST(floor(value * 100) AS BIGINT)) OVER (
        |      PARTITION BY event_type ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) % 100000 AS counter
        |  FROM events),
        |d AS (SELECT event_type, ts, counter,
        |    lag(counter) OVER (PARTITION BY event_type
        |      ORDER BY ts, event_id) AS prev
        |  FROM c)
        |SELECT event_type,
        |  epoch_us(CAST(date_trunc('hour', ts) AS TIMESTAMP)) AS hour_us,
        |  CAST(SUM(CASE WHEN prev IS NULL THEN 0
        |           WHEN counter >= prev THEN counter - prev
        |           ELSE counter END) AS BIGINT) AS increase,
        |  COUNT(*) AS n_samples
        |FROM d
        |GROUP BY event_type, hour_us
        |ORDER BY event_type, hour_us""".stripMargin)
}
