package graft.operators

import graft.{Dec, QueryGroup}
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Window functions (SURVEY.md §2.C ops 21-23). Every window partitions by
  * a key, so at scale each is one hash shuffle + per-partition sort — no
  * global ordering anywhere (except the explicitly-global sort op 24). */
object WindowQueries extends QueryGroup {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // op 21: ranking — top-3 orders per customer with all four rank flavors
    "window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("price").desc, col("o_orderkey"))
      Tables.scan(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          Dec.d2(col("o_totalprice")).cast("double").as("price"))
        .withColumn("rn", row_number().over(w))
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .withColumn("nt", ntile(4).over(w))
        .filter(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    }),

    // op 22: analytic — per-user event deltas (lag/lead/first_value)
    "window_laglead" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      Tables.scan(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"), col("value"))
        .withColumn("prev_value", lag(col("value"), 1).over(w))
        .withColumn("next_value", lead(col("value"), 1).over(w))
        .withColumn("first_value", first(col("value")).over(w))
        .withColumn("delta", col("value") - lag(col("value"), 1).over(w))
        .orderBy("user_id", "ts_us", "event_id")
    }),

    // op 23: frame-spec aggregates — running total + 3-row moving average
    "window_frames" -> ((s, dir) => {
      val base = Window.partitionBy(col("o_custkey"))
        .orderBy(col("date_us"), col("o_orderkey"))
      val run = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val mov = base.rowsBetween(-2, Window.currentRow)
      Tables.scan(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("date_us"),
          Dec.d2(col("o_totalprice")).as("price_dec"))
        .withColumn("running_total",
          Dec.toDbl(sum(col("price_dec")).over(run)))
        .withColumn("moving_avg",
          (Dec.toDbl(sum(col("price_dec")).over(mov))
            / count(lit(1)).over(mov)))
        .withColumn("price", col("price_dec").cast("double"))
        .drop("price_dec")
        .orderBy("o_custkey", "date_us", "o_orderkey")
    }),

    // op 23b: RANGE frames — VALUE-based bounds, the frame type the ROWS
    // variants above cannot express: "total spend in the trailing 30
    // days" includes however many orders fall in the value window (and
    // ALL peers of a tied timestamp), not a fixed row count. Exact
    // decimal sum, so tie order inside the frame cannot perturb the
    // result — that is what makes a RANGE frame hash-comparable at all.
    "window_range_frame" -> ((s, dir) => {
      val days30 = 30L * 86400L * 1000000L
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("date_us"))
        .rangeBetween(-days30, Window.currentRow)
      Tables.scan(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("date_us"),
          Dec.d2(col("o_totalprice")).as("price_dec"))
        .withColumn("trailing_30d",
          Dec.toDbl(sum(col("price_dec")).over(w)))
        .withColumn("n_in_window", count(lit(1)).over(w))
        .drop("price_dec")
        .orderBy("o_custkey", "date_us", "o_orderkey")
    }),

    // op 21b: distribution functions — percent_rank/cume_dist per key
    // (quantile position of every order within its customer). Both are
    // exact integer ratios ((rank-1)/(n-1), rank_hi/n): one division of
    // exact ints, bit-identical across engines.
    "window_dist" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("price"), col("o_orderkey"))
      Tables.scan(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          Dec.d2(col("o_totalprice")).cast("double").as("price"))
        .withColumn("pct_rank", percent_rank().over(w))
        .withColumn("cume", cume_dist().over(w))
        .orderBy("o_custkey", "pct_rank", "o_orderkey")
    }),

    // op 21c: ntile bucketing + positional nth_value — the remaining
    // window-function family: quartile assignment per customer and each
    // row's view of its partition's cheapest/2nd-cheapest order. Same
    // single hash-exchange shape as every per-customer window.
    "window_ntile" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("price"), col("o_orderkey"))
      val full = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.scan(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          Dec.d2(col("o_totalprice")).cast("double").as("price"))
        // long, not Spark ntile's int: the oracle's NTILE is BIGINT and
        // the local gate enforces exact dump-vs-oracle type parity
        .withColumn("quartile", ntile(4).over(w).cast("long"))
        .withColumn("cheapest", first(col("price")).over(full))
        .withColumn("second_cheapest",
          nth_value(col("price"), 2).over(full))
        .orderBy("o_custkey", "price", "o_orderkey")
    }))

  val oracles: Map[String, String] = Map(
    "window_rank" ->
      """SELECT * FROM (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price,
        |    CAST(ROW_NUMBER() OVER w AS INT) AS rn,
        |    CAST(RANK() OVER w AS INT) AS rnk,
        |    CAST(DENSE_RANK() OVER w AS INT) AS drnk,
        |    CAST(NTILE(4) OVER w AS INT) AS nt
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey
        |               ORDER BY CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) DESC,
        |                        o_orderkey))
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,

    "window_laglead" ->
      """SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |  value,
        |  LAG(value, 1) OVER w AS prev_value,
        |  LEAD(value, 1) OVER w AS next_value,
        |  FIRST_VALUE(value) OVER w AS first_value,
        |  value - LAG(value, 1) OVER w AS delta
        |FROM events
        |WINDOW w AS (PARTITION BY user_id
        |             ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)
        |ORDER BY user_id, ts_us, event_id""".stripMargin,

    "window_frames" ->
      """SELECT o_orderkey, o_custkey,
        |  epoch_us(o_orderdate) AS date_us,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER
        |    (PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate), o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE)
        |    AS running_total,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER
        |    (PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate), o_orderkey
        |     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE)
        |  / COUNT(*) OVER
        |    (PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate), o_orderkey
        |     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg,
        |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price
        |FROM orders
        |ORDER BY o_custkey, date_us, o_orderkey""".stripMargin,

    "window_range_frame" ->
      """SELECT o_orderkey, o_custkey,
        |  epoch_us(o_orderdate) AS date_us,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS VARCHAR) AS DOUBLE)
        |    AS trailing_30d,
        |  COUNT(*) OVER w AS n_in_window
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate)
        |  RANGE BETWEEN 2592000000000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, date_us, o_orderkey""".stripMargin,

    "window_dist" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price,
        |  PERCENT_RANK() OVER w AS pct_rank,
        |  CUME_DIST() OVER w AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE),
        |           o_orderkey)
        |ORDER BY o_custkey, pct_rank, o_orderkey""".stripMargin,

    "window_ntile" ->
      """SELECT o_orderkey, o_custkey, price,
        |  NTILE(4) OVER w AS quartile,
        |  FIRST_VALUE(price) OVER wf AS cheapest,
        |  NTH_VALUE(price, 2) OVER wf AS second_cheapest
        |FROM (SELECT o_orderkey, o_custkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price
        |  FROM orders)
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY price, o_orderkey),
        |  wf AS (PARTITION BY o_custkey ORDER BY price, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, price, o_orderkey""".stripMargin)
}
