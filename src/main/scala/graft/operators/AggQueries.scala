package graft.operators

import graft.{Dec, QueryGroup}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Aggregation operators (SURVEY.md §2.C ops 16, 17, 19, 20).
  * All run as partial(map-side)+final hash aggregates — Catalyst splits
  * the agg automatically, so the shuffle carries one row per group, not
  * per input row; that is the shape that survives 100 TB. */
object AggQueries extends QueryGroup {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // op 16: hash group-by with the full agg function set (TPC-H Q1 shape)
    "agg_groupby" -> ((s, dir) => {
      val li = Tables.scan(s, dir, "lineitem")
        .filter(col("l_shipdate") <= Dec.tsn("1998-09-02"))
      val qty = Dec.d2(col("l_quantity"))
      val price = Dec.d2(col("l_extendedprice"))
      val disc = Dec.rate(col("l_discount"))
      val tax = Dec.rate(col("l_tax"))
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(qty).cast("double").as("sum_qty"),
          sum(price).cast("double").as("sum_base_price"),
          sum(price * (lit(1) - disc)).cast("double").as("sum_disc_price"),
          sum(price * (lit(1) - disc) * (lit(1) + tax)).cast("double")
            .as("sum_charge"),
          (sum(qty).cast("double") / count(lit(1))).as("avg_qty"),
          (sum(price).cast("double") / count(lit(1))).as("avg_price"),
          (sum(disc).cast("double") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }))

  val oracles: Map[String, String] = Map(
    "agg_groupby" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |       * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |       * (1 - CAST(l_discount AS DECIMAL(4,2)))
        |       * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
}
