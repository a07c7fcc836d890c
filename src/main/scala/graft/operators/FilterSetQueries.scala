package graft.operators

import graft.{Dec, QueryGroup}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Projection / filter / sort / limit / set operators
  * (SURVEY.md §2.C ops 4-6, 24-28).
  *
  * Filters and column selections here are expressed declaratively so they
  * reach the parquet scan as PushedFilters/ReadSchema — verified via
  * `.explain("formatted")` (see PLANS.md). */
object FilterSetQueries extends QueryGroup {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // op 1: parquet table scan — the source primitive every other operator
    // composes over
    "scan_table" -> ((s, dir) => {
      Tables.scan(s, dir, "nation").orderBy("n_nationkey")
    }),

    // op 4: projection — subset, renamed, computed columns
    "projection" -> ((s, dir) => {
      Tables.scan(s, dir, "lineitem")
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          (Dec.d2(col("l_extendedprice")) * (lit(1) - Dec.rate(col("l_discount"))))
            .cast("double").as("disc_price"),
          year(col("l_shipdate")).cast("long").as("ship_year"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // op 5: conjunctive predicates — comparison, IN, LIKE, BETWEEN
    "filter_pred" -> ((s, dir) => {
      Tables.scan(s, dir, "orders")
        .filter(col("o_orderstatus").isin("O", "F")
          && col("o_orderpriority").like("%URGENT%")
          && col("o_totalprice").between(100000, 200000))
        .select("o_orderkey", "o_orderstatus", "o_orderpriority")
        .orderBy("o_orderkey")
    }),

    // op 6: table-include filter — the capture-side include-list analog
    // (reference: postgresql-connector.yaml:39)
    "filter_include" -> ((s, dir) => {
      Tables.scan(s, dir, "events")
        .filter(col("event_type").isin("click", "view"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    // op 24: global sort — a plain orderBy compiles to a range-partitioned
    // Sort (sampled bounds → Exchange rangepartitioning → per-partition
    // sort), which scales; a global row_number() window would funnel every
    // row through one task.
    "sort_global" -> ((s, dir) => {
      Tables.scan(s, dir, "orders")
        .select(col("o_orderkey"),
          Dec.d2(col("o_totalprice")).cast("double").as("price"))
        .orderBy(col("price").desc, col("o_orderkey"))
    }),

    // op 25: top-k — Catalyst rewrites orderBy+limit to TakeOrderedAndProject
    "topk" -> ((s, dir) => {
      Tables.scan(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(Dec.toDbl(sum(Dec.d2(col("l_extendedprice")))).as("revenue"))
        .orderBy(col("revenue").desc, col("l_partkey"))
        .limit(10)
    }),

    // op 26: union all + re-aggregate (overlapping subsets counted twice)
    "set_union" -> ((s, dir) => {
      val c = Tables.scan(s, dir, "customer")
      val a = c.filter(col("c_custkey") <= 1000).select("c_custkey")
      val b = c.filter(col("c_custkey") >= 500).select("c_custkey")
      a.unionByName(b)
        .groupBy("c_custkey").agg(count(lit(1)).as("n"))
        .orderBy("c_custkey")
    }),

    // op 27: intersect (set-distinct) — customers with orders ∩ with events
    "set_intersect" -> ((s, dir) => {
      val o = Tables.scan(s, dir, "orders").select("o_custkey")
      val e = Tables.scan(s, dir, "events")
        .select(col("user_id").as("o_custkey"))
      o.intersect(e).orderBy("o_custkey")
    }),

    // op 28: except (set-distinct) — part keys not shipped in 1995
    "set_except" -> ((s, dir) => {
      val p = Tables.scan(s, dir, "part").select("p_partkey")
      val li = Tables.scan(s, dir, "lineitem")
        .filter(year(col("l_shipdate")) === 1995)
        .select(col("l_partkey").as("p_partkey"))
      p.except(li).orderBy("p_partkey")
    }))

  val oracles: Map[String, String] = Map(
    "scan_table" ->
      "SELECT * FROM nation ORDER BY n_nationkey",

    "projection" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_extendedprice AS DECIMAL(12,2))
        |     * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS disc_price,
        |  year(l_shipdate) AS ship_year
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "filter_pred" ->
      """SELECT o_orderkey, o_orderstatus, o_orderpriority
        |FROM orders
        |WHERE o_orderstatus IN ('O','F')
        |  AND o_orderpriority LIKE '%URGENT%'
        |  AND o_totalprice BETWEEN 100000 AND 200000
        |ORDER BY o_orderkey""".stripMargin,

    "filter_include" ->
      """SELECT event_type, COUNT(*) AS n
        |FROM events WHERE event_type IN ('click','view')
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "sort_global" ->
      """SELECT o_orderkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price
        |FROM orders
        |ORDER BY price DESC, o_orderkey""".stripMargin,

    "topk" ->
      """SELECT l_partkey,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS revenue
        |FROM lineitem GROUP BY l_partkey
        |ORDER BY revenue DESC, l_partkey LIMIT 10""".stripMargin,

    "set_union" ->
      """SELECT c_custkey, COUNT(*) AS n FROM (
        |  SELECT c_custkey FROM customer WHERE c_custkey <= 1000
        |  UNION ALL
        |  SELECT c_custkey FROM customer WHERE c_custkey >= 500)
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "set_intersect" ->
      """SELECT o_custkey FROM orders
        |INTERSECT
        |SELECT user_id FROM events
        |ORDER BY o_custkey""".stripMargin,

    "set_except" ->
      """SELECT p_partkey FROM part
        |EXCEPT
        |SELECT l_partkey FROM lineitem WHERE year(l_shipdate) = 1995
        |ORDER BY p_partkey""".stripMargin)
}
