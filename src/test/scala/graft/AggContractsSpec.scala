package graft

import graft.operators.AggQueries
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Error contract for `agg_approx_distinct` — the one rows-only aggregate
  * with no DuckDB oracle (Spark's HLL++ sketch has no cross-engine twin).
  * The contract that replaces the oracle: the sketch estimate stays within
  * 5% of the exact count-distinct (the query registers rsd=0.02, so 5%
  * leaves headroom without being vacuous). */
class AggContractsSpec extends SparkSpec {

  private def relErr(dir: String): Double = {
    val approx = AggQueries.queries("agg_approx_distinct")(spark, dir)
      .collect().head.getLong(0)
    val exact = Tables.scan(spark, dir, "orders")
      .select(countDistinct(col("o_custkey")).as("n"))
      .collect().head.getLong(0)
    math.abs(approx - exact).toDouble / exact
  }

  test("approx_count_distinct relative error ≤ 5% at sf0.01 and sf0.1") {
    val e1 = relErr("/root/testdata/sf0.01")
    assert(e1 <= 0.05, s"sf0.01 relative error $e1 exceeds 5%")
    val e2 = relErr("/root/testdata/sf0.1")
    assert(e2 <= 0.05, s"sf0.1 relative error $e2 exceeds 5%")
  }

  private def pctErr(dir: String): (Double, Double) = {
    val row = AggQueries.queries("agg_approx_percentile")(spark, dir)
      .collect().head
    val (a50, a99) = (row.getDouble(0), row.getDouble(1))
    val ex = Tables.scan(spark, dir, "lineitem")
      .selectExpr("percentile(l_extendedprice, 0.5) AS p50",
        "percentile(l_extendedprice, 0.99) AS p99")
      .collect().head
    (math.abs(a50 - ex.getDouble(0)) / ex.getDouble(0),
      math.abs(a99 - ex.getDouble(1)) / ex.getDouble(1))
  }

  test("approx_percentile value error ≤ 2% vs exact at sf0.01 and sf0.1") {
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val (e50, e99) = pctErr(dir)
      assert(e50 <= 0.02 && e99 <= 0.02,
        s"$dir approx_percentile errors p50=$e50 p99=$e99 exceed 2%")
    }
  }
}
