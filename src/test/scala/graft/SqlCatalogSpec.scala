package graft

import org.apache.spark.sql.functions._

/** The SQL entry point ([[SqlCatalog]]): a SQL-first user must be able to
  * run the relational surface as text against registered views, with the
  * same results AND the same scan-level plan properties (pushdown,
  * pruning) the DataFrame catalog gets. */
class SqlCatalogSpec extends SparkSpec {

  test("SQL over registered views equals the DataFrame form exactly") {
    SqlCatalog.register(spark, sfDir)
    val viaSql = spark.sql(
      """SELECT l_returnflag, CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
        |       COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
        .stripMargin).collect()
    val viaDf = sources.Tables.scan(spark, sfDir, "lineitem")
      .groupBy("l_returnflag")
      .agg(sum("l_quantity").cast("bigint").as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag").collect()
    assert(viaSql.toSeq == viaDf.toSeq)
  }

  test("kernel SQL names work in query text against the views") {
    SqlCatalog.register(spark, sfDir)
    val r = spark.sql(
      """SELECT doc_id, size(word_shingles(lower(trim(text)), 4)) AS n_sh
        |FROM documents WHERE doc_id < 10 ORDER BY doc_id""".stripMargin)
      .collect()
    assert(r.nonEmpty)
    // shingle count = max(0, words - 3) — spot-check against a recount
    val words = sources.Tables.scan(spark, sfDir, "documents")
      .filter(col("doc_id") < 10)
      .select(col("doc_id"), size(split(lower(trim(col("text"))), "\\s+"))
        .as("w")).collect()
      .map(x => x.getLong(0) -> x.getInt(1)).toMap
    r.foreach { row =>
      val expect = math.max(0, words(row.getLong(0)) - 3)
      assert(row.getInt(1) == expect,
        s"doc ${row.getLong(0)}: shingle count")
    }
  }

  test("filters in SQL text still push into the parquet scan through a view") {
    SqlCatalog.register(spark, sfDir)
    val plan = spark.sql(
      "SELECT o_orderkey FROM orders WHERE o_orderkey = 42")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("o_orderkey"),
      s"view must not block scan pushdown:\n$plan")
  }
}
