package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL entry point over the engine — the piece a SQL-first user coming
  * from the reference's "data warehouse" branch (reference:
  * README.md:49,80) expects: register the harness star schema as views
  * and the codegen'd kernel SQL names on an existing session, and the
  * whole relational surface is reachable through `spark.sql(...)`.
  *
  * Views are LAZY relations over the parquet scans, so everything
  * Catalyst does for the DataFrame catalog — predicate pushdown into the
  * scan, column pruning, broadcast planning — applies identically to SQL
  * text against these views (SqlCatalogSpec pins PushedFilters through a
  * view). At 100 TB the same call would register warehouse tables; the
  * name surface and plan shapes are unchanged.
  */
object SqlCatalog {

  /** Register every harness table as a temp view named exactly like the
    * table (`orders`, `lineitem`, …) plus the kernel SQL functions
    * (`word_shingles`, `minhash_sig`, `float_dot`, …). Idempotent. */
  def register(spark: SparkSession, sfDir: String): Unit = {
    sources.Tables.all.foreach { t =>
      sources.Tables.scan(spark, sfDir, t).createOrReplaceTempView(t)
    }
    functions.SqlFunctions.register(spark)
  }

  /** Convenience: register (idempotent) and run one SQL text. */
  def sql(spark: SparkSession, sfDir: String, query: String): DataFrame = {
    register(spark, sfDir)
    spark.sql(query)
  }
}
