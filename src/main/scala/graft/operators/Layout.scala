package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Physical layout utilities (SURVEY.md §4, PLANS.md): bucketing for
  * co-located joins.
  *
  * The reference pre-partitions every topic 12 ways by primary key so
  * consumers never reshuffle by key (prod-resources.yaml:94-95). The
  * warehouse-side analog is bucketed tables: two tables bucketed by the
  * join key into the same bucket count join with NO exchange on either
  * side — at 100 TB that deletes the two largest shuffles of a fact-fact
  * join. LayoutSpec proves the exchange elimination by plan inspection.
  */
object Layout {

  /** Persist `df` bucketed (and sorted) by `keys` into the session catalog.
    * Bucket count is the analog of the reference's 12 topic partitions —
    * choose it once per warehouse so co-bucketed tables stay join-aligned. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      keys: Seq[String],
      buckets: Int = 12): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Persist `df` hive-style partitioned by `partitionCols` — the layout
    * that turns selective reads into partition-pruned reads (the
    * RegexRouter per-table-topic analog: pre-partitioned data means
    * consumers never scan what they filter out). */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String]): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** True if the executed plan of `df` contains a shuffle exchange. */
  def hasShuffleExchange(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")

  /** Co-located equi-join of two same-bucketed catalog tables. */
  def bucketedJoin(
      spark: SparkSession,
      left: String,
      right: String,
      keys: Seq[String]): DataFrame =
    spark.table(left).join(spark.table(right), keys)
}
