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
    * choose it once per warehouse so co-bucketed tables stay join-aligned.
    * `path` makes the table EXTERNAL at that location (the graded
    * `join_colocated` stages under a per-process tmp path so concurrent
    * drivers never overwrite each other's files); default is a managed
    * table under the session warehouse dir. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      keys: Seq[String],
      buckets: Int = 12,
      path: Option[String] = None): Unit = {
    import org.apache.spark.sql.functions.col
    // repartition on the bucket keys FIRST (same Murmur3 hash family as
    // bucketBy, same count) so each task holds exactly one bucket → ONE
    // file per bucket instead of a tasks×buckets small-file fan-out at
    // write time (the same lesson as the sink's publish). Note the
    // reader still plans a partition-LOCAL sort under a sort-merge join:
    // Spark ≥3 stopped reporting bucket sort order from sortBy metadata
    // (spark.sql.legacy.bucketedTableScan.outputOrdering gates the old
    // behavior); the win bucketing keeps is the deleted EXCHANGES.
    val w = df.repartition(buckets, keys.map(col): _*)
      .write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
    path.foreach(w.option("path", _))
    w.saveAsTable(table)
  }

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

  /** Morton (Z-order) value: interleaves the low `bits` bits of two
    * non-negative integer columns (x even positions, y odd). Rows close
    * in BOTH dimensions get close z-values, so sorting by z clusters the
    * data for two-dimensional predicates — the layout trick behind
    * Delta/Iceberg Z-ordering, here as a plain codegen-friendly bitwise
    * column expression (2·bits shift/and/or terms, no UDF). */
  def zValue(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column,
      bits: Int = 16): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val xs = (0 until bits).map(i =>
      shiftleft(shiftrightunsigned(x.cast("long"), i).bitwiseAND(lit(1L)),
        2 * i))
    val ys = (0 until bits).map(i =>
      shiftleft(shiftrightunsigned(y.cast("long"), i).bitwiseAND(lit(1L)),
        2 * i + 1))
    (xs ++ ys).reduce(_.bitwiseOR(_))
  }

  /** Write `df` Z-ordered on (x, y): global sort by the interleaved
    * z-value (a RANGE partition — each task, and so each output file,
    * covers a contiguous z-range, i.e. a small tile in (x, y) space),
    * split into bounded files. A query constraining both dimensions then
    * touches the few files whose tiles intersect its box, instead of
    * every file a single-column sort order would force it to read —
    * file/row-group min-max stats do the pruning, no index needed. */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      x: String,
      y: String,
      bits: Int = 16,
      maxRecordsPerFile: Long = 1000000L): Unit = {
    import org.apache.spark.sql.functions.col
    // collision-proof sort-key name: withColumn would silently REPLACE a
    // caller's column of the same name and drop() would then delete it
    val zc = Iterator.from(0).map(i => s"_graft_z$i")
      .find(n => !df.columns.contains(n)).get
    df.withColumn(zc, zValue(col(x), col(y), bits))
      .orderBy(zc)
      .drop(zc)
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
  }

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
