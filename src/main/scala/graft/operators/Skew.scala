package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Skew-mitigation utilities (SURVEY.md §4 physical-execution notes).
  *
  * AQE handles skewed *joins* at runtime (split oversized partitions), but
  * a skewed high-cardinality *aggregation state* — one key receiving a
  * disproportionate share of rows, e.g. a hot user_id or a null-ish
  * default key in a 100 TB event log — still funnels through one reducer.
  * Two-phase salted aggregation shards the hot key across `salts` partial
  * groups, then combines partials: both shuffles move only aggregated
  * rows, and no single task sees more than ~1/salts of the hot key.
  */
object Skew {

  /** Salted sum/count aggregation: algebraic combine of (sum, count) per
    * (key, salt) then per key. Extendable to any algebraic aggregate
    * (min/max/sum/count and their compositions). */
  def saltedSumCount(
      df: DataFrame,
      key: Column,
      value: Column,
      salts: Int = 16): DataFrame = {
    val salted = df.select(
      key.as("k"),
      value.as("v"),
      // content-derived shard: recomputation under task retry reassigns a
      // row to the SAME salt (monotonically_increasing_id would not — the
      // SPARK-23207 lost/duplicated-rows class of bug); fully identical
      // rows sharing a shard is the accepted tradeoff of content hashing
      pmod(xxhash64(key, value), lit(salts)).as("_salt"))
    salted
      .groupBy(col("k"), col("_salt"))
      .agg(sum(col("v")).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col("k"))
      .agg(sum(col("_psum")).as("total"), sum(col("_pcnt")).as("n"))
  }
}
