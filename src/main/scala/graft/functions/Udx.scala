package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.{Encoder, Encoders, SparkSession}

/** User-extension surface (SURVEY.md §2 "UDF/UDAF/UDTF"): the three
  * standard Spark extension points, documented in preference order.
  *
  * 1. Built-in Catalyst expressions — always first; every SURVEY.md §2
  *    operator resolves to them (or to this library's codegen'd custom
  *    expressions in [[VectorExpressions]], the next rung down).
  * 2. `Aggregator[IN, BUF, OUT]` via `udaf()` for custom aggregation —
  *    typed, partial-aggregation-capable (merge), so it map-side combines
  *    like a built-in agg. [[WeightedMean]] below is the reference
  *    implementation.
  * 3. `udf()` scalar functions — last resort: opaque to the optimizer
  *    (no pushdown through them, no codegen). [[register]] shows the
  *    wiring; prefer 1-2.
  *
  * Table functions: compose `explode`/`posexplode`/`inline` over
  * array-building expressions — Spark-native UDTF form (see the dedup
  * band-explosion in [[graft.operators.DedupQueries]] for a real use).
  */
object Udx {

  final case class WMBuf(wsum: Double, w: Double)

  /** Weighted mean with a mergeable buffer — the Aggregator contract:
    * `reduce` runs per partition (map-side), `merge` combines partial
    * buffers at the exchange, so the shuffle carries one 16-byte buffer
    * per group per partition, not raw rows. */
  object WeightedMean extends Aggregator[(Double, Double), WMBuf, Double] {
    override def zero: WMBuf = WMBuf(0.0, 0.0)
    override def reduce(b: WMBuf, in: (Double, Double)): WMBuf =
      WMBuf(b.wsum + in._1 * in._2, b.w + in._2)
    override def merge(a: WMBuf, b: WMBuf): WMBuf =
      WMBuf(a.wsum + b.wsum, a.w + b.w)
    override def finish(b: WMBuf): Double =
      if (b.w == 0.0) Double.NaN else b.wsum / b.w
    override def bufferEncoder: Encoder[WMBuf] = Encoders.product[WMBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Register the extension surface on a session:
    * `SELECT weighted_mean(value, weight)` becomes available in SQL. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("weighted_mean", udaf(WeightedMean))
    // scalar-udf wiring example (rung 3) — a clamp nobody should write as
    // a UDF (use least/greatest); kept as the registration template
    spark.udf.register("clamp01",
      (x: Double) => math.max(0.0, math.min(1.0, x)))
  }
}
