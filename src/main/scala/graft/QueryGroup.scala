package graft

import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** A named bundle of driver-checkable queries. Each operator from
  * SURVEY.md §2 registers exactly one entry in `queries` and (when
  * SQL-expressible) a DuckDB oracle in `oracles` with IDENTICAL output
  * column names and an identical deterministic ORDER BY. */
trait QueryGroup {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]

  /** Shared materializations this group owns, for the session warm-start
    * ([[Prewarm]]): each task triggers the group's cached builds through
    * the same entry points its queries use. Empty = nothing shared. */
  def prewarm: Seq[Prewarm.Task] = Seq.empty
}

/** Determinism helpers for oracle-comparable numerics (SURVEY.md §7.4.3).
  *
  * Double aggregation order differs between Spark and DuckDB, so summing
  * raw doubles is not hash-stable. All money/quantity aggregates therefore
  * cast to exact DECIMAL first (the testdata carries ≤2 fractional digits),
  * aggregate exactly, and only then cast to DOUBLE — both engines then
  * produce bit-identical doubles. Precisions are kept small so products
  * never exceed DECIMAL(38,…) (which would trigger engine-specific
  * rounding).
  */
object Dec {
  /** Exact 2-dec money/quantity: DECIMAL(12,2). */
  def d2(c: Column): Column = c.cast(DecimalType(12, 2))
  /** Exact small rate (discount/tax): DECIMAL(4,2). */
  def rate(c: Column): Column = c.cast(DecimalType(4, 2))
  /** Decimal → double via a STRING round-trip: `CAST(CAST(x AS VARCHAR)
    * AS DOUBLE)` on the oracle side. The direct decimal→double cast is
    * correctly rounded only while the decimal's UNSCALED value fits in
    * 2^53 — beyond that each engine converts int→double (one rounding)
    * then divides by 10^scale (another), and the two roundings can land
    * one ulp apart between engines (observed at sf1: `sum_charge`'s
    * scale-6 sum has unscaled ≈2.7e16). Rendering the exact decimal as a
    * string and parsing it is correctly rounded in BOTH engines (IEEE
    * strtod semantics), so the doubles agree at any corpus scale. */
  def toDbl(c: Column): Column = c.cast("string").cast("double")
  /** Timestamp literal matching the parquet columns' TIMESTAMP_NTZ type
    * (naive, session pinned UTC — same wall clock as DuckDB TIMESTAMP). */
  def tsn(s: String): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.lit(s).cast("timestamp_ntz")
}
