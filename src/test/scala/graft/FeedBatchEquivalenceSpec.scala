package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The feed fixtures' two-phase batch index must equal the direct global
  * ntile it replaced — bit-identical assignment for every row, on the
  * REAL corpus slices the fixtures are built from (plus the n < k edge,
  * where SQL NTILE gives each row its own tile). The two-phase form
  * exists so the synthesis scales (the global ntile planned a
  * single-partition WindowExec — 127 s for the sf1 session feed); this
  * spec pins that it can never change the replay batching. */
class FeedBatchEquivalenceSpec extends SparkSpec {

  private def direct(df: DataFrame, k: Int): DataFrame =
    df.withColumn("_tile0",
      ntile(k).over(Window.orderBy(col("ts"), col("event_id"))) - 1)

  private def assertSame(df: DataFrame, k: Int): Unit = {
    val a = direct(df, k).select(col("event_id"), col("_tile0"))
    val b = StreamQueries.twoPhaseNtile0(df, k)
      .select(col("event_id"), col("_tile0"))
    assert(a.count() === b.count())
    assert(a.exceptAll(b).count() === 0L)
    assert(b.exceptAll(a).count() === 0L)
  }

  private def slice(m: Int, r: Int): DataFrame =
    Tables.scan(spark, sfDir, "events")
      .filter(col("event_id") % m === r)
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"))

  test("late feed slice: two-phase == ntile(4)") {
    assertSame(slice(8, 0), 4)
  }

  test("session feed slice: two-phase == ntile(5)") {
    assertSame(slice(4, 1), 5)
  }

  test("join feed slice: two-phase == ntile(3)") {
    val df = Tables.scan(spark, sfDir, "events")
      .filter(col("event_id") % 8 === 2 || col("event_id") % 8 === 6)
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"))
    assertSame(df, 3)
  }

  test("n < k edge: every row its own tile, in order") {
    val tiny = slice(4, 1).orderBy("event_id").limit(3)
    assertSame(tiny, 5)
    val tiles = StreamQueries.twoPhaseNtile0(tiny, 5)
      .orderBy("ts", "event_id").select("_tile0")
      .collect().map(_.getInt(0)).toSeq
    assert(tiles === Seq(0, 1, 2))
  }
}
