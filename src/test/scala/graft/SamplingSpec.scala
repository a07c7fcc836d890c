package graft

import graft.operators.{Layout, SamplingQueries}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Scale/determinism contracts of the hash-keyed sampling family (the
  * oracle gate already pins exact values; these assert the PROPERTIES the
  * design claims: map-side membership, disjoint total splits, per-stratum
  * caps, and run-to-run reproducibility without RNG state). */
class SamplingSpec extends SparkSpec {

  private def q(name: String) =
    SamplingQueries.queries(name)(spark, sfDir)

  test("sample_hash membership is map-side: no hash-partition exchange") {
    // the only exchange in the plan may be the presentation sort — a
    // hashpartitioning exchange would mean membership paid a shuffle,
    // which the content-hash design exists to avoid
    assert(!Layout.hasShuffleExchange(q("sample_hash")),
      "sample membership must not shuffle:\n"
        + q("sample_hash").queryExecution.executedPlan)
  }

  test("splits cover the corpus disjointly; assignment is deterministic") {
    val total = Tables.scan(spark, sfDir, "documents").count()
    val split = q("sample_split")
    // (lang, split) counts sum to the full corpus: every doc lands in
    // exactly one split (the CASE is total and single-valued by key)
    assert(split.agg(sum("n")).head.getLong(0) == total)
    // independent re-evaluation reproduces the exact assignment — the
    // membership derives from the key hash alone, no RNG/partition state
    assert(split.collect().toSeq == q("sample_split").collect().toSeq)
    // and the sampled fraction tracks the 4/16-nibble design rate
    val sampled = q("sample_hash").count().toDouble / total
    assert(sampled > 0.15 && sampled < 0.35,
      s"hash-sample rate $sampled far from the 25% design rate")
  }

  test("split assignment is identical on a stream and a batch of the same keys") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val spark0 = spark
    implicit val sqlCtx = spark0.sqlContext
    import spark0.implicits._
    val keys = (1L to 200L).toSeq
    val in = MemoryStream[Long]
    in.addData(keys: _*)
    val q = in.toDF().toDF("doc_id")
      .select(col("doc_id"), SamplingQueries.splitOf(col("doc_id")).as("split"))
      .writeStream.format("memory").queryName("split_stream")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val streamed = spark.table("split_stream").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val batch = keys.toDF("doc_id")
      .select(col("doc_id"), SamplingQueries.splitOf(col("doc_id")).as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // the backfill job and the live stream must agree on every record —
    // the whole point of deriving membership from the key content
    assert(streamed == batch && streamed.keySet == keys.toSet)
  }

  test("stratified sample caps each stratum at k and is a corpus subset") {
    val docs = Tables.scan(spark, sfDir, "documents")
    val strata = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = q("sample_stratified")
    val gotCounts = got.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotCounts == strata.map { case (l, n) => l -> math.min(20L, n) })
    // every sampled (doc_id, lang) exists in the corpus
    assert(got.join(docs, Seq("doc_id", "lang"), "left_anti").count() == 0)
  }
}
