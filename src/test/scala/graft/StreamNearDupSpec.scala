package graft

import graft.streaming.StreamNearDup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Contracts for the streaming MinHash/LSH near-dup detector: a pair is
  * found the moment its second member arrives (across micro-batches),
  * unrelated documents never pair, and at-least-once replays are no-ops. */
class StreamNearDupSpec extends SparkSpec {

  private val docA = (1L,
    "the quick brown fox jumps over the lazy dog near the old river bank")
  private val docB = (2L,
    "completely unrelated text about spark catalyst optimizer internals here")
  // docA plus one trailing word: 11 vs 12 4-shingles sharing all 11 →
  // shingle Jaccard 11/12 ≈ 0.92
  private val docA2 = (3L,
    "the quick brown fox jumps over the lazy dog near the old river bank today")

  test("near-dup pair surfaces across micro-batches; replays are no-ops") {
    val spark0 = spark
    implicit val sqlCtx = spark0.sqlContext
    import spark0.implicits._
    val in = MemoryStream[(Long, String)]
    val q = StreamNearDup.detect(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("near_dups")
      .outputMode("append").start()
    try {
      in.addData(docA, docB)
      q.processAllAvailable()
      assert(spark.table("near_dups").count() == 0,
        "no near-dups exist yet")
      in.addData(docA2)
      q.processAllAvailable()
      val pairs = spark.table("near_dups")
        .select("da", "db", "estJaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // the same pair may arrive from several bands — distinct (da, db)
      assert(pairs.map(p => (p._1, p._2)).distinct.toSeq == Seq((1L, 3L)),
        s"expected exactly the (1,3) near-dup, got ${pairs.toSeq}")
      assert(pairs.forall(_._3 >= 0.5))
      val before = spark.table("near_dups").count()
      // at-least-once replay of an already-seen document
      in.addData(docA)
      q.processAllAvailable()
      assert(spark.table("near_dups").count() == before,
        "replay must not emit new pairs")
    } finally q.stop()
  }

  test("hot bucket saturates: bounded state growth and bounded emission") {
    val spark0 = spark
    implicit val sqlCtx = spark0.sqlContext
    import spark0.implicits._
    // template spam: identical text → identical signature → the SAME
    // bucket in every band; without the cap this emits O(m²) pairs and
    // stores O(m) signatures per bucket
    val spam = "buy cheap widgets now best price free shipping limited " +
      "offer act today only while stocks last"
    val in = MemoryStream[(Long, String)]
    val q = StreamNearDup
      .detect(in.toDF().toDF("doc_id", "text"), maxBucket = 3)
      .writeStream.format("memory").queryName("spam_dups")
      .outputMode("append").start()
    try {
      // six spam docs across two batches; cap = 3 members per bucket
      in.addData((1L, spam), (2L, spam), (3L, spam))
      q.processAllAvailable()
      in.addData((4L, spam), (5L, spam), (6L, spam))
      q.processAllAvailable()
      val pairs = spark.table("spam_dups").select("da", "db").collect()
        .map(r => (r.getLong(0), r.getLong(1))).distinct.toSet
      // only the first cap=3 members pair up — cap·(cap−1)/2 = 3 distinct
      // pairs, all among docs {1,2,3}; docs 4-6 hit the saturated bucket
      assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)),
        s"saturated bucket must stop emitting, got $pairs")
      val before = spark.table("spam_dups").count()
      // a straggler after saturation: no comparisons, no new pairs
      in.addData((7L, spam))
      q.processAllAvailable()
      assert(spark.table("spam_dups").count() == before,
        "post-saturation arrivals must not emit")
      // the cluster is still connected through the pre-saturation pairs:
      // CC over the emitted pairs yields ONE component
      val cc = pairs.flatMap(p => Seq(p._1, p._2))
      assert(cc == Set(1L, 2L, 3L))
    } finally q.stop()
  }
}
