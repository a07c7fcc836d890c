package graft.streaming

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}

/** One document's membership in one LSH band bucket (the streaming unit of
  * the MinHash+LSH candidate generation in
  * [[graft.operators.DedupQueries]]). */
final case class BandedDoc(band: Int, bh: Long, docId: Long, sig: Array[Long])

/** A member of a band bucket's state: a document and its full signature. */
final case class BucketMember(docId: Long, sig: Array[Long])

/** Every (docId, sig) seen in one band bucket so far. */
final case class BucketState(members: List[BucketMember])

/** A near-dup candidate pair with its signature-agreement estimate of
  * Jaccard similarity. The same pair can surface from several bands —
  * downstream consumers dedup by (da, db), e.g. via the idempotent
  * keyed upsert sink ([[Sinks.upsertByKey]]). */
final case class NearDupPair(da: Long, db: Long, estJaccard: Double)

/** Streaming near-duplicate detection (op 45, unbounded form): MinHash
  * signatures computed map-side per arriving document, LSH band buckets as
  * the state key, and an arbitrary stateful op that compares each new
  * document ONLY against its bucket's members — the streaming twin of the
  * batch `dedup_minhash_lsh` candidate join.
  *
  * Scale design: state is hash-partitioned by (band, bucket-hash) across
  * executors; a bucket's member list stays near-dup-cluster-sized because
  * bucketing IS the candidate filter (unrelated documents land in other
  * buckets), so per-event work is O(cluster size), never O(corpus).
  * Similarity is estimated from signature agreement (the unbiased MinHash
  * estimator) — no shingle storage and no joins against historic data;
  * state per member is one `DedupQueries.minhashK`-long signature.
  * Replays are no-ops (a docId already in the bucket is skipped), so
  * at-least-once delivery cannot self-pair or duplicate-pair a document.
  * For unbounded corpora pass `stateTtl`: buckets idle past the horizon
  * are dropped (timed-out state is removed, not re-armed), and near-dups
  * of records older than the horizon are found by the batch backfill
  * instead — the standard lambda split.
  *
  * Hot-bucket saturation: a degenerate bucket (template spam — m
  * near-identical documents) would otherwise store O(m) signatures, scan
  * O(m) per arrival, and emit O(m²) pairs — the exact blowup the batch
  * path's shingle df-cap guards against. The streaming twin of that
  * policy is `maxBucket`: once a bucket holds `maxBucket` members it is
  * saturated — later arrivals are neither compared nor stored, so state
  * is ≤ maxBucket signatures per bucket and lifetime emission is
  * ≤ maxBucket·(maxBucket−1)/2 pairs per bucket. Pairs involving a
  * post-saturation document can still surface from the document's OTHER
  * bands (8 independent chances), and the spam cluster itself is already
  * fully connected through the pairs emitted before saturation — the
  * downstream connected-components pass reaches the same clusters.
  *
  * The signature width and banding are THE batch definitions
  * ([[graft.operators.DedupQueries.lshBandStruct]]) — one source of
  * truth, so stream buckets cannot desynchronize from batch buckets. */
object StreamNearDup {

  import graft.operators.DedupQueries

  /** Arriving (doc_id, text) frame → one row per (band, bucket): the
    * signature stage is fully map-side (no shuffle before groupByKey),
    * mirroring the batch LSH path. */
  def bandedStream(docs: DataFrame): Dataset[BandedDoc] = {
    val sig = docs
      .select(col("doc_id"),
        VectorFunctions.wordShingles(lower(trim(col("text"))), 4).as("f"))
      // shingle-less docs would all share one sentinel bucket (see the
      // batch path's identical guard)
      .filter(size(col("f")) > 0)
      .select(col("doc_id"),
        VectorFunctions.minhashSig(col("f"), DedupQueries.minhashK).as("sig"))
    sig.select(col("doc_id"),
      DedupQueries.lshBandStruct(col("sig")).as("e"), col("sig"))
      .select(col("e.band").as("band"), col("e.bh").as("bh"),
        col("doc_id").as("docId"), col("sig"))
      .as[BandedDoc](Encoders.product[BandedDoc])
  }

  private[streaming] def update(
      tau: Double, ttlMs: Option[Long], maxBucket: Int)(
      key: (Int, Long),
      docs: Iterator[BandedDoc],
      state: GroupState[BucketState]): Iterator[NearDupPair] = {
    if (state.hasTimedOut) {
      // idle past the horizon: drop the bucket entirely (do NOT re-arm
      // or re-persist — that would leak the state this seam bounds)
      state.remove()
      return Iterator.empty
    }
    var members = if (state.exists) state.get.members else Nil
    var nMembers = members.size
    val out = List.newBuilder[NearDupPair]
    docs.foreach { d =>
      // saturation is a pure function of stored state (size == cap), so
      // replayed batches reach the same decision — no extra flag to keep
      if (nMembers < maxBucket && !members.exists(_.docId == d.docId)) {
        members.foreach { m =>
          var eq = 0
          var i = 0
          while (i < d.sig.length) {
            if (d.sig(i) == m.sig(i)) eq += 1
            i += 1
          }
          val est = eq.toDouble / d.sig.length
          if (est >= tau) {
            val (a, b) =
              if (m.docId < d.docId) (m.docId, d.docId)
              else (d.docId, m.docId)
            out += NearDupPair(a, b, est)
          }
        }
        members = BucketMember(d.docId, d.sig) :: members
        nMembers += 1
      }
    }
    state.update(BucketState(members))
    // the timeout clock re-arms on every batch that touches the bucket,
    // so "idle for ttl" (not "alive for ttl") is what expires it
    ttlMs.foreach(state.setTimeoutDuration)
    out.result().iterator
  }

  /** Default bucket-saturation bound: a genuine near-dup cluster of this
    * size is already fully connected by the ≤ cap·(cap−1)/2 pairs emitted
    * before saturation, and anything larger is template spam whose extra
    * members add state and quadratic emission but no new cluster. */
  val defaultMaxBucket = 64

  /** Detect near-dup pairs in a streaming (doc_id, text) frame: emits a
    * pair the moment the second member of it arrives, across micro-batch
    * boundaries. `stateTtl` bounds state for unbounded corpora (idle
    * buckets expire); None keeps state forever (bounded corpora, tests).
    * `maxBucket` bounds hot-bucket state/emission (see the saturation
    * note above). */
  def detect(
      docs: DataFrame,
      tau: Double = 0.5,
      stateTtl: Option[Long] = None,
      maxBucket: Int = defaultMaxBucket): Dataset[NearDupPair] =
    bandedStream(docs)
      .groupByKey(d => (d.band, d.bh))(
        Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong))
      .flatMapGroupsWithState(
        OutputMode.Append,
        if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout)(update(tau, stateTtl, maxBucket))(
        Encoders.product[BucketState], Encoders.product[NearDupPair])
}
