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
    val df = q("sample_hash")
    if (Layout.hasShuffleExchange(df))
      fail("sample membership must not shuffle:\n"
        + df.queryExecution.executedPlan)
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

  test("streaming corpus ingest: gate → checksum dedup → split counts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val spark0 = spark
    implicit val sqlCtx = spark0.sqlContext
    import spark0.implicits._
    // at-least-once document feed: ids 1..60; every 7th doc is a one-token
    // reject; several records replayed verbatim across micro-batches
    def text(i: Long): String =
      if (i % 7 == 0) "tiny" else s"document number $i has enough tokens"
    val in = MemoryStream[Long]
    val ingest = in.toDF().toDF("doc_id")
      .withColumn("text", udf((i: Long) => text(i)).apply(col("doc_id")))
      .withColumn("checksum", md5(hex(encode(col("text"), "UTF-8"))))
      .filter(size(split(lower(trim(col("text"))), "\\s+")) >= 3)
      .dropDuplicates("checksum") // stateful: replays collapse across batches
      .select(col("doc_id"), SamplingQueries.splitOf(col("doc_id")).as("split"))
    val q = ingest.writeStream.format("memory").queryName("corpus_ingest")
      .outputMode("append").start()
    try {
      in.addData(1L to 40L: _*)
      q.processAllAvailable()
      in.addData(30L to 60L: _*) // 30..40 are replays
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("corpus_ingest").groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = (1L to 60L).filter(_ % 7 != 0).toDF("doc_id")
      .select(SamplingQueries.splitOf(col("doc_id")).as("split"))
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // replays dropped, rejects gated, every survivor split-assigned exactly
    // as the batch backfill would assign it
    assert(got == expected, s"got $got expected $expected")
  }

  test("importance sampling is map-side, keeps exactly u<q, and is " +
      "quality-biased (kept mean quality > dropped mean quality)") {
    val df = q("sample_importance")
    if (Layout.hasShuffleExchange(df))
      fail("importance sampling must not shuffle:\n"
        + df.queryExecution.executedPlan)
    val kept = df.collect()
    assert(kept.nonEmpty)
    kept.foreach(r =>
      assert(r.getAs[Double]("u01") < r.getAs[Double]("q")))
    // the sampler must actually BIAS toward quality: compare the kept
    // mean score against the full-corpus mean recomputed independently
    // from text_quality (the shared-expression contract)
    val all = graft.operators.TextQueries
      .queries("text_quality")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality_score"))
      .toMap
    val keptIds = kept.map(_.getAs[Long]("doc_id")).toSet
    val keptMean = keptIds.toSeq.map(all).sum / keptIds.size
    val dropped = all.keys.filterNot(keptIds).toSeq
    assert(dropped.nonEmpty, "a sampler that keeps everything is vacuous")
    val dropMean = dropped.map(all).sum / dropped.size
    assert(keptMean > dropMean,
      f"kept mean $keptMean%.3f must exceed dropped mean $dropMean%.3f")
    // and the score the sampler used must BE text_quality's score
    kept.foreach(r =>
      assert(r.getAs[Double]("q") == all(r.getAs[Long]("doc_id")),
        "sampler and text_quality disagree on a doc's score"))
  }

  test("leakage-safe split: no near-dup pair straddles a split boundary " +
      "(and the naive per-doc hash WOULD have leaked)") {
    val safe = q("sample_split_safe").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("component"), r.getAs[String]("split"))).toMap
    val pairs = graft.operators.DedupQueries
      .sharedPairs(spark, sfDir).select("da", "db").collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db")))
    assert(pairs.nonEmpty, "corpus premise: near-dup pairs exist")
    pairs.foreach { case (a, b) =>
      assert(safe(a)._2 == safe(b)._2,
        s"pair ($a,$b) split across ${safe(a)._2}/${safe(b)._2}")
      assert(safe(a)._1 == safe(b)._1, "paired docs share a component")
    }
    // the guarantee is non-vacuous: independent per-doc hashing assigns
    // at least one near-dup pair to different splits on this corpus
    import graft.operators.SamplingQueries.splitOf
    val naive = Tables.scan(spark, sfDir, "documents")
      .select(col("doc_id"), splitOf(col("doc_id")).as("s")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pairs.exists { case (a, b) => naive(a) != naive(b) },
      "premise: naive split must leak on this corpus, else the test " +
        "proves nothing")
    // singleton docs keep the naive assignment (component = own id)
    val paired = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    safe.filterNot { case (id, _) => paired(id) }.foreach {
      case (id, (comp, s)) =>
        assert(comp == id && s == naive(id))
    }
  }

  test("interleave: every prefix holds each source near its target " +
      "mixture until a source exhausts — the stride guarantee") {
    val p = Map("de" -> 0.2, "en" -> 0.4, "es" -> 0.2,
      "fr" -> 0.1, "zh" -> 0.1)
    val rows = graft.operators.CurationQueries
      .queries("curate_interleave")(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("pos"))
    val langs = rows.map(_.getAs[String]("lang"))
    assert(langs.toSet.subsetOf(p.keySet))
    // position sequence is the contiguous 0..n-1 permutation
    assert(rows.map(_.getAs[Long]("pos")).toSeq == (0L until rows.length))
    // no source exhausts before vt touches the smallest corpus/weight
    // ratio; below that every prefix tracks the target within ±|langs|
    val counts = langs.groupBy(identity).view.mapValues(_.length)
    val exhaustVt = counts.map { case (l, n) => n / p(l) }.min
    val safeLen = rows.count(_.getAs[Double]("vt") <= exhaustVt)
    for (m <- Seq(50, 100, 200, 300).filter(_ <= safeLen)) {
      val pre = langs.take(m).groupBy(identity).view.mapValues(_.length)
      p.foreach { case (l, w) =>
        val c = pre.getOrElse(l, 0)
        assert(math.abs(c - m * w) <= p.size,
          s"prefix $m: lang $l count $c vs target ${m * w}")
      }
    }
  }

  test("sequence packing: bins respect capacity (oversize docs sit " +
      "alone), offsets are exact prefix fills, seq ids are contiguous") {
    val cap = 512L
    val rows = graft.operators.CurationQueries
      .queries("curate_pack_sequences")(spark, sfDir).collect()
    val nDocs = Tables.scan(spark, sfDir, "documents").count()
    assert(rows.length == nDocs, "every doc packs exactly once")
    val byBin = rows.groupBy(r =>
      (r.getAs[Long]("block"), r.getAs[Long]("seq")))
    byBin.foreach { case ((blk, seq), docs) =>
      val fill = docs.map(_.getAs[Long]("tokens")).sum
      assert(fill <= cap || docs.length == 1,
        s"bin ($blk,$seq) overfull at $fill with ${docs.length} docs")
      // next-fit layout: offsets are the running fill in doc_id order
      val inOrder = docs.sortBy(_.getAs[Long]("doc_id"))
      var run = 0L
      inOrder.foreach { d =>
        assert(d.getAs[Long]("off_tok") == run,
          s"bin ($blk,$seq): doc ${d.getAs[Long]("doc_id")} offset " +
            s"${d.getAs[Long]("off_tok")} != running fill $run")
        run += d.getAs[Long]("tokens")
      }
    }
    // seqs within a block are contiguous from 0 (next-fit never skips)
    rows.groupBy(_.getAs[Long]("block")).foreach { case (blk, docs) =>
      val seqs = docs.map(_.getAs[Long]("seq")).distinct.sorted
      assert(seqs.head == 0L && seqs.last == seqs.length - 1,
        s"block $blk seq ids not contiguous: ${seqs.mkString(",")}")
    }
    // the geometry is non-trivial here: multi-doc bins exist
    assert(byBin.exists(_._2.length > 1))
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
