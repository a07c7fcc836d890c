package graft

import graft.operators.{CurationQueries, SimilarityQueries, TextQueries}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Contracts of the round's tokenizer-training / LM-scoring / chunking
  * operators. The DuckDB oracle pins exact values; these pin the
  * PROPERTIES each design claims: the BPE frequency-weighting identity,
  * the fixed-point cross-entropy's agreement with a driver-side float-free
  * recompute, content-defined chunk tiling + edit stability, and the
  * graded Lloyd round's exactness against an independent driver fold. */
class TokenizerChunkSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("text_bpe_pairs: freq-weighted vocab counts equal position-level " +
      "corpus counts (the BPE scale trick loses nothing)") {
    val graded = q("text_bpe_pairs").collect()
      .map(r => (r.getAs[String]("pair"),
        r.getAs[Long]("cnt"), r.getAs[Long]("n_types")))
    // naive path: enumerate adjacent char pairs at every CORPUS POSITION
    // (O(corpus) work — the shape the vocab-weighted plan avoids)
    val naive = Tables.scan(spark, sfDir, "documents")
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
      .filter(length(col("term")) >= 2)
      .select(col("term"), explode(transform(
        sequence(lit(1), length(col("term")) - 1),
        i => col("term").substr(i, lit(2)))).as("pair"))
      .groupBy("pair")
      .agg(count(lit(1)).as("cnt"),
        count_distinct(col("term")).as("n_types"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(20)
      .collect()
      .map(r => (r.getAs[String]("pair"),
        r.getAs[Long]("cnt"), r.getAs[Long]("n_types")))
    assert(graded.toSeq == naive.toSeq,
      "freq-weighted pair counts must be identical to position-level counts")
    assert(graded.length == 20)
  }

  test("text_perplexity: fixed-point cross-entropy equals a driver-side " +
      "integer recompute; buckets are total and non-degenerate") {
    val tf = Tables.scan(spark, sfDir, "documents")
      .select(col("doc_id"), explode(split(lower(trim(col("text"))),
        "\\s+")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("term"),
        r.getAs[Long]("tf")))
    val freq = tf.groupBy(_._2).map { case (t, rs) => t -> rs.map(_._3).sum }
    val totTok = freq.values.sum
    def lnq(x: Long): Long =
      math.floor(math.log(x.toDouble) * 1048576.0).toLong
    val lnqN = lnq(totTok)
    val expect = tf.groupBy(_._1).map { case (d, rs) =>
      d -> (rs.map(_._3).sum,
        rs.map(r => r._3 * (lnqN - lnq(freq(r._2)))).sum)
    }
    val graded = q("text_perplexity").collect()
    assert(graded.length == expect.size)
    graded.foreach { r =>
      val (nTok, xFix) = expect(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_tok") == nTok)
      assert(r.getAs[Long]("xent_fix") == xFix,
        s"doc ${r.getAs[Long]("doc_id")}: fixed-point xent drifted")
      val perTok = xFix.toDouble / (nTok.toDouble * 1048576.0)
      val bucket = r.getAs[String]("bucket")
      assert(if (xFix < nTok * 3565158L) bucket == "head"
        else if (xFix < nTok * 3575644L) bucket == "middle"
        else bucket == "tail", s"bucket/threshold mismatch at $perTok")
    }
    // thresholds must split THIS corpus, not degenerate to one bucket
    assert(graded.map(_.getAs[String]("bucket")).distinct.length >= 2,
      "perplexity buckets are degenerate on the test corpus — retune " +
        "the fixed thresholds")
  }

  test("curate_chunk_cdc: chunks tile each document exactly") {
    val w = Tables.scan(spark, sfDir, "documents")
      .select(col("doc_id"), size(split(lower(trim(col("text"))),
        "\\s+")).cast("long").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val chunks = q("curate_chunk_cdc").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("start_tok"), r.getAs[Long]("n_tok")))
      .groupBy(_._1)
    assert(chunks.keySet == w.keySet, "every document is chunked")
    chunks.foreach { case (d, cs) =>
      val sorted = cs.sortBy(_._2).toSeq
      assert(sorted.head._3 == 0L, s"doc $d: first chunk starts at 0")
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          assert(b._3 == a._3 + a._4, s"doc $d: chunks not contiguous")
        case _ =>
      }
      assert(sorted.map(_._4).sum == w(d),
        s"doc $d: chunk lengths must sum to the token count")
      assert(sorted.forall(_._4 > 0), s"doc $d: empty chunk")
    }
  }

  test("curate_chunk_cdc: a prefix edit only changes the chunks it " +
      "touches — every later chunk keeps its identity (the CDC property)") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep dark forest while birds sing songs " +
      "above the tall green trees near the old stone bridge " +
      (1 to 120).map(i => s"tok$i word$i item$i").mkString(" ")
    val edited = "inserted preamble tokens completely change the start " + base
    val docs = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val out = CurationQueries.chunkCdc(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"),
        r.getAs[String]("chunk_md5")))
    val c1 = out.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    val c2 = out.filter(_._1 == 2L).map(_._3).toSet
    // boundaries depend only on each token's own hash, so every base-doc
    // boundary survives the prefix insertion: all base chunks EXCEPT the
    // first (whose start was absorbed into the edited region) must
    // reappear verbatim in the edited doc
    assert(c1.length >= 3, "premise: base doc must produce several chunks")
    val preserved = c1.drop(1)
    assert(preserved.forall(c2.contains),
      "chunks after the first boundary must survive a prefix edit")
    // and a fixed-stride chunker provably would NOT have: shifting by a
    // non-multiple of the stride realigns every window
    val stride = 5
    def strideChunks(t: String): Seq[String] =
      t.split("\\s+").grouped(stride).map(_.mkString(" ")).toSeq
    val sBase = strideChunks(base).drop(1)
    val sEdit = strideChunks(edited).toSet
    assert(sBase.count(sEdit.contains) < sBase.length,
      "premise: fixed-stride chunking must lose alignment on this edit")
  }

  test("dedup_pagerank: 3 fixed-point rounds equal an independent " +
      "driver-side fold; hubs outrank leaves") {
    val pairEdges = graft.operators.DedupQueries
      .sharedPairs(spark, sfDir)
      .select("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairEdges.nonEmpty, "corpus premise: near-dup pairs exist")
    val edges = pairEdges.flatMap(p => Seq(p, p.swap))
    val deg = edges.groupBy(_._1).map { case (v, es) => v -> es.length }
    var pr: Map[Long, Long] = deg.map { case (v, _) => v -> 1048576L }
    for (_ <- 1 to 3) {
      val sc = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) =>
          math.floor(pr(src).toDouble / deg(src).toDouble).toLong }.sum
      }
      pr = deg.map { case (v, _) =>
        v -> (157286L + math.floor(
          (sc.getOrElse(v, 0L) * 85).toDouble / 100.0).toLong)
      }
    }
    val graded = q("dedup_pagerank").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pr_fix"),
        r.getAs[Double]("pr")))
    assert(graded.length == pr.size, "vertex set = pair endpoints")
    graded.foreach { case (v, fix, d) =>
      assert(fix == pr(v), s"vertex $v: fixed-point rank drifted")
      assert(d == fix.toDouble / 1048576.0)
    }
    // rank mass stays in the teleport/[~1] band: dup clusters are
    // near-cliques (regular subgraphs converge to ~SCALE under the
    // per-vertex-normalized form), so the discriminating signal here is
    // the floor-loss spread across clique sizes, not hub-vs-leaf
    assert(pr.values.forall(p => p > 157286L && p <= 1153434L),
      "ranks must stay within the teleport..1.1*SCALE band")
  }

  test("sim_kmeans: graded Lloyd round equals an independent driver-side " +
      "fold (assignment, exact fixed-point means, shift)") {
    val e = Tables.scan(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray)
    assert(e.length > 16, "premise: more vectors than seeds")
    val seeds = e.filter(_._1 < 16).sortBy(_._1)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def nrm(a: Array[Float]): Double = math.sqrt(dot(a, a))
    val asg = e.map { case (id, v) =>
      // argmax cosine, ties to the LOWEST cid — same fold as assignNearest
      val best = seeds.foldLeft((Double.NegativeInfinity, Long.MaxValue)) {
        case ((bd, bc), (cid, c)) =>
          val d = dot(v, c) / (nrm(v) * nrm(c))
          if (d > bd) (d, cid) else (bd, bc)
      }
      (best._2, v)
    }
    val expect = asg.groupBy(_._1).map { case (cid, vs) =>
      val dims = vs.head._2.length
      val cent = (0 until dims).map { d =>
        val sx = vs.map(v => math.floor(v._2(d).toDouble * 1e6).toLong).sum
        sx.toDouble / (vs.length.toDouble * 1e6)
      }
      val seed = seeds.find(_._1 == cid).get._2
      val shift = math.sqrt(cent.zip(seed).map {
        case (a, b) => (a - b.toDouble) * (a - b.toDouble) }.sum)
      cid -> (vs.length.toLong, cent, shift)
    }
    // graded output is per-dimension rows (cluster, dim, cx, n, shift) —
    // reassemble each cluster's centroid from its dim rows before comparing
    val graded = q("sim_kmeans").collect()
      .groupBy(_.getAs[Long]("cluster"))
    assert(graded.map(_._2.head.getAs[Long]("n")).sum == e.length,
      "clusters must partition the corpus")
    assert(graded.size == expect.size)
    graded.foreach { case (cid, rs) =>
      val (n, cent, shift) = expect(cid)
      assert(rs.forall(_.getAs[Long]("n") == n))
      assert(rs.forall(_.getAs[Double]("shift") == shift))
      val gc = rs.sortBy(_.getAs[Int]("dim")).map(_.getAs[Double]("cx")).toSeq
      assert(rs.map(_.getAs[Int]("dim")).sorted.toSeq == (0 until cent.length),
        s"cluster $cid: dim rows must cover 0..dims-1 exactly once")
      assert(gc.length == cent.length &&
        gc.zip(cent).forall { case (a, b) => a == b },
        s"cluster $cid: fixed-point centroid drifted")
    }
  }

  test("BPE mergeRepr: double-space encoding performs exact leftmost " +
      "non-overlapping merges on adjacent-site words (ADVICE r12)") {
    // the single-space encoding failed exactly here: a literal replace of
    // " a b " consumes the delimiter shared with the NEXT site, so
    // "abab" under merge (a,b) came out [ab, a, b] instead of [ab, ab].
    // The corpus-level spec below can't catch it (no learned pair occurs
    // twice adjacently in the test vocabulary), so pin the kernel on
    // adversarial words directly against the algorithmic reference.
    import graft.operators.TextQueries.{mergeRepr, symInit, symSplit}
    def mergeOne(syms: Vector[String], a: String, b: String)
        : Vector[String] = {
      val buf = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          buf += (a + b); i += 2
        } else { buf += syms(i); i += 1 }
      }
      buf.result()
    }
    val words = Seq("ab", "abab", "ababab", "abababa", "aaa", "aaaa",
      "aaaaa", "aaaaaa", "aab", "baa", "aba", "abba", "babab", "cabab")
    import spark.implicits._
    for ((a, b) <- Seq(("a", "b"), ("a", "a"), ("b", "a"))) {
      val got = words.toDF("term")
        .select(col("term"),
          symSplit(mergeRepr(symInit(col("term")), a, b)).as("syms"))
        .collect()
        .map(r => r.getString(0) ->
          r.getAs[scala.collection.Seq[String]]("syms").toVector)
        .toMap
      words.foreach { w =>
        val expect = mergeOne(w.map(_.toString).toVector, a, b)
        assert(got(w) == expect,
          s"word '$w' merge ($a,$b): got ${got(w)}, expect $expect")
      }
    }
    // chained merges, merged tokens as later pair members: (a,b) then
    // (ab,ab) — adjacent merged-token sites must again merge leftmost
    val got2 = words.toDF("term")
      .select(col("term"), symSplit(mergeRepr(
        mergeRepr(symInit(col("term")), "a", "b"), "ab", "ab")).as("syms"))
      .collect()
      .map(r => r.getString(0) ->
        r.getAs[scala.collection.Seq[String]]("syms").toVector)
      .toMap
    words.foreach { w =>
      val expect =
        mergeOne(mergeOne(w.map(_.toString).toVector, "a", "b"), "ab", "ab")
      assert(got2(w) == expect,
        s"word '$w' chained (a,b)+(ab,ab): got ${got2(w)}, expect $expect")
    }
  }

  test("text_bpe_train: the distributed merge loop equals an independent " +
      "driver-side BPE reference (leftmost non-overlapping merges)") {
    // reference implementation straight from the algorithm statement:
    // symbol sequences as vectors, pair counts as a mutable map, merges
    // applied left-to-right non-overlapping — no string/replace tricks,
    // so agreement proves the spaced-string `replace` encoding is faithful
    var words: Seq[(Vector[String], Long)] =
      Tables.scan(spark, sfDir, "documents")
        .select(explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
        .groupBy("term").agg(count(lit(1)).as("freq"))
        .collect()
        .map(r => (r.getString(0).map(_.toString).toVector, r.getLong(1)))
        .toSeq
    def mergeOne(syms: Vector[String], a: String, b: String)
        : Vector[String] = {
      val buf = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          buf += (a + b); i += 2
        } else { buf += syms(i); i += 1 }
      }
      buf.result()
    }
    val expect = (1 to 5).map { r =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- words; i <- 0 until syms.length - 1)
        counts.updateWith((syms(i), syms(i + 1)))(
          c => Some(c.getOrElse(0L) + f))
      val ((a, b), c) = counts.toSeq
        .minBy { case ((a, b), c) => (-c, a, b) }
      words = words.map { case (syms, f) => (mergeOne(syms, a, b), f) }
      (r, a, b, a + b, c)
    }
    val graded = q("text_bpe_train").collect()
      .map(r => (r.getAs[Int]("round"), r.getAs[String]("a"),
        r.getAs[String]("b"), r.getAs[String]("merged"),
        r.getAs[Long]("cnt"))).toSeq
    assert(graded == expect,
      s"merge table diverged from the reference: $graded vs $expect")
    // the merge sequence must be strictly useful: counts are positive and
    // each round's best count can only shrink or hold as pairs merge away
    assert(expect.forall(_._5 > 0))

    // ENCODE side: per-doc BPE token counts equal the reference's
    // (apply the same 5 merges to each word, count symbols, weight by tf)
    val symCount = words.map { case (syms, _) =>
      syms.mkString -> syms.length.toLong }.toMap
    val tf = Tables.scan(spark, sfDir, "documents")
      .select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expectDoc = tf.groupBy(_._1).map { case (id, rows) =>
      id -> (
        rows.map(_._3).sum,                                // n_words
        rows.map(r => r._3 * r._2.length).sum,             // n_chars_tok
        rows.map(r => r._3 * symCount(r._2)).sum)          // n_bpe_tokens
    }
    val enc = q("text_bpe_encode").collect()
    assert(enc.length == expectDoc.size)
    enc.foreach { r =>
      val (w, c, t) = expectDoc(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_words") == w)
      assert(r.getAs[Long]("n_chars_tok") == c)
      assert(r.getAs[Long]("n_bpe_tokens") == t,
        s"doc ${r.getAs[Long]("doc_id")}: BPE token count")
      // merges only ever shorten: words ≤ bpe tokens ≤ chars
      assert(w <= t && t <= c)
      assert(r.getAs[Double]("compression") == c.toDouble / t.toDouble)
    }
  }
}
