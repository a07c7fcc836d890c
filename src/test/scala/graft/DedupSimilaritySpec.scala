package graft

import graft.operators.{DedupQueries, SimilarityQueries}

/** Recall/parity contracts for the hash-based dedup + ANN operators that
  * have no SQL oracle (SURVEY.md §5.2): LSH candidates must agree with the
  * exact computations they approximate. */
class DedupSimilaritySpec extends SparkSpec {

  private def pairs(name: String): Set[(Long, Long)] =
    (if (DedupQueries.queries.contains(name)) DedupQueries.queries(name)
     else SimilarityQueries.queries(name))(spark, sfDir)
      .select("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  /** The xxhash64 MinHash+LSH verified pairs — retired from the graded
    * catalog in r14 (subsumed by the value-pinned `dedup_lsh_bands` and
    * graded through `dedup_lsh_quality`); the contracts here still pin
    * the production path directly. */
  private def lshVerifiedPairs: Set[(Long, Long)] =
    DedupQueries.lshVerified(spark, sfDir)
      .select("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("substring rewrite excises exactly the reported span, and exactly " +
      "the detected docs are rewritten") {
    import org.apache.spark.sql.functions._
    val rw = DedupQueries.queries("dedup_substring_rewrite")(spark, sfDir)
    val docs = graft.sources.Tables.scan(spark, sfDir, "documents")
      .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("w"))
    val joined = rw.join(docs, "doc_id")
      .select(col("doc_id"), col("span_words"),
        size(col("w")).as("n_orig"),
        // split("") yields [""] (size 1), so count the empty rewrite as 0
        when(col("new_text") === "", lit(0))
          .otherwise(size(split(col("new_text"), " "))).as("n_new"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (nOrig, nNew) = (r.getAs[Int]("n_orig"), r.getAs[Int]("n_new"))
      val span = r.getAs[Long]("span_words")
      assert(nNew == nOrig - span,
        s"doc ${r.get(0)}: $nOrig words - span $span != rewritten $nNew")
    }
    // the rewrite targets the LATER doc of each detected pair — the
    // rewritten doc set must be exactly the detection's db set
    val detected = DedupQueries.queries("dedup_substring")(spark, sfDir)
      .select("db").distinct().collect().map(_.getLong(0)).toSet
    assert(joined.map(_.getAs[Long]("doc_id")).toSet == detected)
  }

  test("substring rewrite-all: cut accounting closes, and it cuts at " +
      "least as much as the longest-span rewrite") {
    import org.apache.spark.sql.functions._
    val all = DedupQueries.queries("dedup_substring_rewrite_all")(spark, sfDir)
      .select(col("doc_id"), col("n_words"), col("cut_words"),
        when(col("new_text") === "", lit(0))
          .otherwise(size(split(col("new_text"), " "))).as("n_new"))
      .collect()
    assert(all.nonEmpty)
    all.foreach { r =>
      assert(r.getAs[Int]("n_new") ==
        r.getAs[Int]("n_words") - r.getAs[Long]("cut_words"),
        s"doc ${r.get(0)}: words minus cut must equal rewritten length")
    }
    // the all-spans cut can never be smaller than the single longest span
    val longest = DedupQueries
      .queries("dedup_substring_rewrite")(spark, sfDir)
      .select("doc_id", "span_words").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cuts = all.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("cut_words")).toMap
    assert(cuts.keySet == longest.keySet)
    longest.foreach { case (d, span) =>
      assert(cuts(d) >= span, s"doc $d: all-span cut ${cuts(d)} < $span")
    }
  }

  test("minhash-LSH near-dup pairs ⊆ exact n-gram-Jaccard pairs") {
    val exact = pairs("dedup_ngram_jaccard")
    val lsh = lshVerifiedPairs
    assert(lsh.subsetOf(exact),
      s"LSH emitted non-near-dup pairs: ${lsh.diff(exact)}")
    // 8 bands × 4 rows at τ=0.5 → expected recall ≈ 1 on this data
    assert(lsh.size >= (exact.size * 0.9).toInt,
      s"LSH recall too low: ${lsh.size}/${exact.size}")
  }

  test("simhash finds the high-Jaccard near-dup pairs") {
    val exact = pairs("dedup_ngram_jaccard")
    // retired from the graded catalog (subsumed by dedup_simhash_bands +
    // dedup_simhash_quality); the contract pins the production path
    val sim = DedupQueries.simhashPairs(spark, sfDir)
      .select("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // hamming ≤3 on 64 bits is a tighter near-dup notion than jaccard ≥0.5;
    // it must still be dominated by the exact near-dup set
    assert(sim.subsetOf(exact),
      s"simhash emitted pairs outside exact near-dups: ${sim.diff(exact)}")
    assert(sim.nonEmpty, "simhash found no pairs at all")
  }

  test("ANN-LSH results are true neighbors of the same query") {
    val brute = SimilarityQueries.queries("sim_topk")(spark, sfDir)
      .select("qid", "vec_id", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // retired from the graded catalog (subsumed by sim_ann_lsh_pinned);
    // the contract still pins the production xxhash64 path directly
    val ann = SimilarityQueries.annTopK(spark, sfDir, "lsh")
      .select("qid", "vec_id", "cosine").collect()
    assert(ann.nonEmpty, "ANN returned nothing")
    // every ANN hit must carry the exact cosine the brute-force run computed
    // (when it appears in the brute-force top-10) — same fold, same value
    ann.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      brute.get(key).foreach(c => assert(c == r.getDouble(2)))
    }
  }

  test("IVF recall curve: more probes, monotonically more recall") {
    val brute = SimilarityQueries.queries("sim_topk")(spark, sfDir)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recalls = Seq(1, 2, 4).map { np =>
      val hits = SimilarityQueries.ivfTopK(spark, sfDir,
        kCentroids = 16, nprobe = np, lloydIters = 3)
        .select("qid", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      np -> hits.intersect(brute).size.toDouble / brute.size
    }
    // probing more lists can only add candidates → recall non-decreasing
    assert(recalls.sliding(2).forall { case Seq((_, a), (_, b)) => b >= a })
    assert(recalls.last._2 > recalls.head._2,
      s"wider probe should help on clustered data: $recalls")
    // deployment-knob floor: a quarter of the lists probed must recover
    // at least half of the exact top-k on this clustered corpus
    assert(recalls.last._2 >= 0.5,
      s"recall at nprobe=4 below floor: ${recalls.last._2}")
  }

  test("IVF ANN recall against brute force is usable") {
    val brute = SimilarityQueries.queries("sim_topk")(spark, sfDir)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // retired from the graded catalog (subsumed by sim_ann_ivf_flat);
    // the contract still pins the production Lloyd/IVF path directly
    val ivf = SimilarityQueries.annTopK(spark, sfDir, "ivf")
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.nonEmpty)
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    // nprobe=2 of 16 lists over 10 natural clusters — recall well above
    // random (10/500); exact bound is data-dependent, contract is "usable"
    assert(recall >= 0.3, s"IVF recall too low: $recall")
  }

  test("sim_ann_recall reports the true per-query hit counts of the " +
      "pinned searches (and every query keeps its row)") {
    val exact = SimilarityQueries.queries("sim_topk")(spark, sfDir)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val reported = SimilarityQueries.queries("sim_ann_recall")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1))
        -> (r.getLong(2), r.getLong(3))).toMap
    assert(reported.keys.map(_._1).toSet == Set("lsh_pinned", "ivf_flat"))
    // every (variant, qid) row must equal the intersection recomputed
    // from the graded pinned entries themselves — a twin, not a new truth
    val sides = Seq(
      "lsh_pinned" -> SimilarityQueries.lshPinnedTopK(spark, sfDir),
      "ivf_flat" -> SimilarityQueries.ivfFlatTopK(spark, sfDir))
    for ((variant, df) <- sides) {
      val ann = df.select("qid", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      exact.foreach { case (qid, truth) =>
        val got = ann.getOrElse(qid, Set.empty)
        val (hits, k) = reported((variant, qid))
        assert(k == truth.size.toLong,
          s"$variant qid=$qid: k=$k != |exact|=${truth.size}")
        assert(hits == got.intersect(truth).size.toLong,
          s"$variant qid=$qid: reported $hits" +
            s" != recomputed ${got.intersect(truth).size}")
      }
    }
    // usable floor: IVF-Flat probes 2 of 16 seeded lists with an exact
    // re-rank — mean recall well above the random baseline (10/N)
    val ivf = reported.collect { case (("ivf_flat", _), (h, k)) =>
      h.toDouble / k }
    assert(ivf.sum / ivf.size >= 0.3,
      s"mean IVF-Flat recall too low: ${ivf.sum / ivf.size}")
    // no pinned-LSH floor: 2^8 buckets over a tiny corpus are near-empty
    // and recall is legitimately ~0 — contractual is COVERAGE: a
    // zero-hit query must still report hits=0, never drop out
    val qids = exact.keySet
    for (v <- Seq("lsh_pinned", "ivf_flat"); q <- qids)
      assert(reported.contains((v, q)), s"missing report row ($v, $q)")
  }

  test("dedup_lsh_quality accounting closes against the graded pair " +
      "tables") {
    val q = DedupQueries.queries("dedup_lsh_quality")(spark, sfDir)
      .collect()
    assert(q.length == 1)
    val r = q.head
    val lsh = lshVerifiedPairs
    val exact = pairs("dedup_ngram_jaccard")
    assert(r.getAs[Long]("n_verified") == lsh.size)
    assert(r.getAs[Long]("n_exact") == exact.size)
    assert(r.getAs[Long]("n_true_positive") == lsh.intersect(exact).size)
    assert(r.getAs[Long]("n_candidates") >= r.getAs[Long]("n_verified"),
      "verify can only shrink the candidate set")
    val prec = r.getAs[Double]("candidate_precision")
    assert(prec > 0.0 && prec <= 1.0, s"precision out of range: $prec")
    // same floor as the subset/recall test above: 8×4 banding at τ=0.5
    assert(r.getAs[Double]("recall_vs_exact") >= 0.9,
      s"LSH recall vs exact below floor: ${r.getAs[Double]("recall_vs_exact")}")
  }

  test("simhash: shingle-less docs never pair (no sentinel-signature " +
      "blowup)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 40 sub-4-word docs (empty shingle sets — all would share the
    // constant empty-fold signature and emit C(40,2) hamming-0 pairs
    // without the guard) + one true near-dup pair of long docs
    val long1 = (1 to 30).map(i => s"w$i").mkString(" ")
    val long2 = (1 to 30).map(i => if (i == 30) "zz" else s"w$i").mkString(" ")
    val docs = ((1L to 40L).map(i => (i, "too short")) ++
      Seq((100L, long1), (101L, long2))).toDF("doc_id", "text")
    val fa = docs.select(col("doc_id"),
      graft.functions.VectorFunctions.wordShingles(
        lower(trim(col("text"))), 4).as("sh_feats"))
    val pairs = DedupQueries.simhashPairsOf(fa)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((100L, 101L)),
      s"expected only the true near-dup pair, got ${pairs.length} pairs")
  }

  test("dedup_simhash_quality histogram closes against the graded pair " +
      "tables") {
    val report = DedupQueries.queries("dedup_simhash_quality")(spark, sfDir)
      .collect()
    assert(report.nonEmpty, "simhash finds pairs on this corpus")
    // recompute the histogram from the graded entries themselves — the
    // report is a twin of dedup_simhash + dedup_ngram_jaccard, not a new
    // truth
    val sh = DedupQueries.simhashPairs(spark, sfDir).orderBy("da", "db")
      .collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db")) ->
        r.getAs[Int]("hamming")).toMap
    val exact = pairs("dedup_ngram_jaccard")
    val byHam = sh.groupBy(_._2).view
      .mapValues(_.keys.toSet).toMap
    assert(report.map(_.getAs[Int]("hamming")).toSet == byHam.keySet)
    var cum = 0L
    report.sortBy(_.getAs[Int]("hamming")).foreach { r =>
      val h = r.getAs[Int]("hamming")
      val inBucket = byHam(h)
      assert(r.getAs[Long]("n_pairs") == inBucket.size)
      val tp = inBucket.intersect(exact).size.toLong
      assert(r.getAs[Long]("n_exact_dup") == tp)
      assert(r.getAs[Double]("precision") == tp.toDouble / inBucket.size)
      cum += tp
      assert(r.getAs[Double]("recall_cum") == cum.toDouble / exact.size,
        s"hamming=$h cumulative recall mismatch")
      val (mn, mx) = (r.getAs[Double]("min_jaccard"),
        r.getAs[Double]("max_jaccard"))
      assert(mn >= 0.0 && mx <= 1.0 && mn <= mx)
      assert(r.getAs[Double]("mean_jaccard") >= mn
        && r.getAs[Double]("mean_jaccard") <= mx)
    }
    // the whole point of the report: low Hamming radius over shingle
    // features must actually find near-dups — true-dup mass, not noise
    val totalPairs = report.map(_.getAs[Long]("n_pairs")).sum
    val totalTp = report.map(_.getAs[Long]("n_exact_dup")).sum
    assert(totalTp.toDouble / totalPairs >= 0.5,
      s"simhash radius-3 precision collapsed: $totalTp/$totalPairs")
  }

  test("containment's quotient and direct branches are row-identical " +
      "(ContainmentEquivalence)") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"),
        r.getAs[Long]("common"), r.getAs[Long]("n_small"),
        r.getAs[Double]("containment"))).toSet
    val direct = rows(DedupQueries.containDirect(spark, sfDir))
    val quotient = rows(DedupQueries.containQuotient(spark, sfDir))
    assert(direct.nonEmpty, "corpus must produce at least one contained pair")
    assert(quotient == direct)
  }

  test("quotient pair build and clusters are row-identical to the " +
      "direct doc-level build on a dup-heavy corpus") {
    import org.apache.spark.sql.functions._
    // the sf1-sweep shape in miniature: the corpus ∪ two key-shifted
    // replicas, so every text sits in a 3-copy duplicate group
    val base = graft.sources.Tables.scan(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val docs = (0 to 2).map(i => base.select(
      (col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
    val sh = docs.select(col("doc_id"),
      explode(graft.functions.VectorFunctions
        .wordShingles(lower(trim(col("text"))), 4)).as("s")).distinct()
    val g = DedupQueries.textGroupsOf(docs)
    assert(DedupQueries.quotientPays(g), "3-copy corpus must take the " +
      "quotient path")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"),
          r.getAs[Double]("jaccard"))).toSet
    val direct = pairSet(DedupQueries.jaccardPairs(sh, 0.5))
    val gp = DedupQueries.groupedPairBuild(g, sh)
    val quotient = pairSet(DedupQueries.expandPairs(g, gp))
    assert(quotient == direct,
      s"pair sets differ: only-quotient=${(quotient -- direct).take(3)} " +
        s"only-direct=${(direct -- quotient).take(3)}")
    assert(direct.nonEmpty)
    // clusters: quotient CC + member fan-out ≡ CC over expanded pairs
    def clusterSet(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => (r.getAs[Long]("component"), r.getAs[Long]("size"),
          r.getAs[String]("members"))).toSet
    val (labels, _) = DedupQueries.connectedComponents(
      DedupQueries.expandPairs(g, gp).select(col("da"), col("db")))
    val directClusters = clusterSet(
      labels.groupBy(col("lbl").as("component"))
        .agg(count(lit(1)).as("size"),
          array_join(sort_array(collect_list(col("v"))), ",")
            .as("members")))
    val quotientClusters =
      clusterSet(DedupQueries.clustersViaQuotient(g, gp))
    assert(quotientClusters == directClusters)
  }

  test("LshQuotientEquivalence: the quotient-counted LSH funnel report " +
      "equals the member-level report on a dup-heavy corpus") {
    import org.apache.spark.sql.functions._
    // same miniature sf1-sweep shape as the pair-build equivalence test:
    // every text in a 3-copy duplicate group, so the quotient branch is
    // the one the graded query would take
    val base = graft.sources.Tables.scan(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val docs = (0 to 2).map(i => base.select(
      (col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
    val fa = docs.select(col("doc_id"),
      graft.functions.VectorFunctions.wordShingles(
        lower(trim(col("text"))), 4).as("sh_feats"))
    val sh = fa.select(col("doc_id"), explode(col("sh_feats")).as("s"))
      .distinct()
    val g = DedupQueries.textGroupsOf(docs)
    assert(DedupQueries.quotientPays(g))
    val gp = DedupQueries.groupedPairBuild(g, sh)
    // member-level ground truth (the pre-r17 formulation, inlined)
    val cand = DedupQueries.lshCandidatePairsFromArrays(fa)
    val ver = DedupQueries.verifyJaccard(cand, sh, 0.5).select("da", "db")
    val exact = DedupQueries.expandPairs(g, gp).select("da", "db")
    val tp = ver.join(exact, Seq("da", "db"), "left_semi")
    val expect = Map(
      "n_candidates" -> cand.count(), "n_verified" -> ver.count(),
      "n_exact" -> exact.count(), "n_true_positive" -> tp.count())
    // quotient-counted report
    val repSh = sh.join(g.select(col("rep").as("doc_id")), Seq("doc_id"),
      "left_semi")
    val got = DedupQueries.lshFunnelCountsQuotientOf(g, fa, repSh, gp)
      .collect().head
    expect.foreach { case (c, v) =>
      assert(got.getAs[Long](c) == v,
        s"$c: quotient ${got.getAs[Long](c)} != member-level $v")
    }
    assert(expect("n_candidates") > 0L)
  }

  test("cached corpus helpers are row-identical to the parameterized " +
      "builds they specialize (no silent drift between the two copies)") {
    import org.apache.spark.sql.functions._
    // groupPairs/groupCandidates/groupCommonCounts inline the candidate/
    // verify logic that groupedPairBuild keeps in parameterized form (so
    // the cached frames can be shared across policies); this pins the two
    // copies row-identical on the REAL corpus so they cannot drift apart.
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"),
          r.getAs[Double]("jaccard"))).toSet
    val cached = pairSet(DedupQueries.groupPairs(spark, sfDir))
    val param = pairSet(DedupQueries.groupedPairBuild(
      DedupQueries.textGroups(spark, sfDir),
      DedupQueries.shingles(spark, sfDir)))
    assert(cached.nonEmpty, "corpus must produce at least one group pair")
    assert(cached == param,
      s"cached groupPairs drifted from groupedPairBuild: " +
        s"only-cached=${(cached -- param).take(3)} " +
        s"only-param=${(param -- cached).take(3)}")
    // docComponents' inline quotient-CC labeling must agree with
    // clustersViaQuotient's member fan-out on the same (g, gp) inputs
    val g = DedupQueries.textGroups(spark, sfDir)
    if (DedupQueries.quotientPays(g)) {
      val fromClusters = DedupQueries
        .clustersViaQuotient(g, DedupQueries.groupPairs(spark, sfDir))
        .select(col("component"),
          explode(split(col("members"), ",")).cast("long").as("doc_id"))
        .collect().map(r => (r.getLong(1), r.getLong(0))).toSet
      val fromLabels = DedupQueries.docComponents(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(fromLabels == fromClusters)
    }
  }

  test("df-cap kills stop-shingle candidate blowup without losing true pairs") {
    import spark.implicits._
    // 60 unrelated docs that all share one boilerplate shingle (df=60),
    // plus each doc's 5 unique shingles; docs 100/101 are true near-dups
    // sharing 4 rare shingles (jaccard 4/6 ≈ 0.67)
    val boiler = (1L to 60L).map(d => (d, "hot shingle boiler plate"))
    val unique = (1L to 60L).flatMap(d => (1 to 5).map(i => (d, s"u $d $i x")))
    val dup = Seq(100L, 101L).flatMap(d =>
      (1 to 4).map(i => (d, s"shared dup shingle $i")) :+
        ((d, s"own $d tail y")))
    val sh = (boiler ++ unique ++ dup).toDF("doc_id", "s")

    // uncapped: the hot shingle alone contributes C(60,2) = 1770 candidates
    val uncapped = operators.DedupQueries.candidatePairs(sh, maxDf = 10000)
    assert(uncapped.count() === 1771)
    // capped: only the true near-dup pair survives candidate generation
    val capped = operators.DedupQueries.candidatePairs(sh, maxDf = 50)
    assert(capped.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      === Seq((100L, 101L)))
    // and verify reports the TRUE full-set jaccard for it
    val pairs = operators.DedupQueries.jaccardPairs(sh, 0.5, maxDf = 50)
      .collect()
    assert(pairs.length === 1)
    assert(math.abs(pairs.head.getDouble(2) - 4.0 / 6.0) < 1e-12)
  }

  test("MinHash+LSH finds the dup clusters the df-cap drops") {
    import spark.implicits._
    // 60 near-identical copies of one template (6 shared shingles + 1 own
    // each → pairwise jaccard 6/8 = 0.75). Every shared shingle has
    // df = 60 > cap, so the capped inverted index yields NO candidates —
    // the documented recall collapse. LSH signatures are per-document, so
    // the cluster still buckets together at linear cost.
    val sh = (1L to 60L).flatMap(d =>
      (1 to 6).map(i => (d, s"template shingle $i phrase")) :+
        ((d, s"own $d tail")))
      .toDF("doc_id", "s")
    val capped = operators.DedupQueries
      .candidatePairs(sh, operators.DedupQueries.maxShingleDf)
    assert(capped.count() == 0, "df-cap should drop the whole cluster")
    val lsh = operators.DedupQueries.lshCandidatePairs(sh)
    val verified = operators.DedupQueries.verifyJaccard(lsh, sh, 0.5)
      .collect()
    // 8 bands × 4 rows at j=0.75 → P(pair found) ≈ 0.95; demand the bulk
    // of the C(60,2)=1770 pairs and exact jaccard on every one found
    assert(verified.length >= 1500,
      s"LSH recall collapsed on the dup cluster: ${verified.length}/1770")
    verified.foreach(r => assert(math.abs(r.getDouble(2) - 0.75) < 1e-12))
  }

  test("connected components: deep chain converges in O(log d) rounds") {
    import spark.implicits._
    // a 200-vertex path — diameter 199. Hop-only min-label propagation
    // moves the min ONE edge per round, so this would slam into the
    // round safety cap and return unconverged labels; alternating
    // large-star/small-star halves tree height per round instead.
    val n = 200L
    val pairs = (0L until n - 1).map(i => (i, i + 1)).toDF("da", "db")
    val (labels, rounds) =
      operators.DedupQueries.connectedComponents(pairs)
    val lbls = labels.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(lbls.length == n)
    assert(lbls.forall(_._2 == 0L), "chain must collapse to one component")
    info(s"200-vertex chain converged in $rounds rounds")
    assert(rounds <= 10, s"deep chain took $rounds rounds (expected ~log d)")
  }

  test("connected components: bounded actions per star round") {
    import spark.implicits._
    // two chains + a pair: path 20-21-22-23 forces multiple rounds
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 23L)).toDF("da", "db")
    val actions = new java.util.concurrent.atomic.AtomicInteger
    val listener =
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = { actions.incrementAndGet(); () }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      }
    spark.listenerManager.register(listener)
    try {
      val (labels, rounds) =
        operators.DedupQueries.connectedComponents(pairs)
      // listener delivery is async — wait until the count stabilizes
      var last = -1
      var cur = actions.get
      while (cur != last) { Thread.sleep(500); last = cur; cur = actions.get }
      assert(rounds >= 2, s"path graph should need several rounds: $rounds")
      // the LS/SS contract: exactly two eager checkpoints + one
      // single-row fingerprint per round, plus the initial edge-list
      // checkpoint and fingerprint — driver work stays O(rounds), never
      // O(|V|) or O(|E|)
      assert(cur <= 3 * rounds + 2, s"$cur actions for $rounds rounds")
      val comps = labels.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
        10L -> 10L, 11L -> 10L,
        20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L))
    } finally spark.listenerManager.unregister(listener)
  }

  test("connected components match union-find on random graphs") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // driver-side reference: union-by-min — the root of every merge tree
    // is the component minimum, exactly the label contract of the
    // distributed min-label propagation
    def ufLabels(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(v => v -> find(v)).toMap
    }
    // random sparse graphs over ≤ 30 vertices (ids 0..29: a ∈ [0,24],
    // d ∈ [1,5]): parallel edges, long chains, stars, and disconnected
    // singletons all occur across seeds
    val edgeGen: Gen[List[(Long, Long)]] = for {
      n <- Gen.choose(0, 40)
      es <- Gen.listOfN(n, for {
        a <- Gen.choose(0L, 24L)
        d <- Gen.choose(1L, 5L)
      } yield (a, a + d))
    } yield es
    (1 to 6).foreach { i =>
      val seed = Seed(0xCC00L + i)
      val gen = edgeGen.apply(Gen.Parameters.default, seed)
      // a None here (e.g. a future suchThat on the generator) would
      // silently skip the seed and leave the property vacuous
      assert(gen.isDefined, s"generator produced no graph for seed $i")
      val es = gen.get
      val (labels, _) = DedupQueries.connectedComponents(
        es.toDF("da", "db"))
      val got = labels.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      withClue(s"seed=${0xCC00L + i} edges=$es: ")(
        assert(got == ufLabels(es)))
    }
  }

  test("embedding near-dup pairs are symmetric-free and above threshold") {
    val df = DedupQueries.queries("dedup_embedding")(spark, sfDir)
      .collect()
    assert(df.nonEmpty, "threshold should be non-vacuous on this corpus")
    df.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.35)
    }
  }

  test("semantic dedup: pairs are canonical true near-dups, and " +
      "cluster-bucketing only ever DROPS cross-cluster pairs ⊆ exact") {
    val sem = DedupQueries.queries("dedup_semantic")(spark, sfDir).collect()
    assert(sem.nonEmpty, "τ/cluster geometry should be non-vacuous here")
    sem.foreach { r =>
      assert(r.getAs[Long]("va") < r.getAs[Long]("vb"))
      assert(r.getAs[Double]("cosine") >= 0.35)
    }
    // soundness vs the unclustered exact twin on the range both cover
    // (dedup_embedding bounds both sides at vec_id < 500): a semantic
    // pair is found ONLY by looking inside one cluster, so every such
    // pair must also be an exact near-dup pair — clustering can lose
    // cross-cluster pairs (the SemDeDup recall tradeoff) but can never
    // invent one, and the shared-cosine values must agree bit-for-bit.
    val exact = DedupQueries.queries("dedup_embedding")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val semIn = sem.filter(_.getAs[Long]("vb") < 500)
    assert(semIn.nonEmpty)
    semIn.foreach { r =>
      val k = (r.getAs[Long]("va"), r.getAs[Long]("vb"))
      assert(exact.contains(k), s"semantic pair $k not in the exact set")
      assert(exact(k) == r.getAs[Double]("cosine"),
        s"cosine mismatch for $k — kernels must agree bit-for-bit")
    }
  }

  test("sim_quantize: codes match a driver-side IEEE recompute; absmax " +
      "element saturates; SSE obeys the half-step error bound") {
    val vecs = graft.sources.Tables.scan(spark, sfDir, "embeddings")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Float]](1).toArray)
      .toMap
    val graded = SparkEntry.queries("sim_quantize")(spark, sfDir).collect()
    assert(graded.length == vecs.size)
    graded.foreach { r =>
      val v = vecs(r.getAs[Long]("vec_id"))
      val maxabs = v.map(x => math.abs(x.toDouble)).max
      val scale = maxabs / 127.0
      def q(x: Float): Long =
        if (scale == 0.0) 0L else math.floor(x.toDouble / scale + 0.5).toLong
      assert(r.getAs[Double]("maxabs") == maxabs)
      assert(r.getAs[Double]("scale") == scale)
      // same fixed expression tree per element → bit-identical fold
      val checksum = v.zipWithIndex.map { case (x, i) => q(x) * (i + 1) }.sum
      assert(r.getAs[Long]("checksum") == checksum)
      val nSat = v.count(x => math.abs(q(x)) == 127L)
      assert(r.getAs[Long]("n_sat") == nSat)
      assert(nSat >= 1, "the absmax element must saturate to ±127")
      var sse = 0.0
      v.foreach { x =>
        val d = x.toDouble - q(x).toDouble * scale
        sse += d * d
      }
      assert(r.getAs[Double]("sse") == sse)
      // each code is within half a quantization step of its input, so
      // SSE ≤ dims · (scale/2)² (+1 ulp headroom for the rounding chain)
      assert(sse <= v.length * (scale / 2.0) * (scale / 2.0) * 1.0001,
        s"SSE $sse exceeds the half-step bound for ${r.getAs[Long]("vec_id")}")
      // codes fit int8: |q| ≤ 127 for every element
      v.foreach(x => assert(math.abs(q(x)) <= 127L))
    }
  }

  test("sim_pq: codes match a driver-side recompute; seed vectors " +
      "self-quantize losslessly; packed code is the nibble pack") {
    val vecs = graft.sources.Tables.scan(spark, sfDir, "embeddings")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Float]](1).toArray)
      .toMap
    val cents = (0L until 16L).map(vecs) // seed rule: vec_id < 16
    val d = vecs.head._2.length / 4
    def sub(v: Array[Float], m: Int): Array[Float] =
      v.slice(m * d, (m + 1) * d)
    def dist(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, c)) =>
        val dd = x.toDouble - c.toDouble; acc + dd * dd }
    val graded = SparkEntry.queries("sim_pq")(spark, sfDir).collect()
    assert(graded.length == vecs.size)
    graded.foreach { r =>
      val v = vecs(r.getAs[Long]("vec_id"))
      val codes = (0 until 4).map { m =>
        val ds = cents.map(c => dist(sub(v, m), sub(c, m)))
        ds.indexOf(ds.min) // first index of min = lowest-cid tie-break
      }
      val want = (0 until 4).map(m => r.getAs[Int](s"code$m"))
      assert(want == codes, s"vec ${r.getAs[Long]("vec_id")}: codes")
      assert(codes.forall(c => c >= 0 && c < 16), "codes fit one nibble")
      assert(r.getAs[Long]("code_packed") ==
        codes.zipWithIndex.map { case (c, m) =>
          c.toLong * (1L << (4 * m)) }.sum)
      val sse = (0 until 4).foldLeft(0.0) { (acc, m) =>
        acc + cents.map(c => dist(sub(v, m), sub(c, m))).min }
      assert(r.getAs[Double]("sse") == sse)
    }
    // a seed vector's nearest centroid in every subspace is itself
    (0L until 16L).foreach { cid =>
      val r = graded.find(_.getAs[Long]("vec_id") == cid).get
      assert((0 until 4).forall(m => r.getAs[Int](s"code$m") == cid.toInt))
      assert(r.getAs[Double]("sse") == 0.0)
    }
  }

  test("sim_pq_recall: every query reports, hits are bounded, and ADC " +
      "beats the random-selection baseline by an order of magnitude") {
    val rows = SparkEntry.queries("sim_pq_recall")(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("qid")).toSeq == (0L until 10L),
      "all 10 queries must report, zero-hit ones included")
    val n = graft.sources.Tables.scan(spark, sfDir, "embeddings").count()
    rows.foreach { r =>
      val h = r.getAs[Long]("hits")
      assert(h >= 0L && h <= 10L)
      assert(r.getAs[Double]("recall") == h.toDouble / 10.0)
    }
    // random 10-of-N top-10 expects 100/N hits per query (~0.2 at
    // sf0.001); untrained seed codebooks are crude, but ADC must still
    // carry real signal — an order of magnitude over chance across the
    // 10 queries is a loose floor (observed ~5.5 avg hits at sf0.001)
    val total = rows.map(_.getAs[Long]("hits")).sum
    assert(total.toDouble >= 10 * (100.0 / n) * 10,
      s"total hits $total is indistinguishable from random selection")
  }

  test("sim_ann_ivfpq_recall: probed-list restriction is honored and " +
      "the pruned search still beats the random baseline") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("sim_ann_ivfpq_recall")(spark, sfDir)
      .collect()
    assert(rows.map(_.getAs[Long]("qid")).toSeq == (0L until 10L))
    rows.foreach { r =>
      val h = r.getAs[Long]("hits")
      assert(h >= 0L && h <= 10L)
      assert(r.getAs[Double]("recall") == h.toDouble / 10.0)
    }
    val n = graft.sources.Tables.scan(spark, sfDir, "embeddings").count()
    val total = rows.map(_.getAs[Long]("hits")).sum
    assert(total.toDouble >= 10 * (100.0 / n) * 10,
      s"total hits $total is indistinguishable from random selection")
    // the IVF-as-filter effect is an empirical observation, not an
    // invariant — so the spec pins the WHOLE pipeline instead: a full
    // driver-side recompute of coarse assignment (cosine argmax), the
    // nprobe=2 probes, PQ codes, LUT scoring over the restricted
    // candidates, and the exact-L2 comparison must reproduce every
    // reported hit count.
    val vecs = graft.sources.Tables.scan(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Float]](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def l2(a: Array[Float], b: Array[Float], lo: Int, hi: Int): Double = {
      var acc = 0.0; var i = lo
      while (i < hi) {
        val d = a(i).toDouble - b(i).toDouble; acc += d * d; i += 1
      }
      acc
    }
    val cents = (0L until 16L).map(vecs)
    val dsub = vecs.head._2.length / 4
    def nearestK(v: Array[Float], k: Int): Seq[Int] =
      cents.zipWithIndex.map { case (c, cid) => (-cos(v, c), cid) }
        .sorted.take(k).map(_._2)
    val assign = vecs.map { case (id, v) => id -> nearestK(v, 1).head }
    val codes = vecs.map { case (id, v) =>
      id -> (0 until 4).map { m =>
        val ds = cents.map(c => l2(v, c, m * dsub, (m + 1) * dsub))
        ds.indexOf(ds.min)
      }
    }
    val expect = (0L until 10L).map { qid =>
      val q = vecs(qid)
      val probed = nearestK(q, 2).toSet
      val cand = vecs.keys.filter(v => v != qid && probed(assign(v)))
      val lut = (0 until 4).map(m =>
        cents.map(c => l2(q, c, m * dsub, (m + 1) * dsub)))
      val atop = cand.toSeq
        .map(v => (((0.0 + lut(0)(codes(v)(0))) + lut(1)(codes(v)(1))
          + lut(2)(codes(v)(2))) + lut(3)(codes(v)(3)), v))
        .sortBy { case (a, v) => (a, v) }.take(10).map(_._2).toSet
      val etop = vecs.keys.filter(_ != qid).toSeq
        .map(v => (l2(q, vecs(v), 0, q.length), v))
        .sortBy { case (d, v) => (d, v) }.take(10).map(_._2).toSet
      qid -> (etop & atop).size.toLong
    }.toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("hits") == expect(r.getAs[Long]("qid")),
        s"qid ${r.getAs[Long]("qid")}: reported hits diverge from the " +
          "driver-side IVF-PQ recompute")
    }
  }

  private def loadVecs(): Map[Long, Array[Float]] =
    graft.sources.Tables.scan(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Float]](1).toArray).toMap

  private def cosOf(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("sim_ann_lsh_pinned: a driver-side recompute of the dyadic codes " +
      "and in-bucket cosine top-10 reproduces the whole result") {
    val vecs = loadVecs()
    def code(v: Array[Float]): Long = {
      var acc = 0L
      var p = 7
      while (p >= 0) {
        var d = 0; var s = 0.0
        while (d < 64) {
          val w = ((p * 64 + d) * 2654435761L % 4096L).toDouble / 4096.0 - 0.5
          s += v(d).toDouble * w
          d += 1
        }
        acc = acc * 2L + (if (s >= 0.0) 1L else 0L)
        p -= 1
      }
      acc
    }
    val codes = vecs.map { case (id, v) => id -> code(v) }
    val expect = (0L until 10L).flatMap { qid =>
      val cand = vecs.keys
        .filter(v => v != qid && codes(v) == codes(qid)).toSeq
      cand.map(v => (-cosOf(vecs(qid), vecs(v)), v))
        .sorted.take(10).zipWithIndex
        .map { case ((_, v), i) => (qid, v) -> (i + 1) }
    }.toMap
    val rows = SparkEntry.queries("sim_ann_lsh_pinned")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.length == expect.size,
      s"row count ${rows.length} != recompute ${expect.size}")
    rows.foreach { r =>
      val key = (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))
      assert(expect.get(key).contains(r.getAs[Int]("rank")),
        s"$key rank diverges from the driver recompute")
    }
  }

  test("sim_ann_ivf_flat: every hit lies in one of its query's two " +
      "probed lists, cosines are exact, ranks contiguous from 1") {
    val vecs = loadVecs()
    val cents = (0L until 16L).map(vecs)
    def nearestK(v: Array[Float], k: Int): Seq[Int] =
      cents.zipWithIndex.map { case (c, i) => (-cosOf(v, c), i) }
        .sorted.take(k).map(_._2)
    val assign = vecs.map { case (id, v) => id -> nearestK(v, 1).head }
    val byQ = SparkEntry.queries("sim_ann_ivf_flat")(spark, sfDir)
      .collect().groupBy(_.getAs[Long]("qid"))
    assert(byQ.keySet == (0L until 10L).toSet)
    byQ.foreach { case (qid, rs) =>
      val probed = nearestK(vecs(qid), 2).toSet
      assert(rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Int]("rank"))
        .toSeq == (1 to rs.length))
      rs.foreach { r =>
        val v = r.getAs[Long]("vec_id")
        assert(probed(assign(v)),
          s"hit $v of query $qid is outside the probed lists")
        assert(r.getAs[Double]("cosine") == cosOf(vecs(qid), vecs(v)),
          s"cosine of ($qid, $v) is not the exact fold value")
      }
    }
  }

  test("dedup_simhash_bands: the pigeonhole funnel is monotone and " +
      "verified counts are bounded by the exact pair table") {
    val rows = DedupQueries.queries("dedup_simhash_bands")(spark, sfDir)
      .collect()
    assert(rows.map(_.getAs[Int]("block")).toSeq == (0 until 4))
    val nExact = pairs("dedup_ngram_jaccard").size
    rows.foreach { r =>
      val (nc, nr, nv) = (r.getAs[Long]("n_candidates"),
        r.getAs[Long]("n_radius3"), r.getAs[Long]("n_dup_verified"))
      assert(nv <= nr && nr <= nc, s"funnel not monotone: $r")
      assert(nv <= nExact, s"verified exceeds the exact pair table: $r")
      assert(r.getAs[Long]("n_buckets") >= 1L)
    }
    // the affine family must actually find dups on this corpus — an
    // all-zero verified column would mean the majority vote degenerated
    assert(rows.map(_.getAs[Long]("n_dup_verified")).sum > 0L)
  }

  test("dedup_sorted_neighbors: pairs are true τ=0.5 near-dups with the " +
      "exact Jaccard of the shared-pair table, gaps within the window") {
    val exact = DedupQueries.queries("dedup_ngram_jaccard")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db")) ->
        r.getAs[Double]("jaccard")).toMap
    val rows = DedupQueries.queries("dedup_sorted_neighbors")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty, "sorted-neighborhood found nothing at this SF")
    rows.foreach { r =>
      val key = (r.getAs[Long]("da"), r.getAs[Long]("db"))
      val g = r.getAs[Long]("gap")
      assert(g >= 1L && g <= 4L, s"gap outside the window: $r")
      assert(exact.get(key).contains(r.getAs[Double]("jaccard")),
        s"$key: not in the exact pair table (or jaccard drifted)")
    }
  }

  test("sim_mips: norm-augmentation reduction preserves the exact " +
      "MIPS ranking (the cosine-ANN-stack-indexes-MIPS claim)") {
    import graft.functions.VectorFunctions
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val e = graft.sources.Tables.scan(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").as("v"),
        VectorFunctions.floatNorm(col("embedding")).as("nrm"))
    // M = max corpus norm: the augmentation scalar (broadcast, 1 row)
    val m = e.agg(max("nrm")).head.getDouble(0)
    val q = e.filter(col("vec_id") < 10).toDF("qid", "q", "qn")
    val ip = VectorFunctions.floatDot(col("q"), col("v"))
    // augmented cosine: q_aug = (q, 0), x_aug = (x, sqrt(M^2 - |x|^2)) so
    // dot(q_aug, x_aug) = dot(q, x) and |x_aug| = M for every corpus
    // vector - cosine = ip / (qn * M), a per-query monotone transform
    val joined = broadcast(q).join(e, col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"), ip.as("ip"),
        (ip / (col("qn") * lit(m))).as("augcos"))
    val wIp = Window.partitionBy("qid")
      .orderBy(col("ip").desc, col("vec_id"))
    val wAug = Window.partitionBy("qid")
      .orderBy(col("augcos").desc, col("vec_id"))
    val mismatches = joined
      .withColumn("r1", row_number().over(wIp))
      .withColumn("r2", row_number().over(wAug))
      .filter(col("r1") =!= col("r2")).count()
    assert(mismatches == 0)
  }
}
