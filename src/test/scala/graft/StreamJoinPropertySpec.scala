package graft

import graft.operators.JoinFeedEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based contract for the `stream_join_live` semantics over
  * RANDOMIZED feeds: a real watermarked two-MemoryStream left-outer
  * interval join (Append mode, event-time-ordered lockstep batches) must
  * equal the relational restatement — full interval join for matches,
  * plus null-pads for exactly the unmatched lefts whose match window the
  * final global watermark (ms-truncated min-of-sources max event time −
  * delay) strictly passed. The graded query pins one corpus at three
  * SFs; this spec pins the CONTRACT across random windows (1-3 h),
  * delays (4-24 h), batchings (2-4), boundary-equal timestamps, and
  * match-less users — including that delay and window may be ANY
  * combination (the ordered-feed argument does not need delay ≥ window:
  * matching happens on arrival before eviction uses the new watermark).
  */
class StreamJoinPropertySpec extends SparkSpec {

  private def forSeeds[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      val seed = Seed(0xBEEF00L + i)
      gen.apply(Gen.Parameters.default, seed).foreach { a =>
        withClue(s"seed=${0xBEEF00L + i}: ")(body(a))
      }
    }

  private val base = 1704067200000000L // 2024-01-01 00:00:00 UTC, micros

  private case class Trial(
      windowH: Int, delayH: Int, nBatches: Int,
      left: List[(Long, Long)], right: List[(Long, Long)]) // (user, tsUs)

  private val trialGen: Gen[Trial] = for {
    w <- Gen.choose(1, 3)
    d <- Gen.choose(4, 24)
    b <- Gen.choose(2, 4)
    nl <- Gen.choose(8, 35)
    nr <- Gen.choose(8, 35)
    span = 10L * 24 * 3600 * 1000000 // 10 days in micros
    left <- Gen.listOfN(nl, for {
      u <- Gen.choose(1L, 4L)
      t <- Gen.choose(0L, span)
    } yield (u, base + t))
    right <- Gen.listOfN(nr, for {
      u <- Gen.choose(1L, 4L)
      t <- Gen.choose(0L, span)
    } yield (u, base + t))
    // boundary adversary: one right row EXACTLY at a left row's ts
    // (inclusive lower bound) and one exactly at ts + window (inclusive
    // upper bound)
    lHead = left.head
  } yield Trial(w, d, b,
    left.map { case (u, t) => (u, t) },
    (lHead._1, lHead._2) ::
      (lHead._1, lHead._2 + w.toLong * 3600 * 1000000) ::
      right.map { case (u, t) => (u, t) })

  private def usTs(us: Long) = new java.sql.Timestamp(us / 1000)

  test("randomized feeds: streaming left-outer interval join equals the " +
      "relational restatement (matches + final-watermark-gated null-pads)") {
    forSeeds(trialGen, 6) { tr =>
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      try {
        // event ids = stable positions; feeds event-time ordered
        val lev = tr.left.zipWithIndex
          .map { case ((u, t), i) => JoinFeedEvent(usTs(t), u, i.toLong) }
          .sortBy(_.ts.getTime)
        val rev = tr.right.zipWithIndex
          .map { case ((u, t), i) =>
            JoinFeedEvent(usTs(t), u, 100000L + i) }
          .sortBy(_.ts.getTime)
        // lockstep batching by the union's time order (the harness shape)
        val cuts = {
          val all = (lev.map(_.ts.getTime) ++ rev.map(_.ts.getTime)).sorted
          (1 until tr.nBatches).map(k => all((all.size * k) / tr.nBatches))
        }
        def chunks(ev: Seq[JoinFeedEvent]): Seq[Seq[JoinFeedEvent]] = {
          val bounds = cuts :+ Long.MaxValue
          bounds.zipWithIndex.map { case (hi, i) =>
            val lo = if (i == 0) Long.MinValue else bounds(i - 1)
            ev.filter(e => e.ts.getTime > lo && e.ts.getTime <= hi)
          }
        }
        val name = s"graft_join_prop"
        spark.catalog.dropTempView(name)
        val inL = MemoryStream[JoinFeedEvent]
        val inR = MemoryStream[JoinFeedEvent]
        val l = inL.toDS()
          .select(col("ts").as("l_ts"), col("user_id"),
            col("eid").as("l_eid"))
          .withWatermark("l_ts", s"${tr.delayH} hours")
        val r = inR.toDS()
          .select(col("ts").as("r_ts"), col("user_id").as("r_uid"),
            col("eid").as("r_eid"))
          .withWatermark("r_ts", s"${tr.delayH} hours")
        val q = l.join(r,
          expr(s"""user_id = r_uid AND r_ts >= l_ts AND
                  |r_ts <= l_ts + interval ${tr.windowH} hours"""
            .stripMargin),
          "left_outer")
          .select(col("user_id"), col("l_eid"), col("r_eid"))
          .writeStream.format("memory").queryName(name)
          .outputMode(OutputMode.Append).start()
        try {
          chunks(lev).zip(chunks(rev)).foreach { case (lb, rb) =>
            if (lb.nonEmpty) inL.addData(lb)
            if (rb.nonEmpty) inR.addData(rb)
            q.processAllAvailable()
          }
        } finally q.stop()
        val got = spark.table(name).collect()
          .map(row => (row.getLong(0), row.getLong(1),
            if (row.isNullAt(2)) -1L else row.getLong(2)))
          .toSeq.sorted
        // relational restatement, driver-side
        val winUs = tr.windowH.toLong * 3600 * 1000000
        val matches = for {
          le <- lev; re <- rev
          if re.user_id == le.user_id
          if re.ts.getTime >= le.ts.getTime // ms grain: Timestamp from us/1000
          if (re.ts.getTime - le.ts.getTime) * 1000 <= winUs
        } yield (le.user_id, le.eid, re.eid)
        val fwMs = math.min(lev.map(_.ts.getTime).max,
          rev.map(_.ts.getTime).max) - tr.delayH.toLong * 3600 * 1000
        val matchedL = matches.map(_._2).toSet
        val pads = lev
          .filter(e => !matchedL.contains(e.eid))
          .filter(e => e.ts.getTime + tr.windowH.toLong * 3600 * 1000 < fwMs)
          .map(e => (e.user_id, e.eid, -1L))
        val want = (matches ++ pads).sorted
        assert(got == want,
          s"w=${tr.windowH}h d=${tr.delayH}h b=${tr.nBatches} " +
            s"|L|=${lev.size} |R|=${rev.size}: got ${got.size} rows, " +
            s"want ${want.size}\n extra=${got.diff(want).take(5)}\n " +
            s"missing=${want.diff(got).take(5)}")
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
  }
}
