package graft

import graft.operators.CdcOps
import graft.streaming.{KeyedChange, StatefulCompaction}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5.2.3) over generated change
  * logs: compaction idempotence under at-least-once replay, arrival-order
  * independence, and route-regex totality on `a.b.c`-shaped topics. */
class CdcPropertiesSpec extends SparkSpec {

  /** Deterministic generator driver (scalacheck without the scalatest
    * bridge, which is not on the offline classpath): fixed seeds → stable
    * CI, failures print the seed. */
  private def forSeeds[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      val seed = Seed(0xC0FFEEL + i)
      gen.apply(Gen.Parameters.default, seed).foreach { a =>
        withClue(s"seed=${0xC0FFEEL + i}: ")(body(a))
      }
    }

  private val changeGen: Gen[List[(Long, Long, Boolean)]] = for {
    n <- Gen.choose(1, 60)
    changes <- Gen.listOfN(n, for {
      key <- Gen.choose(1L, 8L)
      lsn <- Gen.choose(1L, 50L)
      del <- Gen.oneOf(true, false)
    } yield (key, lsn, del))
  } yield changes

  /** Reference semantics, computed driver-side: per key, the max-lsn
    * event wins (ties broken deterministically by deleted then payload);
    * deleted winners drop out. */
  private def expected(
      changes: List[(Long, Long, Boolean)]): Set[(Long, Long, Boolean)] =
    changes.groupBy(_._1).flatMap { case (_, evs) =>
      val win = evs.maxBy(e => (e._2, e._3))
      if (win._3) None else Some(win)
    }.toSet

  private def compactBatch(
      changes: List[(Long, Long, Boolean)]): Set[(Long, Long, Boolean)] = {
    import spark.implicits._
    val df = changes.toDF("key", "lsn", "deleted")
      .withColumn("__deleted", col("deleted").cast("string"))
      .withColumn("_tombstone", lit(false))
    CdcOps.compactLatest(df, Seq("key"),
      Seq(col("lsn").desc, col("deleted").desc))
      .select("key", "lsn", "deleted")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .toSet
  }

  test("batch compaction: replay-idempotent, order-independent, matches model") {
    forSeeds(changeGen, 15) { changes =>
      if (changes.nonEmpty) {
        val exp = expected(changes)
        assert(compactBatch(changes) == exp)
        assert(compactBatch(changes ++ changes) == exp)          // replay
        assert(compactBatch(scala.util.Random.shuffle(changes)) == exp) // order
      }
    }
  }

  test("streaming compaction state converges to the batch model") {
    // same generated log split into two micro-batches; final state per key
    // must match the batch winner even when later batches carry stale lsns.
    // (StatefulCompaction keys strictly on lsn; generator avoids the
    // ambiguous same-key-same-lsn-different-payload case, which
    // at-least-once delivery of a real WAL cannot produce.)
    forSeeds(changeGen, 5) { changes0 =>
      val changes = changes0.distinctBy(c => (c._1, c._2))
      if (changes.nonEmpty) {
        implicit val sqlCtx = spark.sqlContext
        import spark.implicits._
        val in = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[KeyedChange]
        val q = StatefulCompaction.compact(in.toDS())
          .writeStream.format("memory")
          .queryName("prop_compact")
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Update)
          .start()
        try {
          val (b1, b2) = changes.splitAt(changes.length / 2)
          Seq(b1, b2).filter(_.nonEmpty).foreach { b =>
            in.addData(b.map(c => KeyedChange(c._1, c._2, c._3, s"p${c._2}")))
            q.processAllAvailable()
          }
          val state = spark.table("prop_compact")
            .groupBy($"key")
            .agg(max(struct($"lsn", $"deleted")).as("s"))
            .select($"key", $"s.lsn", $"s.deleted")
            .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
            .filterNot(_._3).toSet
          val exp = expected(changes).map(c => (c._1, c._2, c._3))
          assert(state == exp)
        } finally q.stop()
      }
    }
  }

  test("DLQ replay is exactly-once: 1, 2, and 4 deliveries of the " +
      "repaired records land in identical state, and the replay " +
      "genuinely repairs (first-pass state is missing the DLQ'd inserts)") {
    import graft.operators.CdcQueries
    def state(deliveries: Int): Set[String] =
      CdcQueries.dlqReplayState(spark, sfDir, deliveries)
        .collect().map(_.mkString("|")).toSet
    val once = state(1)
    assert(once == state(2) && once == state(4),
      "repaired-record delivery count changed the compacted state")
    // counterfactual: with NO replay the %97 keys whose only event was
    // the corrupted insert must be absent — the replay restores exactly
    // those rows (keys %97, not deleted %7, not updated %10)
    val noted = once.count(_.endsWith("|dlq-replay"))
    assert(noted > 0, "no repaired row won compaction — fixture too sparse")
    val replayedRows = CdcQueries.dlqReplayState(spark, sfDir, 1)
      .filter(col("o_note").isNotNull)
      .select("o_orderkey").collect().map(_.getLong(0))
    replayedRows.foreach { k =>
      assert(k % 97 == 0 && k % 7 != 0 && k % 10 != 0,
        s"unexpected repaired winner $k")
    }
  }

  test("route regex is total on server.schema.table topics") {
    import spark.implicits._
    forSeeds(Gen.listOfN(20, for {
      a <- Gen.identifier.suchThat(_.nonEmpty)
      b <- Gen.identifier.suchThat(_.nonEmpty)
      c <- Gen.identifier.suchThat(_.nonEmpty)
    } yield (s"${a.take(8)}.${b.take(8)}.${c.take(8)}", c.take(8))), 5) { topics =>
      if (topics.nonEmpty) {
        val out = CdcOps.route(topics.toDF("topic", "want"))
          .select("tbl", "want").collect()
        out.foreach(r => assert(r.getString(0) == r.getString(1)))
      }
    }
  }
}
