package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The materialized-stage cache seam (BoundedDfCache): shared by the CDC
  * bronze parses and the dedup shingle/pair tables. The contract under
  * test: (a) one build per key — every consumer gets the SAME persisted
  * plan, (b) the entry is actually persisted, (c) the bound evicts and
  * unpersists the oldest entry instead of pinning DataFrames forever. */
class BoundedDfCacheSpec extends SparkSpec {

  test("same key returns the same persisted instance; build runs once") {
    var builds = 0
    def get() = BoundedDfCache.getOrPersist(spark, "spec:one") {
      builds += 1
      spark.range(10).withColumn("x", col("id") * 2)
    }
    val a = get()
    val b = get()
    assert(builds == 1)
    assert(a eq b)
    assert(a.storageLevel != StorageLevel.NONE)
    assert(a.count() == 10)
  }

  test("concurrent same-tag callers: exactly one build, waiters get the " +
      "cached frame; a failed build releases waiters to retry") {
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    def get() = BoundedDfCache.getOrPersist(spark, "spec:conc-same") {
      builds.incrementAndGet()
      Thread.sleep(150) // hold the build so the others must wait
      spark.range(7).toDF()
    }
    val fs = (1 to 4).map(_ => Future(get()))
    val dfs = fs.map(f => Await.result(f, 30.seconds))
    assert(builds.get() == 1, "same tag must build exactly once")
    assert(dfs.forall(_ eq dfs.head))
    // failure path: first build throws; the waiter retries and succeeds
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    def flaky() = BoundedDfCache.getOrPersist(spark, "spec:conc-flaky") {
      if (attempts.incrementAndGet() == 1) {
        Thread.sleep(100)
        sys.error("first build dies")
      }
      spark.range(3).toDF()
    }
    val f1 = Future(flaky())
    Thread.sleep(30) // let f1 claim the build
    val f2 = Future(flaky())
    val r1 = scala.util.Try(Await.result(f1, 30.seconds))
    val r2 = scala.util.Try(Await.result(f2, 30.seconds))
    assert(r1.isFailure != r2.isFailure,
      s"exactly one caller sees the failure: $r1 / $r2")
    assert(Seq(r1, r2).exists(_.toOption.exists(_.count() == 3)))
    assert(attempts.get() == 2)
  }

  test("concurrent DIFFERENT tags build in parallel (no monitor held " +
      "across builds — the standing-consumer prewarm contract)") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val inFlight = new java.util.concurrent.atomic.AtomicInteger(0)
    val peak = new java.util.concurrent.atomic.AtomicInteger(0)
    def get(i: Int) = BoundedDfCache.getOrPersist(spark, s"spec:conc-par-$i") {
      val now = inFlight.incrementAndGet()
      peak.updateAndGet(p => math.max(p, now))
      Thread.sleep(200)
      inFlight.decrementAndGet()
      spark.range(i.toLong + 1).toDF()
    }
    val fs = (1 to 3).map(i => Future(get(i)))
    fs.foreach(f => Await.result(f, 30.seconds))
    assert(peak.get() >= 2,
      s"distinct tags must overlap their builds, peak=${peak.get()}")
  }

  // NOTE: the flood below may evict production entries (bronze parses,
  // shingle tables) other suites built in the shared session. That is the
  // contract under test — evicted entries rebuild transparently on next
  // access, which any suite running after this one exercises for free.
  test("overflow evicts and unpersists the oldest entry") {
    val first = BoundedDfCache.getOrPersist(spark, "spec:evict-0") {
      spark.range(5).toDF()
    }
    first.count()
    assert(first.storageLevel != StorageLevel.NONE)
    // flood the cache past its bound so spec:evict-0 (oldest) is dropped
    (1 to BoundedDfCache.maxEntries + 4).foreach { i =>
      BoundedDfCache.getOrPersist(spark, s"spec:evict-$i") {
        spark.range(i.toLong).toDF()
      }
    }
    assert(first.storageLevel == StorageLevel.NONE) // unpersisted on evict
    var rebuilt = false
    BoundedDfCache.getOrPersist(spark, "spec:evict-0") {
      rebuilt = true
      spark.range(5).toDF()
    }
    assert(rebuilt) // the key really left the map, not just the block store
  }
}
