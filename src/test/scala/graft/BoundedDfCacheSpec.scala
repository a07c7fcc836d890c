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
