package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bounded per-JVM cache of persisted DataFrames, keyed by (session, tag).
  *
  * This is the "materialized stage" seam: fixture synthesis and
  * bronze-stage parses are computed ONCE per session and shared by every
  * consumer query, the way a deployed pipeline materializes a parsed
  * changelog (or a shingle/pair table) once rather than re-deriving it per
  * downstream reader. Bounded (unpersist + evict oldest) so long-lived
  * JVMs running many sessions/scale factors don't pin DataFrames — and
  * their SparkSessions — forever.
  */
private[graft] object BoundedDfCache {

  // Must exceed the number of DISTINCT tags one full catalog pass touches
  // (42 at the round-13 surface): with a smaller bound the benchmark's
  // sorted sweep evicted early tags mid-rep and re-built them when a
  // later query re-read them — double-paying graded builds within a rep
  // and re-synthesizing fixtures every rep (the eviction was the r12
  // "36 s/rep shared builds" cost). The bound still exists so long-lived
  // multi-sf sessions (sf0.01 + sf0.1 + sf1 in one JVM = 3× tags) evict
  // the stalest scale factor instead of pinning everything forever.
  private[graft] val maxEntries = 96

  private val entries =
    scala.collection.mutable.LinkedHashMap.empty[(SparkSession, String), DataFrame]

  /** Wall seconds each tag's first build+materialization took, since the
    * last [[drainBuildTimes]]. The benchmark drains this per rep and ships
    * it as the `shared_builds` JSON section: first-touch cost of a shared
    * table still lands inside SOME query's timed window (alphabetically
    * first consumer, now that Bench runs in sorted order), and this section
    * says exactly how much of that query's time is the shared build —
    * without it, per-query times look like regressions whenever a new name
    * sorts ahead of the old first consumer. */
  private val buildTimes =
    scala.collection.mutable.LinkedHashMap.empty[String, Double]

  /** Tags currently being built, each with a latch its waiters block on.
    * Builds run OUTSIDE the map monitor (r15): holding it for the whole
    * build serialized every concurrent first-touch — and deadlocked any
    * build that awaited a Future which itself touched the cache — which
    * is exactly what the concurrent standing-consumer prewarm
    * ([[graft.operators.CdcQueries]]) needs to work. */
  private val building = scala.collection.mutable.Map
    .empty[(SparkSession, String), java.util.concurrent.CountDownLatch]

  /** Get the cached frame for (spark, tag), or build + persist it.
    * Concurrent callers of the SAME tag: one builds, the rest wait on the
    * latch and read the cached result (a failed build releases its
    * waiters, who then retry — the error surfaces on whoever builds).
    * Concurrent callers of DIFFERENT tags build in parallel. Nested
    * calls during a build are fine — no lock is held while building. */
  def getOrPersist(
      spark: SparkSession, tag: String)(build: => DataFrame): DataFrame = {
    val key = (spark, tag)
    while (true) {
      val claim = entries.synchronized {
        entries.get(key) match {
          case Some(df) => Some(Right(df))
          case None => building.get(key) match {
            case Some(l) => Some(Left(l))
            case None =>
              building(key) = new java.util.concurrent.CountDownLatch(1)
              None
          }
        }
      }
      claim match {
        case Some(Right(df)) => return df
        case Some(Left(l)) => l.await() // built (or failed) — re-check
        case None =>
          try {
            val t0 = System.nanoTime()
            // deserialized MEMORY_AND_DISK (the default), measured
            // against MEMORY_AND_DISK_SER on the full suite: SER cost
            // ~10% of total bench time in decode on every cached read.
            // The resident set fits the sweep protocol's heap
            // (SPARK_DRIVER_MEM=48g at sf1 — an 8g default-heap sweep
            // OOMs in the cdc_* family, see the verify skill's gotcha);
            // at production scale this seam is a parquet-materialized
            // stage on disk, not an executor cache.
            val df = build.persist()
            // materialize NOW: persist() alone is lazy, so without this
            // the build would run inside the first consumer's action and
            // the recorded per-tag time would be 0 while the consumer's
            // time silently absorbed the build (the attribution problem
            // this timing exists to solve).
            df.count()
            entries.synchronized {
              while (entries.size >= maxEntries) {
                val (k, old) = entries.head
                scala.util.Try(old.unpersist())
                entries.remove(k)
              }
              entries(key) = df
              buildTimes(tag) = buildTimes.getOrElse(tag, 0.0) +
                (System.nanoTime() - t0) / 1e9
            }
            return df
          } finally entries.synchronized {
            building.remove(key).foreach(_.countDown())
          }
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Return and reset the per-tag build timings accumulated since the
    * previous drain (benchmark reps call this once per rep). */
  def drainBuildTimes(): Seq[(String, Double)] = entries.synchronized {
    val out = buildTimes.toSeq
    buildTimes.clear()
    out
  }

  /** Tag prefix marking an entry as pure test-INPUT synthesis (e.g. the
    * fabricated Debezium changelog JSON built from the orders table). A
    * deployed pipeline reads its input from disk/Kafka — it never pays to
    * re-fabricate it — so these, and ONLY these, may survive a benchmark
    * rep boundary (the recorded baseline contract: "only the fixture
    * build is shared"). Everything else in the cache is the output of a
    * GRADED operator and must be re-executed every rep. */
  val FixturePrefix = "fixture:"

  /** Bump whenever ANY fixture synthesis changes its content or schema:
    * the on-disk cache key is (version, tag), and a version bump is what
    * invalidates every previously-written fixture parquet. A forgotten
    * bump is caught loudly, not silently — the DuckDB oracles re-derive
    * the same fixtures from the source tables in SQL, so a stale Spark
    * read hash-mismatches in the correctness gate. */
  private val fixtureVersion = 1

  private def fixtureDiskDir(tag: String): java.io.File = {
    val safe = tag.replaceAll("[^A-Za-z0-9._-]", "_")
    new java.io.File(s"/tmp/graft_fixtures/v$fixtureVersion/$safe")
  }

  /** [[getOrPersist]] plus a DISK layer for fixture synthesis: the first
    * JVM to need a fixture writes it to a versioned parquet under /tmp
    * (atomic directory rename, so concurrent Verify/Bench/test JVMs race
    * safely) and every later JVM — including the benchmark's rep 1,
    * which previously paid the full synthesis inside its first timed
    * query — reads it back like any other input table. This is exactly
    * the deployment posture the fixture contract describes: changelog
    * input comes from disk/Kafka, never re-fabricated per run.
    *
    * `post` runs on whatever the in-memory cache admits (fresh build or
    * parquet read-back) — callers use it to restore the keyed
    * parallelism a small parquet read would coalesce away. */
  def getOrPersistFixture(spark: SparkSession, tag: String)(
      build: => DataFrame)(post: DataFrame => DataFrame): DataFrame = {
    require(tag.startsWith(FixturePrefix),
      s"disk-cached entries must be fixtures: $tag")
    getOrPersist(spark, tag) {
      val dir = fixtureDiskDir(tag)
      if (!dir.isDirectory) {
        val tmp = new java.io.File(dir.getParentFile,
          s"${dir.getName}.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
        build.write.mode("overwrite").parquet(tmp.toString)
        // lost the rename race → another JVM finished first; read theirs
        if (!tmp.renameTo(dir)) {
          if (!dir.isDirectory)
            throw new java.io.IOException(
              s"could not publish fixture $tag to $dir")
          scala.reflect.io.Directory(
            scala.reflect.io.Path(tmp).toDirectory).deleteRecursively()
        }
      }
      post(spark.read.parquet(dir.toString))
    }
  }

  /** Unpersist and evict every GRADED entry (all tags except
    * [[FixturePrefix]] ones). The benchmark calls this at the top of each
    * rep: the cache's production seam is "materialize once per session",
    * but across benchmark reps that would let reps 2..N read rep 1's
    * persisted outputs of GRADED operators (bronze parses, shingle and
    * pair tables) and report a cache read as query time — so each rep
    * drops them and pays the full graded materialization work again. */
  def clearGraded(): Unit = entries.synchronized {
    val graded = entries.keys.filterNot(_._2.startsWith(FixturePrefix)).toList
    graded.foreach { k =>
      scala.util.Try(entries(k).unpersist())
      entries.remove(k)
    }
  }

  /** Unpersist and evict EVERY entry, fixtures included. */
  def clearAll(): Unit = entries.synchronized {
    entries.valuesIterator.foreach(df => scala.util.Try(df.unpersist()))
    entries.clear()
  }
}
