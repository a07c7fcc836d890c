package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // BASELINE.md pins the benchmark config at local[32]; default to the
    // host's cores rather than a hardcoded 4 so an env-less invocation
    // still measures the pinned configuration.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    // BASELINE.md protocol: this shared host's timings swing 2-3× run-to-run
    // under co-tenant load (round-4 driver reps: 145/144/54 s for identical
    // work), so a single sample — and even the median when 2 of 3 reps land
    // on a contended window — measures the host, not the engine. Run the
    // whole suite `reps` times and report the MINIMUM (timeit-style: the
    // least-contended complete run is the best estimator of intrinsic cost);
    // every per-run total still ships in "runs" for transparency.
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (parquet footer reads, codegen compiler, JIT) so the
    // first timed query doesn't absorb one-time setup cost
    graft.sources.Tables.all.foreach { t =>
      graft.sources.Tables.scan(spark, sfDir, t).count()
    }
    var failed = Set.empty[String]
    // a rep where the query throws yields None — a crashing query must not
    // read as a fast query, and its near-zero fast-fail elapsed time must
    // not be mixed into the median either (median of mixed success/failure
    // samples is meaningless)
    def runOnce(): Map[String, Option[Double]] = SparkEntry.queries.map {
      case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            failed += name
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
          }
        name -> (if (ok) Some((System.nanoTime() - t0) / 1e9) else None)
    }
    val runs = (1 to reps).map { i =>
      val r = runOnce()
      System.err.println(
        f"[bench] run $i/$reps total ${r.values.flatten.sum}%.1f s")
      r
    }
    val names = SparkEntry.queries.keys.toSeq
    // per-query minimum over SUCCESSFUL reps only (failed reps' fast-fail
    // elapsed must not read as a fast query); null when every rep failed
    val minQ = names.map { n =>
      val ok = runs.flatMap(_(n))
      n -> (if (ok.isEmpty) None else Some(ok.min))
    }.toMap
    val totals = runs.map(_.values.flatten.sum)
    // the headline minimum considers only COMPLETE reps: a rep where a
    // query fast-failed did strictly less work, so its (smaller) total
    // must not become the reported gate number; if every rep had a
    // failure, report the pessimistic max instead of a best-case lie
    val completeTotals =
      runs.filter(_.values.forall(_.isDefined)).map(_.values.flatten.sum)
    val headline =
      if (completeTotals.nonEmpty) completeTotals.min else totals.max
    // explicit Locale.ROOT: the default-locale f"" interpolator writes a
    // comma decimal separator under e.g. -Duser.language=de — invalid JSON
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // ONE compact JSON line: the driver captures only a bounded tail of
    // stdout, so per-query values are rounded to milliseconds — the
    // round-4 full-precision line (~4.6 KB) overflowed the capture window
    // and the driver recorded "parsed": null.
    val qs = names.map(n =>
        s"\"" + n + "\":" + minQ(n).map(fmt).getOrElse("null"))
      .mkString("{", ",", "}")
    val fs = failed.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val ts = totals.map(fmt).mkString("[", ",", "]")
    println(s"""{"metric":"total","value":${fmt(headline)},"unit":"sec","queries":$qs,"failed":$fs,"runs":$ts,"reps":$reps,"sf":"$sfDir"}""")
    spark.stop()
  }
}
