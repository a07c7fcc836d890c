package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // BASELINE.md protocol: this host's timings swing ±45% run-to-run, so a
    // single sample cannot distinguish regression from noise — run the whole
    // suite `reps` times and report per-query MEDIANS (and the median of the
    // per-run totals).
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
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    val runs = (1 to reps).map { i =>
      val r = runOnce()
      System.err.println(
        f"[bench] run $i/$reps total ${r.values.flatten.sum}%.1f s")
      r
    }
    val names = SparkEntry.queries.keys.toSeq
    // per-query median over SUCCESSFUL reps only; null when every rep failed
    val medQ = names.map { n =>
      val ok = runs.flatMap(_(n))
      n -> (if (ok.isEmpty) None else Some(median(ok)))
    }.toMap
    val totals = runs.map(_.values.flatten.sum)
    val qs = names.map(n =>
        s"\"" + n + "\":" + medQ(n).map(_.toString).getOrElse("null"))
      .mkString("{", ",", "}")
    val fs = failed.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val ts = totals.map(t => f"$t%.3f").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":${median(totals)},"unit":"sec","queries":$qs,"failed":$fs,"runs":$ts,"reps":$reps,"sf":"$sfDir"}""")
    spark.stop()
  }
}
