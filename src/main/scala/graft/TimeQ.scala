package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time a subset of catalog queries in isolation, several reps,
  * clearing the graded cache between reps (same integrity rule as
  * [[Bench]]). Usage:
  *   sbt "runMain graft.TimeQ q1,q2,... [reps]"
  * Prints per-rep seconds per query; use to denoise a single query's cost
  * without paying a full bench sweep. Shares no state with the bench. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").toSeq)
      .getOrElse(sys.error("usage: TimeQ q1,q2[,..] [reps]"))
    // fail on a typo'd name BEFORE paying session startup + table warmup
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.all.foreach { t =>
      graft.sources.Tables.scan(spark, sfDir, t).count()
    }
    (1 to reps).foreach { i =>
      BoundedDfCache.clearGraded()
      names.foreach { n =>
        val fn = SparkEntry.queries.getOrElse(n, sys.error(s"unknown: $n"))
        val t0 = System.nanoTime()
        val cnt = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[timeq] rep $i $n%-30s ${dt}%7.2f s  rows=$cnt")
      }
    }
    spark.stop()
  }
}
