package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway local timing harness: time one named query N times.
  * Usage: Test/runMain graft.tools.Scratch <name> [reps] [sfDir]
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.all.foreach { t =>
      graft.sources.Tables.scan(spark, sfDir, t).count()
    }
    val names = name.split(",").toSeq
    (1 to reps).foreach { i =>
      names.foreach { n =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir).count()
        println(f"[scratch] $n rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    if (args.contains("--explain"))
      names.foreach(n =>
        graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted"))
    spark.stop()
  }
}
