package graft.sources

import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch scans over the harness star schema (/root/repo/TESTDATA.md).
  *
  * Spark-native analog of the reference's captured-table list
  * (reference: k8s-manifests/connectors/postgresql-connector.yaml:39 —
  * `public.users,public.orders,public.products,public.payments`; MySQL list
  * at :94-95). At 100 TB these would be partitioned/bucketed warehouse
  * tables; the parquet-per-table layout here keeps the same API surface.
  */
object Tables {
  /** All harness tables (TPC-H-ish star schema + events/documents/embeddings). */
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Dimension tables small enough to broadcast at any scale factor. */
  val broadcastable: Set[String] = Set("region", "nation")

  def scan(spark: SparkSession, sfDir: String, table: String): DataFrame =
    if (table == "events") {
      // events.ts has shipped as BOTH parquet TIMESTAMP(NANOS) and plain
      // timestamp[us] across harness generations, so adapt to the file:
      //  - µs/ms data reads as a timestamp directly → just normalize to NTZ;
      //  - NANOS data makes Spark 4 throw at schema inference
      //    (PARQUET_TYPE_ILLEGAL) unless read as a raw long, so only THAT
      //    path enables the legacy nanosAsLong conf (keeping the session
      //    conf untouched for the common case) and µs-truncates — matching
      //    DuckDB's CAST(ts AS TIMESTAMP), which also truncates ns → µs.
      val path = s"$sfDir/$table.parquet"
      // Retry ONLY on the NANOS schema-inference failure; any other error
      // (missing file, corrupt footer, permissions) must surface as itself,
      // and the session-wide legacy conf must not leak if the retry fails.
      // The NANOS failure can surface WRAPPED (multi-file footer merge
      // runs as a job → SparkException with the AnalysisException as its
      // cause), so walk the cause chain, not just the top-level throwable.
      def isNanosFailure(e: Throwable): Boolean =
        Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
          .exists {
            case a: org.apache.spark.sql.AnalysisException =>
              a.getErrorClass == "PARQUET_TYPE_ILLEGAL" ||
                Option(a.getMessage).exists(m =>
                  m.contains("PARQUET_TYPE_ILLEGAL") || m.contains("NANOS"))
            case _ => false
          }
      val df =
        try spark.read.parquet(path)
        catch {
          case e: Throwable if isNanosFailure(e) =>
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            try spark.read.parquet(path)
            catch {
              case retryErr: Throwable =>
                spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
                throw retryErr
            }
        }
      df.schema("ts").dataType match {
        case LongType => // nanos-as-long epoch value
          df.withColumn("ts",
            timestamp_micros(expr("ts DIV 1000")).cast("timestamp_ntz"))
        case _ =>
          df.withColumn("ts", col("ts").cast("timestamp_ntz"))
      }
    } else spark.read.parquet(s"$sfDir/$table.parquet")

  /** [[scan]] repartitioned to the session's parallelism — for per-row
    * compute-HEAVY consumers (shingling/hash kernels, JSON synthesis,
    * token explosion). The harness tables are single-row-group parquet
    * files, so a plain scan is ONE task no matter the cluster size; a
    * deployed table at any real scale arrives as thousands of splits
    * already matched to the executors. The explicit repartition restores
    * that layout: its round trip over these small inputs costs
    * milliseconds, while serializing a heavy kernel on one core costs
    * seconds — and at 100 TB the repartition disappears entirely (the
    * scan is already parallel). NOT for plain scans/filters/aggregates:
    * those are scan-bound, and the extra exchange would only hide
    * pushdown/pruning from the plan. */
  def scanPar(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    val df = scan(spark, sfDir, table)
    val target = spark.sparkContext.defaultParallelism
    // no-op when the scan already splits to the cluster's parallelism —
    // a deployed table arrives as thousands of splits and must NOT pay a
    // full shuffle here; only the single-split small-file case widens
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }

  /** Mapping from the reference's captured tables to testdata twins
    * (FIXTURES.md §1). */
  val captureMapping: Map[String, String] = Map(
    "public.users" -> "customer",
    "public.orders" -> "orders",
    "public.products" -> "part",
    "analytics.events" -> "events")
}
