package graft.streaming

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.{DataFrame, Row, SaveMode}

/** Sink layer (SURVEY.md §2.A A7-A11): the Spark stand-ins for the
  * reference's declared sink fan-out — Elasticsearch (enriched docs,
  * upsert by PK), data warehouse (append aggregates), ClickHouse (batch
  * insert), Redis (latest value per key), Kafka re-publish
  * (reference: README.md:46-51,75-81).
  *
  * Everything funnels through `foreachBatch` + idempotent writes keyed by
  * primary key + source position, which is how Structured Streaming turns
  * at-least-once micro-batches into exactly-once-observable sinks — the
  * same contract the reference delegates to ES doc-ids / Redis keys.
  */
object Sinks {

  /** A7/A10 analog: per-batch upsert-by-key into a keyed parquet table
    * (doc-id upsert in ES, SET in Redis). Each micro-batch folds new rows
    * into current state by (key, max ordering) — replays and out-of-order
    * events are no-ops, so the sink is idempotent under retries. At scale
    * the overwrite becomes a MERGE into a keyed table format; the
    * per-batch dedup logic is identical. */
  def upsertByKey(
      stream: DataFrame,
      path: String,
      key: String,
      orderingCol: String): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        // only a missing path (first batch) may fall back to empty state;
        // any other read failure must fail the batch — a blanket catch
        // would silently wipe accumulated sink state
        val existing =
          if (!new java.io.File(path).exists())
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[Row], batch.schema)
          else spark.read.parquet(path)
        val w = Window.partitionBy(key).orderBy(col(orderingCol).desc)
        val merged = existing.unionByName(batch)
          .withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1).drop("_rn")
        // two-phase write: stage then swap would be atomic on a real object
        // store; plain overwrite keeps the local harness simple
        merged.write.mode(SaveMode.Overwrite).parquet(path + ".tmp")
        spark.read.parquet(path + ".tmp").write
          .mode(SaveMode.Overwrite).parquet(path)
        ()
      }

  /** A8/A9 analog: append aggregated results to a warehouse table,
    * partitioned by a date-ish column so downstream reads prune. */
  def appendWarehouse(
      aggregated: DataFrame,
      path: String,
      checkpoint: String,
      partitionCol: String,
      interval: String = "5 seconds"): DataStreamWriter[Row] =
    aggregated.writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy(partitionCol)
      // micro-batch cadence mirrors the reference's 5 s offset-flush
      // (reference: prod-resources.yaml:20)
      .trigger(Trigger.ProcessingTime(interval))

  /** A11 analog: re-publish as Kafka-shaped records — key = PK JSON,
    * value = envelope JSON (what `writeStream.format("kafka")` needs;
    * the format swap is one line when brokers exist). */
  def toKafkaShape(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.select(
      to_json(struct(keyCols.map(col): _*)).as("key"),
      to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as("value"))
}
