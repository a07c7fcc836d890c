package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Debezium change-event envelope handling.
  *
  * The reference configures schemaless-JSON Kafka Connect converters
  * (reference: k8s-manifests/environments/prod/prod-resources.yaml:10-13) so
  * the consumer supplies the schema — here an explicit [[StructType]] per
  * table, the Spark analog of the deployed Schema Registry
  * (reference: helm-charts/cdc-system/values.yaml:64-69).
  *
  * Type-handling modes pinned by the connector config
  * (reference: k8s-manifests/connectors/postgresql-connector.yaml:48-49):
  *   - `decimal.handling.mode=string`  → NUMERIC/DECIMAL arrive as strings
  *   - `time.precision.mode=adaptive_time_microseconds` → temporal columns
  *     arrive as int64 epoch micros
  */
object Debezium {

  /** Debezium `source` block — union of Postgres (`lsn`, `txId`) and MySQL
    * (`file`, `pos`) provenance fields so one schema covers both connectors
    * (reference: postgresql-connector.yaml:32,88-100). */
  val sourceSchema: StructType = StructType(Seq(
    StructField("version", StringType),
    StructField("connector", StringType),
    StructField("name", StringType),
    StructField("ts_ms", LongType),
    StructField("db", StringType),
    StructField("schema", StringType),
    StructField("table", StringType),
    StructField("txId", LongType),
    StructField("lsn", LongType),     // Postgres WAL position (ordering key)
    StructField("file", StringType),  // MySQL binlog file
    StructField("pos", LongType),     // MySQL binlog position
    StructField("snapshot", StringType)))

  /** Full envelope `{before, after, source, op, ts_ms}` for a table row
    * schema. `op ∈ {c,u,d,r}` (create/update/delete/snapshot-read). */
  def envelopeSchema(row: StructType): StructType = StructType(Seq(
    StructField("before", row),
    StructField("after", row),
    StructField("source", sourceSchema),
    StructField("op", StringType),
    StructField("ts_ms", LongType)))

  /** Parse raw Kafka-shaped records (`topic`,`key`,`value` strings) into the
    * typed envelope column `env`. Tombstones — records whose value is null,
    * retained because `drop.tombstones=false`
    * (reference: postgresql-connector.yaml:55) — survive as `env IS NULL`
    * rows; they must pass through without crashing and stay filterable.
    *
    * `from_json` is a codegen'd Catalyst expression, so the parse stays
    * inside whole-stage codegen — no UDF in the hot ingest path.
    *
    * The parse runs EXACTLY ONCE per record: `env` is produced through an
    * `explode(array(...))` Generate fence. Without it, Catalyst pushes the
    * downstream corrupt-guard filter below this projection and — because
    * whole-stage codegen does not share subexpressions across a
    * Filter/Project boundary — every record pays a second `from_json`
    * (the round-1/2 "double parse" tax). A predicate over a
    * Generate-produced attribute cannot be pushed below the Generate, so
    * filters on `env`/`_corrupt` consume the already-materialized struct.
    * `explode(array(x))` is row-count-preserving even for null `x`
    * (the array literal is `[null]`, never an empty array), so tombstones
    * still pass through. Trade-off: from_json field pruning no longer
    * applies for op-only consumers — irrelevant here, since every caller
    * unwraps most of the envelope.
    */
  def parseEnvelope(raw: DataFrame, rowSchema: StructType): DataFrame =
    raw.withColumn("env",
        explode(array(from_json(col("value"), envelopeSchema(rowSchema)))))
      .withColumn("_tombstone", col("value").isNull)
      // a non-null value that from_json cannot parse is CORRUPT, not a
      // tombstone — without this flag it would flow through unwrap as a
      // live all-null row and compaction would materialize a null-key row.
      // PERMISSIVE mode yields an all-null struct (not a null struct) on
      // malformed input, so detect via the mandatory envelope `op` field.
      // (Deliberately env.op, not a get_json_object probe: the probe
      // spins up a fresh Jackson parser per evaluation and benched ~2×
      // slower.)
      .withColumn("_corrupt",
        col("value").isNotNull && col("env.op").isNull)

  /** Debezium MongoDB `source` block (A3). Mongo provenance differs from
    * the relational connectors: the position is `(ts_ms, ord)` — change
    * streams order by BSON timestamp (seconds) + ordinal within the
    * second — and the namespace is `(db, collection)`, `rs` names the
    * replica set (reference declares the connector: README.md:8,42;
    * disabled at values.yaml:60-61). */
  val mongoSourceSchema: StructType = StructType(Seq(
    StructField("version", StringType),
    StructField("connector", StringType),
    StructField("name", StringType),
    StructField("ts_ms", LongType),
    StructField("db", StringType),
    StructField("rs", StringType),
    StructField("collection", StringType),
    StructField("ord", LongType),
    StructField("snapshot", StringType)))

  /** Mongo change-event envelope: unlike the relational connectors,
    * `before`/`after` carry the document as a JSON **string** (extended
    * JSON), not an inline struct. */
  val mongoEnvelopeSchema: StructType = StructType(Seq(
    StructField("before", StringType),
    StructField("after", StringType),
    StructField("source", mongoSourceSchema),
    StructField("op", StringType),
    StructField("ts_ms", LongType)))

  /** A3: parse Mongo change events into the SAME unified `env` shape the
    * relational [[parseEnvelope]] produces, so `CdcOps.unwrap`,
    * compaction, and every downstream operator run unchanged — the
    * envelope-variant seam the schema registry model promises.
    *
    * Mapping decisions (documented contract):
    *   - the doc JSON strings parse with the per-collection row schema
    *     (second `from_json` — still codegen'd, no UDF);
    *   - `source.collection` → `source.table`, `source.ord` → `source.pos`
    *     (Mongo's ordering key is `(ts_ms, ord)`; ts_ms is first-class, so
    *     `ord` rides the integer-position slot and compaction orders by
    *     `Seq($"_ts_ms".desc, $"_pos".desc)`); `lsn`/`file`/`txId` are
    *     null — nothing fabricates a WAL position;
    *   - a DELETE has `after = null` and no before-image unless pre-images
    *     are enabled; the document key lives in the Kafka record KEY, so
    *     the key JSON is parsed as the (partial, PK-only) before row —
    *     exactly the `{id, __deleted:true}` rewrite Mongo's
    *     ExtractNewDocumentState SMT emits. */
  def parseMongoEnvelope(raw: DataFrame, rowSchema: StructType): DataFrame =
    raw.withColumn("_menv",
        // same Generate fence as parseEnvelope: one outer parse per record
        explode(array(from_json(col("value"), mongoEnvelopeSchema))))
      .withColumn("_tombstone", col("value").isNull)
      .withColumn("_corrupt",
        col("value").isNotNull && col("_menv.op").isNull)
      .withColumn("env", struct(
        coalesce(
          from_json(col("_menv.before"), rowSchema),
          when(col("_menv.op") === "d", from_json(col("key"), rowSchema)))
          .as("before"),
        from_json(col("_menv.after"), rowSchema).as("after"),
        struct(
          col("_menv.source.version").as("version"),
          col("_menv.source.connector").as("connector"),
          col("_menv.source.name").as("name"),
          col("_menv.source.ts_ms").as("ts_ms"),
          col("_menv.source.db").as("db"),
          col("_menv.source.rs").as("schema"),
          col("_menv.source.collection").as("table"),
          lit(null).cast(LongType).as("txId"),
          lit(null).cast(LongType).as("lsn"),
          lit(null).cast(StringType).as("file"),
          col("_menv.source.ord").as("pos"),
          col("_menv.source.snapshot").as("snapshot")).as("source"),
        col("_menv.op").as("op"),
        col("_menv.ts_ms").as("ts_ms")))
      .drop("_menv")

  /** Row schema for the synthesized `orders` change-log fixtures, with the
    * configured type modes applied: price decimal-as-string, timestamp as
    * epoch micros (see object doc). */
  val ordersRowSchema: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", StringType),  // decimal.handling.mode=string
    StructField("o_orderdate_us", LongType),  // adaptive_time_microseconds
    StructField("o_orderpriority", StringType)))

  /** Row schema for `customer` (the reference's `public.users` twin,
    * FIXTURES.md §1 mapping) with the same type modes. */
  val customerRowSchema: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", StringType),     // decimal.handling.mode=string
    StructField("c_mktsegment", StringType)))

  /** Row schema of the Debezium signaling table (public Debezium docs:
    * `signal.data.collection` names a captured table with columns
    * id/type/data; an INSERT with type='execute-snapshot' and a JSON
    * `data` payload naming data-collections triggers an ad-hoc
    * incremental snapshot of those collections mid-stream). */
  val signalRowSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("type", StringType),
    StructField("data", StringType)))

  /** Row schema of a transactional-outbox table — the column set
    * Debezium's Outbox Event Router SMT expects (public Debezium docs;
    * `table.field.event.{id,aggregatetype,aggregateid,type,payload}`
    * defaults): surrogate event id, routing aggregate type, message key,
    * event type, and the opaque serialized payload. */
  val outboxRowSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("aggregatetype", StringType),
    StructField("aggregateid", LongType),
    StructField("type", StringType),
    StructField("payload", StringType)))
}
