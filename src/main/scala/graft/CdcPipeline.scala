package graft

import graft.operators.CdcOps
import graft.sources.Debezium
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Connector-config-shaped pipeline builder (SURVEY.md §2.A A12) — the
  * engine's top-level API, mirroring the reference's connector JSON
  * (reference: k8s-manifests/connectors/postgresql-connector.yaml:28-58):
  * table include list, snapshot mode, type-handling modes and the SMT
  * chain are all pinned by configuration, not code.
  *
  * @param tables          captured tables → row schema (the Schema
  *                        Registry analog; include-list = keySet)
  * @param keyColumns      primary key per table (compaction key)
  * @param orderingColumns source-position columns for compaction order,
  *                        most-significant first (`Seq("_lsn")` for
  *                        Postgres; `Seq("_file_seq", "_pos")` for MySQL
  *                        binlog coordinates — `_file_seq` is the parsed
  *                        numeric binlog suffix, which keeps ordering
  *                        correct when the log index rolls past 999999
  *                        and the raw string order inverts)
  * @param deleteRewrite   `delete.handling.mode=rewrite` (false = 'drop':
  *                        delete records removed from the unwrapped flow)
  * @param keepTombstones  `drop.tombstones=false` (false = tombstones
  *                        filtered out)
  */
final case class CdcPipelineConfig(
    tables: Map[String, StructType],
    keyColumns: Map[String, Seq[String]],
    orderingColumns: Seq[String] = Seq("_lsn"),
    deleteRewrite: Boolean = true,
    keepTombstones: Boolean = true)

/** Data-plane pause gate shared between a connector's control plane
  * (ConnectRest's `PUT /connectors/{name}/pause|resume`) and its running
  * pipeline — real Kafka Connect pause semantics: a PAUSED connector
  * stops EMITTING (the events stay in the log and flow after resume;
  * nothing is dropped). Batch invocations consult the gate at plan
  * construction ([[CdcPipeline.unwrapped]] yields zero rows while
  * paused); streaming deployments register [[onChange]] to stop/restart
  * their trigger — a micro-batch that silently skipped data would still
  * commit its offsets, which is exactly the data loss pause must not
  * cause, so the stream-side contract is stop-the-query, not
  * filter-the-batch. */
final class ConnectorGate {
  @volatile private var _paused = false
  private val listeners =
    new java.util.concurrent.CopyOnWriteArrayList[Boolean => Unit]()

  def isPaused: Boolean = _paused

  /** Register a callback fired with the NEW paused state on every
    * transition (streaming: `paused => if (paused) query.stop() else
    * restartFromCheckpoint()`). */
  def onChange(f: Boolean => Unit): Unit = listeners.add(f)

  private[graft] def set(paused: Boolean): Unit = {
    val changed = _paused != paused
    _paused = paused
    if (changed) listeners.forEach(f => f(paused))
  }
}

/** Batch/stream-agnostic CDC pipeline: raw Kafka-shaped records
  * (`topic`,`key`,`value`) → parse → route/unwrap → per-table current
  * state. Works identically on a bounded DataFrame (snapshot replay,
  * `Trigger.AvailableNow`) and an unbounded one (the `readStream` form —
  * same expressions, no code change; SURVEY.md §3.1).
  *
  * `gate`: the connector's [[ConnectorGate]] — while paused, the
  * pipeline emits NOTHING (checked at plan construction; each batch
  * window constructs its plan fresh, so the next window after resume
  * flows in full). */
final class CdcPipeline(config: CdcPipelineConfig,
    gate: Option[ConnectorGate] = None) {

  /** Parse + unwrap one table's records with its registered schema. */
  def unwrapped(raw: DataFrame, table: String): DataFrame = {
    val schema = config.tables.getOrElse(table,
      throw new IllegalArgumentException(
        s"table '$table' not in include list ${config.tables.keySet}"))
    // paused = consume nothing this window: a literal-false filter keeps
    // the schema, folds to an empty relation for batch plans
    // (PruneFilters), and — unlike limit(0) — stays a LEGAL operator if
    // the caller hands a streaming frame (Structured Streaming rejects
    // limit in Update/Append modes at analysis)
    val input =
      if (gate.exists(_.isPaused))
        raw.where(org.apache.spark.sql.functions.lit(false)) else raw
    val parsed = Debezium.parseEnvelope(input, schema)
    val un = CdcOps.unwrap(parsed)
    // capture-side include-list filter (postgresql-connector.yaml:39)
    val mine = un.filter(col("tbl") === table)
    // configured delete/tombstone modes (postgresql-connector.yaml:55-56):
    // deleteRewrite=false → Debezium 'drop' mode, delete records vanish;
    // keepTombstones=false → drop.tombstones=true, null-value records go
    val afterDeletes =
      if (config.deleteRewrite) mine
      else mine.filter(col("_tombstone") || col("__deleted") =!= "true")
    if (config.keepTombstones) afterDeletes
    else afterDeletes.filter(!col("_tombstone"))
  }

  /** Materialized current state of one captured table. */
  def table(raw: DataFrame, name: String): DataFrame = {
    val keys = config.keyColumns(name)
    val ordering: Seq[Column] = config.orderingColumns.map(col(_).desc)
    CdcOps.compactLatest(unwrapped(raw, name), keys, ordering)
  }
}
