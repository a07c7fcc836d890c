package graft

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.sources.Tables
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.types.StructType
import scala.jdk.CollectionConverters._

/** Kafka-Connect-shaped REST provisioning facade (SURVEY.md §2.A A12).
  *
  * The reference provisions connectors by POSTing Debezium connector JSON
  * to Kafka Connect's REST API (reference:
  * k8s-manifests/connectors/postgresql-connector.yaml:26-58 — `curl -X
  * POST http://kafka-connect:8083/connectors` with `{"name", "config"}`),
  * and its setup jobs poll `GET /connectors` for readiness. This server
  * speaks that wire shape over the JDK's built-in [[HttpServer]] (no new
  * dependencies) and materializes each accepted config as a
  * [[CdcPipelineConfig]] — the same object the programmatic builder
  * produces — so an operator can port their provisioning scripts
  * unchanged: same endpoint paths, same request/response documents, same
  * 201/404/409 status discipline.
  *
  * Endpoints (the subset the reference's jobs use, plus lifecycle):
  *   - `GET    /connectors`                     → `["name", …]`
  *   - `POST   /connectors`                     → register, 201 (409 dup)
  *   - `GET    /connectors/{name}`              → `{"name","config"}`
  *   - `GET    /connectors/{name}/status`       → Connect status document
  *   - `PUT    /connectors/{name}/pause|resume` → 202
  *   - `DELETE /connectors/{name}`              → 204
  *
  * The server is a CONTROL-PLANE facade: it validates + registers
  * configs and reports status; data-plane execution stays in
  * [[CdcPipeline]] (callers fetch the materialized config with
  * [[ConnectRest.Server#pipelineConfig]] and run it on any raw frame).
  * Validation mirrors what the engine actually supports — unknown
  * `connector.class`, include-list tables absent from the schema
  * registry, or type-handling modes other than the engine's pinned
  * `decimal=string` / `time=adaptive_time_microseconds` are a 400 with
  * the reason, not a silently-degraded pipeline.
  */
object ConnectRest {

  /** Registered connector: its materialized pipeline config + state.
    * `gate` is the DATA-PLANE pause gate — the same object a running
    * [[CdcPipeline]] consults, so a REST pause actually stops emission
    * rather than only flipping the status string. */
  final case class Entry(
      name: String,
      rawConfig: Map[String, String],
      pipeline: CdcPipelineConfig,
      var state: String, // RUNNING | PAUSED
      gate: ConnectorGate = new ConnectorGate)

  private val mapper = new ObjectMapper()

  /** Map a Debezium connector `config` map to a [[CdcPipelineConfig]]
    * against the given schema/key registry (the database-catalog analog:
    * Debezium reads PKs and column types from the source DB; this engine
    * reads them from the registry). Left = 400 reason. */
  def toPipelineConfig(
      config: Map[String, String],
      schemas: Map[String, StructType],
      keys: Map[String, Seq[String]]): Either[String, CdcPipelineConfig] = {
    val cls = config.getOrElse("connector.class", "")
    val ordering: Either[String, Seq[String]] =
      if (cls.contains("postgresql")) Right(Seq("_lsn"))
      else if (cls.contains("mysql")) Right(Seq("_file_seq", "_pos"))
      else Left(s"unsupported connector.class '$cls' (postgresql and " +
        "mysql connectors are supported)")
    // the engine parses under the reference's pinned type modes; a config
    // requesting a different mode would NOT get what it asked for
    val badMode = Seq(
      "decimal.handling.mode" -> "string",
      "time.precision.mode" -> "adaptive_time_microseconds").collectFirst {
      case (k, want) if config.get(k).exists(_ != want) =>
        s"$k='${config(k)}' unsupported (engine parses with $k=$want)"
    }
    // include-list entries route to their LAST segment (the RegexRouter
    // `$3` replacement the reference configures), which is the registry key
    val tables = config.getOrElse("table.include.list", "").split(",")
      .map(_.trim).filter(_.nonEmpty).map(t => t.split("\\.").last).toSeq
    val missing = tables.filterNot(t =>
      schemas.contains(t) && keys.contains(t))
    for {
      ord <- ordering
      _ <- badMode.toLeft(())
      _ <- if (tables.isEmpty) Left("table.include.list is empty")
           else Right(())
      _ <- if (missing.nonEmpty)
             Left(s"tables not in schema registry: ${missing.mkString(",")}")
           else Right(())
    } yield CdcPipelineConfig(
      tables = tables.map(t => t -> schemas(t)).toMap,
      keyColumns = tables.map(t => t -> keys(t)).toMap,
      orderingColumns = ord,
      // transforms.unwrap.delete.handling.mode=rewrite keeps delete rows
      // with __deleted=true; drop.tombstones=false RETAINS tombstones
      deleteRewrite =
        config.getOrElse("transforms.unwrap.delete.handling.mode",
          "rewrite") == "rewrite",
      keepTombstones =
        config.getOrElse("transforms.unwrap.drop.tombstones",
          "false") == "false")
  }

  /** Start the facade on `port` (0 = ephemeral). Defaults the registry to
    * the engine's captured-table analogs ([[Tables.captureMapping]]).
    *
    * `streamMetrics` turns on the `GET /metrics` Prometheus exposition
    * endpoint (the reference's scrape path,
    * prometheus-config.yaml:26-59): each scrape renders the supplied
    * stream-progress snapshot (typically a
    * [[graft.streaming.StreamingMetrics.ProgressRecorder]]'s
    * `snapshot`) plus the server's own live connector states through
    * [[graft.streaming.Prometheus.render]]. */
  def start(
      schemas: Map[String, StructType],
      keys: Map[String, Seq[String]],
      port: Int = 0,
      streamMetrics: Option[
        () => Seq[graft.streaming.StreamingMetrics.BatchMetrics]] = None)
      : Server = {
    val http = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    // daemon threads + explicit shutdown in close(): HttpServer.stop()
    // does NOT stop a user-supplied executor, and lingering non-daemon
    // pool threads would keep a driver JVM alive after main returns
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2,
      (r: Runnable) => {
        val t = new Thread(r, "connect-rest")
        t.setDaemon(true)
        t
      })
    val server = new Server(http, pool, schemas, keys)
    http.createContext("/connectors", server.handler _)
    streamMetrics.foreach { snap =>
      http.createContext("/metrics",
        (ex: HttpExchange) => server.metricsHandler(ex, snap))
    }
    http.setExecutor(pool)
    http.start()
    server
  }

  final class Server(
      http: HttpServer,
      pool: java.util.concurrent.ExecutorService,
      schemas: Map[String, StructType],
      keys: Map[String, Seq[String]]) {

    private val entries =
      scala.collection.mutable.LinkedHashMap.empty[String, Entry]

    def port: Int = http.getAddress.getPort
    def close(): Unit = { http.stop(0); pool.shutdownNow() }

    /** The materialized config of a registered connector (data plane). */
    def pipelineConfig(name: String): Option[CdcPipelineConfig] =
      entries.synchronized(entries.get(name).map(_.pipeline))

    /** Validate + register one connector (the POST /connectors body
      * semantics); Left = (status, reason). */
    private def register(name: String,
        cfg: Map[String, String]): Either[(Int, String), Entry] =
      toPipelineConfig(cfg, schemas, keys) match {
        case Left(reason) => Left((400, reason))
        case Right(pc) => entries.synchronized {
          if (entries.contains(name))
            Left((409, s"Connector $name already exists"))
          else {
            val e2 = Entry(name, cfg, pc, "RUNNING")
            entries.put(name, e2)
            Right(e2)
          }
        }
      }

    /** Export every registered connector as a JSON array of the SAME
      * `{"name","config"}` documents `POST /connectors` accepts — the
      * reference's config backup (its backup script curls each
      * connector's config document to a dated file; reference:
      * scripts/setup-infrastructure.sh:386-441). */
    def exportAll(): String = entries.synchronized {
      entries.values.map(configDoc).mkString("[", ",", "]")
    }

    /** Bulk re-provision from an [[exportAll]] document — the restore
      * half of the backup round trip. Every entry passes through the
      * normal validation/registration path (a backup taken against a
      * different schema registry can still be rejected); returns the
      * per-connector failures, empty = full restore. Names that already
      * exist fail with 409 exactly like a wire POST would. */
    def restoreAll(json: String): Seq[(String, String)] = {
      val root = mapper.readTree(json)
      require(root != null && root.isArray,
        "restore document must be a JSON array of {name, config}")
      root.asScala.toSeq.flatMap { doc =>
        // a malformed entry is REPORTED, not thrown: a partially-corrupt
        // backup should restore every healthy connector and name the bad
        // documents, matching how the wire POST 400s one request
        if (doc == null || !doc.hasNonNull("name")
          || !doc.hasNonNull("config"))
          Some(s"<entry ${doc}>".take(80) -> "400: not a {name, config} document")
        else {
          val name = doc.get("name").asText()
          val cfg = doc.get("config").properties().asScala
            .map(e => e.getKey -> e.getValue.asText()).toMap
          register(name, cfg).left.toOption.map {
            case (code, reason) => name -> s"$code: $reason"
          }
        }
      }
    }

    /** The data-plane pause gate of a registered connector — hand it to
      * the connector's [[CdcPipeline]] (constructor `gate` param) and to
      * any streaming runner's `onChange` stop/restart hook. */
    def gate(name: String): Option[ConnectorGate] =
      entries.synchronized(entries.get(name).map(_.gate))

    /** Live `(connector, state)` pairs — the `/metrics` exposition's
      * `graft_connector_up` source, so a pause flips the gauge on the
      * very next scrape. */
    def connectorStates: Seq[(String, String)] =
      entries.synchronized(entries.values.map(e => e.name -> e.state).toList)

    private[ConnectRest] def metricsHandler(
        ex: HttpExchange,
        snap: () => Seq[graft.streaming.StreamingMetrics.BatchMetrics])
        : Unit = try {
      if (ex.getRequestMethod != "GET")
        error(ex, 405, s"${ex.getRequestMethod} /metrics not supported")
      else {
        val body = graft.streaming.Prometheus
          .render(snap(), connectorStates).getBytes(UTF_8)
        ex.getResponseHeaders.set("Content-Type",
          "text/plain; version=0.0.4; charset=utf-8")
        ex.sendResponseHeaders(200, body.length)
        ex.getResponseBody.write(body)
        ex.close()
      }
    } catch {
      case e: Exception =>
        try error(ex, 500, String.valueOf(e.getMessage))
        catch { case _: Exception => () }
    }

    private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
      val bytes = body.getBytes(UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      // 204 must not carry a body (sendResponseHeaders contract: -1)
      ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
      if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
      ex.close()
    }

    private def jstr(s: String): String = mapper.writeValueAsString(s)

    private def error(ex: HttpExchange, code: Int, msg: String): Unit =
      respond(ex, code,
        s"""{"error_code":$code,"message":${jstr(msg)}}""")

    private def statusDoc(e: Entry): String = {
      val worker = jstr(s"127.0.0.1:$port")
      s"""{"name":${jstr(e.name)},"connector":{"state":${jstr(e.state)},
         |"worker_id":$worker},"tasks":[{"id":0,"state":${jstr(e.state)},
         |"worker_id":$worker}],"type":"source"}""".stripMargin
        .replace("\n", "")
    }

    private def configDoc(e: Entry): String = {
      val cfg = e.rawConfig.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
        .mkString("{", ",", "}")
      s"""{"name":${jstr(e.name)},"config":$cfg}"""
    }

    def handler(ex: HttpExchange): Unit = try {
      val path = ex.getRequestURI.getPath.stripSuffix("/")
      val method = ex.getRequestMethod
      val parts = path.stripPrefix("/connectors") match {
        case "" => Seq.empty
        case p  => p.stripPrefix("/").split("/").toSeq
      }
      (method, parts) match {
        case ("GET", Seq()) => entries.synchronized {
          respond(ex, 200,
            entries.keys.map(jstr).mkString("[", ",", "]"))
        }
        case ("POST", Seq()) =>
          val body =
            new String(ex.getRequestBody.readAllBytes(), UTF_8)
          val root =
            try mapper.readTree(body)
            catch { case _: Exception => null }
          if (root == null || !root.hasNonNull("name")
            || !root.hasNonNull("config"))
            error(ex, 400, "body must be {\"name\", \"config\"}")
          else if (!root.get("name").asText().matches("[A-Za-z0-9._-]+"))
            // a name with '/' (or empty) would register fine but never
            // match the per-connector path routes again — a permanently
            // stuck entry; real Kafka Connect rejects such names with 400
            error(ex, 400,
              "connector name must be non-empty [A-Za-z0-9._-]")
          else {
            val name = root.get("name").asText()
            val cfg = root.get("config").properties().asScala
              .map(e => e.getKey -> e.getValue.asText()).toMap
            register(name, cfg) match {
              case Left((code, reason)) => error(ex, code, reason)
              case Right(e2) => respond(ex, 201, configDoc(e2))
            }
          }
        case ("GET", Seq(name)) => entries.synchronized {
          entries.get(name) match {
            case Some(e2) => respond(ex, 200, configDoc(e2))
            case None => error(ex, 404, s"Connector $name not found")
          }
        }
        case ("GET", Seq(name, "status")) => entries.synchronized {
          entries.get(name) match {
            case Some(e2) => respond(ex, 200, statusDoc(e2))
            case None => error(ex, 404, s"Connector $name not found")
          }
        }
        case ("PUT", Seq(name, action))
            if action == "pause" || action == "resume" =>
          entries.synchronized {
            entries.get(name) match {
              case Some(e2) =>
                e2.state = if (action == "pause") "PAUSED" else "RUNNING"
                Some(e2.gate)
              case None => None
            }
          } match {
            // flip the DATA PLANE too: a paused connector stops emitting
            // (Connect semantics), not just reporting PAUSED. Listeners
            // fire OUTSIDE the registry lock: an onChange hook may block
            // (query.stop() joins the stream thread), and holding the
            // monitor across that would stall every other REST call —
            // or deadlock if the hook's thread touches the registry.
            case Some(g) => g.set(action == "pause"); respond(ex, 202, "")
            case None    => error(ex, 404, s"Connector $name not found")
          }
        case ("DELETE", Seq(name)) => entries.synchronized {
          if (entries.remove(name).isDefined) respond(ex, 204, "")
          else error(ex, 404, s"Connector $name not found")
        }
        case _ => error(ex, 405, s"$method $path not supported")
      }
    } catch {
      case e: Exception =>
        try error(ex, 500, String.valueOf(e.getMessage))
        catch { case _: Exception => () }
    }
  }
}
