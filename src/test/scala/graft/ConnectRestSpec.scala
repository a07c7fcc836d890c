package graft

import graft.sources.Debezium
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** The Kafka-Connect-shaped REST facade, endpoint by endpoint: the wire
  * flow the reference's setup jobs run (POST the connector JSON, poll
  * status), plus the lifecycle and error discipline a port of those
  * scripts relies on (409 on duplicate, 404 on unknown, 400 with the
  * reason on configs the engine cannot honor). */
class ConnectRestSpec extends SparkSpec {

  private val client = HttpClient.newHttpClient()

  private def send(method: String, url: String, body: String = "")
    : HttpResponse[String] = {
    val b = HttpRequest.newBuilder().uri(URI.create(url))
    val req = method match {
      case "GET"    => b.GET()
      case "DELETE" => b.DELETE()
      case m => b.method(m, HttpRequest.BodyPublishers.ofString(body))
    }
    client.send(req.build(), HttpResponse.BodyHandlers.ofString())
  }

  private def withServer(f: (ConnectRest.Server, String) => Unit): Unit = {
    val server = ConnectRest.start(
      schemas = Map("orders" -> Debezium.ordersRowSchema),
      keys = Map("orders" -> Seq("o_orderkey")))
    try f(server, s"http://127.0.0.1:${server.port}/connectors")
    finally server.close()
  }

  private def postgresBody(name: String): String =
    s"""{"name": "$name", "config": {
       |  "connector.class": "io.debezium.connector.postgresql.PostgresConnector",
       |  "table.include.list": "public.orders",
       |  "transforms.unwrap.drop.tombstones": "false",
       |  "transforms.unwrap.delete.handling.mode": "rewrite"}}""".stripMargin

  test("provision lifecycle: create, list, get, status, pause/resume, " +
    "delete — with Connect's status discipline") {
    withServer { (server, base) =>
      assert(send("GET", base).body() == "[]")
      val created = send("POST", base, postgresBody("pg1"))
      assert(created.statusCode() == 201)
      assert(created.body().contains("\"name\":\"pg1\""))
      // duplicate name → 409, registry unchanged
      assert(send("POST", base, postgresBody("pg1")).statusCode() == 409)
      assert(send("GET", base).body() == "[\"pg1\"]")
      val got = send("GET", s"$base/pg1")
      assert(got.statusCode() == 200
        && got.body().contains("public.orders"))
      val st = send("GET", s"$base/pg1/status")
      assert(st.statusCode() == 200 && st.body().contains("\"RUNNING\""))
      assert(send("PUT", s"$base/pg1/pause").statusCode() == 202)
      assert(send("GET", s"$base/pg1/status").body().contains("\"PAUSED\""))
      assert(send("PUT", s"$base/pg1/resume").statusCode() == 202)
      assert(send("GET", s"$base/pg1/status").body().contains("\"RUNNING\""))
      assert(send("DELETE", s"$base/pg1").statusCode() == 204)
      assert(send("GET", s"$base/pg1").statusCode() == 404)
      assert(send("GET", s"$base/pg1/status").statusCode() == 404)
      assert(send("DELETE", s"$base/pg1").statusCode() == 404)
    }
  }

  test("validation: unsupported class/modes/tables are a 400 with the " +
    "reason; malformed body never registers") {
    withServer { (server, base) =>
      val mongo = postgresBody("m1").replace(
        "postgresql.PostgresConnector", "mongodb.MongoDbConnector")
      val r1 = send("POST", base, mongo)
      assert(r1.statusCode() == 400
        && r1.body().contains("connector.class"))
      val badMode = postgresBody("m2").replace(
        "\"rewrite\"", "\"drop\"").replace(
        "\"transforms.unwrap.delete.handling.mode\": \"drop\"",
        "\"decimal.handling.mode\": \"precise\"")
      val r2 = send("POST", base, badMode)
      assert(r2.statusCode() == 400
        && r2.body().contains("decimal.handling.mode"))
      val badTable = postgresBody("m3").replace(
        "public.orders", "public.nope")
      val r3 = send("POST", base, badTable)
      assert(r3.statusCode() == 400 && r3.body().contains("nope"))
      assert(send("POST", base, "{not json").statusCode() == 400)
      assert(send("GET", base).body() == "[]")
      assert(server.pipelineConfig("m1").isEmpty)
    }
  }

  test("the materialized config maps Debezium keys to the engine's " +
    "pipeline semantics") {
    withServer { (server, base) =>
      // mysql class → binlog (file, pos) ordering; 'drop' delete mode and
      // dropped tombstones map to the builder's boolean knobs
      val my =
        s"""{"name": "my1", "config": {
           |  "connector.class": "io.debezium.connector.mysql.MySqlConnector",
           |  "table.include.list": "inventory.orders",
           |  "transforms.unwrap.drop.tombstones": "true",
           |  "transforms.unwrap.delete.handling.mode": "drop"}}""".stripMargin
      assert(send("POST", base, my).statusCode() == 201)
      val cfg = server.pipelineConfig("my1").get
      assert(cfg.orderingColumns == Seq("_file_seq", "_pos"))
      assert(!cfg.deleteRewrite && !cfg.keepTombstones)
      assert(cfg.tables.keySet == Set("orders"))
      assert(cfg.keyColumns("orders") == Seq("o_orderkey"))
    }
  }

  test("backup/restore round trip: export-all → wipe → restore → identical configs") {
    withServer { (server, base) =>
      assert(send("POST", base, postgresBody("pg-a")).statusCode() == 201)
      val mysqlBody =
        """{"name": "my-b", "config": {
          |  "connector.class": "io.debezium.connector.mysql.MySqlConnector",
          |  "table.include.list": "inventory.orders",
          |  "transforms.unwrap.delete.handling.mode": "drop"}}""".stripMargin
      assert(send("POST", base, mysqlBody).statusCode() == 201)
      val backup = server.exportAll()
      val cfgA = server.pipelineConfig("pg-a").get
      val cfgB = server.pipelineConfig("my-b").get
      // restore onto a LIVE registry fails per entry with the wire's 409
      val conflicts = server.restoreAll(backup)
      assert(conflicts.map(_._1).toSet == Set("pg-a", "my-b")
        && conflicts.forall(_._2.startsWith("409")))
      // wipe (the disaster), then restore from the export
      assert(send("DELETE", s"$base/pg-a").statusCode() == 204)
      assert(send("DELETE", s"$base/my-b").statusCode() == 204)
      assert(send("GET", base).body() == "[]")
      assert(server.restoreAll(backup).isEmpty)
      // the restored connectors materialize the IDENTICAL pipeline
      // configs (ordering columns, delete/tombstone modes, tables)
      assert(server.pipelineConfig("pg-a").get == cfgA)
      assert(server.pipelineConfig("my-b").get == cfgB)
      assert(send("GET", s"$base/pg-a").statusCode() == 200)
      // and a re-export round-trips to the same document
      assert(server.exportAll() == backup)
    }
  }

  test("pause gates the data plane: a paused connector emits nothing, resume restores flow") {
    import org.apache.spark.sql.functions._
    withServer { (server, base) =>
      assert(send("POST", base, postgresBody("pg-gate")).statusCode() == 201)
      val cfg = server.pipelineConfig("pg-gate").get
      val gate = server.gate("pg-gate").get
      val transitions = scala.collection.mutable.ArrayBuffer.empty[Boolean]
      gate.onChange(p => transitions += p) // the streaming stop/start hook
      val pipeline = new CdcPipeline(cfg, gate = Some(gate))
      val raw = graft.operators.CdcOps.synthOrdersChangelog(spark, sfDir)
        .filter(get_json_object(col("key"), "$.o_orderkey")
          .cast("long") < 20)
      assert(pipeline.unwrapped(raw, "orders").count() > 0)
      assert(send("PUT", s"$base/pg-gate/pause").statusCode() == 202)
      // the SAME input while paused: zero emission (plan-construction
      // gate), not a filtered-but-committed batch
      assert(pipeline.unwrapped(raw, "orders").count() == 0)
      assert(send("PUT", s"$base/pg-gate/resume").statusCode() == 202)
      assert(pipeline.unwrapped(raw, "orders").count() > 0)
      // duplicate resume is a no-op transition (listener fired twice, not
      // three times) — stop/restart hooks must not double-fire
      assert(send("PUT", s"$base/pg-gate/resume").statusCode() == 202)
      assert(transitions.toSeq == Seq(true, false))
    }
  }

  test("/metrics Prometheus exposition: scrape loop feeds an availability rule over the scraped series") {
    import graft.streaming.{AlertRules, Prometheus, StreamingMetrics}
    import org.apache.spark.sql.functions._
    // the stream-progress source a deployment points at a
    // ProgressRecorder.snapshot; here the snapshot advances per scrape
    @volatile var batches = Seq.empty[StreamingMetrics.BatchMetrics]
    val server = ConnectRest.start(
      schemas = Map("orders" -> Debezium.ordersRowSchema),
      keys = Map("orders" -> Seq("o_orderkey")),
      streamMetrics = Some(() => batches))
    try {
      val base = s"http://127.0.0.1:${server.port}"
      assert(send("POST", s"$base/connectors",
        postgresBody("pg-up")).statusCode() == 201)
      assert(send("POST", s"$base/connectors",
        postgresBody("pg-down").replace("pg-up", "pg-down"))
        .statusCode() == 201)
      send("PUT", s"$base/connectors/pg-down/pause")
      // Prometheus's loop: scrape N times, accumulate the series
      val scrapes = (0 until 3).map { i =>
        batches = batches :+ StreamingMetrics.BatchMetrics(
          "cdcq", i.toLong, 100L * (i + 1), 50.0, 40.0, 120L)
        val resp = send("GET", s"$base/metrics")
        assert(resp.statusCode() == 200)
        assert(resp.headers().firstValue("Content-Type").get()
          .startsWith("text/plain"))
        Prometheus.parse(resp.body())
      }
      // exposition is faithful: counters accumulate, gauges are current
      def one(ss: Seq[Prometheus.Sample], n: String, l: (String, String)) =
        ss.find(x => x.name == n && x.labels.get(l._1).contains(l._2)).get
      assert(one(scrapes.last, "graft_stream_input_rows_total",
        "query" -> "cdcq").value == (100 + 200 + 300).toDouble)
      assert(one(scrapes.last, "graft_stream_batches_total",
        "query" -> "cdcq").value == 3.0)
      assert(one(scrapes.head, "graft_connector_up",
        "connector" -> "pg-up").value == 1.0)
      assert(one(scrapes.head, "graft_connector_up",
        "connector" -> "pg-down").value == 0.0)
      // the reference's availability rule shape (sustained `for:` clause,
      // prometheus-rules.yaml): unavailability (up == 0) over ≥2
      // consecutive scrape buckets fires; evaluate it over the SCRAPED
      // series with the engine's own rule evaluator
      import spark.implicits._
      val buckets = scrapes.zipWithIndex.flatMap { case (ss, i) =>
        ss.filter(_.name == "graft_connector_up").map(x =>
          (x.labels("connector"),
            java.sql.Timestamp.from(
              java.time.Instant.ofEpochSecond(3600L * i)),
            (1.0 - x.value).toLong))
      }.toDF("connector", "h", "n")
      val fired = AlertRules
        .sustainedRuns(buckets, "connector", threshold = 1L, minRun = 2)
        .select("connector").as[String].collect().toSet
      assert(fired == Set("pg-down"))
    } finally server.close()
  }

  test("graded twin runs the fixture changelog through a REST-provisioned " +
    "pipeline and lands on the builder's state") {
    val viaRest = graft.operators.CdcQueries
      .queries("cdc_rest_provision")(spark, sfDir).collect()
    assert(viaRest.nonEmpty)
    val viaBuilder = graft.operators.CdcQueries
      .queries("cdc_compact")(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("o_orderkey") % 5 === 0)
      .collect()
    assert(viaRest.map(_.toString).toSeq ==
      viaBuilder.map(_.toString).toSeq)
  }
}
