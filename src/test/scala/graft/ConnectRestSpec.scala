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
