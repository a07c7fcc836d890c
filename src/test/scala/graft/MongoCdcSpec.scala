package graft

import graft.operators.CdcOps
import graft.sources.Debezium
import org.apache.spark.sql.functions._

/** MongoDB change-stream envelope variant (SURVEY.md §2.A A3): document
  * rides as a JSON string, ordering is (ts_ms, ord), a delete names its
  * document only via the record key. All of it flows through the unified
  * `env` seam so unwrap/compaction run unchanged. */
class MongoCdcSpec extends SparkSpec {

  private def env(
      after: Option[String], op: String, ts: Long, ord: Long): String = {
    val afterJson = after.map(d => "\"" + d.replace("\"", "\\\"") + "\"")
      .getOrElse("null")
    s"""{"before":null,"after":$afterJson,
       |"source":{"version":"2.4.0.Final","connector":"mongodb",
       |"name":"mongo-prod","ts_ms":$ts,"db":"production","rs":"rs0",
       |"collection":"orders","ord":$ord,"snapshot":"false"},
       |"op":"$op","ts_ms":$ts}""".stripMargin.replaceAll("\n", "")
  }

  private def doc(key: Long, status: String): String =
    s"""{"o_orderkey":$key,"o_custkey":1,"o_orderstatus":"$status",
       |"o_totalprice":"10.00","o_orderdate_us":0,"o_orderpriority":"1"}"""
      .stripMargin.replaceAll("\n", "")

  test("(ts_ms, ord) ordering and key-only deletes compact correctly") {
    import spark.implicits._
    val raw = Seq(
      // key 1: two updates in the SAME change-stream second — the ordinal
      // breaks the tie, arrival order must not
      ("prod.mongo.orders", """{"o_orderkey":1}""",
        env(Some(doc(1, "NEW")), "u", 1000, 9)),
      ("prod.mongo.orders", """{"o_orderkey":1}""",
        env(Some(doc(1, "OLD")), "u", 1000, 5)),
      // key 2: insert then a key-only delete (no document image at all)
      ("prod.mongo.orders", """{"o_orderkey":2}""",
        env(Some(doc(2, "A")), "c", 1000, 1)),
      ("prod.mongo.orders", """{"o_orderkey":2}""", env(None, "d", 2000, 1)),
      // key 3: later ts_ms wins regardless of smaller ord
      ("prod.mongo.orders", """{"o_orderkey":3}""",
        env(Some(doc(3, "STALE")), "u", 1000, 99)),
      ("prod.mongo.orders", """{"o_orderkey":3}""",
        env(Some(doc(3, "FRESH")), "u", 3000, 1)))
      .toDF("topic", "key", "value")
    val un = CdcOps.unwrap(
      Debezium.parseMongoEnvelope(raw, Debezium.ordersRowSchema))
    val state = CdcOps.compactLatest(un,
      keys = Seq("o_orderkey"),
      ordering = Seq(col("_ts_ms").desc, col("_pos").desc))
      .select("o_orderkey", "o_orderstatus").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(state == Set((1L, "NEW"), (3L, "FRESH")))
  }

  test("delete rewrite surfaces the document key from the record key") {
    import spark.implicits._
    val raw = Seq(("prod.mongo.orders", """{"o_orderkey":7}""",
      env(None, "d", 1000, 1))).toDF("topic", "key", "value")
    val un = CdcOps.unwrap(
      Debezium.parseMongoEnvelope(raw, Debezium.ordersRowSchema))
    val row = un.select("o_orderkey", "__deleted", "tbl").collect().head
    // the {id, __deleted:true} rewrite shape — PK recovered from the key
    assert(row.getLong(0) == 7L)
    assert(row.getString(1) == "true")
    assert(row.getString(2) == "orders")
  }

  test("mongo fixture compacts to the same state as the Postgres path") {
    val mongo = CdcQueriesAccess.compactMongo(spark, sfDir)
    val pg = CdcOps.ordersCompacted(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate_us", "o_orderpriority")
    assert(mongo.exceptAll(pg).count() == 0)
    assert(pg.exceptAll(mongo).count() == 0)
  }
}

/** Reaches the registered query the way the driver does. */
private object CdcQueriesAccess {
  def compactMongo(
      spark: org.apache.spark.sql.SparkSession, dir: String) =
    graft.operators.CdcQueries.queries("cdc_compact_mongo")(spark, dir)
}
