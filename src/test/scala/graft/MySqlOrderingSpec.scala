package graft

import graft.sources.Debezium
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** MySQL-connector compaction (SURVEY.md §2.A A2): binlog coordinates are
  * a (file, pos) pair — position resets when the log rotates, so ordering
  * by pos alone (or arrival) picks wrong winners across a rotation. */
class MySqlOrderingSpec extends SparkSpec {

  private def env(key: Long, file: String, pos: Long, status: String) =
    s"""{"before":null,
       |"after":{"o_orderkey":$key,"o_custkey":1,"o_orderstatus":"$status",
       |"o_totalprice":"10.00","o_orderdate_us":0,"o_orderpriority":"1"},
       |"source":{"version":"2.4.0.Final","connector":"mysql",
       |"name":"mysql-prod","ts_ms":0,"db":"inventory","schema":null,
       |"table":"products","txId":null,"lsn":null,
       |"file":"$file","pos":$pos,"snapshot":"false"},
       |"op":"u","ts_ms":0}""".stripMargin.replaceAll("\n", "")

  test("binlog (file, pos) ordering survives log rotation") {
    import spark.implicits._
    // key 1: pos 900 in binlog.000001, then pos 5 in binlog.000002 —
    // the later FILE wins even though its pos is numerically smaller
    val raw = Seq(
      ("prod.mysql.products", "k", env(1, "binlog.000001", 900, "OLD")),
      ("prod.mysql.products", "k", env(1, "binlog.000002", 5, "NEW")),
      ("prod.mysql.products", "k", env(2, "binlog.000001", 10, "A")))
      .toDF("topic", "key", "value")
    val cfg = CdcPipelineConfig(
      tables = Map("products" -> Debezium.ordersRowSchema),
      keyColumns = Map("products" -> Seq("o_orderkey")),
      orderingColumns = Seq("_file_seq", "_pos"))
    val state = new CdcPipeline(cfg).table(raw, "products")
      .select("o_orderkey", "o_orderstatus").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(state == Set((1L, "NEW"), (2L, "A")))
    // pos-only ordering would have picked the wrong winner — prove the
    // counterfactual so the test actually guards the pair ordering
    val wrong = new CdcPipeline(cfg.copy(orderingColumns = Seq("_pos")))
      .table(raw, "products")
      .select("o_orderkey", "o_orderstatus").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(wrong == Set((1L, "OLD"), (2L, "A")))
  }

  test("binlog ordering survives the suffix rolling past 6 digits") {
    import spark.implicits._
    // when the index grows from binlog.999999 to binlog.1000000 the raw
    // string order INVERTS ("binlog.1000000" < "binlog.999999") — the
    // parsed numeric suffix (_file_seq) keeps the true order
    val raw = Seq(
      ("prod.mysql.products", "k", env(1, "binlog.999999", 900, "OLD")),
      ("prod.mysql.products", "k", env(1, "binlog.1000000", 5, "NEW")))
      .toDF("topic", "key", "value")
    val cfg = CdcPipelineConfig(
      tables = Map("products" -> Debezium.ordersRowSchema),
      keyColumns = Map("products" -> Seq("o_orderkey")),
      orderingColumns = Seq("_file_seq", "_pos"))
    val state = new CdcPipeline(cfg).table(raw, "products")
      .select("o_orderkey", "o_orderstatus").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(state == Set((1L, "NEW")))
    // raw-string file ordering resurrects the stale row — counterfactual
    val wrong = new CdcPipeline(
      cfg.copy(orderingColumns = Seq("_file", "_pos")))
      .table(raw, "products")
      .select("o_orderkey", "o_orderstatus").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(wrong == Set((1L, "OLD")))
  }
}
