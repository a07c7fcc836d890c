package graft

import graft.sources.{Debezium, SchemaEvolution}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Forward-compatible schema evolution: pre-DDL envelopes still parse
  * under the evolved registry (new column null), post-DDL envelopes
  * populate it — no reprocessing. */
class SchemaEvolutionSpec extends SparkSpec {

  test("ADD COLUMN DDL evolves the registry; unknown DDL is ignored") {
    val reg = Map("orders" -> Debezium.ordersRowSchema)
    val out = SchemaEvolution.evolve(reg, Seq(
      "ALTER TABLE public.orders ADD COLUMN note text",
      "ALTER TABLE orders ADD COLUMN discount numeric(10,2)",
      "ALTER TABLE orders ADD COLUMN note text", // duplicate → idempotent
      "ALTER TABLE unknown_table ADD COLUMN x int",
      "DROP TABLE orders"))                      // unsupported → ignored
    val schema = out("orders")
    assert(schema.fieldNames.takeRight(2).toSeq == Seq("note", "discount"))
    assert(schema("note").dataType == StringType)
    assert(schema("discount").dataType == StringType) // decimal-as-string
    assert(schema.fieldNames.count(_ == "note") == 1)
    assert(!out.contains("unknown_table"))
  }

  test("multi-word Postgres type names and MySQL MODIFY shorthand parse") {
    // Postgres canonicalizes to 'double precision' — must widen real→double
    val reg = Map("t" -> StructType(Seq(
      StructField("r", FloatType), StructField("i", IntegerType),
      StructField("f", FloatType))))
    val out = SchemaEvolution.evolve(reg, Seq(
      "ALTER TABLE t ALTER COLUMN r TYPE double precision",
      // MySQL's usual spelling omits the COLUMN keyword
      "ALTER TABLE t MODIFY i bigint",
      // bare 'float' is double precision in Postgres
      "ALTER TABLE t ALTER COLUMN f TYPE float",
      "ALTER TABLE t ADD COLUMN ts timestamp with time zone",
      "ALTER TABLE t ADD COLUMN d double precision"))("t")
    assert(out("r").dataType == DoubleType)
    assert(out("i").dataType == LongType)
    assert(out("f").dataType == DoubleType)
    assert(out("ts").dataType == LongType)   // adaptive micros
    assert(out("d").dataType == DoubleType)
  }

  test("old envelopes parse under the evolved schema with null new column") {
    import spark.implicits._
    val oldEnv =
      """{"before":null,"after":{"o_orderkey":1,"o_custkey":2,
        |"o_orderstatus":"O","o_totalprice":"10.00","o_orderdate_us":0,
        |"o_orderpriority":"1"},"source":{"connector":"postgresql","lsn":10},
        |"op":"c","ts_ms":0}""".stripMargin.replaceAll("\n", "")
    val newEnv =
      """{"before":null,"after":{"o_orderkey":2,"o_custkey":2,
        |"o_orderstatus":"O","o_totalprice":"10.00","o_orderdate_us":0,
        |"o_orderpriority":"1","note":"gift"},
        |"source":{"connector":"postgresql","lsn":20},
        |"op":"c","ts_ms":0}""".stripMargin.replaceAll("\n", "")
    val evolved = SchemaEvolution.evolve(
      Map("orders" -> Debezium.ordersRowSchema),
      Seq("ALTER TABLE orders ADD COLUMN note text"))("orders")
    val raw = Seq(("prod.postgres.orders", "k", oldEnv),
      ("prod.postgres.orders", "k", newEnv)).toDF("topic", "key", "value")
    val rows = Debezium.parseEnvelope(raw, evolved)
      .select(col("env.after.o_orderkey").as("k"),
        col("env.after.note").as("note"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(rows == Set((1L, None), (2L, Some("gift"))))
  }
}
