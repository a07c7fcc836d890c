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

  test("DROP COLUMN evolves the registry; unknown/repeat drops are no-ops") {
    val reg = Map("orders" -> Debezium.ordersRowSchema)
    val out = SchemaEvolution.evolve(reg, Seq(
      "ALTER TABLE public.orders DROP COLUMN o_orderpriority",
      "ALTER TABLE orders DROP COLUMN IF EXISTS o_orderpriority", // repeat
      "ALTER TABLE orders DROP COLUMN no_such_column"))           // unknown
    val schema = out("orders")
    assert(!schema.fieldNames.contains("o_orderpriority"))
    assert(schema.length == Debezium.ordersRowSchema.length - 1)
    // the rest of the registry row order is untouched
    assert(schema.fieldNames.toSeq ==
      Debezium.ordersRowSchema.fieldNames.filterNot(_ == "o_orderpriority").toSeq)
  }

  test("non-widening type changes are log-and-ignored") {
    val reg = Map("t" -> StructType(Seq(
      StructField("big", LongType), StructField("d", DoubleType),
      StructField("s", StringType))))
    val out = SchemaEvolution.evolve(reg, Seq(
      "ALTER TABLE t ALTER COLUMN big TYPE int",   // narrowing
      "ALTER TABLE t ALTER COLUMN d TYPE real",    // narrowing
      "ALTER TABLE t ALTER COLUMN s TYPE bigint")) // shape change
    assert(out("t") == reg("t"))
  }

  test("pre-DDL envelopes still parse after DROP COLUMN and type widening") {
    import spark.implicits._
    // old envelope carries the soon-to-be-dropped field AND an int-ranged
    // key; the evolved registry has the field dropped and the key widened
    val oldEnv =
      """{"before":null,"after":{"o_orderkey":7,"o_custkey":2,
        |"o_orderstatus":"O","o_totalprice":"10.00","o_orderdate_us":0,
        |"o_orderpriority":"1-URGENT"},
        |"source":{"connector":"postgresql","lsn":10},
        |"op":"c","ts_ms":0}""".stripMargin.replaceAll("\n", "")
    // pre-widen registry state: o_custkey was INT before the DDL widened it
    val narrow = StructType(Debezium.ordersRowSchema.fields.map(f =>
      if (f.name == "o_custkey") f.copy(dataType = IntegerType) else f))
    val evolved = SchemaEvolution.evolve(
      Map("orders" -> narrow),
      Seq("ALTER TABLE orders DROP COLUMN o_orderpriority",
        "ALTER TABLE orders ALTER COLUMN o_custkey TYPE bigint"))("orders")
    assert(!evolved.fieldNames.contains("o_orderpriority"))
    assert(evolved("o_custkey").dataType == LongType) // widened int→bigint
    val raw = Seq(("prod.postgres.orders", "k", oldEnv))
      .toDF("topic", "key", "value")
    val parsed = Debezium.parseEnvelope(raw, evolved)
    // from_json ignores the extra JSON field; the widened column reads
    // the old narrow value losslessly; the envelope is NOT dead-lettered
    val r = parsed.select(col("env.after.o_orderkey").as("k"),
        col("env.after.o_custkey").as("c"), col("env.op").as("op"))
      .collect().head
    assert(r.getLong(0) == 7L && r.getLong(1) == 2L && r.getString(2) == "c")
    assert(parsed.schema("env").dataType.asInstanceOf[StructType]("after")
      .dataType.asInstanceOf[StructType].fieldNames
      .forall(_ != "o_orderpriority"))
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

  test("RENAME COLUMN evolves the registry; collisions and unknown " +
      "sources are no-ops; lineage collapses chains and ends on drop") {
    import org.apache.spark.sql.types._
    val base = Map("t" -> StructType(Seq(
      StructField("a", LongType), StructField("b", StringType))))
    // plain rename keeps the type under the new name
    val r1 = SchemaEvolution.evolve(base,
      Seq("ALTER TABLE t RENAME COLUMN a TO a2"))("t")
    assert(r1.fieldNames.toSeq == Seq("a2", "b")
      && r1("a2").dataType == LongType)
    // renaming onto an existing name or from an unknown column: ignored
    assert(SchemaEvolution.evolve(base,
      Seq("ALTER TABLE t RENAME COLUMN a TO b"))("t") == base("t"))
    assert(SchemaEvolution.evolve(base,
      Seq("ALTER TABLE t RENAME COLUMN nope TO x"))("t") == base("t"))
    // optional COLUMN keyword (MySQL table-rename shape is NOT matched:
    // `RENAME TO` has no source column and must stay unsupported)
    assert(SchemaEvolution.parseDdl("ALTER TABLE t RENAME a TO c")
      .contains(SchemaEvolution.RenameCol("t", "a", "c")))
    // lineage: a→b then b→c collapses to c→a; dropping c ends it
    val chain = Seq("ALTER TABLE t RENAME COLUMN a TO b2",
      "ALTER TABLE t RENAME COLUMN b2 TO c")
    assert(SchemaEvolution.renameLineage(base, chain)
      == Map("t" -> Map("c" -> "a")))
    assert(SchemaEvolution.renameLineage(base,
      chain :+ "ALTER TABLE t DROP COLUMN c") == Map.empty)
    // lineage mirrors evolve's guards: a rename the registry REJECTED
    // (target collision, unknown source, unknown table) records no
    // lineage — the consumer recipe would otherwise corrupt or crash
    assert(SchemaEvolution.renameLineage(base,
      Seq("ALTER TABLE t RENAME COLUMN a TO b")) == Map.empty)
    assert(SchemaEvolution.renameLineage(base,
      Seq("ALTER TABLE t RENAME COLUMN nope TO x")) == Map.empty)
    assert(SchemaEvolution.renameLineage(base,
      Seq("ALTER TABLE other RENAME COLUMN a TO b")) == Map.empty)
    // a column RE-ADDED under a lineage's original name ends the lineage
    // (the old field name now denotes a NEW column — augmenting would
    // duplicate the field and coalescing would mix two columns' data)
    val (readded, lin) = SchemaEvolution.evolveWithLineage(base,
      Seq("ALTER TABLE t RENAME COLUMN a TO a2",
        "ALTER TABLE t ADD COLUMN a bigint"))
    assert(readded("t").fieldNames.toSeq == Seq("a2", "b", "a"))
    assert(lin == Map.empty)
    // a→b2→a round trip needs no augmentation: self-maps are dropped
    assert(SchemaEvolution.renameLineage(base,
      Seq("ALTER TABLE t RENAME COLUMN a TO b2",
        "ALTER TABLE t RENAME COLUMN b2 TO a")) == Map.empty)
    // a RENAME that re-occupies a lineage's ORIGINAL name ends that
    // lineage (same rule as the re-ADD above): after a→x then b→a, the
    // old field name "a" denotes the renamed b — keeping x→a would make
    // the consumer's original-name twin collide with the real current
    // column "a" (duplicate field) or coalesce b's data into x
    val (swapped, swapLin) = SchemaEvolution.evolveWithLineage(base,
      Seq("ALTER TABLE t RENAME COLUMN a TO x",
        "ALTER TABLE t RENAME COLUMN b TO a"))
    assert(swapped("t").fieldNames.toSeq == Seq("x", "a"))
    assert(swapLin == Map("t" -> Map("a" -> "b")))
  }

  test("graded cdc_schema_rename twin: renamed column carries pre-DDL " +
      "values and the narrowing DDL is rejected inline") {
    val out = graft.operators.CdcQueries
      .queries("cdc_schema_rename")(spark, "/root/testdata/sf0.001")
    // the renamed column is in the output schema under its NEW name via
    // the aggregate; sums are non-null => old envelopes' o_totalprice
    // flowed into o_amount through the lineage coalesce
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => !r.isNullAt(2) && r.getLong(2) > 0L),
      "pre-DDL values did not flow into the renamed column")
  }
}
