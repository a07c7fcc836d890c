package graft

import graft.functions.Udx
import graft.operators.CdcOps
import graft.sources.{Debezium, KafkaCdc}
import org.apache.spark.sql.functions._

/** Snapshot∪stream capture, schema-change routing, Kafka record-shape
  * projection, and the UDF/UDAF extension surface. */
class CdcSourcesUdxSpec extends SparkSpec {

  test("SQL function surface: registered kernels match the Column API " +
      "and reject non-literal size args") {
    import org.apache.spark.sql.functions._
    graft.functions.SqlFunctions.register(spark)
    val docs = graft.sources.Tables.scan(spark, sfDir, "documents")
      .limit(50).select(col("doc_id"), lower(trim(col("text"))).as("t"))
    docs.createOrReplaceTempView("sqlfn_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, word_shingles(t, 4) AS sh,
        |  simhash64(word_shingles(t, 4)) AS sh64,
        |  minhash_sig(word_shingles(t, 4), 16) AS mh,
        |  deflate_len(t) AS dl
        |FROM sqlfn_docs ORDER BY doc_id""".stripMargin)
    val vf = graft.functions.VectorFunctions
    val sh = vf.wordShingles(col("t"), 4)
    val viaApi = docs.select(col("doc_id"), sh.as("sh"),
        vf.simhash64(sh).as("sh64"), vf.minhashSig(sh, 16).as("mh"),
        vf.deflateLen(col("t")).as("dl"))
      .orderBy("doc_id")
    assert(viaSql.collect() === viaApi.collect())

    val e = graft.sources.Tables.scan(spark, sfDir, "embeddings").limit(20)
    e.createOrReplaceTempView("sqlfn_embs")
    val dots = spark.sql(
      """SELECT a.vec_id va, b.vec_id vb,
        |  float_dot(a.embedding, b.embedding) AS d,
        |  rph_buckets(a.embedding, 2, 8) AS bk
        |FROM sqlfn_embs a JOIN sqlfn_embs b ON a.vec_id < b.vec_id
        |ORDER BY va, vb""".stripMargin)
    val dotsApi = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
        vf.floatDot(col("a.embedding"), col("b.embedding")).as("d"),
        vf.rphBuckets(col("a.embedding"), 2, 8).as("bk"))
      .orderBy("va", "vb")
    assert(dots.collect() === dotsApi.collect())

    // size/seed args parametrize codegen — a per-row value must be
    // rejected with an informative message, not miscompiled
    val err = intercept[Exception] {
      spark.sql("SELECT word_shingles(t, CAST(doc_id AS INT)) " +
        "FROM sqlfn_docs").collect()
    }
    assert(err.getMessage.contains("INTEGER literal")
      || Option(err.getCause).exists(_.getMessage.contains("INTEGER literal")))
  }

  test("snapshot∪tail compacts to the same state as the full changelog") {
    val viaSnapshot = SparkEntry.queries("cdc_snapshot_union")(spark, sfDir)
    val viaLog = SparkEntry.queries("cdc_compact")(spark, sfDir)
    assert(viaSnapshot.exceptAll(viaLog).count() == 0)
    assert(viaLog.exceptAll(viaSnapshot).count() == 0)
  }

  test("corrupt values are flagged and dropped, tombstones are kept") {
    import spark.implicits._
    val raw = Seq(
      ("prod.postgres.orders", "k", "{not json"),          // corrupt
      ("prod.postgres.orders", "k", null.asInstanceOf[String])) // tombstone
      .toDF("topic", "key", "value")
    val parsed = Debezium.parseEnvelope(raw, Debezium.ordersRowSchema)
    assert(parsed.filter(col("_corrupt")).count() == 1)
    assert(parsed.filter(col("_tombstone")).count() == 1)
    val un = CdcOps.unwrap(parsed)
    // the corrupt record must not surface as a live null-key row
    assert(un.count() == 1 && un.filter(col("_tombstone")).count() == 1)
  }

  test("delete/tombstone mode knobs change the unwrapped flow") {
    val raw = CdcOps.synthOrdersChangelog(spark, sfDir)
    def pipe(rewrite: Boolean, tombs: Boolean) = new CdcPipeline(
      CdcPipelineConfig(
        tables = Map("orders" -> Debezium.ordersRowSchema),
        keyColumns = Map("orders" -> Seq("o_orderkey")),
        deleteRewrite = rewrite, keepTombstones = tombs))
    val full = pipe(rewrite = true, tombs = true).unwrapped(raw, "orders")
    val noDel = pipe(rewrite = false, tombs = true).unwrapped(raw, "orders")
    val noTomb = pipe(rewrite = true, tombs = false).unwrapped(raw, "orders")
    val deletes = full.filter(col("__deleted") === "true").count()
    val tombs = full.filter(col("_tombstone")).count()
    assert(deletes > 0 && tombs > 0)
    assert(noDel.count() == full.count() - deletes)
    assert(noTomb.count() == full.count() - tombs)
  }

  test("schema-change events route to the control stream") {
    import spark.implicits._
    val data = CdcOps.synthOrdersChangelog(spark, sfDir)
    val ddl = Seq(
      ("schema-changes.prod.postgres", """{"db":"production"}""",
        """{"ddl":"ALTER TABLE orders ADD COLUMN note text"}"""))
      .toDF("topic", "key", "value")
    val (dataOut, ddlOut) = CdcOps.splitSchemaChanges(data.unionByName(ddl))
    assert(ddlOut.count() == 1)
    assert(dataOut.count() == data.count())
  }

  test("Kafka record shape projects to engine records with replay offsets") {
    import spark.implicits._
    val kafkaShaped = Seq(
      ("prod.postgres.orders", "k1".getBytes, "v1".getBytes, 3, 42L))
      .toDF("topic", "key", "value", "partition", "offset")
    val out = KafkaCdc.fromKafkaShape(kafkaShaped).collect().head
    assert(out.getString(0) == "prod.postgres.orders")
    assert(out.getString(1) == "k1" && out.getString(2) == "v1")
    assert(out.getInt(3) == 3 && out.getLong(4) == 42L)
  }

  test("weighted_mean Aggregator map-side combines to the exact mean") {
    import spark.implicits._
    Udx.register(spark)
    val df = Seq((1.0, 1.0), (3.0, 3.0), (100.0, 0.0))
      .toDF("v", "w").repartition(3)
    df.createOrReplaceTempView("wm")
    val r = spark.sql("SELECT weighted_mean(v, w) AS m FROM wm")
      .collect().head.getDouble(0)
    assert(r == (1.0 * 1.0 + 3.0 * 3.0) / 4.0)
    val c = spark.sql("SELECT clamp01(1.5) AS c").collect().head.getDouble(0)
    assert(c == 1.0)
  }
}
