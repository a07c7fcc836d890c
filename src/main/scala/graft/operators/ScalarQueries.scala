package graft.operators

import graft.{Dec, QueryGroup}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scalar function families (SURVEY.md §2.C ops 29-35). All built-in
  * Catalyst expressions — fully codegen'd, no UDFs.
  *
  * Determinism notes: transcendental double funcs (pow/exp/ln) are NOT
  * bit-stable across engines, so only IEEE-exact ops (sqrt, +-*, abs) and
  * exact decimal rounding (HALF_UP in both engines) appear in oracle-checked
  * outputs. */
object ScalarQueries extends QueryGroup {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // op 29: string functions (the routing regex family, B1)
    "fn_string" -> ((s, dir) => {
      Tables.scan(s, dir, "customer")
        .select(col("c_custkey"),
          upper(col("c_mktsegment")).as("seg_upper"),
          lower(col("c_name")).as("name_lower"),
          length(col("c_name")).cast("long").as("name_len"),
          substring(col("c_name"), 1, 8).as("name_prefix"),
          concat(col("c_mktsegment"), lit("/"), col("c_name")).as("seg_name"),
          regexp_extract(col("c_name"), "Customer#(\\d+)", 1).as("digits"),
          regexp_replace(col("c_name"), "0+", "0").as("squeezed"),
          trim(lit("  x  ")).as("trimmed"),
          col("c_name").like("Customer#%").cast("string").as("is_cust"))
        .orderBy("c_custkey")
    }),

    // op 30: date/time functions (micros mode B6, shipdate arithmetic)
    "fn_datetime" -> ((s, dir) => {
      Tables.scan(s, dir, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mon"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"),
          date_trunc("month", col("o_orderdate")).cast("timestamp_ntz")
            .as("month_start"),
          (col("o_orderdate") + expr("INTERVAL 7 DAYS"))
            .cast("timestamp_ntz").as("plus7"),
          unix_millis(col("o_orderdate").cast("timestamp")).as("epoch_ms"),
          to_date(col("o_orderdate")).as("as_date"))
        .orderBy("o_orderkey")
    }),

    // op 30 continued: calendar ARITHMETIC (fn_datetime covers extracts).
    // The cross-engine trap here is month addition at month ends: modern
    // Spark (proleptic Gregorian, LocalDate.plusMonths) clamps only on
    // overflow (Jan 31 + 1mo = Feb 28) and does NOT snap last-day to
    // last-day — the same rule DuckDB's INTERVAL addition uses, which is
    // what makes this oracle-able. Every output is a DATE or exact
    // integer; no fractional month arithmetic (months_between semantics
    // differ between engines and stays off the graded surface).
    "fn_calendar" -> ((s, dir) => {
      Tables.scan(s, dir, "orders")
        .select(col("o_orderkey"),
          add_months(col("o_orderdate"), 3).as("plus3mo"),
          last_day(col("o_orderdate")).as("month_end"),
          date_trunc("quarter", col("o_orderdate")).cast("date")
            .as("qtr_start"),
          quarter(col("o_orderdate")).cast("long").as("qtr"),
          datediff(to_date(lit("1998-12-31")), col("o_orderdate"))
            .cast("long").as("days_to_ref"),
          dayofweek(col("o_orderdate")).cast("long").as("dow"))
        .orderBy("o_orderkey")
    }),

    // op 31: math / decimal-as-string casts
    "fn_math" -> ((s, dir) => {
      Tables.scan(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          abs(-col("l_quantity")).as("qty_abs"),
          (Dec.d2(col("l_quantity")) * Dec.d2(col("l_quantity")))
            .cast("double").as("qty_sq"),
          sqrt(col("l_extendedprice")).as("price_root"),
          round(Dec.d2(col("l_extendedprice")), 1).cast("double")
            .as("price_round1"),
          floor(col("l_extendedprice")).cast("long").as("price_floor"),
          ceil(col("l_extendedprice")).cast("long").as("price_ceil"),
          greatest(col("l_discount"), col("l_tax")).as("max_rate"),
          (col("l_orderkey") % 7).as("key_mod"),
          // decimal-as-string round trip (the B6 type mode)
          Dec.d2(col("l_extendedprice")).cast("string")
            .cast(DecimalType(12, 2)).cast("double").as("price_roundtrip"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // op 32: JSON — schemaless `props` field extraction (B5 analog)
    "fn_json" -> ((s, dir) => {
      Tables.scan(s, dir, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k").as("k_int"))
        .orderBy("event_id")
    }),

    // op 33: array functions over the embedding column
    "fn_array" -> ((s, dir) => {
      Tables.scan(s, dir, "embeddings")
        .select(col("vec_id"),
          size(col("embedding")).cast("long").as("dim"),
          element_at(col("embedding"), 1).as("e0"),
          array_max(col("embedding")).as("mx"),
          array_min(col("embedding")).as("mn"),
          element_at(slice(col("embedding"), 3, 1), 1).as("e2"))
        .orderBy("vec_id")
    }),

    // op 34: struct/map construction + access (envelope-style nesting)
    "fn_struct_map" -> ((s, dir) => {
      Tables.scan(s, dir, "nation")
        .withColumn("st", struct(col("n_name").as("name"),
          col("n_regionkey").as("rk")))
        .withColumn("mp", map(lit("nk"), col("n_nationkey")))
        .select(col("n_nationkey"),
          col("st").getField("name").as("s_name"),
          col("st").getField("rk").as("s_rk"),
          element_at(col("mp"), "nk").as("m_nk"),
          map_keys(col("mp")).getItem(0).as("m_key"))
        .orderBy("n_nationkey")
    }),

    // op 29b: bitwise — mask/pack/popcount (partition + bucket math at
    // scale is exactly this family)
    "fn_bitwise" -> ((s, dir) => {
      Tables.scan(s, dir, "part")
        .select(col("p_partkey"),
          col("p_partkey").bitwiseAND(255).as("b_and"),
          col("p_partkey").bitwiseOR(4096).as("b_or"),
          col("p_partkey").bitwiseXOR(col("p_size")).as("b_xor"),
          expr("shiftleft(p_partkey, 2)").as("b_shl"),
          expr("shiftright(p_partkey, 1)").as("b_shr"),
          bit_count(col("p_partkey")).as("b_pop"))
        .orderBy("p_partkey")
    }),

    // op 29c: regexp extraction — all matches as arrays (log/text mining)
    "fn_regexp" -> ((s, dir) => {
      Tables.scan(s, dir, "events")
        .filter(col("event_id") < 2000)
        .select(col("event_id"),
          // joined to a string: the driver's pandas compare cannot hash
          // array-typed output columns
          array_join(expr("regexp_extract_all(props, '[0-9]+', 0)"), ",")
            .as("numbers"),
          regexp_extract(col("props"), "\"([a-z_]+)\":", 1).as("first_key"),
          regexp_count(col("props"), lit("\":")).as("n_fields"))
        .orderBy("event_id")
    }),

    // op 31b: ANSI-safe casts — try_cast returns null instead of raising,
    // the ingestion-hardening form for untrusted columns
    "fn_trycast" -> ((s, dir) => {
      Tables.scan(s, dir, "documents")
        .select(col("doc_id"),
          expr("try_cast(substr(text, 1, 3) AS INT)").as("bad_int"),
          expr("try_cast(n_chars AS INT)").as("good_int"),
          expr("try_cast(lang AS DATE)").as("bad_date"))
        .orderBy("doc_id")
    }),

    // op 29d: URL functions — parse canonical parts out of synthesized
    // URLs (log/clickstream enrichment). The URL is constructed from doc
    // columns, so the DuckDB twin states each part by construction and
    // the oracle proves Spark's parse_url extracts exactly them.
    "fn_url" -> ((s, dir) => {
      val url = concat(lit("https://"), col("source"),
        lit(".example.com/"), col("lang"), lit("/doc/"), col("doc_id"),
        lit("?ref="), col("doc_id") % 7)
      Tables.scan(s, dir, "documents")
        .select(col("doc_id"), url.as("url"))
        .select(col("doc_id"), col("url"),
          parse_url(col("url"), lit("HOST")).as("host"),
          parse_url(col("url"), lit("PATH")).as("path"),
          parse_url(col("url"), lit("QUERY")).as("qs"),
          parse_url(col("url"), lit("QUERY"), lit("ref")).as("ref_param"),
          parse_url(col("url"), lit("PROTOCOL")).as("proto"))
        .orderBy("doc_id")
    }),

    // op 29e: deterministic UUIDv-shaped ids from content hashes (stable
    // row ids for dedup/lineage — `uuid()` itself is non-deterministic and
    // ungradable). md5 hex → 8-4-4-4-12, validated by regexp.
    "fn_uuid" -> ((s, dir) => {
      val h = md5(concat(lit("graft:"), col("doc_id")))
      Tables.scan(s, dir, "documents")
        .select(col("doc_id"),
          concat_ws("-",
            substring(h, 1, 8), substring(h, 9, 4), substring(h, 13, 4),
            substring(h, 17, 4), substring(h, 21, 12)).as("uuid"))
        .withColumn("is_uuid",
          col("uuid").rlike(
            "^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$")
            .cast("string"))
        .orderBy("doc_id")
    }),

    // op 35: conditional / null handling (the __deleted rewrite family, B3)
    "fn_conditional" -> ((s, dir) => {
      Tables.scan(s, dir, "customer")
        .select(col("c_custkey"),
          when(col("c_acctbal") < 0, "negative")
            .when(col("c_acctbal") < 5000, "low")
            .otherwise("high").as("tier"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("NONE"))
            .as("seg_or_none"),
          nvl(nullif(col("c_nationkey"), lit(0)), lit(-1)).as("nk_or_neg"),
          (col("c_acctbal") <=> col("c_acctbal")).cast("string").as("self_eq"))
        .orderBy("c_custkey")
    }))

  val oracles: Map[String, String] = Map(
    "fn_string" ->
      """SELECT c_custkey,
        |  upper(c_mktsegment) AS seg_upper,
        |  lower(c_name) AS name_lower,
        |  length(c_name) AS name_len,
        |  substr(c_name, 1, 8) AS name_prefix,
        |  concat(c_mktsegment, '/', c_name) AS seg_name,
        |  regexp_extract(c_name, 'Customer#(\d+)', 1) AS digits,
        |  regexp_replace(c_name, '0+', '0', 'g') AS squeezed,
        |  trim('  x  ') AS trimmed,
        |  CAST(c_name LIKE 'Customer#%' AS VARCHAR) AS is_cust
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "fn_datetime" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS yr,
        |  month(o_orderdate) AS mon,
        |  day(o_orderdate) AS dom,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  o_orderdate + INTERVAL 7 DAY AS plus7,
        |  epoch_ms(o_orderdate) AS epoch_ms,
        |  CAST(o_orderdate AS DATE) AS as_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "fn_calendar" ->
      """SELECT o_orderkey,
        |  CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3mo,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |  CAST(date_trunc('quarter', o_orderdate) AS DATE) AS qtr_start,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31')
        |    AS BIGINT) AS days_to_ref,
        |  CAST(date_part('dow', o_orderdate) + 1 AS BIGINT) AS dow
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "fn_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  abs(-l_quantity) AS qty_abs,
        |  CAST(CAST(l_quantity AS DECIMAL(12,2))
        |     * CAST(l_quantity AS DECIMAL(12,2)) AS DOUBLE) AS qty_sq,
        |  sqrt(l_extendedprice) AS price_root,
        |  CAST(ROUND(CAST(l_extendedprice AS DECIMAL(12,2)), 1) AS DOUBLE)
        |    AS price_round1,
        |  CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
        |  CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
        |  GREATEST(l_discount, l_tax) AS max_rate,
        |  l_orderkey % 7 AS key_mod,
        |  CAST(CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR)
        |     AS DECIMAL(12,2)) AS DOUBLE) AS price_roundtrip
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "fn_json" ->
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract(props, '$.k') AS INTEGER) AS k_int
        |FROM events ORDER BY event_id""".stripMargin,

    "fn_array" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS BIGINT) AS dim,
        |  embedding[1] AS e0,
        |  list_aggregate(embedding, 'max') AS mx,
        |  list_aggregate(embedding, 'min') AS mn,
        |  embedding[3] AS e2
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "fn_struct_map" ->
      """SELECT n_nationkey,
        |  n_name AS s_name,
        |  n_regionkey AS s_rk,
        |  n_nationkey AS m_nk,
        |  'nk' AS m_key
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    "fn_regexp" ->
      """SELECT event_id,
        |  array_to_string(regexp_extract_all(props, '[0-9]+'), ',')
        |    AS numbers,
        |  regexp_extract(props, '"([a-z_]+)":', 1) AS first_key,
        |  CAST(len(regexp_extract_all(props, '":')) AS INT) AS n_fields
        |FROM events WHERE event_id < 2000
        |ORDER BY event_id""".stripMargin,

    "fn_trycast" ->
      """SELECT doc_id,
        |  try_cast(substr(text, 1, 3) AS INT) AS bad_int,
        |  try_cast(n_chars AS INT) AS good_int,
        |  try_cast(lang AS DATE) AS bad_date
        |FROM documents ORDER BY doc_id""".stripMargin,

    "fn_bitwise" ->
      """SELECT p_partkey,
        |  p_partkey & 255 AS b_and,
        |  p_partkey | 4096 AS b_or,
        |  xor(p_partkey, p_size) AS b_xor,
        |  p_partkey << 2 AS b_shl,
        |  p_partkey >> 1 AS b_shr,
        |  CAST(bit_count(p_partkey) AS INT) AS b_pop
        |FROM part ORDER BY p_partkey""".stripMargin,

    "fn_conditional" ->
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN 'negative'
        |       WHEN c_acctbal < 5000 THEN 'low'
        |       ELSE 'high' END AS tier,
        |  COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'NONE') AS seg_or_none,
        |  COALESCE(NULLIF(c_nationkey, 0), -1) AS nk_or_neg,
        |  CAST(c_acctbal IS NOT DISTINCT FROM c_acctbal AS VARCHAR) AS self_eq
        |FROM customer ORDER BY c_custkey""".stripMargin,

    // the URL is built from columns, so every part is stated by
    // construction — the oracle checks Spark's parser against the ground
    // truth rather than reimplementing URL parsing in SQL
    "fn_url" ->
      """SELECT doc_id,
        |  'https://' || source || '.example.com/' || lang || '/doc/' ||
        |    doc_id || '?ref=' || (doc_id % 7) AS url,
        |  source || '.example.com' AS host,
        |  '/' || lang || '/doc/' || doc_id AS path,
        |  'ref=' || (doc_id % 7) AS qs,
        |  CAST(doc_id % 7 AS VARCHAR) AS ref_param,
        |  'https' AS proto
        |FROM documents ORDER BY doc_id""".stripMargin,

    "fn_uuid" ->
      """WITH h AS (SELECT doc_id, md5('graft:' || doc_id) AS x
        |  FROM documents)
        |SELECT doc_id,
        |  substr(x, 1, 8) || '-' || substr(x, 9, 4) || '-' ||
        |    substr(x, 13, 4) || '-' || substr(x, 17, 4) || '-' ||
        |    substr(x, 21, 12) AS uuid,
        |  CAST(regexp_matches(
        |    substr(x, 1, 8) || '-' || substr(x, 9, 4) || '-' ||
        |      substr(x, 13, 4) || '-' || substr(x, 17, 4) || '-' ||
        |      substr(x, 21, 12),
        |    '^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$')
        |    AS VARCHAR) AS is_uuid
        |FROM h ORDER BY doc_id""".stripMargin)
}
