package graft.ops

import graft.{Det, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY §2.2 — projection / filter / predicates / conditionals / casts.
  *
  * Scale notes: all predicates here are simple column comparisons that
  * Catalyst pushes into the parquet scan (`PushedFilters` in explain) and
  * projections prune the read schema — no shuffle except the final sort.
  */
object Filters extends QueryModule {
  import Det._

  val queries: Map[String, Q] = Map(
    // F1: projection, rename, computed columns.
    "f1_project" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(
          col("l_orderkey").as("okey"),
          col("l_linenumber").as("line"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          (col("l_quantity") * lit(2.0)).as("double_qty"),
          concat(col("l_returnflag"), lit("/"), col("l_linestatus")).as("flag_status"))
        .filter(col("okey") < 100)
        // (l_orderkey, l_linenumber) is NOT unique in the testdata —
        // order by the full output row for a deterministic hash
        .orderBy(col("okey"), col("line"), col("revenue"), col("double_qty"), col("flag_status"))
    }),

    // F2: comparison, BETWEEN, IN, LIKE, boolean logic, null checks.
    "f2_filter_predicates" -> ((s, d) => {
      Tables.part(s, d)
        .filter(
          col("p_size").between(10, 20) &&
          col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") &&
          col("p_type").like("%BRASS%") &&
          (col("p_retailprice") > 1200.0 || col("p_retailprice") < 950.0) &&
          col("p_name").isNotNull)
        .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_size"), col("p_retailprice"))
        .orderBy(col("p_partkey"))
    }),

    // F3: CASE WHEN / IF / COALESCE / NULLIF.
    "f3_conditional" -> ((s, d) => {
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          when(col("o_totalprice") > 200000.0, "big")
            .when(col("o_totalprice") > 100000.0, "mid")
            .otherwise("small").as("size_class"),
          expr("if(o_orderstatus = 'F', 'done', 'open')").as("state"),
          coalesce(nullif(col("o_orderstatus"), lit("P")), lit("pending")).as("status_or_pending"),
          nvl2(nullif(col("o_orderpriority"), lit("5-LOW")), lit(1), lit(0)).as("is_prioritized"))
        .filter(col("o_orderkey") < 500)
        .orderBy(col("o_orderkey"))
    }),

    // F4: CAST and TRY_CAST (null on failure — ANSI-safe).
    "f4_cast" -> ((s, d) => {
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          col("o_totalprice").cast("long").as("price_long"),
          col("o_totalprice").cast("string").as("price_str"),
          col("o_orderdate").cast("date").cast("string").as("date_str"),
          expr("try_cast(o_orderstatus AS int)").as("status_as_int"),
          expr("try_cast(substring(o_orderpriority, 1, 1) AS int)").as("prio_num"))
        .filter(col("o_orderkey") < 500)
        .orderBy(col("o_orderkey"))
    }),

    // F5: DISTINCT row dedup.
    "f5_distinct" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_linestatus"))
        .distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // F6: null-safe equality (<=> / IS NOT DISTINCT FROM) — NULL <=> NULL
    // is TRUE, NULL <=> x is FALSE; the join/dedup-safe comparison the
    // three-valued `=` cannot express. Nulls synthesized via NULLIF.
    "f6_null_safe_eq" -> ((s, d) => {
      Tables.orders(s, d).filter(col("o_orderkey") < 500)
        .withColumn("a", nullif(col("o_orderstatus"), lit("P")))
        .withColumn("b", nullif(col("o_orderpriority").substr(1, 1), lit("1")))
        .select(col("o_orderkey"),
          (col("a") <=> col("b")).as("ns_eq"),
          (col("a") <=> lit(null)).as("a_is_null"),
          (col("a") === col("b")).as("three_valued_eq"))
        .orderBy(col("o_orderkey"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "f1_project" ->
      """SELECT l_orderkey AS okey, l_linenumber AS line,
        |  l_extendedprice * (1.0 - l_discount) AS revenue,
        |  l_quantity * 2.0 AS double_qty,
        |  l_returnflag || '/' || l_linestatus AS flag_status
        |FROM lineitem WHERE l_orderkey < 100
        |ORDER BY okey, line, revenue, double_qty, flag_status""".stripMargin,

    "f2_filter_predicates" ->
      """SELECT p_partkey, p_name, p_brand, p_size, p_retailprice
        |FROM part
        |WHERE p_size BETWEEN 10 AND 20
        |  AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
        |  AND p_type LIKE '%BRASS%'
        |  AND (p_retailprice > 1200.0 OR p_retailprice < 950.0)
        |  AND p_name IS NOT NULL
        |ORDER BY p_partkey""".stripMargin,

    "f3_conditional" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 200000.0 THEN 'big'
        |       WHEN o_totalprice > 100000.0 THEN 'mid'
        |       ELSE 'small' END AS size_class,
        |  CASE WHEN o_orderstatus = 'F' THEN 'done' ELSE 'open' END AS state,
        |  COALESCE(NULLIF(o_orderstatus, 'P'), 'pending') AS status_or_pending,
        |  CASE WHEN NULLIF(o_orderpriority, '5-LOW') IS NOT NULL THEN 1 ELSE 0 END AS is_prioritized
        |FROM orders WHERE o_orderkey < 500
        |ORDER BY o_orderkey""".stripMargin,

    "f4_cast" ->
      // NB: Spark double->long truncates toward zero, DuckDB rounds — trunc() first.
      """SELECT o_orderkey,
        |  CAST(trunc(o_totalprice) AS BIGINT) AS price_long,
        |  CAST(o_totalprice AS VARCHAR) AS price_str,
        |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str,
        |  TRY_CAST(o_orderstatus AS INTEGER) AS status_as_int,
        |  TRY_CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS prio_num
        |FROM orders WHERE o_orderkey < 500
        |ORDER BY o_orderkey""".stripMargin,

    "f5_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "f6_null_safe_eq" ->
      """WITH t AS (
        |  SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS a,
        |    NULLIF(substring(o_orderpriority, 1, 1), '1') AS b
        |  FROM orders WHERE o_orderkey < 500)
        |SELECT o_orderkey,
        |  a IS NOT DISTINCT FROM b AS ns_eq,
        |  a IS NOT DISTINCT FROM NULL AS a_is_null,
        |  a = b AS three_valued_eq
        |FROM t ORDER BY o_orderkey""".stripMargin
  )
}
