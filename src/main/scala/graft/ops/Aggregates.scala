package graft.ops

import graft.{Det, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY §2.4 — aggregation operators.
  *
  * Scale notes: every groupBy here hash-aggregates with map-side partial
  * aggregation (Spark plans partial+final HashAggregate automatically,
  * §2.4 A10); low-cardinality group keys mean the post-partial shuffle
  * carries only #groups × #partitions rows — safe at 100 TB. Statistical
  * moments (A6) merge per-partition (count, mean, M2) states, percentiles
  * (A7) merge per-partition sketches/sorted runs — no row concentration.
  */
object Aggregates extends QueryModule {
  import Det._

  /** A1 / flagship: TPC-H Q1 pricing summary. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    l.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val queries: Map[String, Q] = Map(
    "a1_pricing_summary" -> (q1PricingSummary _),

    // A2: COUNT(DISTINCT x) + multi-distinct in one aggregation.
    "a2_count_distinct" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(
          countDistinct(col("user_id")).as("n_users"),
          countDistinct(col("user_id"), col("event_id")).as("n_user_events"),
          count(lit(1)).as("n_events"))
        .orderBy(col("event_type"))
    }),

    // A3: approx distinct (HLL) — no oracle (approx); rows-only + unit test.
    "a3_approx_distinct" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
        .orderBy(col("event_type"))
    }),

    // A4: filtered aggregation (FILTER (WHERE ...)).
    "a4_filtered_agg" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_linestatus"))
        .agg(
          count(when(col("l_returnflag") === "R", 1)).as("n_returned"),
          dsum(when(col("l_returnflag") === "R", col("l_quantity")).otherwise(lit(0.0))).as("qty_returned"),
          count(when(col("l_discount") > 0.05, 1)).as("n_discounted"))
        .orderBy(col("l_linestatus"))
    }),

    // A5a: ROLLUP with GROUPING() marker for deterministic null handling.
    "a5_rollup" -> ((s, d) => {
      Tables.orders(s, d)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"),
          grouping_id().as("gid"))
        .orderBy(col("gid"), col("o_orderstatus"), col("o_orderpriority"))
    }),

    // A5b: CUBE.
    "a5_cube" -> ((s, d) => {
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
        .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))
    }),

    // A5c: GROUPING SETS via SQL.
    "a5_grouping_sets" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql(
        """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
          |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
          |  CAST(grouping(o_orderpriority) AS INT) AS g_prio
          |FROM orders
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority""".stripMargin)
    }),

    // A6: statistical moments — round computed stats (error ~1e-12 rel,
    // rounding at 6dp is 6+ orders of magnitude away from the noise).
    "a6_stats" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          round(var_samp(col("l_quantity")), 6).as("var_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
          round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("covar_qty_disc"))
        .orderBy(col("l_returnflag"))
    }),

    // A7a: exact percentiles (interpolating, MEDIAN-style).
    "a7_percentile" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
          round(expr("percentile(o_totalprice, 0.99)"), 4).as("p99"))
        .orderBy(col("o_orderstatus"))
    }),

    // A7b: approx percentile — no oracle (approx); rows-only + unit test.
    "a7_approx_percentile" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(expr("approx_percentile(o_totalprice, array(0.5, 0.9), 1000)").as("approx_p"))
        .orderBy(col("o_orderstatus"))
    }),

    // A8: collect_list/collect_set (array_agg) — sorted for determinism.
    "a8_collect" -> ((s, d) => {
      Tables.lineitem(s, d).filter(col("l_orderkey") < 50)
        .groupBy(col("l_orderkey"))
        .agg(
          array_sort(collect_list(col("l_linenumber"))).as("lines"),
          array_sort(collect_set(col("l_returnflag"))).as("flags"))
        .orderBy(col("l_orderkey"))
    }),

    // A11: map_agg (Presto) — emitted as a sorted entry list so the
    // result is order-deterministic and arrow-comparable on both engines.
    "a11_map_agg" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(array_sort(collect_list(struct(
          col("event_type").as("k"), col("event_id").as("v")))).as("entries"))
        .filter(col("user_id") < 20)
        .select(col("user_id"), expr("slice(entries, 1, 3)").as("first3"))
        .orderBy(col("user_id"))
    }),

    // A9: min_by / max_by (argmin/argmax).
    "a9_min_max_by" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(
          max_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey"))).as("max_price_okey"),
          min_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey"))).as("min_price_okey"),
          max(col("o_totalprice")).as("max_price"),
          min(col("o_totalprice")).as("min_price"))
        .orderBy(col("o_orderstatus"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "a1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsumSql("l_quantity")} AS sum_qty,
         |  ${dsumSql("l_extendedprice")} AS sum_base_price,
         |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         |  ${dsumSql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
         |  ${davgSql("l_quantity")} AS avg_qty,
         |  ${davgSql("l_extendedprice")} AS avg_price,
         |  ${davgSql("l_discount")} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "a2_count_distinct" ->
      """SELECT event_type,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  COUNT(DISTINCT (user_id, event_id)) AS n_user_events,
        |  COUNT(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "a4_filtered_agg" ->
      s"""SELECT l_linestatus,
         |  COUNT(*) FILTER (WHERE l_returnflag = 'R') AS n_returned,
         |  ${dsumSql("CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0.0 END")} AS qty_returned,
         |  COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted
         |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "a5_rollup" ->
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
         |  ${dsumSql("o_totalprice")} AS total,
         |  CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid
         |FROM orders
         |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
         |ORDER BY gid, o_orderstatus, o_orderpriority""".stripMargin,

    "a5_cube" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,

    "a5_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
        |  CAST(grouping(o_orderpriority) AS INT) AS g_prio
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority""".stripMargin,

    "a6_stats" ->
      """SELECT l_returnflag,
        |  ROUND(stddev_samp(l_quantity), 6) AS sd_qty,
        |  ROUND(var_samp(l_quantity), 6) AS var_qty,
        |  ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        |  ROUND(covar_samp(l_quantity, l_discount), 6) AS covar_qty_disc
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "a7_percentile" ->
      """SELECT o_orderstatus,
        |  ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |  ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
        |  ROUND(quantile_cont(o_totalprice, 0.99), 4) AS p99
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "a8_collect" ->
      """SELECT l_orderkey,
        |  list_sort(list(l_linenumber)) AS lines,
        |  list_sort(list(DISTINCT l_returnflag)) AS flags
        |FROM lineitem WHERE l_orderkey < 50
        |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,

    "a11_map_agg" ->
      """SELECT user_id,
        |  list_sort(list(struct_pack(k := event_type, v := event_id)))[1:3] AS first3
        |FROM events WHERE user_id < 20
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "a11_map_agg" ->
      """SELECT user_id,
        |  list_sort(list(struct_pack(k := event_type, v := event_id)))[1:3] AS first3
        |FROM events WHERE user_id < 20
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "a9_min_max_by" ->
      // DuckDB arg_max can't order by a struct — emulate the lexicographic
      // (price, orderkey) tie-break with window ranks.
      """WITH r AS (
        |  SELECT o_orderstatus, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderstatus
        |                       ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
        |    row_number() OVER (PARTITION BY o_orderstatus
        |                       ORDER BY o_totalprice ASC, o_orderkey ASC) AS rmin
        |  FROM orders)
        |SELECT o_orderstatus,
        |  MAX(CASE WHEN rmax = 1 THEN o_orderkey END) AS max_price_okey,
        |  MAX(CASE WHEN rmin = 1 THEN o_orderkey END) AS min_price_okey,
        |  MAX(o_totalprice) AS max_price,
        |  MIN(o_totalprice) AS min_price
        |FROM r GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
  )
}
