package graft.ops

import graft.{Det, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SURVEY §2.3 — join operators.
  *
  * Scale notes:
  * - Dimension tables (region/nation/supplier/part at TPC-H ratios) are
  *   explicitly `broadcast()` so the big fact side never shuffles for them;
  *   at 100 TB only genuinely large-large joins (orders⋈lineitem) shuffle,
  *   and those hash-partition both sides on the join key.
  * - The range join (J7) keeps an equi component (user_id) so Spark plans
  *   a hash/sort-merge join with the range as residual — never a BNLJ.
  * - The as-of join (J8) is join + per-key top-1 (window) — shuffle is
  *   bounded by matches; at 100 TB a sort-merge + last-value formulation
  *   over bucketed tables avoids re-sorting.
  */
object Joins extends QueryModule {
  import Det._

  // j11 setup cache: sf-dir whose graft_cbo tables are already built +
  // ANALYZE'd. Keyed by SparkContext, not SparkSession — the tables are
  // catalog state shared by every session of the context (a per-session
  // key would make a sibling session DROP tables a peer is reading).
  private val cboBuilt =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[org.apache.spark.SparkContext, String]())

  val queries: Map[String, Q] = Map(
    // J1: inner equi-join, orders ⋈ customer (big⋈small — broadcast dim).
    "j1_inner" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "inner")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("c_mktsegment"))
    }),

    // J2: left outer join with unmatched rows (customers without big orders).
    "j2_left_outer" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val big = Tables.orders(s, d).filter(col("o_totalprice") > 400000.0)
      c.join(big, c("c_custkey") === big("o_custkey"), "left")
        .groupBy(col("c_nationkey"))
        .agg(
          count(lit(1)).as("n_rows"),
          count(col("o_orderkey")).as("n_big_orders"),
          sum(when(col("o_orderkey").isNull, 1).otherwise(0)).as("n_null_rows"))
        .orderBy(col("c_nationkey"))
    }),

    // J2b: full outer join of two filtered sides with non-overlap.
    "j2b_full_outer" -> ((s, d) => {
      val lo = Tables.orders(s, d).filter(col("o_totalprice") < 20000.0)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_small"))
      val hi = Tables.orders(s, d).filter(col("o_totalprice") > 450000.0)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_big"))
      // using-column full join already coalesces the key into one column
      lo.join(hi, Seq("o_custkey"), "full")
        .select(
          col("o_custkey").as("custkey"),
          coalesce(col("n_small"), lit(0L)).as("n_small"),
          coalesce(col("n_big"), lit(0L)).as("n_big"))
        .orderBy(col("custkey"))
    }),

    // J2c: right outer join (dim side right of the fact).
    "j2c_right_outer" -> ((s, d) => {
      val big = Tables.orders(s, d).filter(col("o_totalprice") > 400000.0)
      val c = Tables.customer(s, d)
      big.join(c, big("o_custkey") === c("c_custkey"), "right")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_rows"), count(col("o_orderkey")).as("n_big_orders"))
        .orderBy(col("c_nationkey"))
    }),

    // J3: left semi join (EXISTS / IN).
    "j3_semi" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val urgent = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
      c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),

    // J4: left anti join (NOT EXISTS — NOT IN has different null semantics).
    "j4_anti" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val urgent = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
      c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(col("c_custkey"))
    }),

    // J5: explicit broadcast join (same answer as shuffle join; plan differs).
    "j5_broadcast" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      val p = Tables.part(s, d).filter(col("p_size") <= 10)
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("p_brand"))
    }),

    // J6: cross join (small × small).
    "j6_cross" -> ((s, d) => {
      val r = Tables.region(s, d).select(col("r_regionkey"), col("r_name"))
      val n = Tables.nation(s, d).select(col("n_nationkey"), col("n_regionkey"))
      r.crossJoin(n)
        .select(col("r_regionkey"), col("n_nationkey"),
          (col("r_regionkey") === col("n_regionkey")).as("is_home"))
        .orderBy(col("r_regionkey"), col("n_nationkey"))
    }),

    // J7: range join with equi component — event pairs within 5 minutes for
    // the same user (hash join on user_id, range as residual predicate).
    "j7_range" -> ((s, d) => {
      // fanOut by the join key: the user_id exchanges feeding the range
      // join carry ~2 MB, so AQE coalesces the join to ONE partition
      // while its within-5-min pair OUTPUT expands well beyond the input
      // (628 ms 1-task merge stage, r17 profile). Pinning hash(user_id)
      // partitioning here satisfies the join's clustering requirement —
      // no extra Exchange, full parallelism; no-op at scale.
      val e = Par.fanOut(Tables.events(s, d), col("user_id"))
      val a = e.select(col("event_id").as("a_id"), col("user_id"), col("ts").as("a_ts"))
      val b = e.select(col("event_id").as("b_id"), col("user_id").as("b_user"), col("ts").as("b_ts"))
      a.join(b,
          col("user_id") === col("b_user") &&
          col("a_id") < col("b_id") &&
          col("b_ts") >= col("a_ts") &&
          col("b_ts") <= col("a_ts") + expr("INTERVAL 5 MINUTES"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("user_id"))
    }),

    // J8: as-of join — for each event, the latest order of the same
    // customer with o_orderdate <= ts. Scale formulation: pre-reduce the
    // right side to one row per (custkey, date) — max orderkey, matching
    // the (date DESC, orderkey DESC) tie-break — then take the lexicographic
    // max struct per event with a partial-aggregating groupBy instead of a
    // full window sort over all matches.
    "j8_asof" -> ((s, d) => {
      val e = Tables.events(s, d).filter(col("event_id") < 1000)
        .select(col("event_id"), col("user_id"), col("ts"))
      val oRed = Tables.orders(s, d)
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"))
      e.join(oRed,
          col("user_id") === col("o_custkey") && col("o_orderdate") <= col("ts"), "left")
        .groupBy(col("event_id"), col("user_id"))
        .agg(max(struct(col("o_orderdate"), col("o_orderkey"))).as("m"))
        .select(col("event_id"), col("user_id"),
          col("m.o_orderkey").as("asof_orderkey"),
          col("m.o_orderdate").as("asof_orderdate"))
        .orderBy(col("event_id"))
    }),

    // J8b: merge-asof formulation of the same as-of join — LINEAR at scale.
    // Union order rows (kind=0) and event rows (kind=1) tagged, shuffle once
    // on user_id, and one running `last(..., ignoreNulls)` window carries the
    // latest order forward to each event. No row expansion: unlike J8's
    // range join (each event × all prior (custkey,day) orders before the
    // aggregate), cost is O(n log n) sort per user regardless of history
    // depth. kind=0 sorts before kind=1 at equal ts, matching `<=` asof.
    // J8c: the same as-of join through the OWNED physical operator
    // (plans/AsOfJoin.scala — LogicalPlan + Strategy + merge SparkPlan):
    // one shuffle per side on the by key, in-partition sort, linear merge.
    // Same answer as j8/j8b; the plan has no range-expansion join and no
    // window over the unioned stream.
    "j8c_asof_custom" -> ((s, d) => {
      val e = Tables.events(s, d).filter(col("event_id") < 1000)
        .select(col("event_id"), col("user_id"), col("ts"))
      val oRed = Tables.orders(s, d)
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"))
      graft.plans.AsOfJoin.asof(s, e, oRed,
          leftBy = "user_id", rightBy = "o_custkey",
          leftTs = "ts", rightTs = "o_orderdate")
        .select(col("event_id"), col("user_id"),
          col("o_orderkey").as("asof_orderkey"),
          col("o_orderdate").as("asof_orderdate"))
        .orderBy(col("event_id"))
    }),

    // J8d: FORWARD as-of through the owned operator — per event, the
    // FIRST order of that customer on/after the event (merge_asof
    // direction='forward': lead-time attribution, next-restock lookup).
    // Same single-shuffle merge plan as j8c, mirrored comparison.
    "j8d_asof_forward" -> ((s, d) => {
      val e = Tables.events(s, d).filter(col("event_id") < 1000)
        .select(col("event_id"), col("user_id"), col("ts"))
      val oRed = Tables.orders(s, d)
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"))
      graft.plans.AsOfJoin.asof(s, e, oRed,
          leftBy = "user_id", rightBy = "o_custkey",
          leftTs = "ts", rightTs = "o_orderdate", direction = "forward")
        .select(col("event_id"), col("user_id"),
          col("o_orderkey").as("next_orderkey"),
          col("o_orderdate").as("next_orderdate"))
        .orderBy(col("event_id"))
    }),

    "j8b_asof_union" -> ((s, d) => {
      val e = Tables.events(s, d).filter(col("event_id") < 1000)
        .select(col("user_id"), col("ts"), lit(1).as("kind"), col("event_id"),
          lit(null).cast("long").as("o_orderkey"),
          // NTZ to match the parquet-read o_orderdate type — an LTZ null
          // here would coerce the whole union column and change the schema
          lit(null).cast("timestamp_ntz").as("o_orderdate"))
      // pre-reduce: one row per (custkey, day), max orderkey = the
      // (date DESC, orderkey DESC) tie-break winner
      val oRed = Tables.orders(s, d)
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"))
        .select(col("o_custkey").as("user_id"), col("o_orderdate").as("ts"),
          lit(0).as("kind"), lit(null).cast("long").as("event_id"),
          col("o_orderkey"), col("o_orderdate"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("kind"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.unionByName(oRed)
        .select(col("user_id"), col("kind"), col("event_id"),
          last(col("o_orderkey"), ignoreNulls = true).over(w).as("asof_orderkey"),
          last(col("o_orderdate"), ignoreNulls = true).over(w).as("asof_orderdate"))
        .filter(col("kind") === 1)
        .select(col("event_id"), col("user_id"),
          col("asof_orderkey"), col("asof_orderdate"))
        .orderBy(col("event_id"))
    }),

    // J9: six-table star join (TPC-H Q5 shape) — dims broadcast.
    // J10: eager aggregation below a join — the Presto-CBO rewrite
    // (partial aggregation pushdown) written explicitly: lineitem reduces
    // to per-orderkey partials BEFORE joining orders, so the join input
    // shrinks from |lineitem| to |orders| rows. At 100 TB this is the
    // difference between shuffling the fact table and shuffling one row
    // per order — the single most valuable manual rewrite in warehouse
    // ETL when the optimizer doesn't do it for you.
    "j10_preagg_join" -> ((s, d) => {
      val li = Tables.lineitem(s, d).groupBy(col("l_orderkey"))
        .agg(dsum(col("l_extendedprice")).as("rev"),
          count(lit(1)).as("n_items"))
      Tables.orders(s, d)
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("rev")).as("rev"),
          sum(col("n_items")).as("n_items"))
        .orderBy(col("o_orderpriority"))
    }),

    // J11: stats-driven join reordering (the ANALYZE TABLE surface —
    // VERDICT r2 missing item 6, declared-query form of CboSpec).
    // Managed tables live in a scratch-located database (the session's
    // default warehouse dir must stay untouched); ANALYZE TABLE writes
    // rowCount/NDV into the catalog, and with CBO + joinReorder enabled
    // the optimizer re-orders the deliberately fact-first join text below
    // using those stats. Result is oracle-checked; the plan-level reorder
    // evidence (estimated rowCount propagation, shrunken join cardinality)
    // is asserted in CboSpec. At 100 TB this is the difference between
    // shuffling the fact table against an unfiltered dimension and
    // broadcast-pruning it first.
    // the whole body is serialized per process: the setup is
    // check-then-act on cboBuilt, and the CBO flags are session-global
    // conf mutated around planning — a concurrent second invocation
    // could otherwise double-create tables or capture the in-flight
    // 'true' as the restore value
    "j11_cbo_reorder" -> ((s, d) => cboBuilt.synchronized {
      // table setup is idempotent per (session, sf-dir): repeated bench
      // reps re-plan the join (the part under test) without re-writing
      // and re-ANALYZE-ing the inputs every rep
      if (cboBuilt.get(s.sparkContext) != d) {
        val loc = Sources.scratch("graft_cbodb")
        s.sql(s"CREATE DATABASE IF NOT EXISTS graft_cbo LOCATION '$loc'")
        Seq("ord", "cust", "nat").foreach(t =>
          s.sql(s"DROP TABLE IF EXISTS graft_cbo.$t"))
        Tables.orders(s, d).write.saveAsTable("graft_cbo.ord")
        Tables.customer(s, d).write.saveAsTable("graft_cbo.cust")
        Tables.nation(s, d).write.saveAsTable("graft_cbo.nat")
        Seq("ord", "cust", "nat").foreach(t =>
          s.sql(s"ANALYZE TABLE graft_cbo.$t COMPUTE STATISTICS"))
        s.sql("ANALYZE TABLE graft_cbo.ord COMPUTE STATISTICS FOR COLUMNS o_custkey")
        s.sql("ANALYZE TABLE graft_cbo.cust COMPUTE STATISTICS FOR COLUMNS c_custkey, c_nationkey")
        s.sql("ANALYZE TABLE graft_cbo.nat COMPUTE STATISTICS FOR COLUMNS n_nationkey, n_name")
        cboBuilt.put(s.sparkContext, d)
      }
      val prev = (s.conf.get("spark.sql.cbo.enabled", "false"),
        s.conf.get("spark.sql.cbo.joinReorder.enabled", "false"))
      s.conf.set("spark.sql.cbo.enabled", "true")
      s.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      try
        // localCheckpoint is EAGER: the join is planned and executed while
        // the CBO flags are on; lazily returning the raw frame would defer
        // planning past the finally-restore below
        s.sql(
          s"""SELECT c_mktsegment, COUNT(*) AS n, ${Det.dsumSql("o_totalprice")} AS total
             |FROM graft_cbo.ord
             |JOIN graft_cbo.cust ON o_custkey = c_custkey
             |JOIN graft_cbo.nat ON c_nationkey = n_nationkey
             |WHERE n_name = 'NATION_3'
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
          .localCheckpoint()
      finally {
        s.conf.set("spark.sql.cbo.enabled", prev._1)
        s.conf.set("spark.sql.cbo.joinReorder.enabled", prev._2)
      }
    }: DataFrame),

    "j9_star" -> ((s, d) => {
      val r = broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA"))
      val n = broadcast(Tables.nation(s, d))
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val l = Tables.lineitem(s, d)
      val su = broadcast(Tables.supplier(s, d))
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .join(su, l("l_suppkey") === su("s_suppkey") &&
                  c("c_nationkey") === su("s_nationkey"))
        .join(n, su("s_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // J12: geo distance join (ST_DWithin shape) — all point pairs within
    // R km, bucketed by GRID CELLS so candidate generation is an
    // equi-join on cell ids, never an all-pairs product (the spatial
    // analogue of LSH banding). Cell sizes are chosen so any pair within
    // R spans at most adjacent cells (lat: R ≤ 111.19·Δφ ⇒ Δφ ≤ 2.698° <
    // 2.75°; lon at |φ| ≤ 59.75°: haversine algebra gives Δλ ≤ 5.356° <
    // 5.4°), one side explodes to its 3×3 neighborhood and the other
    // stays in its home cell — every qualifying pair meets EXACTLY once
    // (at the right side's home cell), so no distinct is needed. Exact
    // haversine runs only on cell-collision candidates as the join
    // residual. Synthesized lon stays in [-149.5, 149.5], so no pair
    // straddles the antimeridian; a production grid closes the wrap by
    // taking lon cell indices modulo the cell count. The DuckDB oracle is
    // the BRUTE-FORCE pair join (IEJoin on a lat band + full haversine),
    // so the bucketing's completeness is oracle-verified, not assumed.
    "j12_geo_distance_join" -> ((s, d) => {
      import graft.functions.GeoFunctions._
      val cellLat = 2.75
      val cellLon = 5.4
      val pts = Tables.customer(s, d)
        .select(col("c_custkey"),
          (col("c_custkey") % 120 - 60 + lit(0.25)).as("lat"),
          (col("c_custkey") * 7 % 300 - 150 + lit(0.5)).as("lon"))
        .withColumn("ci", floor(col("lat") / cellLat).cast("int"))
        .withColumn("cj", floor(col("lon") / cellLon).cast("int"))
      val offsets = array((for (di <- -1 to 1; dj <- -1 to 1)
        yield struct(lit(di).as("di"), lit(dj).as("dj"))): _*)
      val a = pts.select(col("c_custkey").as("key_a"),
          col("lat").as("lat_a"), col("lon").as("lon_a"),
          explode(offsets).as("o"), col("ci"), col("cj"))
        .select(col("key_a"), col("lat_a"), col("lon_a"),
          (col("ci") + col("o.di")).as("ci"), (col("cj") + col("o.dj")).as("cj"))
      val b = pts.select(col("c_custkey").as("key_b"),
        col("lat").as("lat_b"), col("lon").as("lon_b"), col("ci"), col("cj"))
      a.join(b, Seq("ci", "cj"))
        .filter(col("key_a") < col("key_b"))
        .withColumn("d_km", haversineKm(col("lat_a"), col("lon_a"),
          col("lat_b"), col("lon_b")))
        .filter(col("d_km") <= 300.0)
        .select(col("key_a"), col("key_b"),
          floor(col("d_km") * 1e6 + 0.5).cast("long").as("dist_q6"))
        .orderBy(col("key_a"), col("key_b"))
    }),

    // J13: polygon containment join (geometry v2, r4 verdict missing
    // #4): WKT diamond polygons synthesized from nation, points from
    // customer; candidate pairs by grid cell (each polygon replicated to
    // the cells its bbox covers, each point hashed to ONE cell — a pair
    // meets at most once, no dedup needed), exact ray-cast st_contains
    // on candidates only. The polygon side is tiny → broadcast; the
    // point side never shuffles. The DuckDB oracle re-derives
    // containment from the diamond's closed form |dx|+|dy| < r — an
    // INDEPENDENT check that the WKT parse + ray cast + bucketing lose
    // no pair (data synthesized with a >=0.45 margin from every edge so
    // both predicates agree exactly).
    "j13_polygon_join" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      import graft.functions.{GraftFunctions => GF}
      val cell = 8.0
      def dstr(c: org.apache.spark.sql.Column) = c.cast("string")
      val polys = Tables.nation(s, d).select(
          col("n_nationkey"),
          (col("n_nationkey") % 11 - 5).cast("double").as("cy"),
          (col("n_nationkey") * 13 % 140 - 70).cast("double").as("cx"),
          ((col("n_nationkey") % 5).cast("double") + lit(3.3)).as("r"))
        .withColumn("wkt", concat(
          lit("POLYGON (("),
          dstr(col("cx") + col("r")), lit(" "), dstr(col("cy")), lit(", "),
          dstr(col("cx")), lit(" "), dstr(col("cy") + col("r")), lit(", "),
          dstr(col("cx") - col("r")), lit(" "), dstr(col("cy")), lit(", "),
          dstr(col("cx")), lit(" "), dstr(col("cy") - col("r")), lit(", "),
          dstr(col("cx") + col("r")), lit(" "), dstr(col("cy")), lit("))")))
        .withColumn("ci", explode(sequence(
          floor((col("cx") - col("r")) / cell).cast("int"),
          floor((col("cx") + col("r")) / cell).cast("int"))))
        .withColumn("cj", explode(sequence(
          floor((col("cy") - col("r")) / cell).cast("int"),
          floor((col("cy") + col("r")) / cell).cast("int"))))
        .select(col("n_nationkey"), col("wkt"), col("ci"), col("cj"))
      val pts = Tables.customer(s, d)
        .select(col("c_custkey"),
          (col("c_custkey") % 120 - 60 + lit(0.25)).as("lat"),
          (col("c_custkey") * 7 % 300 - 150 + lit(0.5)).as("lon"))
        .withColumn("ci", floor(col("lon") / cell).cast("int"))
        .withColumn("cj", floor(col("lat") / cell).cast("int"))
      pts.join(broadcast(polys), Seq("ci", "cj"))
        .filter(GF.stContains(col("wkt"), col("lon"), col("lat")))
        .groupBy(col("n_nationkey"))
        .agg(count(lit(1)).as("n_inside"),
          sum(col("c_custkey")).as("sum_keys"))
        .orderBy(col("n_nationkey"))
    }),

    // J14: BINNED pure-range join — the interval-overlap join with NO
    // equi key at all ("count lineitems shipped inside each order's
    // 7-day window", any order, any lineitem). Declared naively this is
    // a BroadcastNestedLoopJoin — every point against every interval,
    // the quadratic plan that dies first at scale. The binning rewrite
    // (the classic range-join optimization) makes it an EQUI hash join:
    // time splits into 7-day bins, each interval replicates to the ≤2
    // bins it overlaps, each point hashes to its ONE bin, candidates
    // meet only within a bin and the exact range predicate runs as the
    // join residual. An interval meets a point in at most one shared
    // bin here (interval length = bin width), so no pair-dedup is
    // needed. ScaleShapeSpec pins the shape: hash join on the bin key,
    // no BNLJ/cartesian anywhere. LEFT semantics (orders with an empty
    // window keep n=0) come from joining counts back to the interval
    // side rather than left-replicating intervals through the explode.
    "j14_binned_range_join" -> ((s, d) => {
      val binDays = 7L
      def binOf(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        floor(datediff(c.cast("date"), lit("1970-01-01").cast("date"))
          / binDays).cast("long")
      val orders = Tables.orders(s, d)
        .filter(col("o_orderkey") < 1000)
        .select(col("o_orderkey"), col("o_orderdate"))
      val ranges = orders
        .withColumn("b", explode(array(binOf(col("o_orderdate")),
          binOf(col("o_orderdate") + expr("INTERVAL 6 DAYS")))))
        .distinct() // the two covered bins may coincide
      val points = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_shipdate"))
        .withColumn("b", binOf(col("l_shipdate")))
      val counts = ranges.join(points, "b")
        .filter(col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 7 DAYS"))
        .groupBy(col("o_orderkey")).agg(count(lit(1)).as("n"))
      orders.join(counts, Seq("o_orderkey"), "left")
        .select(col("o_orderkey"),
          coalesce(col("n"), lit(0L)).as("n_in_window"))
        .orderBy(col("o_orderkey"))
    }),

    // J17: BLOCKED FUZZY JOIN — the entity-resolution primitive: match
    // left names to typo-perturbed right names (a deterministic
    // one-char deletion in the second word) at edit distance ≤ 2,
    // with candidate generation by BLOCKING keys (first word +
    // second-word initial) — the standard ER design that turns the
    // quadratic all-pairs compare into equi-join-sized blocks.
    // Blocking is PART of the declared semantics (the oracle declares
    // the same blocked join): it deliberately trades recall at the
    // block boundary — e.g. 'cold'/'old' are themselves edit distance
    // 1, so a cross-first-word match is out of scope by design, exactly
    // as production blocking ER documents. At 100 TB the block key is
    // the shuffle key and block sizes bound the per-task compare count;
    // skewed blocks get a second key character, the l2-band argument.
    "j17_fuzzy_join" -> ((s, d) => {
      val parts = Tables.part(s, d).select(col("p_partkey"), col("p_name"))
      val left = parts
        .filter(col("p_partkey") % 5 === 0 && col("p_partkey") < 2000)
      val right = parts.filter(col("p_partkey") % 5 =!= 0)
        .select(col("p_partkey").as("r_key"),
          concat(expr("split(p_name, ' ')[0]"), lit(" "),
            expr("substring(split(p_name, ' ')[1], 1, 1)"),
            expr("substring(split(p_name, ' ')[1], 3)")).as("r_name"))
      val lb = left
        .withColumn("w0", expr("split(p_name, ' ')[0]"))
        .withColumn("c1", expr("substring(split(p_name, ' ')[1], 1, 1)"))
      val rb = right
        .withColumn("w0", expr("split(r_name, ' ')[0]"))
        .withColumn("c1", expr("substring(split(r_name, ' ')[1], 1, 1)"))
      val lv = levenshtein(col("p_name"), col("r_name")).cast("long")
      lb.join(rb, Seq("w0", "c1"))
        .filter(lv <= 2)
        .groupBy(col("p_partkey"), col("p_name"))
        .agg(count(lit(1)).as("n_matches"),
          min(lv).as("min_lev"),
          min(struct(lv.as("lv"), col("r_key"))).as("b"))
        .select(col("p_partkey"), col("p_name"), col("n_matches"),
          col("min_lev"), col("b.r_key").as("best_match"))
        .orderBy(col("p_partkey"))
    }),

    // J16: SCD2 TEMPORAL LOOKUP — the warehouse join o15's history build
    // exists for: each fact row (event) joins the dimension VERSION that
    // was valid at the fact's event time (custkey equality + ts ∈
    // [valid_from, valid_to)). Versions are built with the o15 lead()
    // window; intervals partition time per customer, so each fact
    // matches at most one version (facts before the first version go
    // NULL through the left join). Plan: the versioned dimension is
    // dim-sized, so it BROADCASTS and the range predicate runs as a
    // residual on the custkey hash join — facts never shuffle. At a
    // dimension too big to broadcast this becomes the j8 as-of family's
    // shuffle form; same semantics.
    "j16_scd2_lookup" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("valid_from"), col("o_orderkey"))
      val far = lit("2199-12-31 00:00:00").cast("timestamp")
      val hist = Tables.orders(s, d).filter(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").as("valid_from"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("price_q2"))
        .withColumn("valid_to",
          coalesce(lead(col("valid_from"), 1).over(w), far))
      val facts = Tables.events(s, d).filter(col("user_id") < 100)
        .select(col("event_id"), col("user_id"), col("ts"))
      facts.join(broadcast(hist),
          facts("user_id") === hist("o_custkey") &&
            facts("ts") >= hist("valid_from") &&
            facts("ts") < hist("valid_to"),
          "left")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          col("o_orderkey").as("version_key"), col("price_q2"))
        .orderBy(col("event_id"))
    }),

    // J18: polygon–POLYGON spatial join (r8 verdict missing #3 — the
    // tier after j13's point-in-polygon): which supplier rectangles
    // intersect each nation diamond. ST_Intersects is the owned codegen
    // kernel (edge-pair crossings + mutual vertex containment — the
    // complete test for simple polygons); candidates come from the same
    // j13 grid, each polygon replicated to every cell its bbox covers.
    // Multi-cell pairs dedup by the REFERENCE-CELL rule — a pair is
    // tested only in the cell containing its bbox-intersection min
    // corner (a point inside both bboxes, so both sides are guaranteed
    // present there) — which kills the post-join distinct() an exploded
    // grid join otherwise needs. Scale: polygons replicate to O(area /
    // cell²) cells, candidates are per-cell products (never all-pairs),
    // the dim side broadcasts, and the big side never shuffles. The
    // oracle re-derives diamond-rectangle intersection from the CLOSED
    // FORM L1-distance-to-rectangle < r — fully independent of the WKT
    // parse / segment test / grid machinery; fractional constants
    // (.15/.35/.2/.4 vs r's .3) are engineered so boundary-touching
    // never occurs and both predicates agree exactly.
    // J19: WITHIN-DISTANCE spatial join (ST_DWithin shape, r13) — "all
    // supplier parcels within t of each nation zone", the
    // nearest-neighbor workhorse the general st_distance kernel
    // unlocks. Same grid discipline as j18: the ZONE side's cell range
    // expands by t (a pair within distance t has bbox distance < t, so
    // it shares a cell with the expanded bbox), candidates meet on a
    // cell equi-join, the reference-cell filter dedups multi-cell
    // pairs WITHOUT a distinct, and st_distance prices candidates
    // only. At 100 TB: cells are the shuffle key (or the zone side
    // broadcasts, as here at gate SF), pair work ∝ true spatial
    // density, never |A|×|B|.
    "j19_distance_join" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      import graft.functions.{GraftFunctions => GF}
      val cell = 8.0
      val t = 2.75
      def dstr(c: org.apache.spark.sql.Column) = c.cast("string")
      def rectWkt(x1: org.apache.spark.sql.Column,
          y1: org.apache.spark.sql.Column, x2: org.apache.spark.sql.Column,
          y2: org.apache.spark.sql.Column) = concat(
        lit("POLYGON (("),
        dstr(x1), lit(" "), dstr(y1), lit(", "),
        dstr(x2), lit(" "), dstr(y1), lit(", "),
        dstr(x2), lit(" "), dstr(y2), lit(", "),
        dstr(x1), lit(" "), dstr(y2), lit(", "),
        dstr(x1), lit(" "), dstr(y1), lit("))"))
      val zones = Tables.nation(s, d).select(
          col("n_nationkey"),
          (col("n_nationkey") % 11 - 5).cast("double").as("ay1"),
          (col("n_nationkey") * 13 % 140 - 70).cast("double").as("ax1"),
          ((col("n_nationkey") % 5).cast("double") * 2 + lit(4.1)).as("aw"),
          ((col("n_nationkey") % 3).cast("double") + lit(2.3)).as("ah"))
        .withColumn("ax2", col("ax1") + col("aw"))
        .withColumn("ay2", col("ay1") + col("ah"))
        .withColumn("wkt_a", rectWkt(col("ax1"), col("ay1"), col("ax2"),
          col("ay2")))
        .withColumn("ci", explode(sequence(
          floor((col("ax1") - t) / cell).cast("int"),
          floor((col("ax2") + t) / cell).cast("int"))))
        .withColumn("cj", explode(sequence(
          floor((col("ay1") - t) / cell).cast("int"),
          floor((col("ay2") + t) / cell).cast("int"))))
        .select(col("n_nationkey"), col("wkt_a"), col("ax1"), col("ay1"),
          col("ci"), col("cj"))
      val parcels = Tables.supplier(s, d).select(
          col("s_suppkey"),
          ((col("s_suppkey") * 11 % 280 - 140).cast("double") + lit(0.15))
            .as("rx1"),
          ((col("s_suppkey") % 17 - 8).cast("double") + lit(0.35)).as("ry1"),
          ((col("s_suppkey") % 4).cast("double") + lit(1.2)).as("w"),
          ((col("s_suppkey") % 3).cast("double") + lit(1.4)).as("h"))
        .withColumn("rx2", col("rx1") + col("w"))
        .withColumn("ry2", col("ry1") + col("h"))
        .withColumn("wkt_b", rectWkt(col("rx1"), col("ry1"), col("rx2"),
          col("ry2")))
        .withColumn("ci", explode(sequence(
          floor(col("rx1") / cell).cast("int"),
          floor(col("rx2") / cell).cast("int"))))
        .withColumn("cj", explode(sequence(
          floor(col("ry1") / cell).cast("int"),
          floor(col("ry2") / cell).cast("int"))))
        .select(col("s_suppkey"), col("wkt_b"), col("rx1"), col("ry1"),
          col("ci"), col("cj"))
      parcels.join(broadcast(zones), Seq("ci", "cj"))
        .filter(col("ci") ===
            floor(greatest(col("ax1") - t, col("rx1")) / cell).cast("int") &&
          col("cj") ===
            floor(greatest(col("ay1") - t, col("ry1")) / cell).cast("int"))
        .filter(GF.stDistance(col("wkt_a"), col("wkt_b")) < t)
        .groupBy(col("n_nationkey"))
        .agg(count(lit(1)).as("n_within"),
          sum(col("s_suppkey")).cast("long").as("sum_supp"))
        .orderBy(col("n_nationkey"))
    }),

    "j18_polygon_polygon_join" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      import graft.functions.{GraftFunctions => GF}
      val cell = 8.0
      def dstr(c: org.apache.spark.sql.Column) = c.cast("string")
      val polys = Tables.nation(s, d).select(
          col("n_nationkey"),
          (col("n_nationkey") % 11 - 5).cast("double").as("cy"),
          (col("n_nationkey") * 13 % 140 - 70).cast("double").as("cx"),
          ((col("n_nationkey") % 5).cast("double") + lit(3.3)).as("r"))
        .withColumn("wkt_a", concat(
          lit("POLYGON (("),
          dstr(col("cx") + col("r")), lit(" "), dstr(col("cy")), lit(", "),
          dstr(col("cx")), lit(" "), dstr(col("cy") + col("r")), lit(", "),
          dstr(col("cx") - col("r")), lit(" "), dstr(col("cy")), lit(", "),
          dstr(col("cx")), lit(" "), dstr(col("cy") - col("r")), lit(", "),
          dstr(col("cx") + col("r")), lit(" "), dstr(col("cy")), lit("))")))
        .withColumn("ax1", col("cx") - col("r"))
        .withColumn("ay1", col("cy") - col("r"))
        .withColumn("ci", explode(sequence(
          floor(col("ax1") / cell).cast("int"),
          floor((col("cx") + col("r")) / cell).cast("int"))))
        .withColumn("cj", explode(sequence(
          floor(col("ay1") / cell).cast("int"),
          floor((col("cy") + col("r")) / cell).cast("int"))))
        .select(col("n_nationkey"), col("wkt_a"), col("ax1"), col("ay1"),
          col("ci"), col("cj"))
      val rects = Tables.supplier(s, d).select(
          col("s_suppkey"),
          ((col("s_suppkey") * 11 % 280 - 140).cast("double") + lit(0.15))
            .as("rx1"),
          ((col("s_suppkey") % 17 - 8).cast("double") + lit(0.35)).as("ry1"),
          ((col("s_suppkey") % 4).cast("double") + lit(1.2)).as("w"),
          ((col("s_suppkey") % 3).cast("double") + lit(1.4)).as("h"))
        .withColumn("rx2", col("rx1") + col("w"))
        .withColumn("ry2", col("ry1") + col("h"))
        .withColumn("wkt_b", concat(
          lit("POLYGON (("),
          dstr(col("rx1")), lit(" "), dstr(col("ry1")), lit(", "),
          dstr(col("rx2")), lit(" "), dstr(col("ry1")), lit(", "),
          dstr(col("rx2")), lit(" "), dstr(col("ry2")), lit(", "),
          dstr(col("rx1")), lit(" "), dstr(col("ry2")), lit(", "),
          dstr(col("rx1")), lit(" "), dstr(col("ry1")), lit("))")))
        .withColumn("ci", explode(sequence(
          floor(col("rx1") / cell).cast("int"),
          floor(col("rx2") / cell).cast("int"))))
        .withColumn("cj", explode(sequence(
          floor(col("ry1") / cell).cast("int"),
          floor(col("ry2") / cell).cast("int"))))
        .select(col("s_suppkey"), col("wkt_b"), col("rx1"), col("ry1"),
          col("ci"), col("cj"))
      rects.join(broadcast(polys), Seq("ci", "cj"))
        .filter(col("ci") ===
            floor(greatest(col("ax1"), col("rx1")) / cell).cast("int") &&
          col("cj") ===
            floor(greatest(col("ay1"), col("ry1")) / cell).cast("int"))
        .filter(GF.stIntersects(col("wkt_a"), col("wkt_b")))
        .groupBy(col("n_nationkey"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("s_suppkey")).cast("long").as("sum_supp"))
        .orderBy(col("n_nationkey"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "j19_distance_join" ->
      // closed-form rectangle-to-rectangle distance: per-axis clamped
      // gaps, hypot, threshold — independent of the WKT parse, the
      // segment-distance kernel and the grid under test; fractional
      // constants keep every pair off the t boundary
      """WITH zones AS (
        |  SELECT n_nationkey,
        |    CAST(n_nationkey * 13 % 140 - 70 AS DOUBLE) AS ax1,
        |    CAST(n_nationkey % 11 - 5 AS DOUBLE) AS ay1,
        |    CAST(n_nationkey % 5 AS DOUBLE) * 2 + 4.1 AS aw,
        |    CAST(n_nationkey % 3 AS DOUBLE) + 2.3 AS ah
        |  FROM nation),
        |parcels AS (
        |  SELECT s_suppkey,
        |    CAST(s_suppkey * 11 % 280 - 140 AS DOUBLE) + 0.15 AS rx1,
        |    CAST(s_suppkey % 17 - 8 AS DOUBLE) + 0.35 AS ry1,
        |    CAST(s_suppkey % 4 AS DOUBLE) + 1.2 AS w,
        |    CAST(s_suppkey % 3 AS DOUBLE) + 1.4 AS h
        |  FROM supplier),
        |pairs AS (
        |  SELECT n_nationkey, s_suppkey,
        |    greatest(rx1 - (ax1 + aw), ax1 - (rx1 + w), 0) AS dx,
        |    greatest(ry1 - (ay1 + ah), ay1 - (ry1 + h), 0) AS dy
        |  FROM zones, parcels)
        |SELECT n_nationkey,
        |  CAST(COUNT(*) AS BIGINT) AS n_within,
        |  CAST(SUM(s_suppkey) AS BIGINT) AS sum_supp
        |FROM pairs WHERE sqrt(dx * dx + dy * dy) < 2.75
        |GROUP BY n_nationkey ORDER BY n_nationkey""".stripMargin,

    "j18_polygon_polygon_join" ->
      // closed-form diamond-rectangle intersection: the L1 distance from
      // the diamond center to the rectangle (greatest-clamped per axis)
      // is < r iff the shapes overlap — independent of the WKT parse,
      // segment-intersection kernel, and grid under test; fractional
      // constants guarantee no boundary ties
      """WITH polys AS (
        |  SELECT n_nationkey,
        |    CAST(n_nationkey % 11 - 5 AS DOUBLE) AS cy,
        |    CAST(n_nationkey * 13 % 140 - 70 AS DOUBLE) AS cx,
        |    CAST(n_nationkey % 5 AS DOUBLE) + 3.3 AS r
        |  FROM nation),
        |rects AS (
        |  SELECT s_suppkey,
        |    CAST(s_suppkey * 11 % 280 - 140 AS DOUBLE) + 0.15 AS rx1,
        |    CAST(s_suppkey % 17 - 8 AS DOUBLE) + 0.35 AS ry1,
        |    CAST(s_suppkey % 4 AS DOUBLE) + 1.2 AS w,
        |    CAST(s_suppkey % 3 AS DOUBLE) + 1.4 AS h
        |  FROM supplier)
        |SELECT n_nationkey, COUNT(*) AS n_pairs,
        |  CAST(SUM(s_suppkey) AS BIGINT) AS sum_supp
        |FROM polys p JOIN rects t
        |  ON greatest(t.rx1 - p.cx, 0, p.cx - (t.rx1 + t.w))
        |   + greatest(t.ry1 - p.cy, 0, p.cy - (t.ry1 + t.h)) < p.r
        |GROUP BY n_nationkey ORDER BY n_nationkey""".stripMargin,

    "j17_fuzzy_join" ->
      // the same BLOCKED join declared naively: blocking keys as join
      // predicates, levenshtein residual, argmin best match
      """WITH l AS (
        |  SELECT p_partkey, p_name FROM part
        |  WHERE p_partkey % 5 = 0 AND p_partkey < 2000),
        |r AS (
        |  SELECT p_partkey AS r_key,
        |    split_part(p_name, ' ', 1) || ' ' ||
        |    substr(split_part(p_name, ' ', 2), 1, 1) ||
        |    substr(split_part(p_name, ' ', 2), 3) AS r_name
        |  FROM part WHERE p_partkey % 5 != 0),
        |m AS (
        |  SELECT l.p_partkey, l.p_name, r.r_key,
        |    CAST(levenshtein(l.p_name, r.r_name) AS BIGINT) AS lv
        |  FROM l JOIN r
        |    ON split_part(l.p_name, ' ', 1) = split_part(r.r_name, ' ', 1)
        |   AND substr(split_part(l.p_name, ' ', 2), 1, 1) =
        |       substr(split_part(r.r_name, ' ', 2), 1, 1)
        |  WHERE levenshtein(l.p_name, r.r_name) <= 2),
        |best AS (
        |  SELECT p_partkey, r_key,
        |    row_number() OVER (PARTITION BY p_partkey ORDER BY lv, r_key)
        |      AS rn
        |  FROM m)
        |SELECT m.p_partkey, MIN(m.p_name) AS p_name,
        |  COUNT(*) AS n_matches, MIN(m.lv) AS min_lev,
        |  MIN(b.r_key) AS best_match
        |FROM m JOIN best b ON b.p_partkey = m.p_partkey AND b.rn = 1
        |GROUP BY m.p_partkey
        |ORDER BY m.p_partkey""".stripMargin,

    "j16_scd2_lookup" ->
      """WITH hist AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate AS valid_from,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_q2,
        |    coalesce(lead(o_orderdate) OVER (
        |        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |      TIMESTAMP '2199-12-31 00:00:00') AS valid_to
        |  FROM orders WHERE o_custkey < 100),
        |f AS (SELECT event_id, user_id, ts FROM events WHERE user_id < 100)
        |SELECT f.event_id, f.user_id, CAST(epoch_us(f.ts) AS BIGINT) AS ts_us,
        |  h.o_orderkey AS version_key, h.price_q2
        |FROM f LEFT JOIN hist h
        |  ON f.user_id = h.o_custkey
        |  AND f.ts >= h.valid_from AND f.ts < h.valid_to
        |ORDER BY f.event_id""".stripMargin,

    "j14_binned_range_join" ->
      // the naive declaration of the same join — the oracle engine may
      // nested-loop it at toy scale; the Spark side must produce the
      // identical counts through the binned equi-join
      """SELECT o.o_orderkey,
        |  CAST(COUNT(l.l_orderkey) AS BIGINT) AS n_in_window
        |FROM orders o LEFT JOIN lineitem l
        |  ON l.l_shipdate >= o.o_orderdate
        | AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY
        |WHERE o.o_orderkey < 1000
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "j1_inner" ->
      s"""SELECT c_mktsegment, COUNT(*) AS n_orders, ${dsumSql("o_totalprice")} AS total
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "j11_cbo_reorder" ->
      s"""SELECT c_mktsegment, COUNT(*) AS n, ${dsumSql("o_totalprice")} AS total
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE n_name = 'NATION_3'
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "j2_left_outer" ->
      """SELECT c_nationkey, COUNT(*) AS n_rows,
        |  COUNT(o_orderkey) AS n_big_orders,
        |  CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_rows
        |FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000.0) o
        |  ON c_custkey = o.o_custkey
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "j2b_full_outer" ->
      """WITH lo AS (SELECT o_custkey, COUNT(*) AS n_small FROM orders
        |            WHERE o_totalprice < 20000.0 GROUP BY o_custkey),
        |     hi AS (SELECT o_custkey, COUNT(*) AS n_big FROM orders
        |            WHERE o_totalprice > 450000.0 GROUP BY o_custkey)
        |SELECT COALESCE(lo.o_custkey, hi.o_custkey) AS custkey,
        |  COALESCE(n_small, 0) AS n_small, COALESCE(n_big, 0) AS n_big
        |FROM lo FULL OUTER JOIN hi ON lo.o_custkey = hi.o_custkey
        |ORDER BY custkey""".stripMargin,

    "j2c_right_outer" ->
      """SELECT c_nationkey, COUNT(*) AS n_rows, COUNT(o_orderkey) AS n_big_orders
        |FROM (SELECT * FROM orders WHERE o_totalprice > 400000.0) o
        |RIGHT JOIN customer ON o.o_custkey = c_custkey
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "j3_semi" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |              AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "j4_anti" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "j5_broadcast" ->
      s"""SELECT p_brand, COUNT(*) AS n_items, ${dsumSql("l_quantity")} AS sum_qty
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE p_size <= 10
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "j6_cross" ->
      """SELECT r_regionkey, n_nationkey, r_regionkey = n_regionkey AS is_home
        |FROM region CROSS JOIN nation
        |ORDER BY r_regionkey, n_nationkey""".stripMargin,

    "j7_range" ->
      """SELECT a.user_id, COUNT(*) AS n_pairs
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        | AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE
        |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin,

    "j8_asof" ->
      """WITH j AS (
        |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
        |    row_number() OVER (PARTITION BY e.event_id
        |                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM (SELECT * FROM events WHERE event_id < 1000) e
        |  LEFT JOIN orders o ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts)
        |SELECT event_id, user_id, o_orderkey AS asof_orderkey,
        |       o_orderdate AS asof_orderdate
        |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "j8c_asof_custom" ->
      """WITH j AS (
        |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
        |    row_number() OVER (PARTITION BY e.event_id
        |                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM (SELECT * FROM events WHERE event_id < 1000) e
        |  LEFT JOIN orders o ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts)
        |SELECT event_id, user_id, o_orderkey AS asof_orderkey,
        |       o_orderdate AS asof_orderdate
        |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "j8d_asof_forward" ->
      // mirror of j8c's oracle with the comparison and rank order
      // flipped: first day >= ts; the max orderkey that day matches the
      // operator's pre-reduced right side
      """WITH j AS (
        |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
        |    row_number() OVER (PARTITION BY e.event_id
        |                       ORDER BY o.o_orderdate ASC, o.o_orderkey DESC) AS rn
        |  FROM (SELECT * FROM events WHERE event_id < 1000) e
        |  LEFT JOIN orders o ON e.user_id = o.o_custkey AND o.o_orderdate >= e.ts)
        |SELECT event_id, user_id, o_orderkey AS next_orderkey,
        |       o_orderdate AS next_orderdate
        |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "j8b_asof_union" ->
      """WITH j AS (
        |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
        |    row_number() OVER (PARTITION BY e.event_id
        |                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM (SELECT * FROM events WHERE event_id < 1000) e
        |  LEFT JOIN orders o ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts)
        |SELECT event_id, user_id, o_orderkey AS asof_orderkey,
        |       o_orderdate AS asof_orderdate
        |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "j10_preagg_join" ->
      s"""WITH li AS (
         |  SELECT l_orderkey, ${dsumSql("l_extendedprice")} AS rev,
         |    COUNT(*) AS n_items
         |  FROM lineitem GROUP BY l_orderkey)
         |SELECT o_orderpriority, COUNT(*) AS n_orders,
         |  ${dsumSql("rev")} AS rev,
         |  CAST(SUM(n_items) AS BIGINT) AS n_items
         |FROM orders JOIN li ON o_orderkey = l_orderkey
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "j9_star" ->
      s"""SELECT n_name, ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "j12_geo_distance_join" -> {
      // BRUTE-FORCE oracle (IEJoin on the lat band + full haversine) —
      // independently proves the grid-cell bucketing loses no pair. The
      // formula mirrors GeoFunctions.haversineKm operation-for-operation
      // (same constants, same association order) so both engines round
      // identically; see sc21_geo for the derivation.
      val k = s"CAST(${math.Pi / 180.0} AS DOUBLE)"
      val twoR = s"CAST(${2 * graft.functions.GeoFunctions.EarthRadiusKm} AS DOUBLE)"
      val sdp = s"sin(((b.lat * $k) - (a.lat * $k)) / 2)"
      val sdl = s"sin(((b.lon * $k) - (a.lon * $k)) / 2)"
      val hav = s"$twoR * asin(sqrt(least(" +
        s"$sdp * $sdp + cos(a.lat * $k) * cos(b.lat * $k) * $sdl * $sdl, 1.0)))"
      s"""WITH pts AS (
         |  SELECT c_custkey,
         |    CAST(c_custkey % 120 - 60 + 0.25 AS DOUBLE) AS lat,
         |    CAST(c_custkey * 7 % 300 - 150 + 0.5 AS DOUBLE) AS lon
         |  FROM customer),
         |pairs AS (
         |  SELECT a.c_custkey AS key_a, b.c_custkey AS key_b, $hav AS d_km
         |  FROM pts a JOIN pts b
         |    ON a.c_custkey < b.c_custkey
         |    AND b.lat BETWEEN a.lat - 2.75 AND a.lat + 2.75)
         |SELECT key_a, key_b,
         |  CAST(floor(d_km * 1e6 + 0.5) AS BIGINT) AS dist_q6
         |FROM pairs WHERE d_km <= 300.0
         |ORDER BY key_a, key_b""".stripMargin
    },

    "j13_polygon_join" ->
      // closed-form diamond containment |dx|+|dy| < r — independent of
      // the WKT/ray-cast/grid machinery under test; fractions are
      // engineered so boundary equality never occurs
      """WITH pts AS (
        |  SELECT c_custkey,
        |    CAST(c_custkey % 120 - 60 + 0.25 AS DOUBLE) AS lat,
        |    CAST(c_custkey * 7 % 300 - 150 + 0.5 AS DOUBLE) AS lon
        |  FROM customer),
        |polys AS (
        |  SELECT n_nationkey,
        |    CAST(n_nationkey % 11 - 5 AS DOUBLE) AS cy,
        |    CAST(n_nationkey * 13 % 140 - 70 AS DOUBLE) AS cx,
        |    CAST(n_nationkey % 5 AS DOUBLE) + 3.3 AS r
        |  FROM nation)
        |SELECT n_nationkey, COUNT(*) AS n_inside,
        |  CAST(SUM(c_custkey) AS BIGINT) AS sum_keys
        |FROM polys p JOIN pts t
        |  ON abs(t.lon - p.cx) + abs(t.lat - p.cy) < p.r
        |GROUP BY n_nationkey ORDER BY n_nationkey""".stripMargin
  )
}
