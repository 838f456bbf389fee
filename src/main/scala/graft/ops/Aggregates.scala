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

    // A6b: linear-regression aggregate family (Presto/ANSI regr_*) —
    // single-pass merged-moments aggregates; same partial+final shape as
    // A6, so the shuffle carries one fixed-size moment tuple per group.
    "a6b_regression" -> ((s, d) => {
      val (y, x) = (col("l_extendedprice"), col("l_quantity"))
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          round(regr_slope(y, x), 6).as("slope"),
          round(regr_intercept(y, x), 6).as("icept"),
          round(regr_r2(y, x), 6).as("r2"),
          regr_count(y, x).as("n_pairs"),
          round(regr_avgx(y, x), 6).as("avgx"),
          round(regr_avgy(y, x), 6).as("avgy"))
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
    // Scalar output columns (one per percentile): array-typed results crash
    // the driver's pandas comparator before even the rows-only check runs.
    "a7_approx_percentile" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(
          expr("approx_percentile(o_totalprice, 0.5, 1000)").as("ap50"),
          expr("approx_percentile(o_totalprice, 0.9, 1000)").as("ap90"))
        .orderBy(col("o_orderstatus"))
    }),

    // A8: collect_list/collect_set (array_agg) — sorted for determinism and
    // serialized to a ','-joined string (scalar columns hash-compare cleanly
    // on both engines; raw arrays crash the driver comparator).
    "a8_collect" -> ((s, d) => {
      Tables.lineitem(s, d).filter(col("l_orderkey") < 50)
        .groupBy(col("l_orderkey"))
        .agg(
          array_join(transform(array_sort(collect_list(col("l_linenumber"))),
            x => x.cast("string")), ",").as("lines"),
          array_join(array_sort(collect_set(col("l_returnflag"))), ",").as("flags"))
        .orderBy(col("l_orderkey"))
    }),

    // A11: map_agg (Presto) — the map is emitted as ';'-joined sorted
    // "key:value" entries. event_id is zero-padded so lexicographic string
    // order == (key, numeric value) order on both engines.
    "a11_map_agg" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(array_sort(collect_list(concat(
          col("event_type"), lit(":"),
          lpad(col("event_id").cast("string"), 12, "0")))).as("entries"))
        .filter(col("user_id") < 20)
        .select(col("user_id"),
          array_join(expr("slice(entries, 1, 3)"), ";").as("first3"))
        .orderBy(col("user_id"))
    }),

    // A12: histogram (Presto) — value→count map per group, encoded as
    // ';'-joined sorted "value:count" entries. Two-level aggregation: the
    // heavy first groupBy partial-aggregates map-side; the second sees only
    // #groups rows.
    "a12_histogram" -> ((s, d) => {
      Tables.documents(s, d)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("lang"))
        .agg(array_join(array_sort(collect_list(
          concat(col("source"), lit(":"), col("cnt").cast("string")))), ";").as("hist"))
        .orderBy(col("lang"))
    }),

    // A13: map_union_sum (Presto) — each row contributes a singleton map
    // (event_type -> props.k); maps are merged per bucket with value-sum on
    // key collision. Same sorted-entries encoding as A11/A12.
    "a13_map_union" -> ((s, d) => {
      Tables.events(s, d)
        .select((col("user_id") % 10).cast("long").as("bucket"),
          col("event_type").as("k"),
          get_json_object(col("props"), "$.k").cast("long").as("v"))
        .groupBy(col("bucket"), col("k"))
        .agg(sum(col("v")).as("vsum"))
        .groupBy(col("bucket"))
        .agg(array_join(array_sort(collect_list(
          concat(col("k"), lit(":"), col("vsum").cast("string")))), ";").as("merged"))
        .orderBy(col("bucket"))
    }),

    // A14: DECIMAL(p,s) end-to-end — cast money from double to
    // DECIMAL(15,2), round-trip through a parquet sink (decimal logical
    // type preserved on disk), aggregate in exact decimal, present as
    // double (exact: cent-scaled sums « 2^53). The double→decimal(15,2)
    // cast is tie-free for ~2dp money values, so Spark HALF_UP vs DuckDB
    // half-even can't diverge (see Det scale-6 proof).
    "a14_decimal_agg" -> ((s, d) => {
      val out = Sources.scratch("graft_dec")
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice").cast("decimal(15,2)").as("price_dec"))
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out)
        .groupBy(col("o_orderstatus"))
        .agg(
          sum(col("price_dec")).cast("double").as("total_dec"),
          max(col("price_dec")).cast("double").as("max_dec"),
          min(col("price_dec")).cast("double").as("min_dec"),
          sum((col("price_dec") * lit(3)).cast("decimal(20,2)")).cast("double").as("total_x3"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))
    }),

    // A15: boolean + bitwise aggregates (Presto bool_and/bool_or,
    // bitwise_and_agg/bitwise_or_agg; Spark adds bit_xor).
    "a15_bool_bit_agg" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          bool_and(col("l_quantity") > 0.0).as("all_pos"),
          bool_or(col("l_discount") > 0.09).as("any_big_disc"),
          expr("bit_and(l_linenumber)").cast("long").as("agg_band"),
          expr("bit_or(l_linenumber)").cast("long").as("agg_bor"),
          expr("bit_xor(l_linenumber)").cast("long").as("agg_bxor"))
        .orderBy(col("l_returnflag"))
    }),

    // A16: multimap_agg (Presto) — key → ALL values map, encoded as sorted
    // "k:[v1,v2,v3]" entries (values sorted, capped at 3 for the check).
    // A18: heavy hitters via the Misra–Gries sketch UDAF (Presto
    // `approx_most_frequent`). Approx + merge-order-dependent counts →
    // rows-only check (like A3/L2); the guarantee (every key with
    // frequency > n/(capacity+1) is tracked) is unit-tested, and the
    // exact companion a18b anchors ground truth with a full oracle.
    "a18_heavy_hitters" -> ((s, d) => {
      Tables.documents(s, d)
        .groupBy(col("lang"))
        .agg(graft.functions.HeavyHittersAggregator
          .heavyHitters(col("source"), 8).as("hh"))
        .select(col("lang"),
          array_join(expr("slice(hh, 1, 3)"), ";").as("top3"),
          size(col("hh")).as("n_tracked"))
        .orderBy(col("lang"))
    }),

    // A18b: exact frequency top-3 per group — the oracle-checked anchor
    // for the sketch above.
    "a18b_topk_exact" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val counts = Tables.documents(s, d)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("cnt").desc, col("source"))
      counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("lang"), col("rn").cast("long").as("rn"),
          col("source"), col("cnt"))
        .orderBy(col("lang"), col("rn"))
    }),

    // A20: listagg / string_agg + set_agg (distinct list) — ordered string
    // concatenation per group (Presto `listagg`, `set_agg`). Explicit sort
    // before the join keeps it deterministic under any partitioning.
    "a20_listagg" -> ((s, d) => {
      Tables.nation(s, d)
        .groupBy(col("n_regionkey"))
        .agg(
          array_join(array_sort(collect_list(col("n_name"))), "|").as("names"),
          array_join(array_sort(collect_set(col("n_name"))), "|").as("distinct_names"),
          count(lit(1)).as("n"))
        .orderBy(col("n_regionkey"))
    }),

    // A21: mergeable HLL sketches (Spark DataSketches `hll_sketch_agg` /
    // `hll_union_agg`) — the re-aggregatable-rollup pattern: per-(lang,
    // source) sketches merge into per-lang estimates WITHOUT re-reading
    // rows. At 100 TB this is how you precompute distinct-count cubes:
    // fine-grained sketches persist once; any coarser rollup is a cheap
    // sketch union. Approx → rows-only; accuracy unit-tested (ApproxSpec).
    "a21_hll_merge" -> ((s, d) => {
      Tables.documents(s, d)
        .groupBy(col("lang"), col("source"))
        .agg(expr("hll_sketch_agg(doc_id)").as("sk"))
        .groupBy(col("lang"))
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("approx_docs"),
          count(lit(1)).as("n_sketches"))
        .orderBy(col("lang"))
    }),

    // A22: mergeable percentile rollup (t-digest) — the re-aggregatable
    // companion to A21's HLL union: per-(lang, source) sketches of n_chars
    // merge into per-lang p50/p90 WITHOUT re-reading rows. At 100 TB,
    // fine-grained sketches persist once; any coarser percentile is a
    // sketch merge. Approx + merge-order-dependent → rows-only; accuracy
    // and rollup-vs-exact are property-tested (ApproxSpec).
    "a22_tdigest_rollup" -> ((s, d) => {
      import graft.functions.QuantileSketchAggregator._
      Tables.documents(s, d)
        .groupBy(col("lang"), col("source"))
        .agg(tdigestAgg(col("n_chars").cast("double")).as("sk"))
        .groupBy(col("lang"))
        .agg(tdigestMergeAgg(col("sk")).as("merged"),
          count(lit(1)).as("n_sketches"))
        .select(col("lang"),
          round(tdigestQuantile(col("merged"), 0.5), 2).as("p50"),
          round(tdigestQuantile(col("merged"), 0.9), 2).as("p90"),
          col("n_sketches"))
        .orderBy(col("lang"))
    }),

    // A19: fixed-width numeric histogram (Presto `numeric_histogram` /
    // `width_bucket`): bucket index is pure row arithmetic, then a
    // low-cardinality count groupBy — the 100 TB histogram pattern (the
    // shuffle carries #buckets rows per partition).
    "a19_numeric_histogram" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(width_bucket(col("l_extendedprice"),
          lit(0.0), lit(100000.0), lit(20)).as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"))
    }),

    // A17: order-independent row checksum aggregate (Presto `checksum`):
    // hash each row to a 60-bit int (15 hex digits of md5 — fits int64),
    // combine with XOR (order/partitioning-independent by construction)
    // plus a modular sum as a second independent digest. At 100 TB this is
    // THE cheap table-equality/drift check: one narrow shuffle of #groups
    // rows, no sort anywhere.
    "a17_checksum" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("h",
          conv(substring(md5(concat(col("event_id").cast("string"), lit("|"),
            col("event_type")).cast("binary")), 1, 15), 16, 10).cast("long"))
        .groupBy(col("event_type"))
        .agg(expr("bit_xor(h)").as("xor_sum"),
          sum(col("h") % lit(1000000007L)).as("mod_sum"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    }),

    "a16_multimap_agg" -> ((s, d) => {
      Tables.events(s, d).filter(col("user_id") < 10)
        .groupBy(col("user_id"), col("event_type"))
        .agg(array_join(transform(
          expr("slice(array_sort(collect_list(event_id)), 1, 3)"),
          x => x.cast("string")), ",").as("vals"))
        .groupBy(col("user_id"))
        .agg(array_join(array_sort(collect_list(concat(
          col("event_type"), lit(":["), col("vals"), lit("]")))), ";").as("mm"))
        .orderBy(col("user_id"))
    }),

    // A25: set_union — Presto's array-union aggregate (distinct union of
    // ARRAY column values per group). collect_list order is partition-
    // dependent, so the union is canonicalized distinct→sort→join before
    // it leaves the query (the A8/A20 serialization rule).
    "a25_set_union" -> ((s, d) => {
      Tables.part(s, d).filter(col("p_partkey") < 500)
        .select(col("p_brand"), split(col("p_type"), " ").as("words"))
        .groupBy(col("p_brand"))
        .agg(array_join(array_sort(array_distinct(flatten(
            collect_list(col("words"))))), ",").as("type_words"),
          count(lit(1)).as("n_parts"))
        .orderBy(col("p_brand"))
    }),

    // A24: reduce_agg — Presto's generic user-defined reduction, as a
    // typed Aggregator factory (functions/ReduceAggregator.scala). The
    // instance here is a modular product (state = one long; exact integer
    // arithmetic, commutative mod p, so partial-merge order cannot change
    // the answer — the determinism rule for oracle-gated reductions).
    // DuckDB oracles it with list_reduce over the same fold.
    "a24_reduce_agg" -> ((s, d) => {
      import graft.functions.ReduceAggregator.reduceAgg
      implicit val longEnc: org.apache.spark.sql.Encoder[Long] =
        org.apache.spark.sql.Encoders.scalaLong
      val p = 1000003L
      val modProd = reduceAgg[Long, Long](1L)((s, x) => s * x % p)((a, b) => a * b % p) _
      Tables.lineitem(s, d)
        .select(col("l_returnflag"),
          (floor(col("l_quantity")).cast("long") % p).as("q"))
        .groupBy(col("l_returnflag"))
        .agg(modProd(col("q")).as("mod_prod"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // A23: distribution aggregates Spark lacks natively — Presto
    // `entropy()` (Shannon, base 2, over a categorical distribution) and
    // `geometric_mean()`. Both compose from existing codegen aggregates:
    // H = log2(T) − Σ c·log2(c) / T over per-category counts (two-level
    // hash agg, category counts shuffle, never rows), geometric mean =
    // exp(avg(ln x)) (single-pass).
    "a23_entropy_geomean" -> ((s, d) => {
      val counts = Tables.events(s, d).filter(col("user_id") < 50)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("c"))
      val entropy = counts.groupBy(col("user_id"))
        .agg(sum(col("c")).as("t"),
          sum(col("c") * log2(col("c"))).as("s"))
        .select(col("user_id"),
          round(log2(col("t")) - col("s") / col("t"), 6).as("h"))
      val geo = Tables.events(s, d).filter(col("user_id") < 50)
        .groupBy(col("user_id"))
        .agg(round(exp(avg(log(abs(col("value")) + 1.0))), 6).as("gm"))
      entropy.join(geo, Seq("user_id"))
        .orderBy(col("user_id"))
    }),

    // A9b: Presto's 3-arg min_by/max_by(x, y, n) — top-n argmin/argmax
    // returning ordered lists. Spark has no n-ary form; the scalable
    // emulation is a per-group window rank filtered to n, then an
    // order-preserving collect (sort the (rank, key) structs, project the
    // keys). WindowGroupLimit prunes each partition to n rows before the
    // shuffle, so this costs the same as any top-k per group.
    "a9b_minmax_by_n" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val wD = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").desc)
      val wA = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      def ranked(w: org.apache.spark.sql.expressions.WindowSpec, rn: String) =
        row_number().over(w).as(rn)
      def picked(rn: String) = array_join(transform(
        array_sort(collect_list(when(col(rn) <= 3,
          struct(col(rn), col("o_orderkey").as("k"))))),
        e => e.getField("k").cast("string")), ",")
      Tables.orders(s, d)
        .withColumn("rd", ranked(wD, "rd"))
        .withColumn("ra", ranked(wA, "ra"))
        .groupBy(col("o_orderstatus"))
        .agg(picked("rd").as("top3_by_price"), picked("ra").as("bot3_by_price"))
        .orderBy(col("o_orderstatus"))
    }),

    // A26: count_if + median (Presto count_if; median = the exact
    // interpolated 0.5-quantile both engines compute identically on
    // integer inputs). count_if is sugar over a filtered count — one
    // partial+final hash agg; median is a full-sort-per-group aggregate,
    // the known-expensive exact form a7's approx_percentile replaces at
    // scale.
    "a26_countif_median" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(count_if(col("l_quantity") > 25.0).as("n_big"),
          count_if(col("l_discount") < 0.03).as("n_lowdisc"),
          median(col("l_quantity")).as("med_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // A27: skewness/kurtosis (the rest of Trino's moment family after
    // a6's stddev/var/corr/covar). The declared query computes the
    // population moments EXPLICITLY (two-pass: mean join, then
    // avg((x-mu)^k)) because Spark's one-pass merge formula and DuckDB's
    // two-pass differ in low-order bits, while this form agrees across
    // engines to summation-order noise (~1e-12 relative) that the coarse
    // q4 quantization absorbs; EdgeCaseSpec ties Spark's built-in
    // skewness()/kurtosis() to these values within float tolerance.
    // Plan: two partial+final aggs keyed on the group — the mean join is
    // a broadcast of #groups rows.
    "a27_skew_kurtosis" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val mu = li.groupBy(col("l_returnflag"))
        .agg(avg(col("l_extendedprice")).as("mu"))
      li.join(broadcast(mu), "l_returnflag")
        .groupBy(col("l_returnflag"))
        .agg(avg(pow(col("l_extendedprice") - col("mu"), 2)).as("m2"),
          avg(pow(col("l_extendedprice") - col("mu"), 3)).as("m3"),
          avg(pow(col("l_extendedprice") - col("mu"), 4)).as("m4"))
        .select(col("l_returnflag"),
          floor(col("m3") / pow(col("m2"), 1.5) * 1e4 + 0.5)
            .cast("long").as("skew_q4"),
          floor((col("m4") / (col("m2") * col("m2")) - 3.0) * 1e4 + 0.5)
            .cast("long").as("kurt_q4"))
        .orderBy(col("l_returnflag"))
    }),

    // A28: share-of-total — the percent-of-total report column, in its
    // SCALABLE form: aggregate once, 1-row grand total cross-joined back
    // (broadcast). The tempting `sum() OVER ()` window is the
    // anti-pattern — an empty PARTITION BY funnels every row through one
    // task. Division happens in double after exact decimal sums and is
    // quantized.
    "a28_share_of_total" -> ((s, d) => {
      val agg = Tables.orders(s, d).groupBy(col("o_orderpriority"))
        .agg(dsum(col("o_totalprice")).as("rev"), count(lit(1)).as("n"))
      val total = agg.agg(sum(col("rev")).as("total"))
      agg.crossJoin(broadcast(total))
        .select(col("o_orderpriority"), col("n"), col("rev"),
          floor(col("rev").cast("double") / col("total").cast("double")
            * 1e6 + 0.5).cast("long").as("share_q6"))
        .orderBy(col("o_orderpriority"))
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
    "a28_share_of_total" ->
      s"""WITH a AS (
         |  SELECT o_orderpriority, ${dsumSql("o_totalprice")} AS rev, COUNT(*) AS n
         |  FROM orders GROUP BY 1),
         |t AS (SELECT CAST(SUM(rev) AS DOUBLE) AS total FROM a)
         |SELECT o_orderpriority, n, rev,
         |  CAST(floor(CAST(rev AS DOUBLE) / total * 1e6 + 0.5) AS BIGINT) AS share_q6
         |FROM a CROSS JOIN t ORDER BY o_orderpriority""".stripMargin,

    "a27_skew_kurtosis" ->
      """WITH s AS (
        |  SELECT l_returnflag, avg(l_extendedprice) AS mu
        |  FROM lineitem GROUP BY 1),
        |m AS (
        |  SELECT l.l_returnflag,
        |    avg(pow(l_extendedprice - mu, 2)) AS m2,
        |    avg(pow(l_extendedprice - mu, 3)) AS m3,
        |    avg(pow(l_extendedprice - mu, 4)) AS m4
        |  FROM lineitem l JOIN s USING (l_returnflag) GROUP BY 1)
        |SELECT l_returnflag,
        |  CAST(floor(m3 / pow(m2, 1.5) * 1e4 + 0.5) AS BIGINT) AS skew_q4,
        |  CAST(floor((m4 / (m2 * m2) - 3.0) * 1e4 + 0.5) AS BIGINT) AS kurt_q4
        |FROM m ORDER BY l_returnflag""".stripMargin,

    "a26_countif_median" ->
      """SELECT l_returnflag,
        |  CAST(count_if(l_quantity > 25.0) AS BIGINT) AS n_big,
        |  CAST(count_if(l_discount < 0.03) AS BIGINT) AS n_lowdisc,
        |  median(l_quantity) AS med_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

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

    "a6b_regression" ->
      """SELECT l_returnflag,
        |  ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
        |  ROUND(regr_intercept(l_extendedprice, l_quantity), 6) AS icept,
        |  ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
        |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_pairs,
        |  ROUND(regr_avgx(l_extendedprice, l_quantity), 6) AS avgx,
        |  ROUND(regr_avgy(l_extendedprice, l_quantity), 6) AS avgy
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "a7_percentile" ->
      """SELECT o_orderstatus,
        |  ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |  ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
        |  ROUND(quantile_cont(o_totalprice, 0.99), 4) AS p99
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "a8_collect" ->
      """SELECT l_orderkey,
        |  array_to_string(list_sort(list(l_linenumber)), ',') AS lines,
        |  array_to_string(list_sort(list(DISTINCT l_returnflag)), ',') AS flags
        |FROM lineitem WHERE l_orderkey < 50
        |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,

    "a11_map_agg" ->
      """SELECT user_id,
        |  array_to_string(
        |    list_sort(list(event_type || ':' || lpad(CAST(event_id AS VARCHAR), 12, '0')))[1:3],
        |    ';') AS first3
        |FROM events WHERE user_id < 20
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "a15_bool_bit_agg" ->
      """SELECT l_returnflag,
        |  bool_and(l_quantity > 0.0) AS all_pos,
        |  bool_or(l_discount > 0.09) AS any_big_disc,
        |  CAST(bit_and(l_linenumber) AS BIGINT) AS agg_band,
        |  CAST(bit_or(l_linenumber) AS BIGINT) AS agg_bor,
        |  CAST(bit_xor(l_linenumber) AS BIGINT) AS agg_bxor
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "a18b_topk_exact" ->
      """WITH c AS (
        |  SELECT lang, source, COUNT(*) AS cnt
        |  FROM documents GROUP BY lang, source),
        |r AS (
        |  SELECT lang, source, cnt,
        |    row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, source) AS rn
        |  FROM c)
        |SELECT lang, rn, source, cnt FROM r WHERE rn <= 3
        |ORDER BY lang, rn""".stripMargin,

    "a20_listagg" ->
      """SELECT n_regionkey,
        |  string_agg(n_name, '|' ORDER BY n_name) AS names,
        |  string_agg(DISTINCT n_name, '|' ORDER BY n_name) AS distinct_names,
        |  COUNT(*) AS n
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,

    "a19_numeric_histogram" ->
      """SELECT LEAST(CAST(floor(l_extendedprice / 5000.0) + 1 AS BIGINT), 21) AS bucket,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY bucket""".stripMargin,

    "a17_checksum" ->
      """WITH h AS (
        |  SELECT event_type,
        |    CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR) || '|' || event_type), 1, 15)) AS BIGINT) AS h
        |  FROM events)
        |SELECT event_type, bit_xor(h) AS xor_sum,
        |  CAST(SUM(h % 1000000007) AS BIGINT) AS mod_sum, COUNT(*) AS n
        |FROM h GROUP BY event_type ORDER BY event_type""".stripMargin,

    "a16_multimap_agg" ->
      """WITH g AS (
        |  SELECT user_id, event_type,
        |    array_to_string(list_sort(list(event_id))[1:3], ',') AS vals
        |  FROM events WHERE user_id < 10 GROUP BY 1, 2)
        |SELECT user_id,
        |  array_to_string(list_sort(list(event_type || ':[' || vals || ']')), ';') AS mm
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,

    "a12_histogram" ->
      """WITH c AS (SELECT lang, source, COUNT(*) AS cnt
        |           FROM documents GROUP BY 1, 2)
        |SELECT lang,
        |  array_to_string(list_sort(list(source || ':' || CAST(cnt AS VARCHAR))), ';') AS hist
        |FROM c GROUP BY lang ORDER BY lang""".stripMargin,

    "a13_map_union" ->
      """WITH m AS (
        |  SELECT user_id % 10 AS bucket, event_type AS k,
        |    CAST(json_extract(props, '$.k') AS BIGINT) AS v
        |  FROM events),
        |c AS (SELECT bucket, k, CAST(SUM(v) AS BIGINT) AS vsum FROM m GROUP BY 1, 2)
        |SELECT bucket,
        |  array_to_string(list_sort(list(k || ':' || CAST(vsum AS VARCHAR))), ';') AS merged
        |FROM c GROUP BY bucket ORDER BY bucket""".stripMargin,

    "a14_decimal_agg" ->
      """SELECT o_orderstatus,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS total_dec,
        |  CAST(MAX(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS max_dec,
        |  CAST(MIN(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS min_dec,
        |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 3 AS DECIMAL(20,2))) AS DOUBLE) AS total_x3,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "a25_set_union" ->
      """WITH w AS (
        |  SELECT p_brand, unnest(str_split(p_type, ' ')) AS word
        |  FROM part WHERE p_partkey < 500),
        |u AS (
        |  SELECT p_brand,
        |    array_to_string(list_sort(list(DISTINCT word)), ',') AS type_words
        |  FROM w GROUP BY p_brand),
        |c AS (
        |  SELECT p_brand, COUNT(*) AS n_parts
        |  FROM part WHERE p_partkey < 500 GROUP BY p_brand)
        |SELECT u.p_brand, type_words, n_parts
        |FROM u JOIN c USING (p_brand) ORDER BY p_brand""".stripMargin,

    "a24_reduce_agg" ->
      """SELECT l_returnflag,
        |  list_reduce(list(CAST(floor(l_quantity) AS BIGINT) % 1000003),
        |    (a, b) -> (a * b) % 1000003) AS mod_prod,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "a23_entropy_geomean" ->
      """SELECT user_id,
        |  ROUND(entropy(event_type), 6) AS h,
        |  ROUND(exp(avg(ln(abs(value) + 1.0))), 6) AS gm
        |FROM events WHERE user_id < 50
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "a9b_minmax_by_n" ->
      """WITH r AS (
        |  SELECT o_orderstatus, o_orderkey,
        |    row_number() OVER (PARTITION BY o_orderstatus
        |      ORDER BY o_totalprice DESC, o_orderkey DESC) AS rd,
        |    row_number() OVER (PARTITION BY o_orderstatus
        |      ORDER BY o_totalprice ASC, o_orderkey ASC) AS ra
        |  FROM orders)
        |SELECT o_orderstatus,
        |  string_agg(CASE WHEN rd <= 3 THEN CAST(o_orderkey AS VARCHAR) END, ',' ORDER BY rd) AS top3_by_price,
        |  string_agg(CASE WHEN ra <= 3 THEN CAST(o_orderkey AS VARCHAR) END, ',' ORDER BY ra) AS bot3_by_price
        |FROM r GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

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
