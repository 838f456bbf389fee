package graft.ops

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over relationship graphs derived from the relational
  * tables (SURVEY §2.9 lists the other distributed-graph operator, L12's
  * connected components; PageRank is its ranking sibling — the
  * link-analysis quality signal real curation pipelines run over web /
  * citation / interaction graphs).
  *
  * Determinism design: the entire iteration is FIXED-POINT INTEGER
  * arithmetic (rank mass carried as 10¹²-scaled bigints, damping 0.85
  * applied as ·85 div 100, every division an integer floor). Both engines
  * execute the identical integer recurrence, so a 3-iteration PageRank is
  * hash-exact under the oracle gate — no float summation-order or
  * stddev-algorithm drift, the same trick as l25/l29's ppm arithmetic.
  *
  * Scale notes (100 TB): each iteration is ONE join of the rank vector
  * against the edge list (both keyed by vertex — co-partitioned after the
  * first round) plus ONE destination-keyed sum; work is O(E) per round
  * with driver-side state of exactly one scalar (the vertex count for
  * the teleport term; the loop is a fixed 3-round unroll, so there is
  * no per-round convergence witness either). The final
  * top-k is TakeOrdered (per-partition heaps + driver merge of k rows),
  * never a global sort.
  */
object Graph extends QueryModule {

  /** Rank-mass scale: 10¹² micro-units = 1.0 of total rank. Headroom:
    * Σ contributions ≤ SCALE, ·85 ⇒ ≤ 8.5·10¹³ « 2⁶³. */
  private val Scale = 1000000000000L

  /** One damped PageRank round over an undirected edge list.
    *
    * @param ranks (id, pr) current integer rank vector
    * @param edges (src, dst) symmetrized edges with (src, deg) available
    * @param nVert vertex count (for the teleport term)
    */
  private def prRound(ranks: DataFrame, edges: DataFrame, nVert: Long): DataFrame = {
    val base = ((Scale / nVert) * 15L) / 100L
    // the rank vector is O(V) — orders of magnitude smaller than the
    // edge list — so it BROADCASTS into the edge scan and each round
    // costs exactly ONE shuffle (the dst-keyed sum). When V outgrows
    // the broadcast threshold, the same round runs as a src-keyed
    // co-partitioned join; the integer recurrence is identical.
    val contrib = edges.join(broadcast(ranks), col("id") === col("src"))
      .select(col("dst").as("id"), expr("pr div deg").as("c"))
    contrib.groupBy(col("id"))
      .agg(sum(col("c")).as("s"))
      .select(col("id"), (lit(base) + expr("s * 85 div 100")).as("pr"))
  }

  val queries: Map[String, Q] = Map(
    // G1: 3-iteration PageRank over the customer↔supplier interaction
    // graph: an undirected edge per DISTINCT (custkey, suppkey) pair
    // that co-occurs on an order (orders ⋈ lineitem ⋈ customer's key).
    // Bipartite ids disambiguate by parity (cust·2, supp·2+1). Output:
    // top-40 vertices by rank — "which suppliers/customers sit at the
    // center of the trade graph", the interaction-ranking shape of
    // web-graph quality scoring.
    "g1_pagerank" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
      val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      // orders is the 2-column key dim here — BROADCAST it so the pair
      // build is map-side over the lineitem scan; pairs checkpoint once
      // (the symmetrized union reads them twice), and the degree table
      // doubles as the vertex set (a vertex exists iff it has an edge),
      // saving a separate distinct+count pass. Two shuffles total before
      // the rounds: the pair distinct and the degree sum.
      val pairs = li.join(broadcast(ord), col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
        .distinct().localCheckpoint()
      val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .localCheckpoint()
      val edgesD = edges.join(
        broadcast(deg.select(col("src"), col("deg"))), "src").localCheckpoint()

      val nVert = deg.count()
      var ranks = deg.select(col("src").as("id"), lit(Scale / nVert).as("pr"))
      for (_ <- 1 to 3) ranks = prRound(ranks, edgesD, nVert)

      ranks
        .select(
          when(col("id") % 2 === 0, "customer").otherwise("supplier").as("kind"),
          expr("id div 2").as("entity_key"), col("pr"))
        .orderBy(col("pr").desc, col("kind"), col("entity_key"))
        .limit(40)
    }),

    // G2: TRIANGLE COUNTING over the part co-occurrence graph (parts
    // that ship on the same order with quantity ≥ 25) — the clustering /
    // community-density primitive next to L12's components and G1's
    // ranking. The kernel is the degree-ORIENTED wedge join (the
    // standard m^{3/2}-bounded algorithm): each undirected edge points
    // from its lower-(degree, id) endpoint to the higher, so every
    // triangle has exactly one vertex with two out-edges and is counted
    // ONCE — and out-degrees are bounded by O(√m), which is what caps
    // the wedge (candidate) set that a hub vertex would otherwise
    // explode quadratically at 100 TB. Plan: edge build is one
    // order-keyed self-join; degrees broadcast back; wedges form in one
    // src-keyed self-join and close against the canonical edge list by
    // an equi-join. The oracle counts the same triangles
    // orientation-free (a<b<c three-way join) — identical multiset by
    // construction.
    "g2_triangle_count" -> ((s, d) => {
      // edge build: ONE order-keyed reduction, then the a<b pairs
      // generate IN-ROW from each order's sorted part set (carts are
      // bounded — ≤7 lineitems — so the per-row quadratic is constant
      // work; a self-join form would shuffle the item list twice more
      // for the same pairs)
      val edges = Tables.lineitem(s, d)
        .filter(col("l_quantity") >= 25)
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
        .select(explode(expr(
          """flatten(transform(ps, (x, i) ->
            |  transform(slice(ps, i + 2, size(ps)),
            |    y -> named_struct('a', x, 'b', y))))""".stripMargin))
          .as("e"))
        .select(col("e.a").as("a"), col("e.b").as("b")).distinct()
        .localCheckpoint()
      val deg = edges.select(col("a").as("v"))
        .unionAll(edges.select(col("b").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("dg"))
      val withDeg = edges
        .join(broadcast(deg.select(col("v").as("a"), col("dg").as("da"))), "a")
        .join(broadcast(deg.select(col("v").as("b"), col("dg").as("db"))), "b")
      val aFirst = col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b"))
      val oriented = withDeg.select(
        when(aFirst, col("a")).otherwise(col("b")).as("src"),
        when(aFirst, col("b")).otherwise(col("a")).as("dst"))
      // both joins BROADCAST the (reduced) edge list: after the
      // co-occurrence reduction the edge set is orders of magnitude
      // smaller than the fact table (325k × 2 longs at sf0.1), so the
      // wedge expansion and the closing probe run map-side over the
      // streamed side and only the final per-node rollup shuffles. At a
      // scale where edges outgrow the broadcast threshold, the same
      // plan runs with src-keyed / (a,b)-keyed shuffles — the wedge
      // bound from the orientation is what stays load-bearing.
      val wedges = oriented.as("e1").join(broadcast(oriented.as("e2")),
          col("e1.src") === col("e2.src") && col("e1.dst") < col("e2.dst"))
        .select(col("e1.src").as("u"), col("e1.dst").as("v"),
          col("e2.dst").as("w"))
      val tri = wedges.join(broadcast(edges),
        least(col("v"), col("w")) === col("a") &&
          greatest(col("v"), col("w")) === col("b"))
      tri.select(explode(array(col("u"), col("v"), col("w"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
        .orderBy(col("n_tri").desc, col("node")).limit(10)
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("n_tri").desc, col("node"))).cast("long"))
        .select(col("rank"), col("node"), col("n_tri"))
        .orderBy(col("rank"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "g1_pagerank" -> {
      // the identical integer recurrence, iterations unrolled as CTEs
      def round(prev: String, next: String) =
        s"""$next AS (
           |  SELECT e.dst AS id,
           |    base.b + CAST(SUM(p.pr // e.deg) AS BIGINT) * 85 // 100 AS pr
           |  FROM $prev p JOIN edges e ON p.id = e.src CROSS JOIN base
           |  GROUP BY e.dst, base.b)""".stripMargin
      s"""WITH pairs AS (
         |  SELECT DISTINCT o.o_custkey * 2 AS a, l.l_suppkey * 2 + 1 AS b
         |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         |sym AS (
         |  SELECT a AS src, b AS dst FROM pairs
         |  UNION ALL SELECT b AS src, a AS dst FROM pairs),
         |deg AS (SELECT src, COUNT(*) AS deg FROM sym GROUP BY src),
         |edges AS (
         |  SELECT s.src, s.dst, d.deg FROM sym s JOIN deg d ON s.src = d.src),
         |nv AS (SELECT COUNT(DISTINCT src) AS n FROM sym),
         |base AS (SELECT ((1000000000000 // n) * 15) // 100 AS b FROM nv),
         |pr0 AS (
         |  SELECT src AS id, 1000000000000 // n AS pr
         |  FROM (SELECT DISTINCT src FROM sym), nv),
         |${round("pr0", "pr1")},
         |${round("pr1", "pr2")},
         |${round("pr2", "pr3")}
         |SELECT CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'supplier' END
         |    AS kind,
         |  id // 2 AS entity_key, CAST(pr AS BIGINT) AS pr
         |FROM pr3
         |ORDER BY pr DESC, kind, entity_key
         |LIMIT 40""".stripMargin
    },

    "g2_triangle_count" ->
      // orientation-free a<b<c form: each triangle appears exactly once,
      // matching the oriented wedge join's once-per-triangle guarantee
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
        |  FROM lineitem WHERE l_quantity >= 25),
        |edges AS (
        |  SELECT DISTINCT x.p AS a, y.p AS b
        |  FROM items x JOIN items y ON x.ok = y.ok AND x.p < y.p),
        |tri AS (
        |  SELECT e1.a AS u, e1.b AS v, e2.b AS w
        |  FROM edges e1
        |  JOIN edges e2 ON e2.a = e1.b
        |  JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b),
        |pn AS (
        |  SELECT node, COUNT(*) AS n_tri
        |  FROM (SELECT unnest([u, v, w]) AS node FROM tri)
        |  GROUP BY node)
        |SELECT CAST(row_number() OVER (ORDER BY n_tri DESC, node) AS BIGINT)
        |    AS rank,
        |  node, n_tri
        |FROM pn ORDER BY rank LIMIT 10""".stripMargin
  )
}
