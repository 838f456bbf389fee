package graft.ops

import graft.{Det, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY §2.6 — sort / limit / set ops / subqueries / CTE / UNNEST / PIVOT.
  *
  * Scale notes: ORDER BY+LIMIT plans as TakeOrderedAndProject (per-partition
  * top-k + merge — no global sort); set ops shuffle on the full row hash
  * only for the DISTINCT variants; UNNEST (explode) is pipelined, no
  * shuffle.
  */
object Relational extends QueryModule {
  import Det._

  val queries: Map[String, Q] = Map(
    // O1: multi-key sort with explicit null placement (nulls synthesized).
    "o1_sort_nulls" -> ((s, d) => {
      Tables.customer(s, d).filter(col("c_custkey") < 200)
        .select(col("c_custkey"),
          nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_or_null"),
          col("c_acctbal"))
        .orderBy(col("seg_or_null").asc_nulls_first,
          col("c_acctbal").desc_nulls_last, col("c_custkey"))
    }),

    // O2: ORDER BY + LIMIT top-k (TakeOrderedAndProject — no global sort).
    "o2_topn" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(25)
    }),

    // O3: UNION ALL + UNION DISTINCT of two event slices.
    "o3_union" -> ((s, d) => {
      val e = Tables.events(s, d)
      val a = e.filter(col("event_type") === "purchase").select(col("user_id"))
      val b = e.filter(col("value") > 90.0).select(col("user_id"))
      val unionAllCnt = a.unionAll(b).groupBy(col("user_id")).agg(count(lit(1)).as("n_all"))
      val unionDistinct = a.union(b).distinct()
        .withColumn("in_distinct", lit(1L))
      unionAllCnt.join(unionDistinct, Seq("user_id"), "left")
        .select(col("user_id"), col("n_all"), col("in_distinct"))
        .orderBy(col("user_id"))
    }),

    // O4: INTERSECT / EXCEPT (distinct semantics).
    "o4_intersect_except" -> ((s, d) => {
      val e = Tables.events(s, d)
      val buyers = e.filter(col("event_type") === "purchase").select(col("user_id"))
      val errorers = e.filter(col("event_type") === "error").select(col("user_id"))
      val both = buyers.intersect(errorers).withColumn("relation", lit("both"))
      val onlyBuy = buyers.except(errorers).withColumn("relation", lit("buy_only"))
      both.unionAll(onlyBuy)
        .orderBy(col("relation"), col("user_id"))
    }),

    // O5: scalar + correlated subqueries (Catalyst decorrelates).
    "o5_subqueries" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql(
        """SELECT c_custkey, c_acctbal,
          |  (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
          |FROM customer
          |WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
          |  AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
          |              AND o_totalprice > 300000.0)
          |ORDER BY c_custkey""".stripMargin)
    }),

    // O5b: NOT IN with a null in the subquery — three-valued logic makes
    // the predicate never-true (contrast with J4's NOT EXISTS).
    "o5b_not_in_nulls" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql(
        """SELECT
          |  (SELECT COUNT(*) FROM customer
          |   WHERE c_custkey NOT IN (SELECT NULLIF(o_custkey, 3) FROM orders)) AS n_not_in_with_null,
          |  (SELECT COUNT(*) FROM customer
          |   WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL
          |                           AND o_totalprice > 400000.0)) AS n_not_in_clean
          |""".stripMargin)
    }),

    // O6: CTE chain (WITH ... ) over temp views.
    "o6_cte" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql(
        """WITH nat AS (
          |  SELECT n_nationkey, n_name FROM nation),
          |cust_per_nat AS (
          |  SELECT c_nationkey, COUNT(*) AS n_cust
          |  FROM customer GROUP BY c_nationkey)
          |SELECT n_name, COALESCE(n_cust, 0) AS n_cust
          |FROM nat LEFT JOIN cust_per_nat ON n_nationkey = c_nationkey
          |ORDER BY n_name""".stripMargin)
    }),

    // O7: UNNEST array → rows with position (posexplode).
    "o7_unnest" -> ((s, d) => {
      Tables.embeddings(s, d).filter(col("vec_id") < 5)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "val")))
        .filter(col("pos") < 8)
        .select(col("vec_id"), col("pos").cast("long").as("pos"),
          col("val").cast("double").as("val"))
        .orderBy(col("vec_id"), col("pos"))
    }),

    // O8: PIVOT event counts by type per user.
    "o8_pivot" -> ((s, d) => {
      Tables.events(s, d).filter(col("user_id") < 25)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("user_id"))
    }),

    // O9: TABLESAMPLE — nondeterministic across engines → no oracle;
    // driver records rows-only. Seeded for stability within Spark.
    "o9_sample" -> ((s, d) => {
      Tables.lineitem(s, d).sample(withReplacement = false, 0.1, seed = 42)
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // O10: multi-array zip UNNEST WITH ORDINALITY — two parallel slices
    // zipped positionally (arrays_zip) and exploded with a 1-based ordinal.
    // Floats quantized as in sc4 so values hash-match the oracle.
    "o10_unnest_multi" -> ((s, d) => {
      Tables.embeddings(s, d).filter(col("vec_id") < 5)
        .select(col("vec_id"),
          posexplode(arrays_zip(
            expr("slice(embedding, 1, 4)"),
            expr("slice(embedding, 33, 4)"))).as(Seq("pos", "z")))
        .select(col("vec_id"), (col("pos") + 1).cast("long").as("ord"),
          expr("CAST(floor(CAST(z['0'] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)").as("v1_q"),
          expr("CAST(floor(CAST(z['1'] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)").as("v2_q"))
        .orderBy(col("vec_id"), col("ord"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "o1_sort_nulls" ->
      """SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg_or_null, c_acctbal
        |FROM customer WHERE c_custkey < 200
        |ORDER BY seg_or_null ASC NULLS FIRST, c_acctbal DESC NULLS LAST, c_custkey""".stripMargin,

    "o2_topn" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin,

    "o3_union" ->
      """WITH a AS (SELECT user_id FROM events WHERE event_type = 'purchase'),
        |     b AS (SELECT user_id FROM events WHERE value > 90.0),
        |     uall AS (SELECT user_id, COUNT(*) AS n_all
        |              FROM (SELECT * FROM a UNION ALL SELECT * FROM b) GROUP BY user_id),
        |     ud AS (SELECT DISTINCT user_id, 1 AS in_distinct
        |            FROM (SELECT * FROM a UNION SELECT * FROM b))
        |SELECT uall.user_id AS user_id, n_all, CAST(in_distinct AS BIGINT) AS in_distinct
        |FROM uall LEFT JOIN ud ON uall.user_id = ud.user_id
        |ORDER BY user_id""".stripMargin,

    "o4_intersect_except" ->
      """WITH buyers AS (SELECT user_id FROM events WHERE event_type = 'purchase'),
        |     errorers AS (SELECT user_id FROM events WHERE event_type = 'error')
        |SELECT user_id, 'both' AS relation FROM
        |  (SELECT * FROM buyers INTERSECT SELECT * FROM errorers)
        |UNION ALL
        |SELECT user_id, 'buy_only' AS relation FROM
        |  (SELECT * FROM buyers EXCEPT SELECT * FROM errorers)
        |ORDER BY relation, user_id""".stripMargin,

    "o5_subqueries" ->
      """SELECT c_custkey, c_acctbal,
        |  (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
        |FROM customer
        |WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
        |  AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |              AND o_totalprice > 300000.0)
        |ORDER BY c_custkey""".stripMargin,

    "o5b_not_in_nulls" ->
      """SELECT
        |  (SELECT COUNT(*) FROM customer
        |   WHERE c_custkey NOT IN (SELECT NULLIF(o_custkey, 3) FROM orders)) AS n_not_in_with_null,
        |  (SELECT COUNT(*) FROM customer
        |   WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL
        |                           AND o_totalprice > 400000.0)) AS n_not_in_clean
        |""".stripMargin,

    "o6_cte" ->
      """WITH nat AS (
        |  SELECT n_nationkey, n_name FROM nation),
        |cust_per_nat AS (
        |  SELECT c_nationkey, COUNT(*) AS n_cust
        |  FROM customer GROUP BY c_nationkey)
        |SELECT n_name, COALESCE(n_cust, 0) AS n_cust
        |FROM nat LEFT JOIN cust_per_nat ON n_nationkey = c_nationkey
        |ORDER BY n_name""".stripMargin,

    "o7_unnest" ->
      // DuckDB lacks WITH ORDINALITY; index the list explicitly instead.
      """SELECT vec_id, CAST(i - 1 AS BIGINT) AS pos,
        |       CAST(embedding[i] AS DOUBLE) AS val
        |FROM embeddings, generate_series(1, 8) t(i)
        |WHERE vec_id < 5
        |ORDER BY vec_id, pos""".stripMargin,

    "o8_pivot" ->
      """SELECT user_id,
        |  CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
        |  CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS "view",
        |  CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
        |  CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
        |  CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error
        |FROM events WHERE user_id < 25
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    // no WITH ORDINALITY in DuckDB 1.0 — generate_series + list indexing
    "o10_unnest_multi" ->
      """SELECT vec_id, CAST(i AS BIGINT) AS ord,
        |  CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS v1_q,
        |  CAST(floor(CAST(embedding[32 + i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS v2_q
        |FROM embeddings, generate_series(1, 4) t(i)
        |WHERE vec_id < 5 ORDER BY vec_id, ord""".stripMargin
  )
}
