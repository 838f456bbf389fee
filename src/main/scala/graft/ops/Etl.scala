package graft.ops

import graft.{Det, QueryModule, Tables}
import graft.pipeline.Pipeline
import org.apache.spark.sql.functions._

/** The orchestration surface itself under the oracle gate (SURVEY §0: the
  * reference IS an ETL tool — pipelines of named SQL transforms). p1 runs
  * a real multi-step DAG through graft.pipeline: table registration → two
  * dependent SQL transforms → parquet sink → read-back, and the final
  * result must hash-match one equivalent DuckDB SQL statement.
  *
  * Scale note (the reason Pipeline exists): steps are LAZY temp views, so
  * Catalyst optimizes across step boundaries — the segment filter in the
  * final step pushes into the orders scan of the first step, which a
  * statement-at-a-time SQL orchestrator re-materializing each step cannot
  * do. The sink is the only materialization point.
  */
object Etl extends QueryModule {
  import Det._

  val queries: Map[String, Q] = Map(
    "p1_pipeline_etl" -> ((s, d) => {
      Tables.registerAll(s, d)
      val out = Sources.scratch("graft_p1")
      Pipeline.run(s, Seq(
        Pipeline.sqlStep("cust_spend",
          s"""SELECT c_custkey, c_mktsegment,
             |  ${dsumSql("o_totalprice")} AS spend, COUNT(*) AS n_orders
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |GROUP BY c_custkey, c_mktsegment""".stripMargin),
        Pipeline.sqlStep("seg_stats",
          s"""SELECT c_mktsegment,
             |  CAST(SUM(CAST(spend AS DECIMAL(30,6))) AS DOUBLE) AS total_spend,
             |  SUM(n_orders) AS total_orders, COUNT(*) AS n_customers
             |FROM cust_spend
             |WHERE n_orders >= 2
             |GROUP BY c_mktsegment""".stripMargin,
          dependsOn = Seq("cust_spend"),
          sink = Some(Pipeline.ParquetSink(out, coalesce = Some(1))))))
      s.read.parquet(out).orderBy(col("c_mktsegment"))
    }),

    // P2: the Presto-SQL dialect entry point under the oracle gate — the
    // statement below is PRESTO dialect (double-quoted identifiers,
    // strpos, unit-form date_diff, literal-delimiter split,
    // json_extract_scalar), translated by PrestoSql and planned by
    // Catalyst like any native query. This is what a presto-etl-tool user
    // actually submits: SQL text, not a Scala DSL.
    "p2_presto_sql" -> ((s, d) => {
      Tables.registerAll(s, d)
      graft.presto.PrestoSql.sql(s,
        """SELECT "user_id",
          |  COUNT(*) AS n_events,
          |  SUM(CAST(json_extract_scalar("props", '$.k') AS BIGINT)) AS k_sum,
          |  MAX(date_diff('hour', date_trunc('day', "ts"), "ts")) AS hh_max,
          |  MAX(strpos("event_type", 'c')) AS cpos_max,
          |  MAX(CAST(cardinality(split("event_type", 'i')) AS BIGINT)) AS parts_max
          |FROM events
          |WHERE "user_id" < 20 AND strpos("event_type", 'e') > 0
          |GROUP BY "user_id"
          |ORDER BY "user_id"""".stripMargin)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "p1_pipeline_etl" ->
      s"""WITH cust_spend AS (
         |  SELECT c_custkey, c_mktsegment,
         |    ${dsumSql("o_totalprice")} AS spend, COUNT(*) AS n_orders
         |  FROM customer JOIN orders ON c_custkey = o_custkey
         |  GROUP BY c_custkey, c_mktsegment)
         |SELECT c_mktsegment,
         |  CAST(SUM(CAST(spend AS DECIMAL(30,6))) AS DOUBLE) AS total_spend,
         |  CAST(SUM(n_orders) AS BIGINT) AS total_orders, COUNT(*) AS n_customers
         |FROM cust_spend WHERE n_orders >= 2
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "p2_presto_sql" ->
      """SELECT user_id,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
        |  MAX(date_diff('hour', date_trunc('day', ts), ts)) AS hh_max,
        |  MAX(strpos(event_type, 'c')) AS cpos_max,
        |  MAX(CAST(len(str_split(event_type, 'i')) AS BIGINT)) AS parts_max
        |FROM events
        |WHERE user_id < 20 AND strpos(event_type, 'e') > 0
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin
  )
}
