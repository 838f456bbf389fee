package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared query is a pure (SparkSession, sfDir) => DataFrame with a
  * deterministic total ordering (SURVEY §2 determinism rule); `oracleSql`
  * holds the DuckDB-equivalent ANSI SQL with identical column aliases.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Aggregates.q1PricingSummary(spark, "/root/testdata/sf0.001")

  private val modules: Seq[QueryModule] = Seq(
    ops.Sources, ops.Filters, ops.Joins, ops.Aggregates,
    ops.Windows, ops.Relational, ops.Scalars, ops.Events, ops.LlmOps,
    ops.Etl, ops.Graph
  )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracleSql).toMap
}
