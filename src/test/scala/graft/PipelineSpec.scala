package graft

import graft.pipeline.Pipeline
import graft.pipeline.Pipeline.{dfStep, sqlStep, ParquetSink}
import org.apache.spark.sql.functions._

/** The ETL orchestration surface: DAG validation, topological execution,
  * SQL-over-upstream-views transforms, sinks, end-to-end read-back.
  */
class PipelineSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  test("three-step source→transform→sink pipeline round-trips") {
    val out = java.nio.file.Files.createTempDirectory("graft_pipe").toString
    val result = Pipeline.run(spark, Seq(
      dfStep("src_orders")(s => Tables.orders(s, sf)),
      sqlStep("big_orders",
        "SELECT o_custkey, o_totalprice FROM src_orders WHERE o_totalprice > 100000",
        dependsOn = Seq("src_orders")),
      sqlStep("spend_per_cust",
        """SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n
          |FROM big_orders GROUP BY o_custkey""".stripMargin,
        dependsOn = Seq("big_orders"),
        sink = Some(ParquetSink(s"$out/spend", coalesce = Some(1))))))
    assert(result.order == Seq("src_orders", "big_orders", "spend_per_cust"))
    val written = spark.read.parquet(s"$out/spend")
    assert(written.count() == result.views("spend_per_cust").count())
    assert(written.count() > 0)
  }

  test("diamond dependencies run in topological order") {
    val r = Pipeline.run(spark, Seq(
      sqlStep("join_ab", "SELECT a.k FROM left_v a JOIN right_v b ON a.k = b.k",
        dependsOn = Seq("left_v", "right_v")),
      dfStep("left_v")(_ => Seq(1, 2, 3).toDF("k")),
      dfStep("right_v")(_ => Seq(2, 3, 4).toDF("k"))))
    assert(r.order.last == "join_ab")
    assert(r.views("join_ab").count() == 2)
  }

  test("cycles and unknown dependencies are rejected") {
    val e1 = intercept[IllegalArgumentException] {
      Pipeline.run(spark, Seq(
        sqlStep("a", "SELECT 1", dependsOn = Seq("b")),
        sqlStep("b", "SELECT 1", dependsOn = Seq("a"))))
    }
    assert(e1.getMessage.contains("cycle"))
    val e2 = intercept[IllegalArgumentException] {
      Pipeline.run(spark, Seq(sqlStep("a", "SELECT 1", dependsOn = Seq("ghost"))))
    }
    assert(e2.getMessage.contains("unknown"))
  }

  test("contract consistency: every oracle key has a query; keys well-formed") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle-only keys: ${o.diff(q)}")
    assert(q.forall(_.matches("[a-z0-9_]+")))
  }

  test("contract consistency: no module declares a duplicate query name") {
    val allKeys = Seq(
      ops.Sources, ops.Filters, ops.Joins, ops.Aggregates, ops.Windows,
      ops.Relational, ops.Scalars, ops.Events, ops.LlmOps)
      .flatMap(_.queries.keys)
    val dupes = allKeys.groupBy(identity).collect { case (k, v) if v.size > 1 => k }
    assert(dupes.isEmpty, s"duplicate query names across modules: $dupes")
    assert(allKeys.size == SparkEntry.queries.size)
  }
}
