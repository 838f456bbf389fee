package graft

import org.apache.spark.sql.SparkSession

/** Dumps formatted physical plans for the plan-shape audit (SURVEY §4):
  * filter/projection pushdown, broadcast vs shuffle joins, top-k without
  * global sort, partial aggregation. Output reviewed into PLANS.md.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val interesting = Seq(
      "s1_parquet_scan",      // expect PushedFilters + pruned ReadSchema
      "j1_inner",             // expect BroadcastHashJoin
      "j9_star",              // expect all dims broadcast, one shuffle for o⋈l
      "j7_range",             // expect SortMergeJoin w/ range residual, not BNLJ
      "o2_topn",              // expect TakeOrderedAndProject
      "a1_pricing_summary",   // expect partial+final HashAggregate
      "l3_knn_cosine",        // expect BroadcastNestedLoopJoin w/ tiny bcast side
      "l2_minhash_lsh",       // expect shuffle only on band keys
      "s6_partitioned_scan"   // expect PartitionFilters
    )
    interesting.foreach { name =>
      println(s"\n================ $name ================")
      println(SparkEntry.queries(name)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
