package graft

import org.apache.spark.sql.functions._

/** Quantitative scale evidence (the measured counterpart of PLANS.md's
  * plan-shape audit): task-level input/shuffle byte totals prove that
  * partition pruning skips I/O, pre-aggregation shrinks shuffles, and
  * hash-dedup never shuffles payloads. Byte thresholds are deliberately
  * loose (2× headroom) — they assert the mechanism, not the exact size.
  */
class MetricsSpec extends SparkSpec {

  test("partition pruning reads a fraction of the unpruned table (S6)") {
    val out = ops.Sources.scratch("graft_mprune")
    Tables.orders(spark, sf)
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    val full = Metrics.measure(spark, spark.read.parquet(out))
    val pruned = Metrics.measure(spark,
      spark.read.parquet(out).filter(col("o_orderstatus") === "P"))
    // 'P' is the smallest status partition (~2% of orders): the pruned
    // scan must read far less than the full table, not filter post-hoc
    assert(pruned.inputBytes > 0)
    assert(pruned.inputBytes * 2 < full.inputBytes,
      s"pruned=${pruned.inputBytes}B full=${full.inputBytes}B")
    assert(pruned.inputRecords * 2 < full.inputRecords)
  }

  test("pre-aggregation below the join shrinks the shuffle (J10 mechanism)") {
    val li = Tables.lineitem(spark, sf)
    val naive = Metrics.measure(spark,
      Tables.orders(spark, sf)
        .join(li.repartition(col("l_orderkey")), // force li through a shuffle
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority")).agg(sum(col("l_extendedprice"))))
    val preagg = Metrics.measure(spark,
      Tables.orders(spark, sf)
        .join(li.groupBy(col("l_orderkey"))
            .agg(sum(col("l_extendedprice")).as("rev")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority")).agg(sum(col("rev"))))
    assert(preagg.shuffleWriteRecords < naive.shuffleWriteRecords,
      s"preagg=${preagg.shuffleWriteRecords} naive=${naive.shuffleWriteRecords}")
  }

  test("exact dedup shuffles hashes, never document text (L1 mechanism)") {
    val docs = Tables.documents(spark, sf)
    val viaHash = Metrics.measure(spark,
      docs.select(col("doc_id"), md5(col("text")).as("h"))
        .groupBy(col("h"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n")))
    // the naive formulation groups on the raw text — the whole payload
    // crosses the wire; the hash form must shuffle a small fraction
    val viaText = Metrics.measure(spark,
      docs.groupBy(col("text"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n")))
    assert(viaHash.shuffleWriteBytes > 0 && viaText.shuffleWriteBytes > 0)
    assert(viaHash.shuffleWriteBytes * 2 < viaText.shuffleWriteBytes,
      s"hash=${viaHash.shuffleWriteBytes}B text=${viaText.shuffleWriteBytes}B")
  }

  test("bucketed join shuffles a fraction of the unbucketed equivalent (S14 mechanism)") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // s14's declared query builds (or reuses) the bucketed tables
      val bucketed = Metrics.measure(spark,
        ops.Sources.queries("s14_bucketed_join")(spark, sf))
      val unbucketed = Metrics.measure(spark,
        Tables.orders(spark, sf)
          .join(Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), Det.dsum(col("l_extendedprice")).as("rev")))
      // bucketed: only post-join agg partials shuffle; unbucketed: both
      // fact tables cross the wire on the join key first
      assert(bucketed.shuffleWriteRecords * 2 < unbucketed.shuffleWriteRecords,
        s"bucketed=${bucketed.shuffleWriteRecords} unbucketed=${unbucketed.shuffleWriteRecords}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("broadcast dim join never shuffles the fact table (J1 mechanism)") {
    val orders = Tables.orders(spark, sf)
    val factRows = orders.count()
    val m = Metrics.measure(spark,
      orders.join(broadcast(Tables.customer(spark, sf)),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n")))
    // only the per-partition agg partials shuffle (#segments × #tasks)
    assert(m.shuffleWriteRecords * 10 < factRows,
      s"shuffled=${m.shuffleWriteRecords} factRows=$factRows")
  }
}
