package graft

import graft.ops.Joins
import graft.plans.AsOfJoin
import org.apache.spark.sql.classic
import org.apache.spark.sql.functions._

/** The owned as-of join operator (plans/AsOfJoin.scala): answer parity
  * with the expression-level formulations on real testdata, left-outer
  * null extension, and the plan-shape guarantees that justify owning the
  * operator (no range-expansion join, no window over a unioned stream).
  */
class AsOfJoinSpec extends SparkSpec {

  private def planString(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // finalize any adaptive re-planning before reading the plan
    df.asInstanceOf[classic.Dataset[_]].queryExecution.executedPlan.toString
  }

  test("j8c matches the j8 max-struct formulation row-for-row") {
    val custom = Joins.queries("j8c_asof_custom")(spark, sf).collect().toSeq
    val oracle = Joins.queries("j8_asof")(spark, sf).collect().toSeq
    assert(custom == oracle)
  }

  test("left rows with no prior right row null-extend") {
    // drop every third user's orders from the right side — their events
    // have no as-of match and must null-extend, not carry a stale row
    // from the previous right group the merge drained
    val e = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("ts"))
    val lateOrders = Tables.orders(spark, sf)
      .filter(col("o_custkey") % 3 =!= 0)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    val res = AsOfJoin.asof(spark, e, lateOrders,
      leftBy = "user_id", rightBy = "o_custkey",
      leftTs = "ts", rightTs = "o_orderdate")
    val unmatched = res.filter(col("o_orderkey").isNull).count()
    val matched = res.filter(col("o_orderkey").isNotNull).count()
    assert(unmatched > 0 && matched > 0)
    // null-extension must agree with the expression-level formulation
    val viaExpr = e.join(lateOrders,
        col("user_id") === col("o_custkey") && col("o_orderdate") <= col("ts"), "left")
      .groupBy(col("event_id"))
      .agg(max(struct(col("o_orderdate"), col("o_orderkey"))).as("m"))
      .filter(col("m.o_orderkey").isNull).count()
    assert(unmatched == viaExpr)
  }

  test("plan is the merge exec — no expansion join, no window") {
    val p = planString(Joins.queries("j8c_asof_custom")(spark, sf))
    assert(p.contains("AsOfJoin"))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoop"))
    assert(!p.contains("Window"))
  }

  test("left-side filter pushes through the node into the parquet scan") {
    val e = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("ts"))
    val oRed = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    val df = AsOfJoin.asof(spark, e, oRed,
        leftBy = "user_id", rightBy = "o_custkey",
        leftTs = "ts", rightTs = "o_orderdate")
      .filter(col("user_id") < 5 && col("o_orderkey").isNotNull)
    val p = planString(df)
    // the left conjunct reached the events scan as a data filter...
    assert(p.contains("LessThan(user_id,5)"))
    // ...and the right conjunct stayed above the join (IsNotNull on the
    // as-of output would be wrong to push into orders)
    assert(p.contains("AsOfJoin"))
    // answer parity with filtering before the join manually
    val manual = AsOfJoin.asof(spark, e.filter(col("user_id") < 5), oRed,
        leftBy = "user_id", rightBy = "o_custkey",
        leftTs = "ts", rightTs = "o_orderdate")
      .filter(col("o_orderkey").isNotNull)
      .orderBy(col("event_id")).collect().toSeq
    val auto = df.orderBy(col("event_id")).collect().toSeq
    assert(auto == manual)
  }

  test("answer is invariant to input partitioning") {
    val e = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("ts"))
    val oRed = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    def run(lParts: Int, rParts: Int) =
      AsOfJoin.asof(spark, e.repartition(lParts), oRed.repartition(rParts),
          leftBy = "user_id", rightBy = "o_custkey",
          leftTs = "ts", rightTs = "o_orderdate")
        .select(col("event_id"), col("o_orderkey"))
        .orderBy(col("event_id")).collect().toSeq
    val base = run(1, 1)
    assert(base == run(7, 3))
    assert(base == run(2, 8))
  }

  test("entirely empty right side null-extends every left row") {
    val e = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("ts"))
    val none = Tables.orders(spark, sf).filter(lit(false))
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
    val res = AsOfJoin.asof(spark, e, none,
      leftBy = "user_id", rightBy = "o_custkey",
      leftTs = "ts", rightTs = "o_orderdate")
    assert(res.count() == e.count())
    assert(res.filter(col("o_orderkey").isNotNull).count() == 0)
  }

  test("tiebreak: last right row in (ts, tiebreak) order wins") {
    // un-reduced orders (multiple per (custkey, day)) with an o_orderkey
    // tiebreak must reproduce the winner the pre-reduced path picks
    val e = Tables.events(spark, sf).filter(col("event_id") < 200)
      .select(col("event_id"), col("user_id"), col("ts"))
    val o = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
    val viaTb = AsOfJoin.asof(spark, e, o,
        leftBy = "user_id", rightBy = "o_custkey",
        leftTs = "ts", rightTs = "o_orderdate", tiebreak = Seq("o_orderkey"))
      .select(col("event_id"), col("o_orderkey"), col("o_orderdate"))
      .orderBy(col("event_id"))
      .collect().toSeq
    val oRed = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    val viaReduce = AsOfJoin.asof(spark, e, oRed,
        leftBy = "user_id", rightBy = "o_custkey",
        leftTs = "ts", rightTs = "o_orderdate")
      .select(col("event_id"), col("o_orderkey"), col("o_orderdate"))
      .orderBy(col("event_id"))
      .collect().toSeq
    assert(viaTb == viaReduce)
  }

  test("null right ts / by-key rows never match; null left ts null-extends") {
    import SparkSpec.spark.implicits._
    // right side: (key, ts, v). Null ts and null key rows would sort first
    // and previously acted as -infinity matches.
    val right = Seq(
      (Some(1L), Some(10L), "k1t10"),
      (Some(1L), None, "k1null"),
      (None, Some(5L), "nullkey")
    ).toDF("k", "t", "v")
    val left = Seq(
      (1L, Some(12L), 1),   // matches k1t10
      (1L, Some(9L), 2),    // no right row <= 9 with non-null ts → null
      (2L, Some(50L), 3),   // no key-2 rows (nullkey must not match) → null
      (1L, None, 4)         // null left ts → null-extend
    ).toDF("lk", "lt", "id")
    val res = AsOfJoin.asof(spark, left, right,
        leftBy = "lk", rightBy = "k", leftTs = "lt", rightTs = "t")
      .select(col("id"), col("v")).collect()
      .map(r => r.getInt(0) -> Option(r.getString(1))).toMap
    assert(res == Map(1 -> Some("k1t10"), 2 -> None, 3 -> None, 4 -> None))
  }

  test("mismatched key/ts types up-cast when lossless, else fail loudly") {
    import SparkSpec.spark.implicits._
    // INT right key vs BIGINT left key: must align (previously compared
    // raw physical encodings) — k=1 INT must match k=1L BIGINT
    val right = Seq((1, 10L, "m")).toDF("k", "t", "v")
    val left = Seq((1L, 20L, 7)).toDF("lk", "lt", "id")
    val res = AsOfJoin.asof(spark, left, right,
      leftBy = "lk", rightBy = "k", leftTs = "lt", rightTs = "t")
    assert(res.select("v").collect().map(_.getString(0)).toSeq == Seq("m"))
    // incomparable pair (string ts vs bigint ts) must throw at analysis
    val badRight = Seq((1L, "2020-01-01", "m")).toDF("k", "t", "v")
    intercept[IllegalArgumentException] {
      AsOfJoin.asof(spark, left, badRight,
        leftBy = "lk", rightBy = "k", leftTs = "lt", rightTs = "t")
    }
  }

  test("forward direction matches the expression formulation row-for-row (j8d)") {
    val e = Tables.events(spark, sf).filter(col("event_id") < 2000)
      .select(col("event_id"), col("user_id"), col("ts"))
    val oRed = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    val viaOp = AsOfJoin.asof(spark, e, oRed,
        leftBy = "user_id", rightBy = "o_custkey",
        leftTs = "ts", rightTs = "o_orderdate", direction = "forward")
      .select(col("event_id"), col("o_orderkey"))
      .orderBy(col("event_id")).collect().toSeq
    val viaExpr = e.join(oRed,
        col("user_id") === col("o_custkey") && col("o_orderdate") >= col("ts"), "left")
      .groupBy(col("event_id"))
      .agg(min_by(col("o_orderkey"),
        struct(col("o_orderdate"), -col("o_orderkey"))).as("o_orderkey"))
      .orderBy(col("event_id")).collect().toSeq
    assert(viaOp.nonEmpty && viaOp == viaExpr)
  }

  test("forward: one right row serves many left rows; past-the-end null-extends") {
    import SparkSpec.spark.implicits._
    val right = Seq((1L, 100L, "r100"), (1L, 200L, "r200")).toDF("k", "t", "v")
    val left = Seq(
      (1L, 10L, 1), (1L, 50L, 2), (1L, 100L, 3),   // all → r100 (shared head)
      (1L, 101L, 4),                               // → r200
      (1L, 201L, 5)                                // past the end → null
    ).toDF("lk", "lt", "id")
    val res = AsOfJoin.asof(spark, left, right,
        leftBy = "lk", rightBy = "k", leftTs = "lt", rightTs = "t",
        direction = "forward")
      .select(col("id"), col("v")).collect()
      .map(r => r.getInt(0) -> Option(r.getString(1))).toMap
    assert(res == Map(1 -> Some("r100"), 2 -> Some("r100"),
      3 -> Some("r100"), 4 -> Some("r200"), 5 -> None))
  }
}
