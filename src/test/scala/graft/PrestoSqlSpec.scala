package graft

import graft.presto.PrestoSql
import org.apache.spark.sql.types.{DoubleType, TimestampType}

/** Presto SQL dialect entry point: text translation correctness (literal
  * protection, identifier quoting, function mapping) and end-to-end
  * execution of dialect statements through spark.sql.
  */
class PrestoSqlSpec extends SparkSpec {

  test("double-quoted identifiers become backticks; literals untouched") {
    assert(PrestoSql.translate("""SELECT "a b" FROM t WHERE x = 'it''s "q"'""")
      == """SELECT `a b` FROM t WHERE x = 'it''s "q"'""")
  }

  test("function names inside string literals are never rewritten") {
    assert(PrestoSql.translate("SELECT 'split(' || split(x, ',')[1] FROM t")
      == "SELECT 'split(' || presto_split(x, ',')[1] FROM t")
  }

  test("unit-form date_diff/date_add map to timestampdiff/timestampadd") {
    assert(PrestoSql.translate("SELECT date_diff('hour', a, b), date_add('day', 1, c)")
      == "SELECT timestampdiff(hour, a, b), timestampadd(day, 1, c)")
  }

  test("renames: approx_distinct, arbitrary, from_unixtime, TRY, VARCHAR") {
    assert(PrestoSql.translate(
      "SELECT approx_distinct(x), arbitrary(y), from_unixtime(e), TRY(1/z), CAST(w AS VARCHAR)")
      == "SELECT approx_count_distinct(x), any_value(y), timestamp_seconds(e), try_eval(1/z), CAST(w AS STRING)")
  }

  test("split is literal-delimiter (Presto), not regex (Spark); split_part untouched") {
    val df = PrestoSql.sql(spark, "SELECT split('a.b.c', '.') AS parts, split_part('a.b.c', '.', 2) AS p2")
    val r = df.collect()(0)
    assert(r.getSeq[String](0) == Seq("a", "b", "c"))
    assert(r.getString(1) == "b")
  }

  test("strpos is 1-based with 0 for absent; to_unixtime/from_unixtime are typed") {
    val df = PrestoSql.sql(spark,
      "SELECT strpos('hello', 'll') AS p, strpos('hello', 'z') AS z, " +
        "to_unixtime(TIMESTAMP '1970-01-02 00:00:00') AS u, from_unixtime(86400) AS ts")
    val r = df.collect()(0)
    assert(r.getLong(0) == 3L && r.getLong(1) == 0L)
    assert(r.getDouble(2) == 86400.0)
    assert(df.schema("u").dataType == DoubleType)
    assert(df.schema("ts").dataType == TimestampType)
  }

  test("TRY captures runtime errors as null, not analysis errors") {
    val r = PrestoSql.sql(spark,
      "SELECT TRY(CAST('xx' AS INT) + 1) AS bad, TRY(1 + 1) AS good").collect()(0)
    assert(r.isNullAt(0) && r.getInt(1) == 2)
  }

  test("approx_distinct and aggregate renames run end-to-end on testdata") {
    Tables.registerAll(spark, sf)
    val df = PrestoSql.sql(spark,
      """SELECT "o_orderstatus", approx_distinct("o_custkey") AS ad, arbitrary("o_orderkey") AS any_k
        |FROM orders GROUP BY "o_orderstatus" ORDER BY "o_orderstatus"""".stripMargin)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(r => r.getLong(1) > 0))
  }

  test("dialect adapters inline into codegen (no UDF nodes in the plan)") {
    PrestoSql.registerDialect(spark)
    Tables.registerAll(spark, sf)
    val df = PrestoSql.sql(spark,
      "SELECT strpos(\"event_type\", 'c') AS p FROM events WHERE \"event_id\" < 100")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan.take(1500))
    assert(plan.contains("WholeStageCodegen") || plan.contains("locate") || plan.contains("Locate"))
  }
}
