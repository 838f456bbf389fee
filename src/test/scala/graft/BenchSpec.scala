package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Proves the bench harness fails LOUDLY on a broken query (r3 verdict
  * "what's wrong" #1): a throwing query must surface in the errors list
  * and the JSON line, never silently bench as a ~0 s success.
  */
class BenchSpec extends SparkSpec {

  private val goodQuery: (SparkSession, String) => DataFrame =
    (s, dir) => s.read.parquet(s"$dir/region.parquet")
  private val brokenQuery: (SparkSession, String) => DataFrame =
    (s, _) => s.read.parquet("/nonexistent/definitely/missing.parquet")

  test("broken query is recorded in errors, not swallowed") {
    val (results, errors) = Bench.run(spark, sf,
      Map("zz_broken" -> brokenQuery, "aa_good" -> goodQuery), reps = 1)
    assert(results.map(_._1) == Seq("aa_good", "zz_broken"))
    assert(errors.nonEmpty, "a throwing query must produce an error entry")
    assert(errors.forall(_.startsWith("zz_broken:")))
  }

  test("clean run has no errors field; broken run emits one") {
    val clean = Bench.jsonLine(Seq("aa_good" -> 0.1), Nil, sf)
    assert(!clean.contains("\"errors\""))
    val dirty = Bench.jsonLine(Seq("aa_good" -> 0.1),
      Seq("zz_broken: AnalysisException: path does not exist"), sf)
    assert(dirty.contains("\"errors\":[\"zz_broken: AnalysisException"))
  }

  test("error messages are JSON-escaped") {
    val line = Bench.jsonLine(Nil, Seq("q: boom \"quoted\"\npath\\x"), sf)
    assert(line.contains("\\\"quoted\\\""))
    assert(!line.contains("\n"))
    assert(line.contains("\\\\x"))
  }
}
