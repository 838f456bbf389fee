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

  test("stdout line fits the driver's 2000-char tail at 250+ queries") {
    // BENCH_r01–r05 all show parsed:null — the full 215-entry map is ~7 KB
    // against a 2000-char output tail. The compact line must stay complete.
    val many = (1 to 250).map(i => f"q$i%03d_some_operator_name" -> i * 0.01)
    val line = Bench.jsonLine(many, Nil, sf)
    assert(line.length <= 1600, s"line too long: ${line.length}")
    assert(line.startsWith("{\"metric\":\"total\",\"value\":"))
    assert(line.endsWith(s""","sf":"$sf"}"""))
    assert(line.contains("\"queries_n\":250"))
    // slowest query is always present; total is the sum over ALL queries
    assert(line.contains("\"q250_some_operator_name\":2.5"))
    val expectedTotal = many.map(_._2).sum
    val value = line.split("\"value\":")(1).split(",")(0).toDouble
    assert(math.abs(value - expectedTotal) < 0.01)
  }

  test("full detail JSON keeps every query at full precision") {
    val many = (1 to 250).map(i => f"q$i%03d" -> i * 0.01)
    val full = Bench.fullJson(many, Nil, sf)
    assert(many.forall { case (k, _) => full.contains("\"" + k + "\":") })
  }
}
