package graft

import graft.presto.{PrestoFunctions => P}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** The Presto-named facade behaves per the published Trino semantics. */
class PrestoFunctionsSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  test("strpos: 1-based, 0 when absent") {
    val out = Seq("hello").toDF("s")
      .select(P.strpos($"s", "ll"), P.strpos($"s", "zz")).as[(Long, Long)].head()
    assert(out == ((3L, 0L)))
  }

  test("cardinality + array_join + split_literal") {
    val out = Seq("a|b|c").toDF("s")
      .select(P.cardinality(P.split_literal($"s", "|")).as("n"),
        P.array_join(P.split_literal($"s", "|"), "-").as("joined"))
      .as[(Long, String)].head()
    assert(out == ((3L, "a-b-c")))
  }

  test("codepoint/chr round-trip") {
    val out = Seq(("A", 66)).toDF("s", "cp")
      .select(P.codepoint($"s"), P.chr($"cp")).as[(Int, String)].head()
    assert(out == ((65, "B")))
  }

  test("date_diff across units") {
    val df = Seq((Timestamp.valueOf("2024-01-01 00:00:00"),
                  Timestamp.valueOf("2024-03-01 12:30:00"))).toDF("a", "b")
    val (days, hours, months) = df.select(
      P.date_diff("day", $"a", $"b"),
      P.date_diff("hour", $"a", $"b"),
      P.date_diff("month", $"a", $"b")).as[(Long, Long, Long)].head()
    assert(days == 60 && hours == 1452 && months == 2)
  }

  test("element_at_safe: null out-of-bounds instead of ANSI error") {
    val out = Seq(Seq(1, 2, 3)).toDF("a")
      .select(P.element_at_safe($"a", 10)).as[Option[Int]].head()
    assert(out.isEmpty)
  }

  test("approx_distinct within tolerance; array_agg collects") {
    val df = (1 to 1000).map(i => i % 97).toDF("v")
    val approx = df.select(P.approx_distinct($"v")).as[Long].head()
    assert(math.abs(approx - 97) <= 5)
    val agg = Seq(1, 2, 2).toDF("v").select(array_sort(P.array_agg($"v"))).as[Seq[Int]].head()
    assert(agg == Seq(1, 2, 2))
  }
}
