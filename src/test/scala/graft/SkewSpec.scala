package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._

/** Salting preserves answers while spreading hot keys (SURVEY §4). */
class SkewSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  // pathological: 90% of rows share one key
  private def skewed = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong else 7L, i))
    .toDF("k", "v")

  test("saltedCounts == plain groupBy counts on a skewed key") {
    val direct = skewed.groupBy($"k").agg(count(lit(1)).as("n"))
      .orderBy($"k").as[(Long, Long)].collect()
    val salted = Skew.saltedCounts(skewed, $"k", 8)
      .orderBy($"k").as[(Long, Long)].collect()
    assert(salted.sameElements(direct))
  }

  test("saltedJoin == plain join on a skewed fact key") {
    val dim = (1 to 2000).map(i => (i.toLong, s"name$i")).toDF("id", "name")
    val direct = skewed.join(dim, $"k" === $"id")
      .groupBy($"name").agg(count(lit(1)).as("n"))
      .orderBy($"name").as[(String, Long)].collect()
    val salted = Skew.saltedJoin(skewed, $"k", dim, $"id", 8)
      .groupBy($"name").agg(count(lit(1)).as("n"))
      .orderBy($"name").as[(String, Long)].collect()
    assert(salted.sameElements(direct))
  }
}
