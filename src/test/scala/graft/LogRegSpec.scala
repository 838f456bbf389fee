package graft

import org.apache.spark.sql.functions._

/** l69 — the trained hashed-bigram logistic-regression classifier
  * (r14, the fastText analogue next to l68b's Naive Bayes). The three
  * properties that make an ITERATIVE trainer shippable without a SQL
  * oracle:
  *
  *  1. determinism — q6 fixed-point weights, per-doc residuals
  *     quantized to integers BEFORE the gradient sum (every aggregate
  *     an exact integer sum, association-order-free), integer floorDiv
  *     updates: two full runs must be BIT-identical;
  *  2. convergence — the planted bigram-only signal separates the
  *     training corpus ≥ 99% after 5 full-batch steps;
  *  3. signal direction — positive docs score positive, negatives
  *     negative (not merely "accurate via an inverted threshold").
  */
class LogRegSpec extends SparkSpec {

  private val sfTiny = "/root/testdata/sf0.001"

  test("l69 is bit-deterministic across full re-runs") {
    val spark = SparkSpec.spark
    val q = ops.LlmOps.queries("l69_logreg_bigram_quality")
    val a = q(spark, sfTiny).select("doc_id", "score_q6")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = q(spark, sfTiny).select("doc_id", "score_q6")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a == b, "two training runs diverged")
    assert(a.nonEmpty)
  }

  test("l69 separates the planted bigram signal with correct sign") {
    val spark = SparkSpec.spark
    val rows = ops.LlmOps.queries("l69_logreg_bigram_quality")(spark, sfTiny)
      .select(col("pos"), col("score_q6"), col("correct"))
      .collect()
    val acc = rows.count(_.getBoolean(2)).toDouble / rows.length
    assert(acc >= 0.99, s"training accuracy $acc")
    // direction: mean positive score > 0 > mean negative score
    val posScores = rows.filter(_.getBoolean(0)).map(_.getLong(1))
    val negScores = rows.filterNot(_.getBoolean(0)).map(_.getLong(1))
    assert(posScores.nonEmpty && negScores.nonEmpty)
    assert(posScores.sum / posScores.length > 0)
    assert(negScores.sum / negScores.length < 0)
  }
}
