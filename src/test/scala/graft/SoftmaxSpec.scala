package graft

import org.apache.spark.sql.functions._

/** l70 — the multi-class one-vs-rest classifier (r15), completing the
  * classifier tier lexicon (l30) → NB (l68/l68b) → binary logreg (l69)
  * → multi-class. Same shippability contract as LogRegSpec, per class:
  *
  *  1. determinism — K independent q6 fixed-point weight vectors with
  *     quantized residuals and floorDiv updates: two full runs must be
  *     BIT-identical on every per-class score;
  *  2. convergence — the class-cyclic bigram-only planted signal
  *     (shared unigrams, class-unique bigram ORDER) separates the
  *     corpus ≥ 99% after 5 joint full-batch steps;
  *  3. one-vs-rest sign — for every class k, classifier k scores its
  *     own-class docs positive on average and rest-class docs negative
  *     (not merely "argmax-accurate via offset scores").
  */
class SoftmaxSpec extends SparkSpec {

  private val sfTiny = "/root/testdata/sf0.001"

  test("l70 is bit-deterministic across full re-runs") {
    val spark = SparkSpec.spark
    val q = ops.LlmOps.queries("l70_softmax_domain_classifier")
    def run() = q(spark, sfTiny)
      .select("doc_id", "s0_q6", "s1_q6", "s2_q6")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val a = run(); val b = run()
    assert(a == b, "two training runs diverged")
    assert(a.nonEmpty)
  }

  test("l70 separates the class-cyclic bigram signal with OvR sign") {
    val spark = SparkSpec.spark
    val rows = ops.LlmOps.queries("l70_softmax_domain_classifier")(
        spark, sfTiny)
      .select(col("label"), col("s0_q6"), col("s1_q6"), col("s2_q6"),
        col("correct"))
      .collect()
    val acc = rows.count(_.getBoolean(4)).toDouble / rows.length
    assert(acc >= 0.99, s"training accuracy $acc")
    // one-vs-rest direction, every class: own-class mean > 0 > rest mean
    for (k <- 0 until 3) {
      val own = rows.filter(_.getInt(0) == k).map(_.getLong(k + 1))
      val rest = rows.filter(_.getInt(0) != k).map(_.getLong(k + 1))
      assert(own.nonEmpty && rest.nonEmpty)
      assert(own.sum / own.length > 0, s"class $k own-mean not positive")
      assert(rest.sum / rest.length < 0, s"class $k rest-mean not negative")
    }
  }
}
