package graft

import org.apache.spark.sql.functions._

/** l39 — the distributed PCA core: planted-component recovery, the
  * eigen residual on real embeddings, the sign convention, and
  * run-to-run determinism (the merge-order-independent quantized-sum
  * covariance is what makes an iterative eigen-solve reproducible on a
  * cluster).
  */
class PcaSpec extends SparkSpec {

  test("l39 recovers a planted dominant direction") {
    import SparkSpec.spark.implicits._
    // x_i = t_i * dir + small deterministic off-axis wiggle; the top PC
    // must align with dir (cos² > 0.99)
    val dim = 8
    val dir = Array.tabulate(dim)(i => if (i % 2 == 0) 0.6 else -0.37)
    val nrm = math.sqrt(dir.map(x => x * x).sum)
    val d0 = dir.map(_ / nrm)
    val rows = (0 until 200).map { k =>
      val t = (k % 21 - 10).toDouble / 4.0
      val vec = Array.tabulate(dim)(i =>
        (t * d0(i) + 0.01 * math.sin(k * 7 + i)).toFloat).toSeq
      (k.toLong, vec)
    }
    val df = rows.toDF("vec_id", "embedding")
    val (_, v) = ops.LlmOps.principalComponent(df)
    val cos = v.zip(d0).map { case (a, b) => a * b }.sum
    assert(cos * cos > 0.99, s"cos^2=${cos * cos}")
  }

  test("l39 component is an eigenvector of the real covariance (residual small)") {
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val (mu, v) = ops.LlmOps.principalComponent(e)
    // rebuild the covariance the same way and check ‖Cv − λv‖ ≤ 1e-3·λ
    val agg = e.agg(
      graft.functions.SecondMomentAggregator
        .secondMoment(col("embedding")).as("m2")).collect().head
    val m2 = agg.getSeq[Double](0).toArray
    val n = mu.length
    val cov = Array.tabulate(n, n)((i, j) => m2(i * n + j) - mu(i) * mu(j))
    val cv = Array.tabulate(n)(i => (0 until n).map(j => cov(i)(j) * v(j)).sum)
    val lambda = v.zip(cv).map { case (a, b) => a * b }.sum
    assert(lambda > 0, s"top eigenvalue must be positive, got $lambda")
    val resid = math.sqrt(
      cv.zip(v).map { case (c, x) => (c - lambda * x) * (c - lambda * x) }.sum)
    assert(resid <= 1e-3 * lambda, s"residual $resid vs lambda $lambda")
    // sign convention: first non-negligible component positive
    val lead = v.indexWhere(x => math.abs(x) > 1e-9)
    assert(v(lead) > 0)
  }

  test("l39 query is deterministic across runs and 20 rows") {
    def run() = ops.LlmOps.queries("l39_pca_projection")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val a = run()
    val b = run()
    assert(a == b)
    assert(a.size == 20 && a.map(_._1) == (1L to 20L))
  }
}
