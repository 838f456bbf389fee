package graft

import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.functions._

class VectorFunctionsSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def df2(a: Seq[Float], b: Seq[Float]) =
    Seq((a, b)).toDF("a", "b")

  test("cosine: identical=1, orthogonal=0, opposite=-1") {
    val x = Seq(1f, 2f, 3f)
    assert(math.abs(df2(x, x).select(VF.cosine($"a", $"b")).as[Double].head() - 1.0) < 1e-12)
    assert(df2(Seq(1f, 0f), Seq(0f, 1f)).select(VF.cosine($"a", $"b")).as[Double].head() == 0.0)
    assert(math.abs(df2(x, x.map(-_)).select(VF.cosine($"a", $"b")).as[Double].head() + 1.0) < 1e-12)
  }

  test("l2Distance matches hand computation") {
    val d = df2(Seq(0f, 3f), Seq(4f, 0f)).select(VF.l2Distance($"a", $"b")).as[Double].head()
    assert(d == 5.0)
  }

  test("normalize yields unit norm") {
    val n = df2(Seq(3f, 4f), Seq(0f, 0f))
      .select(VF.norm2(VF.normalize($"a").cast("array<float>"))).as[Double].head()
    assert(math.abs(n - 1.0) < 1e-6)
  }

  test("brute-force kNN matches driver-side exact ranking (L3 property)") {
    // NB: testdata embeddings are random unit vectors (labels carry NO
    // geometric signal — verified), so correctness is asserted against an
    // exact local computation, not label purity.
    val e = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      dot / (na * nb)
    }
    val expected = (for ((qid, qv) <- e if qid < 10) yield {
      val top = e.filter(_._1 != qid)
        .map { case (cid, cv) => (cid, cos(qv, cv)) }
        .sortBy { case (cid, s) => (-s, cid) }.take(5).map(_._1)
      qid -> top.toSeq
    }).toMap
    val got = ops.LlmOps.knn(spark, sf, 5)
      .select($"qid", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, arr) => q -> arr.map(_._2).toSeq }
    assert(got == expected)
  }
}
