package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Algebraic laws over ScalaCheck-generated inputs (SURVEY §5.3).
  * Raw Gen + fixed seeds (the scalatest-plus bridge artifact isn't in the
  * offline cache); generators stay tiny so each iteration is one fast job.
  */
class PropertySpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def forAllN[A](gen: Gen[A], n: Int = 5)(f: A => Unit): Unit =
    (1 to n).foreach { i =>
      f(gen.pureApply(Gen.Parameters.default, Seed(42L + i)))
    }

  private val rows = Gen.listOfN(25, Gen.zip(Gen.chooseNum(0L, 8L), Gen.chooseNum(-50, 50)))

  test("unionAll count law: |A union-all B| = |A| + |B|") {
    forAllN(Gen.zip(rows, rows)) { case (a, b) =>
      val da = a.toDF("k", "v"); val db = b.toDF("k", "v")
      assert(da.unionAll(db).count() == da.count() + db.count())
    }
  }

  test("semi + anti partition law: semi(A,B) + anti(A,B) = A") {
    forAllN(Gen.zip(rows, rows)) { case (a, b) =>
      val da = a.toDF("k", "v"); val db = b.toDF("k", "v")
      val semi = da.join(db.select("k").distinct(), Seq("k"), "left_semi").count()
      val anti = da.join(db.select("k").distinct(), Seq("k"), "left_anti").count()
      assert(semi + anti == da.count())
    }
  }

  test("exact decimal sum law: Det.dsum equals BigDecimal ground truth") {
    val cents = Gen.listOfN(30, Gen.chooseNum(-100000L, 100000L))
    forAllN(cents) { cs =>
      val doubles = cs.map(_ / 100.0)
      val expected = cs.map(BigDecimal(_)).sum / 100
      val got = doubles.toDF("v").agg(Det.dsum($"v")).as[Double].head()
      assert(got == expected.toDouble)
    }
  }

  test("minhash agreement is symmetric; identical inputs agree fully") {
    import graft.functions.{TextFunctions => TF}
    val word = Gen.listOfN(12, Gen.oneOf("spark", "row", "scan", "agg", "key", "col"))
      .map(_.mkString(" "))
    forAllN(Gen.zip(word, word), 3) { case (a, b) =>
      val df = Seq((1L, a), (2L, b), (3L, a)).toDF("id", "t")
        .select($"id", TF.minhashSignature(
          TF.shingleHashes(TF.charShingles($"t", 4)), 16).as("sig"))
      val sigs = df.orderBy("id").as[(Long, Seq[Long])].collect()
      val agreeAB = sigs(0)._2.zip(sigs(1)._2).count { case (x, y) => x == y }
      val agreeBA = sigs(1)._2.zip(sigs(0)._2).count { case (x, y) => x == y }
      assert(agreeAB == agreeBA)
      assert(sigs(0)._2 == sigs(2)._2) // identical text -> identical signature
    }
  }
}
