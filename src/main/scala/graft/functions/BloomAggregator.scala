package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF (SURVEY §2.10): executor-side Bloom-filter construction —
  * OR-merge a fixed-width bit array over (h1, h2) hash pairs with
  * Kirsch–Mitzenmacher double hashing (k = 4 probe positions
  * pos_i = (h1 + i·h2) mod m, the same pmod-then-combine arithmetic the
  * l63 SQL probe uses, so membership is bit-identical across build and
  * probe).
  *
  * Scale note (r9 verdict #7): the r8 form collected every benchmark
  * shingle hash to the driver and looped — driver memory O(#shingles).
  * Here the bit array is built WHERE THE DATA IS: each partition
  * reduces its hash pairs into a local m-bit buffer, partial buffers
  * OR-merge map-side, and the driver only ever sees the final m/64
  * longs. m must be sized up-front (bits = 10 × #keys for ~1.2% FP at
  * k = 4), which costs one 1-row count aggregate — bounded driver
  * state, same as every other scalar in the family.
  *
  * Determinism: bitwise OR is commutative/associative and every probe
  * position is exact integer arithmetic — merge order cannot change the
  * result, making the executor-built array equal LONG-FOR-LONG to a
  * single-threaded driver build over the same keys (asserted in
  * ScaleShapeSpec).
  */
object BloomAggregator {

  case class Buf(var bits: Array[Long])

  /** k = 4 double-hashed probes, matching l63's SQL probe expression. */
  private def setBits(bits: Array[Long], h1: Long, h2: Long, m: Long): Unit = {
    val b1 = ((h1 % m) + m) % m
    val b2 = ((h2 % m) + m) % m
    var i = 0L
    while (i < 4) {
      val pos = (b1 + i * b2) % m
      bits((pos / 64).toInt) |= (1L << (pos % 64).toInt)
      i += 1
    }
  }

  def of(m: Long): Aggregator[(Long, Long), Buf, Seq[Long]] = {
    require(m >= 64 && m % 64 == 0,
      s"bloom width m must be a positive multiple of 64, got $m")
    new Aggregator[(Long, Long), Buf, Seq[Long]] {
      private val words = (m / 64).toInt
      def zero: Buf = Buf(new Array[Long](words))

      def reduce(b: Buf, v: (Long, Long)): Buf = {
        setBits(b.bits, v._1, v._2, m); b
      }

      def merge(x: Buf, y: Buf): Buf = {
        var i = 0
        while (i < words) { x.bits(i) |= y.bits(i); i += 1 }
        x
      }

      def finish(b: Buf): Seq[Long] = b.bits.toSeq

      def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      def outputEncoder: Encoder[Seq[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    }
  }

  /** Column-form bloom build over (h1, h2) hash-pair columns; m is the
    * bit width (a multiple of 64, sized from a prior 1-row count). */
  def bloomBits(m: Long, h1: Column, h2: Column): Column =
    udaf(of(m)).apply(h1, h2)
}
