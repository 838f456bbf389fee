package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF (SURVEY §2.10): elementwise centroid of `array<float>`
  * vectors.
  *
  * Determinism: each float is quantized to a scaled long with
  * floor(v·1e6 + 0.5) — an exact IEEE computation — and the buffer sums
  * longs, so merge order cannot change the result (and the output matches
  * the same formula expressed in SQL, making the UDAF oracle-checkable).
  *
  * Scale note: the buffer is a fixed 64-long array + count; partial
  * aggregation merges buffers map-side, so 100 TB of vectors reduce to
  * #groups × #partitions buffers on the wire.
  */
object CentroidAggregator {

  case class Buf(var sums: Array[Long], var n: Long)

  val of: Aggregator[Seq[Float], Buf, Seq[Double]] =
    new Aggregator[Seq[Float], Buf, Seq[Double]] {
      def zero: Buf = Buf(Array.emptyLongArray, 0L)

      private def quantize(v: Float): Long =
        math.floor(v.toDouble * 1000000.0 + 0.5).toLong

      def reduce(b: Buf, v: Seq[Float]): Buf = {
        if (b.sums.isEmpty) b.sums = new Array[Long](v.length)
        var i = 0
        while (i < v.length && i < b.sums.length) {
          b.sums(i) += quantize(v(i)); i += 1
        }
        b.n += 1
        b
      }

      def merge(x: Buf, y: Buf): Buf = {
        if (x.sums.isEmpty) y
        else if (y.sums.isEmpty) x
        else {
          var i = 0
          while (i < x.sums.length) { x.sums(i) += y.sums(i); i += 1 }
          x.n += y.n
          x
        }
      }

      def finish(b: Buf): Seq[Double] =
        b.sums.map(s => s.toDouble / b.n / 1000000.0).toSeq

      def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      def outputEncoder: Encoder[Seq[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
    }

  /** Column-form centroid aggregate. */
  def centroid(c: Column): Column = udaf(of).apply(c)
}
