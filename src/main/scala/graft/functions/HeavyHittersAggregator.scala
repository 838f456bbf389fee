package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import scala.collection.mutable

/** Misra–Gries heavy hitters sketch as a typed UDAF (Presto
  * `approx_most_frequent` shape; Misra & Gries 1982, "Finding repeated
  * elements" — public algorithm).
  *
  * Bounded memory: at most `capacity` (key, count) counters per buffer,
  * whatever the input cardinality. The standard guarantee holds: any key
  * with true frequency > n/(capacity+1) is present in the final sketch,
  * and estimated counts undershoot true counts by at most n/(capacity+1).
  * Merging two sketches (Agarwal et al., "Mergeable summaries") keeps the
  * combined error bound, which is exactly what Spark's partial+final
  * aggregation needs: map-side partials reduce 100 TB of rows to
  * #groups × #partitions fixed-size buffers — no raw keys cross the wire.
  *
  * Approximate by nature → declared without a value oracle; the exact
  * top-k companion query is the correctness anchor, and the sketch's
  * guarantee (all sufficiently-frequent keys surface) is unit-tested.
  */
object HeavyHittersAggregator {

  case class Buf(var keys: Array[String], var counts: Array[Long])

  def of(capacity: Int): Aggregator[String, Buf, Seq[String]] =
    new Aggregator[String, Buf, Seq[String]] {
      def zero: Buf = Buf(Array.empty, Array.empty)

      private def toMap(b: Buf): mutable.LinkedHashMap[String, Long] = {
        val m = mutable.LinkedHashMap.empty[String, Long]
        var i = 0
        while (i < b.keys.length) { m.put(b.keys(i), b.counts(i)); i += 1 }
        m
      }

      private def fromMap(m: mutable.LinkedHashMap[String, Long]): Buf =
        Buf(m.keys.toArray, m.values.toArray)

      /** Misra–Gries step: increment if tracked, insert if room, else
        * decrement ALL counters (dropping zeros). */
      private def offer(m: mutable.LinkedHashMap[String, Long],
          k: String, w: Long): Unit = {
        if (m.contains(k)) m.update(k, m(k) + w)
        else if (m.size < capacity) m.put(k, w)
        else {
          // decrement all by min(w, min-counter); repeat until absorbed
          var rem = w
          while (rem > 0) {
            if (m.contains(k)) { m.update(k, m(k) + rem); rem = 0 }
            else if (m.size < capacity) { m.put(k, rem); rem = 0 }
            else {
              val dec = math.min(rem, m.values.min)
              val dead = mutable.ArrayBuffer.empty[String]
              m.mapValuesInPlace((_, c) => c - dec)
              m.foreach { case (key, c) => if (c == 0) dead += key }
              dead.foreach(m.remove)
              rem -= dec
            }
          }
        }
      }

      def reduce(b: Buf, k: String): Buf = {
        // NULL inputs are ignored, matching Trino's aggregate-function
        // convention (a null key would otherwise surface as a literal
        // "null" entry in the approx_most_frequent map).
        if (k == null) b
        else { val m = toMap(b); offer(m, k, 1L); fromMap(m) }
      }

      def merge(x: Buf, y: Buf): Buf = {
        val m = toMap(x)
        var i = 0
        while (i < y.keys.length) { offer(m, y.keys(i), y.counts(i)); i += 1 }
        fromMap(m)
      }

      /** Deterministic encoding: entries sorted by (-count, key) as
        * "key:count" strings (ties broken lexically). */
      def finish(b: Buf): Seq[String] = {
        val pairs = b.keys.zip(b.counts).sortBy { case (k, c) => (-c, k) }
        pairs.map { case (k, c) => s"$k:$c" }.toSeq
      }

      def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      def outputEncoder: Encoder[Seq[String]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
    }

  /** Column-form heavy-hitters aggregate with the given counter budget. */
  def heavyHitters(c: Column, capacity: Int): Column = udaf(of(capacity)).apply(c)
}
