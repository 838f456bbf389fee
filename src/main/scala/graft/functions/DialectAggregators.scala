package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable aggregation kernels behind Presto-dialect aggregate names
  * that Spark lacks as builtins (`checksum`, `histogram`,
  * `multimap_agg` — SURVEY §2.4 A17/A12/A16 exist as NATIVE declared
  * queries composed from Spark primitives; these kernels are the
  * DIALECT form, so a migrating script's `SELECT checksum(x)` runs
  * unmodified). All inputs arrive as the varchar rendering (the
  * rewriter wraps arguments in CAST(… AS STRING) — same documented
  * convention as the approx_most_frequent adapter).
  *
  * Scale design: each buffer is O(distinct-values-in-group) for
  * histogram/multimap (exactly Trino's memory shape for these
  * functions) and O(1) for checksum; merges are associative and
  * commutative, so partial aggregation runs map-side and only buffers
  * cross the shuffle.
  */
object DialectAggregators {

  /** FNV-1a 64-bit over UTF-8 bytes — deterministic across JVMs,
    * partitions, and runs (no JVM-seeded hashing anywhere near the
    * gate). */
  private[functions] def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  case class CkBuf(var xor: Long, var sum: Long, var cnt: Long)

  /** Trino `checksum(x)`: an order-INSENSITIVE digest of the value
    * multiset (xor misses multiplicity flips that cancel, a wrapping
    * sum misses permutations of the same bag — carrying both plus the
    * count catches each other's blind spots; same construction as the
    * native a17 query). NULL contributes a fixed tag, like Trino's
    * null-sensitive checksum. Output is a 16-hex-char string (Trino
    * renders varbinary — representation documented). */
  val checksumAgg: Aggregator[String, CkBuf, String] =
    new Aggregator[String, CkBuf, String] {
      def zero: CkBuf = CkBuf(0L, 0L, 0L)
      def reduce(b: CkBuf, a: String): CkBuf = {
        val h = if (a == null) 0x9e3779b97f4a7c15L else fnv64(a)
        b.xor ^= h; b.sum += h; b.cnt += 1
        b
      }
      def merge(x: CkBuf, y: CkBuf): CkBuf =
        CkBuf(x.xor ^ y.xor, x.sum + y.sum, x.cnt + y.cnt)
      def finish(b: CkBuf): String =
        f"${b.sum ^ java.lang.Long.rotateLeft(b.xor, 17) ^ b.cnt}%016x"
      def bufferEncoder: Encoder[CkBuf] = Encoders.product[CkBuf]
      def outputEncoder: Encoder[String] = Encoders.STRING
    }

  /** Sorted parallel-array multiset: deterministic merge order, product-
    * encodable, and the finish step emits entries in key order so map
    * rendering is stable. */
  case class HBuf(var keys: Array[String], var counts: Array[Long])

  private def mergeSorted(x: HBuf, y: HBuf): HBuf = {
    val ks = Array.newBuilder[String]
    val cs = Array.newBuilder[Long]
    var i = 0; var j = 0
    while (i < x.keys.length || j < y.keys.length) {
      if (j >= y.keys.length ||
          (i < x.keys.length && x.keys(i) <= y.keys(j))) {
        if (j < y.keys.length && x.keys(i) == y.keys(j)) {
          ks += x.keys(i); cs += x.counts(i) + y.counts(j); i += 1; j += 1
        } else { ks += x.keys(i); cs += x.counts(i); i += 1 }
      } else { ks += y.keys(j); cs += y.counts(j); j += 1 }
    }
    HBuf(ks.result(), cs.result())
  }

  /** Trino `histogram(x)`: value → occurrence count per group. NULLs
    * are ignored (a map key cannot be NULL). Keys are the varchar
    * rendering of the input — documented, like approx_most_frequent. */
  val histogramAgg: Aggregator[String, HBuf, Map[String, Long]] =
    new Aggregator[String, HBuf, Map[String, Long]] {
      def zero: HBuf = HBuf(Array.empty, Array.empty)
      def reduce(b: HBuf, a: String): HBuf =
        if (a == null) b
        else {
          val at = java.util.Arrays.binarySearch(
            b.keys.asInstanceOf[Array[AnyRef]], a)
          if (at >= 0) { b.counts(at) += 1; b }
          else mergeSorted(b, HBuf(Array(a), Array(1L)))
        }
      def merge(x: HBuf, y: HBuf): HBuf = mergeSorted(x, y)
      def finish(b: HBuf): Map[String, Long] =
        scala.collection.immutable.ListMap(
          b.keys.zip(b.counts).toIndexedSeq: _*)
      def bufferEncoder: Encoder[HBuf] = Encoders.product[HBuf]
      def outputEncoder: Encoder[Map[String, Long]] =
        ExpressionEncoder[Map[String, Long]]()
    }

  case class KV(k: String, v: String)
  case class MBuf(var ks: Array[String], var vs: Array[String])

  /** Trino `multimap_agg(k, v)`: key → ALL values map per group. NULL
    * keys are skipped (map keys cannot be NULL); NULL values are
    * retained as the string "null" rendering is NOT applied — the
    * rewriter's CAST keeps SQL NULL, which this aggregator drops
    * (Trino retains typed NULL values; documented divergence). Values
    * within a key are SORTED in the output — Trino's arrival order is
    * nondeterministic under parallel aggregation, so the deterministic
    * rendering is the one a hash-compared pipeline can actually use. */
  val multimapAgg: Aggregator[KV, MBuf, Map[String, Seq[String]]] =
    new Aggregator[KV, MBuf, Map[String, Seq[String]]] {
      def zero: MBuf = MBuf(Array.empty, Array.empty)
      def reduce(b: MBuf, a: KV): MBuf =
        if (a.k == null || a.v == null) b
        else { b.ks :+= a.k; b.vs :+= a.v; b }
      def merge(x: MBuf, y: MBuf): MBuf =
        MBuf(x.ks ++ y.ks, x.vs ++ y.vs)
      def finish(b: MBuf): Map[String, Seq[String]] =
        scala.collection.immutable.ListMap(
          b.ks.zip(b.vs).groupBy(_._1).toIndexedSeq.sortBy(_._1)
            .map { case (k, kvs) =>
              k -> kvs.map(_._2).sorted.toVector
            }: _*)
      def bufferEncoder: Encoder[MBuf] = Encoders.product[MBuf]
      def outputEncoder: Encoder[Map[String, Seq[String]]] =
        ExpressionEncoder[Map[String, Seq[String]]]()
    }

  case class MuBuf(var ks: Array[String], var vs: Array[String])

  /** Trino `map_union(m)`: the union of all input maps in the group.
    * Trino's value for a key appearing in several maps is ARBITRARY;
    * this kernel keeps the FIRST value in merge order (deterministic
    * given a deterministic input order — hash-compared pipelines use
    * key-disjoint groups or accept Trino's own nondeterminism). NULL
    * maps are skipped; NULL values are retained. Buffer is
    * O(distinct-keys-in-group) and merges are associative, so partial
    * aggregation runs map-side — Trino's memory shape. */
  val mapUnionAgg: Aggregator[Map[String, String], MuBuf, Map[String, String]] =
    new Aggregator[Map[String, String], MuBuf, Map[String, String]] {
      def zero: MuBuf = MuBuf(Array.empty, Array.empty)
      def reduce(b: MuBuf, m: Map[String, String]): MuBuf = {
        if (m != null) m.foreach { case (k, v) =>
          if (!b.ks.contains(k)) { b.ks :+= k; b.vs :+= v }
        }
        b
      }
      def merge(x: MuBuf, y: MuBuf): MuBuf = {
        var i = 0
        while (i < y.ks.length) {
          if (!x.ks.contains(y.ks(i))) { x.ks :+= y.ks(i); x.vs :+= y.vs(i) }
          i += 1
        }
        x
      }
      def finish(b: MuBuf): Map[String, String] =
        scala.collection.immutable.ListMap(
          b.ks.zip(b.vs).sortBy(_._1).toIndexedSeq: _*)
      def bufferEncoder: Encoder[MuBuf] = Encoders.product[MuBuf]
      def outputEncoder: Encoder[Map[String, String]] =
        ExpressionEncoder[Map[String, String]]()
    }
}
