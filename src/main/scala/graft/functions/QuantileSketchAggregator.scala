package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable quantile sketch (t-digest, Dunning & Ertl, "Computing
  * extremely accurate quantiles using t-digests" — public algorithm),
  * closing the re-aggregatable-percentile gap next to A21's HLL rollup:
  * Spark's `percentile_approx` yields a final number, not a sketch, so
  * pre-aggregated percentiles cannot roll up. These can.
  *
  * Sketch = centroids (mean, weight) sorted by mean, compressed with the
  * k1 scale function k(q) = (δ/2π)·asin(2q−1): adjacent centroids merge
  * while Δk ≤ 1, which caps centroid count at ~δ and concentrates
  * resolution at the tails. Serialized as `array<double>`
  * [m0,w0,m1,w1,…] so sketches persist in parquet and roll up later —
  * the 100 TB pattern: fine-grained sketches computed once per
  * (partition, group), any coarser percentile is a cheap sketch merge,
  * never a re-read or a global sort.
  *
  * Merging is associative-with-bounded-error (Agarwal et al., "Mergeable
  * summaries"), exactly what partial+final aggregation needs; buffers are
  * O(δ) regardless of input size. Approximate and merge-order-dependent →
  * declared rows-only (same policy as A18/A21); accuracy and rollup-vs-
  * exact equivalence are property-tested in ApproxSpec.
  */
object QuantileSketchAggregator {

  /** Compression factor: ~2·delta centroid cap, tail error O(1/delta²). */
  final val Delta = 100.0
  /** Unsorted points buffered before an in-buffer compress. */
  private final val BufferCap = 512

  private def kScale(q: Double): Double =
    Delta / (2.0 * math.Pi) * math.asin(2.0 * math.min(1.0, math.max(0.0, q)) - 1.0)

  /** Merge-compress pairs (already concatenated) into a t-digest. Input
    * need not be sorted; output is sorted by mean with Δk ≤ 1 per
    * centroid. Pure function — both aggregation levels and tests share it.
    */
  def compress(means: Array[Double], weights: Array[Double]): (Array[Double], Array[Double]) = {
    val n = means.length
    if (n == 0) return (Array.empty, Array.empty)
    val idx = Array.range(0, n).sortBy(means(_))
    var total = 0.0
    idx.foreach(i => total += weights(i))
    val om = new Array[Double](n)
    val ow = new Array[Double](n)
    var out = 0
    var accM = means(idx(0)); var accW = weights(idx(0))
    var wSoFar = 0.0
    var kLeft = kScale(0.0)
    var i = 1
    while (i < n) {
      val m = means(idx(i)); val w = weights(idx(i))
      val qRight = (wSoFar + accW + w) / total
      if (kScale(qRight) - kLeft <= 1.0) {
        // weighted-mean merge keeps the centroid unbiased
        accM = (accM * accW + m * w) / (accW + w); accW += w
      } else {
        om(out) = accM; ow(out) = accW; out += 1
        wSoFar += accW
        kLeft = kScale(wSoFar / total)
        accM = m; accW = w
      }
      i += 1
    }
    om(out) = accM; ow(out) = accW; out += 1
    (om.take(out), ow.take(out))
  }

  /** Quantile estimate by linear interpolation across centroid midpoints
    * (the standard t-digest query; exact at the extreme centroids when
    * their weight is 1). */
  def quantile(means: Array[Double], weights: Array[Double], q: Double): Double = {
    val n = means.length
    if (n == 0) return Double.NaN
    if (n == 1) return means(0)
    var total = 0.0
    weights.foreach(total += _)
    val target = q * total
    // cumulative weight at centroid i's midpoint
    var cum = 0.0
    var i = 0
    var prevMid = 0.0
    var prevMean = means(0)
    while (i < n) {
      val mid = cum + weights(i) / 2.0
      if (target < mid) {
        if (i == 0) return means(0)
        val frac = (target - prevMid) / (mid - prevMid)
        return prevMean + frac * (means(i) - prevMean)
      }
      cum += weights(i)
      prevMid = mid; prevMean = means(i)
      i += 1
    }
    means(n - 1)
  }

  /** Flat [m0,w0,m1,w1,…] codec — parquet/DataFrame-friendly. */
  def serialize(mw: (Array[Double], Array[Double])): Seq[Double] = {
    val (m, w) = mw
    val out = new Array[Double](m.length * 2)
    var i = 0
    while (i < m.length) { out(2 * i) = m(i); out(2 * i + 1) = w(i); i += 1 }
    out.toSeq
  }

  def deserialize(flat: Seq[Double]): (Array[Double], Array[Double]) = {
    val n = flat.length / 2
    val m = new Array[Double](n); val w = new Array[Double](n)
    var i = 0
    while (i < n) { m(i) = flat(2 * i); w(i) = flat(2 * i + 1); i += 1 }
    (m, w)
  }

  /** Aggregation buffer: `n` live entries in possibly-larger backing
    * arrays, so the per-row hot path appends in amortized O(1) and
    * mutates in place (the Aggregator contract permits returning the
    * mutated buffer) instead of copying the whole buffer per row. */
  case class Buf(var means: Array[Double], var weights: Array[Double], var n: Int)

  /** Ensure ≥1 free slot: compress live entries when the cap is hit
    * (keeps ~Delta centroids), else double capacity. */
  private def ensureSlot(b: Buf): Unit = {
    if (b.n == b.means.length) {
      if (b.n >= BufferCap) {
        val (m, w) = compress(b.means.take(b.n), b.weights.take(b.n))
        b.means = java.util.Arrays.copyOf(m, BufferCap)
        b.weights = java.util.Arrays.copyOf(w, BufferCap)
        b.n = m.length
      } else {
        val cap = math.max(16, b.means.length * 2)
        b.means = java.util.Arrays.copyOf(b.means, cap)
        b.weights = java.util.Arrays.copyOf(b.weights, cap)
      }
    }
  }

  private def append(b: Buf, m: Double, w: Double): Buf = {
    ensureSlot(b)
    b.means(b.n) = m; b.weights(b.n) = w; b.n += 1
    b
  }

  private def appendAll(b: Buf, m: Array[Double], w: Array[Double], k: Int): Buf = {
    var i = 0
    while (i < k) { append(b, m(i), w(i)); i += 1 }
    b
  }

  private def finishBuf(b: Buf): Seq[Double] =
    serialize(compress(b.means.take(b.n), b.weights.take(b.n)))

  /** Level 1: rows → sketch. */
  val sketchAgg: Aggregator[Double, Buf, Seq[Double]] =
    new Aggregator[Double, Buf, Seq[Double]] {
      def zero: Buf = Buf(Array.empty, Array.empty, 0)
      def reduce(b: Buf, x: Double): Buf = append(b, x, 1.0)
      def merge(x: Buf, y: Buf): Buf = appendAll(x, y.means, y.weights, y.n)
      def finish(b: Buf): Seq[Double] = finishBuf(b)
      def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      def outputEncoder: Encoder[Seq[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
    }

  /** Level 2: sketches → merged sketch (the rollup path). */
  val mergeAgg: Aggregator[Seq[Double], Buf, Seq[Double]] =
    new Aggregator[Seq[Double], Buf, Seq[Double]] {
      def zero: Buf = Buf(Array.empty, Array.empty, 0)
      def reduce(b: Buf, sk: Seq[Double]): Buf = {
        val (m, w) = deserialize(sk)
        appendAll(b, m, w, m.length)
      }
      def merge(x: Buf, y: Buf): Buf = appendAll(x, y.means, y.weights, y.n)
      def finish(b: Buf): Seq[Double] = finishBuf(b)
      def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      def outputEncoder: Encoder[Seq[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
    }

  /** Column forms. Quantile extraction runs on #groups rows (never the
    * raw-data path), so a Scala UDF is fine here; the data-volume work is
    * all inside the codegen'd partial+final aggregation. */
  def tdigestAgg(c: Column): Column = udaf(sketchAgg).apply(c)
  def tdigestMergeAgg(c: Column): Column = udaf(mergeAgg).apply(c)
  def tdigestQuantile(sketch: Column, q: Double): Column = {
    val f = org.apache.spark.sql.functions.udf { flat: Seq[Double] =>
      val (m, w) = deserialize(flat); quantile(m, w, q)
    }
    f(sketch)
  }
}
