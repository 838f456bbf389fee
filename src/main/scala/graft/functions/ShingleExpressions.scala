package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native shingle kernels (SURVEY §2.9 L2 hot path).
  *
  * Outputs are element-for-element identical to the higher-order
  * reference implementations in TextFunctions (parity-tested):
  * - charShingles: `substring(text, i, k)` uses UTF8String.substringSQL —
  *   the exact semantics of the Substring expression the HOF version
  *   evaluates — and first-occurrence dedup like array_distinct.
  * - wordShingles: space-joined n-grams over a token array, same
  *   first-occurrence dedup.
  */
object ShingleKernels {

  def charShingles(text: UTF8String, k: Int): GenericArrayData = {
    val n = math.max(text.numChars() - (k - 1), 1)
    val seen = new java.util.LinkedHashSet[UTF8String](n * 2)
    var i = 1
    while (i <= n) {
      seen.add(text.substringSQL(i, k))
      i += 1
    }
    new GenericArrayData(seen.toArray)
  }

  private val Space = UTF8String.fromString(" ")

  def wordShingles(tokens: ArrayData, n: Int): GenericArrayData = {
    val total = tokens.numElements()
    val count = math.max(total - (n - 1), 1)
    val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
    var i = 0
    while (i < count) {
      // element_at(tokens, i+j) in the HOF version yields null past the
      // end only when count was clamped to 1; concat_ws skips nulls.
      val parts = new Array[UTF8String](n)
      var j = 0
      var m = 0
      while (j < n) {
        if (i + j < total) { parts(m) = tokens.getUTF8String(i + j); m += 1 }
        j += 1
      }
      seen.add(UTF8String.concatWs(Space, java.util.Arrays.copyOf(parts, m): _*))
      i += 1
    }
    new GenericArrayData(seen.toArray)
  }

  /** Karp–Rabin rolling hashes of every k-codepoint window of `text`:
    * out(i) = polynomial hash (base 1000003, natural 2^64 wrap) of code
    * points [i, i+k) — O(1) per position after the first window, where
    * hashing each substring separately costs O(k) per position (an
    * ~8× kernel cut at k = 50, the l65 phase-1 key). Identical grams
    * hash identically by construction; a collision only costs confirm
    * work downstream (phase 2 compares exact strings), never
    * correctness. Position i here is 0-based over CODE POINTS, matching
    * substring(text, i+1, k)'s character semantics. */
  def gramHashes(text: UTF8String, k: Int): GenericArrayData = {
    require(k >= 1, s"gram_hashes: k must be >= 1, got $k")
    val cps = text.toString.codePoints().toArray
    val n = cps.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.emptyLongArray)
    val B = 1000003L
    var bk = 1L
    var i = 0
    while (i < k - 1) { bk *= B; i += 1 }
    val out = new Array[Long](n)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + cps(i); i += 1 }
    out(0) = h
    i = 1
    while (i < n) {
      h = (h - cps(i - 1) * bk) * B + cps(i + k - 1)
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `gram_hashes(string, k)` → array<long> of per-position Karp–Rabin
  * k-gram hashes (one per window, NO dedup — positions matter). */
case class GramHashesExpression(child: Expression, k: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleKernels.gramHashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleKernels.gramHashes($c, $k)")

  override protected def withNewChildInternal(
      newChild: Expression): GramHashesExpression = copy(child = newChild)
}

/** `char_shingles(string)` → array<string> of distinct k-grams. */
case class CharShinglesExpression(child: Expression, k: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_shingles"

  override def nullSafeEval(input: Any): Any =
    ShingleKernels.charShingles(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKernels.charShingles($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): CharShinglesExpression =
    copy(child = newChild)
}

/** `word_shingles(array<string>)` → array<string> of distinct n-grams. */
case class WordShinglesExpression(child: Expression, n: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    ShingleKernels.wordShingles(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKernels.wordShingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShinglesExpression =
    copy(child = newChild)
}
