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
