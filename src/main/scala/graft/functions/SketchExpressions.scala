package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native codegen'd sketch kernels for the dedup pipeline (SURVEY §2.9 L2).
  *
  * Both take an `array<long>` of pre-hashed shingles/tokens (produced by
  * `TextFunctions.shingleHashes` — one cheap pass) and replace the O(n×64)
  * interpreted lambda traversals with tight primitive loops. Semantics are
  * bit-identical to the higher-order-function reference implementations in
  * TextFunctions (cross-checked in TextFunctionsSpec).
  *
  * Scale note: per-row expressions, fully pipelined — at 100 TB the
  * signature computation stays in the scan stage; only the 8-byte band
  * keys shuffle.
  */
object SketchKernels {
  final val Mersenne: Long = 2147483647L // 2^31 - 1

  def minhashA(j: Int): Long = (104731L * j + 1L) % Mersenne
  def minhashB(j: Int): Long = 7919L * (j + 1)

  def minhash(hashes: ArrayData, numPerms: Int): GenericArrayData = {
    val n = hashes.numElements()
    val out = new Array[Long](numPerms)
    var j = 0
    while (j < numPerms) {
      val a = minhashA(j); val b = minhashB(j)
      var min = Long.MaxValue
      var i = 0
      while (i < n) {
        val h = java.lang.Math.floorMod(hashes.getLong(i), Mersenne)
        val v = java.lang.Math.floorMod(h * a + b, Mersenne)
        if (v < min) min = v
        i += 1
      }
      out(j) = if (n == 0) 0L else min
      j += 1
    }
    new GenericArrayData(out)
  }

  def simhash48(hashes: ArrayData): Long = {
    val n = hashes.numElements()
    var value = 0L
    var bit = 0
    while (bit < 48) {
      var cnt = 0
      var i = 0
      while (i < n) {
        if (((hashes.getLong(i) >>> bit) & 1L) == 1L) cnt += 1 else cnt -= 1
        i += 1
      }
      if (cnt > 0) value |= (1L << bit)
      bit += 1
    }
    value
  }
}

/** `minhash_sig(array<long>)` → `array<long>` of `numPerms` minima. */
case class MinHashSignatureExpression(child: Expression, numPerms: Int = 64)
  extends UnaryExpression {

  // input must already be array<long> (see note on AbstractDataType above)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    SketchKernels.minhash(input.asInstanceOf[ArrayData], numPerms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SketchKernels.minhash($c, $numPerms)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignatureExpression =
    copy(child = newChild)
}

/** `simhash48(array<long>)` → long (per-bit majority vote, 48 bits). */
case class SimHash48Expression(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash48"

  override def nullSafeEval(input: Any): Any =
    SketchKernels.simhash48(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchKernels.simhash48($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash48Expression =
    copy(child = newChild)
}
