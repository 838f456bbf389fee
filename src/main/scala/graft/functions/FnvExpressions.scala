package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Fowler–Noll–Vo hashes (the public-domain FNV spec; Trino's
  * fnv1_32 / fnv1a_32 / fnv1_64 / fnv1a_64 over VARBINARY). FNV-1
  * multiplies then XORs per byte; FNV-1a XORs then multiplies. Wrapping
  * arithmetic is the spec (compiled Scala wraps natively — this cannot
  * be a SQL-function body, where ANSI-mode multiplication overflow
  * throws). 32-bit results are zero-extended to BIGINT (the unsigned
  * 32-bit value); 64-bit results are the raw signed long, matching
  * Trino's BIGINT rendering.
  */
object FnvKernels {
  private val O32 = 0x811c9dc5 // 2166136261
  private val P32 = 0x01000193 // 16777619
  private val O64 = 0xcbf29ce484222325L
  private val P64 = 0x100000001b3L

  def fnv32(bytes: Array[Byte], fnv1a: Boolean): Long = {
    var h = O32
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      if (fnv1a) { h ^= b; h *= P32 } else { h *= P32; h ^= b }
      i += 1
    }
    h.toLong & 0xffffffffL
  }

  def fnv64(bytes: Array[Byte], fnv1a: Boolean): Long = {
    var h = O64
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      if (fnv1a) { h ^= b; h *= P64 } else { h *= P64; h ^= b }
      i += 1
    }
    h
  }
}

case class FnvExpression(child: Expression, bits: Int, fnv1a: Boolean)
  extends UnaryExpression {
  require(bits == 32 || bits == 64, s"fnv bits must be 32 or 64: $bits")

  override def dataType: DataType = LongType
  override def prettyName: String =
    s"fnv1${if (fnv1a) "a" else ""}_$bits"

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    if (bits == 32) FnvKernels.fnv32(b, fnv1a) else FnvKernels.fnv64(b, fnv1a)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.FnvKernels.fnv$bits($c, $fnv1a)")

  override protected def withNewChildInternal(newChild: Expression): FnvExpression =
    copy(child = newChild)
}
