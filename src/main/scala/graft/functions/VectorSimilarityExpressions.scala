package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Trino's `cosine_similarity` / `dot_product` with BOTH argument forms
  * behind one name — the overload SQL temp functions cannot express
  * (see the p2ad/p2ae scope notes this closes):
  *
  *  - **dense** `array<numeric> × array<numeric>` (Trino 444+): a tight
  *    primitive loop, equal lengths required (loud otherwise, matching
  *    Trino's "arrays must have the same length" failure), NULL elements
  *    loud (this engine's convention for semantics Trino leaves
  *    unspecified), zero-norm cosine → NaN via IEEE 0/0.
  *  - **sparse** `map<string, numeric> × map<string, numeric>`: replicates
  *    the retired SQL temp functions operation-for-operation so results
  *    stay bit-identical — cosine walks a's entries in map order probing
  *    b by key (missing → 0), norms accumulate each map's values in
  *    stored order, and a NULL value ANYWHERE in either map nulls the
  *    result (the `acc + null` propagation of the original `aggregate`
  *    spelling); dot_product skips NULL/missing contributions (the
  *    original `coalesce(a[k] * b[k], 0)`).
  *
  * Dispatch is static: the argument type is known at analysis, so each
  * call site's whole-stage codegen emits only its own form's loop.
  * Numeric element/value types beyond DOUBLE (float / int / bigint /
  * decimal) are widened per element — Trino's implicit numeric coercion,
  * and what Spark's own `array(1.0, 2.0)` (decimal elements) needs.
  */
trait VectorSimilarityExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  protected def fnName: String

  /** Element type of the operands' array / map-value side, validated. */
  protected def numericElem(dt: DataType): DataType = dt match {
    case DoubleType | FloatType | IntegerType | LongType | ShortType |
        ByteType => dt
    case d: DecimalType => d
    case other => throw new IllegalArgumentException(
      s"$fnName: unsupported element type $other (numeric required)")
  }

  /** (leftElemType, rightElemType, isMapForm) — loud on anything else. */
  protected lazy val forms: (DataType, DataType, Boolean) =
    (left.dataType, right.dataType) match {
      case (ArrayType(a, _), ArrayType(b, _)) =>
        (numericElem(a), numericElem(b), false)
      case (MapType(ak, av, _), MapType(bk, bv, _)) =>
        require(ak == StringType && bk == StringType,
          s"$fnName: map arguments must be map<string, numeric>, got " +
            s"keys $ak / $bk")
        (numericElem(av), numericElem(bv), true)
      case (l, r) => throw new IllegalArgumentException(
        s"$fnName: arguments must both be arrays or both be " +
          s"map<string, numeric>; got $l and $r")
    }

  @inline protected final def elemAt(
      a: ArrayData, i: Int, et: DataType): Double = et match {
    case DoubleType => a.getDouble(i)
    case FloatType => a.getFloat(i).toDouble
    case IntegerType => a.getInt(i).toDouble
    case LongType => a.getLong(i).toDouble
    case ShortType => a.getShort(i).toDouble
    case ByteType => a.getByte(i).toDouble
    case d: DecimalType => a.getDecimal(i, d.precision, d.scale).toDouble
    case other => throw new IllegalStateException(other.toString)
  }

  /** Java accessor snippet for codegen — mirrors elemAt per type. */
  protected final def elemJava(arr: String, i: String, et: DataType)
      : String = et match {
    case DoubleType => s"$arr.getDouble($i)"
    case FloatType => s"(double) $arr.getFloat($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case LongType => s"(double) $arr.getLong($i)"
    case ShortType => s"(double) $arr.getShort($i)"
    case ByteType => s"(double) $arr.getByte($i)"
    case d: DecimalType =>
      s"$arr.getDecimal($i, ${d.precision}, ${d.scale}).toDouble()"
    case other => throw new IllegalStateException(other.toString)
  }

  protected final def requireSameLength(n: Int, m: Int): Unit =
    require(n == m,
      s"$fnName: array arguments must have the same length (got $n and $m)")

  protected final def requireNonNullElem(a: ArrayData, i: Int): Unit =
    if (a.isNullAt(i)) throw new IllegalArgumentException(
      s"$fnName: NULL array element at position ${i + 1}")

  /** b-probe for the sparse form: value of key `k` in (bk, bv), or 0 when
    * missing or NULL-valued — missing is exactly 0 per the coalesce
    * spelling (cosine pre-screens NULL values into a NULL result before
    * probing; dot_product's coalesce makes NULL-valued hits 0). */
  @inline protected final def probe(bk: ArrayData, bv: ArrayData, nb: Int,
      k: UTF8String, bt: DataType): Double = {
    var j = 0
    while (j < nb) {
      if (bk.getUTF8String(j).equals(k)) {
        return if (bv.isNullAt(j)) 0.0 else elemAt(bv, j, bt)
      }
      j += 1
    }
    0.0
  }
}

/** cosine_similarity(array, array) | cosine_similarity(map, map). */
case class CosineSimilarityDispatchExpression(left: Expression,
    right: Expression) extends VectorSimilarityExpression {

  override def prettyName: String = "cosine_similarity"
  override protected def fnName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (at, bt, isMap) = forms
    if (!isMap) {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      requireSameLength(n, y.numElements())
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      var i = 0
      while (i < n) {
        requireNonNullElem(x, i); requireNonNullElem(y, i)
        val xv = elemAt(x, i, at); val yv = elemAt(y, i, bt)
        dot += xv * yv; nx += xv * xv; ny += yv * yv
        i += 1
      }
      dot / (math.sqrt(nx) * math.sqrt(ny))
    } else {
      val x = a.asInstanceOf[MapData]
      val y = b.asInstanceOf[MapData]
      val ak = x.keyArray(); val av = x.valueArray()
      val bk = y.keyArray(); val bv = y.valueArray()
      val na = x.numElements(); val nb = y.numElements()
      // a NULL value anywhere nulls the result (aggregate's acc + null)
      var i = 0
      while (i < na) { if (av.isNullAt(i)) return null; i += 1 }
      i = 0
      while (i < nb) { if (bv.isNullAt(i)) return null; i += 1 }
      var dot = 0.0
      i = 0
      while (i < na) {
        dot += elemAt(av, i, at) *
          probe(bk, bv, nb, ak.getUTF8String(i), bt)
        i += 1
      }
      var nx = 0.0; i = 0
      while (i < na) { val v = elemAt(av, i, at); nx += v * v; i += 1 }
      var ny = 0.0; i = 0
      while (i < nb) { val v = elemAt(bv, i, bt); ny += v * v; i += 1 }
      dot / (math.sqrt(nx) * math.sqrt(ny))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = nullSafeCodeGen(ctx, ev, (a, b) => {
    val (at, bt, isMap) = forms
    val i = ctx.freshName("i"); val j = ctx.freshName("j")
    val n = ctx.freshName("n"); val m = ctx.freshName("m")
    val dot = ctx.freshName("dot")
    val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
    if (!isMap) {
      s"""
        |int $n = $a.numElements();
        |if ($b.numElements() != $n) throw new IllegalArgumentException(
        |  "cosine_similarity: array arguments must have the same length (got "
        |  + $n + " and " + $b.numElements() + ")");
        |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  if ($a.isNullAt($i) || $b.isNullAt($i))
        |    throw new IllegalArgumentException(
        |      "cosine_similarity: NULL array element at position " + ($i + 1));
        |  double xv = ${elemJava(a, i, at)};
        |  double yv = ${elemJava(b, i, bt)};
        |  $dot += xv * yv; $nx += xv * xv; $ny += yv * yv;
        |}
        |${ev.value} = $dot / (Math.sqrt($nx) * Math.sqrt($ny));
      """.stripMargin
    } else {
      val ak = ctx.freshName("ak"); val av = ctx.freshName("av")
      val bk = ctx.freshName("bk"); val bv = ctx.freshName("bv")
      val anyNull = ctx.freshName("anyNull")
      val kk = ctx.freshName("kk")
      s"""
        |ArrayData $ak = $a.keyArray(); ArrayData $av = $a.valueArray();
        |ArrayData $bk = $b.keyArray(); ArrayData $bv = $b.valueArray();
        |int $n = $a.numElements(); int $m = $b.numElements();
        |boolean $anyNull = false;
        |for (int $i = 0; $i < $n && !$anyNull; $i++)
        |  if ($av.isNullAt($i)) $anyNull = true;
        |for (int $i = 0; $i < $m && !$anyNull; $i++)
        |  if ($bv.isNullAt($i)) $anyNull = true;
        |if ($anyNull) {
        |  ${ev.isNull} = true;
        |} else {
        |  double $dot = 0.0, $nx = 0.0, $ny = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    UTF8String $kk = $ak.getUTF8String($i);
        |    double yv = 0.0;
        |    for (int $j = 0; $j < $m; $j++) {
        |      if ($bk.getUTF8String($j).equals($kk)) {
        |        yv = ${elemJava(bv, j, bt)}; break;
        |      }
        |    }
        |    $dot += ${elemJava(av, i, at)} * yv;
        |  }
        |  for (int $i = 0; $i < $n; $i++) {
        |    double v = ${elemJava(av, i, at)}; $nx += v * v;
        |  }
        |  for (int $i = 0; $i < $m; $i++) {
        |    double v = ${elemJava(bv, i, bt)}; $ny += v * v;
        |  }
        |  ${ev.value} = $dot / (Math.sqrt($nx) * Math.sqrt($ny));
        |}
      """.stripMargin
    }
  })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSimilarityDispatchExpression =
    copy(left = newLeft, right = newRight)
}

/** dot_product(array, array) | dot_product(map, map). */
case class DotProductDispatchExpression(left: Expression, right: Expression)
  extends VectorSimilarityExpression {

  override def prettyName: String = "dot_product"
  override protected def fnName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (at, bt, isMap) = forms
    if (!isMap) {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      requireSameLength(n, y.numElements())
      var dot = 0.0
      var i = 0
      while (i < n) {
        requireNonNullElem(x, i); requireNonNullElem(y, i)
        dot += elemAt(x, i, at) * elemAt(y, i, bt)
        i += 1
      }
      dot
    } else {
      val x = a.asInstanceOf[MapData]
      val y = b.asInstanceOf[MapData]
      val ak = x.keyArray(); val av = x.valueArray()
      val bk = y.keyArray(); val bv = y.valueArray()
      val na = x.numElements(); val nb = y.numElements()
      // coalesce(a[k] * b[k], 0): NULL contributions count 0; keys
      // MISSING from b are skipped entirely (not multiplied by a 0.0
      // sentinel — that would turn Infinity/NaN a-values into NaN
      // where the codegen path, which skips, returns 0; r15 ADVICE)
      var dot = 0.0
      var i = 0
      while (i < na) {
        if (!av.isNullAt(i)) {
          val k = ak.getUTF8String(i)
          var j = 0
          var found = false
          var yv = 0.0
          while (j < nb && !found) {
            if (bk.getUTF8String(j).equals(k)) {
              found = true
              if (!bv.isNullAt(j)) yv = elemAt(bv, j, bt)
            }
            j += 1
          }
          if (found) dot += elemAt(av, i, at) * yv
        }
        i += 1
      }
      dot
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = nullSafeCodeGen(ctx, ev, (a, b) => {
    val (at, bt, isMap) = forms
    val i = ctx.freshName("i"); val j = ctx.freshName("j")
    val n = ctx.freshName("n"); val m = ctx.freshName("m")
    val dot = ctx.freshName("dot")
    if (!isMap) {
      s"""
        |int $n = $a.numElements();
        |if ($b.numElements() != $n) throw new IllegalArgumentException(
        |  "dot_product: array arguments must have the same length (got "
        |  + $n + " and " + $b.numElements() + ")");
        |double $dot = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  if ($a.isNullAt($i) || $b.isNullAt($i))
        |    throw new IllegalArgumentException(
        |      "dot_product: NULL array element at position " + ($i + 1));
        |  $dot += ${elemJava(a, i, at)} * ${elemJava(b, i, bt)};
        |}
        |${ev.value} = $dot;
      """.stripMargin
    } else {
      val ak = ctx.freshName("ak"); val av = ctx.freshName("av")
      val bk = ctx.freshName("bk"); val bv = ctx.freshName("bv")
      val kk = ctx.freshName("kk"); val found = ctx.freshName("found")
      s"""
        |ArrayData $ak = $a.keyArray(); ArrayData $av = $a.valueArray();
        |ArrayData $bk = $b.keyArray(); ArrayData $bv = $b.valueArray();
        |int $n = $a.numElements(); int $m = $b.numElements();
        |double $dot = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  if ($av.isNullAt($i)) continue;
        |  UTF8String $kk = $ak.getUTF8String($i);
        |  double yv = 0.0; boolean $found = false;
        |  for (int $j = 0; $j < $m; $j++) {
        |    if ($bk.getUTF8String($j).equals($kk)) {
        |      if (!$bv.isNullAt($j)) { yv = ${elemJava(bv, j, bt)}; }
        |      $found = true; break;
        |    }
        |  }
        |  if ($found) $dot += ${elemJava(av, i, at)} * yv;
        |}
        |${ev.value} = $dot;
      """.stripMargin
    }
  })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProductDispatchExpression =
    copy(left = newLeft, right = newRight)
}
