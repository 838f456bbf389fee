package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DateType, StringType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** Trino's `to_iso8601` with BOTH argument forms behind one name — the
  * DATE/TIMESTAMP overload a SQL temp function could not express (the
  * r15 cosine_similarity dual-dispatch pattern, found by probe sweep 5:
  * the old TIMESTAMP-typed temp fn coerced DATE arguments to midnight
  * and rendered a spurious `T00:00:00.000`):
  *
  *  - DATE → `yyyy-MM-dd` (Trino's date rendering, no time part);
  *  - TIMESTAMP → `yyyy-MM-dd'T'HH:mm:ss.SSS`, byte-identical to the
  *    retired temp fn's date_format under the engine's pinned-UTC
  *    session contract (timestamps are zoneless instants rendered at
  *    UTC — the same contract note as from_unixtime / at_timezone).
  */
object Iso8601Core {
  private val tsFmt =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS")

  def fmtDate(days: Int): UTF8String =
    UTF8String.fromString(java.time.LocalDate.ofEpochDay(days.toLong).toString)

  def fmtTs(micros: Long): UTF8String = {
    val ldt = java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(micros, 1000000L),
      (Math.floorMod(micros, 1000000L) * 1000L).toInt,
      java.time.ZoneOffset.UTC)
    UTF8String.fromString(tsFmt.format(ldt))
  }
}

case class ToIso8601Expression(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "to_iso8601"

  private lazy val isDate = child.dataType match {
    case DateType => true
    case TimestampType => false
    case other => throw new IllegalArgumentException(
      s"to_iso8601: DATE or TIMESTAMP argument required, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    if (isDate) Iso8601Core.fmtDate(input.asInstanceOf[Int])
    else Iso8601Core.fmtTs(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      if (isDate)
        s"${ev.value} = graft.functions.Iso8601Core.fmtDate($c);"
      else s"${ev.value} = graft.functions.Iso8601Core.fmtTs($c);")

  override protected def withNewChildInternal(
      newChild: Expression): ToIso8601Expression = copy(child = newChild)
}
