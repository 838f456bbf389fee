package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.DataType

/** Presto-style generalized `TRY(expr)`: evaluate the child and return NULL
  * on any runtime evaluation error (division by zero, ANSI cast failure,
  * malformed date, array index out of bounds, bad regex, ...). Unlike the
  * per-function `try_cast`/`try_element_at`/`try_divide` family this wraps
  * ANY expression.
  *
  * Deliberately `CodegenFallback`: a correctness/robustness wrapper for
  * dirty-data ETL edges, not a hot-loop kernel — wrapping the child's
  * generated code in a catch-all at codegen level would forfeit Spark's
  * fail-fast for genuine bugs inside whole-stage codegen. Fatal errors
  * (OOM, interrupts) are NOT swallowed.
  */
case class TryEvalExpression(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def nullable: Boolean = true
  override def dataType: DataType = child.dataType
  override def prettyName: String = "try_eval"

  override def eval(input: InternalRow): Any =
    try child.eval(input)
    catch { case scala.util.control.NonFatal(_) => null }

  override protected def withNewChildInternal(newChild: Expression): TryEvalExpression =
    copy(child = newChild)
}
