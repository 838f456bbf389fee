package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Ascending, Attribute, Cast, Expression, GenericInternalRow, JoinedRow, PredicateHelper, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.types.{DataType, DateType, TimestampNTZType, TimestampType}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftshim.GraftShim

/** As-of join as a first-class plan operator (SURVEY §2.3 J8, the "custom
  * needed" path (c): LogicalPlan node → Strategy → SparkPlan, registered
  * via SparkSessionExtensions / experimental.extraStrategies).
  *
  * Semantics: left outer as-of — for each left row, the LAST right row of
  * the same `by` group whose `ts` is <= the left row's `ts` (ties among
  * equal right ts resolved by the right sort's trailing `tiebreak`
  * columns: last one wins). Unmatched left rows null-extend.
  *
  * 100 TB story — this is the reason to own the physical operator: the
  * expression-level rewrites (j8: range join + max-struct re-aggregate;
  * j8b: union + last_value window over the merged stream) either expand
  * each left row by its whole right history before reducing, or sort the
  * union. This operator declares ClusteredDistribution on the `by` keys
  * and per-partition (by, ts) ordering, so Catalyst plans exactly one
  * hash shuffle per side + an in-partition sort, and the merge itself is
  * a single forward pass: O(|L| + |R|) per partition, zero expansion,
  * zero extra shuffle. Skewed `by` keys behave like any SMJ key (salting
  * utilities in ops/Skew.scala apply unchanged).
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftBy: Expression, rightBy: Expression,
    leftTs: Expression, rightTs: Expression,
    rightTiebreak: Seq[Expression],
    forward: Boolean = false) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Catalyst stops predicate pushdown at nodes it doesn't know, so without
  * this rule a `filter` above an as-of join scans both sides in full. A
  * LEFT-side conjunct commutes with the join (each left row's as-of match
  * is independent of other left rows), so it pushes below the node — and
  * from there Catalyst's own rules carry it into the parquet scan
  * (PushedFilters). RIGHT-side conjuncts must NOT push: they'd change
  * which right row is "last ≤ ts" and break null-extension semantics.
  */
object AsOfJoinFilterPushdown extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, a: AsOfJoinNode) =>
      val (leftOnly, rest) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(a.left.outputSet))
      if (leftOnly.isEmpty) f
      else {
        val pushed = a.copy(left = Filter(leftOnly.reduce(And), a.left))
        rest.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lb, rb, lt, rt, tb, fwd) =>
      AsOfJoinExec(lb, rb, lt, rt, tb, fwd, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftBy: Expression, rightBy: Expression,
    leftTs: Expression, rightTs: Expression,
    rightTiebreak: Seq[Expression],
    forward: Boolean,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // co-partition both sides on the by key (same contract as SortMergeJoin)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftBy)) :: ClusteredDistribution(Seq(rightBy)) :: Nil

  // in-partition merge order; right carries the tiebreak suffix so "last
  // row <= ts" is deterministic under duplicate right timestamps
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftBy, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightBy, Ascending), SortOrder(rightTs, Ascending)) ++
      rightTiebreak.map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lByExprs = Seq(leftBy)
    val rByExprs = Seq(rightBy)
    val byTypes = lByExprs.map(_.dataType)
    val tsType = leftTs.dataType
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lByProj = UnsafeProjection.create(lByExprs, leftOut)
      val rByProj = UnsafeProjection.create(rByExprs, rightOut)
      val lTsProj = UnsafeProjection.create(Seq(leftTs), leftOut)
      val rTsProj = UnsafeProjection.create(Seq(rightTs), rightOut)
      val byOrd = RowOrdering.createNaturalAscendingOrdering(byTypes)
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(tsType))
      val nullRight = new GenericInternalRow(rightOut.size)
      val joined = new JoinedRow
      // bind against nullable right attrs: unmatched rows flow nullRight
      // through this projection, and a non-nullable BoundReference would
      // skip its null check and read garbage zeros instead of NULL
      val resultProj = UnsafeProjection.create(output,
        leftOut ++ rightOut.map(_.withNullability(true)))
      val rBuf = rIter.buffered

      new Iterator[InternalRow] {
        // last right row (copied) whose key matches heldKey and ts <= the
        // left ts seen when it was advanced past
        private var heldKey: UnsafeRow = _
        private var heldRow: InternalRow = _
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKey = lByProj(lRow)
          val lTs = lTsProj(lRow).copy()
          // SQL null semantics: a null left key or ts can never satisfy the
          // (null-rejecting) by-equality / ts-inequality, so the row
          // null-extends without consuming any right rows. Nulls sort
          // first, so not advancing here cannot starve later left rows.
          if (lKey.isNullAt(0) || lTs.isNullAt(0))
            return resultProj(joined(lRow, nullRight))
          // BACKWARD: advance right up to and including the last row of
          // lKey's group with ts <= lTs (held as the match); FORWARD:
          // drain rows strictly before lTs so the buffered head, if it is
          // still lKey's group, is the FIRST row with ts >= lTs (peeked,
          // never consumed — later left rows may share it). Groups before
          // lKey are drained without holding; right rows with null key/ts
          // are skipped (they'd otherwise act as -infinity under the
          // natural nulls-first ordering).
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rKey = rByProj(rBuf.head)
            if (rKey.isNullAt(0)) { rBuf.next() }
            else {
              val c = byOrd.compare(rKey, lKey)
              if (c < 0) { heldKey = null; heldRow = null; rBuf.next() }
              else if (c == 0) {
                val rTs = rTsProj(rBuf.head)
                if (rTs.isNullAt(0)) { rBuf.next() }
                else if (forward) {
                  if (tsOrd.compare(rTs, lTs) < 0) rBuf.next()
                  else advancing = false
                } else if (tsOrd.compare(rTs, lTs) <= 0) {
                  val r = rBuf.next()
                  heldRow = r.copy()
                  if (heldKey == null || !heldKey.equals(lKey)) heldKey = lKey.copy()
                } else advancing = false
              } else advancing = false
            }
          }
          if (forward) {
            val ok = rBuf.hasNext && {
              val rKey = rByProj(rBuf.head)
              !rKey.isNullAt(0) && byOrd.compare(rKey, lKey) == 0
            }
            resultProj(joined(lRow, if (ok) rBuf.head else nullRight))
          } else {
            val matched = heldRow != null && heldKey != null && heldKey.equals(lKey)
            resultProj(joined(lRow, if (matched) heldRow else nullRight))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {
  /** Idempotent strategy + rule registration for plain sessions (the
    * extensions class injects both for `spark.sql.extensions` ones). */
  def register(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    if (!spark.experimental.extraOptimizations.contains(AsOfJoinFilterPushdown))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AsOfJoinFilterPushdown
  }

  private def timestampLike(t: DataType): Boolean =
    t == TimestampType || t == TimestampNTZType || t == DateType

  /** The merge compares LEFT-typed and RIGHT-typed one-field projections
    * with a single RowOrdering built from the left types, so mismatched
    * physical encodings (INT vs BIGINT, DATE days vs TIMESTAMP micros)
    * would silently compare garbage. Align by up-casting the narrower
    * side (both keys are compare-only, never output), and fail analysis
    * loudly for incomparable pairs. TIMESTAMP vs TIMESTAMP_NTZ (both
    * micros-backed) converts via the session time zone (UTC here). */
  private def aligned(spark: SparkSession, l: Expression, r: Expression,
      what: String): (Expression, Expression) = {
    val tz = Some(spark.sessionState.conf.sessionLocalTimeZone)
    if (l.dataType == r.dataType) (l, r)
    // canUpCast admits any-atomic→string; a bigint ts "aligned" to a string
    // ts would compare lexicographically, so string never aligns with
    // a non-string — only identical string types compare (handled above)
    else if (l.dataType.isInstanceOf[org.apache.spark.sql.types.StringType] ||
             r.dataType.isInstanceOf[org.apache.spark.sql.types.StringType])
      throw new IllegalArgumentException(
        s"asof: $what types are incompatible: ${l.dataType} vs ${r.dataType}")
    else if (Cast.canUpCast(r.dataType, l.dataType)) (l, Cast(r, l.dataType, tz))
    else if (Cast.canUpCast(l.dataType, r.dataType)) (Cast(l, r.dataType, tz), r)
    else if (timestampLike(l.dataType) && timestampLike(r.dataType))
      (l, Cast(r, l.dataType, tz))
    else throw new IllegalArgumentException(
      s"asof: $what types are incompatible: ${l.dataType} vs ${r.dataType}")
  }

  /** left-outer as-of: per left row, the latest `right` row of its `by`
    * group with rightTs <= leftTs (direction="backward", the default) or
    * the EARLIEST with rightTs >= leftTs (direction="forward", pandas
    * merge_asof's forward mode). Columns are referenced by name and
    * resolved against each side's analyzed output. */
  def asof(spark: SparkSession, leftDf: DataFrame, rightDf: DataFrame,
      leftBy: String, rightBy: String, leftTs: String, rightTs: String,
      tiebreak: Seq[String] = Nil, direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"asof: unknown direction '$direction'")
    register(spark)
    val lPlan = GraftShim.analyzed(leftDf)
    val rPlan = GraftShim.analyzed(rightDf)
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"asof: no column '$name' in [${plan.output.map(_.name).mkString(", ")}]"))
    val (lBy, rBy) =
      aligned(spark, attr(lPlan, leftBy), attr(rPlan, rightBy), "by-key")
    val (lTs, rTs) =
      aligned(spark, attr(lPlan, leftTs), attr(rPlan, rightTs), "ts")
    GraftShim.ofRows(spark, AsOfJoinNode(lPlan, rPlan,
      lBy, rBy, lTs, rTs, tiebreak.map(attr(rPlan, _)),
      forward = direction == "forward"))
  }
}
