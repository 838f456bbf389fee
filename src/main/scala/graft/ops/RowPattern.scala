package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Row-pattern matching over ordered per-key event streams — the
  * Trino/Presto MATCH_RECOGNIZE use-case (SURVEY §2.8 E7 generalized from
  * one hard-coded funnel to a real pattern operator).
  *
  * Semantics (the subset a funnel/sequence analysis needs, defined
  * precisely rather than maximally):
  * - Pattern = sequence of steps; each step has a row predicate and a
  *   quantifier (exactly-one, `+`, `*`, each greedy or reluctant) over
  *   CONTIGUOUS rows in (ts, tiebreak) order within a key — matching is
  *   over consecutive rows like MATCH_RECOGNIZE, not subsequences; use a
  *   permissive `star` step ("anything but X") to skip irrelevant rows.
  * - ONE ROW PER MATCH output: (key, match_no, start_us, end_us, n_rows).
  * - AFTER MATCH SKIP PAST LAST ROW: matches never overlap; match_no is
  *   1-based per key in stream order.
  * - `within`: a max (end.ts - start.ts) in microseconds, applied as a
  *   post-filter on the match the quantifiers select (documented choice:
  *   backtracking does not re-explore shorter alternatives to satisfy
  *   the window).
  *
  * Execution is Spark-first: step predicates are evaluated as ordinary
  * Catalyst boolean columns (codegen'd, pushdown-eligible) BEFORE the
  * shuffle; the only non-codegen piece is the per-key linear scan with
  * bounded backtracking, run via `groupByKey.flatMapSortedGroups` — one
  * hash shuffle on the key, per-partition sort, no driver involvement.
  * At 100 TB the shape is the same as any keyed window: shuffle carries
  * (key, ts, tiebreak, one boolean per step), NOT the full rows, and
  * each key's buffer is its own event count (salt long keys upstream if
  * a single key's history cannot fit an executor).
  */
// Serializable: the flatMapSortedGroups closure's local helper defs
// compile to methods on this object, so tasks capture it.
object RowPattern extends Serializable {

  /** min occurrences, unbounded upper, greedy vs reluctant expansion. */
  final case class Quant(min: Int, unbounded: Boolean, greedy: Boolean)
  val once: Quant = Quant(1, unbounded = false, greedy = true)
  val plus: Quant = Quant(1, unbounded = true, greedy = true)
  val star: Quant = Quant(0, unbounded = true, greedy = true)
  val plusReluctant: Quant = Quant(1, unbounded = true, greedy = false)
  val starReluctant: Quant = Quant(0, unbounded = true, greedy = false)

  final case class Step(name: String, pred: Column, quant: Quant = once)

  final case class PatternMatch(
      key: Long, match_no: Long, start_us: Long, end_us: Long, n_rows: Long)

  /** Core matcher over one key's sorted buffer: leftmost-first with
    * bounded backtracking, SKIP PAST LAST ROW, `within` post-filter.
    * Returns (startIdx, endIdx) spans in stream order. Shared by the
    * batch operator below and the streaming form
    * (streaming.EventStreams.patternMatchesWithState).
    */
  private[graft] def matchSpans(ts: Array[Long], preds: Array[Array[Boolean]],
      quants: Array[Quant], withinUs: Option[Long]): Seq[(Int, Int)] = {
    val n = quants.length
    val len = ts.length
    // backtracking regex over the row sequence; returns the inclusive
    // end index of the first match anchored at `pos`, or -1
    def go(pos: Int, step: Int): Int = {
      if (step == n) return pos - 1
      val q = quants(step)
      var p = pos
      var taken = 0
      while (taken < q.min) {
        if (p < len && preds(p)(step)) { p += 1; taken += 1 }
        else return -1
      }
      if (!q.unbounded) go(p, step + 1)
      else if (q.greedy) {
        var maxP = p
        while (maxP < len && preds(maxP)(step)) maxP += 1
        var tryP = maxP
        while (tryP >= p) {
          val r = go(tryP, step + 1)
          if (r >= 0) return r
          tryP -= 1
        }
        -1
      } else {
        var tryP = p
        while (true) {
          val r = go(tryP, step + 1)
          if (r >= 0) return r
          if (tryP < len && preds(tryP)(step)) tryP += 1
          else return -1
        }
        -1
      }
    }
    val acc = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var start = 0
    while (start < len) {
      val end = go(start, 0)
      val okWithin = end >= start &&
        withinUs.forall(w => ts(end) - ts(start) <= w)
      if (okWithin) {
        acc += ((start, end))
        start = end + 1 // SKIP PAST LAST ROW
      } else start += 1
    }
    acc.toSeq
  }

  /** Match `steps` over `df` per `keyCol`, ordered by (`tsCol`,
    * `tiebreakCol`). Key and tiebreak must be integral; ts must be (or
    * cast to) a timestamp. Returns one row per match.
    */
  def matches(df: DataFrame, keyCol: String, tsCol: String,
      tiebreakCol: String, steps: Seq[Step],
      withinUs: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "empty pattern")
    val n = steps.size
    val quants = steps.map(_.quant).toArray
    val prep = df.select(
      col(keyCol).cast("long").as("__k") +:
      unix_micros(col(tsCol).cast("timestamp")).as("__ts") +:
      col(tiebreakCol).cast("long").as("__tb") +:
      steps.zipWithIndex.map { case (st, i) =>
        st.pred.cast("boolean").as(s"__p$i") }: _*)

    implicit val keyEnc = Encoders.scalaLong
    implicit val outEnc = Encoders.product[PatternMatch]
    // SQL grouping semantics: null keys (or keys the long-cast nulls out)
    // never participate — and would otherwise NPE in the key extractor
    val out = prep.filter(col("__k").isNotNull)
      .groupByKey(_.getLong(0))
      .flatMapSortedGroups(col("__ts"), col("__tb")) { (k, it) =>
        val rows = it.toArray
        val len = rows.length
        val ts = new Array[Long](len)
        val preds = Array.ofDim[Boolean](len, n)
        var i = 0
        while (i < len) {
          val r = rows(i)
          ts(i) = r.getLong(1)
          var s = 0
          while (s < n) {
            preds(i)(s) = !r.isNullAt(3 + s) && r.getBoolean(3 + s)
            s += 1
          }
          i += 1
        }
        matchSpans(ts, preds, quants, withinUs).zipWithIndex.map {
          case ((start, end), idx) =>
            PatternMatch(k, idx.toLong + 1, ts(start), ts(end),
              (end - start + 1).toLong)
        }
      }
    out.withColumnRenamed("key", keyCol)
  }
}
