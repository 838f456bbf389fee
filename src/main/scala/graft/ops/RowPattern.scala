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
  *   quantifier (exactly-one, `?`, `+`, `*`, each greedy or reluctant)
  *   over CONTIGUOUS rows in (ts, tiebreak) order within a key — matching
  *   is over consecutive rows like MATCH_RECOGNIZE, not subsequences; use
  *   a permissive `star` step ("anything but X") to skip irrelevant rows.
  * - ALTERNATION (`matchesAlt`): a pattern may be a list of BRANCHES
  *   (each a linear step sequence — `(B|C)` inside a sequence expands to
  *   one branch per choice, `PERMUTE(A,B)` via the `permute` helper to
  *   its lexicographic-order alternation, exactly Trino's PERMUTE
  *   definition). At each anchor row, branches are tried IN LISTED ORDER
  *   and the first that matches (and satisfies `within` — a branch whose
  *   match violates the window does NOT hide later branches) wins; the
  *   output carries the 1-based winning branch index.
  * - ONE ROW PER MATCH output: (key, match_no, [branch,] start_us,
  *   end_us, n_rows).
  * - AFTER MATCH SKIP PAST LAST ROW (default): matches never overlap;
  *   match_no is 1-based per key in stream order. SKIP TO NEXT ROW
  *   (Trino's overlapping mode) restarts one row after the previous
  *   match's START instead.
  * - `within`: a max (end.ts - start.ts) in microseconds, applied as a
  *   post-filter on the match the quantifiers select (documented choice:
  *   backtracking does not re-explore shorter alternatives to satisfy
  *   the window — but alternation DOES move on to the next branch).
  *
  * Execution is Spark-first: step predicates are evaluated as ordinary
  * Catalyst boolean columns (codegen'd, pushdown-eligible) BEFORE the
  * shuffle; the only non-codegen piece is the per-key linear scan with
  * bounded backtracking, run via `groupByKey.flatMapSortedGroups` — one
  * hash shuffle on the key, per-partition sort, no driver involvement.
  * Distinct steps are deduplicated BY NAME across branches, so an
  * alternation of k funnel variants still shuffles one boolean per
  * distinct step, not per branch-position. At 100 TB the shape is the
  * same as any keyed window: shuffle carries (key, ts, tiebreak, one
  * boolean per distinct step), NOT the full rows, and each key's buffer
  * is its own event count (salt long keys upstream if a single key's
  * history cannot fit an executor).
  */
// Serializable: the flatMapSortedGroups closure's local helper defs
// compile to methods on this object, so tasks capture it.
object RowPattern extends Serializable {

  /** Occurrence bounds [min, max] (max = Int.MaxValue → unbounded) and
    * greedy vs reluctant expansion. */
  final case class Quant(min: Int, max: Int, greedy: Boolean) {
    require(min >= 0 && max >= min, s"bad quantifier bounds [$min,$max]")
  }
  val once: Quant = Quant(1, 1, greedy = true)
  val opt: Quant = Quant(0, 1, greedy = true)            // B?
  val optReluctant: Quant = Quant(0, 1, greedy = false)  // B??
  val plus: Quant = Quant(1, Int.MaxValue, greedy = true)
  val star: Quant = Quant(0, Int.MaxValue, greedy = true)
  val plusReluctant: Quant = Quant(1, Int.MaxValue, greedy = false)
  val starReluctant: Quant = Quant(0, Int.MaxValue, greedy = false)

  final case class Step(name: String, pred: Column, quant: Quant = once)

  /** PERMUTE(s1, …, sk) → its alternation expansion in lexicographic
    * order of the listed arguments (Trino's PERMUTE definition). k! grows
    * fast — patterns with k > 6 are rejected rather than silently built. */
  def permute(steps: Seq[Step]): Seq[Seq[Step]] = {
    require(steps.size <= 6, s"PERMUTE over ${steps.size} steps (max 6)")
    steps.permutations.toSeq
  }

  final case class PatternMatch(
      key: Long, match_no: Long, start_us: Long, end_us: Long, n_rows: Long)

  final case class PatternMatchAlt(
      key: Long, match_no: Long, branch: Long, start_us: Long, end_us: Long,
      n_rows: Long)

  /** ALL ROWS PER MATCH output row: one per matched input row, with the
    * step name the row was mapped to (Trino's CLASSIFIER()) and its
    * 1-based position in the match. */
  final case class PatternRowAll(
      key: Long, match_no: Long, row_in_match: Long, classifier: String,
      ts_us: Long)

  /** ALL ROWS PER MATCH + MEASURES output row: adds the measured value
    * and its RUNNING (prefix up to and including this row) and FINAL
    * (whole-match) sums — Trino's `RUNNING sum(m)` / `FINAL sum(m)`
    * semantics; `row_in_match` is `RUNNING count(*)` and `n_rows` is
    * `FINAL count(*)`. */
  final case class PatternRowMeasure(
      key: Long, match_no: Long, row_in_match: Long, n_rows: Long,
      classifier: String, ts_us: Long, m: Long, running_sum: Long,
      final_sum: Long)

  /** One branch = (step-id per position → preds column, quantifier per
    * position). */
  private type Branch = (Array[Int], Array[Quant])

  /** AFTER MATCH SKIP policy: PAST LAST ROW (default — matches never
    * overlap), TO NEXT ROW (the Trino overlapping-matches mode: the next
    * attempt starts one row after the previous match's START), or TO
    * FIRST/LAST `<step>` (resume AT the first/last row the named step
    * matched). Per Trino, TO FIRST/LAST throws when the named step
    * matched no row in the match, and when the skip target IS the match
    * start (which would loop forever). */
  sealed trait AfterMatch
  case object SkipPastLastRow extends AfterMatch
  case object SkipToNextRow extends AfterMatch
  final case class SkipToFirst(step: String) extends AfterMatch
  final case class SkipToLast(step: String) extends AfterMatch

  /** Core matcher over one key's sorted buffer: leftmost-first with
    * bounded backtracking, ordered-branch alternation, SKIP PAST LAST
    * ROW, `within` post-filter per branch attempt. Returns
    * (startIdx, endIdx, branchIdx) spans in stream order. Shared by the
    * batch operators below and the streaming form
    * (streaming.EventStreams.patternMatchesWithState).
    */
  private[graft] def matchSpansBranches(ts: Array[Long],
      preds: Array[Array[Boolean]], branches: Array[Branch],
      withinUs: Option[Long],
      afterMatch: AfterMatch = SkipPastLastRow): Seq[(Int, Int, Int)] =
    matchSpansBranchesFull(ts, preds, branches, withinUs, afterMatch)
      .map { case (s, e, b, _) => (s, e, b) }

  /** Full form: each match also carries the step POSITION (index into the
    * winning branch) each matched row was consumed by, as a slice aligned
    * to rows start..end. The assignment array is written at every row
    * consumption, and within an accepted span each row's LAST write is by
    * the step that kept it (later steps overwrite failed longer attempts
    * of earlier ones), so the slice is exactly the accepted path.
    * `branchNames` (parallel to `branches`, step name per position) is
    * required for the SKIP TO FIRST/LAST policies only. */
  private[graft] def matchSpansBranchesFull(ts: Array[Long],
      preds: Array[Array[Boolean]], branches: Array[Branch],
      withinUs: Option[Long],
      afterMatch: AfterMatch = SkipPastLastRow,
      branchNames: Array[Array[String]] = null)
      : Seq[(Int, Int, Int, Array[Int])] = {
    val len = ts.length
    val asg = new Array[Int](len)
    // backtracking regex over the row sequence; returns the inclusive
    // end index of the first match anchored at `pos`, or -1
    def go(pos: Int, step: Int, ids: Array[Int], quants: Array[Quant]): Int = {
      if (step == quants.length) return pos - 1
      val q = quants(step)
      val id = ids(step)
      var p = pos
      var taken = 0
      while (taken < q.min) {
        if (p < len && preds(p)(id)) { asg(p) = step; p += 1; taken += 1 }
        else return -1
      }
      val budget = q.max - q.min // extra reps beyond the mandatory min
      if (budget == 0) go(p, step + 1, ids, quants)
      else if (q.greedy) {
        var maxP = p
        var extra = 0
        while (maxP < len && extra < budget && preds(maxP)(id)) {
          asg(maxP) = step; maxP += 1; extra += 1
        }
        var tryP = maxP
        while (tryP >= p) {
          val r = go(tryP, step + 1, ids, quants)
          if (r >= 0) return r
          tryP -= 1
        }
        -1
      } else {
        var tryP = p
        var extra = 0
        while (true) {
          val r = go(tryP, step + 1, ids, quants)
          if (r >= 0) return r
          if (tryP < len && extra < budget && preds(tryP)(id)) {
            asg(tryP) = step; tryP += 1; extra += 1
          } else return -1
        }
        -1
      }
    }
    val acc = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int, Array[Int])]
    var start = 0
    while (start < len) {
      var matched = false
      var b = 0
      while (!matched && b < branches.length) {
        val (ids, quants) = branches(b)
        val end = go(start, 0, ids, quants)
        if (end >= start && withinUs.forall(w => ts(end) - ts(start) <= w)) {
          val path = java.util.Arrays.copyOfRange(asg, start, end + 1)
          acc += ((start, end, b, path))
          start = afterMatch match {
            case SkipPastLastRow => end + 1 // matches never overlap
            case SkipToNextRow => start + 1 // overlapping matches allowed
            case SkipToFirst(name) => skipTarget(name, first = true,
              start, path, branchNames(b))
            case SkipToLast(name) => skipTarget(name, first = false,
              start, path, branchNames(b))
          }
          matched = true
        } else b += 1
      }
      if (!matched) start += 1
    }
    acc.toSeq
  }

  /** Resume index for SKIP TO FIRST/LAST `name`: the first/last row of
    * the match whose step name matches, per Trino — errors when the step
    * matched no row or when resuming at the match start (infinite loop). */
  private def skipTarget(name: String, first: Boolean, start: Int,
      path: Array[Int], names: Array[String]): Int = {
    require(names != null, "SKIP TO FIRST/LAST needs step names")
    var found = -1
    var off = 0
    while (off < path.length && (found < 0 || !first)) {
      if (names(path(off)) == name) found = off
      off += 1
    }
    if (found < 0) throw new IllegalStateException(
      s"AFTER MATCH SKIP TO ${if (first) "FIRST" else "LAST"} $name: " +
        "step matched no row in the match")
    if (found == 0) throw new IllegalStateException(
      s"AFTER MATCH SKIP TO $name would resume at the match start " +
        "(infinite loop)")
    start + found
  }

  /** Single-branch form (kept for the batch `matches` operator and the
    * streaming matcher): identity step mapping, spans only. */
  private[graft] def matchSpans(ts: Array[Long], preds: Array[Array[Boolean]],
      quants: Array[Quant], withinUs: Option[Long]): Seq[(Int, Int)] =
    matchSpansBranches(ts, preds,
      Array((Array.tabulate(quants.length)(identity), quants)), withinUs)
      .map { case (s, e, _) => (s, e) }

  /** Match `steps` over `df` per `keyCol`, ordered by (`tsCol`,
    * `tiebreakCol`). Key and tiebreak must be integral; ts must be (or
    * cast to) a timestamp. Returns one row per match.
    */
  def matches(df: DataFrame, keyCol: String, tsCol: String,
      tiebreakCol: String, steps: Seq[Step],
      withinUs: Option[Long] = None,
      afterMatch: AfterMatch = SkipPastLastRow): DataFrame = {
    require(steps.nonEmpty, "empty pattern")
    val n = steps.size
    val quants = steps.map(_.quant).toArray
    val stepNames = steps.map(_.name).toArray
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
        matchSpansBranchesFull(ts, preds,
          Array((Array.tabulate(quants.length)(identity), quants)),
          withinUs, afterMatch, Array(stepNames))
          .map { case (s0, e0, _, _) => (s0, e0) }.zipWithIndex.map {
          case ((start, end), idx) =>
            PatternMatch(k, idx.toLong + 1, ts(start), ts(end),
              (end - start + 1).toLong)
        }
      }
    out.withColumnRenamed("key", keyCol)
  }

  /** ALL ROWS PER MATCH form of `matches`: one output row per MATCHED
    * input row, carrying the match number, the row's 1-based position in
    * its match, and the step name it was consumed by (Trino's
    * CLASSIFIER()). Unmatched rows are omitted (Trino's ALL ROWS PER
    * MATCH default; [[matchesAllRowsUnmatched]] is the WITH UNMATCHED
    * ROWS variant).
    * Same scale shape as `matches` — the shuffle carries one boolean per
    * step, and the fan-out to matched rows happens after the per-key
    * scan, never wider than the input. */
  def matchesAllRows(df: DataFrame, keyCol: String, tsCol: String,
      tiebreakCol: String, steps: Seq[Step],
      withinUs: Option[Long] = None,
      afterMatch: AfterMatch = SkipPastLastRow): DataFrame = {
    require(steps.nonEmpty, "empty pattern")
    val n = steps.size
    val quants = steps.map(_.quant).toArray
    val stepNames = steps.map(_.name).toArray
    val prep = df.select(
      col(keyCol).cast("long").as("__k") +:
      unix_micros(col(tsCol).cast("timestamp")).as("__ts") +:
      col(tiebreakCol).cast("long").as("__tb") +:
      steps.zipWithIndex.map { case (st, i) =>
        st.pred.cast("boolean").as(s"__p$i") }: _*)

    implicit val keyEnc = Encoders.scalaLong
    implicit val outEnc = Encoders.product[PatternRowAll]
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
        matchSpansBranchesFull(ts, preds,
          Array((Array.tabulate(quants.length)(identity), quants)),
          withinUs, afterMatch, Array(stepNames))
          .zipWithIndex.flatMap { case ((start, end, _, path), idx) =>
            (start to end).map { p =>
              PatternRowAll(k, idx.toLong + 1, (p - start + 1).toLong,
                stepNames(path(p - start)), ts(p))
            }
          }
      }
    out.withColumnRenamed("key", keyCol)
  }

  /** ALL ROWS PER MATCH **WITH UNMATCHED ROWS** output row: one per INPUT
    * row. Rows consumed by a match carry its number/position/classifier;
    * rows no match consumed carry NULLs in all three (Trino's semantics —
    * MATCH_NUMBER()/CLASSIFIER() are null on unmatched rows). */
  final case class PatternRowUnmatched(
      key: Long, match_no: Option[Long], row_in_match: Option[Long],
      classifier: Option[String], ts_us: Long)

  /** ALL ROWS PER MATCH WITH UNMATCHED ROWS (the remaining Trino
    * row-pattern output mode, r8 verdict "missing" #2): EVERY input row
    * is emitted in stream order — matched rows exactly as
    * [[matchesAllRows]] labels them, unmatched rows with null
    * match_no/row_in_match/classifier. Restricted to AFTER MATCH SKIP
    * PAST LAST ROW (matches never overlap, so "the match that consumed
    * this row" is unique — the same reason Trino pairs this mode with
    * non-overlapping skip in practice); other skip policies throw.
    * Scale shape unchanged from `matchesAllRows`: one boolean per step
    * through the keyed shuffle, output exactly as wide as the input. */
  def matchesAllRowsUnmatched(df: DataFrame, keyCol: String, tsCol: String,
      tiebreakCol: String, steps: Seq[Step],
      withinUs: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "empty pattern")
    val n = steps.size
    val quants = steps.map(_.quant).toArray
    val stepNames = steps.map(_.name).toArray
    val prep = df.select(
      col(keyCol).cast("long").as("__k") +:
      unix_micros(col(tsCol).cast("timestamp")).as("__ts") +:
      col(tiebreakCol).cast("long").as("__tb") +:
      steps.zipWithIndex.map { case (st, i) =>
        st.pred.cast("boolean").as(s"__p$i") }: _*)

    implicit val keyEnc = Encoders.scalaLong
    implicit val outEnc = Encoders.product[PatternRowUnmatched]
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
        // per-row labels from the (non-overlapping) spans
        val mno = new Array[Long](len) // 0 = unmatched
        val rim = new Array[Long](len)
        val cls = new Array[String](len)
        matchSpansBranchesFull(ts, preds,
          Array((Array.tabulate(quants.length)(identity), quants)),
          withinUs, SkipPastLastRow, Array(stepNames))
          .zipWithIndex.foreach { case ((start, end, _, path), idx) =>
            var p = start
            while (p <= end) {
              mno(p) = idx.toLong + 1
              rim(p) = (p - start + 1).toLong
              cls(p) = stepNames(path(p - start))
              p += 1
            }
          }
        (0 until len).map { p =>
          if (mno(p) > 0)
            PatternRowUnmatched(k, Some(mno(p)), Some(rim(p)),
              Some(cls(p)), ts(p))
          else PatternRowUnmatched(k, None, None, None, ts(p))
        }
      }
    out.withColumnRenamed("key", keyCol)
  }

  /** MEASURES form of [[matchesAllRows]]: `measure` (any integral-valued
    * column — quantize doubles upstream for cross-engine exactness) is
    * carried through the keyed shuffle alongside the step booleans, and
    * every output row reports Trino's RUNNING sum (prefix up to this
    * row) and FINAL sum (whole match) of it, plus FINAL count(*) as
    * n_rows. Same scale shape: the shuffle row grows by one long; the
    * per-match sums are computed inside the per-key scan, no extra
    * shuffle or window. */
  def matchesAllRowsMeasures(df: DataFrame, keyCol: String, tsCol: String,
      tiebreakCol: String, steps: Seq[Step], measure: Column,
      withinUs: Option[Long] = None,
      afterMatch: AfterMatch = SkipPastLastRow): DataFrame = {
    require(steps.nonEmpty, "empty pattern")
    val n = steps.size
    val quants = steps.map(_.quant).toArray
    val stepNames = steps.map(_.name).toArray
    val prep = df.select(
      col(keyCol).cast("long").as("__k") +:
      unix_micros(col(tsCol).cast("timestamp")).as("__ts") +:
      col(tiebreakCol).cast("long").as("__tb") +:
      measure.cast("long").as("__m") +:
      steps.zipWithIndex.map { case (st, i) =>
        st.pred.cast("boolean").as(s"__p$i") }: _*)

    implicit val keyEnc = Encoders.scalaLong
    implicit val outEnc = Encoders.product[PatternRowMeasure]
    val out = prep.filter(col("__k").isNotNull)
      .groupByKey(_.getLong(0))
      .flatMapSortedGroups(col("__ts"), col("__tb")) { (k, it) =>
        val rows = it.toArray
        val len = rows.length
        val ts = new Array[Long](len)
        val ms = new Array[Long](len)
        val preds = Array.ofDim[Boolean](len, n)
        var i = 0
        while (i < len) {
          val r = rows(i)
          ts(i) = r.getLong(1)
          ms(i) = if (r.isNullAt(3)) 0L else r.getLong(3)
          var s = 0
          while (s < n) {
            preds(i)(s) = !r.isNullAt(4 + s) && r.getBoolean(4 + s)
            s += 1
          }
          i += 1
        }
        matchSpansBranchesFull(ts, preds,
          Array((Array.tabulate(quants.length)(identity), quants)),
          withinUs, afterMatch, Array(stepNames))
          .zipWithIndex.flatMap { case ((start, end, _, path), idx) =>
            var total = 0L
            var p = start
            while (p <= end) { total += ms(p); p += 1 }
            var running = 0L
            (start to end).map { q =>
              running += ms(q)
              PatternRowMeasure(k, idx.toLong + 1, (q - start + 1).toLong,
                (end - start + 1).toLong, stepNames(path(q - start)), ts(q),
                ms(q), running, total)
            }
          }
      }
    out.withColumnRenamed("key", keyCol)
  }

  /** Alternation form: match the first branch (in listed order) at each
    * anchor. Steps are deduplicated BY NAME across branches — a name
    * identifies one predicate (the first definition wins; quantifiers
    * stay per-position, so `B` in one branch and `B?` in another share a
    * shuffled boolean). Output adds a 1-based `branch` column naming the
    * winning alternative. `permute(steps)` builds the PERMUTE expansion.
    */
  def matchesAlt(df: DataFrame, keyCol: String, tsCol: String,
      tiebreakCol: String, branches: Seq[Seq[Step]],
      withinUs: Option[Long] = None,
      afterMatch: AfterMatch = SkipPastLastRow): DataFrame = {
    require(branches.nonEmpty && branches.forall(_.nonEmpty),
      "empty alternation or empty branch")
    val distinct = scala.collection.mutable.LinkedHashMap.empty[String, Step]
    branches.flatten.foreach(st => distinct.getOrElseUpdate(st.name, st))
    val steps = distinct.values.toSeq
    val idOf = distinct.keys.zipWithIndex.toMap
    val n = steps.size
    val branchArr: Array[Branch] = branches.map(b =>
      (b.map(st => idOf(st.name)).toArray, b.map(_.quant).toArray)).toArray
    val branchNameArr: Array[Array[String]] =
      branches.map(_.map(_.name).toArray).toArray
    val prep = df.select(
      col(keyCol).cast("long").as("__k") +:
      unix_micros(col(tsCol).cast("timestamp")).as("__ts") +:
      col(tiebreakCol).cast("long").as("__tb") +:
      steps.zipWithIndex.map { case (st, i) =>
        st.pred.cast("boolean").as(s"__p$i") }: _*)

    implicit val keyEnc = Encoders.scalaLong
    implicit val outEnc = Encoders.product[PatternMatchAlt]
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
        matchSpansBranchesFull(ts, preds, branchArr, withinUs, afterMatch,
          branchNameArr)
          .zipWithIndex.map {
          case ((start, end, b, _), idx) =>
            PatternMatchAlt(k, idx.toLong + 1, b.toLong + 1, ts(start),
              ts(end), (end - start + 1).toLong)
        }
      }
    out.withColumnRenamed("key", keyCol)
  }
}
