package graft

import graft.ops.{Events, RowPattern}
import graft.ops.RowPattern._
import org.apache.spark.sql.functions._

/** RowPattern (MATCH_RECOGNIZE shape): quantifier semantics on synthetic
  * streams, full multi-match parity against an INDEPENDENT reference
  * (java.util.regex over per-user char-encoded streams — same greedy /
  * reluctant / leftmost-match / skip-past-last-row rules by construction),
  * and the e7 special-case equivalence the operator generalizes.
  */
class RowPatternSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def streamDf(rows: Seq[(Long, Long, String)]) =
    rows.toDF("user_id", "us", "event_type")
      .withColumn("ts", timestamp_micros(col("us")))
      .withColumn("event_id", col("us"))

  test("exactly-one and plus quantifiers over contiguous rows") {
    val df = streamDf(Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "b"), (1L, 4L, "c"),
      (1L, 5L, "a"), (1L, 6L, "c"), // no b between -> no match
      (2L, 1L, "a"), (2L, 2L, "b"), (2L, 3L, "c")))
    val m = RowPattern.matches(df, "user_id", "ts", "event_id", Seq(
      Step("a", col("event_type") === "a"),
      Step("b", col("event_type") === "b", plus),
      Step("c", col("event_type") === "c")))
      .select("user_id", "match_no", "start_us", "end_us", "n_rows")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    // user 1: a(1) b(2) b(3) c(4) matches; a(5) c(6) has no b so B+ fails.
    // user 2: a(1) b(2) c(3).
    assert(m == Set((1L, 1L, 1L, 4L, 4L), (2L, 1L, 1L, 3L, 3L)))
  }

  test("greedy vs reluctant star select different ends") {
    // stream: a x c x c — greedy (a (¬c)* then …) vs reluctant differ on
    // pattern a .* c: greedy takes the LAST c, reluctant the FIRST
    val df = streamDf(Seq(
      (1L, 1L, "a"), (1L, 2L, "x"), (1L, 3L, "c"), (1L, 4L, "x"), (1L, 5L, "c")))
    def run(q: Quant) = RowPattern.matches(df, "user_id", "ts", "event_id", Seq(
        Step("a", col("event_type") === "a"),
        Step("any", lit(true), q),
        Step("c", col("event_type") === "c")))
      .select("end_us").collect().map(_.getLong(0)).toSeq
    assert(run(star) == Seq(5L))
    assert(run(starReluctant) == Seq(3L))
  }

  test("within post-filter rejects long matches but later starts still match") {
    val df = streamDf(Seq(
      (1L, 0L, "a"), (1L, 1000L, "c"),           // span 1000us
      (1L, 2000L, "a"), (1L, 2100L, "c")))       // span 100us
    val m = RowPattern.matches(df, "user_id", "ts", "event_id", Seq(
        Step("a", col("event_type") === "a"),
        Step("c", col("event_type") === "c")),
      withinUs = Some(500L))
      .select("start_us", "end_us").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // note steps are contiguous: a then c immediately — first pair fails
    // within, second passes
    assert(m == Seq((2000L, 2100L)))
  }

  /** Independent reference: per-user char stream + java.util.regex, with
    * the same leftmost-match, skip-past-last-row, within-retry rules. */
  private def refMatches(types: IndexedSeq[Char], ts: IndexedSeq[Long],
      regex: String, withinUs: Long): Seq[(Long, Long, Long, Long)] = {
    val s = new String(types.toArray)
    val pat = java.util.regex.Pattern.compile(regex)
    val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    var from = 0
    var no = 0L
    val m = pat.matcher(s)
    while (from < s.length && m.find(from)) {
      val st = m.start; val en = m.end - 1
      if (ts(en) - ts(st) <= withinUs) {
        no += 1
        acc += ((no, ts(st), ts(en), (en - st + 1).toLong))
        from = en + 1
      } else from = st + 1
    }
    acc.toSeq
  }

  test("full multi-match output matches the regex reference on real events") {
    val e = Tables.events(spark, sf)
    val got = RowPattern.matches(e, "user_id", "ts", "event_id", Seq(
        Step("view", col("event_type") === "view"),
        Step("gap1", col("event_type") =!= "click" && col("event_type") =!= "purchase", star),
        Step("click", col("event_type") === "click"),
        Step("gap2", col("event_type") =!= "purchase", star),
        Step("purchase", col("event_type") === "purchase")),
      withinUs = Some(24L * 3600 * 1000000))
      .select("user_id", "match_no", "start_us", "end_us", "n_rows")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet

    val rows = e.select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("us"),
        col("event_type"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .groupBy(_._1)
    val expected = rows.flatMap { case (uid, rs) =>
      val sorted = rs.sortBy(t => (t._2, t._4))
      val types = sorted.map(t => t._3 match {
        case "view" => 'v'; case "click" => 'c'; case "purchase" => 'p'; case _ => 'x'
      }).toIndexedSeq
      val ts = sorted.map(_._2).toIndexedSeq
      refMatches(types, ts, "v[^cp]*c[^p]*p", 24L * 3600 * 1000000)
        .map { case (no, s, en, n) => (uid, no, s, en, n) }
    }.toSet
    assert(expected.nonEmpty, "fixture should contain at least one match")
    assert(got == expected,
      s"missing=${expected.diff(got).take(3)} extra=${got.diff(expected).take(3)}")
  }

  test("optional quantifier: bounded max, greedy vs reluctant") {
    val df = streamDf(Seq(
      (1L, 1L, "a"), (1L, 2L, "c"),                               // a b? c: b absent
      (2L, 1L, "a"), (2L, 2L, "b"), (2L, 3L, "c"),                // b present
      (3L, 1L, "a"), (3L, 2L, "b"), (3L, 3L, "b"), (3L, 4L, "c")) // bb exceeds max=1
    )
    val m = RowPattern.matches(df, "user_id", "ts", "event_id", Seq(
        Step("a", col("event_type") === "a"),
        Step("b", col("event_type") === "b", opt),
        Step("c", col("event_type") === "c")))
      .select("user_id", "n_rows").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(m == Set((1L, 2L), (2L, 3L)), "user 3 must NOT match: b? admits at most one b")

    // greedy optional consumes the extra row; reluctant stops without it
    val tail = streamDf(Seq((1L, 1L, "a"), (1L, 2L, "x")))
    def run(q: Quant) = RowPattern.matches(tail, "user_id", "ts", "event_id", Seq(
        Step("a", col("event_type") === "a"),
        Step("any", lit(true), q))).select("n_rows").collect().head.getLong(0)
    assert(run(opt) == 2L)
    assert(run(optReluctant) == 1L)
  }

  test("alternation: ordered branch preference and branch labeling") {
    val df = streamDf(Seq(
      (1L, 1L, "a"), (1L, 2L, "p"),   // both branches could anchor; branch 1 wins
      (2L, 1L, "a"), (2L, 2L, "s"),   // only branch 2 matches
      (3L, 1L, "s")))                 // no anchor
    val m = RowPattern.matchesAlt(df, "user_id", "ts", "event_id", Seq(
        Seq(Step("a", col("event_type") === "a"), Step("p", col("event_type") === "p")),
        Seq(Step("a", col("event_type") === "a"), Step("s", col("event_type") === "s"))))
      .select("user_id", "branch").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(m == Set((1L, 1L), (2L, 2L)))
  }

  test("alternation: a within-violating branch falls through to the next") {
    val df = streamDf(Seq((1L, 0L, "a"), (1L, 10L, "y"), (1L, 10000L, "z")))
    val m = RowPattern.matchesAlt(df, "user_id", "ts", "event_id", Seq(
        Seq(Step("a", col("event_type") === "a"),
          Step("any", col("event_type") =!= "z", star),
          Step("z", col("event_type") === "z")),
        Seq(Step("a", col("event_type") === "a"),
          Step("y", col("event_type") === "y"))),
      withinUs = Some(100L))
      .select("branch", "end_us").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(m == Seq((2L, 10L)), "branch 1 spans 10000us > within; branch 2 must win")
  }

  test("PERMUTE expands lexicographically and matches any order") {
    val branches = RowPattern.permute(Seq(
      Step("a", col("event_type") === "a"),
      Step("b", col("event_type") === "b"),
      Step("c", col("event_type") === "c")))
    assert(branches.size == 6)
    // b a c is the 3rd permutation of (a, b, c): abc, acb, bac, ...
    val df = streamDf(Seq(
      (1L, 1L, "b"), (1L, 2L, "a"), (1L, 3L, "c"),
      (2L, 1L, "c"), (2L, 2L, "b"), (2L, 3L, "a"),  // cba: 6th
      (3L, 1L, "a"), (3L, 2L, "c"), (3L, 3L, "b"),  // acb: 2nd
      (4L, 1L, "a"), (4L, 2L, "a"), (4L, 3L, "b"))) // no full permutation
    val m = RowPattern.matchesAlt(df, "user_id", "ts", "event_id", branches)
      .select("user_id", "branch", "n_rows").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(m == Set((1L, 3L, 3L), (2L, 6L, 3L), (3L, 2L, 3L)))
  }

  /** Alternation reference: java.util.regex with one capture group per
    * branch — find() is leftmost-first then alternative-order, the same
    * preference rule as matchSpansBranches. */
  private def refMatchesAlt(types: IndexedSeq[Char], ts: IndexedSeq[Long],
      branchRegexes: Seq[String]): Seq[(Long, Long, Long, Long, Long)] = {
    val pat = java.util.regex.Pattern.compile(
      branchRegexes.map(r => s"($r)").mkString("|"))
    val s = new String(types.toArray)
    val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long)]
    var from = 0
    var no = 0L
    val m = pat.matcher(s)
    while (from < s.length && m.find(from)) {
      val st = m.start; val en = m.end - 1
      val branch = (1 to branchRegexes.size).find(g => m.group(g) != null).get
      no += 1
      acc += ((no, branch.toLong, ts(st), ts(en), (en - st + 1).toLong))
      from = en + 1
    }
    acc.toSeq
  }

  test("alternation multi-match parity vs the regex reference on real events") {
    val e = Tables.events(spark, sf)
    val got = RowPattern.matchesAlt(e, "user_id", "ts", "event_id", Seq(
        Seq(Step("view", col("event_type") === "view"),
          Step("gap", col("event_type") =!= "purchase" && col("event_type") =!= "signup", star),
          Step("purchase", col("event_type") === "purchase")),
        Seq(Step("view", col("event_type") === "view"),
          Step("gap", col("event_type") =!= "purchase" && col("event_type") =!= "signup", star),
          Step("signup", col("event_type") === "signup"))))
      .select("user_id", "match_no", "branch", "start_us", "end_us", "n_rows")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSet

    val rows = e.select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("us"),
        col("event_type"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .groupBy(_._1)
    val expected = rows.flatMap { case (uid, rs) =>
      val sorted = rs.sortBy(t => (t._2, t._4))
      val types = sorted.map(t => t._3 match {
        case "view" => 'v'; case "purchase" => 'p'; case "signup" => 's'; case _ => 'x'
      }).toIndexedSeq
      val ts = sorted.map(_._2).toIndexedSeq
      refMatchesAlt(types, ts, Seq("v[^ps]*p", "v[^ps]*s"))
        .map { case (no, b, s0, en, n) => (uid, no, b, s0, en, n) }
    }.toSet
    assert(expected.nonEmpty, "fixture should contain at least one match")
    assert(got == expected,
      s"missing=${expected.diff(got).take(3)} extra=${got.diff(expected).take(3)}")
  }

  test("AFTER MATCH SKIP TO NEXT ROW yields overlapping matches") {
    // pattern a a on stream a a a: skip-past gives one match (rows 1-2);
    // skip-to-next gives two (1-2 and 2-3)
    val df = streamDf(Seq((1L, 1L, "a"), (1L, 2L, "a"), (1L, 3L, "a")))
    val steps = Seq(
      Step("a1", col("event_type") === "a"),
      Step("a2", col("event_type") === "a"))
    def spans(m: org.apache.spark.sql.DataFrame) =
      m.select("start_us", "end_us").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(spans(RowPattern.matches(df, "user_id", "ts", "event_id", steps))
      == Set((1L, 2L)))
    assert(spans(RowPattern.matches(df, "user_id", "ts", "event_id", steps,
        afterMatch = RowPattern.SkipToNextRow))
      == Set((1L, 2L), (2L, 3L)))
  }

  test("SKIP TO NEXT ROW parity vs the regex reference on real events") {
    val e = Tables.events(spark, sf)
    val steps = Seq(
      Step("view", col("event_type") === "view"),
      Step("gap", col("event_type") =!= "purchase", star),
      Step("purchase", col("event_type") === "purchase"))
    val got = RowPattern.matches(e, "user_id", "ts", "event_id", steps,
        afterMatch = RowPattern.SkipToNextRow)
      .select("user_id", "start_us", "end_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val rows = e.select(col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"),
        col("event_type"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .groupBy(_._1)
    val expected = rows.flatMap { case (uid, rs) =>
      val sorted = rs.sortBy(t => (t._2, t._4))
      val types = sorted.map(t => t._3 match {
        case "view" => 'v'; case "purchase" => 'p'; case _ => 'x'
      }).toIndexedSeq
      val ts = sorted.map(_._2).toIndexedSeq
      val pat = java.util.regex.Pattern.compile("v[^p]*p")
      val m = pat.matcher(new String(types.toArray))
      val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      var from = 0
      while (from < types.length && m.find(from)) {
        acc += ((uid, ts(m.start), ts(m.end - 1)))
        from = m.start + 1 // skip to next row: restart after match START
      }
      acc
    }.toSet
    assert(expected.nonEmpty)
    assert(got == expected,
      s"missing=${expected.diff(got).take(3)} extra=${got.diff(expected).take(3)}")
  }

  test("ALL ROWS PER MATCH: classifier names, row positions, omitted non-matches") {
    // stream: a b b c x a c — pattern a b* c. Match 1 = rows 1-4
    // (a,b,b,c); the x never appears; match 2 = rows 6-7 (a,c with b*
    // empty)
    val df = streamDf(Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "b"), (1L, 4L, "c"),
      (1L, 5L, "x"), (1L, 6L, "a"), (1L, 7L, "c")))
    val rows = RowPattern.matchesAllRows(df, "user_id", "ts", "event_id", Seq(
        Step("A", col("event_type") === "a"),
        Step("B", col("event_type") === "b", star),
        Step("C", col("event_type") === "c")))
      .select("match_no", "row_in_match", "classifier", "ts_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(rows == Seq(
      (1L, 1L, "A", 1L), (1L, 2L, "B", 2L), (1L, 3L, "B", 3L), (1L, 4L, "C", 4L),
      (2L, 1L, "A", 6L), (2L, 2L, "C", 7L)))
  }

  test("ALL ROWS PER MATCH classifier survives backtracking") {
    // greedy B = anything-but-nothing: B* would eat the c, then backtrack.
    // pattern a B* c on a x x c: B takes rows 2-3 only; classifier must
    // reflect the accepted path, not the failed greedy overreach
    val df = streamDf(Seq(
      (1L, 1L, "a"), (1L, 2L, "x"), (1L, 3L, "x"), (1L, 4L, "c")))
    val rows = RowPattern.matchesAllRows(df, "user_id", "ts", "event_id", Seq(
        Step("A", col("event_type") === "a"),
        Step("ANY", lit(true), star), // greedily eats through the c, must back off
        Step("C", col("event_type") === "c")))
      .select("row_in_match", "classifier")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(rows == Seq((1L, "A"), (2L, "ANY"), (3L, "ANY"), (4L, "C")))
  }

  test("WITH UNMATCHED ROWS: every input row, nulls outside matches") {
    // same stream/pattern as the ALL ROWS test; the x (row 5) must now
    // appear with null match_no/row_in_match/classifier
    val df = streamDf(Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "b"), (1L, 4L, "c"),
      (1L, 5L, "x"), (1L, 6L, "a"), (1L, 7L, "c")))
    val rows = RowPattern.matchesAllRowsUnmatched(df, "user_id", "ts",
        "event_id", Seq(
        Step("A", col("event_type") === "a"),
        Step("B", col("event_type") === "b", star),
        Step("C", col("event_type") === "c")))
      .select("match_no", "row_in_match", "classifier", "ts_us")
      .collect().map(r => (
        if (r.isNullAt(0)) -1L else r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) "-" else r.getString(2),
        r.getLong(3)))
      .sortBy(_._4).toSeq
    assert(rows == Seq(
      (1L, 1L, "A", 1L), (1L, 2L, "B", 2L), (1L, 3L, "B", 3L),
      (1L, 4L, "C", 4L), (-1L, -1L, "-", 5L),
      (2L, 1L, "A", 6L), (2L, 2L, "C", 7L)))
  }

  test("WITH UNMATCHED ROWS: matched subset equals matchesAllRows on real events") {
    // parity on real data: dropping the null rows must reproduce the
    // plain ALL ROWS PER MATCH output exactly, and the total row count
    // must equal the input row count (every row emitted exactly once)
    val ev = Tables.events(spark, sf)
    val steps = Seq(
      Step("V", col("event_type") === "view"),
      Step("G", col("event_type") =!= "purchase", star),
      Step("P", col("event_type") === "purchase"))
    val all = RowPattern.matchesAllRows(ev, "user_id", "ts", "event_id", steps)
      .select("user_id", "match_no", "row_in_match", "classifier", "ts_us")
      .collect().map(_.toSeq).toSet
    val un = RowPattern.matchesAllRowsUnmatched(
        ev, "user_id", "ts", "event_id", steps)
    assert(un.count() == ev.count())
    val matchedSubset = un.filter(col("match_no").isNotNull)
      .select("user_id", "match_no", "row_in_match", "classifier", "ts_us")
      .collect().map(_.toSeq).toSet
    assert(matchedSubset == all)
  }

  test("AFTER MATCH SKIP TO FIRST/LAST resumes at the named step's row") {
    // stream: a b a b a — pattern a b a. SKIP PAST LAST ROW: one match
    // (rows 1-3; restart at 4 finds b, no anchor until row 5's bare a).
    // SKIP TO LAST A resumes AT row 3's a → second match rows 3-5.
    val df = streamDf(Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "b"), (1L, 5L, "a")))
    val steps = Seq(
      Step("A1", col("event_type") === "a"),
      Step("B", col("event_type") === "b"),
      Step("A2", col("event_type") === "a"))
    def spans(am: RowPattern.AfterMatch) =
      RowPattern.matches(df, "user_id", "ts", "event_id", steps, afterMatch = am)
        .select("start_us", "end_us").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(spans(RowPattern.SkipPastLastRow) == Set((1L, 3L)))
    assert(spans(RowPattern.SkipToLast("A2")) == Set((1L, 3L), (3L, 5L)))
    // SKIP TO FIRST B resumes at row 2 — no anchor there; next anchor is
    // row 3, matching rows 3-5
    assert(spans(RowPattern.SkipToFirst("B")) == Set((1L, 3L), (3L, 5L)))
    // SKIP TO FIRST A1 would resume at the match start → loop → error
    val e1 = intercept[org.apache.spark.SparkException] {
      spans(RowPattern.SkipToFirst("A1"))
    }
    assert(e1.getMessage.contains("infinite loop") ||
      Option(e1.getCause).exists(_.getMessage.contains("infinite loop")))
    // a step that matched no row (optional, zero reps) → error per Trino
    val optSteps = Seq(
      Step("A1", col("event_type") === "a"),
      Step("Z", col("event_type") === "z", opt),
      Step("B", col("event_type") === "b"))
    val e2 = intercept[org.apache.spark.SparkException] {
      RowPattern.matches(df, "user_id", "ts", "event_id", optSteps,
        afterMatch = RowPattern.SkipToLast("Z")).collect()
    }
    assert(e2.getMessage.contains("matched no row") ||
      Option(e2.getCause).exists(_.getMessage.contains("matched no row")))
  }

  test("MEASURES: RUNNING prefix sum vs FINAL whole-match sum per row") {
    // stream (measure in parens): a(10) b(20) b(30) c(40), x(99), a(5) c(6)
    val df = Seq(
      (1L, 1L, "a", 10L), (1L, 2L, "b", 20L), (1L, 3L, "b", 30L),
      (1L, 4L, "c", 40L), (1L, 5L, "x", 99L), (1L, 6L, "a", 5L),
      (1L, 7L, "c", 6L))
      .toDF("user_id", "us", "event_type", "v")
      .withColumn("ts", timestamp_micros(col("us")))
      .withColumn("event_id", col("us"))
    val rows = RowPattern.matchesAllRowsMeasures(df, "user_id", "ts",
        "event_id", Seq(
          Step("A", col("event_type") === "a"),
          Step("B", col("event_type") === "b", star),
          Step("C", col("event_type") === "c")),
        measure = col("v"))
      .select("match_no", "row_in_match", "n_rows", "m", "running_sum",
        "final_sum")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(rows == Seq(
      (1L, 1L, 4L, 10L, 10L, 100L), (1L, 2L, 4L, 20L, 30L, 100L),
      (1L, 3L, 4L, 30L, 60L, 100L), (1L, 4L, 4L, 40L, 100L, 100L),
      (2L, 1L, 2L, 5L, 5L, 11L), (2L, 2L, 2L, 6L, 11L, 11L)))
  }

  test("reluctant skip-form first match reproduces the e7 funnel") {
    val e = Tables.events(spark, sf)
    val viaPattern = RowPattern.matches(e, "user_id", "ts", "event_id", Seq(
        Step("view", col("event_type") === "view"),
        Step("skip1", lit(true), starReluctant),
        Step("click", col("event_type") === "click"),
        Step("skip2", lit(true), starReluctant),
        Step("purchase", col("event_type") === "purchase")))
      .filter(col("match_no") === 1)
      .select(col("user_id"), col("start_us"), col("end_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaFunnel = Events.queries("e7_funnel")(spark, sf)
      .select(col("user_id"), col("t_view"), col("t_purchase"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaFunnel.nonEmpty)
    assert(viaPattern == viaFunnel)
  }
}
