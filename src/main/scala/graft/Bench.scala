package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark entry: times every declared query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line on stdout.
  *
  * The host this runs on shows large run-to-run swings (identical plans
  * measured 7.6 s vs 45 s across sessions — see BASELINE.md), so each query
  * is run SPARK_GRAFT_BENCH_REPS times (default 3) and the MEDIAN is
  * reported. Rep 1 additionally absorbs per-query codegen/classload
  * warm-up, which the median then discards — this closed the r2 gap where
  * a single cold rep charged ~30 s of JIT noise to individual queries.
  * Per-query medians (and each raw rep) go to stderr; stdout stays pure
  * JSON for the driver.
  *
  * Failure policy (r3 verdict "what's wrong" #1): a query that throws is
  * RECORDED, not swallowed — its message lands in an `"errors"` array in
  * the JSON line and the process exits nonzero, so breakage can never
  * bench as a ~0 s "fast" query. The correctness gate catches breakage
  * independently; the bench must not reward it.
  */
object Bench {

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** Time every query; returns per-query medians plus one error string
    * per (query, rep) that threw. Reps are interleaved ROUND-ROBIN (all
    * queries rep 1, then all rep 2, …), not back-to-back per query: on a
    * contended host a load burst spans minutes, and back-to-back reps put
    * all three samples of one query inside it — the r7 driver bench
    * measured unrelated queries uniformly 4–13× slower that way. With
    * interleaving, a burst shorter than a full pass inflates at most one
    * sample per query and the median discards it. Exposed package-private
    * so BenchSpec can prove a deliberately-broken query fails loudly. */
  private[graft] def run(
      spark: SparkSession, sfDir: String,
      queries: Map[String, (SparkSession, String) => DataFrame],
      reps: Int): (Seq[(String, Double)], Seq[String]) = {
    val errors = scala.collection.mutable.ArrayBuffer.empty[String]
    val ordered = queries.toSeq.sortBy(_._1)
    val samples =
      scala.collection.mutable.LinkedHashMap.from(
        ordered.map { case (name, _) => name -> Vector.empty[Double] })
    for (_ <- 1 to reps; (name, fn) <- ordered) {
      val t0 = System.nanoTime()
      // noop sink, NOT count(): count() lets Catalyst prune the output
      // projection, so projection-only queries (the scalar families,
      // l51/l56/l57) were timed as bare row counts — the ScaleRehearsal
      // fix, applied to the bench for the same honesty. It pruned
      // AGGREGATES too (count of groups needs only the grouping keys,
      // so every unreferenced sum/avg column was dropped — a1's sums
      // were never evaluated); under the noop sink every query pays
      // its real evaluation cost.
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          val msg = Option(e.getMessage).getOrElse("")
            .takeWhile(_ != '\n').take(200)
          errors += s"$name: ${e.getClass.getSimpleName}: $msg"
      }
      samples(name) = samples(name) :+ (System.nanoTime() - t0) / 1e9
    }
    val results = samples.toSeq.map { case (name, times) =>
      // lower-middle median: for odd reps the true median; for even reps
      // (e.g. REPS=2) the FASTER sample — the upper-middle would charge
      // rep-1 JIT warm-up as the result, the very noise the median exists
      // to discard
      val median = times.sorted.apply((times.size - 1) / 2)
      System.err.println(
        f"[bench] $name%-24s median $median%6.2f s  " +
          times.map(t => f"$t%.2f").mkString("[", " ", "]"))
      name -> median
    }
    (results, errors.toSeq.distinct)
  }

  /** Full per-query JSON (every median, full precision) — goes to stderr
    * and `bench_detail.json`, NOT stdout: the driver keeps only the last
    * 2000 characters of output, and BENCH_r01–r05 all show `parsed: null`
    * because a 200+-entry map (~7 KB) can never survive that tail buffer. */
  private[graft] def fullJson(results: Seq[(String, Double)],
      errors: Seq[String], sfDir: String): String = {
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val errField =
      if (errors.isEmpty) ""
      else errors.map(e => "\"" + jsonEscape(e) + "\"")
        .mkString(",\"errors\":[", ",", "]")
    s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$errField,"sf":"$sfDir"}"""
  }

  /** The ONE stdout JSON line, guaranteed complete inside the driver's
    * 2000-char tail: total + as many SLOWEST-first per-query entries as fit
    * a fixed character budget (3-decimal values), `"queries_n"` making the
    * subset explicit, and `"errors"` only when something threw. The full
    * map is in `bench_detail.json` / stderr. */
  private[graft] def jsonLine(results: Seq[(String, Double)],
      errors: Seq[String], sfDir: String, budget: Int = 1500): String = {
    val total = BigDecimal(results.map(_._2).sum)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP)
    val errField =
      if (errors.isEmpty) ""
      else errors.map(e => "\"" + jsonEscape(e).take(160) + "\"")
        .mkString(",\"errors\":[", ",", "]")
    val tailPart = s"""},"queries_n":${results.size},"detail":"bench_detail.json"$errField,"sf":"$sfDir"}"""
    val head = s"""{"metric":"total","value":$total,"unit":"sec","queries":{"""
    val fixed = head.length + tailPart.length
    val entries = results.sortBy(-_._2).iterator
      .map { case (k, v) =>
        val r = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)
        s"\"$k\":$r"
      }
    var used = fixed
    val kept = scala.collection.mutable.ArrayBuffer.empty[String]
    for (e <- entries if used + e.length + 1 <= budget) {
      used += e.length + 1
      kept += e
    }
    head + kept.mkString(",") + tailPart
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // Kryo for broadcast/task payloads (the SQL row path is
      // serializer-agnostic UnsafeRow either way): the suite's many
      // broadcast joins and checkpoints serialize measurably faster —
      // r17 A/B over a 12-query mixed subset, back-to-back, ~7–14% on
      // the subset sum, no query slower
      .config("spark.serializer",
        "org.apache.spark.serializer.KryoSerializer")
    // optional extra session confs for controlled A/B experiments
    // (semicolon-separated k=v); the driver never sets it
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      builder.config(k, v)
    })
    val spark = builder
      // the generated-class cache defaults to 100 entries; a 250+-query
      // suite in ROUND-ROBIN rep order cycles it completely, so every
      // rep of every query re-runs janino compilation (~0.3–1.5 s for a
      // wide plan — s18 measured 1.8 s benched vs 0.08 s warm). Sized to
      // hold the whole suite, reps 2..n measure execution, not the
      // compiler — exactly what a long-lived production executor sees.
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warm-up: one trivial scan+agg+join so the first measured
    // query isn't charged for session bring-up and compiler warm-up
    spark.read.parquet(s"$sfDir/region.parquet")
      .join(spark.read.parquet(s"$sfDir/nation.parquet"),
        org.apache.spark.sql.functions.col("r_regionkey") ===
        org.apache.spark.sql.functions.col("n_regionkey"))
      .groupBy("r_name").count().count()
    // Dialect-path warm-up (r10 verdict #7): p2_presto_sql paid a 4.2×
    // first-touch spike under the driver because the first PrestoSql.sql
    // call initializes the translation regex/parser machinery. One
    // untimed trivial dialect call moves that cost here.
    try graft.presto.PrestoSql.sql(spark, "SELECT 1 AS warm").count()
    catch { case e: Exception =>
      System.err.println(s"[bench] dialect warm-up failed: $e") }
    // local-iteration filter (comma-separated names); the driver never
    // sets it, so the gate always benches the full set
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val picked = SparkEntry.queries
      .filter { case (k, _) => only.forall(_.contains(k)) }
    val (results, errors) = run(spark, sfDir, picked, reps)
    val full = fullJson(results, errors, sfDir)
    System.err.println(s"[bench] full: $full")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_detail.json"),
      full.getBytes("UTF-8"))
    catch { case e: Exception =>
      System.err.println(s"[bench] could not write bench_detail.json: $e") }
    val summary = jsonLine(results, errors, sfDir)
    // the stdout line is the driver contract; the file is the durable
    // copy (r12 ADVICE: the captured stdout tail once arrived with an
    // sbt '[info] ' prefix and the driver's parse came back null —
    // future rounds can diff this file programmatically regardless)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_summary.json"),
      summary.getBytes("UTF-8"))
    catch { case e: Exception =>
      System.err.println(s"[bench] could not write bench_summary.json: $e") }
    println(summary)
    spark.stop()
    if (errors.nonEmpty) {
      System.err.println(s"[bench] ${errors.size} query error(s):")
      errors.foreach(e => System.err.println(s"[bench]   $e"))
      sys.exit(1)
    }
  }
}
