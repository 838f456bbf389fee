package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, StructField, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet tables (TESTDATA.md,
  * FIXTURES.md). Schemas come from the parquet footers — no inference.
  *
  * Scale note: `spark.read.parquet` gives Catalyst a pruned, filter-pushed
  * columnar scan; at 100 TB the same call over a partitioned directory
  * layout picks up partition pruning for free (see Sources.S6).
  *
  * Drift-proofing: upstream writers are free to change the physical
  * encoding of timestamp columns between regenerations — observed
  * encodings so far are parquet TIMESTAMP(NANOS) (round ≤5 data) and
  * TIMESTAMP(MICROS, isAdjustedToUTC=false) (round 6+ data). A real ETL
  * tool reads whatever the writer produced, so every loader here
  * type-dispatches on the schema Spark actually loaded and normalizes
  * timestamp-like columns to session-TZ [[TimestampType]]:
  *
  *   - `LongType` (raw ns via the `nanosAsLong` legacy flag, or a plain
  *     INT64 epoch column): unit decided by magnitude sampling
  *     ([[epochUnitOf]] — ns/µs/ms bands, loud failure outside them),
  *     then converted via `timestamp_micros`.
  *   - `TimestampNTZType` (μs, not UTC-adjusted): `cast("timestamp")` —
  *     wall-clock reinterpreted in the session zone (UTC here), which
  *     matches DuckDB's view of the same column.
  *   - `TimestampType`: already what we want — passthrough.
  *
  * The normalization is applied to EVERY column of the table (not just
  * `events.ts`), so `o_orderdate` / `l_shipdate` keep a stable output
  * type regardless of writer encoding.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Per-(session, path) memo of the LOADED DataFrame — catalog metadata,
  // not results: a DataFrame is an immutable lazy plan, so every
  // execution still scans the parquet freshly; what the memo removes is
  // the footer/schema-inference pass `spark.read.parquet` runs per call
  // (measured r17: one 1-task ~40 ms Spark job per table load, and the
  // dialect queries load all 10 tables via registerAll on every bench
  // rep — exactly the metadata a real catalog caches per session).
  // WeakHashMap on the session: dropped with it, never crosses JVMs.
  private val tableCache =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession,
        java.util.concurrent.ConcurrentHashMap[String, DataFrame]]())

  private def cached(spark: SparkSession, key: String)(
      build: => DataFrame): DataFrame = {
    val m = tableCache.synchronized {
      var mm = tableCache.get(spark)
      if (mm == null) {
        mm = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
        tableCache.put(spark, mm)
      }
      mm
    }
    m.computeIfAbsent(key, _ => build)
  }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else cached(spark, s"$sfDir/$name.parquet")(
      normalizeTimestamps(read(spark, s"$sfDir/$name.parquet")))

  /** Read with the nanos legacy flag on: harmless for μs data, and the
    * only way Spark 4 loads parquet TIMESTAMP(NANOS) at all (as raw
    * longs, which [[normalizeTimestamps]] then converts).
    */
  private def read(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(path)
  }

  /** Normalize one column to session-TZ TimestampType per the dispatch
    * table above; non-timestamp columns pass through untouched. `isTs`
    * gates which LongType columns are treated as ns-epochs (a raw long
    * is only a timestamp if the column is known to be one — here, `ts`).
    */
  private def normalizeColumn(f: StructField, epochUnit: Option[String]): Column =
    (f.dataType, epochUnit) match {
      // integer division — `/` would go through double and lose precision
      // on ns-epoch magnitudes (~1.7e18 > 2^53)
      case (LongType, Some("ns")) =>
        timestamp_micros(expr(s"`${f.name}` div 1000")).as(f.name)
      case (LongType, Some("us")) => timestamp_micros(col(f.name)).as(f.name)
      case (LongType, Some("ms")) =>
        timestamp_micros(expr(s"`${f.name}` * 1000L")).as(f.name)
      case (TimestampNTZType, _)  => col(f.name).cast(TimestampType).as(f.name)
      case _                      => col(f.name)
    }

  private val knownEpochColumns = Set("ts")

  /** A raw INT64 epoch column carries no unit annotation (the nanosAsLong
    * flag strips it, and a writer could emit a plain INT64 of µs or ms).
    * Dispatch on the magnitude of one sampled value — plausible epochs sit
    * ~3 decimal orders apart per unit (ns ≈ 1.7e18, µs ≈ 1.7e15,
    * ms ≈ 1.7e12 for 2020s dates), so the bands below stay unambiguous for
    * any date between 1973 and 2500. Anything outside them fails loudly
    * rather than loading instants silently wrong by 1000×. One-row scan,
    * only paid when a raw-long ts column is actually present.
    */
  private def epochUnitOf(df: DataFrame, name: String): String = {
    val sample = df.select(col(name)).where(col(name).isNotNull).limit(1)
      .collect().headOption.map(_.getLong(0))
    sample match {
      case None => "ns" // empty table: divisor is moot, pick the observed encoding
      case Some(v) =>
        val a = math.abs(v)
        if (a >= 1e17.toLong) "ns"
        else if (a >= 1e14.toLong) "us"
        else if (a >= 1e11.toLong) "ms"
        else throw new IllegalStateException(
          s"epoch column '$name': sampled value $v matches no known unit " +
            "(expected ns/us/ms magnitudes) — refusing to guess a divisor")
    }
  }

  private def normalizeTimestamps(df: DataFrame): DataFrame = {
    val needsWork = df.schema.exists(f =>
      f.dataType == TimestampNTZType || (f.dataType == LongType && knownEpochColumns(f.name)))
    if (!needsWork) df
    else {
      val units: Map[String, String] = df.schema.collect {
        case f if f.dataType == LongType && knownEpochColumns(f.name) =>
          f.name -> epochUnitOf(df, f.name)
      }.toMap
      df.select(df.schema.map(f => normalizeColumn(f, units.get(f.name))): _*)
    }
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")

  def events(s: SparkSession, d: String): DataFrame =
    cached(s, s"$d/events.parquet#events")(
      normalizeTimestamps(read(s, s"$d/events.parquet"))
        .select("event_id", "ts", "user_id", "event_type", "value", "props"))

  /** Loader used by TablesSpec for arbitrary fixture paths — same
    * normalization as the named tables. */
  def eventsAt(s: SparkSession, path: String): DataFrame =
    normalizeTimestamps(read(s, path))

  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Register every table as a temp view so operators expressed as
    * `spark.sql` (CTEs, correlated subqueries, PIVOT) see the same data. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => table(spark, sfDir, n).createOrReplaceTempView(n))
}
