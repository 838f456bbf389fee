package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Drift-proofing regression for the table loaders (VERDICT r6 §wrong-1):
  * the driver regenerated the testdata between rounds and `events.ts`
  * changed physical encoding (TIMESTAMP(NANOS) → TIMESTAMP(MICROS,NTZ)),
  * which zeroed out 72 queries. These tests pin the loader's contract —
  * whatever the writer produced, the loaded `ts` is session-TZ
  * TimestampType with the same instants — by writing tiny fixtures in
  * all three observed encodings and loading each through the same
  * normalization path as `Tables.events`.
  */
class TablesSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private val micros = Seq(1700000000000000L, 1700000001500000L, 1700003600250000L)
  private def expected: Seq[Timestamp] = micros.map(us => new Timestamp(us / 1000))

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"tables-spec-$tag").toString + "/events.parquet"

  private def loadedTs(path: String): (DataType, Seq[Timestamp]) = {
    val df = Tables.eventsAt(spark, path)
    (df.schema("ts").dataType,
      df.select("ts").orderBy("ts").collect().map(_.getTimestamp(0)).toSeq)
  }

  test("loader normalizes raw int64-nanos ts (round<=5 encoding) to TimestampType") {
    // parquet TIMESTAMP(NANOS) loads as LongType under nanosAsLong — a
    // plain INT64 column exercises the identical LongType dispatch branch
    val path = tmpDir("nanos")
    micros.map(us => (us * 1000L, "click")).toDF("ts", "event_type")
      .write.mode("overwrite").parquet(path)
    val (dt, ts) = loadedTs(path)
    assert(dt == TimestampType)
    assert(ts == expected)
  }

  test("loader normalizes timestamp[us] NTZ ts (round 6+ encoding) to TimestampType") {
    val path = tmpDir("ntz")
    val schema = StructType(Seq(
      StructField("ts", TimestampNTZType), StructField("event_type", StringType)))
    val rows = micros.map(us =>
      Row(java.time.LocalDateTime.ofEpochSecond(
        us / 1000000L, ((us % 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC), "click"))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
      .write.mode("overwrite").parquet(path)
    val (dt, ts) = loadedTs(path)
    assert(dt == TimestampType)
    assert(ts == expected)
  }

  test("loader passes through timestamp[us] UTC ts unchanged") {
    val path = tmpDir("utc")
    micros.map(us => (new Timestamp(us / 1000), "click")).toDF("ts", "event_type")
      .write.mode("overwrite").parquet(path)
    val (dt, ts) = loadedTs(path)
    assert(dt == TimestampType)
    assert(ts == expected)
  }

  test("live testdata loads with normalized schema on every table") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.count() > 0)
    assert(Tables.orders(spark, sf).schema("o_orderdate").dataType == TimestampType)
    assert(Tables.lineitem(spark, sf).schema("l_shipdate").dataType == TimestampType)
  }

  test("table loads are memoized per (session, path) as plans, not results (r17)") {
    // same session + same path → the identical DataFrame object (the
    // footer/schema pass runs once); different paths → distinct entries
    val a = Tables.orders(spark, sf)
    val b = Tables.orders(spark, sf)
    assert(a eq b)
    val other = Tables.orders(spark,
      if (sf.endsWith("sf0.001")) "/root/testdata/sf0.01"
      else "/root/testdata/sf0.001")
    assert(!(other eq a))
    // the memoized frame is a lazy plan over the files — a fresh action
    // still scans parquet (no materialized rows pinned in the memo):
    // its physical plan is a FileScan, not an InMemoryTableScan/RDD scan
    val phys = a.queryExecution.executedPlan.toString
    assert(phys.contains("FileScan") || phys.contains("Scan parquet"), phys)
    assert(!phys.contains("InMemoryTableScan"), phys)
  }
}
