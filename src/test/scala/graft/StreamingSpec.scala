package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Structured Streaming wrappers produce the same answers as the batch
  * §2.8 operators on the same data (SURVEY §2.8 upgrade-path contract).
  */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String)
case class EvV(ts: Timestamp, user_id: Long, event_type: String, value: Double)

class StreamingSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def ts(min: Int) =
    new Timestamp(Timestamp.valueOf("2024-01-01 00:00:00").getTime + min * 60000L)

  private val sample = Seq(
    Ev(1, ts(0), 1, "click"), Ev(2, ts(10), 1, "click"),
    Ev(3, ts(70), 1, "view"), Ev(4, ts(75), 2, "click"),
    Ev(2, ts(10), 1, "click") // duplicate event_id for dedup test
  )

  test("streaming tumbling counts == batch tumbling counts (E1)") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    stream.addData(sample)
    val q = EventStreams.tumblingCounts(stream.toDF())
      .writeStream.format("memory").queryName("t_tumbling")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("t_tumbling")
      .select(unix_timestamp($"window.start").as("w"), $"event_type", $"n")
      .orderBy("w", "event_type").as[(Long, String, Long)].collect()
    val batch = sample.toDF()
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp($"window.start").as("w"), $"event_type", $"n")
      .orderBy("w", "event_type").as[(Long, String, Long)].collect()
    assert(streamed.sameElements(batch))
  }

  test("streaming sliding counts == batch sliding counts (E2)") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    stream.addData(sample.distinct)
    val q = EventStreams.slidingCounts(stream.toDF())
      .writeStream.format("memory").queryName("t_sliding")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("t_sliding")
      .select(unix_timestamp($"window.start").as("w"), $"event_type", $"n")
      .orderBy("w", "event_type").as[(Long, String, Long)].collect()
    val batch = sample.distinct.toDF()
      .groupBy(window($"ts", "1 hour", "15 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp($"window.start").as("w"), $"event_type", $"n")
      .orderBy("w", "event_type").as[(Long, String, Long)].collect()
    assert(streamed.sameElements(batch))
  }

  test("streaming dedup drops duplicate ids within watermark (E5)") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    stream.addData(sample)
    val q = EventStreams.dedupEvents(stream.toDF())
      .writeStream.format("memory").queryName("t_dedup")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("t_dedup").count() == 4) // 5 rows, one dup id
  }

  test("stream-static enrichment join == batch join (E6)") {
    implicit val sqlCtx = spark.sqlContext
    val customers = Tables.customer(spark, sf)
    val stream = MemoryStream[Ev]
    stream.addData(sample.distinct)
    val q = EventStreams.enrichedCounts(stream.toDF(), customers)
      .writeStream.format("memory").queryName("t_enriched")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("t_enriched")
      .select(unix_timestamp($"window.start").as("w"), $"segment", $"n")
      .orderBy("w", "segment").as[(Long, String, Long)].collect()
    val batch = sample.distinct.toDF()
      .join(broadcast(customers.select($"c_custkey", $"c_mktsegment")),
        $"user_id" === $"c_custkey", "left")
      .groupBy(window($"ts", "1 hour"),
        coalesce($"c_mktsegment", lit("UNKNOWN")).as("segment"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp($"window.start").as("w"), $"segment", $"n")
      .orderBy("w", "segment").as[(Long, String, Long)].collect()
    assert(streamed.nonEmpty && streamed.sameElements(batch))
  }

  test("flatMapGroupsWithState sessionization closes sessions on gap (E3 custom state)") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[EventStreams.SessionInput]
    // user 1: two events 10min apart (one session), then a 61-min gap
    // opens a second session; a later event advances the watermark far
    // enough to time the open sessions out.
    stream.addData(Seq(
      EventStreams.SessionInput(1L, ts(0)), EventStreams.SessionInput(1L, ts(10)),
      EventStreams.SessionInput(1L, ts(71)), EventStreams.SessionInput(2L, ts(75))))
    val q = EventStreams.sessionizeWithState(stream.toDS())
      .writeStream.format("memory").queryName("t_state_sessions")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      stream.addData(Seq(EventStreams.SessionInput(9L, ts(600))))
      q.processAllAvailable()
      // one more batch so timed-out state from the previous watermark flushes
      stream.addData(Seq(EventStreams.SessionInput(9L, ts(601))))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("t_state_sessions")
      .select($"user_id", $"n_events", $"duration_s")
      .orderBy($"user_id", $"n_events")
      .as[(Long, Long, Long)].collect()
    // user 1 session {e1,e2} closed by the 61-min gap inline; sessions
    // {e3} and user-2 {e4} closed by event-time timeout
    assert(out.contains((1L, 2L, 600L)))
    assert(out.contains((1L, 1L, 0L)) && out.contains((2L, 1L, 0L)))
  }

  test("streaming row-pattern matching == batch RowPattern on flushed windows (E8)") {
    import graft.ops.RowPattern
    import graft.ops.RowPattern._
    implicit val sqlCtx = spark.sqlContext
    val withinUs = 30L * 60 * 1000000 // 30 min
    val steps = Seq(
      Step("view", col("event_type") === "view"),
      Step("gap", col("event_type") =!= "purchase", star),
      Step("purchase", col("event_type") === "purchase"))
    // user 1: view(0) click(5) purchase(10) → match; view(20) with no
    // purchase inside the window → no match. user 2: purchase before any
    // view → no match, then view(3) purchase(8) → match.
    val data = Seq(
      Ev(1, ts(0), 1, "view"), Ev(2, ts(5), 1, "click"),
      Ev(3, ts(10), 1, "purchase"), Ev(4, ts(20), 1, "view"),
      Ev(5, ts(1), 2, "purchase"), Ev(6, ts(3), 2, "view"),
      Ev(7, ts(8), 2, "purchase"))
    val stream = MemoryStream[Ev]
    stream.addData(data)
    val q = EventStreams.patternMatchesWithState(
        EventStreams.patternRows(stream.toDF(), "user_id", "ts", "event_id", steps),
        steps.map(_.quant), withinUs)
      .writeStream.format("memory").queryName("t_pattern")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // advance the watermark far past every buffered timeout, then one
      // more batch so the timed-out state flushes
      stream.addData(Seq(Ev(90, ts(600), 9, "click")))
      q.processAllAvailable()
      stream.addData(Seq(Ev(91, ts(601), 9, "click")))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("t_pattern")
      .filter($"user_id" < 9)
      .select($"user_id", $"match_no", $"start_us", $"end_us", $"n_rows")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val batch = RowPattern.matches(data.toDF(), "user_id", "ts", "event_id",
        steps, Some(withinUs))
      .select($"user_id", $"match_no", $"start_us", $"end_us", $"n_rows")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(batch.nonEmpty)
    assert(streamed == batch,
      s"missing=${batch.diff(streamed)} extra=${streamed.diff(batch)}")
  }

  test("stream-stream interval join == batch interval join (E9)") {
    implicit val sqlCtx = spark.sqlContext
    // user 1: view(0) with purchases at +10min (in window) and +70min
    // (outside); user 2: purchase before its view never matches
    val viewRows = Seq(Ev(10, ts(0), 1, "view"), Ev(11, ts(30), 2, "view"))
    val purchRows = Seq(Ev(20, ts(10), 1, "purchase"),
      Ev(21, ts(70), 1, "purchase"), Ev(22, ts(5), 2, "purchase"))
    val vs = MemoryStream[Ev]; val ps = MemoryStream[Ev]
    vs.addData(viewRows); ps.addData(purchRows)
    val q = EventStreams.viewPurchaseJoin(vs.toDF(), ps.toDF())
      .writeStream.format("memory").queryName("t_ssjoin")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("t_ssjoin")
      .select($"user_id", $"view_id", $"purchase_id", $"lag_us")
      .as[(Long, Long, Long, Long)].collect().toSet
    val batch = EventStreams.viewPurchaseJoin(
        viewRows.toDF(), purchRows.toDF())
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed.nonEmpty && streamed == batch)
    // the in-window pair and ONLY it: (1, view 10, purchase 20)
    assert(streamed.map(t => (t._1, t._2, t._3)) == Set((1L, 10L, 20L)))
  }

  test("foreachBatch upsert sink: last write per key wins across micro-batches (E10)") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    val tableDir = s"$dir/table"
    val ckDir = s"$dir/ck"
    val stream = MemoryStream[Ev]
    val q = EventStreams.upsertSink(stream.toDF(), tableDir, ckDir)
    try {
      stream.addData(Seq(Ev(1, ts(0), 1, "view"), Ev(2, ts(1), 2, "view")))
      q.processAllAvailable()
      // batch 2 updates user 1 (later ts) and inserts user 3; the stale
      // user-1 row in the same batch must lose to the newer one
      stream.addData(Seq(Ev(3, ts(10), 1, "click"),
        Ev(4, ts(5), 1, "view"), Ev(5, ts(2), 3, "purchase")))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.read.parquet(tableDir)
      .select($"user_id", $"event_id", $"event_type")
      .as[(Long, Long, String)].collect().toSet
    assert(out == Set((1L, 3L, "click"), (2L, 2L, "view"), (3L, 5L, "purchase")))
  }

  test("streaming sketch profile rolls up to batch-equal estimates (E11)") {
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.QuantileSketchAggregator.{tdigestMergeAgg, tdigestQuantile}
    // 600 deterministic events across 3 hours × 2 types; value is a
    // skewed deterministic series so the median is non-trivial
    val evs = (0 until 600).map { i =>
      EvV(ts(i % 180), i.toLong % 97, if (i % 3 == 0) "click" else "view",
        (i % 50) * (i % 50) / 10.0)
    }
    val stream = MemoryStream[EvV]
    stream.addData(evs)
    val q = EventStreams.sketchProfile(stream.toDF())
      .writeStream.format("memory").queryName("t_sketch")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    // the streamed output is per-window SKETCHES; roll them up per type in
    // batch and compare against exact batch answers on the same data
    val rolled = spark.table("t_sketch")
      .groupBy($"event_type")
      .agg(hll_sketch_estimate(hll_union_agg($"user_hll")).as("du"),
        tdigestQuantile(tdigestMergeAgg($"value_td"), 0.5).as("p50"))
      .as[(String, Long, Double)].collect()
      .map { case (t, du, p) => t -> ((du, p)) }.toMap
    val exact = evs.toDF()
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").cast("long").as("du"),
        expr("percentile(value, 0.5)").as("p50"))
      .as[(String, Long, Double)].collect()
    assert(exact.nonEmpty)
    exact.foreach { case (typ, du, p50) =>
      val (duEst, p50Est) = rolled(typ)
      assert(math.abs(duEst - du).toDouble / du <= 0.05, s"$typ du=$du est=$duEst")
      assert(math.abs(p50Est - p50) / (p50 + 1.0) <= 0.10, s"$typ p50=$p50 est=$p50Est")
    }
  }

  test("streaming session windows group by 30-minute gaps (E3)") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    stream.addData(sample.distinct)
    val q = EventStreams.sessionCounts(stream.toDF())
      .writeStream.format("memory").queryName("t_sessions")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("t_sessions")
      .select($"user_id", $"n_events").orderBy($"user_id", $"n_events")
      .as[(Long, Long)].collect()
    // user 1: {e1,e2} then {e3}; user 2: {e4}
    assert(out.sameElements(Array((1L, 1L), (1L, 2L), (2L, 1L))))
  }

  test("tws ValueState TTL expires idle state between lifetimes (r10)") {
    // Wall-clock-dependent by nature (processing-time TTL), so proven
    // here rather than under the oracle gate: lifetime 1 counts 3
    // events for user 1; after sleeping past the 1 s TTL, lifetime 2
    // (same checkpoint) sees the state EXPIRED and the running count
    // restarts at the new batch's 2 — not 5. With TTL disabled the same
    // harness yields 5 (asserted as the control).
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TTLConfig}
    import org.apache.spark.sql.functions._
    def run(ttl: TTLConfig, sleepMs: Long): Seq[Long] = {
      val work = java.nio.file.Files.createTempDirectory("graft_ttl").toString
      val src = s"$work/src"
      def writeFile(name: String, ids: Seq[Long]): Unit =
        ids.toDF("event_id").withColumn("user_id", lit(1L))
          .coalesce(1).write.mode("append").parquet(src)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType)))

      def drain(): Unit = {
        // Trigger.Once, not processAllAvailable: in ProcessingTime mode
        // the continuous trigger keeps scheduling batches for
        // timer/TTL checks and the query never settles. TTL expiry is
        // evaluated on state READ, so one batch per lifetime is all
        // this proof needs — and Once terminates deterministically.
        @annotation.nowarn("cat=deprecation")
        val q = spark.readStream.schema(schema).parquet(src)
          .select(col("user_id"), col("event_id")).as[(Long, Long)]
          .groupByKey(_._1)
          .transformWithState(new EventStreams.RunningCountProcessor(ttl),
            TimeMode.ProcessingTime(), OutputMode.Append())
          .toDF("user_id", "running_n")
          .writeStream.format("parquet").option("path", s"$work/data")
          .option("checkpointLocation", s"$work/chk")
          .trigger(org.apache.spark.sql.streaming.Trigger.Once())
          .outputMode("append").start()
        try {
          assert(q.awaitTermination(120000), "Trigger.Once drain timed out")
        } finally q.stop()
      }
      graft.ops.Events.withRocksDBStateStore(spark) {
        writeFile("a", Seq(1L, 2L, 3L))
        drain()
        Thread.sleep(sleepMs)
        writeFile("b", Seq(4L, 5L))
        drain()
      }
      spark.read.parquet(s"$work/data")
        .orderBy(col("running_n")).select(col("running_n"))
        .as[Long].collect().toSeq
    }
    // control: no TTL — state survives, second lifetime continues 3 → 5
    assert(run(TTLConfig.NONE, 0L) == Seq(3L, 5L))
    // 1 s TTL + 2.5 s idle: state expired, count restarts at 2
    assert(run(TTLConfig(java.time.Duration.ofSeconds(1)), 2500L)
      == Seq(2L, 3L))
  }

  test("tws timer sessions: BOTH gap-closed and timer-closed paths fire (r10)") {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import org.apache.spark.sql.functions._
    // hand fixture, one file per trigger in write order:
    //   f0: user 1 two events 10 min apart (one open session)
    //   f1: user 1 one event 2 h later → gap-breaks (closed_by = 0),
    //       opens the trailing session
    //   s1/s2: user -1 sentinels advance the watermark, firing the
    //       trailing session's TIMER (closed_by = 1) in s2's data batch
    val work = java.nio.file.Files.createTempDirectory("graft_e32spec")
    val src = s"$work/src"
    val t0 = 1700000000000L
    def writeFile(name: String, rows: Seq[(Long, Long)]): Unit =
      rows.toDF("user_id", "ms")
        .select(col("user_id"), timestamp_millis(col("ms")).as("ts"))
        .coalesce(1).write.mode("overwrite").parquet(s"$src/$name")
    writeFile("f0", Seq((1L, t0), (1L, t0 + 10L * 60 * 1000)))
    writeFile("f1", Seq((1L, t0 + 2L * 3600 * 1000)))
    writeFile("s1", Seq((-1L, t0 + 1L * 24 * 3600 * 1000)))
    writeFile("s2", Seq((-1L, t0 + 2L * 24 * 3600 * 1000)))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType)))
    val qn = "t_e32spec_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    graft.ops.Events.withRocksDBStateStore(spark) {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$src/*")
        .withWatermark("ts", "1 hour")
        .select(col("user_id"), unix_micros(col("ts")))
        .as[(Long, Long)]
        .groupByKey(_._1)
        .transformWithState(
          new EventStreams.TimerSessionProcessor,
          TimeMode.EventTime(), OutputMode.Append())
        .toDF("user_id", "start_us", "n_events", "closed_by")
        .writeStream.format("memory").queryName(qn)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val rows = spark.table(qn).filter(col("user_id") >= 0)
        .orderBy(col("start_us"))
        .collect().map(r => (r.getLong(2), r.getLong(3)))
      // first session (2 events) closed by the GAP-breaking arrival;
      // trailing session (1 event) closed by the TIMER
      assert(rows.toSeq == Seq((2L, 0L), (1L, 1L)), rows.toSeq.toString)
    }
  }
}
