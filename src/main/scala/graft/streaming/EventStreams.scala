package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming forms of the §2.8 event operators. The batch
  * versions in graft.ops.Events use the same groupBy(window(...)) shapes,
  * so these wrappers only add readStream + watermarks — the transform
  * logic is shared, which is the point: one declarative plan, two runners.
  *
  * Scale notes: state is bounded by the watermark (late rows dropped);
  * session_window keeps only open sessions per user; dedup-within-
  * watermark bounds the seen-keys state. All stateful ops key by user/
  * window — partitionable across 1000 executors.
  */
object EventStreams {

  /** E1-streaming: tumbling 1h counts with a 2h watermark. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** E2-streaming: sliding 1h/15min counts. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** E3-streaming: session windows with a 30-minute gap. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))

  /** E5-streaming: drop duplicate event_ids within the watermark. */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")
}
