package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Task-metrics measurement harness: runs an action and aggregates the
  * executor-side metrics of every task it schedules. This is the
  * quantitative side of the PLANS.md story — plan shape says a scan is
  * pruned or a shuffle is narrow; these numbers PROVE it (MetricsSpec
  * asserts byte-level bounds for partition pruning, pre-aggregation and
  * hash-only dedup shuffles).
  *
  * Implementation note: a SparkListener is registered for the duration
  * of one measured action and removed in `finally`. Listener events are
  * delivered asynchronously, so the collector waits for the listener bus
  * to drain before reading totals. Counters are synchronized — tasks end
  * concurrently.
  */
object Metrics {

  /** Aggregated executor metrics for one measured action. */
  case class RunMetrics(
      rowsOut: Long,
      inputBytes: Long,
      inputRecords: Long,
      shuffleWriteBytes: Long,
      shuffleWriteRecords: Long,
      tasks: Int)

  /** Run `df.count()` under a temporary listener and return the totals. */
  def measure(spark: SparkSession, df: DataFrame): RunMetrics = {
    val lock = new Object
    var inputBytes = 0L
    var inputRecords = 0L
    var shuffleBytes = 0L
    var shuffleRecords = 0L
    var tasks = 0
    val listener = new SparkListener {
      override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
        val m = taskEnd.taskMetrics
        if (m != null) lock.synchronized {
          inputBytes += m.inputMetrics.bytesRead
          inputRecords += m.inputMetrics.recordsRead
          shuffleBytes += m.shuffleWriteMetrics.bytesWritten
          shuffleRecords += m.shuffleWriteMetrics.recordsWritten
          tasks += 1
        }
      }
    }
    // flush events queued by PRIOR jobs first — async delivery would
    // otherwise route a just-finished job's TaskEnds to this listener
    // and inflate the measured totals
    org.apache.spark.sql.graftshim.GraftShim.drainListenerBus(spark.sparkContext)
    spark.sparkContext.addSparkListener(listener)
    var actionFailed = false
    val rows =
      try df.count()
      catch { case e: Throwable => actionFailed = true; throw e }
      finally {
        // deliver queued TaskEnd events before detaching. A drain failure
        // is only swallowed when the ACTION threw (the original exception
        // must not be masked); on a successful action it propagates —
        // undelivered TaskEnds mean the totals are silently undercounted,
        // which must fail loudly rather than flake a byte-bound assertion
        try org.apache.spark.sql.graftshim.GraftShim.drainListenerBus(spark.sparkContext)
        catch { case _: Throwable if actionFailed => () }
        finally spark.sparkContext.removeSparkListener(listener)
      }
    lock.synchronized {
      RunMetrics(rows, inputBytes, inputRecords, shuffleBytes, shuffleRecords, tasks)
    }
  }
}
