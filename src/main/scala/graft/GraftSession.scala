package graft

import org.apache.spark.sql.SparkSession

/** Convenience builder for applications embedding the engine: a session
  * with the graft native functions registered and the configuration the
  * library is designed around (UTC, AQE with skew-join handling on,
  * sane shuffle parallelism). The harness entry points (Verify/Bench)
  * build their own sessions per the driver contract and register
  * functions per-query instead — both paths end in the same plans.
  */
object GraftSession {

  def builder(appName: String = "graft",
              master: String = "local[*]",
              shufflePartitions: Int = Runtime.getRuntime.availableProcessors): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .master(master)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.serializer",
        "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)

  /** Build (or reuse) the session and ensure functions are registered even
    * when the extensions conf was overridden by the environment.
    */
  def getOrCreate(appName: String = "graft"): SparkSession = {
    val spark = builder(appName).getOrCreate()
    functions.GraftFunctions.register(spark)
    plans.AsOfJoin.register(spark)
    spark
  }
}
