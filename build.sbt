ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "prestoetltoolspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// forward forked-run output verbatim (no "[info] " prefix): the driver
// machine-parses Bench's one-line JSON summary from the captured tail,
// and the sbt logger prefix broke that parse (r12 ADVICE)
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // 356 benched queries × whole-stage codegen in ONE JVM overflow the
  // 240m JIT code-cache default — once full, new compilations stop and
  // late queries run interpreted/C1, which showed up as a uniform
  // ~1.3× per-query drift as rounds added queries (r14 A/B-measured).
  // Env-tunable so the bench can pin the effect.
  s"-XX:ReservedCodeCacheSize=${sys.env.getOrElse("SPARK_CODE_CACHE", "512m")}",
  // Throughput collector: this is a short-lived single-JVM batch process
  // (driver+executor in one heap) where allocation rate, not pause time,
  // is what matters — r17 A/B over a 12-query mixed subset measured
  // ParallelGC uniformly faster than the G1 default (~12% on the subset
  // sum, no query slower). Env-overridable for re-measurement.
  s"-XX:+Use${sys.env.getOrElse("SPARK_GRAFT_GC", "Parallel")}GC",
) ++
  // optional GC-thread cap for A/B runs (r18): on a contended 32-core VM
  // the default ~23 parallel GC threads can add coordination overhead to
  // the many tiny collections of job-chain queries; unset = JVM ergonomics
  sys.env.get("SPARK_GRAFT_GC_THREADS").map(n => s"-XX:ParallelGCThreads=$n")
