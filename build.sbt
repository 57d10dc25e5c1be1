ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "graphitihfspark"
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
// Pin the heap (Xms = Xmx) and pre-touch: G1 commit/uncommit churn under
// 32 allocation-heavy threads showed up as 60-80%% kernel time (page
// faults) in local benchmarks; a pre-touched fixed heap removes it.
// Default size = min(16g, half of host RAM) so `sbt test` still starts on
// small hosts; SPARK_DRIVER_MEM overrides.
val driverMem: String = sys.env.getOrElse(
  "SPARK_DRIVER_MEM", {
    val memTotalKb =
      scala.util
        .Try {
          val src = scala.io.Source.fromFile("/proc/meminfo")
          try src.getLines().find(_.startsWith("MemTotal")).map(_.replaceAll("[^0-9]", "").toLong)
          finally src.close()
        }
        .toOption
        .flatten
        .getOrElse(32L * 1024 * 1024)
    s"${math.max(2L, math.min(16L, memTotalKb / (2L * 1024 * 1024)))}g"
  },
)
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$driverMem",
  s"-Xms$driverMem",
  "-XX:+AlwaysPreTouch",
  "-XX:+UseParallelGC",
)
