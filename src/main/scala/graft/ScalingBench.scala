package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.SparkSession

/** Two-parallelism scaling evidence (BASELINE.json: throughput scaling
  * efficiency ≥ 0.8 from N to 4N executors; in this sandbox N and 4N
  * executors are stood in by two local[k] levels on the same input —
  * same JVM host, fresh SparkContext per level, pinned pre-touched heap).
  *
  * efficiency = (throughput at 4N) / (4 × throughput at N).
  *
  * Env knobs: SPARK_GRAFT_LOW / SPARK_GRAFT_HIGH (default 1 / 4),
  * SPARK_GRAFT_SCALE (corpus replication, default 32), SPARK_GRAFT_REPS
  * (default 1; best-of reported — the sandbox VM shows double-digit
  * run-to-run noise), SPARK_GRAFT_REPORT (append a section to this file).
  */
object ScalingBench {

  def sessionFor(cores: Int): SparkSession = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scale = sys.env.getOrElse("SPARK_GRAFT_SCALE", "32").toInt
    val low = sys.env.getOrElse("SPARK_GRAFT_LOW", "1").toInt
    val high = sys.env.getOrElse("SPARK_GRAFT_HIGH", "4").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt

    // core pipeline (pages → canonical bitemporal graph), same job
    // boundaries as the headline triples/sec metric; the index-build
    // stages are plain shuffles/writes that scale the same way
    def measure(cores: Int): (Double, Long, Long) = {
      val spark = sessionFor(cores)
      Bench.runPipelineStore(spark, sfDir, 1, buildIndexes = false) // JIT/codegen warm-up
      var best = (Double.MaxValue, 0L, 0L)
      for (_ <- 1 to reps) {
        val r = Bench.runPipelineStore(spark, sfDir, scale, buildIndexes = false)
        if (r._1 < best._1) best = (r._1, r._2, r._3)
      }
      spark.stop()
      best
    }

    val (tLow, pagesL, triplesL) = measure(low)
    val (tHigh, pagesH, triplesH) = measure(high)
    require(pagesL == pagesH && triplesL == triplesH, "same input at both levels")
    val thLow = triplesL / tLow
    val thHigh = triplesH / tHigh
    val efficiency = thHigh / (thLow * (high.toDouble / low))
    val json =
      s"""{"metric":"scaling_efficiency","value":$efficiency,"unit":"ratio",""" +
        s""""low":{"cores":$low,"seconds":$tLow,"triples_per_sec":$thLow},""" +
        s""""high":{"cores":$high,"seconds":$tHigh,"triples_per_sec":$thHigh},""" +
        s""""pages":$pagesL,"triples":$triplesL,"scale":$scale,"sf":"$sfDir"}"""
    println(json)
    sys.env.get("SPARK_GRAFT_REPORT").foreach { path =>
      Files.write(
        Paths.get(path),
        (json + "\n").getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE,
        StandardOpenOption.APPEND,
      )
    }
  }
}
