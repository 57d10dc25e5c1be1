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
    def measureOnce(cores: Int, warm: Boolean): (Double, Long, Long) = {
      // fresh tmpfs per measurement: stores left by earlier runs/levels
      // occupy tmpfs pages and skew the bandwidth-bound stages (measured
      // double-digit run-to-run variance before this)
      Bench.cleanBenchTmp()
      val spark = sessionFor(cores)
      if (warm) Bench.runPipelineStore(spark, sfDir, 1, buildIndexes = false) // JIT/codegen warm-up
      val r = Bench.runPipelineStore(spark, sfDir, scale, buildIndexes = false)
      spark.stop()
      (r._1, r._2, r._3)
    }

    // INTERLEAVED reps (low, high, low, high, …), best-of per level: the
    // sandbox VM drifts double-digit percent over minutes (neighbors), so
    // measuring all-low then all-high would let one slow period bias one
    // level; interleaving + best-of cancels the drift.
    val lowRuns = scala.collection.mutable.ArrayBuffer[(Double, Long, Long)]()
    val highRuns = scala.collection.mutable.ArrayBuffer[(Double, Long, Long)]()
    for (rep <- 1 to reps) {
      lowRuns += measureOnce(low, warm = rep == 1)
      highRuns += measureOnce(high, warm = rep == 1)
    }
    val (tLow, pagesL, triplesL) = lowRuns.minBy(_._1)
    val (tHigh, pagesH, triplesH) = highRuns.minBy(_._1)
    require(pagesL == pagesH && triplesL == triplesH, "same input at both levels")
    val thLow = triplesL / tLow
    val thHigh = triplesH / tHigh
    val efficiency = thHigh / (thLow * (high.toDouble / low))
    def runsJson(rs: Seq[(Double, Long, Long)]): String = rs.map(r => f"${r._1}%.1f").mkString("[", ",", "]")
    val json =
      s"""{"metric":"scaling_efficiency","value":$efficiency,"unit":"ratio",""" +
        s""""low":{"cores":$low,"seconds":$tLow,"triples_per_sec":$thLow,"all_reps_sec":${runsJson(lowRuns.toSeq)}},""" +
        s""""high":{"cores":$high,"seconds":$tHigh,"triples_per_sec":$thHigh,"all_reps_sec":${runsJson(highRuns.toSeq)}},""" +
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
