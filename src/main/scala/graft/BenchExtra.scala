package graft

import org.apache.spark.sql.SparkSession

/** Extra benchmarks (round-6 optimization evidence) — NOT part of the
  * frozen driver contract in [[Bench]]; numbers are cited in
  * OPTIMIZATION_r06.md.
  *
  *  - `bucketed`: the `-Dgraft.bulk.bucketed=true` pipeline measured with
  *    the SAME best-of-2 (+ >25%-spread third rep) discipline as the
  *    headline, plus a steady micro-batch ON the bucketed store — the
  *    flag's whole point is that batch #1 skips the legacy→bucketed fold,
  *    so the batch is the number that matters (round-5 verdict #3).
  *  - `buckets4096`: the same, with the primaries at
  *    `-Dgraft.buckets=4096` — production-bucket-count evidence for the
  *    steady batch's flat-cost residual (round-5 verdict #4).
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("bucketed")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val scale = sys.env.getOrElse("SPARK_GRAFT_SCALE", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Bench.cleanBenchTmp()
    try SparkEntry.entry(spark).count()
    catch { case _: Throwable => () }

    System.setProperty("graft.bulk.bucketed", "true")
    if (mode == "buckets4096") System.setProperty("graft.buckets", "4096")
    try {
      val (calibSt, _) = Bench.calibrate(spark)
      def rep(): (Double, io.SnapshotStore) = {
        val (sec, _, _, store) = Bench.runPipelineStore(spark, sfDir, scale, buildIndexes = false)
        (sec, store)
      }
      // same rep discipline as the frozen headline: best-of-2, one extra
      // rep when the two disagree by >25%
      val (r1, s1) = rep()
      s1.deleteRoot()
      var (r2, store) = rep()
      var reps = Seq(r1, r2)
      if (math.abs(r1 - r2) / math.max(1e-9, math.min(r1, r2)) > 0.25) {
        store.deleteRoot()
        val (r3, s3) = rep()
        reps = reps :+ r3
        store = s3
      }
      val best = reps.min
      // steady micro-batch ON the bucketed store (same method as Bench:
      // batch A untimed, best of batches B/C)
      val incSec = Bench.steadyBatchSec(spark, sfDir, store, "bx")
      val calibSt2 = Bench.calibrateSt()
      val repsJson = reps.map(v => f"$v%.2f").mkString("[", ",", "]")
      println(
        s"""{"metric":"bench_extra","mode":"$mode","pipeline_bucketed_reps":$repsJson,""" +
          f""""pipeline_bucketed_best":$best%.2f,"steady_batch_on_bucketed":$incSec%.2f,""" +
          s""""buckets":${Integer.getInteger("graft.buckets", 64)},""" +
          f""""calib_st":$calibSt%.2f,"calib_st_end":$calibSt2%.2f}"""
      )
      store.deleteRoot()
    } finally {
      System.clearProperty("graft.bulk.bucketed")
      System.clearProperty("graft.buckets")
    }
    spark.stop()
  }
}
