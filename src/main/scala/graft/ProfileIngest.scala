package graft

import org.apache.spark.sql.SparkSession

/** Dev profiling main: per-stage timings for the bulk pipeline and for a
  * steady-state incremental micro-batch (SPARK_GRAFT_VERBOSE=1 prints
  * [kg]/[inc] stage lines). Not part of the driver contract.
  */
object ProfileIngest {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val scale = sys.env.getOrElse("SPARK_GRAFT_SCALE", "1").toInt
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.parquet.compression.codec", sys.env.getOrElse("SPARK_GRAFT_CODEC", "snappy"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val withIndexes = !sys.env.get("SPARK_GRAFT_PROFILE_IDX").contains("0")
    val withInc = !sys.env.get("SPARK_GRAFT_PROFILE_INC").contains("0")
    val t0 = System.nanoTime()
    val (pipeSec, nPages, nTriples, store) = Bench.runPipelineStore(spark, sfDir, scale, buildIndexes = withIndexes)
    println(f"[profile] pipeline scale=$scale: $pipeSec%.1fs ($nPages pages, $nTriples triples)")
    if (withInc) {
      val incSec = Bench.steadyBatchSec(spark, sfDir, store, "prof")
      println(f"[profile] steady incremental batch: $incSec%.1fs")
    }
    println(f"[profile] total ${(System.nanoTime() - t0) / 1e9}%.1fs")
    spark.stop()
  }
}
