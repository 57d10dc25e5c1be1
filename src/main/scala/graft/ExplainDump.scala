package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev tool (round-6 optimization evidence): writes
  * `.explain("formatted")` of selected declared queries to
  * `<outDir>/<query>_<tag>.txt`. Not part of the driver contract; the
  * session mirrors Bench's config so plans match what the bench executes.
  *
  * Usage: runMain graft.ExplainDump <outDir> <tag> <query1,query2,...>
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val wanted = args(2).split(",").toSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1) if wanted(name)) {
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.write(Paths.get(outDir, s"${name}_$tag.txt"), plan.getBytes("UTF-8"))
        println(s"[explain] wrote $name")
      } catch {
        case e: Throwable => println(s"[explain] FAILED $name: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
