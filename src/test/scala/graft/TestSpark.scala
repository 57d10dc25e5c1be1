package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test JVM. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** Seed offset for the randomized differential suites: set
  * GRAFT_TEST_SEED_OFFSET=k to re-run every seeded differential on a fresh
  * deterministic universe (CI sweeps; default 0 keeps runs reproducible).
  */
object TestSeeds {
  val offset: Long = sys.env.getOrElse("GRAFT_TEST_SEED_OFFSET", "0").toLong
}
