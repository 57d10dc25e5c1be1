package graft.search

import java.nio.file.Files

import graft.TestSpark
import graft.io.SnapshotStore
import org.scalatest.funsuite.AnyFunSuite

class QueryMonitorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("record → patterns → deterministic tuning suggestions") {
    val store = new SnapshotStore(spark, Files.createTempDirectory("qmon").toString)
    val m = new QueryMonitor(store)
    m.record(
      Seq(
        ("who is alice", "semantic", 0.2, 5L),
        ("acme hq", "semantic", 0.4, 3L),
        ("alice knows", "semantic", 0.3, 4L),
        ("slow graph walk", "graph", 2.5, 9L),
        ("rare term xyzzy", "keyword", 0.1, 0L),
      ).toDF("query", "query_type", "execution_time", "result_count"),
    )
    // appending a second batch accumulates, not overwrites — and
    // IDENTICAL repeated observations each count (the log is lossless;
    // a content-keyed id would merge them and under-report frequency)
    m.record(
      Seq(
        ("another", "graph", 1.7, 2L),
        // byte-identical to a batch-1 observation: must still count
        ("rare term xyzzy", "keyword", 0.1, 0L),
      ).toDF("query", "query_type", "execution_time", "result_count"),
    )

    val pats = m.patterns().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pats == Map("semantic" -> 3L, "graph" -> 2L, "keyword" -> 2L))

    val sugg = m.suggest().collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(sugg == Set(
      ("grow_cache", "semantic"), // dominant lane
      ("grow_batch", "graph"), // avg latency (2.5+1.7)/2 > 1s
      ("lower_min_score", "keyword"), // 0 results on average
    ))
  }
}
