package graft.streaming

import java.sql.Timestamp

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Structured-Streaming state operators: watermarked windowed counts and
  * flatMapGroupsWithState entity counters, driven through MemoryStream
  * micro-batches (state must carry across batches).
  */
class StreamOpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def ts(min: Long): Timestamp = new Timestamp(1704067200000L + min * 60000L) // 2024-01-01 + min

  test("windowed episode counts: tumbling event-time windows per group") {
    import spark.implicits._
    // batch-mode plan parity: the same operator runs on a static frame
    val eps = Seq(
      ("g1", ts(0)), ("g1", ts(30)), ("g1", ts(90)), // two in [0,1h), one in [1h,2h)
      ("g2", ts(10)),
    ).toDF("group_id", "valid_at")
    val out = StreamOps
      .windowedEpisodeCounts(eps, windowDur = "1 hour", watermark = "10 minutes")
      .collect()
      .map(r => (r.getAs[Timestamp]("window_start").getTime, r.getString(1), r.getLong(2)))
      .toSet
    assert(out == Set(
      (ts(0).getTime, "g1", 2L),
      (ts(60).getTime, "g1", 1L),
      (ts(0).getTime, "g2", 1L),
    ))
  }

  test("entityMentionState: counters accumulate across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val updates = StreamOps.entityMentionState(input.toDS())
    val q = updates.writeStream
      .format("memory")
      .queryName("entity_state")
      .outputMode("update")
      .start()
    try {
      input.addData(("Acme", ts(0)), ("Acme", ts(5)), ("Globex", ts(2)))
      q.processAllAvailable()
      input.addData(("Acme", ts(10)))
      q.processAllAvailable()
      val rows = spark
        .table("entity_state")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getAs[Timestamp](2), r.getAs[Timestamp](3)))
      // batch 1 updates
      assert(rows.contains(("Acme", 2L, ts(0), ts(5))))
      assert(rows.contains(("Globex", 1L, ts(2), ts(2))))
      // batch 2: Acme's state carried over and extended; Globex untouched
      assert(rows.contains(("Acme", 3L, ts(0), ts(10))))
      assert(rows.count(_._1 == "Globex") == 1)
    } finally q.stop()
  }
}
