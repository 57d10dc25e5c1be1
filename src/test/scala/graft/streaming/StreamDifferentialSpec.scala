package graft.streaming

import java.sql.Timestamp

import scala.util.Random

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Seeded randomized differential for the streaming state operator: a
  * random mention stream cut at random micro-batch boundaries must emit,
  * for every entity and every batch that touches it, exactly the batch-
  * computed prefix aggregate (count / min event time / max event time over
  * all batches so far) — i.e. the streaming state is invariant to how the
  * stream is split. Updates per entity strictly grow in mention count, so
  * the full update history is set-comparable against the model.
  */
class StreamDifferentialSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(min: Long): Timestamp = new Timestamp(1704067200000L + min * 60000L)

  test("entityMentionState update history matches prefix aggregates under random batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new Random(31L + graft.TestSeeds.offset)
    val entities = Seq("Acme", "Globex", "Initech", "Umbrella", "Hooli")

    for (round <- 0 until 3) {
      val stream = Seq.fill(24)((entities(rnd.nextInt(entities.size)), ts(rnd.nextInt(500).toLong)))
      // random cut points → 2-4 non-empty micro-batches
      val nBatches = 2 + rnd.nextInt(3)
      val cuts = (Seq(0, stream.size) ++ Seq.fill(nBatches - 1)(1 + rnd.nextInt(stream.size - 1))).distinct.sorted
      val batches = cuts.zip(cuts.tail).map { case (a, b) => stream.slice(a, b) }

      // model: per entity, the prefix aggregate at every batch touching it
      val expect = scala.collection.mutable.Set.empty[(String, Long, Long, Long)]
      val running = scala.collection.mutable.Map.empty[String, (Long, Long, Long)]
      batches.foreach { batch =>
        batch.groupBy(_._1).foreach { case (name, rows) =>
          val times = rows.map(_._2.getTime)
          val prev = running.get(name)
          val next = prev match {
            case Some((n, lo, hi)) => (n + rows.size, math.min(lo, times.min), math.max(hi, times.max))
            case None => (rows.size.toLong, times.min, times.max)
          }
          running(name) = next
          expect += ((name, next._1, next._2, next._3))
        }
      }

      val input = MemoryStream[(String, Timestamp)]
      val sink = s"entity_state_diff_$round"
      val q = StreamOps
        .entityMentionState(input.toDS())
        .writeStream
        .format("memory")
        .queryName(sink)
        .outputMode("update")
        .start()
      try {
        batches.foreach { b =>
          if (b.nonEmpty) { input.addData(b: _*); q.processAllAvailable() }
        }
        val got = spark
          .table(sink)
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getAs[Timestamp](2).getTime, r.getAs[Timestamp](3).getTime))
          .toSet
        assert(got == expect.toSet, s"round $round: update history diverged (batches=$batches)")
      } finally q.stop()
    }
  }
}
