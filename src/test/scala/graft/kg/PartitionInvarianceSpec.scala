package graft.kg

import java.nio.file.Files

import graft.TestSpark
import graft.io.SnapshotStore
import org.scalatest.funsuite.AnyFunSuite

/** Whole-pipeline determinism under partitioning: the SAME page corpus run
  * through KgPipeline at two different input partitionings must commit
  * row-identical tables. On a real cluster the partition count is an
  * execution detail (executor count, AQE coalescing) — any divergence here
  * means some operator's output depends on row placement or intra-
  * partition order (the class of bug that only shows up at 1000 executors,
  * where it is unreproducible). CC min-label, deterministic hashes, and
  * window orderings are all supposed to make this hold exactly.
  */
class PartitionInvarianceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val Tables = Seq("nodes", "edges", "episodes", "episodic_edges", "uuid_map", "node_stats")

  private def runAt(parts: Int): SnapshotStore = {
    val store = new SnapshotStore(spark, Files.createTempDirectory(s"pinv$parts").toString)
    new KgPipeline(store).run(Fixtures.pagesDf().repartition(parts), s"pinv-$parts")
    store
  }

  test("pipeline output is row-identical at 2 vs 9 input partitions") {
    val a = runAt(2)
    val b = runAt(9)
    for (t <- Tables if a.exists(t) || b.exists(t)) {
      assert(a.exists(t) == b.exists(t), s"table $t exists on one side only")
      val ra = a.load(t).toJSON.collect().toSet
      val rb = b.load(t).toJSON.collect().toSet
      val onlyA = ra -- rb
      val onlyB = rb -- ra
      assert(
        onlyA.isEmpty && onlyB.isEmpty,
        s"table $t diverges with partitioning: ${onlyA.take(2)} vs ${onlyB.take(2)}",
      )
    }
  }
}
