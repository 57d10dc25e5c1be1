package graft.streaming

import java.nio.file.Files

import graft.TestSpark
import graft.io.SnapshotStore
import graft.kg.Fixtures
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.scalatest.funsuite.AnyFunSuite

/** The incremental batch's concurrent stage groups (stage A: episode /
  * triple / surface / blocking writers; stage B: node / mention / edge
  * writers) must produce snapshots IDENTICAL to the same batch schedule
  * run fully serial — pinning the fusion's ordering assumptions: the
  * writers only read checkpointed frames or version-pinned probes, the
  * episodic_edges remap runs before the mentions merge, and no group
  * member reads a table a sibling writes.
  */
class StageFusionDifferentialSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** A schedule that exercises every stage-B branch: fresh corpus, alias
    * batch (canonical remaps → episodic remap + endpoint-index probes),
    * mover batch (contradiction invalidation), and a re-ingest of a base
    * page with changed content (retractions + replace semantics).
    */
  private def ingestAll(seq: Boolean): (SnapshotStore, String) = {
    val root = Files.createTempDirectory(if (seq) "fuseq" else "fucon").toString
    val store = new SnapshotStore(spark, root)
    graft.io.Concurrent.forceSequential = seq
    try {
      val pages = Fixtures.pagesDf()
      val base = pages.filter(!col("url").contains("/alias/") && !col("url").contains("/move/"))
      IncrementalIngest.ingestBatch(store, base, 0L)
      graft.search.SearchIndexes.build(store)
      IncrementalIngest.ingestBatch(store, pages.filter(col("url").contains("/alias/")), 1L)
      IncrementalIngest.ingestBatch(store, pages.filter(col("url").contains("/move/")), 2L)
      val u = base.select(min(col("url"))).collect()(0).getString(0)
      val reingest = base
        .filter(col("url") === lit(u))
        .withColumn(
          "html",
          encode(regexp_replace(decode(col("html"), "UTF-8"), "NATION_0", "NATION_3"), "UTF-8"),
        )
        .withColumn("warc_ts", lit(Fixtures.ts(999999)))
      IncrementalIngest.ingestBatch(store, reingest, 3L)
    } finally graft.io.Concurrent.forceSequential = false
    (store, root)
  }

  /** Row-set snapshot with string arrays sorted (set-semantics columns
    * like `episodes` may collect in partition order).
    */
  private def rows(df: DataFrame): Set[String] = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case ArrayType(StringType, _) => array_sort(col(f.name)).as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols.toSeq: _*).collect().map(_.toString).toSet
  }

  test("concurrent stage groups == fully serial schedule, every table") {
    val (conStore, conRoot) = ingestAll(seq = false)
    val (seqStore, seqRoot) = ingestAll(seq = true)
    def tables(root: String): Set[String] = {
      val d = new java.io.File(root)
      d.listFiles().filter(_.isDirectory).map(_.getName).toSet
    }
    val conTables = tables(conRoot)
    assert(conTables == tables(seqRoot), "the two schedules created different table sets")
    // every snapshot byte-equal in content (delta logs fold on load)
    conTables.toSeq.sorted.foreach { t =>
      assert(rows(conStore.load(t)) == rows(seqStore.load(t)), s"table $t diverged between concurrent and serial runs")
    }
  }
}
