package graft.search

import java.nio.file.Files

import graft.TestSpark
import graft.io.SnapshotStore
import graft.kg.{Fixtures, KgPipeline}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Index persistence/lifecycle parity (save_index/load_index,
  * index_versioning, cleanup_unused_indices —
  * performance_optimizer.py:921-1426) over the snapshot store.
  */
class IndexLifecycleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshStore(tag: String): SnapshotStore = {
    val s = new SnapshotStore(spark, Files.createTempDirectory(tag).toString)
    new KgPipeline(s).run(Fixtures.pagesDf(), "fixture-v1")
    SearchIndexes.build(s)
    s
  }

  private def docs(rows: Seq[(String, String)]) = rows.toDF("id", "text")

  test("export → drop → import round-trips every index with identical probe results") {
    val s = freshStore("glc-rt")
    // live refresh log before export: the export must carry it, not lose it
    SearchIndexes.refreshText(s, "edges", docs(Seq.empty), docs(Seq(("zzdoc", "zebra zulu zebra"))))
    val term = s.load("edges_postings").select("term").orderBy("term").first().getString(0)
    val probeTerms = Seq(term, "zebra").toDF("term")
    val allSigs = (0 until 256).toDF("sig")

    def snapshot(): (Set[String], Set[String], Set[String], Set[String], String) = (
      SearchIndexes.postingsForTerms(s, "edges", probeTerms).collect().map(_.toString).toSet,
      SearchIndexes.annForSigs(s, allSigs).collect().map(_.getAs[String]("uuid")).toSet,
      s.load("graph_adj").collect().map(_.toString).toSet,
      s.load("edge_months").collect().map(_.toString).toSet,
      s.load("edges_bm25stats").collect()(0).toString,
    )
    val before = snapshot()

    val dir = Files.createTempDirectory("glc-exp").toString
    val counts = IndexLifecycle.exportIndex(s, "all", dir)
    assert(counts("edges_postings") > 0 && counts("edge_ann") > 0 && counts("graph_adj") > 0)

    SearchIndexes.deleteAll(s)
    assert(!s.exists("edges_postings") && !s.exists("edge_ann"))

    IndexLifecycle.importIndex(s, "all", dir)
    assert(snapshot() == before, "imported indexes must answer probes identically")
    // bucket layout restored (probe path, not scan): manifest exists
    assert(s.referencedVersions("edges_postings", s.currentVersion("edges_postings").get).nonEmpty)
    // the ANN width stamp survives the round trip — the width gate keeps holding
    assert(SearchIndexes.storedAnnPlanes(s).contains(SearchIndexes.annPlanes))
  }

  test("import is a restore: store-only rows are deleted, not unioned") {
    val s = freshStore("glc-repl")
    val dir = Files.createTempDirectory("glc-exp2").toString
    IndexLifecycle.exportIndex(s, "graph", dir)
    // drift the live index after the export
    val bogus = Seq(("zz-bogus-src", "zz-bogus-dst", 1L)).toDF("src", "dst", "cnt")
    s.mergeBucketed("graph_adj", bogus, Seq("src", "dst"), "drift", bucketBy = Seq("src"))
    assert(s.load("graph_adj").filter(col("src") === "zz-bogus-src").count() == 1L)
    IndexLifecycle.importIndex(s, "graph", dir)
    assert(s.load("graph_adj").filter(col("src") === "zz-bogus-src").count() == 0L, "import must replace, not union")
  }

  test("restoreIndexVersion re-points one index table; primaries are refused") {
    val s = freshStore("glc-ver")
    val v0 = s.currentVersion("graph_adj").get
    val before = s.load("graph_adj").collect().map(_.toString).toSet
    val extra = Seq(("zz-v-src", "zz-v-dst", 1L)).toDF("src", "dst", "cnt")
    s.mergeBucketed("graph_adj", extra, Seq("src", "dst"), "newer version", bucketBy = Seq("src"))
    assert(s.load("graph_adj").collect().map(_.toString).toSet != before)
    IndexLifecycle.restoreIndexVersion(s, "graph_adj", v0)
    assert(s.load("graph_adj").collect().map(_.toString).toSet == before)
    val versions = IndexLifecycle.listIndexVersions(s, "graph")
    assert(versions("graph_adj")._1 == v0)
    intercept[IllegalArgumentException] { IndexLifecycle.restoreIndexVersion(s, "edges", 0) }
  }

  test("retention sweep deletes only unreachable old versions") {
    val s = freshStore("glc-gc")
    // two stats refreshes → two superseded PLAIN versions (no manifest:
    // reachable = self only) of edges_bm25stats, eligible once aged out
    SearchIndexes.refreshText(s, "edges", docs(Seq.empty), docs(Seq(("gc1", "alpha beta"))))
    SearchIndexes.refreshText(s, "edges", docs(Seq.empty), docs(Seq(("gc2", "gamma delta"))))
    val statsVersions = s.versions("edges_bm25stats")
    assert(statsVersions.size >= 3)
    // a graph_adj merge that CARRIES the build's buckets by reference —
    // the old version's files stay reachable from the new manifest
    val pair = Seq(("zz-gc-src", "zz-gc-dst", 1L)).toDF("src", "dst", "cnt")
    s.mergeBucketed("graph_adj", pair, Seq("src", "dst"), "gc drift", bucketBy = Seq("src"))
    val adjCur = s.currentVersion("graph_adj").get
    val adjReachable = s.referencedVersions("graph_adj", adjCur)
    assert(adjReachable.exists(_ < adjCur), "fixture must carry old buckets by reference")

    // far-future "now": every superseded version is past retention
    val future = System.currentTimeMillis() + 365L * 86400000L
    val res = IndexLifecycle.cleanupIndexVersions(s, retentionDays = 30, now = future)

    // superseded plain stats versions are gone; the current one stays
    val statsLeft = s.versions("edges_bm25stats")
    assert(statsLeft == Seq(s.currentVersion("edges_bm25stats").get))
    assert(res.removedVersions.getOrElse("edges_bm25stats", Nil).nonEmpty)
    assert(res.freedBytes > 0)
    // manifest-referenced old graph_adj versions SURVIVED the sweep
    adjReachable.foreach(v => assert(s.versions("graph_adj").contains(v), s"reachable graph_adj v=$v was deleted"))
    // live delta-log segments survived (the postings refreshes appended)
    assert(graft.io.DeltaLog.logRows(s, "edges_postings") > 0L)
    // and every index still answers probes after the sweep
    assert(SearchIndexes.adjacencyForKeys(s, s.load("graph_adj").select("src").limit(5)).count() > 0)
    assert(s.load("edges_bm25stats").count() == 1L)
  }
}
