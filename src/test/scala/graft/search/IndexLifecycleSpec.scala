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

  /** Test-only: rewrite a version's committed_at so it is past any
    * retention cutoff (all fixture commits land within one second, so
    * age-based scenarios need a planted timestamp).
    */
  private def ageVersion(s: SnapshotStore, table: String, v: Int): Unit = {
    val p = java.nio.file.Paths.get(s.root, table, s"v=$v", "_commit.json")
    val json = new String(Files.readAllBytes(p), "UTF-8")
    val aged = """"committed_at":\d+""".r.replaceAllIn(json, """"committed_at":1000""")
    Files.write(p, aged.getBytes("UTF-8"))
  }

  test("sweep reachability is a fixpoint: a surviving rollback target keeps the versions it references") {
    val s = freshStore("glc-fix")
    val vBuild = s.currentVersion("graph_adj").get
    // v2: small drift — carries vBuild's untouched buckets BY REFERENCE
    s.mergeBucketed(
      "graph_adj", Seq(("zz-fp-src", "zz-fp-dst", 1L)).toDF("src", "dst", "cnt"),
      Seq("src", "dst"), "fixpoint drift", bucketBy = Seq("src"),
    )
    val vMid = s.currentVersion("graph_adj").get
    assert(s.referencedVersions("graph_adj", vMid).contains(vBuild))
    // v3: rewrite EVERY bucket (all existing keys re-enter) — the current
    // manifest no longer references vBuild or vMid
    val allRows = s.load("graph_adj").withColumn("cnt", col("cnt") + 1L).localCheckpoint()
    s.mergeBucketed("graph_adj", allRows, Seq("src", "dst"), "full rewrite", bucketBy = Seq("src"))
    val vCur = s.currentVersion("graph_adj").get
    assert(!s.referencedVersions("graph_adj", vCur).contains(vBuild))
    assert(!s.referencedVersions("graph_adj", vCur).contains(vMid))
    // vBuild ages out; vMid stays within retention (a valid restore target)
    ageVersion(s, "graph_adj", vBuild)
    IndexLifecycle.cleanupIndexVersions(s, retentionDays = 30)
    // vMid survives (within retention) → the files it references must too
    assert(s.versions("graph_adj").contains(vBuild), "fixpoint must keep a survivor's referenced version")
    IndexLifecycle.restoreIndexVersion(s, "graph_adj", vMid)
    assert(s.load("graph_adj").count() > 0, "restored version must still find its bucket files")
  }

  test("post-rollback orphans newer than current sweep under the same rules") {
    val s = freshStore("glc-orph")
    val v0 = s.currentVersion("graph_adj").get
    s.mergeBucketed(
      "graph_adj", Seq(("zz-orph-src", "zz-orph-dst", 1L)).toDF("src", "dst", "cnt"),
      Seq("src", "dst"), "abandoned newer version", bucketBy = Seq("src"),
    )
    val vNew = s.currentVersion("graph_adj").get
    IndexLifecycle.restoreIndexVersion(s, "graph_adj", v0)
    ageVersion(s, "graph_adj", vNew)
    val res = IndexLifecycle.cleanupIndexVersions(s, retentionDays = 30)
    assert(!s.versions("graph_adj").contains(vNew), "aged-out unreachable version above current must sweep")
    assert(res.removedVersions.getOrElse("graph_adj", Nil).contains(vNew))
    assert(s.load("graph_adj").count() > 0)
  }

  test("the newest planes-stamped edge_ann version never sweeps (width gate survives)") {
    val s = freshStore("glc-stamp")
    val vStamp = SearchIndexes.annStampVersion(s).get
    // unstamped full rewrite: current manifest stops referencing vStamp
    val allRows = s.load("edge_ann").localCheckpoint()
    s.mergeBucketed("edge_ann", allRows, Seq("sig", "uuid"), "unstamped rewrite", bucketBy = Seq("sig"))
    assert(!s.referencedVersions("edge_ann", s.currentVersion("edge_ann").get).contains(vStamp))
    ageVersion(s, "edge_ann", vStamp)
    IndexLifecycle.cleanupIndexVersions(s, retentionDays = 30)
    assert(s.versions("edge_ann").contains(vStamp), "stamp version must survive the sweep")
    assert(SearchIndexes.annStampVersion(s).contains(vStamp))
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
