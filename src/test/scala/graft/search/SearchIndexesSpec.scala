package graft.search

import java.nio.file.Files

import graft.TestSpark
import graft.io.SnapshotStore
import graft.kg.{Fixtures, KgPipeline}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Graph-adjacency, temporal month, and statistics index surfaces
  * (performance_optimizer.py:340-511, 733-787).
  */
class SearchIndexesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val store: SnapshotStore = {
    val s = new SnapshotStore(spark, Files.createTempDirectory("gidx").toString)
    new KgPipeline(s).run(Fixtures.pagesDf(), "fixture-v1")
    SearchIndexes.build(s)
    s
  }

  test("graph_adj holds every undirected edge pair with multiplicity") {
    val edges = store.load("edges")
    val want = edges
      .select(col("source_uuid").as("src"), col("target_uuid").as("dst"))
      .unionByName(edges.select(col("target_uuid").as("src"), col("source_uuid").as("dst")))
      .groupBy("src", "dst")
      .count()
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val got = store
      .load("graph_adj")
      .collect()
      .map(r => (r.getAs[String]("src"), r.getAs[String]("dst")) -> r.getAs[Long]("cnt"))
      .toMap
    assert(got == want)
  }

  test("indexed BFS lane equals the direct-relation BFS lane") {
    val edges = store.load("edges")
    val origin = edges.select(col("source_uuid")).first().getString(0)
    val sources = Seq(origin).toDF("node")
    val adj = edges.select(col("source_uuid").as("src"), col("target_uuid").as("dst"))
    val direct = graft.graph.GraphOps
      .bfs(graft.graph.GraphOps.undirect(adj), sources, 3)
      .collect()
      .map(r => r.getString(0) -> r.getInt(1))
      .toMap
    val probed = graft.graph.GraphOps
      .bfsIndexed(
        frontier => SearchIndexes.adjacencyForKeys(store, frontier).select(col("src"), col("dst")),
        sources,
        3,
      )
      .collect()
      .map(r => r.getString(0) -> r.getInt(1))
      .toMap
    assert(probed == direct)
  }

  test("refreshGraph: multiplicity keeps shared pairs alive, drops dead ones") {
    val dir = Files.createTempDirectory("gadjr").toString
    val s = new SnapshotStore(spark, dir)
    def ed(rows: Seq[(String, String)]) = rows.toDF("source_uuid", "target_uuid")
    s.commit(ed(Seq(("a", "b"), ("a", "b"), ("b", "c"))), "edges", "seed")
    SearchIndexes.buildGraph(s)
    // remove ONE of the two parallel a-b edges and the only b-c edge
    SearchIndexes.refreshGraph(s, ed(Seq(("a", "b"), ("b", "c"))), ed(Seq.empty))
    val pairs = SearchIndexes.adjacency(s).collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("cnt")).toMap
    assert(pairs == Map(("a", "b") -> 1L, ("b", "a") -> 1L))
    // the probe view folds the delta log the same way
    val probed = SearchIndexes.adjacencyForKeys(s, Seq("b").toDF("src"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("cnt")).toMap
    assert(probed.get(("b", "a")).contains(1L) && !probed.contains(("b", "c")))
    val deg = SearchIndexes.degreeCentrality(s).collect().map(r => r.getAs[String]("node") -> r.getAs[Long]("degree")).toMap
    assert(deg == Map("a" -> 1L, "b" -> 1L))
    // a no-op refresh (identical rows out and in) appends nothing
    val v = s.currentVersion("graph_adj_delta")
    SearchIndexes.refreshGraph(s, ed(Seq(("a", "b"))), ed(Seq(("a", "b"))))
    assert(s.currentVersion("graph_adj_delta") == v)
    // compaction folds the log into the bucketed base and clears it
    // (rebuild reads the edges snapshot — bring it to the post-batch state
    // first, as IncrementalIngest's edges merge does before refreshing)
    s.commit(ed(Seq(("a", "b"))), "edges", "post-batch state")
    SearchIndexes.compactGraph(s)
    assert(s.load("graph_adj_delta").isEmpty)
    val folded = s.load("graph_adj").collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("cnt")).toMap
    assert(folded == Map(("a", "b") -> 1L, ("b", "a") -> 1L))
  }

  test("edgesValidInRange: month-bucket probe equals the direct filter") {
    val edges = store.load("edges").filter(col("valid_at").isNotNull)
    val ts = edges.select(col("valid_at")).orderBy(col("valid_at")).collect().map(_.getTimestamp(0))
    assert(ts.length > 2)
    val from = ts(ts.length / 4)
    val to = ts(3 * ts.length / 4)
    val direct = edges
      .filter(col("valid_at") >= lit(from) && col("valid_at") < lit(to))
      .select("uuid").collect().map(_.getString(0)).toSet
    val probed = SearchIndexes
      .edgesValidInRange(store, from, to)
      .select("uuid").collect().map(_.getString(0)).toSet
    assert(probed == direct && probed.nonEmpty)
  }

  test("refreshTemporal moves an edge between month buckets") {
    val dir = Files.createTempDirectory("gtmp").toString
    val s = new SnapshotStore(spark, dir)
    def ed(rows: Seq[(String, String)]) =
      rows
        .toDF("uuid", "v")
        .select(
          col("uuid"), col("v").cast("timestamp").as("valid_at"),
          lit("g").as("group_id"), col("uuid").as("source_uuid"), lit("rel").as("name"),
        )
    s.commit(ed(Seq(("e1", "2024-01-05 00:00:00"), ("e2", "2024-02-10 00:00:00"))), "edges", "seed")
    SearchIndexes.buildTemporal(s)
    SearchIndexes.refreshTemporal(
      s,
      ed(Seq(("e1", "2024-01-05 00:00:00"))),
      ed(Seq(("e1", "2024-03-01 00:00:00"))),
    )
    val got = SearchIndexes.monthIndex(s).collect().map(r => r.getString(0) -> r.getString(1)).toSet
    assert(got == Set("2024-03" -> "e1", "2024-02" -> "e2"))
    // a rebuilt row that keeps its month is a net-zero delta → no append
    val v = s.currentVersion("edge_months_delta")
    SearchIndexes.refreshTemporal(
      s,
      ed(Seq(("e2", "2024-02-10 00:00:00"))),
      ed(Seq(("e2", "2024-02-10 00:00:00"))),
    )
    assert(s.currentVersion("edge_months_delta") == v)
  }

  test("text delta log: probed postings equal a fresh index of the live corpus") {
    val dir = Files.createTempDirectory("gtext").toString
    val s = new SnapshotStore(spark, dir)
    def docs(rows: Seq[(String, String)]) = rows.toDF("id", "text")
    val v0 = docs(Seq(("d1", "alpha beta beta"), ("d2", "beta gamma")))
    s.commit(v0.toDF("uuid", "fact"), "edges", "seed docs live on edges/fact")
    s.mergeBucketed("edges_postings", graft.search.Bm25.postings(v0), Seq("term", "id"), "seed", bucketBy = Seq("term"))
    s.commit(graft.search.Bm25.corpusStats(v0), "edges_bm25stats", "seed stats")
    // replace d2 (gamma→delta), add d3
    SearchIndexes.refreshText(
      s, "edges",
      docs(Seq(("d2", "beta gamma"))),
      docs(Seq(("d2", "beta delta"), ("d3", "alpha delta delta"))),
    )
    val live = docs(Seq(("d1", "alpha beta beta"), ("d2", "beta delta"), ("d3", "alpha delta delta")))
    val want = graft.search.Bm25.postings(live)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(3), r.getInt(2), r.getLong(4))).toSet
    val terms = Seq("alpha", "beta", "gamma", "delta").toDF("term")
    val got = SearchIndexes.postingsForTerms(s, "edges", terms)
      .collect().map(r => (r.getString(0), r.getString(1), r.getAs[Long]("tf"), r.getAs[Int]("dl"), r.getAs[Long]("df"))).toSet
    assert(got == want)
    // refreshed corpus stats equal a fresh computation over the live docs
    // (signed one-pass delta: old docs leave, new docs enter)
    val stats1 = s.load("edges_bm25stats").collect()(0)
    val wantStats1 = graft.search.Bm25.corpusStats(live).collect()(0)
    assert(stats1.getAs[Long]("n_docs") == wantStats1.getAs[Long]("n_docs"))
    assert(stats1.getAs[Long]("total_dl") == wantStats1.getAs[Long]("total_dl"))
    // second refresh stacks on the log: remove d1 entirely
    SearchIndexes.refreshText(s, "edges", docs(Seq(("d1", "alpha beta beta"))), docs(Seq.empty))
    val got2 = SearchIndexes.postingsForTerms(s, "edges", terms)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(!got2.exists(_._2 == "d1") && got2.exists(_._2 == "d3"))
    val stats2 = s.load("edges_bm25stats").collect()(0)
    assert(stats2.getAs[Long]("n_docs") == 2L)
    assert(stats2.getAs[Long]("total_dl") == wantStats1.getAs[Long]("total_dl") - 3L)
  }

  test("text delta log survives a random multi-batch history (adds/updates/deletes, compaction folds included)") {
    // differential against the live corpus after EVERY batch: any drift in
    // the signed delta-log algebra (append, net-presence reconcile, df
    // recount, fold-into-base compaction) shows up as a probe mismatch
    val vocab = (0 until 8).map(i => s"t$i")
    def text(rnd: scala.util.Random) =
      Seq.fill(1 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    for (seed <- Seq(13L, 29L)) {
      val rnd = new scala.util.Random(seed)
      val dir = Files.createTempDirectory(s"gtextrand$seed").toString
      val s = new SnapshotStore(spark, dir)
      var live = (0 until 6).map(i => s"d$i" -> text(rnd)).toMap
      def docsDf(m: Map[String, String]) = m.toSeq.toDF("id", "text")
      s.mergeBucketed("edges_postings", graft.search.Bm25.postings(docsDf(live)), Seq("term", "id"), "seed", bucketBy = Seq("term"))
      s.commit(graft.search.Bm25.corpusStats(docsDf(live)), "edges_bm25stats", "seed stats")
      for (batch <- 0 until 5) {
        // random touched set: some existing ids (update or delete), some new
        val touched = live.keys.toSeq.sorted.filter(_ => rnd.nextBoolean()).take(3)
        val olds = touched.map(id => id -> live(id)).toMap
        val updated = touched.filter(_ => rnd.nextInt(4) > 0).map(id => id -> text(rnd)).toMap
        val added = (0 until rnd.nextInt(3)).map(i => s"d$batch-n$i" -> text(rnd)).toMap
        live = (live -- touched) ++ updated ++ added
        SearchIndexes.refreshText(s, "edges", docsDf(olds), docsDf(updated ++ added))
        val want = graft.search.Bm25.postings(docsDf(live))
          .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3), r.getLong(4))).toSet
        val got = SearchIndexes.postingsForTerms(s, "edges", vocab.toDF("term"))
          .collect().map(r => (r.getString(0), r.getString(1), r.getAs[Int]("dl"), r.getAs[Long]("tf"), r.getAs[Long]("df"))).toSet
        assert(got == want, s"seed=$seed batch=$batch: probed postings drifted from live corpus")
        val stats = s.load("edges_bm25stats").collect()(0)
        val wantStats = graft.search.Bm25.corpusStats(docsDf(live)).collect()(0)
        assert(stats.getAs[Long]("n_docs") == wantStats.getAs[Long]("n_docs"), s"seed=$seed batch=$batch n_docs")
        assert(stats.getAs[Long]("total_dl") == wantStats.getAs[Long]("total_dl"), s"seed=$seed batch=$batch total_dl")
      }
    }
  }

  test("compaction during refreshText does not double-apply the stats delta") {
    val dir = Files.createTempDirectory("gtextc").toString
    val s = new SnapshotStore(spark, dir)
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 50).map(i => s"w$i")
    def text() = Seq.fill(8)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    var live = (0 until 300).map(i => f"d$i%03d" -> text()).toMap
    def docsDf(m: Map[String, String]) = m.toSeq.toDF("id", "text")
    s.commit(docsDf(live).toDF("uuid", "fact"), "edges", "seed")
    SearchIndexes.buildText(s, "edges", "uuid", "fact")
    // replace 150 docs and add 50 — enough signed delta rows (> 1000 and
    // > 10% of the base) to push the refresh over the compaction threshold
    val touched = live.keys.toSeq.sorted.take(150)
    val olds = touched.map(id => id -> live(id)).toMap
    val updated = touched.map(id => id -> text()).toMap
    val added = (0 until 50).map(i => f"n$i%03d" -> text()).toMap
    live = (live -- touched) ++ updated ++ added
    // serial contract: the base table is at its post-batch version BEFORE
    // the refresh (the inline compaction fold re-reads it)
    s.commit(docsDf(live).toDF("uuid", "fact"), "edges", "post-batch")
    SearchIndexes.refreshText(s, "edges", docsDf(olds), docsDf(updated ++ added))
    assert(graft.io.DeltaLog.logRows(s, "edges_postings") == 0L, "compaction did not trigger — raise the batch size")
    // a double-applied delta would report n_docs = 400 (base 300 + 2×50)
    val stats = s.load("edges_bm25stats").collect()(0)
    val wantStats = graft.search.Bm25.corpusStats(docsDf(live)).collect()(0)
    assert(stats.getAs[Long]("n_docs") == wantStats.getAs[Long]("n_docs"))
    assert(stats.getAs[Long]("total_dl") == wantStats.getAs[Long]("total_dl"))
    // and the folded base equals a fresh index of the live corpus
    val want = graft.search.Bm25.postings(docsDf(live))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(3), r.getInt(2), r.getLong(4))).toSet
    val got = SearchIndexes.postingsForTerms(s, "edges", vocab.toDF("term"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getAs[Long]("tf"), r.getAs[Int]("dl"), r.getAs[Long]("df"))).toSet
    assert(got == want)
  }

  test("ann delta log: probe matches the live vector set") {
    val dir = Files.createTempDirectory("gann").toString
    val s = new SnapshotStore(spark, dir)
    def edgesDf(rows: Seq[(String, String)]) = rows.toDF("uuid", "fact")
      .withColumn("fact_embedding", org.apache.spark.sql.functions.udf((f: String) => graft.kg.Embedder.embed(f).toSeq).apply(col("fact")))
    s.commit(edgesDf(Seq(("e1", "alice knows bob"), ("e2", "carol met dave"))), "edges", "seed")
    SearchIndexes.buildAnn(s)
    // replace e2's fact (vector moves buckets), add e3
    SearchIndexes.refreshAnn(
      s,
      edgesDf(Seq(("e2", "carol met dave"))),
      edgesDf(Seq(("e2", "carol left dave"), ("e3", "eve joined acme"))),
    )
    val allSigs = (0 until 256).toDF("sig")
    val got = SearchIndexes.annForSigs(s, allSigs).collect().map(_.getAs[String]("uuid")).toSeq.sorted
    assert(got == Seq("e1", "e2", "e3"))
  }

  test("ann width gate: probe/refresh at a width other than the stored one fails fast; rebuild re-stamps") {
    val s = new SnapshotStore(spark, Files.createTempDirectory("gannw").toString)
    def edgesDf(rows: Seq[(String, String)]) = rows.toDF("uuid", "fact")
      .withColumn("fact_embedding", org.apache.spark.sql.functions.udf((f: String) => graft.kg.Embedder.embed(f).toSeq).apply(col("fact")))
    s.commit(edgesDf(Seq(("e1", "alice knows bob"), ("e2", "carol met dave"))), "edges", "seed")
    SearchIndexes.buildAnn(s)
    assert(SearchIndexes.storedAnnPlanes(s).contains(8))
    System.setProperty("graft.ann.planes", "16")
    try {
      val ex = intercept[IllegalArgumentException](SearchIndexes.annForSigs(s, (0 until 4).toDF("sig")).collect())
      assert(ex.getMessage.contains("width 8") && ex.getMessage.contains("planes=16"))
      intercept[IllegalArgumentException](
        SearchIndexes.refreshAnn(s, edgesDf(Seq.empty), edgesDf(Seq(("e3", "eve joined acme")))),
      )
      // the mandated rebuild re-signs every bucket and re-stamps the width
      SearchIndexes.buildAnn(s)
      assert(SearchIndexes.storedAnnPlanes(s).contains(16))
      val got = SearchIndexes
        .annForSigs(s, (0 until 65536).toDF("sig"))
        .collect().map(_.getAs[String]("uuid")).toSeq.sorted
      assert(got == Seq("e1", "e2"))
    } finally System.clearProperty("graft.ann.planes")
  }

  test("statistics lists every committed index with rows and version") {
    val stats = SearchIndexes.statistics(store).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq("edges_postings", "edges_bm25stats", "edge_ann", "graph_adj", "graph_degrees", "edge_months")
      .foreach(idx => assert(stats.contains(idx), s"missing $idx"))
    assert(stats("graph_adj") > 0 && stats("edge_months") > 0)
  }

  test("deleteAll drops every index; build recreates the same content") {
    val s = new SnapshotStore(spark, Files.createTempDirectory("gidxdel").toString)
    new KgPipeline(s).run(Fixtures.pagesDf(), "fixture-v1")
    SearchIndexes.build(s)
    val before = s.load("edges_postings").collect().map(_.toString).toSet
    assert(before.nonEmpty)
    SearchIndexes.deleteAll(s)
    assert(SearchIndexes.statistics(s).collect().isEmpty, "an index survived deleteAll")
    assert(s.exists("edges"), "deleteAll must not touch the primaries")
    SearchIndexes.build(s)
    assert(s.load("edges_postings").collect().map(_.toString).toSet == before)
  }

  test("autoRebuild folds only indexes whose delta log crosses the threshold") {
    val s = new SnapshotStore(spark, Files.createTempDirectory("gidxauto").toString)
    new KgPipeline(s).run(Fixtures.pagesDf(), "fixture-v1")
    SearchIndexes.build(s)
    // freshly built: no delta logs anywhere → nothing rebuilt even at 0
    val fresh = SearchIndexes.autoRebuild(s, threshold = 0.0).collect()
    assert(fresh.nonEmpty && fresh.forall(_.getAs[String]("action") == "fresh"))
    // push a pair delta into the graph_adj log (a real edge duplicated —
    // rebuilds fold from the primaries, so orphan pairs would not survive
    // a fold), leave the other indexes clean
    val picked = s
      .load("edges")
      .select(col("source_uuid"), col("target_uuid"))
      .orderBy(col("source_uuid"), col("target_uuid"))
      .limit(1)
      .collect()(0)
    val (src0, dst0) = (picked.getString(0), picked.getString(1))
    val one = Seq((src0, dst0)).toDF("source_uuid", "target_uuid")
    SearchIndexes.refreshGraph(s, one.limit(0), one)
    assert(graft.io.DeltaLog.logRows(s, "graph_adj") > 0)
    // the primaries' true multiplicity for the pair (both directions)
    val baseCnt = s
      .load("edges")
      .filter(
        (col("source_uuid") === src0 && col("target_uuid") === dst0) ||
          (col("source_uuid") === dst0 && col("target_uuid") === src0),
      )
      .count()
    // live view shows the incremented multiplicity
    assert(
      SearchIndexes.adjacency(s).filter(col("src") === src0 && col("dst") === dst0).collect()(0).getAs[Long]("cnt")
        == baseCnt + 1,
    )
    // high threshold: the tiny delta stays pending
    val kept = SearchIndexes.autoRebuild(s, threshold = 0.8).collect()
    assert(kept.find(_.getString(0) == "graph_adj").get.getAs[String]("action") == "fresh")
    // zero threshold: graph_adj folds, siblings untouched
    val acted = SearchIndexes.autoRebuild(s, threshold = 0.0).collect()
    val byIdx = acted.map(r => r.getString(0) -> r.getAs[String]("action")).toMap
    assert(byIdx("graph_adj") == "rebuilt")
    assert(byIdx.filterNot(_._1 == "graph_adj").values.forall(_ == "fresh"))
    assert(graft.io.DeltaLog.logRows(s, "graph_adj") == 0)
    // folded back to the primaries' truth
    assert(
      SearchIndexes.adjacency(s).filter(col("src") === src0 && col("dst") === dst0).collect()(0).getAs[Long]("cnt")
        == baseCnt,
    )
  }

  test("degreeCentrality = degree/(n-1)") {
    val d = SearchIndexes.degreeCentrality(store).collect()
    val n = d.length
    d.foreach { r =>
      assert(math.abs(r.getAs[Double]("degree_centrality") - r.getAs[Long]("degree").toDouble / (n - 1)) < 1e-12)
    }
  }
}
