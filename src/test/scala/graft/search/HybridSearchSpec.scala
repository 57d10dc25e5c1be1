package graft.search

import java.nio.file.Files

import graft.TestSpark
import graft.io.SnapshotStore
import graft.kg.{Fixtures, Ids, KgPipeline}
import graft.search.HybridSearch.HybridConfig
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HybridSearchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val store: SnapshotStore = {
    val s = new SnapshotStore(spark, Files.createTempDirectory("ghybrid").toString)
    new KgPipeline(s).run(Fixtures.pagesDf(), "fixture-v1")
    s
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(String, Double, Double, Double, Double)] =
    df.collect()
      .map(r =>
        (
          r.getAs[String]("id"),
          math.round(r.getAs[Double]("combined_score") * 1e9) / 1e9,
          math.round(r.getAs[Double]("semantic_score") * 1e9) / 1e9,
          math.round(r.getAs[Double]("keyword_score") * 1e9) / 1e9,
          math.round(r.getAs[Double]("graph_score") * 1e9) / 1e9,
        ),
      )
      .toSeq

  test("batch of n == n single-query searches (one job vs loop)") {
    val queries = Seq(1L -> "lives in NATION_2", 2L -> "works at", 3L -> "Customer#000000004")
    val cfg = HybridConfig(limit = 7)
    val batch = HybridSearch.batchHybridSearch(store, queries, cfg)
    queries.foreach { case (qid, q) =>
      val single = rows(HybridSearch.hybridSearch(store, q, cfg))
      val slice = rows(batch.filter(col("query_id") === qid).drop("query_id"))
      assert(slice == single, s"query $qid diverged between batch and single")
    }
  }

  test("keyword-only config ranks exactly like BM25 over facts") {
    val q = "lives in"
    val res = HybridSearch
      .hybridSearch(store, q, HybridConfig(semanticWeight = 0.0, keywordWeight = 1.0, graphWeight = 0.0, limit = 10))
      .collect()
    val expected = Bm25
      .score(store.load("edges").select(col("uuid").as("id"), col("fact").as("text")), "id", "text", Seq("lives", "in"))
      .orderBy(col("score").desc, col("id"))
      .limit(10)
      .collect()
      .map(_.getAs[String]("id"))
      .toSeq
    // min-max is monotone, so the keyword-only ranking must match raw BM25
    assert(res.map(_.getAs[String]("id")).toSeq == expected)
    assert(res.head.getAs[Double]("keyword_score") == 1.0) // lane max normalizes to 1
  }

  test("graph-only config with a center node ranks by 1/(1+min endpoint distance)") {
    val center = Ids.entity("default", "Supplier#0")
    val res = HybridSearch
      .searchWithCenter(
        store,
        "lives in",
        center,
        HybridConfig(semanticWeight = 0.0, keywordWeight = 0.0, graphWeight = 1.0, limit = 50),
      )
      .collect()
    assert(res.nonEmpty)
    // every edge touching the center scores 1/(1+0 or 1); scores must be
    // non-increasing and within [0, 1]
    val scores = res.map(_.getAs[Double]("combined_score")).toSeq
    assert(scores == scores.sorted.reverse)
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
    val touching = res.filter(r =>
      r.getAs[String]("source_uuid") == center || r.getAs[String]("target_uuid") == center,
    )
    assert(touching.nonEmpty && touching.forall(_.getAs[Double]("graph_score") == 1.0))
  }

  test("searchWithCenter fails fast on an unknown center node") {
    val e = intercept[IllegalArgumentException] {
      HybridSearch.searchWithCenter(store, "lives in", "no-such-uuid")
    }
    assert(e.getMessage.contains("no-such-uuid"))
  }

  test("edge-type filter restricts every lane to the named relations") {
    val res = HybridSearch
      .hybridSearch(store, "Customer#000000004", HybridConfig(edgeTypes = Seq("works_at"), limit = 20))
      .collect()
    assert(res.nonEmpty)
    assert(res.forall(_.getAs[String]("name") == "works_at"))
  }

  test("temporal filter drops edges already invalidated at the instant") {
    // entity 2 moves nations at +86400s: its first lives_in fact is
    // invalidated then. A filter AFTER the move must drop the old fact.
    val e2 = Ids.entity("default", f"Customer#${3}%09d")
    val cfg = HybridConfig(limit = 50, temporalFilter = Some(Fixtures.ts(300000L)))
    val res = HybridSearch
      .hybridSearch(store, "lives in", cfg)
      .collect()
      .filter(r => r.getAs[String]("source_uuid") == e2 && r.getAs[String]("name") == "lives_in")
    val live = store
      .load("edges")
      .filter(
        col("source_uuid") === e2 && col("name") === "lives_in" &&
          (col("invalid_at").isNull || col("invalid_at") > lit(Fixtures.ts(300000L))),
      )
      .collect()
      .map(_.getAs[String]("uuid"))
      .toSet
    assert(res.nonEmpty && res.map(_.getAs[String]("id")).toSet.subsetOf(live))
  }

  test("indexed (postings) path == on-the-fly path") {
    val q = "lives in NATION_1"
    val cfg = HybridConfig(limit = 10)
    val before = rows(HybridSearch.hybridSearch(store, q, cfg))
    val s2 = new SnapshotStore(spark, store.root)
    SearchIndexes.build(s2)
    try {
      val after = rows(HybridSearch.hybridSearch(s2, q, cfg))
      assert(after == before, "hybrid results changed when the BM25 index was committed")
    } finally SearchIndexes.deleteAll(s2)
  }

  test("annLsh semantic lane == bucket-restricted exact ranking") {
    val s2 = new SnapshotStore(spark, store.root)
    SearchIndexes.build(s2)
    try {
      val q = "lives in NATION_1"
      val cfg = HybridConfig(semanticWeight = 1.0, keywordWeight = 0.0, graphWeight = 0.0, limit = 10, annLsh = true)
      val res = HybridSearch.hybridSearch(s2, q, cfg).collect()
      assert(res.nonEmpty)
      // expected: exact cosine ranking restricted to the query's signature
      // bucket (min-max is monotone, so the fused order equals raw order)
      val qv = graft.kg.Embedder.embed(q).map(_.toDouble).toSeq
      import spark.implicits._
      val qSig = graft.sim.Ann
        .signature(Seq((0L, qv)).toDF("query_id", "qv"), "query_id", "qv")
        .collect()(0)
        .getAs[Int]("sig")
      val expected = store
        .load("edges")
        .withColumn("sig", graft.sim.Ann.signatureCol(col("fact_embedding")))
        .filter(col("sig") === qSig)
        .withColumn("score", Vectors.cosine(col("fact_embedding"), array(qv.map(lit): _*)))
        .filter(col("score") >= 0.0)
        .orderBy(col("score").desc, col("uuid"))
        .limit(10)
        .collect()
        .map(_.getAs[String]("uuid"))
        .toSeq
      assert(res.map(_.getAs[String]("id")).toSeq == expected)
    } finally SearchIndexes.deleteAll(s2)
  }

  test("zero-weight text lane still generates candidates when the graph lane ranks") {
    // sem_weight = 0 but graph_weight > 0: the semantic lane must stay on
    // as a candidate GENERATOR (a semantically-close edge touching the
    // center node is rankable by the graph term even though its semantic
    // weight is 0). Candidate set must equal the epsilon-semantic-weight
    // run, where the lane undeniably runs.
    val center = Ids.entity("default", "Supplier#0")
    val zero =
      HybridConfig(semanticWeight = 0.0, keywordWeight = 0.3, graphWeight = 0.7, limit = 500, centerNode = Some(center))
    val eps = zero.copy(semanticWeight = 1e-12)
    def ids(cfg: HybridConfig) =
      HybridSearch.hybridSearch(store, "lives in", cfg).collect().map(_.getAs[String]("id")).toSet
    assert(ids(zero) == ids(eps))
  }

  test("graph lane over the committed adjacency index == direct BFS") {
    val center = Ids.entity("default", "Supplier#0")
    val cfg =
      HybridConfig(semanticWeight = 0.0, keywordWeight = 0.0, graphWeight = 1.0, limit = 50, centerNode = Some(center))
    val direct = rows(HybridSearch.hybridSearch(store, "lives in", cfg))
    val s2 = new SnapshotStore(spark, store.root)
    SearchIndexes.build(s2)
    try assert(rows(HybridSearch.hybridSearch(s2, "lives in", cfg)) == direct)
    finally SearchIndexes.deleteAll(s2)
  }

  test("stats reports index presence and corpus sizes") {
    val st = HybridSearch.stats(store).collect()(0)
    assert(st.getAs[Long]("driver_edges_count") > 0)
    assert(st.getAs[Long]("driver_nodes_count") > 0)
  }
}
