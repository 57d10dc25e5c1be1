package graft.search

import java.nio.file.Files

import graft.TestSpark
import graft.community.Communities
import graft.io.SnapshotStore
import graft.kg.{Fixtures, Ids, KgPipeline}
import org.scalatest.funsuite.AnyFunSuite

class KgSearchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val store: SnapshotStore = {
    val s = new SnapshotStore(spark, Files.createTempDirectory("gsearch").toString)
    new KgPipeline(s).run(Fixtures.pagesDf(), "fixture-v1")
    Communities.build(s)
    s
  }

  test("edge lane: bm25+cosine RRF surfaces the queried entity's facts") {
    val hits = new KgSearch(store)
      .searchEdges("Customer#000000004 lives in NATION_3")
      .collect()
    assert(hits.nonEmpty)
    val top = hits.head
    assert(top.getAs[String]("fact").contains("lives in"))
    assert(hits.map(_.getAs[String]("fact")).exists(_.contains("Customer#000000004")))
  }

  test("as-of search excludes facts invalidated before/after the timestamp") {
    val e3 = Ids.entity("default", f"Customer#${3}%09d")
    val ks = new KgSearch(store)
    val before = ks
      .searchEdges("lives in", asOf = Some(Fixtures.ts(43200L)))
      .collect()
      .filter(_.getAs[String]("source_uuid") == e3)
    val after = ks
      .searchEdges("lives in", asOf = Some(Fixtures.ts(200000L)))
      .collect()
      .filter(_.getAs[String]("source_uuid") == e3)
    // the mover has exactly one valid lives_in fact at any time
    assert(before.map(_.getAs[String]("target_uuid")).toSet != after.map(_.getAs[String]("target_uuid")).toSet || (before.isEmpty && after.isEmpty))
  }

  test("bfs lane: origin proximity pulls in neighbors' facts") {
    val origin = Ids.entity("default", "Supplier#0")
    val hits = new KgSearch(store)
      .searchEdges("zzz-no-keyword-match", originNode = Some(origin), config = KgSearchConfig(limit = 10))
      .collect()
    assert(hits.nonEmpty, "bfs lane alone should produce results")
  }

  test("node lane finds alias-canonicalized entity by name tokens") {
    val hits = new KgSearch(store).searchNodes("NATION_2").collect()
    assert(hits.nonEmpty)
    assert(hits.head.getAs[String]("name") == "NATION_2")
  }

  test("episode lane: bm25 over page content") {
    val hits = new KgSearch(store).searchEpisodes("works at Supplier#2").collect()
    assert(hits.nonEmpty)
  }

  test("community lane returns after build_communities") {
    val res = new KgSearch(store).searchCommunities("Customer#000000004")
    assert(res.isDefined)
  }

  test("mmr reranker returns k diversified results deterministically") {
    val ks = new KgSearch(store)
    val cfg = KgSearchConfig(limit = 5, reranker = "mmr")
    val a = ks.searchEdges("lives in", config = cfg).collect().map(_.getAs[String]("uuid")).toSeq
    val b = ks.searchEdges("lives in", config = cfg).collect().map(_.getAs[String]("uuid")).toSeq
    assert(a == b && a.size == 5)
  }

  test("episode_mentions reranker orders by supporting-episode count") {
    val ks = new KgSearch(store)
    val hits = ks
      .searchEdges("lives in", config = KgSearchConfig(limit = 5, reranker = "episode_mentions"))
      .collect()
    assert(hits.nonEmpty)
  }

  test("full 4-lane search returns all lanes") {
    val r = new KgSearch(store).search("Customer#000000001 lives in NATION_0")
    assert(r.edges.collect().nonEmpty)
    assert(r.nodes.collect().nonEmpty)
    assert(r.episodes.collect().nonEmpty)
    assert(r.communities.isDefined)
  }

  test("group_ids scope every lane: matching group unchanged, foreign group empty") {
    val ks = new KgSearch(store)
    val unscoped = ks.searchEdges("lives in").collect().map(_.getAs[String]("uuid")).toSeq
    val same = ks.searchEdges("lives in", groupIds = Seq("default")).collect().map(_.getAs[String]("uuid")).toSeq
    assert(same == unscoped, "scoping to the only group must not change results")
    assert(ks.searchEdges("lives in", groupIds = Seq("tenantB")).collect().isEmpty)
    assert(ks.searchNodes("NATION_2", groupIds = Seq("tenantB")).collect().isEmpty)
    assert(ks.searchEpisodes("works at", groupIds = Seq("tenantB")).collect().isEmpty)
  }

  test("SearchFilters DSL scopes the edge lane (valid_at CNF)") {
    import SearchFilters._
    val ks = new KgSearch(store)
    val all = ks.searchEdges("lives in").collect()
    assert(all.nonEmpty)
    // valid_at > max ts in the fixture → nothing survives the filter
    val none = ks.searchEdges(
      "lives in",
      filters = Filters(validAt = Seq(Seq(DateFilter("valid_at", Gt, Some(Fixtures.ts(999999999L)))))),
    ).collect()
    assert(none.isEmpty)
    // a vacuous filter leaves results unchanged
    val sameF = ks.searchEdges(
      "lives in",
      filters = Filters(validAt = Seq(Seq(DateFilter("valid_at", IsNotNull)))),
    ).collect().map(_.getAs[String]("uuid")).toSeq
    assert(sameF == all.map(_.getAs[String]("uuid")).toSeq)
  }

  test("one Filters object scopes all four lanes schema-aware (labels/valid_at skip label-less/timeless frames)") {
    import SearchFilters._
    val ks = new KgSearch(store)
    // nodeLabels + a valid_at CNF in ONE filter: the edge lane applies the
    // temporal part and skips labels (no labels column); the node lane
    // applies labels and skips valid_at (no valid_at column). Both vacuous
    // here → full search() must run crash-free with unchanged results.
    val f = Filters(
      validAt = Seq(Seq(DateFilter("valid_at", IsNotNull), DateFilter("valid_at", IsNull))),
      nodeLabels = Seq("Person"), // Customer#… surfaces carry the Person label
    )
    val res = ks.search("Customer#000000004 lives in NATION_3", filters = f)
    assert(res.edges.collect().nonEmpty)
    assert(res.nodes.collect().nonEmpty)
    // a non-matching label empties the node lane but leaves edges alone
    val resNo = ks.search("lives in", filters = f.copy(nodeLabels = Seq("NoSuchLabel")))
    assert(resNo.nodes.collect().isEmpty && resNo.edges.collect().nonEmpty)
  }

  test("lane toggles: a disabled lane neither retrieves nor joins the fusion") {
    val ks = new KgSearch(store)
    val q = "Customer#000000004 lives in NATION_3"
    // keyword-only == the bm25 lane ranking (single-lane RRF is monotone)
    val kwOnly = ks.searchEdges(q, config = KgSearchConfig(semanticLane = false))
    val both = ks.searchEdges(q)
    assert(kwOnly.collect().nonEmpty)
    assert(kwOnly.collect().map(_.getAs[String]("uuid")).toSet != Set.empty[String])
    // semantic-only still returns (cosine lane alone)
    val semOnly = ks.searchEdges(q, config = KgSearchConfig(keywordLane = false))
    assert(semOnly.collect().nonEmpty)
    // sanity: toggling changed the fused ranking inputs (two lanes vs one)
    assert(both.collect().nonEmpty)
    // all lanes off → fail fast, not an empty frame pretending success
    intercept[IllegalArgumentException] {
      ks.searchEdges(q, config = KgSearchConfig(keywordLane = false, semanticLane = false))
    }
    intercept[IllegalArgumentException] {
      ks.searchNodes("NATION_2", config = KgSearchConfig(keywordLane = false, semanticLane = false))
    }
  }

  test("node_distance reranker orders by BFS proximity to the origin") {
    val origin = Ids.entity("default", "Supplier#0")
    val ks = new KgSearch(store)
    val hits = ks
      .searchEdges(
        "lives in",
        originNode = Some(origin),
        config = KgSearchConfig(limit = 5, reranker = "node_distance"),
      )
      .collect()
    assert(hits.nonEmpty)
    val scores = hits.map(_.getAs[Double]("score")).toSeq
    assert(scores == scores.sorted.reverse, "results must be ordered by proximity score desc")
  }

  test("unknown reranker fails fast instead of silently falling back to rrf") {
    val ks = new KgSearch(store)
    val ex = intercept[RuntimeException] {
      ks.searchEdges("lives in", config = KgSearchConfig(reranker = "crossencoder-typo")).collect()
    }
    assert(ex.getMessage.contains("unknown reranker"))
  }

  test("incremental community placement follows neighbor plurality") {
    val anyNode = store.load("nodes").limit(1).collect()(0).getString(0)
    // placing an existing member should land it in some community
    val placed = Communities.placeNode(store, anyNode)
    assert(placed.isDefined)
  }
}
