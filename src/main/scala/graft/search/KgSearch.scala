package graft.search

import java.sql.Timestamp

import graft.graph.GraphOps
import graft.io.SnapshotStore
import graft.kg.{Embedder, Invalidation}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Query-time hybrid search over the materialized KG — the re-expression
  * of the reference's 4-lane search (`graphiti_core/search/search.py:
  * 68-182`: edges / nodes / episodes / communities in parallel, per-lane
  * methods bm25 | cosine | bfs, per-lane reranker) and of the HF driver's
  * weighted hybrid engine (`graphiti_hf/search/hybrid_search.py`).
  *
  * Constants mirror the reference: limit 10, prefetch 2×limit per method
  * (`search.py:205`), sim_min_score 0.6 (`search_utils.py:69`), BFS depth
  * ≤ 3 (`search_utils.py:71`), RRF/MMR as in Rerank.
  */
final case class KgSearchConfig(
    limit: Int = 10,
    reranker: String = "rrf", // rrf | mmr | node_distance | episode_mentions
    simMinScore: Double = 0.6,
    bfsMaxDepth: Int = 3,
    mmrLambda: Double = 0.5,
    // probe the edge_ann signature buckets instead of exact-scanning the
    // corpus in the cosine lane (the 100 TB path: ~1/256 of the corpus per
    // query; approximate — same-bucket candidates only)
    annLsh: Boolean = false,
    // per-method enables (configure_semantic/keyword/graph_search,
    // advanced_config.py:258-357): a disabled lane neither retrieves nor
    // joins the RRF fusion; at least one lane must stay enabled
    keywordLane: Boolean = true,
    semanticLane: Boolean = true,
    graphLane: Boolean = true,
)

final case class SearchResults(
    edges: DataFrame,
    nodes: DataFrame,
    episodes: DataFrame,
    communities: Option[DataFrame],
)

final class KgSearch(store: SnapshotStore) {

  import SearchFilters.Filters

  private val PrefetchFactor = 2

  /** Scope predicate applied to every lane BEFORE ranking: group_ids
    * partition filter (the reference filters every search by group_ids —
    * search.py:87-108, huggingface_driver.py:535-554) AND the SearchFilters
    * CNF DSL (search_filters.py:26-123). Both reach the parquet scan as
    * pushed-down predicates.
    */
  private def scoped(df: DataFrame, groupIds: Seq[String], filters: Filters): DataFrame = {
    val g =
      if (groupIds.isEmpty || !df.columns.contains("group_id")) lit(true)
      else col("group_id").isin(groupIds: _*)
    df.filter(g && SearchFilters.toPredicate(filters, df.columns))
  }

  private def queryEmbedding(query: String): Column = {
    val v = Embedder.embed(query)
    array(v.map(x => lit(x.toDouble)): _*)
  }

  private def queryTerms(query: String): Seq[String] =
    query.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct.toSeq

  /** BM25 for one lane: when the precomputed inverted index exists
    * (SearchIndexes), probe ONLY the query terms' posting-list buckets and
    * inject the stored corpus stats — zero corpus re-tokenization per
    * query; scores are corpus-global and results post-filtered to the
    * scoped frame (the reference's prebuilt-BM25Okapi semantics,
    * hybrid_search.py:108-122). Falls back to on-the-fly scoring over the
    * scoped frame when no index is committed.
    */
  private def bm25Lane(table: String, scoped: DataFrame, textCol: String, query: String): DataFrame = {
    val terms = queryTerms(query)
    if (store.exists(s"${table}_postings") && store.exists(s"${table}_bm25stats")) {
      val spark = scoped.sparkSession
      import spark.implicits._
      val stats = store.load(s"${table}_bm25stats").collect()(0)
      val nDocs = stats.getAs[Long]("n_docs")
      val avgdl = if (nDocs == 0) 1.0 else stats.getAs[Long]("total_dl").toDouble / nDocs
      // reconciled base ⊎ delta-log view; df recounted over the live list
      val probed = SearchIndexes.postingsForTerms(store, table, terms.toDF("term"))
      Bm25
        .scoreIndexed(probed, nDocs, avgdl, terms)
        .join(scoped.select(col("uuid").as("id")), Seq("id"), "left_semi")
    } else Bm25.score(scoped, "uuid", textCol, terms)
  }

  /** Rank column helper: 1-based rank by score desc, id asc. Top-n is
    * taken with distributed TakeOrdered (orderBy + limit) FIRST; the
    * unpartitioned row_number window then runs over ≤ n rows only (a
    * global window over the full lane would single-partition it at scale).
    */
  private def ranked(df: DataFrame, idCol: String, scoreCol: String, n: Int): DataFrame = {
    val top = df.orderBy(col(scoreCol).desc, col(idCol)).limit(n)
    // constant-but-non-foldable partition key: lit(0) would be folded out
    // of the partition spec, leaving WindowExec's "moving all data to a
    // single partition" path (fine over ≤ n rows, but the warning hides
    // real global windows elsewhere)
    val w = Window.partitionBy(pmod(xxhash64(col(idCol)), lit(1))).orderBy(col(scoreCol).desc, col(idCol))
    top.withColumn("rank", row_number().over(w))
      .select(col(idCol).as("id"), col("rank"))
  }

  /** Edge (fact) lane: BM25 over fact text ∪ cosine over fact embeddings
    * ∪ BFS proximity from an optional origin node, fused with RRF,
    * optional point-in-time filter.
    */
  def searchEdges(
      query: String,
      originNode: Option[String] = None,
      asOf: Option[Timestamp] = None,
      config: KgSearchConfig = KgSearchConfig(),
      groupIds: Seq[String] = Nil,
      filters: Filters = Filters(),
  ): DataFrame = {
    val prefetch = config.limit * PrefetchFactor
    val all = scoped(store.load("edges"), groupIds, filters)
    val edges = asOf.map(t => Invalidation.validAt(all, t)).getOrElse(all)

    val lanes = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    // bm25 lane (indexed probe when SearchIndexes are committed)
    if (config.keywordLane) {
      val bm = bm25Lane("edges", edges, "fact", query)
      lanes += ranked(bm, "id", "score", prefetch)
    }
    // cosine lane (min-score 0.6 as the reference's sim_min_score); with
    // annLsh: probe only the query's signature bucket of edge_ann
    if (config.semanticLane) {
      val cosBase =
        if (config.annLsh && store.exists("edge_ann")) {
          val spark = edges.sparkSession
          import spark.implicits._
          val qdf = Seq((0L, Embedder.embed(query).toSeq)).toDF("qid", "qv")
          // probe signatures at the index's configured width (+ optional
          // multi-probe low-margin bit flips)
          val qsigs = qdf.select(
            explode(
              graft.sim.Ann.probeSignaturesCol(col("qv"), SearchIndexes.annPlanes, SearchIndexes.annProbes),
            ).as("sig"),
          )
          SearchIndexes
            .annForSigs(store, qsigs)
            .join(edges.select(col("uuid")), Seq("uuid"), "left_semi")
            .withColumn("score", Vectors.cosine(col("v"), queryEmbedding(query)))
        } else
          edges.withColumn("score", Vectors.cosine(col("fact_embedding"), queryEmbedding(query)))
      val cos = cosBase
        .filter(col("score") >= config.simMinScore)
        .select(col("uuid"), col("score"))
      lanes += ranked(cos, "uuid", "score", prefetch)
    }
    // bfs lane: edges whose source is within depth k of the origin,
    // scored 1/(1+dist)
    if (config.graphLane) originNode.foreach { origin =>
      val spark = edges.sparkSession
      import spark.implicits._
      // with a committed graph_adj index each BFS superstep probes only
      // the src buckets its frontier hashes into (work ∝ frontier); the
      // full-relation join is the fallback. The index covers the WHOLE
      // edge table, so it only answers unscoped searches — a scoped lane
      // must traverse the scoped relation.
      val unscoped = groupIds.isEmpty && filters == Filters() && asOf.isEmpty
      val dists =
        if (unscoped && store.exists("graph_adj"))
          GraphOps.bfsIndexed(
            frontier => SearchIndexes.adjacencyForKeys(store, frontier).select(col("src"), col("dst")),
            Seq(origin).toDF("node"),
            config.bfsMaxDepth,
          )
        else {
          val adj = edges.select(col("source_uuid").as("src"), col("target_uuid").as("dst"))
          GraphOps.bfs(GraphOps.undirect(adj), Seq(origin).toDF("node"), config.bfsMaxDepth)
        }
      val prox = edges
        .join(dists.withColumnRenamed("node", "source_uuid"), Seq("source_uuid"))
        .withColumn("score", lit(1.0) / (lit(1.0) + col("dist")))
        .select(col("uuid"), col("score"))
      lanes += ranked(prox, "uuid", "score", prefetch)
    }

    require(
      lanes.nonEmpty,
      "every retrieval lane is disabled for this call (keyword/semantic off and no graph origin)",
    )
    val fused = Rerank.rrf(lanes.toSeq).withColumnRenamed("rrf_score", "score")
    val top = applyReranker(fused, edges, config, query, originNode)
    top
      .join(edges, top("id") === edges("uuid"))
      .select(
        col("uuid"), col("source_uuid"), col("target_uuid"), col("name"),
        col("fact"), col("valid_at"), col("invalid_at"), col("score"),
      )
      .orderBy(col("score").desc, col("uuid"))
  }

  /** Node lane: BM25 over names ∪ cosine over name embeddings. */
  def searchNodes(
      query: String,
      config: KgSearchConfig = KgSearchConfig(),
      groupIds: Seq[String] = Nil,
      filters: Filters = Filters(),
  ): DataFrame = {
    val prefetch = config.limit * PrefetchFactor
    val nodes = scoped(store.load("nodes"), groupIds, filters)
    val lanes = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    if (config.keywordLane)
      lanes += ranked(bm25Lane("nodes", nodes, "name", query), "id", "score", prefetch)
    if (config.semanticLane) {
      val cos = nodes
        .withColumn("score", Vectors.cosine(col("name_embedding"), queryEmbedding(query)))
        .filter(col("score") >= config.simMinScore)
        .select(col("uuid"), col("score"))
      lanes += ranked(cos, "uuid", "score", prefetch)
    }
    require(lanes.nonEmpty, "node search needs the keyword or the semantic lane enabled")
    val fused = Rerank
      .rrf(lanes.toSeq)
      .withColumnRenamed("rrf_score", "score")
      .orderBy(col("score").desc, col("id"))
      .limit(config.limit)
    fused
      .join(nodes, fused("id") === nodes("uuid"))
      .select(col("uuid"), col("name"), col("labels"), col("score"))
      .orderBy(col("score").desc, col("uuid"))
  }

  /** Episode lane: BM25 over episode content (search.py:418-464). */
  def searchEpisodes(
      query: String,
      config: KgSearchConfig = KgSearchConfig(),
      groupIds: Seq[String] = Nil,
  ): DataFrame = {
    val episodes = scoped(store.load("episodes"), groupIds, Filters())
    val bm = bm25Lane("episodes", episodes, "content", query)
    val top = ranked(bm, "id", "score", config.limit)
    top
      .join(episodes, top("id") === episodes("uuid"))
      // full episodic row fields the reference returns (EpisodicNode objects,
      // search.py:148-158) — content/source_description feed ContextString
      .select(col("uuid"), col("name"), col("content"), col("source_description"), col("valid_at"), col("rank"))
      .orderBy(col("rank"))
  }

  /** Community lane (search.py:467-518); None if communities not built. */
  def searchCommunities(
      query: String,
      config: KgSearchConfig = KgSearchConfig(),
      groupIds: Seq[String] = Nil,
  ): Option[DataFrame] =
    if (!store.exists("communities")) None
    else {
      val c = scoped(store.load("communities"), groupIds, Filters())
      val bm = bm25Lane("communities", c, "summary", query)
      val top = ranked(bm, "id", "score", config.limit)
      Some(
        top
          .join(c, top("id") === c("uuid"))
          .select(col("uuid"), col("name"), col("summary"), col("rank"))
          .orderBy(col("rank")),
      )
    }

  /** All four lanes (the reference's combined search recipes). */
  def search(
      query: String,
      originNode: Option[String] = None,
      asOf: Option[Timestamp] = None,
      config: KgSearchConfig = KgSearchConfig(),
      groupIds: Seq[String] = Nil,
      filters: Filters = Filters(),
  ): SearchResults =
    SearchResults(
      edges = searchEdges(query, originNode, asOf, config, groupIds, filters),
      nodes = searchNodes(query, config, groupIds, filters),
      episodes = searchEpisodes(query, config, groupIds),
      communities = searchCommunities(query, config, groupIds),
    )

  private def applyReranker(
      fused: DataFrame,
      edges: DataFrame,
      config: KgSearchConfig,
      lastQuery: String,
      originNode: Option[String] = None,
  ): DataFrame =
    config.reranker match {
      case "episode_mentions" =>
        // reorder by number of supporting episodes (search_utils.py:1939-1969)
        val mentions = edges.select(col("uuid").as("id"), size(col("episodes")).cast("double").as("score"))
        fused
          .drop("score")
          .join(mentions, Seq("id"))
          .orderBy(col("score").desc, col("id"))
          .limit(config.limit)
      case "mmr" =>
        val spark = fused.sparkSession
        import spark.implicits._
        val cands = fused
          .join(edges.select(col("uuid").as("id"), col("fact_embedding")), Seq("id"))
          .orderBy(col("score").desc, col("id"))
          .limit(config.limit * PrefetchFactor * 2)
          .select(col("id"), col("score"), transform(col("fact_embedding"), _.cast("double")).as("emb"))
          .as[(String, Double, Array[Double])]
          .collect()
        // map string ids to stable longs for the generic MMR kernel
        val idx = cands.map(_._1).zipWithIndex.toMap
        val back = idx.map(_.swap)
        val picked = Rerank.mmr(cands.map(c => (idx(c._1).toLong, c._2, c._3)).toSeq, config.limit, config.mmrLambda)
        picked.map { case (i, s) => (back(i.toInt), s) }.toDF("id", "score")
      case "cross_encoder" =>
        // pluggable scorer slot (reference: LLM cross-encoder client);
        // deterministic stand-in = query-token overlap ratio on the fact
        val qTokens = queryTerms(lastQuery)
        val overlap = edges.select(
          col("uuid").as("id"),
          (size(array_intersect(split(lower(col("fact")), " "), array(qTokens.map(lit): _*)))
            .cast("double") / lit(math.max(qTokens.size, 1))).as("score"),
        )
        fused
          .drop("score")
          .join(overlap, Seq("id"))
          .orderBy(col("score").desc, col("id"))
          .limit(config.limit)
      case "node_distance" =>
        // reorder by BFS distance from the origin node (node_distance
        // reranker, search_utils.py:1885-1936): score = 1/(1+dist) of the
        // edge's source endpoint; unreachable edges keep dist = ∞ → 0
        val origin = originNode.getOrElse(
          sys.error("node_distance reranker requires an originNode (search_utils.py:1894)"),
        )
        val spark = edges.sparkSession
        import spark.implicits._
        val adj = edges.select(col("source_uuid").as("src"), col("target_uuid").as("dst"))
        val dists = GraphOps
          .bfs(GraphOps.undirect(adj), Seq(origin).toDF("node"), config.bfsMaxDepth)
          .withColumnRenamed("node", "src_node")
        val scoredE = edges
          .join(dists, edges("source_uuid") === dists("src_node"), "left")
          .select(col("uuid").as("id"), (lit(1.0) / (lit(1.0) + coalesce(col("dist"), lit(1e9)))).as("score"))
        fused
          .drop("score")
          .join(scoredE, Seq("id"))
          .orderBy(col("score").desc, col("id"))
          .limit(config.limit)
      case "rrf" => fused.orderBy(col("score").desc, col("id")).limit(config.limit)
      case other =>
        // fail fast: a typo silently falling through to RRF would report
        // results under the wrong reranker
        sys.error(s"unknown reranker: $other (rrf|mmr|node_distance|episode_mentions|cross_encoder)")
    }
}
