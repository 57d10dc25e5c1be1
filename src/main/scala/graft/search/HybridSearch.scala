package graft.search

import java.sql.Timestamp

import graft.graph.GraphOps
import graft.io.SnapshotStore
import graft.kg.Embedder
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weighted hybrid search — the HF driver's `HybridSearchEngine`
  * (`graphiti_hf/search/hybrid_search.py:85-443`) re-expressed as one
  * declarative plan per REQUEST, not per query:
  *
  *   - semantic lane: cosine(query embedding, fact_embedding), top 3×limit
  *     (`_semantic_search`, hybrid_search.py:160-203)
  *   - keyword lane: BM25 over fact text, corpus-global stats (prebuilt
  *     BM25Okapi analog: the committed inverted index when present), top
  *     3×limit (`_keyword_search`, :205-252)
  *   - graph lane: 1/(1 + min endpoint BFS distance from the center node),
  *     cutoff 5, unreachable → 0 (`_graph_distance_ranking`, :254-320)
  *   - per-lane min-max normalization over the RETRIEVED list, degenerate
  *     (max == min) lanes normalize to 1.0 (`_normalize_scores`, :395-415)
  *   - fusion: w_sem·sem + w_kw·kw + w_graph·graph over the union of lane
  *     candidates, absent-lane scores 0 (`_combine_rankings`, :322-393)
  *
  * Deliberate deviations, both documented here because the reference
  * behavior looks unintended: (1) the temporal / edge-type filters are
  * applied to EVERY lane (the reference skips them in the semantic lane,
  * :160-203, so filtered-out edges can resurface through that lane);
  * (2) keyword top-k is taken over the FILTERED corpus (the reference
  * ranks first and post-filters, silently returning fewer than k).
  * Ties everywhere break by uuid ascending for determinism.
  *
  * `batchHybridSearch` is the scale story (`batch_hybrid_search`,
  * hybrid_search.py:417-442 — a per-query asyncio loop over one pandas
  * frame): all queries run as ONE Spark job. Query terms are broadcast
  * into a single corpus scan (or one probe of the posting-list buckets),
  * per-query top-k / normalization / fusion are windows PARTITIONED BY
  * query_id — adding queries adds partitions, never passes over the data.
  */
object HybridSearch {

  /** `HybridSearchConfig` (hybrid_search.py:64-79). */
  final case class HybridConfig(
      semanticWeight: Double = 0.4,
      keywordWeight: Double = 0.3,
      graphWeight: Double = 0.3,
      semanticThreshold: Double = 0.0,
      graphDistanceCutoff: Int = 5,
      limit: Int = 10,
      centerNode: Option[String] = None,
      temporalFilter: Option[Timestamp] = None,
      edgeTypes: Seq[String] = Nil,
      // probe edge_ann signature buckets in the semantic lane instead of
      // brute-force scoring (approximate; ~1/256 of the corpus per query)
      annLsh: Boolean = false,
  )

  private val LanePrefetch = 3 // result_limit * 3 per lane (hybrid_search.py:142-145)

  private def terms(query: String): Seq[String] =
    query.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct.toSeq

  /** The reference's candidate filters (hybrid_search.py:236-244): drop an
    * edge only when it was valid AND already invalidated at the filter
    * instant; restrict to the named relation types when given.
    */
  private def filtered(edges: DataFrame, config: HybridConfig): DataFrame = {
    val t = config.temporalFilter
      .map { ts =>
        not(
          col("valid_at").isNotNull && col("valid_at") <= lit(ts) &&
            col("invalid_at").isNotNull && col("invalid_at") <= lit(ts),
        )
      }
      .getOrElse(lit(true))
    val e =
      if (config.edgeTypes.isEmpty) lit(true)
      else col("name").isin(config.edgeTypes: _*)
    edges.filter(t && e)
  }

  /** Per-query top-n by score desc (ties id asc): a window partitioned by
    * query_id — each query ranks inside its own partition.
    */
  private def topNPerQuery(df: DataFrame, n: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("id"))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= n).drop("__rn")
  }

  /** Per-query min-max over the retrieved list; a degenerate lane
    * (max == min) normalizes to 1.0 (hybrid_search.py:395-415).
    */
  private def minMaxPerQuery(df: DataFrame, raw: String, out: String): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
    val mn = min(col(raw)).over(w)
    val mx = max(col(raw)).over(w)
    df.withColumn(out, when(mx === mn, lit(1.0)).otherwise((col(raw) - mn) / (mx - mn))).drop(raw)
  }

  /** One query — a batch of one (hybrid_search.py:124-158). */
  def hybridSearch(store: SnapshotStore, query: String, config: HybridConfig = HybridConfig()): DataFrame =
    batchHybridSearch(store, Seq((0L, query)), config).drop("query_id")

  /** `search_with_center` (huggingface_driver.py:1137-1191): center-node
    * hybrid search, failing fast when the center does not exist.
    */
  def searchWithCenter(
      store: SnapshotStore,
      query: String,
      centerNode: String,
      config: HybridConfig = HybridConfig(),
  ): DataFrame = {
    val exists = store.load("nodes").filter(col("uuid") === lit(centerNode)).limit(1).count() == 1
    require(exists, s"Center node $centerNode not found in the graph")
    hybridSearch(store, query, config.copy(centerNode = Some(centerNode)))
  }

  /** Every query in ONE distributed job. `queries` is the request-sized
    * (query_id, query text) list (the reference takes List[str]); the
    * corpus-sized side stays fully distributed. Returns one row per
    * (query_id, edge) hit: (query_id, id, combined_score, semantic_score,
    * keyword_score, graph_score, source_uuid, target_uuid, name, fact).
    */
  def batchHybridSearch(
      store: SnapshotStore,
      queries: Seq[(Long, String)],
      config: HybridConfig = HybridConfig(),
  ): DataFrame = {
    require(queries.nonEmpty, "batchHybridSearch needs at least one query")
    val spark = store.spark
    import spark.implicits._

    val edges = store.load("edges")
    val cands = filtered(edges, config)
    val prefetch = config.limit * LanePrefetch

    // A zero-weight text lane cannot move any ranking, but running it
    // anyway (a) costs a full lane scan / postings probe per batch and
    // (b) injects candidates whose only score is the OTHER lane's fill-in
    // 0.0 — zero-score rows that tie-fill the limit below every real hit.
    // Skip such lanes — UNLESS the graph lane is active: the graph lane
    // scores candidates, it does not retrieve them (hybrid_search.py:
    // 312-318 scores the retrieved edge set), so every text lane stays on
    // as a candidate generator whenever graph_weight can rank (a
    // semantically-close edge touching the center node must remain
    // reachable even with semantic_weight = 0). Same when BOTH text
    // weights are 0 (pure graph rerank).
    val graphActive = config.graphWeight != 0.0 && config.centerNode.isDefined
    val textRetrieval = config.semanticWeight != 0.0 || config.keywordWeight != 0.0
    val runSem = config.semanticWeight != 0.0 || graphActive || !textRetrieval
    val runKw = config.keywordWeight != 0.0 || graphActive || !textRetrieval

    // ---- semantic lane: embeddings of all queries broadcast against the
    // candidate frame (or against their edge_ann signature buckets)
    val qEmb = queries.map { case (qid, q) => (qid, Embedder.embed(q).map(_.toDouble).toSeq) }
    val qEmbDf = qEmb.toDF("query_id", "qv")
    val semBase =
      if (!runSem) Seq.empty[(Long, String, Double)].toDF("query_id", "id", "score")
      else if (config.annLsh && store.exists("edge_ann")) {
        // probe signatures at the index's configured width (+ optional
        // multi-probe low-margin bit flips)
        val qSigs = qEmbDf.select(
          col("query_id"),
          explode(
            graft.sim.Ann.probeSignaturesCol(col("qv"), SearchIndexes.annPlanes, SearchIndexes.annProbes),
          ).as("sig"),
        )
        SearchIndexes
          .annForSigs(store, qSigs.select(col("sig")).distinct())
          .join(broadcast(qSigs), Seq("sig"))
          .join(cands.select(col("uuid")), Seq("uuid"), "left_semi")
          .join(broadcast(qEmbDf), Seq("query_id"))
          .select(col("query_id"), col("uuid").as("id"), Vectors.cosine(col("v"), col("qv")).as("score"))
      } else
        cands
          .crossJoin(broadcast(qEmbDf))
          .select(col("query_id"), col("uuid").as("id"), Vectors.cosine(col("fact_embedding"), col("qv")).as("score"))
    val sem = minMaxPerQuery(
      topNPerQuery(semBase.filter(col("score") >= config.semanticThreshold), prefetch)
        .withColumnRenamed("score", "sem_raw"),
      "sem_raw",
      "semantic_score",
    )

    // ---- keyword lane: BM25 with corpus-global stats (prebuilt-index
    // semantics); ONE postings probe / corpus scan covers every query
    val qTerms = queries.flatMap { case (qid, q) => terms(q).map(t => (qid, t)) }
    val kwScored =
      if (!runKw || qTerms.isEmpty) Seq.empty[(Long, String, Double)].toDF("query_id", "id", "score")
      else {
        val qtDf = qTerms.toDF("query_id", "term")
        val base =
          if (store.exists("edges_postings") && store.exists("edges_bm25stats")) {
            val stats = store.load("edges_bm25stats").collect()(0)
            val nDocs = stats.getAs[Long]("n_docs")
            val avgdl = if (nDocs == 0) 1.0 else stats.getAs[Long]("total_dl").toDouble / nDocs
            val probed = SearchIndexes.postingsForTerms(store, "edges", qtDf.select(col("term")).distinct())
            Bm25.scoreIndexedBatch(probed, nDocs, avgdl, qtDf)
          } else
            Bm25.scoreBatch(edges, "uuid", "fact", qtDf)
        base.join(cands.select(col("uuid").as("id")), Seq("id"), "left_semi")
      }
    val kw = minMaxPerQuery(
      topNPerQuery(kwScored, prefetch).withColumnRenamed("score", "kw_raw"),
      "kw_raw",
      "keyword_score",
    )

    // ---- graph lane: distances from the (request-level) center node,
    // computed once and shared by every query
    val graphScores = config.centerNode.map { center =>
      // when no filter narrows cands (cands == edges) and the committed
      // adjacency index exists, each BFS superstep probes only the src
      // buckets its frontier hashes into (work ∝ frontier, not ∝ corpus —
      // same probe as KgSearch's node_distance lane); a FILTERED lane must
      // traverse the filtered relation, so it falls back to the direct BFS
      val unfiltered = config.temporalFilter.isEmpty && config.edgeTypes.isEmpty
      val dists =
        if (unfiltered && store.exists("graph_adj"))
          GraphOps.bfsIndexed(
            frontier => SearchIndexes.adjacencyForKeys(store, frontier).select(col("src"), col("dst")),
            Seq(center).toDF("node"),
            config.graphDistanceCutoff,
          )
        else {
          val adj = cands.select(col("source_uuid").as("src"), col("target_uuid").as("dst"))
          GraphOps.bfs(GraphOps.undirect(adj), Seq(center).toDF("node"), config.graphDistanceCutoff)
        }
      cands
        .join(dists.withColumnRenamed("node", "source_uuid").withColumnRenamed("dist", "sd"), Seq("source_uuid"), "left")
        .join(dists.withColumnRenamed("node", "target_uuid").withColumnRenamed("dist", "td"), Seq("target_uuid"), "left")
        .select(
          col("uuid").as("id"),
          // min endpoint distance; both endpoints unreachable → 0.0
          // (hybrid_search.py:312-318)
          when(col("sd").isNull && col("td").isNull, lit(0.0))
            .otherwise(lit(1.0) / (lit(1.0) + least(coalesce(col("sd"), col("td")), coalesce(col("td"), col("sd")))))
            .as("graph_raw"),
        )
    }

    // ---- fusion over the union of lane candidates
    val fusedBase = sem
      .join(kw, Seq("query_id", "id"), "full_outer")
      .na.fill(0.0, Seq("semantic_score", "keyword_score"))
    val withGraph = graphScores match {
      case Some(g) =>
        fusedBase
          .join(g, Seq("id"), "left")
          .withColumn("graph_score", coalesce(col("graph_raw"), lit(0.0)))
          .drop("graph_raw")
      case None => fusedBase.withColumn("graph_score", lit(0.0))
    }
    val combined = withGraph.withColumn(
      "combined_score",
      lit(config.semanticWeight) * col("semantic_score") +
        lit(config.keywordWeight) * col("keyword_score") +
        lit(config.graphWeight) * col("graph_score"),
    )
    val w = Window.partitionBy(col("query_id")).orderBy(col("combined_score").desc, col("id"))
    combined
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= config.limit)
      .drop("__rn")
      .join(edges.select(col("uuid").as("id"), col("source_uuid"), col("target_uuid"), col("name"), col("fact")), Seq("id"))
      .select(
        col("query_id"), col("id"), col("combined_score"),
        col("semantic_score"), col("keyword_score"), col("graph_score"),
        col("source_uuid"), col("target_uuid"), col("name"), col("fact"),
      )
      .orderBy(col("query_id"), col("combined_score").desc, col("id"))
  }

  /** `get_hybrid_search_stats` (hybrid_search.py:444-457): one row of
    * engine state — index presence and corpus sizes.
    */
  def stats(store: SnapshotStore): DataFrame = {
    val spark = store.spark
    import spark.implicits._
    val edgeCount = if (store.exists("edges")) store.load("edges").count() else 0L
    val nodeCount = if (store.exists("nodes")) store.load("nodes").count() else 0L
    Seq(
      (
        store.exists("edges_postings") && store.exists("edges_bm25stats"),
        store.exists("edge_ann"),
        edgeCount,
        nodeCount,
      ),
    ).toDF("bm25_index_built", "ann_index_built", "driver_edges_count", "driver_nodes_count")
  }
}
