package graft.search

/** Search-configuration recipes — the reference's
  * `search_config_recipes.py:34-223` as config case objects. Each pins the
  * reranker (and inherits limit 10 / prefetch 2× / sim_min_score 0.6 /
  * BFS depth 3 from [[KgSearchConfig]] defaults).
  */
object Recipes {
  val CombinedHybridSearchRrf: KgSearchConfig = KgSearchConfig(reranker = "rrf")
  val CombinedHybridSearchMmr: KgSearchConfig = KgSearchConfig(reranker = "mmr")
  val CombinedHybridSearchCrossEncoder: KgSearchConfig = KgSearchConfig(reranker = "cross_encoder")
  val EdgeHybridSearchRrf: KgSearchConfig = KgSearchConfig(reranker = "rrf")
  val EdgeHybridSearchNodeDistance: KgSearchConfig = KgSearchConfig(reranker = "node_distance")
  val EdgeHybridSearchEpisodeMentions: KgSearchConfig = KgSearchConfig(reranker = "episode_mentions")
  val NodeHybridSearchRrf: KgSearchConfig = KgSearchConfig(reranker = "rrf")
  val NodeHybridSearchMmr: KgSearchConfig = KgSearchConfig(reranker = "mmr")
  val CommunityHybridSearchRrf: KgSearchConfig = KgSearchConfig(reranker = "rrf")
  val CommunityHybridSearchMmr: KgSearchConfig = KgSearchConfig(reranker = "mmr")
}
