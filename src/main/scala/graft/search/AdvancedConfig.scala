package graft.search

import java.sql.Timestamp

/** Fluent advanced-search configuration — the counterpart of the
  * reference's `AdvancedSearchConfig` builder
  * (`graphiti_hf/search/advanced_config.py:187-720`): per-method toggles
  * and thresholds, fusion weights, ranking strategy, depth, temporal
  * filters, type/group filters, and a `validate()` that returns the list
  * of config problems. Pure configuration (like the reference and like
  * `Recipes`) — `toKgSearch` lowers it onto the executable
  * [[KgSearchConfig]] + [[SearchFilters.Filters]] pair.
  */
final case class AdvancedConfig(
    // per-method enables + thresholds (configure_semantic/keyword/graph_search)
    semanticEnabled: Boolean = true,
    semanticMinScore: Double = 0.6,
    keywordEnabled: Boolean = true,
    graphEnabled: Boolean = true,
    graphMaxDepth: Int = 3,
    // fusion weights (set_search_weights; hybrid 0.4/0.3/0.3 defaults)
    weights: Map[String, Double] = Map("semantic" -> 0.4, "keyword" -> 0.3, "graph" -> 0.3),
    // ranking (set_result_ranking): rrf | mmr | node_distance | episode_mentions | cross_encoder
    ranking: String = "rrf",
    mmrLambda: Double = 0.5,
    limit: Int = 10,
    // temporal filters (set_temporal_filters)
    validAfter: Option[Timestamp] = None,
    validBefore: Option[Timestamp] = None,
    asOf: Option[Timestamp] = None,
    // type/group filters (set_type_filters / set_group_filters)
    allowedTypes: Seq[String] = Nil,
    groupIds: Seq[String] = Nil,
    // scale knobs (BatchProcessing/Parallel/Index configs)
    useAnnIndex: Boolean = false,
) {

  def withSemantic(enabled: Boolean, minScore: Double = semanticMinScore): AdvancedConfig =
    copy(semanticEnabled = enabled, semanticMinScore = minScore)

  def withKeyword(enabled: Boolean): AdvancedConfig = copy(keywordEnabled = enabled)

  def withGraph(enabled: Boolean, maxDepth: Int = graphMaxDepth): AdvancedConfig =
    copy(graphEnabled = enabled, graphMaxDepth = maxDepth)

  def withWeights(w: Map[String, Double]): AdvancedConfig = copy(weights = w)

  def withRanking(strategy: String): AdvancedConfig = copy(ranking = strategy)

  def withLimit(n: Int): AdvancedConfig = copy(limit = n)

  def withTemporal(
      validAfter: Option[Timestamp] = None,
      validBefore: Option[Timestamp] = None,
      asOf: Option[Timestamp] = None,
  ): AdvancedConfig = copy(validAfter = validAfter, validBefore = validBefore, asOf = asOf)

  def withTypes(types: Seq[String]): AdvancedConfig = copy(allowedTypes = types)

  def withGroups(groups: Seq[String]): AdvancedConfig = copy(groupIds = groups)

  /** Config problems, empty when valid (advanced_config.py:690-720). */
  def validate(): Seq[String] = {
    val errs = scala.collection.mutable.ArrayBuffer.empty[String]
    if (!semanticEnabled && !keywordEnabled && !graphEnabled)
      errs += "at least one search method must be enabled"
    if (semanticMinScore < 0 || semanticMinScore > 1)
      errs += s"semanticMinScore must be in [0,1], got $semanticMinScore"
    if (graphMaxDepth < 1) errs += s"graphMaxDepth must be >= 1, got $graphMaxDepth"
    if (limit < 1) errs += s"limit must be >= 1, got $limit"
    val wSum = weights.values.sum
    if (weights.values.exists(_ < 0)) errs += "weights must be non-negative"
    else if (math.abs(wSum - 1.0) > 1e-9) errs += f"weights must sum to 1, got $wSum%.4f"
    if (!Set("rrf", "mmr", "node_distance", "episode_mentions", "cross_encoder").contains(ranking))
      errs += s"unknown ranking strategy: $ranking"
    if (mmrLambda < 0 || mmrLambda > 1) errs += s"mmrLambda must be in [0,1], got $mmrLambda"
    errs.toSeq
  }

  /** Lower onto the executable search parameters — EVERYTHING configured
    * here reaches the search call: lane enables become KgSearchConfig lane
    * toggles, groupIds/asOf ride alongside (KgSearch takes them as
    * separate parameters), temporal bounds and allowedTypes become the
    * Filters CNF (allowedTypes = entity labels; label-less lanes skip the
    * part via the schema-aware predicate). Throws on invalid.
    */
  def toKgSearch: AdvancedConfig.Lowered = {
    val problems = validate()
    require(problems.isEmpty, s"invalid AdvancedConfig: ${problems.mkString("; ")}")
    import SearchFilters._
    val validAtCnf =
      Seq(
        validAfter.map(t => Seq(DateFilter("valid_at", Gte, Some(t)))),
        validBefore.map(t => Seq(DateFilter("valid_at", Lte, Some(t)))),
      ).flatten
    AdvancedConfig.Lowered(
      config = KgSearchConfig(
        limit = limit,
        reranker = ranking,
        simMinScore = semanticMinScore,
        bfsMaxDepth = graphMaxDepth,
        mmrLambda = mmrLambda,
        annLsh = useAnnIndex,
        keywordLane = keywordEnabled,
        semanticLane = semanticEnabled,
        graphLane = graphEnabled,
      ),
      filters = Filters(validAt = validAtCnf, nodeLabels = allowedTypes),
      groupIds = groupIds,
      asOf = asOf,
    )
  }

  /** Lower onto the weighted hybrid engine (the integrator's
    * apply-to-hybrid path, integration.py:84-180): the fusion weights —
    * which rank-fusion KgSearch deliberately has no use for — plus the
    * temporal instant and the ANN toggle. A disabled lane is a zero
    * weight.
    */
  def toHybrid: HybridSearch.HybridConfig = {
    val problems = validate()
    require(problems.isEmpty, s"invalid AdvancedConfig: ${problems.mkString("; ")}")
    HybridSearch.HybridConfig(
      semanticWeight = if (semanticEnabled) weights.getOrElse("semantic", 0.0) else 0.0,
      keywordWeight = if (keywordEnabled) weights.getOrElse("keyword", 0.0) else 0.0,
      graphWeight = if (graphEnabled) weights.getOrElse("graph", 0.0) else 0.0,
      semanticThreshold = semanticMinScore,
      graphDistanceCutoff = graphMaxDepth,
      limit = limit,
      temporalFilter = asOf,
      annLsh = useAnnIndex,
    )
  }

  /** Run a four-lane search under this config — the lowering applied, so
    * group scoping, as-of, lane toggles and filters all take effect.
    */
  def run(searcher: KgSearch, query: String, originNode: Option[String] = None): SearchResults = {
    val l = toKgSearch
    searcher.search(query, originNode, l.asOf, l.config, l.groupIds, l.filters)
  }
}

/** Preset factories — `graphiti_hf/search/integration.py:392-529`. GPU /
  * HNSW / batch-size knobs there tune the in-process FAISS+pandas engine;
  * the Spark counterparts are the lane weights, thresholds, depths and the
  * ANN-index toggle (batching is Spark's job).
  */
object AdvancedConfig {

  /** The executable lowering of an [[AdvancedConfig]] — every configured
    * dimension has a carrier: `config` (limits, reranker, thresholds, lane
    * toggles, ANN), `filters` (temporal CNF + entity labels), `groupIds`
    * and `asOf` (KgSearch's separate scoping parameters).
    */
  final case class Lowered(
      config: KgSearchConfig,
      filters: SearchFilters.Filters,
      groupIds: Seq[String],
      asOf: Option[java.sql.Timestamp],
  )

  /** create_semantic_search_config (integration.py:392-418). */
  def semanticOptimized: AdvancedConfig =
    AdvancedConfig(
      semanticMinScore = 0.7,
      weights = Map("semantic" -> 0.7, "keyword" -> 0.2, "graph" -> 0.1),
      limit = 20,
      useAnnIndex = true,
    )

  /** create_graph_search_config (integration.py:421-446). */
  def graphOptimized: AdvancedConfig =
    AdvancedConfig(
      graphMaxDepth = 8,
      weights = Map("semantic" -> 0.2, "keyword" -> 0.1, "graph" -> 0.7),
    )

  /** create_hybrid_search_config (integration.py:449-475). */
  def hybridBalanced: AdvancedConfig =
    AdvancedConfig(
      weights = Map("semantic" -> 0.4, "keyword" -> 0.3, "graph" -> 0.3),
      limit = 15,
    )

  /** create_domain_specific_config (integration.py:478-529). */
  def domainSpecific(domain: String): AdvancedConfig = domain match {
    case "technical" => AdvancedConfig(semanticMinScore = 0.8, limit = 25, weights = Map("semantic" -> 0.8, "keyword" -> 0.2, "graph" -> 0.0), useAnnIndex = true)
    case "business" => AdvancedConfig(weights = Map("semantic" -> 0.2, "keyword" -> 0.6, "graph" -> 0.2))
    case "personal" => AdvancedConfig(graphMaxDepth = 10, weights = Map("semantic" -> 0.1, "keyword" -> 0.1, "graph" -> 0.8))
    case other => throw new IllegalArgumentException(s"unknown domain: $other (technical|business|personal)")
  }
}
