package graft.dedup

import graft.graph.GraphOps
import graft.search.Vectors
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Configurable weighted deduplication — the distributed analog of the
  * reference's `Deduplicator` (`graphiti_hf/processing/deduplicator.py`):
  * a weighted similarity matrix (name/fact text sim + embedding cosine +
  * attribute overlap + structural boost) over entities or edges, duplicate
  * detection at a configurable threshold, and conflict resolution by
  * strategy (`merge`, `keep_newer`, `keep_older`, `keep_better`,
  * `keep_first`, deduplicator.py:563-597).
  *
  * Deliberate re-expressions for a distributed engine (each disclosed):
  *
  *  - the reference materializes an O(n²) numpy similarity matrix
  *    (deduplicator.py:221-258); here candidates come from recall-exact
  *    blocking (shared name/fact token ∪ exact name ∪ same endpoints) and
  *    only candidates are scored. With the default weights a pair can
  *    reach threshold 0.8 only if the text term is positive — embedding
  *    0.4 + attribute 0.2 (entities) or embedding 0.4 + structural 0.3
  *    (edges) cannot reach 0.8 alone — so token blocking loses nothing.
  *    For configs where the non-text terms alone can cross the threshold,
  *    [[Deduplicator.duplicateEntityPairs]] adds an embedding-LSH block
  *    (hyperplane signatures) plus an attribute-entry block, and edges add
  *    the endpoint block. Corpus-hot block keys are excluded past
  *    [[DeduplicationConfig.hotBlockCap]] (the disclosed recall bound that
  *    keeps candidate generation sub-quadratic at corpus scale).
  *  - text similarity is the deterministic token-set cosine
  *    |A∩B|/√(|A|·|B|) over `lower().split()` tokens, standing in for the
  *    reference's sklearn TF-IDF cosine (deduplicator.py:56-59) — same
  *    contract as every other deterministic stand-in in this engine.
  *  - attribute similarity: mean over common keys of 1.0 if equal else
  *    0.0 (the reference scores unequal strings by nested TF-IDF cosine,
  *    deduplicator.py:367-408 — a refinement of the same [0,1] term).
  *  - the reference's conflict loop is input-ORDER-dependent (pairs are
  *    consumed in row order, deduplicator.py:487-561); row order does not
  *    distribute, so resolution here is per CONNECTED COMPONENT of
  *    duplicate pairs with a deterministic member order
  *    (created_at asc, uuid asc — "original" = earliest), which is also
  *    how the engine's pipeline canonicalizes (Linking.canonicalMap).
  */
final case class DeduplicationConfig(
    similarityThreshold: Double = 0.8,
    nameWeight: Double = 0.6,
    embeddingWeight: Double = 0.4,
    attributeWeight: Double = 0.2,
    conflictResolution: String = "merge",
    // Affordable-pairs budget per block key: a block of b rows emits
    // ~b²/2 candidate pairs, so the row cap below is derived as
    // √(2·budget) — the block size at which ONE key exhausts the budget.
    // Default 2M pairs → cap 2000 rows: a key just under the cap costs a
    // bounded ~2M-pair verify, never the ~5·10⁹ the old absolute cap of
    // 100k rows permitted. Exact-name (`nm:`) and edge-endpoint (`st:`)
    // keys are EXEMPT — their block sizes measure genuine duplicate
    // density, not vocabulary skew. Recall is lost only for pairs whose
    // EVERY shared block key is hot (disclosed approximation; the
    // reference's O(n²) matrix has no analog of this bound because it
    // has no analog of this scale).
    maxPairsPerBlock: Long = 2_000_000L,
    // Explicit row-cap override (opt-up): 0 = derive from
    // maxPairsPerBlock. Callers who accept the quadratic cost of bigger
    // blocks may raise it deliberately.
    hotBlockCap: Int = 0,
) {
  require(
    Set("merge", "keep_newer", "keep_older", "keep_better", "keep_first")(conflictResolution),
    s"unknown conflict_resolution '$conflictResolution'",
  )
  require(maxPairsPerBlock > 0, "maxPairsPerBlock must be positive")

  /** Row cap per block key: explicit override, else √(2·pairs budget). */
  def effectiveHotBlockCap: Int =
    if (hotBlockCap > 0) hotBlockCap
    else math.max(2, math.sqrt(2.0 * maxPairsPerBlock.toDouble).toInt)
}

/** Result of a dedup pass: the resolved table + the reference's stats
  * counters (deduplicator.py:62-68).
  */
final case class DedupResult(
    resolved: DataFrame,
    duplicatesFound: Long,
    itemsDeduplicated: Long,
    conflictsResolved: Long,
)

object Deduplicator {

  /** Structural boost for edges sharing a (source, target) pair
    * (deduplicator.py:351-365).
    */
  val StructuralBoost = 0.3

  private def tokens(c: Column) = array_distinct(split(lower(c), "\\s+"))

  /** Token-set cosine |A∩B|/√(|A|·|B|) — deterministic stand-in for the
    * TF-IDF cosine; 0 when either side is empty.
    */
  def tokenCosine(a: Column, b: Column): Column = {
    val ta = tokens(a)
    val tb = tokens(b)
    when(size(ta) === 0 || size(tb) === 0, lit(0.0)).otherwise(
      size(array_intersect(ta, tb)).cast("double") /
        sqrt(size(ta).cast("double") * size(tb).cast("double")),
    )
  }

  /** Mean over common keys of exact-value agreement
    * (deduplicator.py:367-408); 0 when no keys are shared.
    */
  def attributeSim(a: Column, b: Column): Column = {
    val common = array_intersect(map_keys(a), map_keys(b))
    when(a.isNull || b.isNull || size(common) === 0, lit(0.0)).otherwise(
      aggregate(
        common,
        lit(0.0),
        (acc, k) => acc + when(element_at(a, k) === element_at(b, k), lit(1.0)).otherwise(lit(0.0)),
      ) / size(common).cast("double"),
    )
  }

  /** Entity quality score (deduplicator.py:683-709 — same formula as
    * EpisodeProcessor._calculate_entity_quality): name-word band + label
    * count band + has-embedding + has-attributes.
    */
  def entityQuality(name: Column, labels: Column, embedding: Column, attributes: Column): Column = {
    val words = size(split(name, "\\s+"))
    val nameTerm = when(name.isNotNull && words.between(3, 10), lit(0.3))
      .when(name.isNotNull && length(name) > 0, lit(0.1))
      .otherwise(lit(0.0))
    val labelTerm = when(size(labels).between(2, 5), lit(0.3))
      .when(size(labels) > 0, lit(0.1))
      .otherwise(lit(0.0))
    val embTerm = when(embedding.isNotNull && size(embedding) > 0, lit(0.2)).otherwise(lit(0.0))
    val attrTerm = when(attributes.isNotNull && size(map_keys(attributes)) > 0, lit(0.2)).otherwise(lit(0.0))
    least(nameTerm + labelTerm + embTerm + attrTerm, lit(1.0))
  }

  /** Edge quality score (deduplicator.py:711-733): fact-length band +
    * has-embedding + has-episodes + has-valid_at.
    */
  def edgeQuality(fact: Column, embedding: Column, episodes: Column, validAt: Column): Column = {
    val factTerm = when(fact.isNotNull && length(fact).between(10, 50), lit(0.3))
      .when(fact.isNotNull && length(fact) > 0, lit(0.1))
      .otherwise(lit(0.0))
    val embTerm = when(embedding.isNotNull && size(embedding) > 0, lit(0.3)).otherwise(lit(0.0))
    val epTerm = when(episodes.isNotNull && size(episodes) > 0, lit(0.2)).otherwise(lit(0.0))
    val vTerm = when(validAt.isNotNull, lit(0.2)).otherwise(lit(0.0))
    least(factTerm + embTerm + epTerm + vTerm, lit(1.0))
  }

  /** Embedding-LSH signature + attribute (key, value) block keys of an
    * entity table — the extra blocks used when non-text weights alone can
    * cross the threshold. (uuid, key) with disjoint key namespaces.
    */
  private def entityExtraBlockKeys(nodes: DataFrame): DataFrame = {
    val sig = nodes
      .filter(size(col("name_embedding")) > 0)
      .select(col("uuid"), concat(lit("sig:"), graft.sim.Ann.signatureCol(col("name_embedding"))).as("key"))
    val attrs = nodes
      .select(col("uuid"), explode(coalesce(col("attributes"), map().cast("map<string,string>"))).as(Seq("k", "v")))
      .select(col("uuid"), concat(lit("kv:"), col("k"), lit("="), col("v")).as("key"))
    sig.unionByName(attrs)
  }

  /** Every blocking key of an entity table: name tokens ∪ the exact-name
    * key (`nm:` — survives the hot cap, so identical names ALWAYS pair
    * even when each individual token is corpus-hot) ∪ (gated) the
    * embedding-LSH + attribute-entry extra blocks. Used by candidate
    * generation and by [[deduplicateIncremental]]'s scoping probe, so the
    * two can never disagree on reachability.
    */
  private def entityBlockKeys(nodes: DataFrame, cfg: DeduplicationConfig): DataFrame = {
    val tok = nodes.select(col("uuid"), explode(tokens(col("name"))).as("key"))
    val nm = nodes.select(col("uuid"), concat(lit("nm:"), col("name")).as("key"))
    val named = tok.unionByName(nm)
    // non-text terms alone can cross the threshold: add an embedding
    // block (token-disjoint near-identical vectors; approximate LSH, as
    // disclosed) AND an attribute block — attributeSim > 0 requires a
    // shared (key, value) entry, so blocking on entries is recall-exact
    // for the attribute term (without it, two token-disjoint
    // empty-embedding nodes with identical attributes could cross the
    // threshold yet never become a candidate)
    if (cfg.embeddingWeight + cfg.attributeWeight < cfg.similarityThreshold) named
    else named.unionByName(entityExtraBlockKeys(nodes))
  }

  /** Drop block keys shared by more than `cap` rows (the quadratic-hot-key
    * guard, [[DeduplicationConfig.hotBlockCap]]); exact-name and endpoint
    * keys are exempt — see the config field's doc. The drop is NEVER
    * silent ("no silent caps"): when keys are excluded, the count of
    * dropped keys/rows is reported on stderr so the recall bound is
    * observable — callers for whom mid-hot keys carry real duplicates
    * raise `maxPairsPerBlock`/`hotBlockCap` deliberately.
    */
  private def dropHotKeys(keyed: DataFrame, cap: Int): DataFrame = {
    // lazy checkpoint: the stats collect below is the first action, so one
    // job materializes the hot set AND reports it (was two jobs)
    val hot = keyed
      .groupBy(col("key"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") > cap && !col("key").startsWith("nm:") && !col("key").startsWith("st:"))
      .select(col("key"), col("__df"))
      .localCheckpoint(eager = false)
    val s = hot.agg(count(lit(1)), coalesce(sum(col("__df")), lit(0L))).collect()(0)
    if (s.getLong(0) > 0)
      System.err.println(
        s"[graft.dedup] hot-block guard dropped ${s.getLong(0)} block keys " +
          s"(${s.getLong(1)} row-memberships) past cap=$cap rows/key — " +
          "candidate recall is bounded for pairs whose every shared key is hot; " +
          "raise maxPairsPerBlock/hotBlockCap to trade cost for recall",
      )
    keyed.join(hot.select(col("key")), Seq("key"), "left_anti")
  }

  /** Distinct (u1, u2), u1 < u2, sharing at least one block key. */
  private def pairsFromKeys(keyed: DataFrame): DataFrame = keyed
    .select(col("key"), col("uuid").as("u1"))
    .join(keyed.select(col("key"), col("uuid").as("u2")), Seq("key"))
    .filter(col("u1") < col("u2"))
    .select("u1", "u2")
    .dropDuplicates("u1", "u2")

  /** Candidate duplicate entity pairs with their weighted similarity:
    * (u1, u2, similarity), u1 < u2, similarity ≥ threshold. Blocking =
    * [[entityBlockKeys]] minus hot keys; scoring is decoupled from
    * blocking — the token-cosine numerator |A∩B| counts EVERY shared
    * token (hot ones included), so capped blocks can never silently zero
    * a term. The count comes from an exploded-token aggregate RESTRICTED
    * to the candidate pairs (names tokenize once per ROW; the pair join
    * fans each candidate out by its token count, never by the corpus-hot
    * token's df) — value-identical to per-pair [[tokenCosine]], but a
    * long-name surface (document texts as names) costs |cand| × tokens
    * instead of |cand| re-tokenizations of both full strings (measured
    * 5.4 s → sub-second on the 300-document weighted-dedup fixture).
    */
  def duplicateEntityPairs(nodes: DataFrame, cfg: DeduplicationConfig = DeduplicationConfig()): DataFrame = {
    val base = nodes.select(
      col("uuid"),
      coalesce(col("name_embedding"), array().cast("array<float>")).as("emb"),
      coalesce(col("attributes"), map().cast("map<string,string>")).as("attrs"),
    )
    val toks = nodes.select(col("uuid"), tokens(col("name")).as("toks"))
    val sizes = toks.select(col("uuid"), size(col("toks")).as("n"))
    // the token string never leaves the overlap equi-join below — fold it
    // to a 64-bit xxhash64 (guide §2.3: narrower join keys; same
    // determinism/collision argument as Dedup.ngramJaccardPairs — a
    // collision needs two DISTINCT tokens of one candidate pair sharing a
    // 64-bit hash, P ≈ m²/2^65, and the oracle re-checks exact values)
    val ex = toks.select(col("uuid"), explode(col("toks")).as("tok"))
      .select(col("uuid"), xxhash64(col("tok")).as("tok"))
    // lazy: the caller's single action computes the candidate set once
    // (checkpointed on first materialization) and every downstream join
    // reads the stored partitions — no separate up-front job
    val cand = pairsFromKeys(dropHotKeys(entityBlockKeys(nodes, cfg), cfg.effectiveHotBlockCap))
      .localCheckpoint(eager = false)
    val overlap = cand
      .join(ex.select(col("uuid").as("u1"), col("tok")), Seq("u1"))
      .join(ex.select(col("uuid").as("u2"), col("tok")), Seq("u2", "tok"))
      .groupBy(col("u1"), col("u2"))
      .agg(count(lit(1)).as("c"))
    val nameSim = when(
      col("n1") > 0 && col("n2") > 0,
      coalesce(col("c"), lit(0L)).cast("double") / sqrt(col("n1").cast("double") * col("n2").cast("double")),
    ).otherwise(lit(0.0))
    val score =
      lit(cfg.nameWeight) * nameSim +
        lit(cfg.embeddingWeight) * when(
          size(col("a_emb")) > 0 && size(col("b_emb")) > 0,
          Vectors.cosine(col("a_emb"), col("b_emb")),
        ).otherwise(lit(0.0)) +
        lit(cfg.attributeWeight) * attributeSim(col("a_attrs"), col("b_attrs"))
    cand
      .join(overlap, Seq("u1", "u2"), "left")
      .join(sizes.select(col("uuid").as("u1"), col("n").as("n1")), Seq("u1"))
      .join(sizes.select(col("uuid").as("u2"), col("n").as("n2")), Seq("u2"))
      .join(base.select(col("uuid").as("u1"), col("emb").as("a_emb"), col("attrs").as("a_attrs")), Seq("u1"))
      .join(base.select(col("uuid").as("u2"), col("emb").as("b_emb"), col("attrs").as("b_attrs")), Seq("u2"))
      .withColumn("similarity", round(score, 6))
      .filter(col("similarity") >= lit(cfg.similarityThreshold))
      .select(col("u1"), col("u2"), col("similarity"))
  }

  /** Weighted edge similarity (fact text + fact embedding + structural). */
  private def edgeScore(cfg: DeduplicationConfig): Column =
    lit(cfg.nameWeight) * tokenCosine(col("a_fact"), col("b_fact")) +
      lit(cfg.embeddingWeight) * when(
        col("a_emb").isNotNull && col("b_emb").isNotNull && size(col("a_emb")) > 0 && size(col("b_emb")) > 0,
        Vectors.cosine(col("a_emb"), col("b_emb")),
      ).otherwise(lit(0.0)) +
      when(
        col("a_src") === col("b_src") && col("a_dst") === col("b_dst"),
        lit(StructuralBoost),
      ).otherwise(lit(0.0))

  /** Candidate duplicate edge pairs: blocking = shared PREFIX fact token
    * ∪ same (source, target) endpoints (the structural-boost space,
    * deduplicator.py:351-365) ∪ shared embedding-LSH signature when the
    * embedding weight alone can cross the threshold.
    *
    * The token block uses PREFIX FILTERING (Bayardo, Ma & Srikant,
    * "Scaling Up All Pairs Similarity Search", WWW'07): a pair with
    * different endpoints can reach `threshold` only if its token cosine
    * is ≥ tMin = (θ − w_emb)/w_text, and a pair with cosine ≥ tMin must
    * share a token among each side's FIRST n − ⌈tMin²·n⌉ + 1 tokens in a
    * global rarest-first (df asc) order — recall-EXACT for the bound,
    * while corpus-wide template tokens ("is", "in", "the"), which would
    * otherwise pair every sentence fact with every other (a quadratic
    * candidate set), fall out of every prefix.
    */
  def duplicateEdgePairs(edges: DataFrame, cfg: DeduplicationConfig = DeduplicationConfig()): DataFrame = {
    val base = edges.select(
      col("uuid"),
      col("fact"),
      col("source_uuid").as("src"),
      col("target_uuid").as("dst"),
      coalesce(col("fact_embedding"), array().cast("array<float>")).as("emb"),
    )
    // minimal token cosine a DIFFERENT-endpoint pair needs (same-endpoint
    // pairs are fully covered by the structural block)
    val tMin = (cfg.similarityThreshold - cfg.embeddingWeight) / cfg.nameWeight
    val toksAll = base.select(col("uuid"), explode(tokens(col("fact"))).as("key"))
    val tok =
      if (tMin > 1.0) toksAll.limit(0) // w_text + w_emb < θ: text can never cross
      else if (tMin <= 0.0) toksAll // embedding alone can cross: keep all + LSH block below
      else {
        val dfs = toksAll.groupBy(col("key")).agg(count(lit(1)).as("__df"))
        val w = Window.partitionBy(col("uuid")).orderBy(col("__df").asc, col("key").asc)
        toksAll
          .join(dfs, Seq("key"))
          .withColumn("__rk", row_number().over(w))
          .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("uuid"))))
          .filter(col("__rk") <= col("__n") - ceil(lit(tMin * tMin) * col("__n")) + lit(1))
          .select(col("uuid"), col("key"))
      }
    val structural = base.select(col("uuid"), concat(lit("st:"), col("src"), lit("->"), col("dst")).as("key"))
    val sig =
      if (cfg.embeddingWeight < cfg.similarityThreshold) structural.limit(0)
      else
        base
          .filter(size(col("emb")) > 0)
          .select(col("uuid"), concat(lit("sig:"), graft.sim.Ann.signatureCol(col("emb"))).as("key"))
    val blocks = tok.unionByName(structural).unionByName(sig)
    // the hot cap backstops prefix filtering: a prefix-surviving token can
    // still be corpus-hot when facts are short (n < 10 keeps every token)
    val cand = pairsFromKeys(dropHotKeys(blocks, cfg.effectiveHotBlockCap))
    cand
      .join(
        base.select(col("uuid").as("u1"), col("fact").as("a_fact"), col("src").as("a_src"), col("dst").as("a_dst"), col("emb").as("a_emb")),
        Seq("u1"),
      )
      .join(
        base.select(col("uuid").as("u2"), col("fact").as("b_fact"), col("src").as("b_src"), col("dst").as("b_dst"), col("emb").as("b_emb")),
        Seq("u2"),
      )
      .withColumn("similarity", round(edgeScore(cfg), 6))
      .filter(col("similarity") >= lit(cfg.similarityThreshold))
      .select(col("u1"), col("u2"), col("similarity"))
  }

  /** (uuid → component) map over duplicate pairs + per-component member
    * rank in the deterministic "original first" order.
    */
  private def componentRanked(items: DataFrame, pairs: DataFrame): DataFrame = {
    val comp = GraphOps
      // candidate pairs are budget-bounded — bounded driver union-find
      // labels them in one job (superstep loop only past the bound)
      .connectedComponentsAuto(pairs.select(col("u1").as("src"), col("u2").as("dst")))
      .select(col("node").as("uuid"), col("component"))
    val w = Window.partitionBy(col("component")).orderBy(col("created_at").asc_nulls_last, col("uuid").asc)
    items
      .join(comp, Seq("uuid"))
      .withColumn("rk", row_number().over(w))
  }

  /** Deduplicate an entity table (uuid, name, group_id, labels,
    * created_at, name_embedding, summary, attributes). Rows in no
    * duplicate component pass through untouched; each component collapses
    * to one row by the configured strategy.
    */
  def deduplicateEntities(nodes: DataFrame, cfg: DeduplicationConfig = DeduplicationConfig()): DedupResult =
    resolveEntities(nodes, duplicateEntityPairs(nodes, cfg), cfg)

  private def resolveEntities(nodes: DataFrame, pairs0: DataFrame, cfg: DeduplicationConfig): DedupResult = {
    val pairs = pairs0.persist()
    val nPairs = pairs.count()
    if (nPairs == 0) { pairs.unpersist(); return DedupResult(nodes, 0, 0, 0) }

    val ranked = componentRanked(nodes, pairs).persist()
    val nMembers = ranked.count()
    val nComponents = ranked.filter(col("rk") === 1).count()

    val resolvedDupes: DataFrame = cfg.conflictResolution match {
      case "keep_first" =>
        ranked.filter(col("rk") === 1).drop("component", "rk")
      case "keep_newer" =>
        val w = Window.partitionBy(col("component")).orderBy(col("created_at").desc_nulls_last, col("uuid").asc)
        ranked.withColumn("pick", row_number().over(w)).filter(col("pick") === 1).drop("component", "rk", "pick")
      case "keep_older" =>
        val w = Window.partitionBy(col("component")).orderBy(col("created_at").asc_nulls_last, col("uuid").asc)
        ranked.withColumn("pick", row_number().over(w)).filter(col("pick") === 1).drop("component", "rk", "pick")
      case "keep_better" =>
        val q = entityQuality(col("name"), col("labels"), col("name_embedding"), col("attributes"))
        val w = Window.partitionBy(col("component")).orderBy(q.desc, col("created_at").asc_nulls_last, col("uuid").asc)
        ranked.withColumn("pick", row_number().over(w)).filter(col("pick") === 1).drop("component", "rk", "pick")
      case "merge" =>
        // representative (rk=1) carries uuid/name/group_id/summary; labels
        // union (member order, first occurrence wins), attributes merged
        // per key — conflicting values join with " | " in member order
        // (the reference builds a value list, deduplicator.py:599-629;
        // our attribute map is string→string); created_at = earliest;
        // embedding from the first member that has one.
        val exAttrs = ranked
          .select(col("component"), col("rk"), explode_outer(col("attributes")).as(Seq("k", "v")))
          .filter(col("k").isNotNull)
          .groupBy(col("component"), col("k"))
          .agg(array_join(array_distinct(sort_array(collect_list(struct(col("rk"), col("v")))).getField("v")), " | ").as("v"))
          .groupBy(col("component"))
          .agg(map_from_entries(sort_array(collect_list(struct(col("k"), col("v"))))).as("m_attrs"))
        val agg = ranked
          .groupBy(col("component"))
          .agg(
            min_by(struct(col("uuid"), col("name"), col("group_id"), col("summary")), col("rk")).as("rep"),
            array_distinct(flatten(sort_array(collect_list(struct(col("rk"), col("labels")))).getField("labels"))).as("m_labels"),
            min(col("created_at")).as("m_created"),
            // embedding from the first member that has one (rk offset keeps
            // the ordering key unique, so ties can't pick nondeterministically)
            min_by(col("name_embedding"), when(size(col("name_embedding")) > 0, col("rk")).otherwise(col("rk") + lit(1000000000))).as("m_emb"),
          )
        agg
          .join(exAttrs, Seq("component"), "left")
          .select(
            col("rep.uuid").as("uuid"),
            col("rep.name").as("name"),
            col("rep.group_id").as("group_id"),
            col("m_labels").as("labels"),
            col("m_created").as("created_at"),
            col("m_emb").as("name_embedding"),
            col("rep.summary").as("summary"),
            coalesce(col("m_attrs"), map().cast("map<string,string>")).as("attributes"),
          )
    }

    // checkpoint the two component-sized frames the returned plan needs
    // BEFORE unpersisting — otherwise the caller's first action on
    // `resolved` recomputes the candidate self-join and window ranking
    // from scratch and the persists were pure overhead
    val memberIds = ranked.select("uuid").localCheckpoint()
    val dupesOut = resolvedDupes.select(nodes.columns.map(col): _*).localCheckpoint()
    pairs.unpersist()
    ranked.unpersist()
    val resolved = nodes.join(memberIds, Seq("uuid"), "left_anti").unionByName(dupesOut)
    DedupResult(resolved, nPairs, nMembers - nComponents, nComponents)
  }

  /** Deduplicate an edge table (EntityEdge schema). Same component fold;
    * merge combines facts with " | " (member order), unions episodes, and
    * keeps the earliest created_at (deduplicator.py:631-667).
    */
  def deduplicateEdges(edges: DataFrame, cfg: DeduplicationConfig = DeduplicationConfig()): DedupResult =
    resolveEdges(edges, duplicateEdgePairs(edges, cfg), cfg)

  private def resolveEdges(edges: DataFrame, pairs0: DataFrame, cfg: DeduplicationConfig): DedupResult = {
    val pairs = pairs0.persist()
    val nPairs = pairs.count()
    if (nPairs == 0) { pairs.unpersist(); return DedupResult(edges, 0, 0, 0) }

    val ranked = componentRanked(edges, pairs).persist()
    val nMembers = ranked.count()
    val nComponents = ranked.filter(col("rk") === 1).count()

    val repCols = edges.columns.filterNot(Set("fact", "episodes", "created_at", "fact_embedding"))
    val resolvedDupes: DataFrame = cfg.conflictResolution match {
      case "keep_first" =>
        ranked.filter(col("rk") === 1).drop("component", "rk")
      case "keep_newer" =>
        val w = Window.partitionBy(col("component")).orderBy(col("created_at").desc_nulls_last, col("uuid").asc)
        ranked.withColumn("pick", row_number().over(w)).filter(col("pick") === 1).drop("component", "rk", "pick")
      case "keep_older" =>
        val w = Window.partitionBy(col("component")).orderBy(col("created_at").asc_nulls_last, col("uuid").asc)
        ranked.withColumn("pick", row_number().over(w)).filter(col("pick") === 1).drop("component", "rk", "pick")
      case "keep_better" =>
        val q = edgeQuality(col("fact"), col("fact_embedding"), col("episodes"), col("valid_at"))
        val w = Window.partitionBy(col("component")).orderBy(q.desc, col("created_at").asc_nulls_last, col("uuid").asc)
        ranked.withColumn("pick", row_number().over(w)).filter(col("pick") === 1).drop("component", "rk", "pick")
      case "merge" =>
        val agg = ranked
          .groupBy(col("component"))
          .agg(
            min_by(struct(repCols.map(col): _*), col("rk")).as("rep"),
            array_join(sort_array(collect_list(struct(col("rk"), col("fact")))).getField("fact"), " | ").as("m_fact"),
            array_distinct(flatten(sort_array(collect_list(struct(col("rk"), col("episodes")))).getField("episodes"))).as("m_episodes"),
            min(col("created_at")).as("m_created"),
            min_by(col("fact_embedding"), when(size(col("fact_embedding")) > 0, col("rk")).otherwise(col("rk") + lit(1000000000))).as("m_emb"),
          )
        val rep = repCols.map(c => col(s"rep.$c").as(c))
        agg.select(
          rep ++ Seq(
            col("m_fact").as("fact"),
            col("m_episodes").as("episodes"),
            col("m_created").as("created_at"),
            col("m_emb").as("fact_embedding"),
          ): _*
        )
    }

    // same checkpoint-before-unpersist discipline as [[resolveEntities]]
    val memberIds = ranked.select("uuid").localCheckpoint()
    val dupesOut = resolvedDupes.select(edges.columns.map(col): _*).localCheckpoint()
    pairs.unpersist()
    ranked.unpersist()
    val resolved = edges.join(memberIds, Seq("uuid"), "left_anti").unionByName(dupesOut)
    DedupResult(resolved, nPairs, nMembers - nComponents, nComponents)
  }

  /** ALL blocking keys an edge row can pair through — used to SCOPE the
    * incremental corpus side, so a recall superset of the generation keys
    * is fine (token keys are the full token set, not the prefix-filtered
    * one — prefix membership depends on corpus-wide dfs, which differ
    * between the full table and the scoped slice).
    */
  private def edgeAllBlockKeys(edges: DataFrame, cfg: DeduplicationConfig): DataFrame = {
    val tok = edges.select(col("uuid"), explode(tokens(col("fact"))).as("key"))
    val structural = edges.select(
      col("uuid"),
      concat(lit("st:"), col("source_uuid"), lit("->"), col("target_uuid")).as("key"),
    )
    val sig =
      if (cfg.embeddingWeight < cfg.similarityThreshold) tok.limit(0)
      else
        edges
          .filter(size(coalesce(col("fact_embedding"), array().cast("array<float>"))) > 0)
          .select(col("uuid"), concat(lit("sig:"), graft.sim.Ann.signatureCol(col("fact_embedding"))).as("key"))
    tok.unionByName(structural).unionByName(sig)
  }

  /** Incremental form (deduplicate_incremental, deduplicator.py:155-204).
    * The reference concatenates `existing + new` and rescans the FULL
    * similarity matrix (deduplicator.py:131-141) — so existing×existing
    * duplicates merge there too, at O(corpus²) per call. Here the rescan
    * is SCOPED to rows sharing a (sub-hot-cap) block key with the batch:
    *
    *  - one linear pass over `existing` extracts block keys and semi-joins
    *    them against the batch's keys — never a corpus-wide SELF-JOIN;
    *    hot keys (template tokens like "is"/"in" that touch nearly every
    *    fact) are excluded by the same [[DeduplicationConfig.hotBlockCap]]
    *    guard candidate generation applies, so the scope stays ∝ the
    *    batch's genuinely-discriminating blocks;
    *  - within the scope, ALL pairs count (existing×existing included),
    *    matching the reference's full-matrix semantics; existing
    *    duplicates in blocks the batch never touches pass through verbatim
    *    (they belong to a bulk [[deduplicateEntities]]/[[deduplicateEdges]]
    *    pass, which this engine runs at pipeline time);
    *  - existing rows sort before new ones in the component order
    *    whenever their created_at is earlier (the usual case), so
    *    resolution prefers the established row.
    */
  def deduplicateIncremental(
      existing: DataFrame,
      incoming: DataFrame,
      cfg: DeduplicationConfig = DeduplicationConfig(),
      edges: Boolean = false,
  ): DedupResult = {
    val all = existing.unionByName(incoming)
    val keysOf: DataFrame => DataFrame =
      if (edges) edgeAllBlockKeys(_, cfg) else entityBlockKeys(_, cfg)
    val batchKeys = keysOf(incoming).select(col("key")).distinct().localCheckpoint()
    val touchedExisting = existing.join(
      dropHotKeys(keysOf(existing), cfg.effectiveHotBlockCap)
        .join(batchKeys, Seq("key"), "left_semi")
        .select(col("uuid"))
        .distinct(),
      Seq("uuid"),
      "left_semi",
    )
    val scoped = touchedExisting.unionByName(incoming)
    val pairs = if (edges) duplicateEdgePairs(scoped, cfg) else duplicateEntityPairs(scoped, cfg)
    if (edges) resolveEdges(all, pairs, cfg) else resolveEntities(all, pairs, cfg)
  }
}
