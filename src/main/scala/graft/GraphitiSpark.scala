package graft

import java.sql.Timestamp

import graft.community.Communities
import graft.io.SnapshotStore
import graft.kg._
import graft.search.{KgSearch, KgSearchConfig, SearchResults}
import graft.streaming.IncrementalIngest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Public facade over the engine — the explicit `GraphitiSpark` API the
  * reference's README promises but never ships (`GraphitiHF` is phantom,
  * SURVEY.md §3.3). Entry points mirror `graphiti_core/graphiti.py`:
  *
  *  - addEpisodeBulk  → `add_episode_bulk` (graphiti.py:587-873)
  *  - addEpisode      → `add_episode` (graphiti.py:384-585) — a 1-page batch
  *  - addTriplet      → `add_triplet` (graphiti.py:1021-1085)
  *  - removeEpisode   → `remove_episode` cascade (graphiti.py:1087-1115)
  *  - invalidateEdges → `invalidate_edges` (temporal_manager.py:212-286)
  *  - buildCommunities→ `build_communities` (graphiti.py:875-906)
  *  - search / searchEdges / … → `search_` (search/search.py:68-182)
  *  - deleteGroup / deleteByUuids → driver delete ops
  *    (huggingface_driver.py:433-444, nodes.py:183-345)
  */
final class GraphitiSpark(val spark: SparkSession, storeRoot: String, groupId: String = "default") {

  val store = new SnapshotStore(spark, storeRoot)
  private val searcher = new KgSearch(store)

  /** Bulk episodic ingest of a pages frame (url, warc_ts, html, text, lang). */
  def addEpisodeBulk(pages: DataFrame, corpusFingerprint: String): Unit =
    new KgPipeline(store, groupId).run(pages, corpusFingerprint)

  /** Single-episode ingest = incremental batch of one page. */
  def addEpisode(url: String, warcTs: Timestamp, html: Array[Byte], lang: String = "en"): Unit = {
    import spark.implicits._
    val page = Seq((url, warcTs, html, null.asInstanceOf[String], lang))
      .toDF("url", "warc_ts", "html", "text", "lang")
    IncrementalIngest.ingestBatch(store, page, batchId = -1L, groupId)
  }

  /** Manual triple insert with full resolution (add_triplet,
    * graphiti.py:1021-1085): the raw fact enters the SAME canonical-remap +
    * dedup + contradiction-invalidation merge as extraction output.
    */
  def addTriplet(subj: String, pred: String, obj: String, validAt: Timestamp): Unit = {
    import spark.implicits._
    val epUuid = Ids.edge(groupId, subj, pred, obj, validAt.getTime)
    val raw = Seq(
      (
        Ids.entity(groupId, subj),
        pred,
        Ids.entity(groupId, obj),
        s"$subj $pred $obj",
        groupId,
        validAt,
        validAt,
        Seq(epUuid),
      ),
    ).toDF("source_uuid", "name", "target_uuid", "fact", "group_id", "valid_at", "created_at", "episodes")
    // canonical-map PROBE for the two endpoints (index read, not a full
    // map broadcast — the single-row save stays O(1) against the corpus)
    val endpoints = raw
      .select(col("source_uuid").as("uuid"))
      .unionByName(raw.select(col("target_uuid").as("uuid")))
      .distinct()
    val m =
      if (store.exists("uuid_map_by_uuid")) store.loadForKeys("uuid_map_by_uuid", endpoints, Seq("uuid"))
      else if (store.exists("uuid_map"))
        store.load("uuid_map").join(endpoints, Seq("uuid"), "left_semi")
      else raw.sparkSession.emptyDataFrame
    val remapped = if (store.exists("uuid_map")) kg.Linking.remapPointers(raw, m) else raw
    IncrementalIngest.mergeEdges(store, remapped, batchId = -2L)
  }

  /** Cascade-remove an episode: drop it, remove it from edges' episode
    * lists, delete edges that lose their last supporting episode, and
    * delete nodes mentioned ONLY by this episode (the reference deletes
    * episode-created nodes — remove_episode, graphiti.py:1087-1115).
    */
  def removeEpisode(url: String): Unit = {
    val epUuid = Ids.episode(groupId, url)
    val episodes = store.load("episodes").filter(col("uuid") =!= epUuid)
    store.commit(episodes, "episodes", s"remove episode $url")
    if (store.exists("episode_entity_edges")) {
      import spark.implicits._
      store.mergeBucketed(
        "episode_entity_edges",
        store.load("episode_entity_edges").limit(0),
        Seq("uuid"),
        s"cascade remove episode $url",
        deleteKeys = Some(Seq(epUuid).toDF("uuid")),
      )
    }
    val edges = store
      .load("edges")
      .withColumn("episodes", array_remove(col("episodes"), epUuid))
      .filter(size(col("episodes")) > 0)
    store.commit(edges, "edges", s"cascade remove episode $url")
    if (store.exists("raw_triples")) {
      store.commit(
        store.load("raw_triples").filter(col("url") =!= url),
        "raw_triples",
        s"cascade remove episode $url",
      )
    }
    // orphaned nodes: mentioned by this episode and by no other
    if (store.exists("episodic_edges")) {
      val ee = store.load("episodic_edges")
      val orphans = ee
        .filter(col("episode_uuid") === epUuid)
        .select(col("entity_uuid"))
        .join(
          ee.filter(col("episode_uuid") =!= epUuid).select(col("entity_uuid")).distinct(),
          Seq("entity_uuid"),
          "left_anti",
        )
      store.commit(
        ee.filter(col("episode_uuid") =!= epUuid),
        "episodic_edges",
        s"cascade remove episode $url",
      )
      if (store.exists("nodes"))
        store.commit(
          store.load("nodes").join(orphans, col("uuid") === col("entity_uuid"), "left_anti"),
          "nodes",
          s"cascade remove orphaned nodes of $url",
        )
    }
  }

  /** Mark specific edges invalid as of `at` (invalidate_edges). The
    * explicit invalidation is recorded in `manual_invalid_at`, which
    * contention-group rebuilds carry through (IncrementalIngest.mergeEdges)
    * — so it survives later batches touching the same group.
    */
  /** Set the temporal validity range of one edge row (set_validity_period,
    * temporal_manager.py:137-189): valid_at ← `validFrom`; an explicit end
    * OVERWRITES invalid_at (the reference assigns the period directly on
    * the stored row) and is recorded as the manual invalidation so it
    * survives later contention-group rebuilds. Both bounds hold until the
    * group is next rebuilt from raw assertions — rebuilds re-derive
    * valid_at from the surviving facts and apply least(derived, manual).
    */
  def setValidityPeriod(edgeUuid: String, validFrom: Timestamp, validTo: Option[Timestamp] = None): Unit = {
    val base = store.load("edges")
    val withManual =
      if (base.columns.contains("manual_invalid_at")) base
      else base.withColumn("manual_invalid_at", lit(null).cast("timestamp"))
    val hit = col("uuid") === lit(edgeUuid)
    val withFrom = withManual.withColumn("valid_at", when(hit, lit(validFrom)).otherwise(col("valid_at")))
    val edges = validTo match {
      case Some(to) =>
        // the explicit end OVERWRITES invalid_at (an explicit user
        // override of the validity interval — the reference assigns the
        // period directly, temporal_manager.py:137-189) and becomes the
        // manual invalidation; expired_at is capped (least). NOTE: a later
        // contention-group rebuild re-derives the window value and applies
        // least(derived, manual=to) — a contradiction-derived invalid_at
        // earlier than `to` reappears then (facts outrank the override on
        // rebuild; LifecycleDifferentialSpec pins the pre-rebuild state).
        withFrom
          .withColumn("manual_invalid_at", when(hit, lit(to)).otherwise(col("manual_invalid_at")))
          .withColumn("invalid_at", when(hit, lit(to)).otherwise(col("invalid_at")))
          .withColumn("expired_at", when(hit, least(lit(to), col("expired_at"))).otherwise(col("expired_at")))
      case None => withFrom
    }
    store.commit(edges, "edges", s"set validity period for $edgeUuid")
  }

  /** The edge row if (and only if) it is valid at `t` (get_valid_at,
    * temporal_manager.py:288-318): point lookup + the point-in-time
    * validity predicate.
    */
  def getValidAt(edgeUuid: String, t: Timestamp): Option[org.apache.spark.sql.Row] =
    Invalidation
      .validAt(store.load("edges").filter(col("uuid") === lit(edgeUuid)), t)
      .collect()
      .headOption

  def invalidateEdges(uuids: Seq[String], at: Timestamp, reason: String): Unit = {
    val base = store.load("edges")
    val withManual =
      if (base.columns.contains("manual_invalid_at")) base
      else base.withColumn("manual_invalid_at", lit(null).cast("timestamp"))
    val hit = col("uuid").isin(uuids: _*)
    val edges = withManual
      .withColumn("manual_invalid_at", when(hit, lit(at)).otherwise(col("manual_invalid_at")))
      .withColumn("invalid_at", when(hit, least(lit(at), col("invalid_at"))).otherwise(col("invalid_at")))
      .withColumn("expired_at", when(hit, least(lit(at), col("expired_at"))).otherwise(col("expired_at")))
    store.commit(edges, "edges", s"invalidate ${uuids.size} edges: $reason")
  }

  /** Resolve conflicting temporal records of the same logical edge —
    * rows sharing (group_id, source_uuid, name, target_uuid) with different
    * valid_at (temporal_edge_invalidation, temporal_manager.py:530-618).
    * Strategies:
    *  - "first_wins": keep the earliest record, expire the rest now;
    *  - "last_wins":  keep the latest record, expire the rest now;
    *  - "merge":      collapse the group to ONE record spanning
    *                  [min(valid_at), max(invalid_at)] (`_merge_temporal_
    *                  records`, :1447-1465);
    *  - "invalidate": expire every conflicting record (also the MANUAL
    *                  fallback, :581-584).
    * Single-record groups are untouched (":559-560").
    */
  def resolveConflicts(strategy: String, now: Timestamp): Unit = {
    require(
      Set("first_wins", "last_wins", "merge", "invalidate").contains(strategy),
      s"unknown conflict strategy: $strategy",
    )
    import org.apache.spark.sql.expressions.Window
    val key = Seq(col("group_id"), col("source_uuid"), col("name"), col("target_uuid"))
    val edges = store.load("edges")
    val wAsc = Window.partitionBy(key: _*).orderBy(col("valid_at"), col("uuid"))
    val wDesc = Window.partitionBy(key: _*).orderBy(col("valid_at").desc, col("uuid").desc)
    val wAll = Window.partitionBy(key: _*)
    val marked = edges
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__rn_first", row_number().over(wAsc))
      .withColumn("__rn_last", row_number().over(wDesc))
    val resolved = strategy match {
      case "first_wins" =>
        marked.withColumn(
          "expired_at",
          when(col("__n") > 1 && col("__rn_first") =!= 1, least(lit(now), col("expired_at"))).otherwise(col("expired_at")),
        )
      case "last_wins" =>
        marked.withColumn(
          "expired_at",
          when(col("__n") > 1 && col("__rn_last") =!= 1, least(lit(now), col("expired_at"))).otherwise(col("expired_at")),
        )
      case "invalidate" =>
        marked.withColumn(
          "expired_at",
          when(col("__n") > 1, least(lit(now), col("expired_at"))).otherwise(col("expired_at")),
        )
      case "merge" =>
        // one surviving row per group: earliest record widened to the
        // group's full span; invalid_at = max non-null (NULL = still open
        // only when EVERY record is open, mirroring the reference's
        // max(..., default=None))
        marked
          .withColumn("__maxInv", max(col("invalid_at")).over(wAll))
          .filter(col("__rn_first") === 1)
          .withColumn(
            "invalid_at",
            when(col("__n") > 1, when(col("__maxInv").isNotNull, col("__maxInv"))).otherwise(col("invalid_at")),
          )
          .drop("__maxInv")
    }
    store.commit(
      resolved.drop("__n", "__rn_first", "__rn_last"),
      "edges",
      s"resolve temporal conflicts: $strategy",
    )
  }

  /** Age-based auto cleanup (auto_temporal_cleanup,
    * temporal_manager.py:1227-1322): records invalidated before `cutoff`
    * are archived in place ("soft": flagged, kept queryable) or removed
    * ("hard"). Returns the number of records cleaned.
    */
  def cleanupAged(strategy: String, cutoff: Timestamp): Long = {
    require(Set("soft", "hard").contains(strategy), s"unknown cleanup strategy: $strategy")
    val edges = store.load("edges")
    val old = col("invalid_at").isNotNull && col("invalid_at") < lit(cutoff)
    strategy match {
      case "soft" =>
        val withPrev = if (edges.columns.contains("archived")) edges else edges.withColumn("archived", lit(false))
        val withFlag = withPrev.withColumn("archived", col("archived") || old)
        store.commit(withFlag, "edges", s"soft cleanup before $cutoff")
        // records_cleaned = rows MATCHING this call's cutoff (the reference
        // re-counts already-archived matches, temporal_manager.py:1282) —
        // neither the cumulative archived total nor a newly-archived delta
        edges.filter(old).count()
      case "hard" =>
        val kept = edges.filter(!coalesce(old, lit(false)))
        val removed = edges.count() - kept.count()
        store.commit(kept, "edges", s"hard cleanup before $cutoff")
        removed
    }
  }

  /** Delete everything for a group (delete_by_group_id). */
  def deleteGroup(group: String): Unit =
    Seq("episodes", "nodes", "edges", "episodic_edges").foreach { t =>
      if (store.exists(t))
        store.commit(store.load(t).filter(col("group_id") =!= group), t, s"delete group $group")
    }

  /** Delete nodes by uuid, cascading to incident edges (delete_by_uuids). */
  def deleteNodesByUuids(uuids: Seq[String]): Unit = {
    store.commit(store.load("nodes").filter(!col("uuid").isin(uuids: _*)), "nodes", "delete nodes")
    store.commit(
      store
        .load("edges")
        .filter(!col("source_uuid").isin(uuids: _*) && !col("target_uuid").isin(uuids: _*)),
      "edges",
      "cascade delete node edges",
    )
  }

  def buildCommunities(): Unit = Communities.build(store)

  /** (Re)build the query-time search indexes (BM25 inverted index + ANN
    * signature buckets) from the current snapshots — the explicit analog
    * of the reference's `optimize_performance` prebuild
    * (performance_optimizer.py:184-237). Incremental batches keep them
    * fresh automatically once built.
    */
  def buildSearchIndexes(): Unit = graft.search.SearchIndexes.build(store)

  def search(
      query: String,
      originNode: Option[String] = None,
      asOf: Option[Timestamp] = None,
      config: KgSearchConfig = KgSearchConfig(),
  ): SearchResults = searcher.search(query, originNode, asOf, config)

  def searchEdges(
      query: String,
      originNode: Option[String] = None,
      asOf: Option[Timestamp] = None,
      config: KgSearchConfig = KgSearchConfig(),
  ): DataFrame = searcher.searchEdges(query, originNode, asOf, config)

  /** Episode retrieval window (retrieve_episodes,
    * graph_data_operations.py:122-181): last n episodes with
    * valid_at <= referenceTime.
    */
  def retrieveEpisodes(referenceTime: Timestamp, lastN: Int = 3): DataFrame = {
    val picked = store
      .load("episodes")
      .filter(col("valid_at") <= lit(referenceTime))
      .orderBy(col("valid_at").desc, col("uuid"))
      .limit(lastN)
    attachEntityEdges(picked)
  }

  /** The reference's episode schema (huggingface_driver.py:284-299) keeps
    * `entity_edges` on the episode row; this engine stores it NORMALIZED in
    * the bucketed `episode_entity_edges` side table (an edge rebuild must
    * never rewrite the corpus-wide page text) and joins it back here.
    */
  def episodesWithEntityEdges: DataFrame = attachEntityEdges(store.load("episodes"))

  private def attachEntityEdges(episodes: DataFrame): DataFrame = {
    val empty = array().cast("array<string>")
    if (!store.exists("episode_entity_edges"))
      episodes.withColumn("entity_edges", empty)
    else
      episodes
        .join(store.load("episode_entity_edges"), Seq("uuid"), "left")
        .withColumn("entity_edges", coalesce(col("entity_edges"), empty))
  }

  /** Graph state as of t (get_historical_state). */
  def historicalEdges(t: Timestamp): DataFrame = Invalidation.validAt(store.load("edges"), t)

  /** Edges whose valid_at ∈ [from, to), probing the month-bucket temporal
    * index when built (performance_optimizer.py:424-511) — work ∝
    * matching months, not corpus.
    */
  def edgesValidInRange(from: Timestamp, to: Timestamp): DataFrame =
    graft.search.SearchIndexes.edgesValidInRange(store, from, to)

  /** Export graph tables to json / csv / parquet under outDir — the
    * export surface of `export_communities` (huggingface_driver.py:
    * 2604-2641: format + include_embeddings + group_ids), generalized to
    * every table like the reference's dataset push. Embedding (array)
    * columns are dropped unless requested — and always for csv, which
    * cannot carry arrays; struct/map columns are JSON-encoded for csv.
    * Distributed writers — no driver-side collect.
    */
  def exportGraph(
      outDir: String,
      format: String = "parquet",
      includeEmbeddings: Boolean = false,
      groupIds: Seq[String] = Nil,
      tables: Seq[String] = Seq("nodes", "edges", "episodes", "communities"),
  ): Unit = {
    require(Seq("json", "csv", "parquet").contains(format), s"unknown export format $format")
    tables.filter(store.exists).foreach { t =>
      var df = store.load(t)
      if (groupIds.nonEmpty && df.columns.contains("group_id"))
        df = df.filter(col("group_id").isin(groupIds: _*))
      val embCols = df.columns.filter(_.endsWith("_embedding"))
      if (!includeEmbeddings || format == "csv") df = df.drop(embCols: _*)
      if (format == "csv")
        df.schema.fields.foreach { f =>
          f.dataType match {
            case _: org.apache.spark.sql.types.ArrayType | _: org.apache.spark.sql.types.MapType |
                _: org.apache.spark.sql.types.StructType =>
              df = df.withColumn(f.name, to_json(col(f.name)))
            case _ => ()
          }
        }
      df.write.mode("overwrite").format(format).save(s"$outDir/$t")
    }
  }
}
