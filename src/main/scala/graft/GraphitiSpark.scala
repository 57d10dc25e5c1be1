package graft

import java.sql.Timestamp

import graft.community.Communities
import graft.io.SnapshotStore
import graft.kg._
import graft.search.{KgSearch, KgSearchConfig, SearchIndexes, SearchResults}
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
final class GraphitiSpark(val spark: SparkSession, storeRoot: String, val groupId: String = "default") {

  val store = new SnapshotStore(spark, storeRoot)
  private val searcher = new KgSearch(store)

  /** Bulk episodic ingest of a pages frame (url, warc_ts, html, text,
    * lang). `excludedEntityTypes` drops entities of those types (and the
    * triples referencing them) at extraction — the reference's
    * `extract_nodes(excluded_entity_types)` option
    * (node_operations.py:74,163-164).
    *
    * `validate = true` runs the pre-ingest episode validation gate the
    * reference's `process_episode` applies (`episode_processor.py:526-577`
    * validates before ingest): pages with ANY validation issue are
    * quarantined to the `rejected_episodes` table — (url, issue, detail)
    * rows, replacing earlier rejects of the same url — and only the clean
    * subset ingests. One distributed report over the whole batch, never a
    * per-episode loop (EpisodeValidation).
    */
  def addEpisodeBulk(
      pages: DataFrame,
      corpusFingerprint: String,
      excludedEntityTypes: Seq[String] = Nil,
      validate: Boolean = false,
      coverageFloor: Double = 0.1,
  ): Unit = {
    val toIngest =
      if (!validate) pages
      else {
        val withText = pages.withColumn("text", coalesce(col("text"), kg.HtmlText.textOf(col("html"))))
        val report = EpisodeValidation
          .validatePages(withText.select(col("url"), col("text"), col("warc_ts")), coverageFloor)
          .localCheckpoint()
        if (report.isEmpty) pages
        else {
          // replace-by-url: re-validating a url replaces its earlier rows
          val rejectedUrls = report.select(col("url")).distinct().localCheckpoint()
          store.mergeBucketed(
            "rejected_episodes",
            report.withColumn("group_id", lit(groupId)),
            Seq("url"),
            s"pre-ingest validation rejects",
          )
          pages.join(rejectedUrls, Seq("url"), "left_anti")
        }
      }
    new KgPipeline(store, groupId, excludedEntityTypes = excludedEntityTypes)
      .run(toIngest, corpusFingerprint)
  }

  /** Single-episode ingest = incremental batch of one page. */
  def addEpisode(
      url: String,
      warcTs: Timestamp,
      html: Array[Byte],
      lang: String = "en",
      excludedEntityTypes: Seq[String] = Nil,
  ): Unit = {
    import spark.implicits._
    val page = Seq((url, warcTs, html, null.asInstanceOf[String], lang))
      .toDF("url", "warc_ts", "html", "text", "lang")
    IncrementalIngest.ingestBatch(store, page, batchId = -1L, groupId, excludedEntityTypes)
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
    // the remap gate must mirror the probe's source exactly — gating on
    // uuid_map while probing uuid_map_by_uuid would silently discard the
    // probe when only the by_uuid copy exists
    val hasMap = store.exists("uuid_map_by_uuid") || store.exists("uuid_map")
    val m =
      if (store.exists("uuid_map_by_uuid")) store.loadForKeys("uuid_map_by_uuid", endpoints, Seq("uuid"))
      else if (store.exists("uuid_map"))
        store.load("uuid_map").join(endpoints, Seq("uuid"), "left_semi")
      else raw.sparkSession.emptyDataFrame
    val remapped = if (hasMap) kg.Linking.remapPointers(raw, m) else raw
    // the reference resolves against a synthetic episode it never saves
    // (graphiti.py:1065-1075), leaving the edge's episodes list dangling;
    // here the manual assertion gets a REAL (empty-content) episodes row,
    // so the remove-episode cascade and the validator's episodes-resolve
    // invariant hold for manual triplets too
    val manualEp = Seq((epUuid, "", "", "manual", "manual triplet", groupId, validAt, validAt))
      .toDF("uuid", "name", "content", "source", "source_description", "group_id", "created_at", "valid_at")
    val epIsNew = !store.exists("episodes") ||
      store.loadForKeys("episodes", manualEp.select(col("uuid")), Seq("uuid")).isEmpty
    store.mergeBucketed("episodes", manualEp, Seq("uuid"), s"manual episode for triplet $epUuid")
    if (epIsNew && store.exists("episodes_postings"))
      SearchIndexes.refreshText(
        store, "episodes",
        manualEp.limit(0).select(col("uuid").as("id"), col("content").as("text")),
        manualEp.select(col("uuid").as("id"), col("content").as("text")),
      )
    IncrementalIngest.mergeEdges(store, remapped, batchId = -2L)
  }

  /** Cascade-remove an episode: drop it, remove it from edges' episode
    * lists, delete edges that lose their last supporting episode, and
    * delete nodes mentioned ONLY by this episode (the reference deletes
    * episode-created nodes — remove_episode, graphiti.py:1087-1115).
    */
  def removeEpisode(url: String): Unit = {
    import spark.implicits._
    val epUuid = Ids.episode(groupId, url)
    val groupKey = Seq("group_id", "source_uuid", "name")
    val removedEp = store
      .load("episodes")
      .filter(col("uuid") === epUuid)
      .select(col("uuid").as("id"), col("content").as("text"))
      .localCheckpoint()
    // keyed delete — only the bucket holding the episode's uuid rewrites
    // (delta-appended when small); a plain pre-bucketed table folds once
    store.mergeBucketed(
      "episodes", store.load("episodes").limit(0), Seq("uuid"),
      s"remove episode $url", deleteKeys = Some(Seq(epUuid).toDF("uuid")),
    )
    SearchIndexes.refreshText(store, "episodes", removedEp, removedEp.limit(0))
    // citing edge uuids from the episode→entity_edges side table, read
    // BEFORE its row is deleted — the locate step below probes only the
    // buckets those uuids name instead of array_contains-scanning the
    // corpus (the table is maintained surgically by mergeEdges and the
    // bulk pipeline, so its list for a live episode is authoritative)
    val citing: Option[DataFrame] =
      if (store.exists("episode_entity_edges"))
        Some(
          store
            .loadForKeys("episode_entity_edges", Seq(epUuid).toDF("uuid"), Seq("uuid"))
            .select(explode(col("entity_edges")).as("uuid"))
            .localCheckpoint(),
        )
      else None
    if (citing.isDefined) {
      store.mergeBucketed(
        "episode_entity_edges",
        store.load("episode_entity_edges").limit(0),
        Seq("uuid"),
        s"cascade remove episode $url",
        deleteKeys = Some(Seq(epUuid).toDF("uuid")),
      )
    }
    // edge rows whose ONLY supporter was this episode vanish — their index
    // entries leave with them; rows merely losing one episode keep their
    // uuid/fact/endpoints/valid_at, so no other index entry changes.
    // The locate is a keyed probe (entity_edges list → edge_uuids groups →
    // edge buckets); the WRITE is scoped to the hit contention groups —
    // the rest of the corpus is carried by manifest reference. Stores
    // without the side table fall back to the corpus scan.
    val hitRows = (citing match {
      case Some(c) =>
        val (stored, _) = locateEdges(c)
        stored.filter(array_contains(col("episodes"), epUuid))
      case None => store.load("edges").filter(array_contains(col("episodes"), epUuid))
    }).localCheckpoint()
    if (!hitRows.isEmpty) {
      val removedEdges = hitRows.filter(size(col("episodes")) === 1).localCheckpoint()
      val affected = hitRows.select(groupKey.map(col): _*).distinct().localCheckpoint()
      val patched = store
        .loadForKeys("edges", affected, groupKey)
        .withColumn("episodes", array_remove(col("episodes"), epUuid))
        .filter(size(col("episodes")) > 0)
      store.mergeBucketed(
        "edges", patched, groupKey, s"cascade remove episode $url",
        deleteKeys = Some(affected),
      )
      refreshEdgeIndexes(removedEdges)
    }
    if (store.exists("raw_triples")) {
      val tripleKey = Seq("group_id", "url", "subj", "pred", "obj")
      val gone = store
        .load("raw_triples")
        .filter(col("url") === url)
        .select(tripleKey.map(col): _*)
        .localCheckpoint()
      if (!gone.isEmpty)
        store.mergeBucketed(
          "raw_triples", store.load("raw_triples").limit(0), tripleKey,
          s"cascade remove episode $url", deleteKeys = Some(gone),
        )
    }
    // orphaned nodes: mentioned by this episode and by no other
    if (store.exists("episodic_edges")) {
      val ee = store.load("episodic_edges")
      val mine = ee.filter(col("episode_uuid") === epUuid).localCheckpoint()
      val orphans = mine
        .select(col("entity_uuid"))
        .join(
          ee.filter(col("episode_uuid") =!= epUuid).select(col("entity_uuid")).distinct(),
          Seq("entity_uuid"),
          "left_anti",
        )
        .localCheckpoint()
      if (!mine.isEmpty)
        store.mergeBucketed(
          "episodic_edges", ee.limit(0), Seq("episode_uuid", "entity_uuid"),
          s"cascade remove episode $url",
          deleteKeys = Some(mine.select(col("episode_uuid"), col("entity_uuid"))),
          bucketBy = Seq("entity_uuid"),
        )
      if (store.exists("nodes")) {
        val removedNodes = store
          .loadForKeys("nodes", orphans.select(col("entity_uuid").as("uuid")), Seq("uuid"))
          .localCheckpoint()
        store.mergeBucketed(
          "nodes", store.load("nodes").limit(0), Seq("uuid"),
          s"cascade remove orphaned nodes of $url",
          deleteKeys = Some(orphans.select(col("entity_uuid").as("uuid"))),
        )
        SearchIndexes.refreshText(
          store, "nodes",
          removedNodes.select(col("uuid").as("id"), col("name").as("text")),
          removedNodes.limit(0).select(col("uuid").as("id"), col("name").as("text")),
        )
        if (store.exists("node_stats"))
          store.mergeBucketed(
            "node_stats", store.load("node_stats").limit(0), Seq("cuuid"),
            s"cascade remove orphaned node stats of $url",
            deleteKeys = Some(orphans.select(col("entity_uuid").as("cuuid"))),
          )
      }
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
    import spark.implicits._
    val groupKey = Seq("group_id", "source_uuid", "name")
    val hit = col("uuid") === lit(edgeUuid)
    // locate the row via the edge_uuids by-uuid index (bucket probe), then
    // patch ONLY its contention group: the write is a keyed bucketed
    // merge (delta-appended when small), never a full-table rewrite
    val (stored0, affected) = locateEdges(Seq(edgeUuid).toDF("uuid"))
    val stored = stored0.localCheckpoint()
    val hitRow = stored.filter(hit)
    if (hitRow.isEmpty) return
    val withManual =
      if (stored.columns.contains("manual_invalid_at")) stored
      else stored.withColumn("manual_invalid_at", lit(null).cast("timestamp"))
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
    store.mergeBucketed(
      "edges", edges, groupKey, s"set validity period for $edgeUuid",
      deleteKeys = Some(affected),
    )
    // the month index is keyed by valid_at — move the row's membership
    // (net delta cancels when the month did not change)
    if (store.exists("edge_months")) {
      val tCols = Seq("uuid", "valid_at", "group_id", "source_uuid", "name").map(col)
      val oldRow = hitRow.select(tCols: _*)
      SearchIndexes.refreshTemporal(store, oldRow, oldRow.withColumn("valid_at", lit(validFrom)))
    }
  }

  /** The edge row if (and only if) it is valid at `t` (get_valid_at,
    * temporal_manager.py:288-318): point lookup + the point-in-time
    * validity predicate.
    */
  def getValidAt(edgeUuid: String, t: Timestamp): Option[org.apache.spark.sql.Row] = {
    import spark.implicits._
    val (stored, _) = locateEdges(Seq(edgeUuid).toDF("uuid"))
    Invalidation
      .validAt(stored.filter(col("uuid") === lit(edgeUuid)), t)
      .collect()
      .headOption
  }

  def invalidateEdges(uuids: Seq[String], at: Timestamp, reason: String): Unit = {
    if (uuids.isEmpty) return
    import spark.implicits._
    val hit = col("uuid").isin(uuids: _*)
    val groupKey = Seq("group_id", "source_uuid", "name")
    // locate the targeted rows' contention groups via the edge_uuids
    // by-uuid index (bucket probe, work ∝ targets), then patch ONLY those
    // groups: the write is a keyed bucketed merge (delta-appended when the
    // batch is small relative to the corpus — invalidate_edges,
    // temporal_manager.py:212-286, touches only the targeted rows)
    val (stored, affected) = locateEdges(uuids.toDF("uuid"))
    if (affected.isEmpty) return
    val withManual =
      if (stored.columns.contains("manual_invalid_at")) stored
      else stored.withColumn("manual_invalid_at", lit(null).cast("timestamp"))
    val patched = withManual
      .withColumn("manual_invalid_at", when(hit, lit(at)).otherwise(col("manual_invalid_at")))
      .withColumn("invalid_at", when(hit, least(lit(at), col("invalid_at"))).otherwise(col("invalid_at")))
      .withColumn("expired_at", when(hit, least(lit(at), col("expired_at"))).otherwise(col("expired_at")))
    store.mergeBucketed(
      "edges", patched, groupKey, s"invalidate ${uuids.size} edges: $reason",
      deleteKeys = Some(affected),
    )
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
    // "merge" is the one strategy that DELETES rows (non-first group
    // members); the other three only touch expired_at, which no derived
    // index tracks — same index-consistency contract as the other deletes
    val removed =
      if (strategy != "merge") None
      else Some(marked.filter(col("__n") > 1 && col("__rn_first") =!= 1).drop("__n", "__rn_first", "__rn_last").localCheckpoint())
    store.commit(
      resolved.drop("__n", "__rn_first", "__rn_last"),
      "edges",
      s"resolve temporal conflicts: $strategy",
    )
    removed.filter(r => !r.isEmpty).foreach { r =>
      refreshEdgeIndexes(r)
      dropFromEntityEdges(r)
    }
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
        // matching rows' contention groups only (one corpus READ to find
        // them; the WRITE is a keyed bucketed merge scoped to those
        // groups). Untouched rows keep a NULL `archived` — readers treat
        // null as false (3VL filters / coalesce), so the flag column
        // widens lazily instead of rewriting the corpus to backfill false.
        val groupKey = Seq("group_id", "source_uuid", "name")
        val hitRows = edges.filter(old).localCheckpoint()
        // records_cleaned = rows MATCHING this call's cutoff (the reference
        // re-counts already-archived matches, temporal_manager.py:1282) —
        // neither the cumulative archived total nor a newly-archived delta
        val matched = hitRows.count()
        if (matched > 0) {
          val affected = hitRows.select(groupKey.map(col): _*).distinct().localCheckpoint()
          val stored = store.loadForKeys("edges", affected, groupKey)
          val withPrev =
            if (stored.columns.contains("archived")) stored
            else stored.withColumn("archived", lit(false))
          val patched =
            withPrev.withColumn("archived", coalesce(col("archived"), lit(false)) || old)
          store.mergeBucketed(
            "edges", patched, groupKey, s"soft cleanup before $cutoff",
            deleteKeys = Some(affected),
          )
        }
        matched
      case "hard" =>
        // same scoped shape: delete keys are the matching rows' contention
        // groups, the surviving rows of those groups re-enter their buckets
        val groupKey = Seq("group_id", "source_uuid", "name")
        val removed = edges.filter(old).localCheckpoint()
        val n = removed.count()
        if (n > 0) {
          val affected = removed.select(groupKey.map(col): _*).distinct().localCheckpoint()
          val survivors = store.loadForKeys("edges", affected, groupKey).filter(!coalesce(old, lit(false)))
          store.mergeBucketed(
            "edges", survivors, groupKey, s"hard cleanup before $cutoff",
            deleteKeys = Some(affected),
          )
          refreshEdgeIndexes(removed)
          dropFromEntityEdges(removed)
        }
        n
    }
  }

  // ---- index-consistent mutation plumbing ------------------------------
  // The reference's delete ops touch only the dataframes and leave the
  // FAISS/BM25/adjacency structures stale until a separate
  // rebuild_indices pass (huggingface_driver.py:433-444 +
  // auto_rebuild_indices). At scale a ghost-returning index between
  // rebuilds is a correctness bug, so every delete here refreshes the
  // query-time indexes in the same call — with the SAME signed delta-log
  // refreshes micro-batches use (work ∝ removed rows, never a re-index).

  /** Refresh the four edge-backed search indexes after `removed` edge rows
    * left the edges table (each refresh no-ops when its index was never
    * built). Caller should localCheckpoint `removed` — four consumers.
    */
  private def refreshEdgeIndexes(removed: DataFrame): Unit = {
    val none = removed.limit(0)
    val tCols = Seq("uuid", "valid_at", "group_id", "source_uuid", "name").map(col)
    // existence-guarded BEFORE building the projections: ad-hoc stores
    // (and the lifecycle specs) hold minimal edge schemas with no indexes
    val tasks = Seq.newBuilder[() => Unit]
    if (store.exists("edges_postings"))
      tasks += (() =>
        SearchIndexes.refreshText(
          store, "edges",
          removed.select(col("uuid").as("id"), col("fact").as("text")),
          none.select(col("uuid").as("id"), col("fact").as("text")),
        ))
    if (store.exists("edge_ann"))
      tasks += (() =>
        SearchIndexes.refreshAnn(
          store,
          removed.select(col("uuid"), col("fact_embedding")),
          none.select(col("uuid"), col("fact_embedding")),
        ))
    if (store.exists("graph_adj"))
      tasks += (() =>
        SearchIndexes.refreshGraph(
          store,
          removed.select(col("source_uuid"), col("target_uuid")),
          none.select(col("source_uuid"), col("target_uuid")),
        ))
    if (store.exists("edge_months"))
      tasks += (() => { SearchIndexes.refreshTemporal(store, removed.select(tCols: _*), none.select(tCols: _*)); () })
    // by-uuid locate index: the removed rows' entries leave (stale entries
    // are only benign extra probes, but deletes have the rows in hand —
    // one keyed bucket delete keeps the index tight)
    if (store.exists("edge_uuids"))
      tasks += (() => {
        store.mergeBucketed(
          "edge_uuids",
          removed.select(col("uuid"), col("group_id"), col("source_uuid"), col("name")).limit(0),
          Seq("uuid"), "drop removed edge uuids",
          deleteKeys = Some(removed.select(col("uuid"))),
        )
        ()
      })
    graft.io.Concurrent.runAll(tasks.result())
  }

  /** Locate stored edge rows by uuid: probe the `edge_uuids` by-uuid index
    * for the target rows' contention groups, then bucket-probe the edges
    * table — work ∝ probed buckets, never a corpus scan (invalidate_edges,
    * temporal_manager.py:212-286, touches only targeted rows). Falls back
    * to a scan + semi-join on index-less stores (ad-hoc fixtures). Returns
    * (stored rows of the hit groups, hit group keys); `stored` is NOT
    * checkpointed — single-consumer callers keep it lazy.
    */
  private def locateEdges(uuidDf: DataFrame): (DataFrame, DataFrame) = {
    val groupKey = Seq("group_id", "source_uuid", "name")
    if (store.exists("edge_uuids")) {
      val groups = store
        .loadForKeys("edge_uuids", uuidDf, Seq("uuid"))
        .select(groupKey.map(col): _*)
        .distinct()
        .localCheckpoint()
      (store.loadForKeys("edges", groups, groupKey), groups)
    } else {
      val groups = store
        .load("edges")
        .join(broadcast(uuidDf), Seq("uuid"), "left_semi")
        .select(groupKey.map(col): _*)
        .distinct()
        .localCheckpoint()
      (store.loadForKeys("edges", groups, groupKey), groups)
    }
  }

  /** Drop `removed` edge rows' uuids from the episode_entity_edges lists
    * of every episode citing them (bucketed probe of the cited episodes
    * only — the same surgical patch IncrementalIngest.mergeEdges applies).
    */
  private def dropFromEntityEdges(removed: DataFrame): Unit = {
    if (!store.exists("episode_entity_edges")) return
    val oldByEp = removed.select(col("uuid").as("edge_uuid"), explode(col("episodes")).as("uuid"))
    val touched = oldByEp.select(col("uuid")).distinct()
    val stored = store
      .loadForKeys("episode_entity_edges", touched, Seq("uuid"))
      .select(col("uuid"), explode(col("entity_edges")).as("edge_uuid"))
    val patched = stored
      .join(oldByEp, Seq("uuid", "edge_uuid"), "left_anti")
      .groupBy(col("uuid"))
      .agg(array_sort(collect_set(col("edge_uuid"))).as("entity_edges"))
    val rowsOut = touched
      .join(patched, Seq("uuid"), "left")
      .withColumn("entity_edges", coalesce(col("entity_edges"), array().cast("array<string>")))
    store.mergeBucketed("episode_entity_edges", rowsOut, Seq("uuid"), "entity_edges cascade patch")
  }

  /** Delete everything for a group (delete_by_group_id) — the corpus
    * tables rewrite (group_id is not their bucket key; a tenant purge is
    * inherently ∝ tenant size), the bucketed side tables delete only the
    * buckets holding the group's keys (derived from the removed rows —
    * those tables carry no group_id column), and every search index is
    * refreshed with the removed rows.
    */
  def deleteGroup(group: String): Unit = {
    import spark.implicits._
    def removedOf(t: String): Option[DataFrame] =
      if (store.exists(t)) Some(store.load(t).filter(col("group_id") === group).localCheckpoint())
      else None
    val remEdges = removedOf("edges")
    val remNodes = removedOf("nodes")
    val remNodesRaw = removedOf("nodes_raw")
    val remEpisodes = removedOf("episodes")
    val remCommunities = removedOf("communities")
    Seq("episodes", "nodes", "nodes_raw", "edges", "episodic_edges", "raw_triples", "communities", "community_edges")
      .foreach { t =>
        if (store.exists(t))
          store.commit(store.load(t).filter(col("group_id") =!= group), t, s"delete group $group")
      }
    // bucketed side tables: keys derived from the removed rows
    remNodesRaw.foreach { rn =>
      val uuids = rn.select(col("uuid"))
      if (store.exists("node_stats"))
        store.mergeBucketed(
          "node_stats", store.load("node_stats").limit(0), Seq("cuuid"),
          s"delete group $group", deleteKeys = Some(uuids.select(col("uuid").as("cuuid"))),
        )
      if (store.exists("uuid_map"))
        // every row's canonical is itself a group surface — keyed delete
        store.mergeBucketed(
          "uuid_map", store.load("uuid_map").limit(0), Seq("canonical"),
          s"delete group $group", deleteKeys = Some(uuids.select(col("uuid").as("canonical"))),
        )
      if (store.exists("uuid_map_by_uuid"))
        store.mergeBucketed(
          "uuid_map_by_uuid", store.load("uuid_map_by_uuid").limit(0), Seq("uuid"),
          s"delete group $group", deleteKeys = Some(uuids),
        )
      if (store.exists("node_blocks")) {
        val blocks = graft.kg.Linking.blockingKeys(rn).select(col("key"), col("uuid"))
        store.mergeBucketed(
          "node_blocks", blocks.limit(0), Seq("key", "uuid"),
          s"delete group $group", deleteKeys = Some(blocks), bucketBy = Seq("key"),
        )
      }
    }
    remEdges.foreach { re =>
      if (store.exists("edge_endpoints")) {
        val eps = re
          .select(explode(array(col("source_uuid"), col("target_uuid"))).as("endpoint_uuid"), col("group_id"), col("source_uuid"), col("name"))
          .distinct()
        store.mergeBucketed(
          "edge_endpoints", eps.limit(0), Seq("endpoint_uuid", "group_id", "source_uuid", "name"),
          s"delete group $group", deleteKeys = Some(eps), bucketBy = Seq("endpoint_uuid"),
        )
      }
      refreshEdgeIndexes(re)
    }
    remEpisodes.foreach { rp =>
      if (store.exists("episode_entity_edges"))
        store.mergeBucketed(
          "episode_entity_edges", store.load("episode_entity_edges").limit(0), Seq("uuid"),
          s"delete group $group", deleteKeys = Some(rp.select(col("uuid"))),
        )
      SearchIndexes.refreshText(
        store, "episodes",
        rp.select(col("uuid").as("id"), col("content").as("text")),
        rp.limit(0).select(col("uuid").as("id"), col("content").as("text")),
      )
    }
    remNodes.foreach { rn =>
      SearchIndexes.refreshText(
        store, "nodes",
        rn.select(col("uuid").as("id"), col("name").as("text")),
        rn.limit(0).select(col("uuid").as("id"), col("name").as("text")),
      )
    }
    remCommunities.foreach { rc =>
      SearchIndexes.refreshText(
        store, "communities",
        rc.select(col("uuid").as("id"), col("summary").as("text")),
        rc.limit(0).select(col("uuid").as("id"), col("summary").as("text")),
      )
    }
  }

  /** Delete nodes by uuid, cascading to incident edges (delete_by_uuids).
    * Work ∝ affected rows: the nodes/MENTIONS/stats deletes probe only the
    * buckets holding the uuids, the edge cascade loads only the contention
    * groups the endpoint index names (falling back to a scan when the
    * index is absent), and the search indexes drop exactly the removed
    * rows. Linking state (nodes_raw surfaces, uuid_map) is deliberately
    * kept, mirroring the reference: re-asserting the entity re-creates the
    * node under its established canonical id.
    */
  def deleteNodesByUuids(uuids: Seq[String]): Unit = {
    import spark.implicits._
    val keyDf = uuids.toDF("uuid")
    val hitSrc = col("source_uuid").isin(uuids: _*)
    val hitDst = col("target_uuid").isin(uuids: _*)
    val groupKey = Seq("group_id", "source_uuid", "name")

    val removedNodes = store.loadForKeys("nodes", keyDf, Seq("uuid")).localCheckpoint()
    store.mergeBucketed(
      "nodes", removedNodes.limit(0), Seq("uuid"), s"delete ${uuids.size} nodes",
      deleteKeys = Some(keyDf),
    )

    // edge cascade: groups holding a deleted endpoint, via the endpoint
    // index when present; the surviving rows of those groups re-enter
    val affectedGroups =
      (if (store.exists("edge_endpoints"))
         store.loadForKeys("edge_endpoints", keyDf.select(col("uuid").as("endpoint_uuid")), Seq("endpoint_uuid"))
       else store.load("edges").filter(hitSrc || hitDst))
        .select(groupKey.map(col): _*)
        .distinct()
        .localCheckpoint()
    val stored = store.loadForKeys("edges", affectedGroups, groupKey).localCheckpoint()
    val removedEdges = stored.filter(hitSrc || hitDst).localCheckpoint()
    store.mergeBucketed(
      "edges", stored.filter(!hitSrc && !hitDst), groupKey, "cascade delete node edges",
      deleteKeys = Some(affectedGroups),
    )
    refreshEdgeIndexes(removedEdges)
    dropFromEntityEdges(removedEdges)
    SearchIndexes.refreshText(
      store, "nodes",
      removedNodes.select(col("uuid").as("id"), col("name").as("text")),
      removedNodes.limit(0).select(col("uuid").as("id"), col("name").as("text")),
    )
    if (store.exists("node_stats"))
      store.mergeBucketed(
        "node_stats", store.load("node_stats").limit(0), Seq("cuuid"), "cascade delete node stats",
        deleteKeys = Some(keyDf.select(col("uuid").as("cuuid"))),
      )
    // MENTIONS rows of the deleted entities (bucketed by entity_uuid)
    if (store.exists("episodic_edges")) {
      val stale = store
        .loadForKeys("episodic_edges", keyDf.select(col("uuid").as("entity_uuid")), Seq("entity_uuid"))
        .filter(col("entity_uuid").isin(uuids: _*))
      store.mergeBucketed(
        "episodic_edges", stale.limit(0), Seq("episode_uuid", "entity_uuid"),
        "cascade delete node mentions",
        deleteKeys = Some(stale.select(col("episode_uuid"), col("entity_uuid"))),
        bucketBy = Seq("entity_uuid"),
      )
    }
  }

  /** Hard-delete edges by uuid (remove_edges_incremental /
    * `_remove_edge_by_uuid`, incremental_updater.py:348-389, 1175-1198) —
    * the surviving rows of the touched contention groups re-enter their
    * buckets, every edge-backed index refreshes with the removed rows,
    * and citing episodes' entity_edges lists are patched. Returns the
    * number removed.
    */
  def deleteEdgesByUuids(uuids: Seq[String]): Long = {
    if (uuids.isEmpty) return 0L
    import spark.implicits._
    val groupKey = Seq("group_id", "source_uuid", "name")
    val hit = col("uuid").isin(uuids: _*)
    // keyed locate (edge_uuids probe) — work ∝ targeted buckets
    val (stored0, affected) = locateEdges(uuids.toDF("uuid"))
    if (affected.isEmpty) return 0L
    val stored = stored0.localCheckpoint()
    val removed = stored.filter(hit).localCheckpoint()
    store.mergeBucketed(
      "edges", stored.filter(!hit), groupKey, s"delete ${uuids.size} edges",
      deleteKeys = Some(affected),
    )
    refreshEdgeIndexes(removed)
    dropFromEntityEdges(removed)
    removed.count()
  }

  def buildCommunities(): Unit = Communities.build(store)

  /** detect_graph_communities (huggingface_driver.py:2431-2477): scoped
    * detection with the reference's config knobs; a group-scoped run
    * replaces only those groups' communities.
    */
  def detectGraphCommunities(
      groupIds: Seq[String] = Nil,
      algorithm: String = "label_prop",
      kClusters: Option[Int] = None,
      minClusterSize: Int = 1,
      maxIterations: Int = 10,
  ): Unit = Communities.build(store, maxIterations, algorithm, groupIds, minClusterSize, kClusters)

  /** batch_community_detection (:2643-2694): the reference loops the
    * detector per batch of group ids; each batch here is one scoped
    * distributed run (disjoint groups never interact — entity uuids are
    * group-scoped).
    */
  def batchCommunityDetection(
      groupIdBatches: Seq[Seq[String]],
      algorithm: String = "label_prop",
      kClusters: Option[Int] = None,
      minClusterSize: Int = 1,
  ): Unit = groupIdBatches.foreach(b => detectGraphCommunities(b, algorithm, kClusters, minClusterSize))

  /** parallel_community_detection (:2726-2776): the reference fans a
    * thread pool over group ids; here ALL requested groups run in ONE
    * distributed job — label propagation/CC/louvain never cross group
    * boundaries (no inter-group edges), so a single scoped run IS the
    * parallel execution, with the cluster as the worker pool.
    */
  def parallelCommunityDetection(
      groupIds: Seq[String],
      algorithm: String = "label_prop",
      kClusters: Option[Int] = None,
      minClusterSize: Int = 1,
  ): Unit = detectGraphCommunities(groupIds, algorithm, kClusters, minClusterSize)

  /** get_community_info (:2478-2533). */
  def getCommunityInfo(communityUuid: Option[String] = None, groupIds: Seq[String] = Nil): DataFrame =
    Communities.info(store, communityUuid, groupIds)

  /** community_versioning create/list/restore (:2777-2803) over the
    * snapshot store's version chain.
    */
  def communityVersioning(action: String, versionId: Option[Int] = None): DataFrame =
    Communities.versioning(store, action, versionId)

  /** community_caching (:2804-2859): pin the communities frame in
    * executor memory under a key with a TTL.
    */
  def communityCaching(cacheKey: String, ttlSeconds: Long = 3600L): Long =
    Communities.cacheCommunities(store, cacheKey, ttlSeconds, System.currentTimeMillis())

  /** get_cached_communities (:2832-2859): the pinned frame while fresh. */
  def getCachedCommunities(cacheKey: String): Option[DataFrame] =
    Communities.cachedCommunities(cacheKey, System.currentTimeMillis())

  /** Find communities similar to a query embedding
    * (query_communities_by_embedding, huggingface_driver.py:696-720).
    */
  def communitiesByEmbedding(query: Array[Float], k: Int = 10, minScore: Double = 0.0): DataFrame =
    Communities.byEmbedding(store, query, k, minScore)

  // ------------------------------------------------------------------
  // Entity-level temporal versioning (temporal_versioning,
  // temporal_manager.py:1324-1410): create snapshots the entity's CURRENT
  // node row as the next version; list returns the history. The
  // reference's restore branch is literally "not implemented yet"
  // (:1390-1395) — here it actually writes the versioned state back.
  // Versions live in a bucketed `entity_versions` table keyed by
  // (entity_uuid, version): create/list/restore probe only the entity's
  // bucket, never scan the corpus.
  // ------------------------------------------------------------------

  /** Snapshot the entity's current node row as a new version. Returns the
    * version number, or None if the entity does not exist.
    */
  def createEntityVersion(entityUuid: String, at: Timestamp): Option[Long] = {
    import spark.implicits._
    val key = Seq(entityUuid).toDF("entity_uuid")
    // bucketed probe (nodes is uuid-bucketed once incremental ingest ran;
    // degrades to scan+semi-join on a plain snapshot) — never a corpus scan
    val node = store
      .loadForKeys("nodes", Seq(entityUuid).toDF("uuid"), Seq("uuid"))
      .filter(col("uuid") === entityUuid)
    if (node.isEmpty) return None
    val prior =
      if (!store.exists("entity_versions")) 0L
      else
        store
          .loadForKeys("entity_versions", key, Seq("entity_uuid"))
          .agg(coalesce(max(col("version")), lit(0L)))
          .collect()(0)
          .getLong(0)
    val next = prior + 1L
    val row = node.select(
      col("uuid").as("entity_uuid"),
      lit(next).as("version"),
      col("name"),
      col("group_id"),
      col("labels"),
      col("summary"),
      col("attributes"),
      col("created_at"),
      lit(at).as("versioned_at"),
    )
    store.mergeBucketed(
      "entity_versions", row, Seq("entity_uuid", "version"),
      s"version $next of $entityUuid", bucketBy = Seq("entity_uuid"),
    )
    Some(next)
  }

  /** Version history of an entity, oldest first (list action). */
  def listEntityVersions(entityUuid: String): DataFrame = {
    import spark.implicits._
    if (!store.exists("entity_versions"))
      return store.load("nodes").limit(0).select(
        col("uuid").as("entity_uuid"), lit(0L).as("version"), col("name"), col("group_id"),
        col("labels"), col("summary"), col("attributes"), col("created_at"),
        col("created_at").as("versioned_at"),
      )
    store
      .loadForKeys("entity_versions", Seq(entityUuid).toDF("entity_uuid"), Seq("entity_uuid"))
      .filter(col("entity_uuid") === entityUuid)
      .orderBy(col("version"))
  }

  /** Restore a stored version's state onto the live node row. Returns
    * false when the version does not exist. created_at stays immutable
    * (the reference never rewrites it); name/labels/summary/attributes
    * roll back.
    */
  def restoreEntityVersion(entityUuid: String, version: Long): Boolean = {
    import spark.implicits._
    val v = listEntityVersions(entityUuid).filter(col("version") === version)
    if (v.isEmpty) return false
    val current = store
      .loadForKeys("nodes", Seq(entityUuid).toDF("uuid"), Seq("uuid"))
      .filter(col("uuid") === entityUuid)
    if (current.isEmpty) return false
    val restored = current
      .drop("name", "labels", "summary", "attributes")
      .join(
        v.select(col("entity_uuid").as("uuid"), col("name"), col("labels"), col("summary"), col("attributes")),
        Seq("uuid"),
      )
      .select(current.columns.map(col): _*)
    store.mergeBucketed("nodes", restored, Seq("uuid"), s"restore $entityUuid to v$version")
    true
  }

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

  /** Weighted hybrid search (search_hybrid, huggingface_driver.py:
    * 1092-1136): semantic + keyword + optional center-node graph lanes,
    * min-max normalized, weight-fused.
    */
  def searchHybrid(
      query: String,
      config: graft.search.HybridSearch.HybridConfig = graft.search.HybridSearch.HybridConfig(),
  ): DataFrame = graft.search.HybridSearch.hybridSearch(store, query, config)

  /** search_with_center (huggingface_driver.py:1137-1191) — fails fast on
    * an unknown center node.
    */
  def searchWithCenter(
      query: String,
      centerNode: String,
      config: graft.search.HybridSearch.HybridConfig = graft.search.HybridSearch.HybridConfig(),
  ): DataFrame = graft.search.HybridSearch.searchWithCenter(store, query, centerNode, config)

  /** optimize_search_performance (huggingface_driver.py:1252-1269):
    * force → fold every index from the primaries; else rebuild only the
    * indexes whose delta log outgrew the staleness threshold.
    */
  def optimizeSearchPerformance(forceRebuild: Boolean = false): DataFrame = {
    if (forceRebuild) buildSearchIndexes()
    else graft.search.SearchIndexes.autoRebuild(store)
    getPerformanceMetrics
  }

  /** get_performance_metrics (:1270-1281): per-index rows/versions. */
  def getPerformanceMetrics: DataFrame = graft.search.SearchIndexes.statistics(store)

  /** auto_rebuild_indices / rebuild_indices_if_needed (:1282-1314,
    * 1514-1529): staleness-ratio-triggered rebuilds, one row per index
    * with the action taken.
    */
  def autoRebuildIndices(threshold: Double = 0.8): DataFrame =
    graft.search.SearchIndexes.autoRebuild(store, threshold)

  def rebuildIndicesIfNeeded(threshold: Double = 0.8): DataFrame = autoRebuildIndices(threshold)

  /** Query-pattern monitor (performance_optimizer.py:788-920): record
    * observations, aggregate patterns, get rule-based tuning suggestions.
    */
  lazy val queryMonitor = new graft.search.QueryMonitor(store)

  /** Delta operation log (create/apply/rollback/merge/chunked deltas,
    * incremental_updater.py Delta machinery) — see streaming.Deltas.
    */
  lazy val deltas = new graft.streaming.Deltas(this)

  /** upsert_entity / add_entity_incremental / bulk_upsert_entities
    * (huggingface_driver.py:1315-1331, 1616-1705): insert-if-absent node
    * saves through the pipeline's exact surfaces (nodes_raw, node_blocks,
    * nodes, keyword index). One distributed merge for any batch size.
    * Returns the number inserted (existing names pass through).
    */
  def bulkUpsertEntities(names: Seq[String], createdAt: Timestamp = Timestamp.valueOf("2024-01-01 00:00:00")): Long = {
    import spark.implicits._
    graft.io.Migration.saveNodes(store, names.toDF("name"), groupId, createdAt, tag = "bulk_upsert_entities")
  }

  def upsertEntity(name: String, createdAt: Timestamp = Timestamp.valueOf("2024-01-01 00:00:00")): Long =
    bulkUpsertEntities(Seq(name), createdAt)

  /** upsert_edge / add_edge_incremental / bulk_upsert_edges
    * (huggingface_driver.py:1333-1351, 1641-1749): triplets through the
    * canonical-probe merge — re-asserted facts adopt the stored row
    * (append episode, keep original valid_at), contradictions invalidate;
    * every edge index refreshes inside the merge.
    */
  def bulkUpsertEdges(triplets: Seq[(String, String, String)], validAt: Timestamp): Unit = {
    import spark.implicits._
    graft.io.Migration.batchAddTriplets(
      store,
      triplets.toDF("source", "relation", "target"),
      groupId,
      batchSize = Int.MaxValue,
      validAt = validAt,
    )
    ()
  }

  def upsertEdge(subj: String, pred: String, obj: String, validAt: Timestamp): Unit =
    addTriplet(subj, pred, obj, validAt)

  /** batch_search_hybrid (huggingface_driver.py:1192-1236): every query in
    * ONE distributed job (the reference loops hybrid_search per query).
    */
  def batchSearchHybrid(
      queries: Seq[(Long, String)],
      config: graft.search.HybridSearch.HybridConfig = graft.search.HybridSearch.HybridConfig(),
  ): DataFrame = graft.search.HybridSearch.batchHybridSearch(store, queries, config)

  /** get_hybrid_search_stats (huggingface_driver.py:1237-1245). */
  def hybridSearchStats: DataFrame = graft.search.HybridSearch.stats(store)

  /** Episode retrieval window (retrieve_episodes,
    * graph_data_operations.py:122-181): last n episodes with
    * valid_at <= referenceTime, optionally scoped to `groupIds` and an
    * episode `source` kind — the reference's two optional Cypher filters
    * (graph_data_operations.py:144-151). All three predicates push down to
    * the episodes scan before the distributed top-n.
    */
  def retrieveEpisodes(
      referenceTime: Timestamp,
      lastN: Int = 3,
      groupIds: Seq[String] = Nil,
      source: Option[String] = None,
  ): DataFrame = {
    val g = if (groupIds.isEmpty) lit(true) else col("group_id").isin(groupIds: _*)
    val s = source.map(col("source") === lit(_)).getOrElse(lit(true))
    val picked = store
      .load("episodes")
      .filter(col("valid_at") <= lit(referenceTime) && g && s)
      .orderBy(col("valid_at").desc, col("uuid"))
      .limit(lastN)
    attachEntityEdges(picked)
  }

  /** search_results_to_context_string (search_helpers.py:27-80). */
  def resultsToContextString(results: SearchResults): String =
    graft.search.ContextString.contextString(results)

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

  /** Time-bounded text search (temporal_search, huggingface_driver.py:
    * 2081-2132): records in the validity window whose fact/name CONTAINS
    * the query (case-insensitive substring — the reference's matching
    * rule, not BM25). With both bounds given, edges ride the month-bucket
    * index probe; open bounds fall back to a direct filter. Deterministic
    * (valid_at, uuid) order.
    */
  def temporalSearch(
      query: String,
      start: Option[Timestamp] = None,
      end: Option[Timestamp] = None,
      limit: Int = 10,
      entityType: String = "edge",
  ): DataFrame = {
    require(Seq("edge", "node").contains(entityType), s"unknown entity type $entityType")
    val q = query.toLowerCase
    entityType match {
      case "edge" =>
        val ranged = (start, end) match {
          case (Some(s), Some(e)) => edgesValidInRange(s, e)
          case _ =>
            var df = store.load("edges")
            start.foreach(s => df = df.filter(col("valid_at") >= lit(s)))
            end.foreach(e => df = df.filter(col("valid_at") < lit(e)))
            df
        }
        val matched = if (q.isEmpty) ranged else ranged.filter(lower(col("fact")).contains(q))
        matched.orderBy(col("valid_at"), col("uuid")).limit(limit)
      case "node" =>
        // nodes carry created_at only (the reference's node temporal
        // records key on it)
        var df = store.load("nodes")
        start.foreach(s => df = df.filter(col("created_at") >= lit(s)))
        end.foreach(e => df = df.filter(col("created_at") < lit(e)))
        val matched = if (q.isEmpty) df else df.filter(lower(col("name")).contains(q))
        matched.orderBy(col("created_at"), col("uuid")).limit(limit)
    }
  }

  /** Edges whose valid_at ∈ [from, to), probing the month-bucket temporal
    * index when built (performance_optimizer.py:424-511) — work ∝
    * matching months, not corpus.
    */
  def edgesValidInRange(from: Timestamp, to: Timestamp): DataFrame =
    graft.search.SearchIndexes.edgesValidInRange(store, from, to)

  // ------------------------------------------------------------------
  // Temporal analysis surface (get_temporal_stats / consistency /
  // dedup / anomalies / range / point / aggregation wrappers,
  // huggingface_driver.py:2064-2368) — all delegating to the
  // distributed aggregations in kg.TemporalOps.
  // ------------------------------------------------------------------

  /** get_temporal_stats (temporal_statistics, temporal_manager.py:977). */
  def getTemporalStats: DataFrame = TemporalOps.temporalStats(store)

  /** event_occurrence_distribution by month (temporal_manager.py:100). */
  def temporalOccurrenceDistribution: DataFrame = TemporalOps.occurrenceDistribution(store)

  /** temporal_consistency_check (temporal_manager.py:713-768). */
  def temporalConsistencyCheck(
      checkTypes: Seq[String] = Seq("validity_periods", "overlapping_records", "missing_temporal_data"),
  ): DataFrame = TemporalOps.consistencyCheck(store, checkTypes)

  /** temporal_deduplication (temporal_manager.py:620-712): invalidates
    * every within-window duplicate but the latest-created record — edges
    * per logical edge, routed through [[invalidateEdges]] so every
    * derived index tracks the stamped rows, AND nodes per (group, name)
    * cluster, stamped `invalidated_at` in place (the reference's node
    * half, :672-695 — "nodes don't have direct invalidation", so only
    * the flag column is written, via the keyed bucketed merge).
    *
    * The node half is RECORD-ONLY parity, deliberately: the reference
    * writes the column and never filters on it anywhere (no search lane,
    * lookup, or lifecycle path reads it back — :672-695 is the only
    * writer), so flagged nodes stay fully visible here too. Consumers
    * that want them hidden filter explicitly
    * (`store.load("nodes").filter(col("invalidated_at").isNull)`);
    * auto-hiding them would diverge from reference behavior.
    *
    * Returns the total number invalidated. The uuid lists are collected — they
    * are ∝ duplicates found, not corpus; callers on a corpus suspected
    * of massive duplication should bound the sweep by group via
    * deleteGroup-style partitioning first.
    */
  def temporalDeduplication(at: Timestamp, windowHours: Int = 24): Long = {
    val dups = TemporalOps.duplicateTemporalUuids(store, windowHours).collect().map(_.getString(0)).toSeq
    if (dups.nonEmpty) invalidateEdges(dups, at, "temporal_deduplication")
    val nodeDups =
      if (!store.exists("nodes")) Seq.empty[String]
      else TemporalOps.duplicateTemporalNodeUuids(store, windowHours).collect().map(_.getString(0)).toSeq
    if (nodeDups.nonEmpty) {
      import spark.implicits._
      val stored = store.loadForKeys("nodes", nodeDups.toDF("uuid"), Seq("uuid"))
      val flagged =
        (if (stored.columns.contains("invalidated_at")) stored
         else stored.withColumn("invalidated_at", lit(null).cast("timestamp")))
          .withColumn("invalidated_at", lit(at))
      store.mergeBucketed(
        "nodes", flagged, Seq("uuid"),
        s"temporal_deduplication: ${nodeDups.size} duplicate nodes",
      )
    }
    (dups.size + nodeDups.size).toLong
  }

  /** Episode-level validation report (EpisodeProcessor.validate_episode,
    * episode_processor.py:526-577): re-extracts deterministically from the
    * STORED episode content and reports (url, issue, detail) rows —
    * empty-name/fact, dangling edge endpoints, inverted validity
    * intervals, sub-10% content coverage. One url or the whole corpus in
    * one distributed pass.
    */
  def validateEpisodes(url: Option[String] = None, coverageFloor: Double = 0.1): DataFrame = {
    var eps = store.load("episodes")
    url.foreach(u => eps = eps.filter(col("name") === u))
    EpisodeValidation.validatePages(
      eps.select(col("name").as("url"), col("content").as("text"), col("valid_at").as("warc_ts")),
      coverageFloor,
    )
  }

  /** detect_temporal_anomalies (temporal_manager.py:1182-1225). */
  def detectTemporalAnomalies(
      anomalyTypes: Seq[String] = Seq("gaps", "overlaps", "inconsistencies", "outliers"),
  ): DataFrame = TemporalOps.detectAnomalies(store, anomalyTypes)

  /** temporal_range_query (temporal_manager.py:812-849). */
  def temporalRangeQuery(
      start: Timestamp,
      end: Timestamp,
      entityType: String = "edge",
      groupIds: Seq[String] = Nil,
      limit: Option[Int] = None,
  ): DataFrame = TemporalOps.rangeQuery(store, start, end, entityType, groupIds, limit)

  /** temporal_point_query (temporal_manager.py:850-884). */
  def temporalPointQuery(t: Timestamp, entityType: String = "edge"): DataFrame =
    TemporalOps.pointQuery(store, t, entityType)

  /** temporal_aggregation (temporal_manager.py:885-975). */
  def temporalAggregation(
      aggregationType: String,
      start: Timestamp,
      end: Timestamp,
      groupBy: Option[String] = None,
      entityType: String = "edge",
  ): DataFrame = TemporalOps.aggregation(store, aggregationType, start, end, groupBy, entityType)

  /** get_historical_data (huggingface_driver.py:2135-2178) — the
    * range-query rows; the reference's envelope counts are one count()
    * away.
    */
  def getHistoricalData(
      start: Timestamp,
      end: Timestamp,
      entityType: String = "edge",
      groupIds: Seq[String] = Nil,
      limit: Option[Int] = None,
  ): DataFrame = temporalRangeQuery(start, end, entityType, groupIds, limit)

  // ------------------------------------------------------------------
  // Driver point lookups (huggingface_driver.py:512-643). By-uuid reads
  // are KEYED probes, never corpus scans: uuids are md5 hashes, so
  // parquet row-group min/max stats prune nothing for a pushed-down
  // uuid predicate and a 100 TB store would read everything. Node-kind
  // tables are uuid-bucketed (loadForKeys reads only the key's hash
  // bucket); edges route through the same edge_uuids locate probe the
  // point mutations use. The group lookups order deterministically
  // before the limit (the reference's head(limit) over an unordered
  // pandas frame is nondeterministic — here equal calls return equal
  // rows).
  // ------------------------------------------------------------------

  private def tableOf(kind: String): String = kind.toLowerCase match {
    case "entity" | "node" | "nodes" => "nodes"
    case "episodic" | "episode" | "episodes" => "episodes"
    case "community" | "communities" => "communities"
    case "edge" | "edges" | "entityedge" => "edges"
    case other => sys.error(s"unknown entity kind: $other")
  }

  /** get_node_by_uuid (huggingface_driver.py:512-534); None = the
    * reference's NodeNotFoundError. Bucket probe on the uuid-bucketed
    * node tables — work ∝ one bucket, not the corpus (falls back to a
    * scan + semi-join only on ad-hoc plain-committed fixtures).
    */
  def getNodeByUuid(uuid: String, nodeType: String = "Entity"): Option[org.apache.spark.sql.Row] = {
    import spark.implicits._
    val t = tableOf(nodeType)
    // edges are bucketed by contention group, not uuid — a uuid-keyed
    // bucket probe there would hash into the wrong buckets and miss
    if (t == "edges") getEdgeByUuid(uuid)
    else store.loadForKeys(t, Seq(uuid).toDF("uuid"), Seq("uuid")).limit(1).collect().headOption
  }

  /** get_edge_by_uuid (huggingface_driver.py:600-622) — the edge_uuids
    * by-uuid index locates the row's contention group, then only that
    * group's bucket is probed (the exact locate the write-side mutations
    * ride; a scan here read the corpus to return one row).
    */
  def getEdgeByUuid(uuid: String): Option[org.apache.spark.sql.Row] = {
    import spark.implicits._
    val (stored, _) = locateEdges(Seq(uuid).toDF("uuid"))
    stored.filter(col("uuid") === lit(uuid)).limit(1).collect().headOption
  }

  /** get_nodes_by_group_ids (huggingface_driver.py:535-556). */
  def getNodesByGroupIds(groupIds: Seq[String], nodeType: String = "Entity", limit: Option[Int] = None): DataFrame = {
    val base = store
      .load(tableOf(nodeType))
      .filter(col("group_id").isin(groupIds: _*))
      .orderBy(col("uuid"))
    limit.fold(base)(base.limit)
  }

  /** get_edges_by_group_ids (huggingface_driver.py:623-643). */
  def getEdgesByGroupIds(groupIds: Seq[String], limit: Option[Int] = None): DataFrame = {
    val base = store.load("edges").filter(col("group_id").isin(groupIds: _*)).orderBy(col("uuid"))
    limit.fold(base)(base.limit)
  }

  // ------------------------------------------------------------------
  // Vector queries (query_*_by_embedding + batch variants,
  // huggingface_driver.py:644-817). Single-vector calls are the batch
  // path with one query; the batch path runs EVERY query vector in ONE
  // distributed job (the reference loops semantic_search per vector).
  // Edges probe the committed `edge_ann` signature buckets when present
  // (~1/256 of the corpus per query, FAISS-index analog); nodes /
  // communities score their (much smaller) tables exactly.
  // ------------------------------------------------------------------

  private def topKByEmbedding(
      table: String,
      vecCol: String,
      embeddings: Seq[Array[Float]],
      k: Int,
      threshold: Double,
  ): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    val queries = embeddings.zipWithIndex
      .map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("qid", "qv")
    val corpus = store.load(table)
    val scored = graft.sim.Ann
      .bruteForceTopK(queries, corpus.select(col("uuid").as("id"), col(vecCol).as("v")), k)
      .filter(col("score") >= lit(threshold))
    scored.join(corpus, scored("id") === corpus("uuid")).drop("id").orderBy(col("qid"), col("rk"))
  }

  /** query_nodes_by_embedding (:644-668): top-k nodes by name-embedding
    * cosine ≥ threshold, full node rows + (qid, rk, score).
    */
  def queryNodesByEmbedding(embedding: Array[Float], k: Int = 10, threshold: Double = 0.0): DataFrame =
    topKByEmbedding("nodes", "name_embedding", Seq(embedding), k, threshold)

  /** query_communities_by_embedding (:696-720). */
  def queryCommunitiesByEmbedding(embedding: Array[Float], k: Int = 10, threshold: Double = 0.0): DataFrame =
    topKByEmbedding("communities", "summary_embedding", Seq(embedding), k, threshold)

  /** batch_query_nodes_by_embedding (:722-752) — one job for all vectors. */
  def batchQueryNodesByEmbedding(embeddings: Seq[Array[Float]], k: Int = 10, threshold: Double = 0.0): DataFrame =
    topKByEmbedding("nodes", "name_embedding", embeddings, k, threshold)

  /** query_edges_by_embedding (:670-694) / batch (:754-784): probes the
    * edge_ann signature buckets when the index exists (same-bucket
    * candidates only — the IVF-style approximation disclosed on the
    * search lane); exact corpus scoring otherwise.
    */
  def queryEdgesByEmbedding(embedding: Array[Float], k: Int = 10, threshold: Double = 0.0): DataFrame =
    batchQueryEdgesByEmbedding(Seq(embedding), k, threshold)

  def batchQueryEdgesByEmbedding(embeddings: Seq[Array[Float]], k: Int = 10, threshold: Double = 0.0): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    val queries = embeddings.zipWithIndex
      .map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("qid", "qv")
    val edges = store.load("edges")
    val scored =
      if (store.exists("edge_ann")) {
        val annP = graft.search.SearchIndexes.annPlanes
        val q = queries.select(
          col("qid"),
          col("qv"),
          explode(
            graft.sim.Ann.probeSignaturesCol(col("qv"), annP, graft.search.SearchIndexes.annProbes),
          ).as("sig"),
        )
        val cands = graft.search.SearchIndexes
          .annForSigs(store, q.select(col("sig")).distinct())
          // dropped/invalid uuids may linger in a stale bucket between
          // refreshes — trim to live edges before scoring
          .join(edges.select(col("uuid")), Seq("uuid"), "left_semi")
        val all = cands
          .join(broadcast(q), Seq("sig"))
          .withColumn("score", round(graft.search.Vectors.cosine(col("v"), col("qv")), 6))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid"))
          .orderBy(col("score").desc, col("uuid"))
        all
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= k)
          .select(col("qid"), col("rk"), col("uuid").as("id"), col("score"))
      } else
        graft.sim.Ann.bruteForceTopK(queries, edges.select(col("uuid").as("id"), col("fact_embedding").as("v")), k)
    val kept = scored.filter(col("score") >= lit(threshold))
    kept.join(edges, kept("id") === edges("uuid")).drop("id").orderBy(col("qid"), col("rk"))
  }

  /** get_vector_search_stats (:786-817): per-index row counts/versions
    * from the committed search-index statistics, filtered to the vector
    * surface.
    */
  def vectorSearchStats: DataFrame =
    graft.search.SearchIndexes.statistics(store).filter(col("index").startsWith("edge_ann"))

  // ------------------------------------------------------------------
  // Traversal facade (traverse_graph / batch_traversal,
  // huggingface_driver.py:862-1077)
  // ------------------------------------------------------------------

  /** BFS reachability (node, dist) from one start node — probes the
    * src-bucketed adjacency index when committed (work ∝ frontier), full
    * edge-relation joins otherwise.
    */
  def traverseGraph(start: String, maxDepth: Int = 3): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    if (store.exists("graph_adj"))
      graft.graph.GraphOps.bfsIndexed(
        frontier => graft.search.SearchIndexes.adjacencyForKeys(store, frontier).select(col("src"), col("dst")),
        Seq(start).toDF("node"),
        maxDepth,
      )
    else {
      val adj = store.load("edges").select(col("source_uuid").as("src"), col("target_uuid").as("dst"))
      graft.graph.GraphOps.bfs(graft.graph.GraphOps.undirect(adj), Seq(start).toDF("node"), maxDepth)
    }
  }

  /** batch_traversal (:1028-1077) — every start node's BFS advances in the
    * SAME superstep joins (one distributed job), not the reference's
    * per-start loop. Returns (origin, node, dist).
    */
  def batchTraversal(starts: Seq[String], maxDepth: Int = 3): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    val sources = starts.map(s => (s, s)).toDF("origin", "node")
    val adj = store.load("edges").select(col("source_uuid").as("src"), col("target_uuid").as("dst"))
    graft.graph.GraphOps.bfsMulti(graft.graph.GraphOps.undirect(adj), sources, maxDepth)
  }

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
