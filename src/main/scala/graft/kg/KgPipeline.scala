package graft.kg

import graft.io.SnapshotStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end KG construction: pages → episodes → extraction → linking →
  * canonicalization → bitemporal materialization, every stage committed as
  * a snapshot (resume = skip stages whose input fingerprint is already
  * committed). This is the Spark re-expression of
  * `Graphiti.add_episode_bulk` (`graphiti.py:587-873`; SURVEY.md §3.2).
  *
  * Scale shape: extraction is per-page (no shuffle; pages pre-partitioned
  * by url hash), linking shuffles only the (small) distinct-entity table,
  * canonicalization runs on duplicate pairs only, and edge materialization
  * shuffles once on the contention key. At 10^12 documents each stage's
  * snapshot is a partitioned table and the same code runs per
  * url-hash-bucket; nothing below collects rows to the driver.
  */
final class KgPipeline(
    store: SnapshotStore,
    groupId: String = "default",
    buildIndexes: Boolean = true,
    // extract_nodes(excluded_entity_types) — entities of these types (and
    // the triples referencing them) never enter the graph
    // (node_operations.py:74,163-164)
    excludedEntityTypes: Seq[String] = Nil,
) {

  private def fp(stage: String, parts: Seq[Any]): String =
    graft.kg.Ids.entity("fp", stage + "|" + parts.mkString("|"))

  Extract.validateExcludedEntityTypes(excludedEntityTypes)

  // the exclusion config participates in every post-extraction stage
  // fingerprint: a resume under a DIFFERENT exclusion list must rebuild,
  // not silently reuse the old extraction's snapshots
  private val exclKey = excludedEntityTypes.sorted.mkString(",")

  private val verbose = sys.env.get("SPARK_GRAFT_VERBOSE").contains("1")

  // Corpus-scale primary layout (`-Dgraft.bulk.bucketed=true`): commit the
  // incrementally-merged primaries (episodes / nodes_raw / uuid_map /
  // nodes / edges / episodic_edges) BUCKETED at bulk time, so the FIRST
  // micro-batch after a bulk load merges ∝ batch. With plain commits
  // (default — the committed small-SF bench path, which skips one
  // full-width repartition shuffle per primary) that first merge pays the
  // one-time plain→bucketed fold of the WHOLE table: acceptable at test
  // SF, a corpus rewrite at 10^12 documents. The two modes are
  // value-identical (BucketedPrimariesSpec differential); keyed reads
  // (getNodeByUuid, locateEdges fallback) additionally probe instead of
  // scan from the moment the bulk commits.
  private val bucketedPrimaries = sys.props.get("graft.bulk.bucketed").contains("true")

  /** Primary-table commit honoring [[bucketedPrimaries]]: plain snapshot
    * commit, or a keyed bucketed merge with replace semantics (stale keys
    * of a replaced corpus deleted — same content as the plain commit).
    */
  private def commitPrimary(
      df: org.apache.spark.sql.DataFrame,
      table: String,
      key: Seq[String],
      bucketBy: Seq[String],
      msg: String,
      fingerprint: String,
  ): Unit =
    if (!bucketedPrimaries) { store.commit(df, table, msg, fingerprint); () }
    else {
      val stale =
        if (!store.exists(table)) None
        else Some(
          store.load(table).select(key.map(org.apache.spark.sql.functions.col): _*).distinct()
            .join(df, key, "left_anti"),
        )
      store.mergeBucketed(table, df, key, msg, deleteKeys = stale, bucketBy = bucketBy, fingerprint = fingerprint)
      ()
    }

  private def timed[T](stage: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    if (verbose) println(f"[kg] $stage%-20s ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  /** Run (or resume) all stages over the given pages frame.
    * `inputFingerprint` identifies the input corpus snapshot — stages with
    * an already-committed matching fingerprint are skipped.
    */
  def run(pages: DataFrame, inputFingerprint: String): Unit = {
    val spark = pages.sparkSession
    import spark.implicits._

    // ---- stages 1+2: episodes (one per page; valid_at = crawl time,
    // content = deterministic extracted text — graphiti.py:477-490) and
    // extraction (mentions + raw triples; mapPartitions / codegen'd regex
    // — extract_nodes + extract_edges contracts). HTML→text runs exactly
    // once into a PERSISTED frame; the episodes commit (a full-text write)
    // and triple extraction both consume it as CONCURRENT jobs, so the
    // critical path never serializes write→re-read→decode of the page
    // text. The extracted triples are PERSISTED too: every downstream
    // stage reads this cache, and the raw_triples commit itself moves into
    // the next concurrent group (a pure write of cached rows that nothing
    // downstream waits for) — the old shape committed the table and then
    // paid a full parquet decode of millions of facts to read its own
    // output back on the critical path. On resume (episodes committed,
    // triples not) extraction falls back to the committed snapshot. ----
    val episodesFp = fp("episodes", Seq(inputFingerprint, groupId))
    val episodesEeFp = fp("episodes_ee", Seq(inputFingerprint, groupId, exclKey))
    val triplesFp = fp("raw_triples", Seq(inputFingerprint, groupId, exclKey))
    var triplesMem: DataFrame = null
    timed("episodes+triples") {
      val needEpisodes = !store.hasFingerprint("episodes", episodesFp)
      val needTriples = !store.hasFingerprint("raw_triples", triplesFp)
      var episodesMem: DataFrame = null
      if (needEpisodes) {
        // HTML→text via the fused fast twin (byte-identical to the column
        // chain, HtmlTextSpec): 2 passes over the bytes instead of 12
        val gid = groupId
        episodesMem = pages
          .select(col("url"), col("warc_ts"), col("html"), col("text"))
          .as[(String, java.sql.Timestamp, Array[Byte], String)]
          .mapPartitions { it =>
            it.map { case (url, ts, html, text) =>
              val t = if (text != null) text else HtmlText.extractFast(new String(html, "UTF-8"))
              (Ids.episode(gid, url), url, t, "text", "web crawl", gid, ts, ts)
            }
          }
          .toDF("uuid", "name", "content", "source", "source_description", "group_id", "created_at", "valid_at")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      }
      if (needTriples) {
        val withText = (if (needEpisodes) episodesMem else store.load("episodes"))
          .select(col("name").as("url"), col("content").as("text"), col("valid_at").as("warc_ts"))
        triplesMem = Extract.excludeTypes(Extract.triplesTs(spark, withText), excludedEntityTypes)
          .withColumn("group_id", lit(groupId))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      }
      graft.io.Concurrent.runAll(Seq(
        () => if (needEpisodes) commitPrimary(episodesMem, "episodes", Seq("uuid"), Seq("uuid"), s"ingest episodes group=$groupId", episodesFp),
        () => if (triplesMem != null) triplesMem.count(), // extraction rides the episodes write
      ))
      if (episodesMem != null) episodesMem.unpersist(blocking = false)
    }

    // One shared, persisted frame of raw triples feeds stage 3, the
    // surface-stats pre-aggregation and stages 5/6/7 (concurrent
    // consumers). Fresh build: the just-extracted cache (materialized
    // above). Resume: one parquet decode of the committed snapshot.
    // MEMORY_AND_DISK: at cluster scale a partition that doesn't fit
    // spills instead of evicting (re-scan stays the fallback).
    // Unpersisted right after the stage-5-9 group.
    val rawTriples =
      if (triplesMem != null) triplesMem
      else store.load("raw_triples").persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val nodesRawFp = fp("nodes_raw", Seq(inputFingerprint, groupId, exclKey))
    val mapFp = fp("uuid_map", Seq(inputFingerprint, groupId, exclKey))
    val nodesFp = fp("nodes", Seq(inputFingerprint, groupId, exclKey))
    val edgesFp = fp("edges", Seq(inputFingerprint, groupId, exclKey))

    // ---- stages 3+4 (raw entity nodes → linking + canonical map), run
    // CONCURRENTLY with (a) the per-SURFACE mention-stats aggregation
    // (stage 5's heavy input) and (b) the IDENTITY-REMAP edge pre-build
    // (stage 6's heavy input). Rationale for (b): dedupe + contradiction
    // invalidation + fact embeddings + uuids are all *independent of the
    // canonical map for every contention group the map does not touch* —
    // and the map covers only duplicate components (usually a tiny
    // fraction of surfaces). So the full edge build runs with uuid := raw
    // entity uuid while linking runs, and stage 6 afterwards REBUILDS ONLY
    // the contention groups holding an endpoint the canonical map moves
    // (the same affected-group algebra as incremental mergeEdges). The
    // expensive shuffle/window/embed work rides in linking's shadow
    // instead of serializing after it. ----
    var surfaceStats: DataFrame = null
    var edgesPre: DataFrame = null
    // native codegen expression, not a UDF: no per-row encoder boundary in
    // the hottest stage (see graft.functions.EmbedText)
    val embedUdf = (c: org.apache.spark.sql.Column) => graft.functions.Functions.embedText(c)
    def edgeUuid(df: DataFrame): DataFrame = df.withColumn(
      "uuid",
      md5(
        concat_ws(
          "|",
          lit("ed"),
          col("group_id"),
          col("source_uuid"),
          col("name"),
          col("target_uuid"),
          col("valid_at").cast("string"),
        ),
      ),
    )
    // Fused surface aggregation + node projection: ONE groupBy over the
    // exploded mentions yields the distinct surface set with its stats
    // (the old separate `.distinct()` was a second full-width shuffle of
    // the same exploded rows), and the node columns (deterministic md5
    // uuid, CASE label, native graft_embed embedding) attach as a PURE
    // CODEGEN projection on top — one cached frame (`nodesFull`) feeds
    // the nodes_raw commit, linking, node_stats and stage 5, replacing
    // the old mapPartitions node build + the parquet re-decode of
    // nodes_raw that stages 4/5 used to pay.
    var nodesFull: DataFrame = null
    // ---- dependency-driven stage scheduling (guide §2.6: overlap
    // independent jobs): stages 5 (nodes), 7 (episodic_edges) and
    // 8 (duplicate_of) depend only on the LINKING leg (uuid_map +
    // surface stats), not on the edge pre-build — they start the moment
    // uuid_map commits and back-fill cores while edges_pre's tail still
    // runs. Stage 6 (edges) needs BOTH legs: it launches from the
    // edges_pre thread as soon as uuid_map has committed (latch), instead
    // of a global barrier holding every stage to max(legA, legB). The
    // ok-flag guards the failure path: a failed uuid_map stage must fail
    // stage 6 too, never let it commit (and fingerprint-stamp) edges
    // built against a missing map.
    val uuidMapReady = new java.util.concurrent.CountDownLatch(1)
    @volatile var uuidMapOk = false
    // legB: surface aggregation → (nodes_raw ∥ uuid_map) → stages 5/7/8.
    // Invoked from the scheduling block at the end of run() (local stage
    // defs below can't be forward-referenced, so the leg takes the three
    // follow-on stages as arguments).
    def legLinking(followOn: Seq[() => Unit]): Unit = {
      {
        val needNodesRaw = !store.hasFingerprint("nodes_raw", nodesRawFp)
        if (needNodesRaw || !store.hasFingerprint("nodes", nodesFp)) {
          timed("surface_agg") {
            nodesFull = Extract
              .entityNodes(
                rawTriples
                  .select(explode(array(col("subj"), col("obj"))).as("name"), col("fact"), col("warc_ts"))
                  .groupBy(col("name"))
                  .agg(
                    min(col("fact")).as("summary"),
                    min(col("warc_ts")).as("created_at"),
                    count(lit(1)).as("mention_count"),
                  ),
                groupId,
                keep = Seq("summary", "created_at", "mention_count"),
              )
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            nodesFull.count()
            surfaceStats =
              nodesFull.select(col("uuid"), col("summary"), col("created_at"), col("mention_count"))
          }
        }
        // stage 3 (nodes_raw commit — a projection of the cached frame) and
        // stage 4 (LSH blocking → score → union-find min-uuid,
        // dedupe_nodes_bulk semantics) write DISJOINT tables and both read
        // `nodesFull`'s cache — concurrent. Web-scale corpora commonly
        // have ZERO duplicate surface pairs — checkpoint the pair set and
        // skip the CC superstep machinery entirely when it is empty.
        graft.io.Concurrent.runAll(Seq(
          () => timed("nodes_raw") {
            if (needNodesRaw) {
              commitPrimary(
                nodesFull.select("uuid", "name", "label", "name_embedding", "group_id"),
                "nodes_raw", Seq("uuid"), Seq("uuid"), "raw entity nodes", nodesRawFp,
              )
            }
            // derived-index reconcile: node_blocks is the incremental
            // candidate-probe index over nodes_raw, trusted whenever it
            // exists (IncrementalIngest linking). This commit REPLACED
            // nodes_raw, so a pre-existing index misses every new node —
            // the next micro-batch would silently skip true duplicates.
            // Rebuild with stale-key deletion; fingerprint-stamped so a
            // crash between the commit and this merge converges on resume.
            if (store.exists("node_blocks") && !store.hasFingerprint("node_blocks", nodesRawFp)) {
              val src = if (nodesFull != null) nodesFull else store.load("nodes_raw")
              val fresh = Linking.blockingKeys(src).localCheckpoint()
              val stale = store.load("node_blocks").select(col("key"), col("uuid"))
                .join(fresh, Seq("key", "uuid"), "left_anti")
              store.mergeBucketed(
                "node_blocks", fresh, Seq("key", "uuid"), "bulk reconcile node_blocks",
                deleteKeys = Some(stale), bucketBy = Seq("key"), fingerprint = nodesRawFp,
              )
            }
          },
          () => timed("uuid_map") { try {
            if (!store.hasFingerprint("uuid_map", mapFp)) {
              // linking needs only (uuid, name, group_id) — from the cache
              // when this run built it, else a pruned scan of nodes_raw
              val linkInput =
                if (nodesFull != null) nodesFull.select(col("uuid"), col("name"), col("group_id"))
                else store.load("nodes_raw").select(col("uuid"), col("name"), col("group_id"))
              val pairs = Linking
                .duplicatePairs(linkInput)
                .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
              val uuidMap =
                if (pairs.isEmpty) pairs.select(col("u1").as("uuid"), col("u2").as("canonical")).limit(0)
                else Linking.canonicalMap(pairs)
              commitPrimary(uuidMap, "uuid_map", Seq("canonical"), Seq("canonical"), "canonical uuid map", mapFp)
              pairs.unpersist(blocking = false)
            }
            // same hazard as node_blocks: addTriplet and incremental
            // linking probe uuid_map_by_uuid whenever it exists — after
            // this run replaced uuid_map, a stale by-uuid copy would
            // remap endpoints through a dead canonical map
            if (store.exists("uuid_map_by_uuid") && !store.hasFingerprint("uuid_map_by_uuid", mapFp)) {
              val fresh = store.load("uuid_map")
              val stale = store.load("uuid_map_by_uuid").select(col("uuid"))
                .join(fresh, Seq("uuid"), "left_anti")
              store.mergeBucketed(
                "uuid_map_by_uuid", fresh, Seq("uuid"), "bulk reconcile uuid_map_by_uuid",
                deleteKeys = Some(stale), fingerprint = mapFp,
              )
            }
            // signal the edge leg: uuid_map is committed and usable. The
            // ok-flag stays false on failure (latch still released in the
            // finally) so stage 6 fails instead of building against a
            // missing/stale map.
            uuidMapOk = true
          } finally uuidMapReady.countDown() },
        ))
      }
      // stages 5/7/8 (linking-leg dependents) start here — while the
      // edges_pre leg may still be running on its own thread
      graft.io.Concurrent.runAll(followOn)
    }

    // legA: edge pre-build in linking's shadow, then stage 6 as soon as
    // uuid_map is committed (latch) — no global barrier.
    def legEdges(followOn: () => Unit): Unit = {
      timed("edges_pre") { if (!store.hasFingerprint("edges", edgesFp)) {
          val raw = rawTriples.select(
            md5(concat(lit(s"en|$groupId|"), col("subj"))).as("source_uuid"),
            col("pred").as("name"),
            md5(concat(lit(s"en|$groupId|"), col("obj"))).as("target_uuid"),
            col("fact"),
            lit(groupId).as("group_id"),
            col("warc_ts").as("valid_at"),
            col("warc_ts").as("created_at"),
            array(md5(concat(lit(s"ep|$groupId|"), col("url")))).as("episodes"),
          )
          // fact_embedding is NOT materialized here: the cached pre-build
          // feeds the commit AND the entity_edges derivation, and only the
          // commit needs embeddings — attaching them in the commit
          // projection keeps ~|edges|×dim floats out of the cache fill
          // (embed is a pure codegen expression, computed exactly once
          // either way)
          edgesPre = edgeUuid(Invalidation.dedupeAndInvalidate(raw))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          edgesPre.count() // materialize inside linking's shadow
        } }
      uuidMapReady.await()
      require(uuidMapOk, "uuid_map stage failed — not building edges against a missing canonical map")
      followOn()
    }

    // ---- stages 5-9 all depend only on raw_triples + uuid_map (stage 9
    // additionally on stage 6's edges) and write DISJOINT tables, so they
    // run as concurrent Spark jobs (graft.io.Concurrent), scheduled
    // dependency-driven: nodes/episodic_edges/duplicate_of launch off the
    // linking leg, (edges → episodes_ee) off the edges leg once uuid_map
    // has committed. Resume semantics unchanged — each stage still
    // checks/commits its own fingerprint. ----

    // ---- stage 5: canonical nodes, full reference schema
    // (huggingface_driver.py:248-261): uuid, name, group_id, labels,
    // created_at, name_embedding, summary, attributes. The LLM-derived
    // summary/attributes are deterministic stand-ins: summary = the
    // lexicographically-first supporting fact mentioning the entity
    // (extract_attributes_from_nodes contract, node_operations.py:302-391),
    // created_at = earliest mention timestamp, attributes = typed map. ----
    def stageNodes(): Unit = timed("nodes") { if (!store.hasFingerprint("nodes", nodesFp)) {
      // from the cached build frame when this run built it (stage 5 only
      // runs when `nodes` is missing, and that condition also computed
      // nodesFull above); store fallback kept for belt and braces
      val raw =
        if (nodesFull != null) nodesFull.select("uuid", "name", "label", "name_embedding", "group_id")
        else store.load("nodes_raw")
      val mapRows = store.approxRowCount("uuid_map").getOrElse(0L)
      // same broadcast-size guard as stage 6: tiny duplicate maps
      // broadcast, duplicate-heavy ones shuffle
      def m = {
        val m0 = store.load("uuid_map")
        if (mapRows < 5_000_000L) broadcast(m0) else m0
      }
      // per-canonical-node facts: fold the PER-SURFACE stats (built above,
      // overlapped with linking) by canonical — min/min/sum over ~|surfaces|
      // rows instead of re-aggregating every raw mention. Zero-duplicate
      // corpora (the common web-corpus case) skip the remap+refold
      // entirely: the per-surface stats ARE the per-canonical stats.
      val nodeFacts =
        if (mapRows == 0L) surfaceStats.withColumnRenamed("uuid", "cuuid")
        else
          surfaceStats
            .join(m, Seq("uuid"), "left")
            .withColumn("cuuid", coalesce(col("canonical"), col("uuid")))
            .groupBy(col("cuuid"))
            .agg(
              min(col("summary")).as("summary"),
              min(col("created_at")).as("created_at"),
              sum(col("mention_count")).as("mention_count"),
            )
            .localCheckpoint()
      // node_stats doubles as the incremental-ingest stats index (all three
      // aggregates are decomposable: min/min/sum) — committed here
      // UNCONDITIONALLY: nodeFacts is checkpointed (or folds a persisted
      // frame), so the commit is one small bucketed write, and it spares
      // bootstrapIndexes a full re-aggregation of every raw mention later
      // (index build or first incremental batch). Stale cuuids from a
      // REPLACED corpus leave: consumers probe by live node cuuid so
      // dead rows are invisible, but without the delete they accumulate
      // one corpus-worth of garbage per bulk.
      val deadStats =
        if (!store.exists("node_stats")) None
        else Some(store.load("node_stats").select(col("cuuid")).join(nodeFacts, Seq("cuuid"), "left_anti"))
      def statsMerge(): Unit = {
        store.mergeBucketed(
          "node_stats", nodeFacts, Seq("cuuid"), "node mention stats index",
          deleteKeys = deadStats,
        )
        ()
      }
      def finalCols(src: DataFrame): DataFrame = src.select(
        col("uuid"),
        col("name"),
        col("group_id"),
        array(col("label")).as("labels"),
        col("created_at"),
        col("name_embedding"),
        coalesce(col("summary"), col("name")).as("summary"),
        map(
          lit("entity_type"), col("label"),
          lit("mention_count"), coalesce(col("mention_count"), lit(0L)).cast("string"),
        ).as("attributes"),
      )
      val canon =
        if (mapRows == 0L && nodesFull != null)
          // zero-duplicate corpora: every node is its own canonical and the
          // per-surface stats ARE the per-canonical stats — the canonical
          // table is a PURE PROJECTION of the cached build frame, no join
          finalCols(nodesFull)
        else {
          val canonBase =
            if (mapRows == 0L) raw // empty map: every node is its own canonical
            else
              raw
                .join(m, Seq("uuid"), "left")
                .withColumn("canonical", coalesce(col("canonical"), col("uuid")))
                // representative row = the node whose uuid IS the canonical uuid
                .filter(col("uuid") === col("canonical"))
          finalCols(canonBase.join(nodeFacts, col("uuid") === col("cuuid"), "left"))
        }
      // node_stats and nodes are DISJOINT tables fed by the same cached/
      // checkpointed frames — the stats merge rides beside the (larger)
      // canonical commit instead of serializing ahead of it
      graft.io.Concurrent.runAll(Seq(
        () => statsMerge(),
        () => commitPrimary(canon, "nodes", Seq("uuid"), Seq("uuid"), "canonical entity nodes", nodesFp),
      ))
    } }

    // ---- stage 9: episodes.entity_edges — the reference keeps the edge
    // uuids created from each episode on the episode row (graphiti.py:549;
    // schema huggingface_driver.py:284-299). Stored NORMALIZED as the
    // bucketed side table `episode_entity_edges(uuid, entity_edges)` and
    // joined back at read time (GraphitiSpark.episodesWithEntityEdges):
    // rewriting the episodes table itself would copy the full page text of
    // the whole corpus to attach one array column — a full-corpus
    // copy-on-write that cannot survive 100 TB. Reverse mapping of
    // edges.episodes: one explode + groupBy on episode uuid. ----
    def stageEpisodesEe(edgesInMem: Option[DataFrame]): Unit = timed("episodes_ee") { if (!store.hasFingerprint("episode_entity_edges", episodesEeFp)) {
      // from the in-memory final frame when stage 6 just built it (runs
      // concurrently with the edges commit — disjoint tables); falls back
      // to the committed snapshot on resume
      // checkpoint only when a prior table exists: the rebuild path reads
      // byEpisode twice (stale-key anti-join + merge), but a FIRST build
      // traverses it exactly once inside mergeBucketed — the eager
      // checkpoint there was a full extra materialization job
      // pre-partitioned by episode uuid at the bucket count: the
      // collect_set aggregate and the bucketed first-build write share ONE
      // exchange (guide §2.4; SnapshotStore bucketExpr doc)
      val byEpisode0 = edgesInMem
        .getOrElse(store.load("edges"))
        .select(col("uuid").as("edge_uuid"), explode(col("episodes")).as("uuid"))
        .repartition(store.DefaultBuckets, col("uuid"))
        .groupBy(col("uuid"))
        .agg(array_sort(collect_set(col("edge_uuid"))).as("entity_edges"))
      val byEpisode =
        if (store.exists("episode_entity_edges")) byEpisode0.localCheckpoint() else byEpisode0
      // stale keys from a REPLACED corpus leave (absence == empty list —
      // the read-time join coalesces — so dead-episode rows are invisible
      // garbage that would otherwise accumulate one corpus per bulk)
      val deadEps =
        if (!store.exists("episode_entity_edges")) None
        else Some(
          store.load("episode_entity_edges").select(col("uuid")).join(byEpisode, Seq("uuid"), "left_anti"),
        )
      store.mergeBucketed(
        "episode_entity_edges", byEpisode, Seq("uuid"),
        "episode → created-edge uuids (normalized entity_edges)",
        deleteKeys = deadEps,
        fingerprint = episodesEeFp,
        prePartitioned = true,
      )
    } }

    // ---- stage 6: edges — patch the identity-remap pre-build (built in
    // linking's shadow above) for the contention groups the canonical map
    // actually touches, then commit. When the map is empty (no duplicate
    // surfaces — the common web-corpus case) the pre-build IS the final
    // table and this stage is just the commit. Stage 9 (episodes_ee)
    // derives from the same in-memory frame and writes a DISJOINT table,
    // so it runs concurrently with the edges commit. ----
    val GroupKey = Seq("group_id", "source_uuid", "name")
    val rebuildCols =
      Seq("group_id", "source_uuid", "name", "target_uuid", "fact", "valid_at", "created_at", "episodes", "manual_invalid_at")
    def stageEdgesAndEe(): Unit = { if (!store.hasFingerprint("edges", edgesFp)) {
      val mapRows = store.approxRowCount("uuid_map").getOrElse(0L)
      // broadcast the canonical map only while it plausibly fits one
      // executor (duplicate-heavy corpora: plain shuffled joins instead)
      val bcastMap = mapRows < 5_000_000L
      val edgesFinal = timed("edges_patch") {
        if (mapRows == 0L) edgesPre
        else {
          // affected groups: old key ∪ new key of every row whose endpoint
          // the map moves (a receiving group's own endpoints are unchanged,
          // but its rows must re-dedupe/re-invalidate against the movers)
          val m0 = store.load("uuid_map")
          val m = if (bcastMap) broadcast(m0) else m0
          val flagged = edgesPre
            .join(m.select(col("uuid").as("source_uuid"), col("canonical").as("src_c")), Seq("source_uuid"), "left")
            .join(m.select(col("uuid").as("target_uuid"), col("canonical").as("dst_c")), Seq("target_uuid"), "left")
          val changed = flagged.filter(
            (col("src_c").isNotNull && col("src_c") =!= col("source_uuid")) ||
              (col("dst_c").isNotNull && col("dst_c") =!= col("target_uuid")),
          )
          val affKeys = changed
            .select(col("group_id"), col("source_uuid"), col("name"))
            .unionByName(
              changed.select(col("group_id"), coalesce(col("src_c"), col("source_uuid")).as("source_uuid"), col("name")),
            )
            .distinct()
            .localCheckpoint()
          // fact-granularity re-entry is idempotent (same algebra as
          // incremental mergeEdges): rebuild affected groups from the
          // pre-build's merged rows, remapped through the canonical map
          val groupRows = edgesPre.join(broadcast(affKeys), GroupKey, "left_semi")
          val rebuilt = edgeUuid(
            Invalidation.dedupeAndInvalidate(
              Linking.remapPointers(groupRows, m0, hint = bcastMap).select(rebuildCols.map(col): _*),
            ),
          )
          edgesPre
            .join(broadcast(affKeys), GroupKey, "left_anti")
            .unionByName(rebuilt.select(edgesPre.columns.map(col): _*))
        }
      }
      graft.io.Concurrent.runAll(Seq[() => Unit](
        // fact embeddings attach in the commit projection (the only
        // consumer that needs them — see the edges_pre note)
        () => timed("edges_commit")(commitPrimary(
          edgesFinal.withColumn("fact_embedding", embedUdf(col("fact"))),
          "edges", GroupKey, GroupKey, "bitemporal entity edges", edgesFp,
        )),
        () => stageEpisodesEe(Some(edgesFinal)),
      ) ++ reconcileEdgeLocateIndexes(() => edgesFinal))
    } else graft.io.Concurrent.runAll(
      // resume: the edges snapshot already matches this corpus, but a
      // crash (or a pre-reconcile build) may have left the locate
      // indexes stale — converge them from the committed snapshot
      Seq(() => stageEpisodesEe(None)) ++
        reconcileEdgeLocateIndexes(() => store.load("edges")),
    ) }

    /** Locate-index reconcile (`edge_uuids` / `edge_endpoints`): the point
      * mutations and delete cascades TRUST these whenever they exist
      * (GraphitiSpark.locateEdges / deleteNodesByUuids), but they are
      * incremental-path products — a bulk edges recommit that left them
      * stale would silently no-op invalidations/deletes on bulk-created
      * rows (and keep locating rows that no longer exist). Rebuild from
      * the final edges with stale-key deletion — work ∝ edges, the same
      * cost class as the commit it rides beside — fingerprint-stamped so
      * a resumed run converges even after a crash between the edges
      * commit and these merges. Absent indexes are skipped: stage 10 /
      * bootstrap builds them fresh (and therefore consistent) later.
      */
    def reconcileEdgeLocateIndexes(edgesSrc: () => DataFrame): Seq[() => Unit] = {
      val out = Seq.newBuilder[() => Unit]
      if (store.exists("edge_uuids") && !store.hasFingerprint("edge_uuids", edgesFp))
        out += { () =>
          val idx = edgesSrc()
            .select(col("uuid"), col("group_id"), col("source_uuid"), col("name"))
            .localCheckpoint()
          val stale = store.load("edge_uuids").select(col("uuid")).join(idx, Seq("uuid"), "left_anti")
          store.mergeBucketed(
            "edge_uuids", idx, Seq("uuid"), "bulk reconcile edge_uuids",
            deleteKeys = Some(stale), fingerprint = edgesFp,
          )
          ()
        }
      if (store.exists("edge_endpoints") && !store.hasFingerprint("edge_endpoints", edgesFp))
        out += { () =>
          val key = Seq("endpoint_uuid", "group_id", "source_uuid", "name")
          val idx = edgesSrc()
            .select(
              explode(array(col("source_uuid"), col("target_uuid"))).as("endpoint_uuid"),
              col("group_id"), col("source_uuid"), col("name"),
            )
            .distinct()
            .localCheckpoint()
          val stale = store.load("edge_endpoints").select(key.map(col): _*).join(idx, key, "left_anti")
          store.mergeBucketed(
            "edge_endpoints", idx, key, "bulk reconcile edge_endpoints",
            deleteKeys = Some(stale), bucketBy = Seq("endpoint_uuid"), fingerprint = edgesFp,
          )
          ()
        }
      out.result()
    }

    // ---- stage 7: episodic MENTIONS edges (build_episodic_edges,
    // edge_operations.py:48-65) ----
    val epeFp = fp("episodic_edges", Seq(inputFingerprint, groupId, exclKey))
    def stageEpisodicEdges(): Unit = timed("episodic_edges") { if (!store.hasFingerprint("episodic_edges", epeFp)) {
      val t = rawTriples
      val mapRows = store.approxRowCount("uuid_map").getOrElse(0L)
      // uuids first (codegen'd md5), canonical remap via broadcast (skipped
      // outright on zero-duplicate corpora), then ONE distinct on the final
      // fixed-width pair — the earlier (url, name)-string distinct was a
      // second full exchange that the final distinct subsumes
      val withIds = t
        .select(
          md5(concat(lit(s"ep|$groupId|"), col("url"))).as("episode_uuid"),
          explode(array(col("subj"), col("obj"))).as("name"),
        )
        .withColumn("entity_uuid", md5(concat(lit(s"en|$groupId|"), col("name"))))
      val remapped = (
        if (mapRows == 0L) withIds.select(col("episode_uuid"), col("entity_uuid"))
        else {
          // same broadcast-size guard as stages 5/6: tiny duplicate maps
          // broadcast, duplicate-heavy ones shuffle
          val m0 = store.load("uuid_map")
          val m = if (mapRows < 5_000_000L) broadcast(m0) else m0
          withIds
            .join(m, col("entity_uuid") === col("uuid"), "left")
            .select(
              col("episode_uuid"),
              coalesce(col("canonical"), col("entity_uuid")).as("entity_uuid"),
            )
        }
      )
        .distinct()
        .withColumn("name", lit("MENTIONS"))
        .withColumn("group_id", lit(groupId))
      commitPrimary(remapped, "episodic_edges", Seq("episode_uuid", "entity_uuid"), Seq("entity_uuid"), "episode MENTIONS entity", epeFp)
    } }

    // ---- stage 8: IS_DUPLICATE_OF edges (build_duplicate_of_edges,
    // edge_operations.py:68-91) ----
    val dupFp = fp("duplicate_of_edges", Seq(inputFingerprint, groupId, exclKey))
    def stageDuplicateOf(): Unit = timed("duplicate_of_edges") { if (!store.hasFingerprint("duplicate_of_edges", dupFp)) {
      val m = store.load("uuid_map")
      val dupEdges = m
        .filter(col("uuid") =!= col("canonical"))
        .select(
          col("uuid").as("source_uuid"),
          col("canonical").as("target_uuid"),
          lit("IS_DUPLICATE_OF").as("name"),
        )
      store.commit(dupEdges, "duplicate_of_edges", "duplicate-of edges", dupFp)
    } }

    graft.io.Concurrent.runAll(Seq(
      // raw_triples commit: pure write of the cached extraction (fresh
      // builds only) — rides alongside linking instead of blocking it
      () => if (triplesMem != null)
        timed("raw_triples_commit")(store.commit(triplesMem, "raw_triples", "extract triples", triplesFp)),
      () => legLinking(Seq(() => stageNodes(), () => stageEpisodicEdges(), () => stageDuplicateOf())),
      () => legEdges(() => stageEdgesAndEe()),
    ))
    rawTriples.unpersist(blocking = false)
    if (edgesPre != null) edgesPre.unpersist(blocking = false)
    if (nodesFull != null) nodesFull.unpersist(blocking = false)

    // ---- stage 10: incremental-ingest indexes (node_blocks /
    // uuid_map_by_uuid / node_stats / edge_endpoints), bucketed — so the
    // FIRST micro-batch after a bulk load probes instead of re-scanning
    // the corpus (IncrementalIngest; cheap byproducts of stages 3-6).
    // Runs AFTER the concurrent group: it reads nodes/edges/node_stats. ----
    if (buildIndexes) {
      // ---- stage 10: incremental-ingest probe indexes and stage 10.5:
      // query-time search indexes (BM25 inverted index + corpus stats per
      // text surface, ANN signature buckets — committed at pipeline time
      // so a query probes posting/signature buckets instead of scanning
      // the corpus: prebuilt indices, performance_optimizer.py:184-237,
      // vector_search.py:36-189). The two groups write DISJOINT tables —
      // one concurrent group, not two serial phases.
      val sidxFp = fp("search_indexes", Seq(inputFingerprint, groupId, exclKey))
      timed("indexes") {
        graft.io.Concurrent.runAll(Seq(
          () => graft.streaming.IncrementalIngest.bootstrapIndexes(store, spark),
          () => if (!store.hasFingerprint("edges_bm25stats", sidxFp)) {
            graft.search.SearchIndexes.build(store)
            // stamp resume fingerprint on the (tiny) stats table commit
            store.commit(store.load("edges_bm25stats"), "edges_bm25stats", "search indexes built", sidxFp)
          },
        ))
      }
    }
  }
}
