package graft.streaming

import graft.io.SnapshotStore
import graft.kg.{Embedder, Extract, HtmlText, Invalidation, Linking}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental / streaming ingest — the re-expression of the reference's
  * `IncrementalUpdater` micro-batch deltas (`graphiti_hf/processing/
  * incremental_updater.py:94-388`) on Structured Streaming `foreachBatch`,
  * engineered so EVERY step costs ∝ batch size (+ the components the batch
  * actually touches), never ∝ corpus size:
  *
  *  - episodes / raw_triples / nodes_raw: bucketed merge — only hash
  *    buckets containing batch keys are rewritten (SnapshotStore
  *    .mergeBucketed manifests);
  *  - linking: the batch's blocking keys probe the persisted `node_blocks`
  *    index (bucketed by key) for candidate nodes; connected components
  *    re-run ONLY over (new pairs ∪ the existing components they touch),
  *    folded into `uuid_map` (bucketed by canonical) + `uuid_map_by_uuid`
  *    (bucketed by uuid — the probe-side copy);
  *  - node stats (summary / created_at / mention_count are all
  *    decomposable aggregates): batch partials combine with the stored
  *    `node_stats` rows of affected canonicals only;
  *  - edges: contention groups to rebuild = groups keyed by the batch ∪
  *    groups found via the `edge_endpoints` index for endpoints whose
  *    canonical changed; everything else is never read;
  *  - remapping uses the (small) DELTA of the canonical map — entries that
  *    changed this batch plus the batch's own surfaces — broadcast, never
  *    the full map.
  *
  * Rollback = SnapshotStore.rollback to the pre-batch version (the
  * reference's delta rollback, `incremental_updater.py:913-954`).
  */
object IncrementalIngest {

  private val GroupKey = Seq("group_id", "source_uuid", "name")

  private val verbose = sys.env.get("SPARK_GRAFT_VERBOSE").contains("1")
  private def timed[T](stage: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    if (verbose) println(f"[inc] $stage%-24s ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  /** manual_invalid_at rides along so explicit invalidate_edges() calls
    * survive group rebuilds (the window pass never overwrites it).
    */
  /** Single daemon worker for speculative side computations: daemon so a
    * failure path that never reaches the join cannot pin the JVM open.
    */
  private def daemonWorker(name: String): java.util.concurrent.ExecutorService =
    java.util.concurrent.Executors.newSingleThreadExecutor(new java.util.concurrent.ThreadFactory {
      def newThread(r: Runnable): Thread = {
        val t = new Thread(r, name)
        t.setDaemon(true)
        t
      }
    })

  private def withManualCol(df: DataFrame): DataFrame =
    if (df.columns.contains("manual_invalid_at")) df
    else df.withColumn("manual_invalid_at", lit(null).cast("timestamp"))

  /** The raw-assertion columns a contention-group rebuild consumes. */
  private val RebuildCols =
    Seq("group_id", "source_uuid", "name", "target_uuid", "fact", "valid_at", "created_at", "episodes", "manual_invalid_at")

  /** Deterministic edge-row finalization of a rebuild set: dedupe +
    * contradiction-invalidate, stamp fact_embedding (codegen expression)
    * and the content-derived uuid, checkpoint. Shared by [[mergeEdges]]
    * and the speculative rebuild ingestBatch runs in linking's shadow —
    * both paths MUST stay this exact function or speculation diverges.
    */
  private def finalizeRebuild(toRebuild: DataFrame): DataFrame =
    Invalidation
      .dedupeAndInvalidate(toRebuild)
      .withColumn("fact_embedding", graft.functions.Functions.embedText(col("fact")))
      .withColumn(
        "uuid",
        md5(concat_ws("|", lit("ed"), col("group_id"), col("source_uuid"), col("name"), col("target_uuid"), col("valid_at").cast("string"))),
      )
      .localCheckpoint()

  /** The steady-batch rebuild set: affected stored rows ∪ the batch's raw
    * assertions (no remap, no retraction — the speculative precondition).
    */
  private def steadyRebuildSet(existingStored: DataFrame, newRawM: DataFrame): DataFrame =
    if (existingStored == null) newRawM.select(RebuildCols.map(col): _*)
    else
      existingStored
        .select(RebuildCols.map(col): _*)
        .unionByName(newRawM.select(RebuildCols.map(col): _*))

  /** episode_entity_edges surgical patch for a finalized rebuild: every
    * cited episode's list drops exactly the replaced edge uuids and gains
    * the rebuilt ones; `ensureEpisodes` (the batch's own episodes) get
    * explicit — possibly empty — lists so re-ingests overwrite stale
    * lists. Checkpointed: mergeBucketed traverses its updates twice
    * (count pass + write pass). Shared by [[mergeEdges]] and the
    * speculative run in linking's shadow (the table is only ever written
    * by mergeEdges itself, so the pre-stage-B snapshot both read is the
    * same).
    */
  private def entityEdgesPatch(
      store: SnapshotStore,
      oldRows: DataFrame,
      rebuilt: DataFrame,
      ensureEpisodes: DataFrame,
  ): DataFrame = {
    val oldByEp = oldRows.select(col("uuid").as("edge_uuid"), explode(col("episodes")).as("uuid"))
    val newByEp = rebuilt.select(col("uuid").as("edge_uuid"), explode(col("episodes")).as("uuid"))
    val touched0 = oldByEp.select("uuid").unionByName(newByEp.select("uuid"))
    val touched =
      (if (ensureEpisodes != null) touched0.unionByName(ensureEpisodes.select(col("uuid"))) else touched0)
        .distinct()
    val stored =
      if (store.exists("episode_entity_edges"))
        store
          .loadForKeys("episode_entity_edges", touched, Seq("uuid"))
          .select(col("uuid"), explode(col("entity_edges")).as("edge_uuid"))
      else newByEp.limit(0)
    val patched = stored
      .join(oldByEp, Seq("uuid", "edge_uuid"), "left_anti")
      .unionByName(newByEp)
      .groupBy(col("uuid"))
      .agg(array_sort(collect_set(col("edge_uuid"))).as("entity_edges"))
    touched
      .join(patched, Seq("uuid"), "left")
      .withColumn("entity_edges", coalesce(col("entity_edges"), array().cast("array<string>")))
      .localCheckpoint()
  }

  /** One-time index bootstrap for stores created by the BULK pipeline
    * before these indexes existed (KgPipeline now commits them itself).
    * Must run BEFORE the batch's rows are merged, so batch contributions
    * are not double-counted.
    */
  private[graft] def bootstrapIndexes(store: SnapshotStore, spark: SparkSession): Unit = {
    // disjoint output tables → concurrent Spark jobs (graft.io.Concurrent)
    val tasks = Seq.newBuilder[() => Unit]
    if (store.exists("nodes_raw") && !store.exists("node_blocks"))
      tasks += (() =>
        timed("boot node_blocks")(store.mergeBucketed(
          "node_blocks",
          Linking.blockingKeys(store.load("nodes_raw")),
          Seq("key", "uuid"),
          "bootstrap node_blocks",
          bucketBy = Seq("key"),
        )))
    else if (
      store.exists("nodes_raw") && store.exists("node_blocks") &&
      // manifest-only schema check (a load() here paid a footer-inference
      // job on EVERY batch); pre-upgrade manifests without recorded cols
      // fall back to one real schema read
      !store.manifestColumns("node_blocks")
        .map(_.contains("name"))
        .getOrElse(store.load("node_blocks").columns.contains("name"))
    )
      // one-time payload upgrade of a legacy (key, uuid)-only index: the
      // candidate probe then reads node_blocks alone (blockingKeys doc)
      tasks += (() =>
        store.mergeBucketed(
          "node_blocks",
          Linking.blockingKeys(store.load("nodes_raw")),
          Seq("key", "uuid"),
          "upgrade node_blocks with (name, group_id) payload",
          deleteKeys = Some(store.load("node_blocks").select(col("key"), col("uuid"))),
          bucketBy = Seq("key"),
        ))
    if (store.exists("uuid_map") && !store.exists("uuid_map_by_uuid"))
      tasks += (() =>
        timed("boot uuid_map_by_uuid")(
          store.mergeBucketed("uuid_map_by_uuid", store.load("uuid_map"), Seq("uuid"), "bootstrap uuid_map_by_uuid"),
        ))
    if (store.exists("raw_triples") && !store.exists("node_stats"))
      tasks += { () =>
        val m =
          if (store.exists("uuid_map")) {
            // same 5M-row broadcast guard as the pipeline stages
            val m0 = store.load("uuid_map")
            if (store.approxRowCount("uuid_map").getOrElse(0L) < 5_000_000L) broadcast(m0) else m0
          } else { import spark.implicits._; broadcast(Seq.empty[(String, String)].toDF("uuid", "canonical")) }
        val stats = store
          .load("raw_triples")
          .select(col("group_id").as("g"), explode(array(col("subj"), col("obj"))).as("name"), col("fact"), col("warc_ts"))
          .withColumn("uuid", md5(concat(lit("en|"), col("g"), lit("|"), col("name"))))
          .join(m, Seq("uuid"), "left")
          .withColumn("cuuid", coalesce(col("canonical"), col("uuid")))
          .groupBy(col("cuuid"))
          .agg(
            min(col("fact")).as("summary"),
            min(col("warc_ts")).as("created_at"),
            count(lit(1)).as("mention_count"),
          )
        timed("boot node_stats")(store.mergeBucketed("node_stats", stats, Seq("cuuid"), "bootstrap node_stats"))
      }
    if (store.exists("edges") && !store.exists("edge_endpoints"))
      tasks += { () =>
        // pre-partition by the bucket column so the 4-column distinct and
        // the bucketed write share ONE exchange (HashPartitioning on a
        // subset of the distinct keys satisfies its clustering, and at the
        // bucket count it IS the table layout — guide §2.4, SnapshotStore
        // bucketExpr doc)
        val idx = store
          .load("edges")
          .select(explode(array(col("source_uuid"), col("target_uuid"))).as("endpoint_uuid"), col("group_id"), col("source_uuid"), col("name"))
          .repartition(store.DefaultBuckets, col("endpoint_uuid"))
          .distinct()
        timed("boot edge_endpoints")(store.mergeBucketed(
          "edge_endpoints",
          idx,
          Seq("endpoint_uuid", "group_id", "source_uuid", "name"),
          "bootstrap edge_endpoints",
          bucketBy = Seq("endpoint_uuid"),
          prePartitioned = true,
        ))
      }
    // by-uuid locate index: uuid → contention group, so point mutations
    // (invalidateEdges / setValidityPeriod / getValidAt / the
    // removeEpisode cascade) probe only the buckets holding their target
    // uuids instead of scanning the corpus to FIND the rows (the write
    // side was already keyed; this keys the read side too)
    if (store.exists("edges") && !store.exists("edge_uuids"))
      tasks += { () =>
        timed("boot edge_uuids")(store.mergeBucketed(
          "edge_uuids",
          store.load("edges").select(col("uuid"), col("group_id"), col("source_uuid"), col("name")),
          Seq("uuid"),
          "bootstrap edge_uuids",
        ))
      }
    graft.io.Concurrent.runAll(tasks.result())
  }

  /** Apply one batch of new pages to the store, scoped to `groupId` (the
    * reference partitions every entity/episode by group_id —
    * huggingface_driver.py:535-554; entity uuids must NOT collide across
    * groups).
    */
  def ingestBatch(
      store: SnapshotStore,
      newPages: DataFrame,
      batchId: Long,
      groupId: String = "default",
      // extract_nodes(excluded_entity_types): excluded-type entities (and
      // triples referencing them) never enter (node_operations.py:74,
      // 163-164). Re-ingest re-derivation applies the SAME list — mixed
      // exclusion configs across batches are the caller's responsibility,
      // as in the reference (a per-call option).
      excludedEntityTypes: Seq[String] = Nil,
  ): Unit = {
    Extract.validateExcludedEntityTypes(excludedEntityTypes)
    if (newPages.isEmpty) return
    val spark = newPages.sparkSession
    import spark.implicits._
    val gid = groupId

    timed("bootstrap")(bootstrapIndexes(store, spark))

    // one micro-batch may bundle the same url more than once (source
    // batching); keep the LATEST crawl per url (warc_ts desc, content
    // hash as the deterministic tiebreak) — two rows under one episode
    // uuid would pass every keyed merge intact (replace-by-key keeps all
    // update rows of a key) and permanently double mention counts,
    // postings and bm25 stats for that document
    val urlW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("url"))
      .orderBy(col("warc_ts").desc_nulls_last, xxhash64(col("html")).desc)
    val pages = newPages.withColumn("__rn", row_number().over(urlW)).filter(col("__rn") === 1).drop("__rn")

    val withText = pages.withColumn("text", coalesce(col("text"), HtmlText.textOf(col("html"))))

    // episodes: append new urls (entity_edges back-filled after mergeEdges)
    // (pre-merge probe for the search-index refresh: the batch may replace
    // existing episode rows)
    val episodes0 = withText.select(
      md5(concat(lit(s"ep|$gid|"), col("url"))).as("uuid"),
      col("url").as("name"),
      col("text").as("content"),
      lit("text").as("source"),
      lit("web crawl").as("source_description"),
      lit(gid).as("group_id"),
      col("warc_ts").as("created_at"),
      col("warc_ts").as("valid_at"),
    )
    val episodes = episodes0.localCheckpoint()

    // ---- re-ingest support: when a batch url already has an episode, its
    // PRIOR facts are re-derived by re-running extraction on the STORED
    // episode content (extraction is deterministic, so this equals exactly
    // the rows the earlier ingest produced) — a bucketed probe plus
    // re-extraction of the replaced pages only, never a corpus scan.
    // Evaluated BEFORE the episodes merge replaces the stored content.
    // ONE bucketed probe of the stored episodes serves both the re-ingest
    // re-extraction and the text-index refresh (these used to be two
    // identical loadForKeys jobs); checkpointed so the concurrent stage-A
    // episodes merge below cannot change what the refresh reads
    // two independent materialization chains — (stored-episode probe →
    // prior-fact re-extraction) and (batch extraction → surfaces) — run as
    // concurrent jobs: each is a string of small checkpoints whose cost is
    // mostly fixed job latency, so overlapping them halves the pre-merge
    // constant of a steady micro-batch
    var priorEpisodes: DataFrame = null
    var oldTriples: DataFrame = null
    var reIngest = false
    var triples: DataFrame = null
    var surfaces: DataFrame = null
    timed("probe+extract") {
      graft.io.Concurrent.runAll(Seq(
        () => {
          priorEpisodes =
            if (store.exists("episodes"))
              store
                .loadForKeys("episodes", episodes.select(col("uuid")), Seq("uuid"))
                .select(col("uuid"), col("name"), col("content"), col("created_at"))
                .localCheckpoint()
            else episodes.select(col("uuid"), col("name"), col("content"), col("created_at")).limit(0)
          val oldPages =
            priorEpisodes.select(col("name").as("url"), col("content").as("text"), col("created_at").as("warc_ts"))
          oldTriples = Extract
            .excludeTypes(Extract.triplesTs(spark, oldPages), excludedEntityTypes)
            .withColumn("group_id", lit(gid))
            .localCheckpoint()
          reIngest = !oldTriples.isEmpty
        },
        () => {
          // raw triples for the new pages (single extraction pass,
          // materialized once — reused by surfaces / stats / edges below)
          triples = Extract
            .excludeTypes(Extract.triplesTs(spark, withText), excludedEntityTypes)
            .withColumn("group_id", lit(gid))
            .localCheckpoint()
          surfaces = Extract
            .entityNodes(
              triples
                .select(col("subj").as("name"))
                .unionByName(triples.select(col("obj").as("name")))
                .distinct(),
              gid,
            )
            .localCheckpoint()
        },
      ))
    }

    val oldEpisodeDocs =
      if (store.exists("episodes_postings"))
        priorEpisodes.select(col("uuid").as("id"), col("content").as("text"))
      else episodes.select(col("uuid").as("id"), col("content").as("text")).limit(0)
    // facts the re-ingested pages RETRACTED (asserted before, not now)
    val retractedTriples =
      if (reIngest)
        oldTriples.join(triples, Seq("group_id", "url", "subj", "pred", "obj"), "left_anti").localCheckpoint()
      else oldTriples
    val newBlocks = Linking.blockingKeys(surfaces)

    // ---- incremental linking: candidates = stored nodes sharing a
    // blocking key with the batch (node_blocks index probe) ∪ the batch's
    // own surfaces (explicit union — so the probe does NOT need to wait
    // for stage-A to merge the batch's blocks and can ride a side thread
    // against the PRE-merge index; either snapshot side of the benign
    // race yields the same candidate set). The probe READ is the
    // documented residual ∝ bucket selectivity; overlapping it removes
    // it from the critical path. ----
    val candPool = daemonWorker("inc-cand-probe")
    val candFut = candPool.submit(new java.util.concurrent.Callable[DataFrame] {
      def call(): DataFrame = {
        val touchedKeys = newBlocks.select(col("key")).distinct()
        // duplicatePairs consumes exactly (uuid, name, group_id) — the
        // node_blocks payload carries it (blockingKeys), so the probe is
        // ONE key-bucketed index read; the pre-payload fallback chased
        // candidate uuids into nodes_raw, whose uniform uuid hashing
        // touched every bucket on every batch
        val slim = Seq("uuid", "name", "group_id")
        val stored =
          if (store.exists("node_blocks")) {
            val blocks = store.loadForKeys("node_blocks", touchedKeys, Seq("key"))
            if (blocks.columns.contains("name"))
              blocks.select(slim.map(col): _*).dropDuplicates("uuid")
            else if (store.exists("nodes_raw")) {
              // legacy (key, uuid)-only index not yet upgraded by
              // bootstrapIndexes: the old two-read path
              val candUuids = blocks.select(col("uuid")).distinct().localCheckpoint()
              store.loadForKeys("nodes_raw", candUuids, Seq("uuid")).select(slim.map(col): _*)
            } else surfaces.select(slim.map(col): _*).limit(0)
          } else surfaces.select(slim.map(col): _*).limit(0)
        stored.unionByName(surfaces.select(slim.map(col): _*)).dropDuplicates("uuid").localCheckpoint()
      }
    })

    def canonicalNow(df: DataFrame, uuidCol: String): DataFrame =
      IncrementalIngest.canonicalNow(store, df, uuidCol)

    // ---- canonical nodes: decomposable stats (min/min/sum) combine batch
    // partials with the stored rows of affected canonicals only. Packaged
    // as a function so the COMMON steady batch (no duplicate pairs, no
    // re-ingest, no touched components) can run it SPECULATIVELY under an
    // identity remap, concurrent with linking — the same
    // compute-in-the-shadow trick as the bulk pipeline's edges_pre — and
    // adopt the result unchanged when linking indeed found nothing.
    // (combined, statKeys, rebuiltNodes, nodeDelKeys, oldNodeDocs)
    def statsChain(
        remapMapF: DataFrame,
        deltaF: DataFrame,
        affCanonF: DataFrame,
        ccF: DataFrame,
        withNeg: Boolean,
        // where to read the affected canonicals' node rows: the store
        // probe in general; the in-memory batch `surfaces` frame in the
        // speculative no-duplicate case (every affected canonical is then
        // a batch surface, and nodes_raw rows are the deterministic
        // entityNodes output — identical either way), which removes the
        // chain's only pre-stage-A table dependency so it can ride a
        // side thread from the moment extraction lands
        nodesRawOf: DataFrame => DataFrame,
        // true ONLY on the speculative no-remap chain: delta/affCanon/cc
        // empty and withNeg=false make statKeys EXACTLY the cuuid set of
        // combinedAll (= combined ∪ goneStats), so the replaced-node-docs
        // probe can fire on statKeys CONCURRENTLY with the stats combine
        // instead of waiting for `combined` — removes the chain's last
        // serial store read from its tail
        docsKeysAreStatKeys: Boolean = false,
    ): (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) = {
      val partial = triples
        .select(explode(array(col("subj"), col("obj"))).as("name"), col("fact"), col("warc_ts"))
        .withColumn("uuid", md5(concat(lit(s"en|$gid|"), col("name"))))
        .join(broadcast(remapMapF), Seq("uuid"), "left")
        .withColumn("cuuid", coalesce(col("canonical"), col("uuid")))
        .groupBy(col("cuuid"))
        .agg(
          min(col("fact")).as("summary"),
          min(col("warc_ts")).as("created_at"),
          count(lit(1)).as("mention_count"),
        )
      // re-ingested pages: SUBTRACT the prior contributions of their old
      // mentions (counts are decomposable; summary/created_at are mins,
      // which nulls leave untouched — created_at keeps the earliest-ever
      // assertion, matching the reference's immutable node created_at; a
      // retracted lexicographic-min summary can persist until a rebuild)
      val negPartial =
        if (!withNeg) partial.limit(0)
        else
          canonicalNow(
            oldTriples
              .select(explode(array(col("subj"), col("obj"))).as("name"))
              .withColumn("cuuid", md5(concat(lit(s"en|$gid|"), col("name")))),
            "cuuid",
          )
            .groupBy(col("cuuid"))
            .agg((-count(lit(1))).as("mention_count"))
            .withColumn("summary", lit(null).cast("string"))
            .withColumn("created_at", lit(null).cast("timestamp"))
            .select(col("cuuid"), col("summary"), col("created_at"), col("mention_count"))
      // affCanon misses a member that was never in uuid_map (no prior
      // duplicates) yet loses canonical status this batch — its stats row
      // is keyed by its OWN uuid, so the moved members (delta.uuid) must
      // also be probed (and deleted) or their counts silently drop out
      val statKeys = timed("stat keys") { partial
        .select(col("cuuid"))
        .unionByName(negPartial.select(col("cuuid")))
        .unionByName(affCanonF.select(col("canonical").as("cuuid")))
        .unionByName(deltaF.select(col("uuid").as("cuuid")))
        .distinct()
        .localCheckpoint()
      }
      val existingStats =
        if (store.exists("node_stats"))
          store
            .loadForKeys("node_stats", statKeys, Seq("cuuid"))
            // re-key rows whose canonical moved (component merge)
            .join(broadcast(deltaF.withColumnRenamed("uuid", "cuuid").withColumnRenamed("canonical", "new_c")), Seq("cuuid"), "left")
            .withColumn("cuuid", coalesce(col("new_c"), col("cuuid")))
            .drop("new_c")
        else partial.limit(0)
      val haveNodesIdx = store.exists("nodes") && store.exists("nodes_postings")
      def probeDocs(keys: DataFrame): DataFrame = store
        .loadForKeys("nodes", keys, Seq("uuid"))
        .select(col("uuid").as("id"), col("name").as("text"))
        .localCheckpoint()
      def combineAll(): DataFrame = timed("stats combine") { existingStats
        .unionByName(partial)
        .unionByName(negPartial)
        .groupBy(col("cuuid"))
        .agg(
          min(col("summary")).as("summary"),
          min(col("created_at")).as("created_at"),
          sum(col("mention_count")).as("mention_count"),
        )
        .localCheckpoint()
      }
      var earlyDocs: DataFrame = null
      val combinedAll =
        if (docsKeysAreStatKeys && haveNodesIdx) {
          var ca: DataFrame = null
          graft.io.Concurrent.runAll(Seq(
            () => ca = combineAll(),
            () => earlyDocs = timed("node docs probe")(probeDocs(statKeys.select(col("cuuid").as("uuid")))),
          ))
          ca
        } else combineAll()
      // an entity whose every mention was retracted leaves the stats AND
      // the nodes table (a bulk rebuild over the final corpus would never
      // have created it); deletion rides deleteKeys = statKeys/nodeDelKeys
      val combined = combinedAll.filter(col("mention_count") > 0)
      val goneStats = combinedAll.filter(col("mention_count") <= 0).select(col("cuuid"))
      // rebuild node rows ONLY for canonicals whose stats or membership
      // changed; members that stopped being canonical are deleted
      val rebuiltNodes = nodesRawOf(combined.select(col("cuuid").as("uuid")))
        .join(combined, col("uuid") === col("cuuid"), "inner")
        .select(
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
      val nodeDelKeys = ccF.select(col("uuid")).unionByName(goneStats.select(col("cuuid").as("uuid")))
      val oldNodeDocs =
        if (!haveNodesIdx) rebuiltNodes.select(col("uuid").as("id"), col("name").as("text")).limit(0)
        else if (earlyDocs != null) earlyDocs
        else timed("node docs probe")(
          probeDocs(nodeDelKeys.unionByName(combined.select(col("cuuid").as("uuid"))).distinct()),
        )
      (combined, statKeys, rebuiltNodes, nodeDelKeys, oldNodeDocs)
    }

    // speculative run of the chain (identity remap, no retraction side):
    // overlaps linking; reads only checkpointed batch frames + tables
    // stage-A already merged (nodes_raw) or stage-B will write later
    // (node_stats / nodes — snapshot-isolated reads). Skipped on
    // re-ingests (their negative partials make the chains differ).
    val specPool = daemonWorker("inc-spec-stats")
    val specStats: java.util.concurrent.Future[(DataFrame, DataFrame, DataFrame, DataFrame, DataFrame)] =
      if (reIngest) null
      else
        specPool.submit(new java.util.concurrent.Callable[(DataFrame, DataFrame, DataFrame, DataFrame, DataFrame)] {
          def call(): (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) = {
            val e = Seq.empty[(String, String)].toDF("uuid", "canonical")
            statsChain(
              e, e, e, e, withNeg = false,
              keys => surfaces.join(keys, Seq("uuid"), "left_semi"),
              docsKeysAreStatKeys = true,
            )
          }
        })

    // ---- speculative edges probe: the contention groups keyed by the
    // batch's PRE-remap facts depend only on extraction, not on linking —
    // probe them on a side thread while stage-A and linking run (the edges
    // table is not written until stage-B). mergeEdges unions in the
    // (usually empty) remap/retraction extras. ~1.5 s of the old critical
    // path now rides in linking's shadow.
    val newRawBase = triples.select(
      md5(concat(lit(s"en|$gid|"), col("subj"))).as("source_uuid"),
      col("pred").as("name"),
      md5(concat(lit(s"en|$gid|"), col("obj"))).as("target_uuid"),
      col("fact"),
      lit(gid).as("group_id"),
      col("warc_ts").as("valid_at"),
      col("warc_ts").as("created_at"),
      array(md5(concat(lit(s"ep|$gid|"), col("url")))).as("episodes"),
    )
    var earlyKeys: DataFrame = null
    var earlyStored: DataFrame = null
    var earlyRebuilt: DataFrame = null
    val earlyPool = daemonWorker("inc-edges-probe")
    val earlyProbe = earlyPool.submit(new java.util.concurrent.Callable[Unit] {
      def call(): Unit = {
        earlyKeys = newRawBase.select(GroupKey.map(col): _*).distinct().localCheckpoint()
        earlyStored =
          if (store.exists("edges"))
            withManualCol(store.loadForKeys("edges", earlyKeys, GroupKey)).localCheckpoint()
          else null
        // speculative REBUILD of the affected groups (identity-remap, no
        // retraction — exactly the steady-batch set): dedupe/invalidate +
        // embedding + uuid ride in linking's shadow too; mergeEdges adopts
        // it under the same gate as preKeys/preStored. A re-ingest's
        // retraction side makes the sets differ — never speculated.
        if (!reIngest)
          earlyRebuilt = finalizeRebuild(steadyRebuildSet(earlyStored, withManualCol(newRawBase)))
      }
    })
    // second queued task on the SAME single worker (strict ordering, same
    // thread → earlyStored/earlyRebuilt visible): the entity_edges patch
    // — mergeEdges' profiled wall task — computed whenever the worker gets
    // to it. The main thread joins ONLY earlyProbe before stage-B; the
    // entity_edges merge task inside mergeEdges consumes this future
    // directly, so a long patch delays just that one task, not the whole
    // stage.
    val earlyEntityEdges: java.util.concurrent.Future[DataFrame] =
      if (reIngest) null
      else
        earlyPool.submit(new java.util.concurrent.Callable[DataFrame] {
          def call(): DataFrame =
            if (earlyRebuilt == null) null
            else entityEdgesPatch(
              store,
              if (earlyStored == null) earlyRebuilt.limit(0) else earlyStored,
              earlyRebuilt,
              episodes.select(col("uuid")),
            )
        })

    // ---- stage-A writes: five DISJOINT output tables whose inputs are
    // all checkpointed (or, for oldEpisodeDocs, pinned to version dirs at
    // plan construction) → one concurrent group instead of four serial
    // commits. Linking below needs nodes_raw and node_blocks merged;
    // nothing before the edge stage reads raw_triples or the episode
    // postings, so every batch pays max(merge) here, not sum(merge).
    // index compactions triggered by a refresh running CONCURRENTLY with
    // its base table's merge are deferred past the group barrier: the fold
    // re-reads the base table, which must be at its post-batch version
    // (an inline rebuild could read the pre-merge snapshot and then clear
    // the delta log holding the batch's rows — silently losing them)
    val compactEpisodes = new java.util.concurrent.atomic.AtomicBoolean(false)
    val compactNodes = new java.util.concurrent.atomic.AtomicBoolean(false)
    timed("stage-A merges") {
      graft.io.Concurrent.runAll(Seq(
        () => { store.mergeBucketed("episodes", episodes, Seq("uuid"), s"incremental batch=$batchId episodes"); () },
        () =>
          compactEpisodes.set(graft.search.SearchIndexes.refreshText(
            store, "episodes", oldEpisodeDocs,
            episodes.select(col("uuid").as("id"), col("content").as("text")),
            defer = true,
          )),
        // replace semantics per page: facts the new version no longer
        // asserts are DELETED (the old rows are the delete keys),
        // re-asserted facts are replaced by the update rows
        () => {
          store.mergeBucketed(
            "raw_triples", triples, Seq("group_id", "url", "subj", "pred", "obj"),
            s"incremental batch=$batchId triples",
            deleteKeys = if (reIngest) Some(oldTriples.select("group_id", "url", "subj", "pred", "obj")) else None,
          )
          ()
        },
        () => { store.mergeBucketed("nodes_raw", surfaces, Seq("uuid"), s"incremental batch=$batchId nodes_raw"); () },
        () => { store.mergeBucketed("node_blocks", newBlocks, Seq("key", "uuid"), s"incremental batch=$batchId blocks", bucketBy = Seq("key")); () },
      ))
    }
    if (compactEpisodes.get()) timed("compact episodes idx")(graft.search.SearchIndexes.compactText(store, "episodes"))


    val candNodes = timed("cand join") { try candFut.get() finally candPool.shutdown() }
    val pairs = timed("linking pairs")(Linking.duplicatePairs(candNodes).localCheckpoint())



    // the common steady batch finds NO duplicate pairs: every derived
    // frame below (affCanon / oldMapAff / cc / delta / remapMap) is then
    // provably empty WITHOUT running its store probe / join / merge jobs —
    // each skipped step was a distributed-job latency quantum on the
    // critical path of every steady micro-batch
    val noPairs = pairs.isEmpty
    val emptyMap = Seq.empty[(String, String)].toDF("uuid", "canonical").localCheckpoint()
    val pairNodes = pairs
      .select(col("u1").as("uuid"))
      .unionByName(pairs.select(col("u2").as("uuid")))
      .distinct()
    val hasMap = store.exists("uuid_map")
    // existing components touched by the new pairs (probe by member uuid,
    // then fetch whole components by canonical); the by_uuid probe copy may
    // not exist yet if the bulk map was empty — fall back to the plain map
    val affCanon = timed("affCanon probe") {
      if (noPairs) emptyMap.select(col("canonical"))
      else
        (if (store.exists("uuid_map_by_uuid"))
           store.loadForKeys("uuid_map_by_uuid", pairNodes, Seq("uuid"))
         else if (hasMap)
           store.load("uuid_map").join(broadcast(pairNodes), Seq("uuid"), "left_semi")
         else emptyMap)
          .select(col("canonical"))
          .distinct()
          .localCheckpoint()
    }
    val affCanonEmpty = noPairs || affCanon.isEmpty
    val oldMapAff =
      if (hasMap && !affCanonEmpty)
        store.loadForKeys("uuid_map", affCanon, Seq("canonical")).select(col("uuid"), col("canonical"))
      else emptyMap
    val linkIdle = noPairs && affCanonEmpty
    val cc = timed("cc") {
      // the common steady batch finds NO duplicate pairs and touches no
      // existing component — skip the superstep loop outright
      if (linkIdle) emptyMap
      else
        graft.graph.GraphOps
          // batch pairs + touched components are ∝ batch — the bounded
          // driver union-find path (one job) replaces the superstep
          // loop's 6-10 job-latency quanta on every linking batch
          .connectedComponentsAuto(
            pairs
              .select(col("u1").as("src"), col("u2").as("dst"))
              .unionByName(oldMapAff.select(col("uuid").as("src"), col("canonical").as("dst"))),
          )
          .select(col("node").as("uuid"), col("component").as("canonical"))
          .localCheckpoint()
    }
    timed("uuid_map merges") {
      // two bucketed copies of the same (checkpointed) map → concurrent;
      // an idle link pass merges nothing — skip both no-op merge jobs
      if (!linkIdle)
        graft.io.Concurrent.runAll(Seq(
          () => { store.mergeBucketed("uuid_map", cc, Seq("canonical"), s"incremental batch=$batchId uuid_map", deleteKeys = Some(affCanon)); () },
          () => { store.mergeBucketed("uuid_map_by_uuid", cc, Seq("uuid"), s"incremental batch=$batchId uuid_map_by_uuid"); () },
        ))
    }

    // the remap DELTA: entries whose canonical changed this batch, plus the
    // batch's own surface entries — small and broadcastable (the full map
    // is never loaded). An empty cc proves both empty — no join jobs.
    val delta = timed("remap delta") {
      if (linkIdle) emptyMap
      else cc
        .join(oldMapAff.withColumnRenamed("canonical", "old_c"), Seq("uuid"), "left")
        .withColumn("old_c", coalesce(col("old_c"), col("uuid")))
        .filter(col("canonical") =!= col("old_c"))
        .select(col("uuid"), col("canonical"))
        .localCheckpoint()
    }
    val remapMap = timed("remap map") {
      if (linkIdle) emptyMap
      else {
        val batchEntries = cc.join(surfaces.select(col("uuid")), Seq("uuid"), "left_semi")
        delta.unionByName(batchEntries).distinct().localCheckpoint()
      }
    }

    // adopt the speculative run iff linking found NOTHING (cc empty ⟺
    // pairs ∪ affCanon empty ⟹ delta/remapMap empty — exactly the frames
    // the speculative run used)
    val specValid = specStats != null && linkIdle
    val (combined, statKeys, rebuiltNodes, nodeDelKeys, oldNodeDocs) = timed("stats chain") {
      try {
        if (specValid) specStats.get()
        else {
          // discard (don't block on, don't fail from) an invalidated
          // speculative run — it's a throwaway read-only computation
          if (specStats != null) specStats.cancel(true)
          statsChain(
            remapMap, delta, affCanon, cc, reIngest,
            keys => store.loadForKeys("nodes_raw", keys, Seq("uuid")),
          )
        }
      } finally specPool.shutdownNow()
    }

    val mentionBase = triples
      .select(col("url"), explode(array(col("subj"), col("obj"))).as("name"))
      .distinct()
      .withColumn("entity_uuid", md5(concat(lit(s"en|$gid|"), col("name"))))
    val mentionRows =
      (if (linkIdle) mentionBase // empty remap map — the left join is identity
       else mentionBase
         .join(broadcast(remapMap), col("entity_uuid") === col("uuid"), "left")
         .withColumn("entity_uuid", coalesce(col("canonical"), col("entity_uuid"))))
        .select(
          md5(concat(lit(s"ep|$gid|"), col("url"))).as("episode_uuid"),
          col("entity_uuid"),
        )
        .distinct()
        .withColumn("name", lit("MENTIONS"))
        .withColumn("group_id", lit(gid))
    // re-ingested pages: their OLD mention rows (keyed by canonical-now —
    // the per-batch remap block keeps stored rows re-keyed) are deleted;
    // current mentions re-insert below
    val oldMentionKeys =
      if (!reIngest) None
      else
        Some(
          canonicalNow(
            oldTriples
              .select(col("url"), explode(array(col("subj"), col("obj"))).as("name"))
              .distinct()
              .withColumn("entity_uuid", md5(concat(lit(s"en|$gid|"), col("name")))),
            "entity_uuid",
          )
            .select(md5(concat(lit(s"ep|$gid|"), col("url"))).as("episode_uuid"), col("entity_uuid"))
            .distinct(),
        )

    // ---- edges: rebuild only affected contention groups ----
    // a batch of entirely-new unique surfaces has an empty remap map
    // (checkpointed above) — the two canonical joins are identity then
    val newRaw =
      if (linkIdle || remapMap.isEmpty) newRawBase else Linking.remapPointers(newRawBase, remapMap)
    // retracted fact assertions (canonical-NOW endpoints + the retracting
    // episode): mergeEdges excludes the stored rows of these facts from the
    // rebuild and re-derives them from their remaining supporters
    val retractedKeyed =
      if (!reIngest) null
      else {
        val base = retractedTriples.select(
          col("group_id"),
          md5(concat(lit(s"en|$gid|"), col("subj"))).as("source_uuid"),
          col("pred").as("name"),
          md5(concat(lit(s"en|$gid|"), col("obj"))).as("target_uuid"),
          md5(concat(lit(s"ep|$gid|"), col("url"))).as("episode_uuid"),
        )
        canonicalNow(canonicalNow(base, "source_uuid"), "target_uuid").localCheckpoint()
      }

    // ---- stage-B writes: node_stats / nodes / nodes_postings /
    // episodic_edges / the whole edge stage write DISJOINT table sets and
    // read only checkpointed frames, pre-group version-pinned probes, or
    // tables merged in earlier stages (nodes_raw, uuid_map_by_uuid,
    // episodes) → one concurrent group. mergeEdges runs its own inner
    // concurrent group (fresh pool per runAll, so nesting cannot
    // deadlock). The two episodic_edges merges stay ORDERED inside one
    // task: oldMentionKeys' delete keys are canonical-NOW, which is only
    // what the stored rows hold after the remap pass re-keys them.
    // join the speculative edges probe (it raced stage-A + linking)
    timed("early probe join") { try earlyProbe.get() finally earlyPool.shutdown() }
    var rebuilt: DataFrame = null
    timed("stage-B merges") {
      graft.io.Concurrent.runAll(Seq(
        () => { store.mergeBucketed("node_stats", combined, Seq("cuuid"), s"incremental batch=$batchId node_stats", deleteKeys = Some(statKeys)); () },
        () => {
          store.mergeBucketed(
            "nodes", rebuiltNodes, Seq("uuid"), s"incremental batch=$batchId nodes",
            deleteKeys = Some(nodeDelKeys),
          )
          ()
        },
        () =>
          compactNodes.set(graft.search.SearchIndexes.refreshText(
            store, "nodes", oldNodeDocs,
            rebuiltNodes.select(col("uuid").as("id"), col("name").as("text")),
            defer = true,
          )),
        // episodic MENTIONS edges: remap only rows whose entity's
        // canonical changed (entity_uuid-bucketed probe), then merge the
        // batch's mentions (same shape as bulk stage 7)
        () => {
          if (store.exists("episodic_edges") && !delta.isEmpty) {
            val stale = store
              .loadForKeys("episodic_edges", delta.select(col("uuid").as("entity_uuid")), Seq("entity_uuid"))
              .localCheckpoint()
            val remapped = stale
              .join(broadcast(delta), stale("entity_uuid") === delta("uuid"), "inner")
              .withColumn("entity_uuid", col("canonical"))
              .drop("uuid", "canonical")
              .dropDuplicates("episode_uuid", "entity_uuid")
            store.mergeBucketed(
              "episodic_edges", remapped, Seq("episode_uuid", "entity_uuid"),
              s"incremental batch=$batchId remap mentions",
              deleteKeys = Some(stale.select(col("episode_uuid"), col("entity_uuid"))),
              bucketBy = Seq("entity_uuid"),
            )
          }
          store.mergeBucketed(
            "episodic_edges", mentionRows, Seq("episode_uuid", "entity_uuid"),
            s"incremental batch=$batchId mentions",
            deleteKeys = oldMentionKeys,
            bucketBy = Seq("entity_uuid"),
          )
          ()
        },
        () => {
          // the speculative probe keyed the batch's PRE-remap groups — valid
          // only when no remap applied (newRaw == newRawBase). A non-identity
          // remapMap with an EMPTY delta (a re-mentioned historical
          // duplicate: its canonical is unchanged, so no remapKeys probe
          // fires) would otherwise leave the receiving canonical groups out
          // of affectedKeys and replace-by-key would DROP their stored rows.
          val specEdgesOk = linkIdle || remapMap.isEmpty
          rebuilt = mergeEdges(
            store, newRaw, batchId, delta, retractedKeyed, gid,
            preKeys = if (specEdgesOk) earlyKeys else null,
            preStored = if (specEdgesOk) earlyStored else null,
            preRebuilt = if (specEdgesOk) earlyRebuilt else null,
            preEntityEdges = if (specEdgesOk) earlyEntityEdges else null,
            // entity_edges rows for every episode cited by replaced/
            // rebuilt edges are patched inside mergeEdges; batch episodes
            // that produced no edges still need an explicit (empty) row —
            // folding them into the same patch replaces what used to be a
            // separate probe + merge after the stage group
            ensureEpisodes = episodes.select(col("uuid")),
          )
          ()
        },
      ))
    }
    if (compactNodes.get()) timed("compact nodes idx")(graft.search.SearchIndexes.compactText(store, "nodes"))
  }

  /** Canonical-NOW rewrite of a uuid column: bucketed probe of the
    * post-merge by-uuid map (covers entities outside a batch's surfaces,
    * e.g. mentions of a re-ingested page's OLD version).
    */
  private[streaming] def canonicalNow(store: SnapshotStore, df: DataFrame, uuidCol: String): DataFrame =
    if (store.exists("uuid_map_by_uuid")) {
      val m = store
        .loadForKeys("uuid_map_by_uuid", df.select(col(uuidCol).as("uuid")), Seq("uuid"))
        .select(col("uuid").as(uuidCol), col("canonical").as("__canon"))
      df.join(broadcast(m), Seq(uuidCol), "left")
        .withColumn(uuidCol, coalesce(col("__canon"), col(uuidCol)))
        .drop("__canon")
    } else df

  /** Merge raw fact rows (already canonical-uuid'd) into the edges
    * snapshot, rebuilding only affected contention groups:
    * groups keyed by the batch ∪ groups holding an endpoint whose
    * canonical changed (edge_endpoints index probe over the delta and its
    * targets — a component merge can move rows INTO a group whose own
    * endpoints never changed). Returns the rebuilt rows. Public so
    * `add_triplet`-style manual inserts run the exact same resolution
    * algebra as extraction output (graphiti.py:1021-1085).
    */
  def mergeEdges(
      store: SnapshotStore,
      newRaw: DataFrame,
      batchId: Long,
      remapDelta: DataFrame = null,
      retracted: DataFrame = null,
      groupId: String = "default",
      // speculative probe results from ingestBatch (the batch's PRE-remap
      // contention groups, probed concurrently with linking): remap /
      // retraction extras are unioned in below. All null on the
      // standalone (add_triplet) path. preRebuilt additionally carries the
      // speculatively FINALIZED rebuild of those groups (finalizeRebuild
      // over preStored ∪ the batch rows) — adopted only when the steady
      // preconditions verify below (identity remap, no retraction, no
      // extra affected groups).
      preKeys: DataFrame = null,
      preStored: DataFrame = null,
      preRebuilt: DataFrame = null,
      preEntityEdges: java.util.concurrent.Future[DataFrame] = null,
      // episode uuids that must end up with an entity_edges row even when
      // the batch produced no edges for them (folded into the patch task)
      ensureEpisodes: DataFrame = null,
  ): DataFrame = {
    val spark = newRaw.sparkSession
    import spark.implicits._
    val delta =
      if (remapDelta != null) remapDelta
      else Seq.empty[(String, String)].toDF("uuid", "canonical")
    // steady batches usually change NO canonicals: the endpoint-index
    // probe and both remap joins are then identity work — skip them
    // (delta is checkpointed by the caller, so isEmpty is O(1))
    val deltaEmpty = delta.isEmpty
    // manual_invalid_at rides along so explicit invalidate_edges() calls
    // survive group rebuilds (the window pass never overwrites it)
    val rebuildCols =
      Seq("group_id", "source_uuid", "name", "target_uuid", "fact", "valid_at", "created_at", "episodes", "manual_invalid_at")
    def withManual(df: DataFrame): DataFrame = withManualCol(df)
    val newRawM = withManual(newRaw)

    // CONTRACT: preKeys/preStored are only passed when they equal
    // newRaw's OWN group keys (ingestBatch guarantees this by passing
    // them only under an identity remap) — otherwise the batch keys are
    // derived from the (possibly remapped) newRaw here, so receiving
    // canonical groups are always probed and replace-by-key never drops
    // stored rows
    val batchKeys = if (preKeys != null) preKeys else newRaw.select(GroupKey.map(col): _*).distinct()
    // groups whose rows the remap touches: probe the endpoint index with
    // the changed uuids AND their new canonicals (the receiving group's
    // own endpoints are unchanged, but its row set must be re-deduped
    // against the rows moving in)
    val remapKeys =
      if (!deltaEmpty && store.exists("edge_endpoints")) {
        val probe = delta
          .select(col("uuid").as("endpoint_uuid"))
          .unionByName(delta.select(col("canonical").as("endpoint_uuid")))
          .distinct()
        store
          .loadForKeys("edge_endpoints", probe, Seq("endpoint_uuid"))
          .select(GroupKey.map(col): _*)
          .distinct()
      } else batchKeys.limit(0)
    // retraction-affected fact groups must also rebuild (a re-ingested
    // page's dropped facts can live in groups the new batch never touches)
    val retractKeys =
      if (retracted == null) batchKeys.limit(0)
      else retracted.select(GroupKey.map(col): _*).distinct()
    // extras beyond the speculative probe — empty for the common steady
    // batch (no remaps, no retractions), in which case no further probe
    // or key union runs at all
    val extraKeys =
      if (preKeys == null) null
      else remapKeys.unionByName(retractKeys).distinct().join(batchKeys, GroupKey, "left_anti").localCheckpoint()
    val affectedKeys = timed("  me:affected keys") {
      if (extraKeys != null && extraKeys.isEmpty) batchKeys
      else if (extraKeys != null) batchKeys.unionByName(extraKeys).localCheckpoint()
      else batchKeys.unionByName(remapKeys).unionByName(retractKeys).distinct().localCheckpoint()
    }

    // PRE-remap stored rows: this is what the search indexes were built
    // from, so delta removal must use these endpoints/keys verbatim.
    // Checkpointed because the frame feeds the rebuild AND four
    // concurrent index refreshes.
    val existingStored = timed("  me:stored probe") {
      if (!store.exists("edges")) null
      else if (preStored != null) {
        if (extraKeys == null || extraKeys.isEmpty) preStored
        else
          preStored
            .unionByName(withManual(store.loadForKeys("edges", extraKeys, GroupKey)), allowMissingColumns = true)
            .localCheckpoint()
      } else withManual(store.loadForKeys("edges", affectedKeys, GroupKey)).localCheckpoint()
    }
    val affectedExisting =
      if (existingStored == null) null
      else if (deltaEmpty) existingStored
      else Linking.remapPointers(existingStored, delta)
    // ---- retraction handling (re-ingested pages that DROPPED facts):
    // the stored collapsed rows for retracted fact keys are EXCLUDED from
    // the rebuild; the facts re-derive at per-assertion granularity from
    // their remaining supporters' re-extracted episode content (exact
    // valid_at/created_at/episodes — the retracting assertion's timestamp
    // contribution disappears), inheriting the excluded rows'
    // manual_invalid_at. A fact whose only supporter retracted vanishes.
    val factKey = Seq("group_id", "source_uuid", "name", "target_uuid")
    val hasRetractions = retracted != null && affectedExisting != null
    val retractedFacts =
      if (hasRetractions) retracted.select(factKey.map(col): _*).distinct() else null
    val cleanedExisting =
      if (!hasRetractions) affectedExisting
      else affectedExisting.join(retractedFacts, factKey, "left_anti")
    val supportRows =
      if (!hasRetractions) null
      else {
        val affectedFactRows = affectedExisting.join(retractedFacts, factKey, "left_semi")
        val supporters = affectedFactRows
          .select(factKey.map(col) :+ explode(col("episodes")).as("episode_uuid"): _*)
          .join(retracted.select((factKey :+ "episode_uuid").map(col): _*), factKey :+ "episode_uuid", "left_anti")
        // re-extract only the supporter episodes' current content
        val supPages = store
          .loadForKeys("episodes", supporters.select(col("episode_uuid").as("uuid")), Seq("uuid"))
          .select(col("name").as("url"), col("content").as("text"), col("created_at").as("warc_ts"))
        val supRaw = graft.kg.Extract
          .triplesTs(spark, supPages)
          .select(
            lit(groupId).as("group_id"),
            md5(concat(lit(s"en|$groupId|"), col("subj"))).as("source_uuid"),
            col("pred").as("name"),
            md5(concat(lit(s"en|$groupId|"), col("obj"))).as("target_uuid"),
            col("fact"),
            col("warc_ts").as("valid_at"),
            col("warc_ts").as("created_at"),
            array(md5(concat(lit(s"ep|$groupId|"), col("url")))).as("episodes"),
          )
        val supCanon = canonicalNow(store, canonicalNow(store, supRaw, "source_uuid"), "target_uuid")
          .join(retractedFacts, factKey, "left_semi")
        val manualByFact = affectedFactRows
          .groupBy(factKey.map(col): _*)
          .agg(min(col("manual_invalid_at")).as("manual_invalid_at"))
        supCanon.join(manualByFact, factKey, "left").select(rebuildCols.map(col): _*)
      }
    // existing edges re-enter at fact granularity: the stored episodes
    // array already carries all supporting episodes, so dedupe+invalidate
    // over (affected existing ∪ new) is idempotent
    val toRebuildBase =
      if (cleanedExisting == null) newRawM.select(rebuildCols.map(col): _*)
      else
        cleanedExisting
          .select(rebuildCols.map(col): _*)
          .unionByName(newRawM.select(rebuildCols.map(col): _*))
    val toRebuild =
      if (supportRows == null) toRebuildBase else toRebuildBase.unionByName(supportRows)
    // adopt the speculative finalization iff the steady preconditions
    // verify: identity remap (deltaEmpty), no retraction, and no extra
    // affected groups beyond the speculated probe — under exactly these,
    // toRebuild == steadyRebuildSet(preStored, newRawM) and
    // finalizeRebuild is deterministic, so the frames are value-identical
    val specRebuiltOk =
      preRebuilt != null && deltaEmpty && retracted == null && extraKeys != null && extraKeys.isEmpty
    val rebuilt = timed("  me:rebuild") {
      if (specRebuiltOk) preRebuilt
      else finalizeRebuild(toRebuild)
    }
    // the edges merge writes only `edges`; the index refreshes below read
    // checkpointed frames and write disjoint index tables — one concurrent
    // group instead of merge-then-refresh (compactions deferred, below)
    // search-index refresh (no-ops unless SearchIndexes were built):
    // replaced facts leave the postings/ANN buckets, rebuilt facts enter.
    // The four refreshes + the endpoint merge write DISJOINT tables over
    // the same (checkpointed) oldRows/rebuilt frames → concurrent jobs.
    // oldRows MUST be the PRE-remap stored rows: a canonical remap changes
    // source/target uuids, and removing the remapped pair from graph_adj /
    // edge_months would leave the stored pre-remap pair in place forever
    // (the remapped old row cancels against the rebuilt row → zero delta).
    val oldRows =
      if (existingStored == null) rebuilt.limit(0)
      else existingStored
    val tCols = Seq("uuid", "valid_at", "group_id", "source_uuid", "name").map(col)
    // every refresh here runs CONCURRENTLY with the sibling edges merge,
    // and every compaction path re-reads store.load("edges") — an inline
    // rebuild could fold the PRE-merge snapshot and then clear the delta
    // log holding this batch's rows (silent fact loss). All four refreshes
    // therefore append-only (defer=true) and the flagged compactions run
    // AFTER the barrier, once the edges merge has published (the same
    // stage-A discipline used for the episodes/nodes text indexes above).
    val compactEdgesText = new java.util.concurrent.atomic.AtomicBoolean(false)
    val compactAnn = new java.util.concurrent.atomic.AtomicBoolean(false)
    val compactAdj = new java.util.concurrent.atomic.AtomicBoolean(false)
    val compactMonths = new java.util.concurrent.atomic.AtomicBoolean(false)
    // checked BEFORE the group (the sibling edges merge may create the
    // table): maintain the by-uuid index only when it is already complete
    // or this batch IS the whole corpus (first merge)
    val edgeUuidsLive = store.exists("edge_uuids") || !store.exists("edges")
    timed("  me:merge+refreshes")(graft.io.Concurrent.runAll(Seq(
      () => timed("    me:t:edges") {
        store.mergeBucketed(
          "edges", rebuilt, GroupKey, s"incremental batch=$batchId edges",
          deleteKeys = Some(affectedKeys),
        )
        ()
      },
      () =>
        compactEdgesText.set(timed("    me:t:text")(graft.search.SearchIndexes.refreshText(
          store, "edges",
          oldRows.select(col("uuid").as("id"), col("fact").as("text")),
          rebuilt.select(col("uuid").as("id"), col("fact").as("text")),
          defer = true,
        ))),
      () =>
        compactAnn.set(timed("    me:t:ann")(graft.search.SearchIndexes.refreshAnn(
          store,
          oldRows.select(col("uuid"), col("fact_embedding")),
          rebuilt.select(col("uuid"), col("fact_embedding")),
          defer = true,
        ))),
      () =>
        compactAdj.set(timed("    me:t:graph")(graft.search.SearchIndexes.refreshGraph(
          store,
          oldRows.select(col("source_uuid"), col("target_uuid")),
          rebuilt.select(col("source_uuid"), col("target_uuid")),
          defer = true,
        ))),
      () =>
        compactMonths.set(timed("    me:t:months")(graft.search.SearchIndexes.refreshTemporal(
          store, oldRows.select(tCols: _*), rebuilt.select(tCols: _*), defer = true,
        ))),
      // endpoint index upkeep: append rebuilt groups' endpoint rows (stale
      // rows of moved endpoints only cause benign extra-probe hits)
      () => timed("    me:t:endpoints") {
        val idx = rebuilt
          .select(explode(array(col("source_uuid"), col("target_uuid"))).as("endpoint_uuid"), col("group_id"), col("source_uuid"), col("name"))
          .distinct()
          .localCheckpoint() // count pass + write pass share the shuffle
        store.mergeBucketed(
          "edge_endpoints", idx, Seq("endpoint_uuid", "group_id", "source_uuid", "name"),
          s"incremental batch=$batchId endpoints",
          bucketBy = Seq("endpoint_uuid"),
        )
        ()
      },
      // by-uuid locate index upkeep (same stale-row tolerance: a replaced
      // uuid's old entry probes a group that no longer holds it — benign).
      // Guarded by edgeUuidsLive: appending the batch alone into a store
      // whose pre-existing corpus was never bootstrapped would create a
      // PARTIAL index and locate probes would silently miss old rows.
      () => timed("    me:t:edge_uuids") {
        if (edgeUuidsLive) {
          store.mergeBucketed(
            "edge_uuids",
            rebuilt.select(col("uuid"), col("group_id"), col("source_uuid"), col("name")).distinct().localCheckpoint(),
            Seq("uuid"),
            s"incremental batch=$batchId edge_uuids",
          )
        }
        ()
      },
      // episodes.entity_edges upkeep (normalized side table): SURGICAL
      // patch for every episode cited by a replaced or rebuilt row —
      // edge-uuid changes (valid_at re-derivation, canonical remaps) must
      // propagate to NON-batch supporting episodes, whose lists also span
      // untouched groups and therefore can't be recomputed from this
      // partial view: drop exactly the replaced uuids, add the rebuilt ones
      () => timed("    me:t:entity_edges") {
        // adopt the speculatively computed patch under the SAME gate as
        // the rebuilt frame (its inputs are exactly oldRows/rebuilt/
        // ensureEpisodes, all proven equal there); otherwise compute here
        val spec =
          if (specRebuiltOk && preEntityEdges != null) preEntityEdges.get()
          else null
        val rowsOut =
          if (spec != null) spec
          else entityEdgesPatch(store, oldRows, rebuilt, ensureEpisodes)
        store.mergeBucketed("episode_entity_edges", rowsOut, Seq("uuid"), s"incremental batch=$batchId entity_edges")
        ()
      },
    )))
    // deferred compactions: the edges table is now at its post-batch
    // version, so the folds read the merged corpus. They write disjoint
    // index tables → one concurrent group (usually empty — a fold fires
    // only when a log outgrows its base, amortized over many batches).
    val folds = Seq.newBuilder[() => Unit]
    if (compactEdgesText.get()) folds += (() => graft.search.SearchIndexes.compactText(store, "edges"))
    if (compactAnn.get()) folds += (() => graft.search.SearchIndexes.buildAnn(store))
    if (compactAdj.get()) folds += (() => graft.search.SearchIndexes.compactGraph(store))
    if (compactMonths.get()) folds += (() => graft.search.SearchIndexes.buildTemporal(store))
    val foldTasks = folds.result()
    if (foldTasks.nonEmpty) timed("  me:deferred compactions")(graft.io.Concurrent.runAll(foldTasks))
    rebuilt
  }

  /** Structured Streaming wrapper: watch a directory of pages parquet,
    * run [[ingestBatch]] per micro-batch (`foreachBatch` — the reference's
    * max_batch_size chunking becomes Spark's file-source batching).
    */
  def stream(
      spark: SparkSession,
      store: SnapshotStore,
      inputDir: String,
      checkpointDir: String,
  ): StreamingQuery = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    spark.readStream
      .schema(schema)
      .parquet(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) => ingestBatch(store, batch, id) }
      .start()
  }
}
