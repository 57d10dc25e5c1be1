package graft.io

import graft.kg.{Embedder, Extract, Ids}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bulk migration into a snapshot store — the Spark re-expression of the
  * reference's `graphiti_hf/migration.py` (GraphitiMigrator +
  * BatchProcessor). The reference loops episodes/triplets through
  * per-row `save_node`/`save_edge` calls in driver-side batches
  * (`migration.py:45-151, 327-410`); here every batch is ONE distributed
  * job through the same ingest algebra the pipeline uses, and each batch
  * is a committed snapshot — a killed migration resumes by re-running
  * (already-migrated batches no-op via the skip-existing anti-join).
  */
object Migration {

  /** Per-run statistics (migration.py `migration_stats`). */
  final case class MigrationStats(
      totalRows: Long,
      migrated: Long,
      skippedExisting: Long,
      invalidRows: Long,
      batches: Int,
      nodesAdded: Long,
      edgesAdded: Long,
  )

  /** `transform_episode_format` (migration.py:429-458): map a foreign
    * episode frame onto the pages schema the ingest path consumes.
    * Accepted column spellings follow the reference's fallbacks: content /
    * episode_body / body for the text; name / url for the identifier;
    * reference_time / valid_at / created_at for the timestamp. Missing
    * timestamps default to the reference's `datetime.now()` stand-in —
    * here a fixed epoch so migration stays deterministic.
    */
  def toPages(episodes: DataFrame, defaultTs: java.sql.Timestamp = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")): DataFrame = {
    val cols = episodes.columns.toSet
    def pick(names: String*): org.apache.spark.sql.Column =
      names.find(cols.contains).map(col).getOrElse(lit(null))
    episodes.select(
      pick("name", "url").cast("string").as("url"),
      coalesce(pick("reference_time", "valid_at", "created_at").cast("timestamp"), lit(defaultTs)).as("warc_ts"),
      lit(null).cast("binary").as("html"),
      // collapse whitespace runs like the HtmlText pipeline path does —
      // the engine's tokenizer contract is split-on-single-space, so
      // un-normalized foreign text (newlines, tabs, double spaces) would
      // produce glued tokens and inflated doc lengths in every text index
      trim(regexp_replace(pick("content", "episode_body", "body").cast("string"), "\\s+", " ")).as("text"),
      coalesce(pick("lang").cast("string"), lit("en")).as("lang"),
    )
  }

  /** `migrate_from_neo4j` analog (migration.py:45-151): bulk-load a
    * foreign episodes frame into `store` through the incremental-ingest
    * algebra. `batchSize` bounds per-commit work exactly like the
    * reference's episode batches — but each batch here is one distributed
    * job over a deterministic hash slice (resume = re-run; completed
    * slices fall out via the skip-existing anti-join, so a mid-migration
    * kill loses at most one uncommitted batch). `skipExisting` mirrors
    * migration.py's skip_existing: episodes whose derived uuid is already
    * committed are not re-ingested.
    */
  def migrateEpisodes(
      store: SnapshotStore,
      episodes: DataFrame,
      groupId: String = "default",
      batchSize: Int = 1000,
      skipExisting: Boolean = true,
  ): MigrationStats = {
    val raw = toPages(episodes).localCheckpoint()
    val totalIn = raw.count()
    val valid = raw.filter(col("url").isNotNull && col("text").isNotNull)
    // deterministic latest-crawl-wins per url (same rule as ingestBatch)
    // — a bare dropDuplicates would migrate an arbitrary version
    val urlW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("url"))
      .orderBy(col("warc_ts").desc_nulls_last, xxhash64(col("html")).desc)
    val pages = valid
      .withColumn("__rn", row_number().over(urlW))
      .filter(col("__rn") === 1)
      .drop("__rn")
      .localCheckpoint()
    val total = pages.count()
    val invalid = totalIn - valid.count()
    // Resume marker: a url counts as DONE only after its whole batch's
    // ingest returned — keying skip-existing on the episodes table would
    // silently lose the nodes/edges of a batch killed after its episodes
    // merge (stage-A) but before its edges merge (stage-B). Re-running a
    // half-ingested batch is safe: re-ingest of identical content is
    // idempotent (ReIngestSpec).
    val existing =
      if (skipExisting && store.exists("migration_done"))
        store.load("migration_done").select(col("uuid"))
      else pages.sparkSession.emptyDataFrame.withColumn("uuid", lit("")).limit(0).select(col("uuid"))
    val fresh = pages
      .withColumn("uuid", md5(concat(lit(s"ep|$groupId|"), col("url"))))
      .join(existing, Seq("uuid"), "left_anti")
      .localCheckpoint()
    val toMigrate = fresh.count()

    val nodes0 = if (store.exists("nodes")) store.load("nodes").count() else 0L
    val edges0 = if (store.exists("edges")) store.load("edges").count() else 0L

    val nBatches = math.max(1, math.ceil(toMigrate.toDouble / batchSize).toInt)
    val sliced = fresh.withColumn("__slice", pmod(xxhash64(col("url")), lit(nBatches)))
    var done = 0
    (0 until nBatches).foreach { b =>
      val slice = sliced.filter(col("__slice") === b).drop("__slice").localCheckpoint()
      if (!slice.isEmpty) {
        graft.streaming.IncrementalIngest.ingestBatch(store, slice.drop("uuid"), batchId = 9000L + b, groupId)
        store.mergeBucketed("migration_done", slice.select(col("uuid")), Seq("uuid"), s"migration batch $b done")
        done += 1
      }
    }

    val nodes1 = if (store.exists("nodes")) store.load("nodes").count() else 0L
    val edges1 = if (store.exists("edges")) store.load("edges").count() else 0L
    MigrationStats(
      totalRows = total,
      migrated = toMigrate,
      skippedExisting = total - toMigrate,
      invalidRows = invalid,
      batches = done,
      nodesAdded = nodes1 - nodes0,
      edgesAdded = edges1 - edges0,
    )
  }

  /** `validate_triplet_data` (migration.py:459-478): split a triplet frame
    * into (valid, rejected). A row is valid when source, target and
    * relation are present, non-empty strings.
    */
  def validateTriplets(triplets: DataFrame): (DataFrame, DataFrame) = {
    val required = Seq("source", "target", "relation")
    val missing = required.filterNot(triplets.columns.contains)
    require(missing.isEmpty, s"triplet frame missing columns: ${missing.mkString(", ")} (migration.py:459-478)")
    val ok = required
      .map(c => col(c).isNotNull && length(trim(col(c))) > 0)
      .reduce(_ && _)
    (triplets.filter(ok), triplets.filter(!ok))
  }

  /** `batch_add_triplets` (migration.py:327-410): distributed bulk form of
    * GraphitiSpark.addTriplet. The reference loops save_node(source),
    * save_node(target), save_edge per triplet; here each batch is three
    * distributed merges — entity surfaces insert-if-absent into
    * nodes_raw / node_blocks / nodes (direct save_node semantics: no
    * LLM-dedup pass, matching the reference's driver.save_node), then the
    * raw facts enter the SAME canonical-probe + dedup +
    * contradiction-invalidation merge as extraction output (mergeEdges).
    * Returns stats; invalid rows are counted, not thrown (the reference
    * logs-and-continues).
    */
  /** save_node insert-if-absent for a batch of entity `names` (name
    * column): surfaces enter nodes_raw / node_blocks / nodes with the
    * pipeline's exact row shapes, and the nodes keyword index refreshes
    * with the inserted rows (skipping it would leave keyword search
    * silently missing every saved entity). Existing uuids pass through
    * untouched. Returns the number inserted. (No node_stats row: stats
    * are mention-derived, and a manual save asserts no extracted
    * mentions — a later extraction batch creates the row via its own
    * partial aggregate.)
    */
  def saveNodes(
      store: SnapshotStore,
      names: DataFrame,
      groupId: String,
      createdAt: java.sql.Timestamp,
      tag: String = "save_nodes",
  ): Long = {
    val surfaces = Extract.entityNodes(names.select(col("name")).distinct(), groupId).localCheckpoint()
    val known =
      if (store.exists("nodes_raw"))
        store.loadForKeys("nodes_raw", surfaces.select(col("uuid")), Seq("uuid")).select(col("uuid"))
      else surfaces.select(col("uuid")).limit(0)
    val newSurfaces = surfaces.join(known, Seq("uuid"), "left_anti").localCheckpoint()
    if (newSurfaces.isEmpty) return 0L
    store.mergeBucketed("nodes_raw", newSurfaces, Seq("uuid"), s"$tag nodes_raw")
    store.mergeBucketed(
      "node_blocks", graft.kg.Linking.blockingKeys(newSurfaces), Seq("key", "uuid"),
      s"$tag blocks", bucketBy = Seq("key"),
    )
    val nodeRows = newSurfaces.select(
      col("uuid"),
      col("name"),
      col("group_id"),
      array(col("label")).as("labels"),
      lit(createdAt).as("created_at"),
      col("name_embedding"),
      col("name").as("summary"),
      map(
        lit("entity_type"), col("label"),
        lit("mention_count"), lit("0"),
      ).as("attributes"),
    )
    if (store.exists("nodes"))
      store.mergeBucketed("nodes", nodeRows, Seq("uuid"), s"$tag nodes")
    else store.commit(nodeRows, "nodes", s"$tag nodes")
    graft.search.SearchIndexes.refreshText(
      store, "nodes",
      nodeRows.limit(0).select(col("uuid").as("id"), col("name").as("text")),
      nodeRows.select(col("uuid").as("id"), col("name").as("text")),
    )
    newSurfaces.count()
  }

  def batchAddTriplets(
      store: SnapshotStore,
      triplets: DataFrame,
      groupId: String = "default",
      batchSize: Int = 100,
      validAt: java.sql.Timestamp = java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
  ): MigrationStats = {
    val spark = triplets.sparkSession
    import spark.implicits._
    val (valid0, invalid) = validateTriplets(triplets)
    val valid = valid0
      .select(
        trim(col("source")).as("source"),
        trim(col("relation")).as("relation"),
        trim(col("target")).as("target"),
        coalesce(
          if (triplets.columns.contains("valid_at")) col("valid_at").cast("timestamp") else lit(null).cast("timestamp"),
          lit(validAt),
        ).as("valid_at"),
      )
      .dropDuplicates("source", "relation", "target", "valid_at")
      .localCheckpoint()
    val nInvalid = invalid.count()
    val total = valid.count()

    val nodes0 = if (store.exists("nodes")) store.load("nodes").count() else 0L
    val edges0 = if (store.exists("edges")) store.load("edges").count() else 0L

    val gid = groupId
    val nBatches = math.max(1, math.ceil(total.toDouble / batchSize).toInt)
    val sliced = valid
      .withColumn("__slice", pmod(xxhash64(col("source"), col("relation"), col("target")), lit(nBatches)))
      .localCheckpoint()
    (0 until nBatches).foreach { b =>
      val batch = sliced.filter(col("__slice") === b).drop("__slice")
      if (!batch.isEmpty) {
        // ---- save_node: surfaces insert-if-absent (uuid/name/label/
        // embedding shaped exactly like the pipeline's nodes_raw rows) ----
        saveNodes(
          store,
          batch
            .select(col("source").as("name"))
            .unionByName(batch.select(col("target").as("name")))
            .distinct(),
          gid,
          validAt,
          tag = s"batch_add_triplets b=$b",
        )

        // ---- save_edge: raw facts through the canonical-probe + merge
        // path (same algebra as GraphitiSpark.addTriplet, but one
        // distributed merge for the whole batch) ----
        val raw = batch
          .as[(String, String, String, java.sql.Timestamp)]
          .mapPartitions(it =>
            it.map { case (s, p, o, ts) =>
              (
                Ids.entity(gid, s), p, Ids.entity(gid, o), s"$s $p $o", gid,
                ts, ts, Seq(Ids.edge(gid, s, p, o, ts.getTime)),
              )
            },
          )
          .toDF("source_uuid", "name", "target_uuid", "fact", "group_id", "valid_at", "created_at", "episodes")
          .localCheckpoint()
        val endpoints = raw
          .select(col("source_uuid").as("uuid"))
          .unionByName(raw.select(col("target_uuid").as("uuid")))
          .distinct()
        // remap gate mirrors the probe's source exactly (same hazard as
        // GraphitiSpark.addTriplet: gating on uuid_map alone would discard
        // a by_uuid-only probe and write raw non-canonical endpoints)
        val hasMap = store.exists("uuid_map_by_uuid") || store.exists("uuid_map")
        val m =
          if (store.exists("uuid_map_by_uuid")) store.loadForKeys("uuid_map_by_uuid", endpoints, Seq("uuid"))
          else if (store.exists("uuid_map")) store.load("uuid_map").join(endpoints, Seq("uuid"), "left_semi")
          else spark.emptyDataFrame
        val remapped = if (hasMap) graft.kg.Linking.remapPointers(raw, m) else raw
        // the reference's add_triplet resolves against a synthetic episode
        // it never saves (graphiti.py:1065-1075), leaving the edge's
        // episodes list dangling; here the manual-assertion episode is a
        // REAL (empty-content) episodes row, so the remove-episode cascade
        // and the validator's episodes-resolve invariant hold for manual
        // triplets too
        val manualEpisodes = remapped
          .select(explode(col("episodes")).as("uuid"), col("group_id"), col("valid_at"))
          .dropDuplicates("uuid")
          .select(
            col("uuid"),
            lit("").as("name"),
            lit("").as("content"),
            lit("manual").as("source"),
            lit("manual triplet").as("source_description"),
            col("group_id"),
            col("valid_at").as("created_at"),
            col("valid_at"),
          )
          .localCheckpoint()
        // refresh stats only for GENUINELY new episode rows — re-asserting
        // a triplet upserts the same uuid and must not bump n_docs again
        val newManual =
          if (!store.exists("episodes")) manualEpisodes
          else
            manualEpisodes
              .join(
                store.loadForKeys("episodes", manualEpisodes.select(col("uuid")), Seq("uuid")).select(col("uuid")),
                Seq("uuid"),
                "left_anti",
              )
              .localCheckpoint()
        store.mergeBucketed("episodes", manualEpisodes, Seq("uuid"), s"batch_add_triplets episodes b=$b")
        if (store.exists("episodes_postings"))
          graft.search.SearchIndexes.refreshText(
            store, "episodes",
            newManual.limit(0).select(col("uuid").as("id"), col("content").as("text")),
            newManual.select(col("uuid").as("id"), col("content").as("text")),
          )
        graft.streaming.IncrementalIngest.mergeEdges(store, remapped, batchId = -(3000L + b))
      }
    }

    val nodes1 = if (store.exists("nodes")) store.load("nodes").count() else 0L
    val edges1 = if (store.exists("edges")) store.load("edges").count() else 0L
    MigrationStats(
      totalRows = total + nInvalid,
      migrated = total,
      skippedExisting = 0,
      invalidRows = nInvalid,
      batches = nBatches,
      nodesAdded = nodes1 - nodes0,
      edgesAdded = edges1 - edges0,
    )
  }

  /** `validate_migration_integrity` (migration.py:237-307): compare
    * source-vs-target table counts plus embedding coverage
    * (include_embeddings contract). One row per check: (check,
    * source_count, target_count, matches).
    */
  def validateIntegrity(source: SnapshotStore, target: SnapshotStore): DataFrame = {
    val spark = source.spark
    import spark.implicits._
    def counts(st: SnapshotStore): Seq[(String, Long)] = Seq(
      "episodes" -> (if (st.exists("episodes")) st.load("episodes").count() else 0L),
      "nodes" -> (if (st.exists("nodes")) st.load("nodes").count() else 0L),
      "edges" -> (if (st.exists("edges")) st.load("edges").count() else 0L),
      "nodes_with_embedding" ->
        (if (st.exists("nodes")) st.load("nodes").filter(size(col("name_embedding")) > 0).count() else 0L),
    )
    val s = counts(source).toMap
    val t = counts(target).toMap
    s.keys.toSeq.sorted
      .map(k => (k, s(k), t(k), s(k) == t(k)))
      .toDF("check", "source_count", "target_count", "matches")
  }
}
