package graft.streaming

import graft.io.SnapshotStore
import graft.kg.{Embedder, Extract, HtmlText, Invalidation, Linking}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental / streaming ingest — the re-expression of the reference's
  * `IncrementalUpdater` micro-batch deltas (`graphiti_hf/processing/
  * incremental_updater.py:94-388`) on Structured Streaming `foreachBatch`:
  * each batch of new pages runs the same extraction algebra, then merges
  * into the committed snapshots touching ONLY affected contention groups:
  *
  *  - nodes_raw / episodes / raw_triples: key-merge append;
  *  - uuid_map: re-linked over the (small) distinct-surface table — new
  *    aliases can re-canonicalize old nodes, so existing edges are passed
  *    through the updated pointer map (two broadcast joins);
  *  - edges: contention groups (group_id, source_uuid, name) present in
  *    the batch are re-deduped + re-invalidated over existing ∪ new;
  *    untouched groups are carried over verbatim (anti-join). This is the
  *    merge-on-read-shaped upsert: work ∝ batch size, not corpus size.
  *
  * Rollback = SnapshotStore.rollback to the pre-batch version (the
  * reference's delta rollback, `incremental_updater.py:913-954`).
  */
object IncrementalIngest {

  /** Apply one batch of new pages to the store, scoped to `groupId` (the
    * reference partitions every entity/episode by group_id —
    * huggingface_driver.py:535-554; entity uuids must NOT collide across
    * groups).
    */
  def ingestBatch(store: SnapshotStore, newPages: DataFrame, batchId: Long, groupId: String = "default"): Unit = {
    if (newPages.isEmpty) return
    val spark = newPages.sparkSession

    val withText = newPages.withColumn("text", coalesce(col("text"), HtmlText.textOf(col("html"))))

    // episodes: append new urls (entity_edges back-filled after mergeEdges)
    val episodes = withText.select(
      md5(concat(lit(s"ep|$groupId|"), col("url"))).as("uuid"),
      col("url").as("name"),
      col("text").as("content"),
      lit("text").as("source"),
      lit("web crawl").as("source_description"),
      lit(groupId).as("group_id"),
      col("warc_ts").as("created_at"),
      col("warc_ts").as("valid_at"),
      array().cast("array<string>").as("entity_edges"),
    )
    store.merge("episodes", episodes, Seq("uuid"), s"incremental batch=$batchId episodes")

    // raw triples for the new pages (single-pass, shuffle-free)
    val triples = Extract.triplesTs(spark, withText).withColumn("group_id", lit(groupId))
    store.merge("raw_triples", triples, Seq("group_id", "url", "subj", "pred", "obj"), s"incremental batch=$batchId triples")

    // new surfaces → nodes_raw merge
    val spark2 = spark
    import spark2.implicits._
    val gid = groupId
    val surfaces = triples
      .select(col("subj").as("name"))
      .unionByName(triples.select(col("obj").as("name")))
      .distinct()
      .as[String]
      .mapPartitions(it => it.map(n => (graft.kg.Ids.entity(gid, n), n, Extract.entityTypeOf(n), Embedder.embed(n).toSeq, gid)))
      .toDF("uuid", "name", "label", "name_embedding", "group_id")
    store.merge("nodes_raw", surfaces, Seq("uuid"), s"incremental batch=$batchId nodes_raw")

    // re-link over the merged surface table (distinct surfaces ≪ corpus)
    val uuidMap = Linking.canonicalMap(Linking.duplicatePairs(store.load("nodes_raw")))
    store.commit(uuidMap, "uuid_map", s"incremental batch=$batchId uuid_map")

    // canonical nodes — same full schema as the bulk pipeline's stage 5
    // (summary/created_at/mention_count from the merged raw_triples)
    // raw_triples spans ALL groups ingested so far: reconstruct each
    // mention's uuid with ITS OWN group prefix (not this batch's)
    val allTriples = store.load("raw_triples")
    val nodeFacts = allTriples
      .select(col("group_id").as("g"), explode(array(col("subj"), col("obj"))).as("name"), col("fact"), col("warc_ts"))
      .withColumn("uuid", md5(concat(lit("en|"), col("g"), lit("|"), col("name"))))
      .join(broadcast(uuidMap), Seq("uuid"), "left")
      .withColumn("cuuid", coalesce(col("canonical"), col("uuid")))
      .groupBy(col("cuuid"))
      .agg(
        min(col("fact")).as("summary"),
        min(col("warc_ts")).as("created_at"),
        count(lit(1)).as("mention_count"),
      )
    val canon = store
      .load("nodes_raw")
      .join(broadcast(uuidMap), Seq("uuid"), "left")
      .withColumn("canonical", coalesce(col("canonical"), col("uuid")))
      .filter(col("uuid") === col("canonical"))
      .join(nodeFacts, col("uuid") === col("cuuid"), "left")
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
    store.commit(canon, "nodes", s"incremental batch=$batchId nodes")

    // edge merge: remap everything through the UPDATED map, then rebuild
    // only affected contention groups
    val newRaw = Linking.remapPointers(
      triples.select(
        md5(concat(lit(s"en|$groupId|"), col("subj"))).as("source_uuid"),
        col("pred").as("name"),
        md5(concat(lit(s"en|$groupId|"), col("obj"))).as("target_uuid"),
        col("fact"),
        lit(groupId).as("group_id"),
        col("warc_ts").as("valid_at"),
        col("warc_ts").as("created_at"),
        array(md5(concat(lit(s"ep|$groupId|"), col("url")))).as("episodes"),
      ),
      uuidMap,
    )
    // episodic MENTIONS edges: remap any stale canonicals, then merge the
    // batch's mentions (same shape as bulk stage 7)
    val staleRemapped =
      if (store.exists("episodic_edges"))
        store
          .load("episodic_edges")
          .join(broadcast(uuidMap), col("entity_uuid") === col("uuid"), "left")
          .withColumn("entity_uuid", coalesce(col("canonical"), col("entity_uuid")))
          .drop("uuid", "canonical")
          .dropDuplicates("episode_uuid", "entity_uuid")
      else null
    if (staleRemapped != null)
      store.commit(staleRemapped, "episodic_edges", s"incremental batch=$batchId remap mentions")
    val mentionRows = triples
      .select(col("url"), explode(array(col("subj"), col("obj"))).as("name"))
      .distinct()
      .withColumn("entity_uuid", md5(concat(lit(s"en|$groupId|"), col("name"))))
      .join(broadcast(uuidMap), col("entity_uuid") === col("uuid"), "left")
      .withColumn("entity_uuid", coalesce(col("canonical"), col("entity_uuid")))
      .select(
        md5(concat(lit(s"ep|$groupId|"), col("url"))).as("episode_uuid"),
        col("entity_uuid"),
      )
      .distinct()
      .withColumn("name", lit("MENTIONS"))
      .withColumn("group_id", lit(groupId))
    store.merge("episodic_edges", mentionRows, Seq("episode_uuid", "entity_uuid"), s"incremental batch=$batchId mentions")

    mergeEdges(store, newRaw, batchId)

    // back-fill entity_edges for this batch's episodes (reverse mapping of
    // edges.episodes, restricted to the batch's episode uuids)
    val batchEpUuids = episodes.select(col("uuid"))
    val byEpisode = store
      .load("edges")
      .select(col("uuid").as("edge_uuid"), explode(col("episodes")).as("uuid"))
      .join(batchEpUuids, Seq("uuid"), "left_semi")
      .groupBy(col("uuid"))
      .agg(array_sort(collect_set(col("edge_uuid"))).as("entity_edges"))
    val epUpdated = store
      .load("episodes")
      .join(batchEpUuids, Seq("uuid"), "left_semi")
      .drop("entity_edges")
      .join(byEpisode, Seq("uuid"), "left")
      .withColumn("entity_edges", coalesce(col("entity_edges"), array().cast("array<string>")))
    store.merge("episodes", epUpdated, Seq("uuid"), s"incremental batch=$batchId entity_edges")
  }

  /** Merge raw fact rows (already canonical-uuid'd) into the edges
    * snapshot, rebuilding only affected contention groups. Public so
    * `add_triplet`-style manual inserts run the exact same resolution
    * algebra as extraction output (graphiti.py:1021-1085).
    */
  def mergeEdges(store: SnapshotStore, newRaw: DataFrame, batchId: Long): Unit = {
    import newRaw.sparkSession.implicits._
    val uuidMap =
      if (store.exists("uuid_map")) store.load("uuid_map")
      else Seq.empty[(String, String)].toDF("uuid", "canonical")
    val embedUdf = udf((s: String) => Embedder.embed(s).toSeq)
    // manual_invalid_at rides along so explicit invalidate_edges() calls
    // survive group rebuilds (the window pass never overwrites it)
    val rebuildCols =
      Seq("group_id", "source_uuid", "name", "target_uuid", "fact", "valid_at", "created_at", "episodes", "manual_invalid_at")
    def withManual(df: DataFrame): DataFrame =
      if (df.columns.contains("manual_invalid_at")) df
      else df.withColumn("manual_invalid_at", lit(null).cast("timestamp"))
    val newRawM = withManual(newRaw)
    // remap existing edges through the UPDATED map; a later-arriving alias
    // can re-canonicalize endpoints of edges the batch never mentions, so
    // contention groups to rebuild = groups touched by the batch ∪ groups
    // whose endpoints the remap changed (merging two groups requires a
    // re-dedup + re-invalidate over their union)
    val existingRemapped =
      if (store.exists("edges"))
        Linking
          .remapPointers(
            withManual(store.load("edges"))
              .withColumn("orig_src", col("source_uuid"))
              .withColumn("orig_dst", col("target_uuid")),
            uuidMap,
          )
          .withColumn("changed", col("source_uuid") =!= col("orig_src") || col("target_uuid") =!= col("orig_dst"))
      else null
    val batchKeys = newRaw.select(col("group_id"), col("source_uuid"), col("name")).distinct()
    val affectedKeys =
      if (existingRemapped == null) batchKeys
      else
        batchKeys
          .unionByName(
            existingRemapped.filter(col("changed")).select(col("group_id"), col("source_uuid"), col("name")).distinct(),
          )
          .distinct()
    val affectedExisting =
      if (existingRemapped == null) newRawM.limit(0).select(rebuildCols.map(col): _*)
      else
        existingRemapped
          .join(affectedKeys, Seq("group_id", "source_uuid", "name"), "left_semi")
          .select(rebuildCols.map(col): _*)
    val untouched =
      if (existingRemapped == null) null
      else
        existingRemapped
          .join(affectedKeys, Seq("group_id", "source_uuid", "name"), "left_anti")
          .drop("orig_src", "orig_dst", "changed")
    // existing edges re-enter at fact granularity: the stored episodes
    // array already carries all supporting episodes, so dedupe+invalidate
    // over (affected existing ∪ new) is idempotent
    val rebuilt = Invalidation
      .invalidate(Invalidation.dedupeFacts(affectedExisting.unionByName(newRawM.select(rebuildCols.map(col): _*))))
      .withColumn("fact_embedding", embedUdf(col("fact")))
      .withColumn(
        "uuid",
        md5(concat_ws("|", lit("ed"), col("group_id"), col("source_uuid"), col("name"), col("target_uuid"), col("valid_at").cast("string"))),
      )
    val mergedEdges = if (untouched == null) rebuilt else untouched.unionByName(rebuilt)
    store.commit(mergedEdges, "edges", s"incremental batch=$batchId edges")
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
