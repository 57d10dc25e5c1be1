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

  /** Apply one batch of new pages to the store (groupId fixed "default"). */
  def ingestBatch(store: SnapshotStore, newPages: DataFrame, batchId: Long): Unit = {
    if (newPages.isEmpty) return
    val spark = newPages.sparkSession
    val groupId = "default"

    val withText = newPages.withColumn("text", coalesce(col("text"), HtmlText.textOf(col("html"))))

    // episodes: append new urls
    val episodes = withText.select(
      md5(concat(lit(s"ep|$groupId|"), col("url"))).as("uuid"),
      col("url").as("name"),
      col("text").as("content"),
      lit("text").as("source"),
      lit("web crawl").as("source_description"),
      lit(groupId).as("group_id"),
      col("warc_ts").as("created_at"),
      col("warc_ts").as("valid_at"),
    )
    store.merge("episodes", episodes, Seq("uuid"), s"incremental batch=$batchId episodes")

    // raw triples for the new pages (single-pass, shuffle-free)
    val triples = Extract.triplesTs(spark, withText)
    store.merge("raw_triples", triples, Seq("url", "subj", "pred", "obj"), s"incremental batch=$batchId triples")

    // new surfaces → nodes_raw merge
    val spark2 = spark
    import spark2.implicits._
    val surfaces = triples
      .select(col("subj").as("name"))
      .unionByName(triples.select(col("obj").as("name")))
      .distinct()
      .as[String]
      .mapPartitions(it => it.map(n => (graft.kg.Ids.entity("default", n), n, Extract.entityTypeOf(n), Embedder.embed(n).toSeq)))
      .toDF("uuid", "name", "label", "name_embedding")
    store.merge("nodes_raw", surfaces, Seq("uuid"), s"incremental batch=$batchId nodes_raw")

    // re-link over the merged surface table (distinct surfaces ≪ corpus)
    val uuidMap = Linking.canonicalMap(Linking.duplicatePairs(store.load("nodes_raw")))
    store.commit(uuidMap, "uuid_map", s"incremental batch=$batchId uuid_map")

    // canonical nodes
    val canon = store
      .load("nodes_raw")
      .join(broadcast(uuidMap), Seq("uuid"), "left")
      .withColumn("canonical", coalesce(col("canonical"), col("uuid")))
      .filter(col("uuid") === col("canonical"))
      .select(col("uuid"), col("name"), lit(groupId).as("group_id"), array(col("label")).as("labels"), col("name_embedding"))
    store.commit(canon, "nodes", s"incremental batch=$batchId nodes")

    // edge merge: remap everything through the UPDATED map, then rebuild
    // only affected contention groups
    val newRaw = Linking.remapPointers(
      triples.select(
        md5(concat(lit("en|default|"), col("subj"))).as("source_uuid"),
        col("pred").as("name"),
        md5(concat(lit("en|default|"), col("obj"))).as("target_uuid"),
        col("fact"),
        lit(groupId).as("group_id"),
        col("warc_ts").as("valid_at"),
        col("warc_ts").as("created_at"),
        array(md5(concat(lit(s"ep|$groupId|"), col("url")))).as("episodes"),
      ),
      uuidMap,
    )
    mergeEdges(store, newRaw, batchId)
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
    val rebuildCols = Seq("group_id", "source_uuid", "name", "target_uuid", "fact", "valid_at", "created_at", "episodes")
    // remap existing edges through the UPDATED map; a later-arriving alias
    // can re-canonicalize endpoints of edges the batch never mentions, so
    // contention groups to rebuild = groups touched by the batch ∪ groups
    // whose endpoints the remap changed (merging two groups requires a
    // re-dedup + re-invalidate over their union)
    val existingRemapped =
      if (store.exists("edges"))
        Linking
          .remapPointers(
            store
              .load("edges")
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
      if (existingRemapped == null) newRaw.limit(0).select(rebuildCols.map(col): _*)
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
      .invalidate(Invalidation.dedupeFacts(affectedExisting.unionByName(newRaw.select(rebuildCols.map(col): _*))))
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
