package graft.community

import graft.graph.GraphOps
import graft.io.SnapshotStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Community construction over the entity graph — the re-expression of
  * `build_communities` (`graphiti_core/utils/maintenance/
  * community_operations.py:29-131`): per group_id, project the entity
  * co-edge graph, run label propagation to fixpoint, materialize
  * CommunityNode rows + HAS_MEMBER edges, and summarize members
  * deterministically (the reference's LLM summarizer is a pluggable
  * hierarchical reduce; ours concatenates the lexicographically first
  * member names — same operator shape, deterministic content).
  */
object Communities {

  /** Build communities from the store's edges/nodes; commits
    * `communities` and `community_edges` snapshots. `algorithm` mirrors
    * the reference's CommunityDetector choice (`community_detector.py:
    * 119-183`): "louvain" (modularity, [[Louvain]]), "ward"
    * ([[Hierarchical]]), "clique" ([[CliquePercolation]], overlapping) or
    * "label_prop" (default — the reference's own fallback); unknown names
    * fail fast.
    */
  def build(
      store: SnapshotStore,
      maxIter: Int = 10,
      algorithm: String = "label_prop",
      groupIds: Seq[String] = Nil,
      minClusterSize: Int = 1,
      kClusters: Option[Int] = None,
  ): Unit = {
    // group_ids scoping (detect_graph_communities, huggingface_driver.py:
    // 2431-2477): entity uuids are group-scoped, so filtering nodes and
    // keeping only edges between surviving nodes confines every algorithm
    // to the requested partitions
    val nodes0 = store.load("nodes")
    val nodes = if (groupIds.isEmpty) nodes0 else nodes0.filter(col("group_id").isin(groupIds: _*))
    val edges0 = store.load("edges")
    val edges =
      if (groupIds.isEmpty) edges0
      else edges0.filter(col("group_id").isin(groupIds: _*))

    // string-uuid graph (GraphOps/Louvain are id-type generic)
    val adj = edges.select(col("source_uuid").as("src"), col("target_uuid").as("dst"))
    val rawLabels = algorithm match {
      case "label_prop" => GraphOps.labelPropagation(adj, maxIter)
      case "louvain" => Louvain.cluster(adj).select(col("node"), col("community").as("label"))
      case "ward" =>
        // embedding-space Ward (community_detector.py:317-396) — gated to
        // the reference's small-graph bound; k ≈ √n like its default
        val n = nodes.count().toInt
        Hierarchical
          .wardCommunities(
            nodes,
            "uuid",
            "name_embedding",
            k = kClusters.getOrElse(math.max(1, math.sqrt(n.toDouble).toInt)),
          )
          .select(col("id").as("node"), col("community").as("label"))
      case "kmeans" =>
        // embedding-space kmeans (community_detector.py:299-315), k ≈ √n
        // unless configured (k_clusters)
        val n = math.max(1, nodes.count().toInt)
        val k = kClusters.getOrElse(math.max(1, math.sqrt(n.toDouble).toInt))
        KMeansCommunities
          .assign(nodes.sparkSession, nodes, k)
          .select(col("uuid").as("node"), col("community").cast("string").as("label"))
      case "clique" =>
        // k=3 clique percolation (community_detector.py:269-297);
        // membership OVERLAPS (a node may get several labels) and
        // non-triangle nodes get none — NetworkX k_clique_communities
        // semantics, which the HAS_MEMBER materialization below carries
        // through unchanged
        CliquePercolation.communities(adj).select(col("node"), col("community_key").as("label"))
      case other => sys.error(s"unknown community algorithm: $other (label_prop|louvain|ward|kmeans|clique)")
    }
    // min_cluster_size (CommunityDetectionConfig, community_detector.py:
    // 66-78): drop communities below the floor BEFORE materialization
    val labels =
      if (minClusterSize <= 1) rawLabels
      else {
        val big = rawLabels.groupBy(col("label")).agg(count(lit(1)).as("csz")).filter(col("csz") >= minClusterSize)
        rawLabels.join(big.select(col("label")), Seq("label"), "left_semi")
      }

    // HAS_MEMBER edges: community label → entity member. group_id is
    // carried from the member nodes — edges never cross groups (entity
    // uuids are group-scoped), so every component lives in exactly one
    // group and the reference's per-group community partitioning
    // (community_operations.py:49-57) holds by construction.
    val members = labels
      .select(col("label").as("community_key"), col("node").as("entity_uuid"))
      .join(
        nodes.select(col("uuid").as("entity_uuid"), col("name"), col("group_id")),
        Seq("entity_uuid"),
      )

    // deterministic community node: uuid from (group, label); name/summary
    // from the first (lexicographic) member names
    // sort_array over collected (rn, name) structs: a bare collect_list
    // after the window exchange has NO guaranteed element order — the
    // concatenated names (and thus the community's name, summary and
    // summary embedding) would vary between identical runs
    val w = Window.partitionBy(col("community_key")).orderBy(col("name"), col("entity_uuid"))
    val summaries = members
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .groupBy(col("community_key"))
      .agg(
        concat_ws(", ", transform(sort_array(collect_list(struct(col("rn"), col("name")))), _.getField("name")))
          .as("top_members"),
      )
    val sizes = members
      .groupBy(col("community_key"))
      .agg(count(lit(1)).as("n_members"), min(col("group_id")).as("group_id"))
    val communities = sizes
      .join(summaries, Seq("community_key"))
      .select(
        md5(concat(lit("co|"), col("group_id"), lit("|"), col("community_key"))).as("uuid"),
        concat(lit("community:"), col("top_members")).as("name"),
        col("group_id"),
        col("top_members").as("summary"),
        // the reference embeds every community's summary at build time
        // (community_operations.py:125-131 name_embedding; the FAISS
        // community_index over it, vector_search.py:36-189) — codegen'd
        graft.functions.Functions.embedText(col("top_members")).as("summary_embedding"),
        col("n_members"),
      )
    val communityEdges = members.select(
      md5(concat(lit("co|"), col("group_id"), lit("|"), col("community_key"))).as("community_uuid"),
      col("entity_uuid"),
      lit("HAS_MEMBER").as("name"),
      col("group_id"),
    )
    // a group-scoped run replaces ONLY the scoped groups' communities —
    // other groups' rows ride along unchanged (the reference's per-group
    // re-detection leaves sibling groups intact)
    def withSiblings(fresh: DataFrame, table: String): DataFrame =
      if (groupIds.isEmpty || !store.exists(table)) fresh
      else store.load(table).filter(!col("group_id").isin(groupIds: _*)).unionByName(fresh)
    store.commit(withSiblings(communities, "communities"), "communities", s"$algorithm communities")
    store.commit(withSiblings(communityEdges, "community_edges"), "community_edges", "community HAS_MEMBER entity")
  }

  /** Cosine top-k over community summary embeddings —
    * `query_communities_by_embedding` (huggingface_driver.py:696-720:
    * FAISS semantic_search over the community index, threshold + k). The
    * communities table is orders of magnitude smaller than nodes/edges
    * (one row per cluster), so the right plan is a single scan with the
    * codegen'd dot product — no index probe is ever the bottleneck here.
    */
  def byEmbedding(store: SnapshotStore, query: Array[Float], k: Int = 10, minScore: Double = 0.0): DataFrame = {
    val q = typedLit(query.toSeq)
    store
      .load("communities")
      .withColumn("score", graft.search.Vectors.cosine(col("summary_embedding"), q))
      .filter(col("score") >= lit(minScore))
      .orderBy(col("score").desc, col("uuid"))
      .limit(k)
  }

  /** Community-structure statistics (analyze_community_structure,
    * community_detector.py:398-460): total communities, average / largest
    * / smallest size, and graph modularity of the partition. One
    * aggregation over the membership table + [[Louvain.modularity]]
    * (which the reference computes via NetworkX on the same partition).
    * `labels` = (node, label); `edges` = (src, dst).
    */
  def analyzeStructure(labels: DataFrame, edges: DataFrame): DataFrame = {
    val spark = labels.sparkSession
    import spark.implicits._
    val sizes = labels.groupBy(col("label")).agg(count(lit(1)).as("sz"))
    val stats = sizes
      .agg(
        count(lit(1)).as("total_communities"),
        avg(col("sz")).as("average_size"),
        max(col("sz")).as("largest_community_size"),
        min(col("sz")).as("smallest_community_size"),
      )
      .collect()
      .headOption
    val mod = Louvain.modularity(
      Louvain.canonical(edges.select(col("src"), col("dst"))),
      labels.select(col("node"), col("label").as("community")),
    )
    stats match {
      case Some(r) if r.getLong(0) > 0 =>
        Seq((r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3), mod))
          .toDF("total_communities", "average_size", "largest_community_size", "smallest_community_size", "modularity")
      case _ =>
        // reference returns all-zero stats on an empty partition (:413-420)
        Seq((0L, 0.0, 0L, 0L, 0.0))
          .toDF("total_communities", "average_size", "largest_community_size", "smallest_community_size", "modularity")
    }
  }

  /** Incremental placement (update_community, community_operations.py:
    * 252-340): a (new) node joins the plurality community of its
    * neighbors — one join + groupBy + argmax window, no global rerun.
    */
  def placeNode(store: SnapshotStore, nodeUuid: String): Option[String] = {
    val edges = store.load("edges")
    val members = store.load("community_edges")
    val neighbors = edges
      .filter(col("source_uuid") === nodeUuid)
      .select(col("target_uuid").as("n"))
      .unionByName(edges.filter(col("target_uuid") === nodeUuid).select(col("source_uuid").as("n")))
    val votes = neighbors
      .join(members.withColumnRenamed("entity_uuid", "n"), Seq("n"))
      .groupBy(col("community_uuid"))
      .agg(count(lit(1)).as("w"))
      .orderBy(col("w").desc, col("community_uuid"))
      .limit(1)
      .collect()
    votes.headOption.map(_.getString(0))
  }

  /** get_community_info (huggingface_driver.py:2478-2533). With a uuid:
    * that community's row + member uuids/count (the reference's
    * `_get_connected_entities` walk is a HAS_MEMBER join here); without:
    * one row per community with its member count — the rollup the
    * reference builds per-community in a Python loop, as a single
    * groupBy.
    */
  def info(store: SnapshotStore, communityUuid: Option[String] = None, groupIds: Seq[String] = Nil): DataFrame = {
    val base0 = store.load("communities")
    val base = if (groupIds.isEmpty) base0 else base0.filter(col("group_id").isin(groupIds: _*))
    val members = store.load("community_edges")
    communityUuid match {
      case Some(u) =>
        val m = members
          .filter(col("community_uuid") === lit(u))
          .groupBy(col("community_uuid"))
          .agg(
            count(lit(1)).as("member_count"),
            sort_array(collect_list(col("entity_uuid"))).as("members"),
          )
        base.filter(col("uuid") === lit(u)).join(m, base("uuid") === m("community_uuid"), "left").drop("community_uuid")
      case None =>
        val counts = members.groupBy(col("community_uuid")).agg(count(lit(1)).as("member_count"))
        base
          .join(counts, base("uuid") === counts("community_uuid"), "left")
          .drop("community_uuid")
          .withColumn("member_count", coalesce(col("member_count"), lit(0L)))
          .orderBy(col("uuid"))
    }
  }

  /** community_versioning (huggingface_driver.py:2777-2803,
    * community_detector.py): community evolution rides the snapshot
    * store's version chain — `create` commits the current rows as a new
    * version, `list` reads the chain, `restore` republishes an older
    * version (content-addressed; nothing is copied).
    */
  def versioning(store: SnapshotStore, action: String, versionId: Option[Int] = None): DataFrame = {
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    action match {
      case "create" =>
        val v = store.commit(store.load("communities"), "communities", s"community version checkpoint")
        Seq((v, "created")).toDF("version", "status")
      case "list" =>
        store
          .versions("communities")
          .map(v => (v, store.commitInfo("communities", v)))
          .toDF("version", "message")
      case "restore" =>
        val v = versionId.getOrElse(sys.error("restore needs a versionId"))
        store.rollback("communities", v)
        Seq((v, "restored")).toDF("version", "status")
      case other => sys.error(s"unknown versioning action: $other (create|list|restore)")
    }
  }

  // ------------------------------------------------------------------
  // community_caching / get_cached_communities (huggingface_driver.py:
  // 2804-2945): the reference parks the community frames in an in-process
  // dict with a TTL. The Spark analog pins the communities DataFrame in
  // executor memory (persist) under a key; get returns it while fresh and
  // unpersists + misses after the TTL. The clock is a parameter so tests
  // are deterministic.
  // ------------------------------------------------------------------

  private val cache = scala.collection.concurrent.TrieMap.empty[String, (DataFrame, Long)]

  /** Pin the current communities under `key` for `ttlSeconds` starting at
    * `nowMillis`. Returns the row count (forces the persist).
    */
  def cacheCommunities(store: SnapshotStore, key: String, ttlSeconds: Long, nowMillis: Long): Long = {
    val df = store.load("communities").persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = df.count()
    cache.put(key, (df, nowMillis + ttlSeconds * 1000L)).foreach(_._1.unpersist())
    n
  }

  /** Cached communities under `key`, None when absent or expired (expired
    * entries are unpinned on access).
    */
  def cachedCommunities(key: String, nowMillis: Long): Option[DataFrame] =
    cache.get(key) match {
      case Some((df, deadline)) if nowMillis < deadline => Some(df)
      case Some((df, _)) =>
        cache.remove(key)
        df.unpersist()
        None
      case None => None
    }

  /** Unpin everything (cache invalidation surface, :2905-2945). */
  def clearCommunityCache(): Unit = {
    cache.values.foreach(_._1.unpersist())
    cache.clear()
  }
}
