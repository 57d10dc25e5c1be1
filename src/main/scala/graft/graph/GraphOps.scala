package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed graph operators over an edge DataFrame (src: long,
  * dst: long) — the Spark-native re-expression of the reference's
  * pure-Python/NetworkX graph algorithms:
  *
  *  - BFS frontier expansion (`graphiti_hf/search/graph_traversal.py:172-286`)
  *  - connected components = `compress_uuid_map` union-find semantics,
  *    canonical id = min id per component (`graphiti_core/utils/bulk_utils.py:433-470`)
  *  - label propagation communities (`graphiti_core/utils/maintenance/community_operations.py:86-131`)
  *
  * All loops are driver-orchestrated supersteps of DataFrame joins with
  * `localCheckpoint` to cut lineage — the GraphFrames pattern without the
  * dependency. At cluster scale the edge table should be pre-partitioned
  * (bucketed) by `src` so every superstep's join reuses one partitioning
  * and only the (small) frontier/labels side shuffles.
  */
object GraphOps {

  /** Undirected view: each edge in both directions, deduped. */
  def undirect(edges: DataFrame): DataFrame =
    edges
      .select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()

  /** Distinct node set of an edge list. */
  def nodes(edges: DataFrame): DataFrame =
    edges.select(col("src").as("node")).unionByName(edges.select(col("dst").as("node"))).distinct()

  /** Level-synchronous BFS: min distance (≤ maxDepth) from the source set.
    * Returns (node, dist). Early-terminates on an empty frontier — the
    * reference's `early_termination_size` loop check
    * (`graph_traversal.py:250-257`).
    */
  def bfs(edges: DataFrame, sources: DataFrame, maxDepth: Int): DataFrame = {
    // bounded DRIVER fast path (same gate/fallback shape as
    // [[connectedComponentsAuto]], and the same in-memory traversal the
    // reference runs — graph_traversal.py holds the whole edge frame):
    // up to -Dgraft.graph.localccmax edges are fetched with ONE bounded
    // job and level-BFS'd locally — a ≤O(log·diameter)-superstep loop of
    // join jobs collapses into one job + one local pass. Larger graphs
    // (or exotic id types) take the distributed superstep path unchanged.
    bfsLocal(edges, sources, maxDepth).getOrElse(bfsDistributed(edges, sources, maxDepth))
  }

  /** Driver BFS when the edge list fits the bounded fetch; None → caller
    * must run the distributed loop. Value-identical: min distance ≤
    * maxDepth from the source set, sources at dist 0 (isolated sources
    * included), null endpoints never traversed (a join on null matches
    * nothing), output node typed as the SOURCES' node column.
    */
  private def bfsLocal(edges: DataFrame, sources: DataFrame, maxDepth: Int): Option[DataFrame] = {
    import org.apache.spark.sql.types._
    val localMax = Integer.getInteger("graft.graph.localccmax", 100000).intValue()
    val srcType = sources.schema("node").dataType
    val integral = Seq(srcType, edges.schema("src").dataType, edges.schema("dst").dataType).forall {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    val stringy = Seq(srcType, edges.schema("src").dataType, edges.schema("dst").dataType).forall(_ == StringType)
    if (!integral && !stringy) return None
    val spark = edges.sparkSession
    import spark.implicits._
    val slim =
      if (integral) edges.select(col("src").cast("long"), col("dst").cast("long"))
      else edges.select(col("src").cast("string"), col("dst").cast("string"))
    val head = slim.limit(localMax + 1).collect()
    if (head.length > localMax) return None
    val srcRows = sources
      .select(if (integral) col("node").cast("long") else col("node").cast("string"))
      .limit(localMax + 1).collect()
    if (srcRows.length > localMax) return None
    // generic local BFS over boxed keys (null-safe: null sources stay at
    // dist 0 like the distributed path's distinct; null edges don't link)
    val adj = new java.util.HashMap[Any, scala.collection.mutable.ArrayBuffer[Any]]()
    head.foreach { r =>
      val a = r.get(0)
      val b = r.get(1)
      if (a != null && b != null)
        adj.computeIfAbsent(a, _ => scala.collection.mutable.ArrayBuffer.empty[Any]) += b
    }
    val dist = new java.util.LinkedHashMap[Any, Int]()
    var frontier = scala.collection.mutable.ArrayBuffer.empty[Any]
    srcRows.foreach { r =>
      val n = r.get(0)
      if (!dist.containsKey(n)) { dist.put(n, 0); frontier += n }
    }
    var depth = 0
    while (depth < maxDepth && frontier.nonEmpty) {
      depth += 1
      val next = scala.collection.mutable.ArrayBuffer.empty[Any]
      frontier.foreach { n =>
        val nbrs = adj.get(n)
        if (nbrs != null) nbrs.foreach { m =>
          if (!dist.containsKey(m)) { dist.put(m, depth); next += m }
        }
      }
      frontier = next
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Any, Int)]
    dist.forEach((n, d) => out += ((n, d)))
    // boxed via Option: a null source row must stay null (a bare
    // asInstanceOf[Long] would silently coerce null to 0)
    val df =
      if (integral) out.toSeq.map { case (n, d) => (Option(n).map(_.asInstanceOf[Long]), d) }.toDF("node", "dist")
      else out.toSeq.map { case (n, d) => (Option(n).map(_.asInstanceOf[String]), d) }.toDF("node", "dist")
    Some(df.select(col("node").cast(srcType).as("node"), col("dist")))
  }

  private def bfsDistributed(edges: DataFrame, sources: DataFrame, maxDepth: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var visited = sources.select(col("node")).distinct().withColumn("dist", lit(0))
    var frontier = visited
    var depth = 0
    var done = false
    while (depth < maxDepth && !done) {
      depth += 1
      // LAZY local checkpoint + count: ONE job materializes the superstep
      // AND answers the emptiness check (the eager checkpoint + isEmpty
      // pair was two scheduler round-trips per superstep). `visited` stays
      // a lazy union of already-checkpointed legs — re-checkpointing the
      // union each superstep was a third full job that only re-flattened
      // checkpointed data (the loop runs ≤ maxDepth ≤ O(diameter) times,
      // so the union plan stays shallow).
      val next = frontier
        .join(e, frontier("node") === e("src"))
        .select(col("dst").as("node"))
        .distinct()
        .join(visited, Seq("node"), "left_anti")
        .withColumn("dist", lit(depth))
        .localCheckpoint(eager = false)
      if (next.count() == 0L) done = true
      else {
        visited = visited.unionByName(next)
        frontier = next
      }
    }
    e.unpersist()
    visited
  }

  /** Multi-origin BFS in ONE distributed job: `sources` is (origin, node)
    * and the visited set is keyed (origin, node), so every origin's
    * traversal advances in the same superstep joins — the batch analog of
    * the reference's per-start-node `traverse_graph` loop
    * (`batch_traversal`, huggingface_driver.py:1028-1077). Returns
    * (origin, node, dist). Shared frontier nodes are expanded once per
    * superstep against the edge relation regardless of how many origins
    * reached them (the join is on node).
    */
  def bfsMulti(edges: DataFrame, sources: DataFrame, maxDepth: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var visited = sources.select(col("origin"), col("node")).distinct().withColumn("dist", lit(0))
    var frontier = visited
    var depth = 0
    var done = false
    while (depth < maxDepth && !done) {
      depth += 1
      // same lazy-checkpoint + count fusion as [[bfs]] — one job per
      // superstep instead of three
      val next = frontier
        .join(e, frontier("node") === e("src"))
        .select(col("origin"), col("dst").as("node"))
        .distinct()
        .join(visited, Seq("origin", "node"), "left_anti")
        .withColumn("dist", lit(depth))
        .localCheckpoint(eager = false)
      if (next.count() == 0L) done = true
      else {
        visited = visited.unionByName(next)
        frontier = next
      }
    }
    e.unpersist()
    visited
  }

  /** Level-synchronous BFS whose neighbor expansion PROBES an adjacency
    * index instead of joining the full edge relation: `probe(frontier)`
    * receives the frontier's node column (named `src`) and must return
    * (src, dst) pairs covering at least those nodes — `loadForKeys` over a
    * src-bucketed `graph_adj` snapshot reads only the hash buckets the
    * frontier falls in, so each superstep costs ∝ frontier, not ∝ corpus
    * (the prebuilt-adjacency semantics of
    * `performance_optimizer.py:340-422`). Probe results may over-cover
    * (whole buckets); the join below trims to the exact frontier.
    */
  def bfsIndexed(probe: DataFrame => DataFrame, sources: DataFrame, maxDepth: Int): DataFrame = {
    var visited = sources.select(col("node")).distinct().withColumn("dist", lit(0))
    var frontier = visited
    var depth = 0
    var done = false
    while (depth < maxDepth && !done) {
      depth += 1
      val nbrs = probe(frontier.select(col("node").as("src")))
      // same lazy-checkpoint + count fusion as [[bfs]]
      val next = frontier
        .join(nbrs, frontier("node") === nbrs("src"))
        .select(col("dst").as("node"))
        .distinct()
        .join(visited, Seq("node"), "left_anti")
        .withColumn("dist", lit(depth))
        .localCheckpoint(eager = false)
      if (next.count() == 0L) done = true
      else {
        visited = visited.unionByName(next)
        frontier = next
      }
    }
    visited
  }

  /** Connected components: hash-min propagation + POINTER DOUBLING.
    * Returns (node, component) with component = min node id in the
    * component — exactly `compress_uuid_map`'s canonical-min semantics
    * (works for numeric ids and for string uuids: `min` is lexicographic,
    * matching the reference's `min(uuid)` canonical pick,
    * bulk_utils.py:455-470).
    *
    * Each superstep does (1) neighbor-min (each node takes the min of its
    * own and its neighbors' labels) and (2) label ← label(label), which
    * squares the reach per superstep — O(log diameter) supersteps instead
    * of O(diameter), so a 100×-longer alias chain costs ~7 more rounds,
    * not 100× more (the large-star/small-star result, Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14). The
    * previous label rides along inside the same aggregation, so the
    * convergence check is a filter on the checkpointed superstep output —
    * no extra join per superstep. Deterministic regardless of
    * partitioning (min is commutative and associative).
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 50): DataFrame =
    connectedComponentsAuto(edges, maxIter)

  /** [[connectedComponentsIter]] with a bounded DRIVER fast path for small
    * edge lists. Duplicate-pair graphs are ∝ near-duplicate surfaces, not
    * corpus — a steady micro-batch or a lightly-duplicated bulk corpus
    * yields a few thousand pairs, and the superstep loop then spends
    * ~6-10 job-latency quanta labeling a set that fits in one driver
    * array. Up to `-Dgraft.graph.localccmax` edges (default 100,000 —
    * ~10 MB of uuid strings, the same bounded-collect class as the ivfTopK
    * centroid table) are fetched with ONE bounded job (`limit(max+1)` —
    * never a full count of a big set) and union-found locally with min-id
    * roots + path compression; anything larger takes the distributed
    * pointer-doubling path unchanged. Value-identical to
    * [[connectedComponentsIter]] (GraphOpsSpec parity over both paths):
    * min is lexicographic for string ids and numeric for integral ids —
    * the exact `compress_uuid_map` canonical-min contract — and integral
    * node columns keep their input type (outputs are cast back), so the
    * fast path is schema-invisible to callers.
    */
  def connectedComponentsAuto(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val localMax = Integer.getInteger("graft.graph.localccmax", 100000).intValue()
    val spark = edges.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.types._
    val cols = edges.columns
    val dts = Seq(edges.schema(cols(0)).dataType, edges.schema(cols(1)).dataType)
    val integral = dts.forall {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    // fast path only for integral and string ids (the two shapes the engine
    // produces); anything exotic keeps the type-preserving superstep path
    if (!integral && !dts.forall(_ == StringType))
      return connectedComponentsIter(edges, maxIter)._1
    // widest integral type of the two sides (what undirect's union would
    // coerce to) — the fast path's outputs are cast back to it
    val outType: DataType =
      if (integral) dts.maxBy {
        case LongType => 4; case IntegerType => 3; case ShortType => 2; case _ => 1
      }
      else StringType
    val slim =
      if (integral) edges.select(col(cols(0)).cast("long").as("src"), col(cols(1)).cast("long").as("dst"))
      else edges.select(col(cols(0)).cast("string").as("src"), col(cols(1)).cast("string").as("dst"))
    val head = slim.limit(localMax + 1).collect()
    if (head.length > localMax) connectedComponentsIter(edges, maxIter)._1
    else if (integral) {
      // union by MIN root over primitive longs (no boxing in find/union's
      // hot loop beyond the HashMap boxing — bounded by localMax)
      val parent = new java.util.HashMap[Long, Long]()
      def find(x0: Long): Long = {
        var x = x0
        var p = parent.getOrDefault(x, x)
        while (p != x) {
          val gp = parent.getOrDefault(p, p)
          parent.put(x, gp)
          x = p
          p = gp
        }
        x
      }
      def union(a: Long, b: Long): Unit = {
        val ra = find(a)
        val rb = find(b)
        if (ra != rb) { if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb) }
      }
      head.foreach { r =>
        if (!r.isNullAt(0) && !r.isNullAt(1)) union(r.getLong(0), r.getLong(1))
      }
      val seen = new java.util.HashSet[Long]()
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      head.foreach { r =>
        var i = 0
        while (i < 2) {
          if (!r.isNullAt(i)) {
            val n = r.getLong(i)
            if (seen.add(n)) out += ((n, find(n)))
          }
          i += 1
        }
      }
      out.toSeq.toDF("node", "component")
        .select(col("node").cast(outType).as("node"), col("component").cast(outType).as("component"))
    } else {
      // union by MIN root: the smaller id always stays the root, so after
      // all unions find(x) IS the component's min member — the same
      // canonical the distributed hash-min converges to
      val parent = new java.util.HashMap[String, String]()
      def find(x0: String): String = {
        var x = x0
        var p = parent.getOrDefault(x, x)
        while (p != x) {
          val gp = parent.getOrDefault(p, p)
          parent.put(x, gp)
          x = p
          p = gp
        }
        x
      }
      def union(a: String, b: String): Unit = {
        val ra = find(a)
        val rb = find(b)
        if (ra != rb) { if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb) }
      }
      head.foreach { r =>
        val a = r.getString(0)
        val b = r.getString(1)
        if (a != null && b != null) union(a, b)
      }
      val seen = new java.util.HashSet[String]()
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      head.foreach { r =>
        var i = 0
        while (i < 2) {
          val n = r.getString(i)
          if (n != null && seen.add(n)) out += ((n, find(n)))
          i += 1
        }
      }
      out.toSeq.toDF("node", "component")
    }
  }

  /** [[connectedComponents]] + the number of supersteps it took (frozen by
    * GraphOpsSpec: a 1000-node path converges in ≤ O(log n) supersteps).
    */
  def connectedComponentsIter(edges: DataFrame, maxIter: Int = 50): (DataFrame, Int) = {
    val e = undirect(edges).persist(StorageLevel.MEMORY_AND_DISK)
    // e is undirected (every edge present in both directions), so its src
    // column alone already covers every node — the generic nodes(e) union
    // of src ∪ dst would distinct twice the rows for the same set
    var labels = e.select(col("src").as("node")).distinct()
      .withColumn("label", col("node")).localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      iter += 1
      // (1) neighbor-min; the node's own previous label rides along as
      // `old` inside the same groupBy (exactly one own=true row per node)
      val own = labels.select(col("node"), col("label"), lit(true).as("own"))
      val propagated = e
        .join(labels, e("src") === labels("node"))
        .select(col("dst").as("node"), col("label"), lit(false).as("own"))
      val l1 = own
        .unionByName(propagated)
        .groupBy(col("node"))
        .agg(min(col("label")).as("label"), max(when(col("own"), col("label"))).as("old"))
      // (2) pointer doubling: label ← label(label); labels only hold ids
      // of same-component members, and label(x) ≤ x, so this is safe and
      // monotone
      val parents = l1.toDF("pn", "pl", "pold").select(col("pn"), col("pl"))
      // lazy checkpoint + count: the convergence filter's count is the
      // FIRST action on `next`, so one job materializes the superstep and
      // decides the fixpoint (the eager checkpoint + isEmpty pair was two
      // scheduler round-trips per superstep)
      val next = l1
        .join(parents, l1("label") === parents("pn"), "left")
        .select(col("node"), coalesce(col("pl"), col("label")).as("label"), col("old"))
        .localCheckpoint(eager = false)
      // converged iff no label moved (true fixpoint: at neighbor-min
      // stability every label already points at its component min)
      converged = next.filter(col("label") =!= col("old")).count() == 0L
      labels = next.drop("old")
    }
    e.unpersist()
    (labels.withColumnRenamed("label", "component"), iter)
  }

  /** True depth-first traversal from each start node — lexicographic
    * preorder (neighbors explored smallest-uuid first), depth-bounded,
    * cycle-safe. The reference's DFS is an in-memory stack loop over the
    * whole pandas edge frame (`graph_traversal.py:288-394`); here the
    * adjacency is broadcast ONCE and every start node traverses in
    * parallel — the distribution axis that matters for batch traversals.
    * Like the reference (which gates centrality to ≤1000 nodes,
    * performance_optimizer.py:384-389), intended for subgraphs that fit a
    * broadcast; extract the subgraph first for larger graphs. The gate is
    * ENFORCED (`maxNodes`): a larger graph fails fast with a clear message
    * instead of silently attempting an unbounded driver collect. The
    * default gate is 1,000 nodes — ALIGNED with the reference's centrality
    * gate (performance_optimizer.py:384-389) and with
    * [[betweennessCentrality]]; callers with more driver headroom opt up
    * explicitly (the broadcast is ~16 B/edge, so 100k nodes ≈ tens of MB —
    * survivable, but not a default a 1000-executor job should stumble into).
    * Returns (start, node, visit_order, depth).
    */
  def dfs(edges: DataFrame, sources: Seq[Long], maxDepth: Int, maxNodes: Int = 1000): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    requireSmallGraph(edges, maxNodes, "GraphOps.dfs")
    val adj: Map[Long, Array[Long]] = edges
      .select(col("src").cast("long"), col("dst").cast("long"))
      .as[(Long, Long)]
      .collect()
      .groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).distinct.sorted }
    val b = spark.sparkContext.broadcast(adj)
    sources
      .toDF("start")
      .as[Long]
      .flatMap { start =>
        val a = b.value
        val seen = scala.collection.mutable.LinkedHashMap.empty[Long, (Int, Int)]
        val stack = scala.collection.mutable.Stack[(Long, Int)]((start, 0))
        var order = 0
        while (stack.nonEmpty) {
          val (n, d) = stack.pop()
          if (!seen.contains(n)) {
            seen(n) = (order, d)
            order += 1
            if (d < maxDepth)
              a.getOrElse(n, Array.empty[Long]).reverseIterator.foreach { m =>
                if (!seen.contains(m)) stack.push((m, d + 1))
              }
          }
        }
        seen.toSeq.map { case (n, (o, d)) => (start, n, o, d) }
      }
      .toDF("start", "node", "visit_order", "depth")
  }

  /** All simple paths (as node arrays) from the source set to any target
    * node within maxDepth — `find_paths` (`graph_traversal.py:396-429`):
    * BFS with a path-array column, filtered by last element ∈ targets.
    * Cycle-free by construction (a node never re-enters its own path).
    */
  def findPaths(edges: DataFrame, sources: Seq[Long], targets: Set[Long], maxDepth: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // bounded DRIVER fast path (same gate/fallback shape as [[bfs]] /
    // [[connectedComponentsAuto]]; the reference's find_paths is an
    // in-memory stack loop over the whole edge frame,
    // graph_traversal.py:396-429): one bounded fetch + a local simple-path
    // enumeration replaces maxDepth superstep join jobs. Larger graphs
    // take the distributed loop below unchanged.
    val localMax = Integer.getInteger("graft.graph.localccmax", 100000).intValue()
    val headRows = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .limit(localMax + 1).collect()
    if (headRows.length <= localMax) {
      val adj = new java.util.HashMap[Long, scala.collection.mutable.ArrayBuffer[Long]]()
      headRows.foreach { r =>
        if (!r.isNullAt(0) && !r.isNullAt(1))
          adj.computeIfAbsent(r.getLong(0), _ => scala.collection.mutable.ArrayBuffer.empty[Long]) += r.getLong(1)
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
      // level-synchronous expansion, exactly the superstep semantics:
      // every simple path from a source, collected whenever its head is a
      // target (the trivial [source] path included)
      var frontier = sources.map(s => Vector(s))
      frontier.foreach(p => if (targets(p.last)) out += p)
      var depth = 0
      while (depth < maxDepth && frontier.nonEmpty) {
        depth += 1
        val next = scala.collection.mutable.ArrayBuffer.empty[Vector[Long]]
        frontier.foreach { p =>
          val nbrs = adj.get(p.last)
          if (nbrs != null) nbrs.foreach { m =>
            if (!p.contains(m)) {
              val q = p :+ m
              next += q
              if (targets(m)) out += q
            }
          }
        }
        frontier = next.toSeq
      }
      return out.toSeq.toDF("path")
    }
    val e = edges.select(col("src"), col("dst")).persist(StorageLevel.MEMORY_AND_DISK)
    var frontier = sources.toDF("head").withColumn("path", array(col("head")))
    var results = frontier.filter(col("head").isin(targets.toSeq: _*))
    var depth = 0
    var done = false
    while (depth < maxDepth && !done) {
      depth += 1
      // lazy checkpoint + count fusion (see [[bfs]]): one job per
      // superstep; an empty expansion terminates without contributing
      val next = frontier
        .join(e, frontier("head") === e("src"))
        .filter(!array_contains(col("path"), col("dst")))
        .select(col("dst").as("head"), concat(col("path"), array(col("dst"))).as("path"))
        .localCheckpoint(eager = false)
      if (next.count() == 0L) done = true
      else {
        frontier = next
        results = results.unionByName(next.filter(col("head").isin(targets.toSeq: _*)))
      }
    }
    e.unpersist()
    results.select(col("path"))
  }

  /** Enforce the reference's small-graph gate (performance_optimizer.py:
    * 384-389) on ops that driver-collect the adjacency: one distinct-node
    * count, then a clear failure instead of an unbounded collect.
    */
  private def requireSmallGraph(edges: DataFrame, maxNodes: Int, op: String): Unit = {
    val n = edges
      .select(col("src").as("node"))
      .unionByName(edges.select(col("dst").as("node")))
      .distinct()
      .count()
    require(
      n <= maxNodes,
      s"$op is gated to graphs with <= $maxNodes nodes (got $n) — extract a subgraph first " +
        "or raise maxNodes explicitly (reference gate: performance_optimizer.py:384-389)",
    )
  }

  /** Per-node degree (parallel edges counted — the reference's
    * edge-count-weighted degree projection, `community_operations.py:46-71`).
    */
  def degrees(edges: DataFrame): DataFrame =
    edges
      .select(col("src").as("node"))
      .unionByName(edges.select(col("dst").as("node")))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("degree"))

  /** Min-distance from EVERY node to every reachable node (all-sources
    * level-synchronous BFS): returns (start, node, dist). The frontier is
    * keyed by (start, node), so each superstep is one join + anti-join —
    * all sources expand in parallel, sharing the persisted edge relation.
    * Intended for the bounded subgraphs the reference gates centrality to
    * (≤1000 nodes, `performance_optimizer.py:384-389`); cost is
    * O(Σ reachable pairs), which is what any exact APSP pays.
    */
  def allPairsDistances(edges: DataFrame, maxDepth: Int = 100): DataFrame = {
    val e = undirect(edges).persist(StorageLevel.MEMORY_AND_DISK)
    var visited = nodes(e)
      .select(col("node").as("start"), col("node"), lit(0).as("dist"))
      .localCheckpoint()
    var frontier = visited
    var depth = 0
    var done = false
    while (depth < maxDepth && !done) {
      depth += 1
      // same lazy-checkpoint + count fusion as [[bfs]]
      val next = frontier
        .join(e, frontier("node") === e("src"))
        .select(col("start"), col("dst").as("node"))
        .distinct()
        .join(visited, Seq("start", "node"), "left_anti")
        .withColumn("dist", lit(depth))
        .localCheckpoint(eager = false)
      if (next.count() == 0L) done = true
      else {
        visited = visited.unionByName(next)
        frontier = next
      }
    }
    e.unpersist()
    visited
  }

  /** Closeness centrality with the Wasserman–Faust reachability correction
    * (exactly networkx `closeness_centrality(wf_improved=True)`, the form
    * the reference computes for ≤1000-node graphs,
    * `performance_optimizer.py:384-389`):
    *
    *   C(u) = ((r-1)/(n-1)) · ((r-1)/Σ_v d(u,v))
    *
    * with r = nodes reachable from u (incl. u), n = all nodes. Built on
    * [[allPairsDistances]]; the per-start aggregation is one groupBy.
    */
  def closenessCentrality(edges: DataFrame, maxDepth: Int = 100): DataFrame = {
    // Small-graph fast path — the same ≤1000-node centrality gate the
    // reference computes networkx centralities under
    // (performance_optimizer.py:384-389) and that [[betweennessCentrality]]
    // and [[dfs]] already use: broadcast the adjacency once and run every
    // source's bounded BFS as an executor-parallel task. Replaces
    // O(diameter) superstep jobs (each a join+distinct+anti-join shuffle
    // round) with ONE bounded collect + ONE map job. The per-source
    // (r, Σd) facts are exact integers on both paths and the closeness
    // arithmetic below is the SAME Column expression, so results are
    // bit-identical (CentralitySpec + CommunityDifferentialSpec cover
    // long- and string-node graphs against networkx). Graphs above the
    // gate take the distributed all-pairs superstep path unchanged.
    val spark = edges.sparkSession
    val u = undirect(edges)
    val maxPairs = 1_000_000 // ≥ any ≤1000-node undirected pair set
    val head = u.limit(maxPairs + 1).collect()
    val idxOf = new java.util.LinkedHashMap[Any, Integer]()
    head.foreach { r =>
      var i = 0
      while (i < 2) {
        val v = r.get(i)
        if (v != null && !idxOf.containsKey(v)) idxOf.put(v, idxOf.size())
        i += 1
      }
    }
    val nNodes = idxOf.size()
    val (rsums, n): (DataFrame, Long) =
      if (head.length > maxPairs || nNodes > 1000) {
        // distributed fallback (unchanged algebra)
        val d = allPairsDistances(edges, maxDepth)
        val nn = d.select(col("start")).distinct().count()
        (d.groupBy(col("start").as("node")).agg(count(lit(1)).as("r"), sum(col("dist")).as("sumd")), nn)
      } else {
        import spark.implicits._
        val adjB = Array.fill(nNodes)(new scala.collection.mutable.ArrayBuffer[Int]())
        head.foreach { r =>
          val a = idxOf.get(r.get(0)); val b = idxOf.get(r.get(1))
          if (a != null && b != null) adjB(a) += b.intValue()
        }
        val adj: Array[Array[Int]] = adjB.map(_.toArray)
        val bc = spark.sparkContext.broadcast(adj)
        val md = maxDepth
        val perSource = spark
          .range(nNodes.toLong)
          .repartition(spark.sparkContext.defaultParallelism)
          .as[Long]
          .map { si =>
            val a = bc.value
            val s = si.toInt
            val dist = new Array[Int](a.length)
            java.util.Arrays.fill(dist, -1)
            dist(s) = 0
            val q = new Array[Int](a.length)
            var qh = 0
            var qt = 0
            q(qt) = s; qt += 1
            var r = 1L
            var sumd = 0L
            while (qh < qt) {
              val v = q(qh); qh += 1
              val dv = dist(v)
              if (dv < md) {
                val nb = a(v)
                var j = 0
                while (j < nb.length) {
                  val w = nb(j)
                  if (dist(w) < 0) { dist(w) = dv + 1; r += 1; sumd += dv + 1; q(qt) = w; qt += 1 }
                  j += 1
                }
              }
            }
            (si, r, sumd)
          }
          .toDF("idx", "r", "sumd")
        // map indices back to node values at their ORIGINAL column type
        val nodeType = u.schema("src").dataType
        val rows = new java.util.ArrayList[org.apache.spark.sql.Row](nNodes)
        val it = idxOf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          rows.add(org.apache.spark.sql.Row(e.getKey, e.getValue.longValue()))
        }
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("node", nodeType),
          org.apache.spark.sql.types.StructField("idx", org.apache.spark.sql.types.LongType),
        ))
        val nodeIdx = spark.createDataFrame(rows, schema)
        (perSource.join(broadcast(nodeIdx), Seq("idx")).select(col("node"), col("r"), col("sumd")), nNodes.toLong)
      }
    rsums
      .withColumn(
        "closeness",
        when(col("r") > 1 && lit(n) > 1,
          (col("r") - 1) * (col("r") - 1) / ((lit(n) - lit(1)) * col("sumd")))
          .otherwise(lit(0.0)),
      )
      .select(col("node"), col("closeness"))
  }

  /** Betweenness centrality — Brandes' algorithm, one exact single-source
    * pass per node, sources traversed IN PARALLEL over a broadcast
    * adjacency (same distribution axis as [[dfs]]; the reference computes
    * this with networkx on ≤1000-node graphs,
    * `performance_optimizer.py:384-389` — here each executor thread runs
    * independent sources, so 32 cores do 32 sources at once).
    * Undirected, unweighted, normalized by 2/((n-1)(n-2)) like
    * `nx.betweenness_centrality(normalized=True)`. Returns
    * (node, betweenness). The reference's ≤1000-node centrality gate is
    * ENFORCED (`maxNodes`, like Hierarchical.wardCommunities): Brandes is
    * O(V·E) and the adjacency is driver-collected — a larger graph fails
    * fast with a clear message instead of attempting it.
    */
  def betweennessCentrality(edges: DataFrame, maxNodes: Int = 1000): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // gate enforced from ONE bounded collect (≤ maxNodes·(maxNodes−1)+1
    // undirected pairs) — the separate distinct-node count job the gate
    // used to run first re-derived the same information
    val maxPairs = maxNodes.toLong * (maxNodes - 1) + 1
    val pairs = undirect(edges)
      .select(col("src").cast("long"), col("dst").cast("long"))
      .as[(Long, Long)]
      .limit((maxPairs min Int.MaxValue.toLong).toInt)
      .collect()
    val nDistinct = (pairs.iterator.map(_._1) ++ pairs.iterator.map(_._2)).toSet.size
    require(
      pairs.length < maxPairs && nDistinct <= maxNodes,
      s"GraphOps.betweennessCentrality is gated to graphs with <= $maxNodes nodes (got " +
        s"${if (pairs.length >= maxPairs) s">$maxNodes" else nDistinct.toString}) — extract a subgraph first " +
        "or raise maxNodes explicitly (reference gate: performance_optimizer.py:384-389)",
    )
    val adj: Map[Long, Array[Long]] =
      pairs.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).distinct.sorted }
    val allNodes = (pairs.map(_._1) ++ pairs.map(_._2)).distinct.sorted
    val n = allNodes.length
    val b = spark.sparkContext.broadcast(adj)
    val perSource = allNodes.toSeq
      .toDF("s")
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long]
      .flatMap { s =>
        // Brandes (2001): BFS orders + path counts, then dependency
        // accumulation in reverse BFS order
        val a = b.value
        val dist = scala.collection.mutable.Map(s -> 0)
        val sigma = scala.collection.mutable.Map(s -> 1.0)
        val preds = scala.collection.mutable.Map.empty[Long, List[Long]]
        val order = scala.collection.mutable.ArrayBuffer.empty[Long]
        val q = scala.collection.mutable.Queue(s)
        while (q.nonEmpty) {
          val v = q.dequeue()
          order += v
          for (w <- a.getOrElse(v, Array.empty[Long])) {
            if (!dist.contains(w)) {
              dist(w) = dist(v) + 1
              q.enqueue(w)
            }
            if (dist(w) == dist(v) + 1) {
              sigma(w) = sigma.getOrElse(w, 0.0) + sigma(v)
              preds(w) = v :: preds.getOrElse(w, Nil)
            }
          }
        }
        val delta = scala.collection.mutable.Map.empty[Long, Double].withDefaultValue(0.0)
        order.reverseIterator.foreach { w =>
          preds.getOrElse(w, Nil).foreach { v =>
            delta(v) += sigma(v) / sigma(w) * (1.0 + delta(w))
          }
        }
        order.iterator.filter(_ != s).map(w => (w, delta(w))).toSeq
      }
      .toDF("node", "d")
    // undirected raw sums count each unordered pair from both endpoints;
    // nx's normalized scale 1/((n-1)(n-2)) absorbs that double count
    // (max possible = 2 · (n-1)(n-2)/2), so no separate halving
    val norm = if (n > 2) 1.0 / ((n - 1).toDouble * (n - 2).toDouble) else 0.0
    perSource
      .groupBy(col("node"))
      .agg((sum(col("d")) * lit(norm)).as("betweenness"))
  }

  /** One label-propagation superstep: each node adopts the label with the
    * highest neighbor weight; ties break to the LARGER label (reference
    * tie rule, `community_operations.py:113-117`). weights = parallel-edge
    * counts.
    */
  def labelPropagationStep(undirected: DataFrame, labels: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val votes = undirected
      .join(labels, undirected("src") === labels("node"))
      .groupBy(col("dst").as("n"), col("label"))
      .agg(count(lit(1)).as("w"))
    val w = Window.partitionBy(col("n")).orderBy(col("w").desc, col("label").desc)
    votes
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("n").as("node"), col("label"))
  }

  /** Label propagation to fixpoint (or maxIter), checkpointed supersteps. */
  def labelPropagation(edges: DataFrame, maxIter: Int = 10): DataFrame = {
    val e = edges
      .select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = nodes(e).withColumn("label", col("node")).localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      iter += 1
      // lazy checkpoint: the convergence count is the first action on
      // `next`, so it materializes the superstep in the same job
      val next = labelPropagationStep(e, labels).localCheckpoint(eager = false)
      val changed = next
        .join(labels.withColumnRenamed("label", "old"), Seq("node"))
        .filter(col("label") =!= col("old"))
        .count()
      labels = next
      converged = changed == 0
    }
    e.unpersist()
    labels
  }
}
