package graft.community

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed Louvain community detection — modularity-maximizing
  * clustering, the reference's preferred algorithm
  * (`community_detector.py:119-183`; it falls back to label propagation
  * only when python-louvain is missing). Classic two-phase formulation,
  * each phase expressed as joins + aggregations so it shuffles on the
  * community key and never materializes the graph on the driver:
  *
  *  - '''local moving''' (parity-alternating sweeps): every node evaluates,
  *    for each neighboring community C, the modularity gain of moving
  *    there — ΔQ ∝ w(i→C) − k_i·Σtot(C∖i)/(2m) — and takes the argmax
  *    (deterministic tie-break: stay put, then smallest community id).
  *    Only nodes in the sweep's hash-parity class move, the rest hold —
  *    simultaneous symmetric moves would otherwise oscillate (the classic
  *    pair-swap livelock of synchronous Louvain); alternating halves is
  *    the standard distributed fix. A sweep is one join-aggregate round:
  *    O(|E|) shuffled, independent of cluster size. Each sweep's labeling
  *    is scored and the best-so-far kept, so the result is monotone.
  *  - '''contraction''': communities collapse into super-nodes; parallel
  *    edges merge (sum of weights) and internal edges become self-loops —
  *    then local moving repeats one level up. Levels stop when the node
  *    count stops shrinking.
  *
  * Weighted throughout (`weight` column; absent = 1.0), undirected
  * semantics (input direction is ignored), deterministic output.
  */
object Louvain {

  /** Canonical undirected weighted edge list: (u, v, w), u ≤ v, parallel
    * edges merged. Self-loops kept (internal weight of contracted nodes).
    */
  private[community] def canonical(edges: DataFrame): DataFrame = {
    val w = if (edges.columns.contains("weight")) col("weight").cast("double") else lit(1.0)
    edges
      .select(
        least(col("src").cast("string"), col("dst").cast("string")).as("u"),
        greatest(col("src").cast("string"), col("dst").cast("string")).as("v"),
        w.as("w"),
      )
      .groupBy(col("u"), col("v"))
      .agg(sum(col("w")).as("w"))
  }

  /** Modularity Q = Σ_C [ e_C/m − (Σtot_C / 2m)² ] of a labeling over a
    * canonical edge list. `labels`: (node, community).
    */
  def modularity(canonicalEdges: DataFrame, labels: DataFrame): Double = {
    val e = canonicalEdges
    val m = e.agg(coalesce(sum(col("w")), lit(0.0))).collect()(0).getDouble(0)
    if (m == 0d) return 0d
    val lbl = labels.select(col("node").cast("string").as("node"), col("community").as("c"))
    val internal = e
      .join(lbl.withColumnRenamed("node", "u").withColumnRenamed("c", "cu"), Seq("u"))
      .join(lbl.withColumnRenamed("node", "v").withColumnRenamed("c", "cv"), Seq("v"))
      .filter(col("cu") === col("cv"))
      .groupBy(col("cu"))
      .agg(sum(col("w")).as("e_c"))
    val sig = degrees(e)
      .join(lbl, Seq("node"))
      .groupBy(col("c"))
      .agg(sum(col("k")).as("sig"))
    sig
      .join(internal.withColumnRenamed("cu", "c"), Seq("c"), "left")
      .select(
        sum(
          coalesce(col("e_c"), lit(0.0)) / lit(m) -
            (col("sig") / lit(2 * m)) * (col("sig") / lit(2 * m)),
        ),
      )
      .collect()(0)
      .getDouble(0)
  }

  /** Weighted degree k_i (self-loops count twice, the standard A_ii = 2w
    * convention so that Σk = 2m).
    */
  private def degrees(canonicalEdges: DataFrame): DataFrame = {
    val nbr = canonicalEdges
      .filter(col("u") =!= col("v"))
    val arcs = nbr
      .select(col("u").as("node"), col("w"))
      .unionByName(nbr.select(col("v").as("node"), col("w")))
      .unionByName(
        canonicalEdges.filter(col("u") === col("v")).select(col("u").as("node"), (col("w") * 2).as("w")),
      )
    arcs.groupBy(col("node")).agg(sum(col("w")).as("k"))
  }

  /** One local-moving sweep; only nodes whose 64-bit hash has `parity`
    * (mod 2) may move — the others keep their label. `labels`:
    * (node, community).
    */
  private def sweep(canonicalEdges: DataFrame, labels: DataFrame, m: Double, parity: Int): DataFrame = {
    val nbr = canonicalEdges.filter(col("u") =!= col("v"))
    val arcs = nbr
      .select(col("u").as("i"), col("v").as("j"), col("w"))
      .unionByName(nbr.select(col("v").as("i"), col("u").as("j"), col("w")))
    val lbl = labels.select(col("node"), col("community"))
    val deg = degrees(canonicalEdges)
    val sig = lbl
      .join(deg, Seq("node"))
      .groupBy(col("community"))
      .agg(sum(col("k")).as("sig"))
    // w(i → C): edge weight from i into each neighboring community
    val wToC = arcs
      .join(lbl.withColumnRenamed("node", "j").withColumnRenamed("community", "cand"), Seq("j"))
      .groupBy(col("i"), col("cand"))
      .agg(sum(col("w")).as("w_ic"))
    // candidate set = neighboring communities ∪ own community (w_ic = 0 if
    // no internal neighbor — a singleton evaluating "stay" correctly)
    val own = lbl.select(col("node").as("i"), col("community").as("own"))
    val cands = wToC
      .unionByName(own.select(col("i"), col("own").as("cand"), lit(0.0).as("w_ic")))
      .groupBy(col("i"), col("cand"))
      .agg(max(col("w_ic")).as("w_ic"))
    val scored = cands
      .join(own, Seq("i"))
      .join(deg.withColumnRenamed("node", "i").withColumnRenamed("k", "k_i"), Seq("i"))
      .join(sig.withColumnRenamed("community", "cand"), Seq("cand"))
      // Σtot of the candidate community EXCLUDING i itself when i ∈ C
      .withColumn("sig_x", col("sig") - when(col("cand") === col("own"), col("k_i")).otherwise(lit(0.0)))
      .withColumn("gain", col("w_ic") - col("k_i") * col("sig_x") / lit(2 * m))
    // stay on ties (no churn), then smallest community id
    val pick = Window
      .partitionBy(col("i"))
      .orderBy(col("gain").desc, (col("cand") === col("own")).desc, col("cand").asc)
    scored
      .withColumn("rn", row_number().over(pick))
      .filter(col("rn") === 1)
      .select(
        col("i").as("node"),
        when(pmod(xxhash64(col("i")), lit(2)) === lit(parity), col("cand"))
          .otherwise(col("own"))
          .as("community"),
      )
  }

  /** Local-moving phase over a CANONICAL (u, v, w) edge list, to tracked
    * best modularity within `maxSweeps` parity-pairs. Returns
    * (labels, modularity).
    */
  private def localMoveC(e: DataFrame, maxSweeps: Int): (DataFrame, Double) = {
    val m = e.agg(coalesce(sum(col("w")), lit(0.0))).collect()(0).getDouble(0)
    val init = degrees(e).select(col("node"), col("node").as("community"))
    if (m == 0d) return (init, 0d)
    var best = init.localCheckpoint()
    var bestQ = modularity(e, best)
    var cur = best
    var i = 0
    var stale = 0
    while (i < maxSweeps * 2 && stale < 2) {
      cur = sweep(e, cur, m, parity = i % 2).localCheckpoint()
      val q = modularity(e, cur)
      if (q > bestQ + 1e-12) { best = cur; bestQ = q; stale = 0 } else stale += 1
      i += 1
    }
    (best, bestQ)
  }

  /** Local-moving phase on a raw (src, dst[, weight]) edge frame. */
  def localMove(edges: DataFrame, maxSweeps: Int = 5): (DataFrame, Double) =
    localMoveC(canonical(edges).localCheckpoint(), maxSweeps)

  /** Full multi-level Louvain: local moving + community contraction until
    * the graph stops shrinking (or `maxLevels`). Returns (node, community)
    * over the ORIGINAL node ids; community ids are the smallest member
    * node id (same canonical-id convention as connected components /
    * compress_uuid_map).
    */
  def cluster(edges: DataFrame, maxLevels: Int = 3, maxSweeps: Int = 5): DataFrame = {
    var level = canonical(edges).localCheckpoint()
    // original node → current super-node (starts as identity)
    var mapping = level
      .select(explode(array(col("u"), col("v"))).as("node"))
      .distinct()
      .select(col("node"), col("node").as("super"))
      .localCheckpoint()
    var nNodes = mapping.count()
    var l = 0
    var shrinking = true
    while (l < maxLevels && shrinking) {
      val (lbl, _) = localMoveC(level, maxSweeps)
      // normalize community ids to the smallest ORIGINAL member id so the
      // output is stable across levels
      val canonLbl = mapping
        .join(lbl.withColumnRenamed("node", "super"), Seq("super"))
        .groupBy(col("community"))
        .agg(min(col("node")).as("cmin"))
      val lblCanon = lbl.join(canonLbl, Seq("community")).select(col("node").as("super"), col("cmin"))
      mapping = mapping
        .join(lblCanon, Seq("super"))
        .select(col("node"), col("cmin").as("super"))
        .localCheckpoint()
      val n2 = mapping.select(col("super")).distinct().count()
      if (n2 >= nNodes) shrinking = false
      else {
        nNodes = n2
        // contract: super-node graph, parallel edges merged, internal
        // edges become self-loops (their weight carries to the next level)
        val sl = lblCanon
        level = level
          .join(sl.withColumnRenamed("super", "u").withColumnRenamed("cmin", "cu"), Seq("u"))
          .join(sl.withColumnRenamed("super", "v").withColumnRenamed("cmin", "cv"), Seq("v"))
          .select(
            least(col("cu"), col("cv")).as("u"),
            greatest(col("cu"), col("cv")).as("v"),
            col("w"),
          )
          .groupBy(col("u"), col("v"))
          .agg(sum(col("w")).as("w"))
          .localCheckpoint()
      }
      l += 1
    }
    mapping.select(col("node"), col("super").as("community"))
  }
}
