package graft.community

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ward hierarchical agglomerative clustering over node embeddings — the
  * reference's `_hierarchical_clustering` (community_detector.py:317-396:
  * sklearn AgglomerativeClustering(linkage="ward") on the embedding
  * matrix, gated to small graphs like its other centrality/cluster
  * routines). Ward's criterion via the Lance–Williams update over squared
  * Euclidean distances:
  *
  *   d(k, i∪j) = ((nᵢ+nₖ)d(k,i) + (nⱼ+nₖ)d(k,j) − nₖ·d(i,j)) / (nᵢ+nⱼ+nₖ)
  *
  * Deterministic: ties merge the lexicographically-smallest pair of
  * cluster representatives; output community id = min member uuid.
  * Driver-side O(n²) like the reference's sklearn call — intended for
  * bounded node sets (extract a subgraph / group first); the distributed
  * alternatives for open-ended n are Louvain / label propagation / CC in
  * this package.
  */
object Hierarchical {

  /** Cluster `nodes` (idCol, vecCol: Array/Seq[Double or Float]) into `k`
    * clusters. Returns (id, community) with community = min member id.
    */
  def wardCommunities(nodes: DataFrame, idCol: String, vecCol: String, k: Int, maxNodes: Int = 1000): DataFrame = {
    val spark = nodes.sparkSession
    import spark.implicits._
    // gate BEFORE collecting: the limit(maxNodes+1) probe bounds the
    // driver's exposure — an oversized corpus fails fast instead of
    // OOMing the driver on a full collect of embeddings
    val probe = nodes.select(col(idCol)).limit(maxNodes + 1).count()
    require(probe <= maxNodes, s"ward clustering gated to ≤$maxNodes nodes (got ≥$probe); extract a subgraph first")
    val rows: Array[(String, Array[Double])] = nodes
      .select(col(idCol).cast("string"), col(vecCol).cast("array<double>"))
      .as[(String, Seq[Double])]
      .collect()
      .map { case (id, v) => id -> v.toArray }
      .sortBy(_._1)
    val n = rows.length
    if (n == 0) return spark.emptyDataFrame.select(lit("").as("id"), lit("").as("community")).limit(0)

    def sqdist(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }

    // active clusters: representative index → (size, members); distances
    // in a mutable map keyed by (min idx, max idx)
    val members = scala.collection.mutable.Map((0 until n).map(i => i -> List(i)): _*)
    val sizes = scala.collection.mutable.Map((0 until n).map(i => i -> 1.0): _*)
    val dist = scala.collection.mutable.Map.empty[(Int, Int), Double]
    for (i <- 0 until n; j <- i + 1 until n) dist((i, j)) = sqdist(rows(i)._2, rows(j)._2)
    def dOf(a: Int, b: Int): Double = if (a < b) dist((a, b)) else dist((b, a))

    var clusters = (0 until n).toVector
    while (clusters.length > k) {
      // closest pair; ties → smallest (i, j) pair of representative ids
      var best = (Double.MaxValue, -1, -1)
      for (ii <- clusters.indices; jj <- ii + 1 until clusters.length) {
        val (a, b) = (clusters(ii), clusters(jj))
        val d = dOf(a, b)
        if (d < best._1 - 1e-15) best = (d, a, b)
      }
      val (_, i, j) = best
      // Lance–Williams Ward update against every other active cluster
      val (ni, nj) = (sizes(i), sizes(j))
      clusters.filter(c => c != i && c != j).foreach { c =>
        val nk = sizes(c)
        val merged = ((ni + nk) * dOf(c, i) + (nj + nk) * dOf(c, j) - nk * dOf(i, j)) / (ni + nj + nk)
        if (i < c) dist((i, c)) = merged else dist((c, i)) = merged
      }
      members(i) = members(i) ++ members(j)
      sizes(i) = ni + nj
      members.remove(j); sizes.remove(j)
      clusters = clusters.filter(_ != j)
    }

    clusters
      .flatMap { rep =>
        val ids = members(rep).map(m => rows(m)._1)
        val community = ids.min
        ids.map(id => (id, community))
      }
      .toDF("id", "community")
  }
}
