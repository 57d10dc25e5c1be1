package graft.community

import graft.graph.GraphOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-clique percolation communities for k=3 — the re-expression of the
  * reference's `clique_percolation` (`community_detector.py:269-297`,
  * which calls NetworkX `k_clique_communities(G, k=3)`): a community is
  * the union of the nodes of a maximal set of triangles chained by shared
  * edges. Communities OVERLAP by construction (two triangles sharing only
  * a node belong to different communities that both contain it), and
  * nodes on no triangle belong to no community — both exactly the
  * NetworkX semantics.
  *
  * Distributed shape (the part NetworkX does in one process):
  *
  *  1. triangles are enumerated with DEGREE-ORDERED wedges (each edge is
  *     oriented from its (degree, id)-smaller endpoint, wedges are pairs
  *     of out-neighbors, closed by an oriented-edge join). Out-degrees
  *     under this orientation are O(√m) even on power-law graphs, so the
  *     wedge join never explodes on hub nodes — the standard MapReduce
  *     triangle-count bound (Suri & Vassilvitskii, WWW'11), where the
  *     naive neighbor-pair join is quadratic in the hub degree;
  *  2. the triangle-adjacency graph never materializes all
  *     triangle-pairs per edge (quadratic in triangles-per-edge): each
  *     shared edge contributes a STAR from its lexicographically first
  *     triangle to the others, which has the same connected components;
  *  3. components come from [[GraphOps.connectedComponents]] (hash-min +
  *     pointer doubling, O(log diameter) supersteps).
  */
object CliquePercolation {

  /** All triangles of the undirected simple graph, one row per triangle,
    * canonically ordered columns (a < b < c, string-typed). Degree-ordered
    * wedge enumeration — see the class doc for the scale bound.
    */
  def triangles(edges: DataFrame): DataFrame = {
    // canonical undirected simple edges, both endpoints as strings
    val und = GraphOps
      .undirect(edges)
      .select(col("src").cast("string").as("u"), col("dst").cast("string").as("v"))
      .filter(col("u") < col("v"))
      .distinct()

    // degree-ordered orientation: u→v iff (deg(u), u) ≺ (deg(v), v)
    val deg = und
      .select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy("n")
      .agg(count(lit(1)).as("d"))
    val oriented = und
      .join(deg.select(col("n").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("n").as("v"), col("d").as("dv")), Seq("v"))
      .select(
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("lo"),
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")), col("v"))
          .otherwise(col("u")).as("hi"),
      )

    // wedges (w → x, w → y) over pairs of out-neighbors of w, closed by
    // the oriented edge x → y. Each unordered pair appears in both orders
    // and exactly one matches the closing edge's orientation, so every
    // triangle is found exactly once (only its orientation-minimal node
    // has both out-edges). Sorting (w, x, y) gives the canonical id.
    val outA = oriented.select(col("lo").as("w"), col("hi").as("x"))
    val outB = oriented.select(col("lo").as("w"), col("hi").as("y"))
    outA
      .join(outB, Seq("w"))
      .filter(col("x") =!= col("y"))
      .join(oriented.select(col("lo").as("x"), col("hi").as("y")), Seq("x", "y"), "left_semi")
      .select(array_sort(array(col("w"), col("x"), col("y"))).as("abc"))
      .select(col("abc")(0).as("a"), col("abc")(1).as("b"), col("abc")(2).as("c"))
  }

  /** (community_key, node) membership pairs; `community_key` is the
    * lexicographically smallest triangle id ("a|b|c") of the community.
    * `edges` needs (src, dst) columns; ids must not contain '|'.
    */
  def communities(edges: DataFrame, minClusterSize: Int = 2): DataFrame = {
    val withId = triangles(edges).withColumn("tri", concat_ws("|", col("a"), col("b"), col("c")))

    // shared-edge stars: per undirected edge, the min triangle links to
    // the rest (same components as the full pairwise adjacency)
    val triEdges = withId.select(
      explode(array(
        concat_ws("|", col("a"), col("b")),
        concat_ws("|", col("a"), col("c")),
        concat_ws("|", col("b"), col("c")),
      )).as("ek"),
      col("tri"),
    )
    val rep = triEdges.groupBy("ek").agg(min(col("tri")).as("rep"))
    val triGraph = triEdges
      .join(rep, Seq("ek"))
      .filter(col("tri") =!= col("rep"))
      .select(col("rep").as("src"), col("tri").as("dst"))
      .distinct()

    // isolated triangles (no shared edge) are their own community
    val cc = GraphOps.connectedComponents(triGraph).withColumnRenamed("node", "tri")
    val comp = withId
      .select("tri")
      .distinct()
      .join(cc, Seq("tri"), "left")
      .select(col("tri"), coalesce(col("component"), col("tri")).as("community_key"))

    val members = comp
      .select(col("community_key"), explode(split(col("tri"), "\\|")).as("node"))
      .distinct()
    val big = members
      .groupBy("community_key")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minClusterSize)
      .select("community_key")
    members.join(big, Seq("community_key"), "left_semi")
  }
}
