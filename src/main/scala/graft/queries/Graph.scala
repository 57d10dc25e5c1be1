package graft.queries

import graft.{QueryDef, T}
import graft.graph.GraphOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph traversal / component / community operators from SURVEY.md §2.9,
  * over a deterministic sparse graph derived from the lineitem table:
  * supplier s — part (10000 + p) for every lineitem row with quantity ≤ 2.
  * DuckDB oracles use recursive CTEs, so BFS reachability, min-id
  * connected components, and distance reranking are checked exactly.
  */
object Graph {

  /** Deterministic edge list (src, dst), directed supplier→part. */
  def edges(s: SparkSession, dir: String): DataFrame =
    T.load(s, dir, "lineitem")
      .filter(col("l_quantity") <= lit(2.0))
      .select(
        col("l_suppkey").as("src"),
        (col("l_partkey") + lit(10000L)).as("dst"),
      )

  private val edgesSql =
    """
    SELECT l_suppkey AS src, l_partkey + 10000 AS dst
    FROM lineitem WHERE l_quantity <= 2.0
    """

  // undirected + deduped, in SQL
  private val uEdgesSql =
    s"""
    SELECT DISTINCT src, dst FROM (
      SELECT src, dst FROM ($edgesSql) e1
      UNION ALL
      SELECT dst AS src, src AS dst FROM ($edgesSql) e2) u
    """

  def defs: Seq[QueryDef] = Seq(
    // ---- degree projection (community_operations.py:46-71) ----
    QueryDef(
      "q_graph_degree",
      (s, dir) => {
        GraphOps.degrees(edges(s, dir)).orderBy(col("node"))
      },
      Some(s"""
        SELECT node, count(*) AS degree FROM (
          SELECT src AS node FROM ($edgesSql) a
          UNION ALL
          SELECT dst FROM ($edgesSql) b) t
        GROUP BY node ORDER BY node
      """),
    ),

    // ---- BFS min-distance, depth ≤ 3 from node 1 (graph_traversal.py:
    // 172-286; MAX_SEARCH_DEPTH=3 search_utils.py:71) ----
    QueryDef(
      "q_graph_bfs3",
      (s, dir) => {
        import s.implicits._
        val src = Seq(1L).toDF("node")
        GraphOps
          .bfs(GraphOps.undirect(edges(s, dir)), src, 3)
          .orderBy(col("node"))
      },
      Some(s"""
        WITH RECURSIVE walk(node, d) AS (
          SELECT CAST(1 AS BIGINT), 0
          UNION
          SELECT e.dst, w.d + 1
          FROM walk w JOIN ($uEdgesSql) e ON e.src = w.node
          WHERE w.d < 3
        )
        SELECT node, min(d) AS dist FROM walk GROUP BY node ORDER BY node
      """),
    ),

    // ---- connected components, canonical = min id (compress_uuid_map,
    // bulk_utils.py:433-470) ----
    QueryDef(
      "q_graph_cc",
      (s, dir) => {
        GraphOps.connectedComponents(edges(s, dir)).orderBy(col("node"))
      },
      Some(s"""
        WITH RECURSIVE
        uedges AS ($uEdgesSql),
        allnodes AS (SELECT DISTINCT src AS node FROM uedges),
        lab(node, lab) AS (
          SELECT node, node FROM allnodes
          UNION
          SELECT e.dst, l.lab
          FROM lab l JOIN uedges e ON e.src = l.node
          WHERE l.lab < e.dst
        )
        SELECT node, min(lab) AS component FROM lab
        GROUP BY node ORDER BY node
      """),
    ),

    // ---- k-hop neighborhood counts (get_neighbors, graph_traversal.py:
    // 431-462): nodes at distance exactly 1 and exactly 2 from each of a
    // seed set ----
    QueryDef(
      "q_graph_neighbors",
      (s, dir) => {
        import s.implicits._
        val seeds = Seq(1L, 2L, 3L, 4L, 5L).toDF("seed")
        val u = GraphOps.undirect(edges(s, dir)).localCheckpoint()
        val hop1 = seeds
          .join(u.as("e1"), seeds("seed") === col("e1.src"))
          .select(col("seed"), col("e1.dst").as("node"))
          .distinct()
        val hop2 = hop1
          .join(u.as("e2"), hop1("node") === col("e2.src"))
          .select(col("seed"), col("e2.dst").as("node"))
          .distinct()
          .filter(col("node") =!= col("seed"))
          .except(hop1)
        hop1
          .groupBy(col("seed"))
          .agg(count(lit(1)).as("n_hop1"))
          .join(hop2.groupBy(col("seed")).agg(count(lit(1)).as("n_hop2")), Seq("seed"), "left")
          .na
          .fill(0, Seq("n_hop2"))
          .orderBy(col("seed"))
      },
      Some(s"""
        WITH uedges AS ($uEdgesSql),
        seeds AS (SELECT * FROM (VALUES (CAST(1 AS BIGINT)),(2),(3),(4),(5)) s(seed)),
        hop1 AS (SELECT DISTINCT seed, e.dst AS node
                 FROM seeds JOIN uedges e ON e.src = seed),
        hop2 AS (SELECT DISTINCT h.seed, e.dst AS node
                 FROM hop1 h JOIN uedges e ON e.src = h.node
                 WHERE e.dst <> h.seed
                   AND NOT EXISTS (SELECT 1 FROM hop1 x
                                   WHERE x.seed = h.seed AND x.node = e.dst))
        SELECT s.seed,
               (SELECT count(*) FROM hop1 WHERE seed = s.seed) AS n_hop1,
               (SELECT count(*) FROM hop2 WHERE seed = s.seed) AS n_hop2
        FROM seeds s ORDER BY s.seed
      """),
    ),

    // ---- node-distance reranker (search_utils.py:1885-1936): candidates
    // scored 1/(1+d) by BFS distance from a center node ----
    QueryDef(
      "q_graph_distance_rerank",
      (s, dir) => {
        import s.implicits._
        val center = Seq(1L).toDF("node")
        val dists = GraphOps.bfs(GraphOps.undirect(edges(s, dir)), center, 3)
        dists
          .withColumn("score", round(lit(1.0) / (lit(1.0) + col("dist")), 6))
          .select(col("node"), col("score"))
          .orderBy(col("score").desc, col("node"))
          .limit(50)
      },
      Some(s"""
        WITH RECURSIVE walk(node, d) AS (
          SELECT CAST(1 AS BIGINT), 0
          UNION
          SELECT e.dst, w.d + 1
          FROM walk w JOIN ($uEdgesSql) e ON e.src = w.node
          WHERE w.d < 3
        )
        SELECT node, round(1.0 / (1.0 + min(d)), 6) AS score
        FROM walk GROUP BY node
        ORDER BY score DESC, node LIMIT 50
      """),
    ),

    // ---- one label-propagation superstep (community_operations.py:86-131):
    // adopt the plurality neighbor label, tie → larger label ----
    QueryDef(
      "q_graph_label_prop1",
      (s, dir) => {
        val e = edges(s, dir)
        val u = e
          .select(col("src"), col("dst"))
          .unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
        val labels = GraphOps.nodes(u).withColumn("label", col("node"))
        GraphOps.labelPropagationStep(u, labels).orderBy(col("node"))
      },
      Some(s"""
        WITH dedges AS (
          SELECT src, dst FROM ($edgesSql) e1
          UNION ALL
          SELECT dst, src FROM ($edgesSql) e2),
        votes AS (
          SELECT dst AS n, src AS label, count(*) AS w
          FROM dedges GROUP BY dst, src)
        SELECT n AS node, label FROM (
          SELECT n, label,
                 row_number() OVER (PARTITION BY n ORDER BY w DESC, label DESC) AS rk
          FROM votes) t
        WHERE rk = 1 ORDER BY node
      """),
    ),

    // ---- find_paths (graph_traversal.py:396-429): all simple paths from
    // node 1 to a target set within depth 3, as node arrays ----
    QueryDef(
      "q_graph_find_paths",
      (s, dir) => {
        val u = GraphOps.undirect(edges(s, dir))
        GraphOps
          .findPaths(u, Seq(1L), Set(2L, 3L), maxDepth = 3)
          .withColumn("path_str", concat_ws("->", col("path")))
          .select(col("path_str"))
          .orderBy(col("path_str"))
      },
      Some(s"""
        WITH RECURSIVE uedges AS ($uEdgesSql),
        walk(head, path) AS (
          SELECT CAST(1 AS BIGINT), [CAST(1 AS BIGINT)]
          UNION ALL
          SELECT e.dst, list_append(w.path, e.dst)
          FROM walk w JOIN uedges e ON e.src = w.head
          WHERE NOT list_contains(w.path, e.dst) AND len(w.path) <= 3
        )
        SELECT array_to_string(path, '->') AS path_str FROM walk
        WHERE head IN (2, 3)
        ORDER BY path_str
      """),
    ),

    // ---- closeness centrality (performance_optimizer.py:384-389 computes
    // nx.closeness_centrality on ≤1000-node graphs): Wasserman–Faust form
    // over a bounded deterministic subgraph (suppliers ≤ 20), checked
    // exactly against an all-sources recursive-CTE BFS ----
    QueryDef(
      "q_graph_closeness",
      (s, dir) => {
        val sub = edges(s, dir).filter(col("src") <= 20)
        GraphOps.closenessCentrality(sub, maxDepth = 16).orderBy(col("node"))
      },
      Some(s"""
        WITH RECURSIVE
        bedges AS (SELECT src, dst FROM ($edgesSql) b WHERE src <= 20),
        uedges AS (SELECT DISTINCT src, dst FROM (
          SELECT src, dst FROM bedges
          UNION ALL
          SELECT dst AS src, src AS dst FROM bedges) u),
        allnodes AS (SELECT DISTINCT src AS node FROM uedges),
        walk(start, node, d) AS (
          SELECT node, node, 0 FROM allnodes
          UNION
          SELECT w.start, e.dst, w.d + 1
          FROM walk w JOIN uedges e ON e.src = w.node
          WHERE w.d < 16
        ),
        mind AS (SELECT start, node, min(d) AS d FROM walk GROUP BY start, node),
        agg AS (SELECT start, count(*) AS r, sum(d) AS sumd FROM mind GROUP BY start),
        nn AS (SELECT count(*) AS n FROM allnodes)
        SELECT start AS node,
               CASE WHEN r > 1 AND nn.n > 1
                    THEN ((r - 1) * (r - 1)) / ((nn.n - 1) * sumd)
                    ELSE 0.0 END AS closeness
        FROM agg, nn ORDER BY node
      """),
    ),

    // ---- betweenness centrality (the other ≤1000-node nx centrality the
    // reference computes, performance_optimizer.py:384-389): Brandes on a
    // bounded deterministic subgraph (suppliers ≤ 6, ~150 nodes, diameter
    // ≤ 6), re-derived relationally by the oracle in POLYNOMIAL form —
    // dedup'd BFS distances (no path column), σ_st counted by a
    // level-unrolled DAG DP over tight edges (mind(s,u)+1 = mind(s,v)),
    // pair dependencies via the Brandes identity σ_sv·σ_vt/σ_st on
    // distance-tight triples, nx-normalized. Value-identical to the
    // previous enumerate-every-shortest-path oracle (verified exactly at
    // sf0.01) but safe on DENSE subgraphs: at sf0.001 the src≤6 slice is
    // denser (352 edges / 124 nodes) and simple-walk enumeration to depth
    // 10 explodes exponentially (observed >64 GB in DuckDB) while this
    // form stays ∝ pairs × edges. CTEs are MATERIALIZED — DuckDB
    // re-inlines chained CTEs per reference, turning the 10-level chain
    // quadratic otherwise. Matches nx.betweenness_centrality(
    // normalized=True) exactly (6 dp on both sides absorbs
    // summation-order ulps). ----
    QueryDef(
      "q_graph_betweenness",
      (s, dir) => {
        val sub = edges(s, dir).filter(col("src") <= 6)
        GraphOps
          .betweennessCentrality(sub)
          .select(col("node"), round(col("betweenness"), 6).as("betweenness"))
          .orderBy(col("node"))
      },
      Some {
        // σ DP unrolled over BFS levels 1..10 (levels are disjoint by
        // mind, so the union is exact): σ_d(v) = Σ tight-pred σ_{d-1}(u)
        val sigmaLevels = (1 to 10)
          .map(d => s"""s$d AS MATERIALIZED (
            SELECT te.start, te.v AS node, $d AS d, sum(p.sig) AS sig
            FROM te JOIN s${d - 1} p ON p.start = te.start AND p.node = te.u
            WHERE te.du = ${d - 1} GROUP BY te.start, te.v)""")
          .mkString(",\n")
        val sigmaUnion = (1 to 10).map(d => s"SELECT * FROM s$d").mkString(" UNION ALL ")
        s"""
        WITH RECURSIVE
        bedges AS (SELECT src, dst FROM ($edgesSql) b WHERE src <= 6),
        uedges AS (SELECT DISTINCT src, dst FROM (
          SELECT src, dst FROM bedges
          UNION ALL
          SELECT dst AS src, src AS dst FROM bedges) u),
        allnodes AS (SELECT DISTINCT src AS node FROM uedges),
        walk(start, node, d) AS (
          SELECT node, node, 0 FROM allnodes
          UNION
          SELECT w.start, e.dst, w.d + 1
          FROM walk w JOIN uedges e ON e.src = w.node
          WHERE w.d < 10
        ),
        mind AS MATERIALIZED (SELECT start, node, min(d) AS d FROM walk GROUP BY start, node),
        te AS MATERIALIZED (
          SELECT m1.start, e.src AS u, e.dst AS v, m1.d AS du
          FROM uedges e
          JOIN mind m1 ON m1.node = e.src
          JOIN mind m2 ON m2.start = m1.start AND m2.node = e.dst
          WHERE m2.d = m1.d + 1
        ),
        s0 AS (SELECT node AS start, node, 0 AS d, CAST(1 AS DOUBLE) AS sig FROM allnodes),
        $sigmaLevels,
        sigma AS MATERIALIZED ($sigmaUnion),
        dep AS (
          SELECT sv.node AS node, sum(sv.sig * vt.sig / st.sig) AS d
          FROM sigma st
          JOIN sigma sv ON sv.start = st.start AND sv.node <> st.node
          JOIN sigma vt ON vt.start = sv.node AND vt.node = st.node
          WHERE sv.d + vt.d = st.d
          GROUP BY sv.node
        ),
        nn AS (SELECT count(*) AS n FROM allnodes)
        SELECT a.node,
               round(coalesce(dep.d, 0.0) *
                     CASE WHEN nn.n > 2 THEN 1.0/((nn.n-1.0)*(nn.n-2.0)) ELSE 0.0 END, 6) AS betweenness
        FROM allnodes a LEFT JOIN dep ON dep.node = a.node, nn
        ORDER BY a.node
      """
      },
    ),

    // ---- subgraph extraction around seeds (graph_traversal.py:464-502):
    // edges with both endpoints within BFS depth 2 of node 1 ----
    QueryDef(
      "q_graph_subgraph",
      (s, dir) => {
        import s.implicits._
        val center = Seq(1L).toDF("node")
        val u = GraphOps.undirect(edges(s, dir))
        val reach = GraphOps.bfs(u, center, 2).select(col("node"))
        u.join(reach.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
          .join(reach.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
          .select(col("src"), col("dst"))
          .orderBy(col("src"), col("dst"))
      },
      Some(s"""
        WITH RECURSIVE uedges AS ($uEdgesSql),
        walk(node, d) AS (
          SELECT CAST(1 AS BIGINT), 0
          UNION
          SELECT e.dst, w.d + 1 FROM walk w JOIN uedges e ON e.src = w.node
          WHERE w.d < 2
        ),
        reach AS (SELECT DISTINCT node FROM walk)
        SELECT src, dst FROM uedges
        WHERE src IN (SELECT node FROM reach) AND dst IN (SELECT node FROM reach)
        ORDER BY src, dst
      """),
    ),

    // ---- triangle enumeration (the k=3 clique-percolation substrate,
    // community_detector.py:269-297) over the co-supplier projection:
    // suppliers are adjacent when they supply the same part. The
    // degree-ordered wedge join is the scale path (see
    // community/CliquePercolation.scala); the oracle re-derives every
    // triangle with a 3-way self-join ----
    QueryDef(
      "q_graph_triangles",
      (s, dir) => {
        val li = T.load(s, dir, "lineitem")
          .filter(col("l_quantity") <= lit(2.0))
          .select(col("l_suppkey").as("sk"), col("l_partkey").as("pk"))
          .distinct()
        val co = li.as("x")
          .join(li.as("y"), col("x.pk") === col("y.pk") && col("x.sk") < col("y.sk"))
          .select(col("x.sk").as("src"), col("y.sk").as("dst"))
          .distinct()
        // triangles() canonicalizes as strings; re-order numerically to
        // match the integer oracle
        graft.community.CliquePercolation.triangles(co)
          .select(col("a").cast("long").as("x"), col("b").cast("long").as("y"), col("c").cast("long").as("z"))
          .select(
            least(col("x"), col("y"), col("z")).as("a"),
            (col("x") + col("y") + col("z")
              - least(col("x"), col("y"), col("z"))
              - greatest(col("x"), col("y"), col("z"))).as("b"),
            greatest(col("x"), col("y"), col("z")).as("c"),
          )
          .orderBy(col("a"), col("b"), col("c"))
      },
      Some("""
        WITH li AS (
          SELECT DISTINCT l_suppkey AS sk, l_partkey AS pk
          FROM lineitem WHERE l_quantity <= 2.0),
        e AS (
          SELECT DISTINCT x.sk AS u, y.sk AS v
          FROM li x JOIN li y ON x.pk = y.pk AND x.sk < y.sk)
        SELECT e1.u::BIGINT AS a, e1.v::BIGINT AS b, e2.v::BIGINT AS c
        FROM e e1
        JOIN e e2 ON e1.v = e2.u
        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
        ORDER BY a, b, c
      """),
    ),
  )
}
