package graft.graph

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Centrality measures vs hand-computed networkx values — the reference
  * computes nx closeness/betweenness on ≤1000-node graphs
  * (performance_optimizer.py:378-392).
  */
class CentralitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def closenessMap(edges: Seq[(Long, Long)]): Map[Long, Double] =
    GraphOps
      .closenessCentrality(edges.toDF("src", "dst"))
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap

  private def betweennessMap(edges: Seq[(Long, Long)]): Map[Long, Double] =
    GraphOps
      .betweennessCentrality(edges.toDF("src", "dst"))
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap

  private def approx(got: Map[Long, Double], want: Map[Long, Double]): Unit = {
    assert(got.keySet == want.keySet)
    want.foreach { case (k, v) => assert(math.abs(got(k) - v) < 1e-9, s"node $k: ${got(k)} vs $v") }
  }

  test("closeness: path graph P4 matches nx closeness_centrality") {
    // nx: endpoints (n-1)/sum(1,2,3) = 3/6, middles 3/4
    approx(
      closenessMap(Seq((1L, 2L), (2L, 3L), (3L, 4L))),
      Map(1L -> 0.5, 2L -> 0.75, 3L -> 0.75, 4L -> 0.5),
    )
  }

  test("closeness: disconnected graph uses the Wasserman–Faust correction") {
    // components {1,2,3} (path) and {10,11}; n = 5
    // node 1: r=3, sumd=1+2=3 → ((3-1)/(5-1))·((3-1)/3) = 1/3
    // node 2: r=3, sumd=2   → (2/4)·(2/2) = 1/2
    // node 10: r=2, sumd=1  → (1/4)·(1/1) = 1/4
    approx(
      closenessMap(Seq((1L, 2L), (2L, 3L), (10L, 11L))),
      Map(1L -> 1.0 / 3, 2L -> 0.5, 3L -> 1.0 / 3, 10L -> 0.25, 11L -> 0.25),
    )
  }

  test("betweenness: path P4 matches nx betweenness_centrality(normalized)") {
    // nx: [0, 2/3, 2/3, 0]
    approx(
      betweennessMap(Seq((1L, 2L), (2L, 3L), (3L, 4L))),
      Map(1L -> 0.0, 2L -> 2.0 / 3, 3L -> 2.0 / 3, 4L -> 0.0),
    )
  }

  test("betweenness: star S3 center carries all pairs") {
    // center 0 with leaves 1..3: nx gives center 1.0, leaves 0
    approx(
      betweennessMap(Seq((0L, 1L), (0L, 2L), (0L, 3L))),
      Map(0L -> 1.0, 1L -> 0.0, 2L -> 0.0, 3L -> 0.0),
    )
  }

  test("betweenness: cycle C5 is uniform") {
    // each node lies on exactly one shortest path per opposite pair:
    // nx betweenness_centrality(C5) = 1/6 everywhere
    val c5 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L))
    approx(betweennessMap(c5), (1L to 5L).map(_ -> 1.0 / 6).toMap)
  }

  test("allPairsDistances: exact min distances on a branched graph") {
    val d = GraphOps
      .allPairsDistances(Seq((1L, 2L), (2L, 3L), (2L, 4L)).toDF("src", "dst"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2))
      .toMap
    assert(d((1L, 4L)) == 2 && d((3L, 4L)) == 2 && d((1L, 2L)) == 1 && d((1L, 1L)) == 0)
    assert(d.size == 16) // 4 nodes, all reachable
  }

  test("bfsIndexed equals bfs with an over-covering probe") {
    val edges = {
      val rnd = new scala.util.Random(7)
      (1 to 80).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    }.toDF("src", "dst")
    val und = GraphOps.undirect(edges).cache()
    val sources = Seq(1L, 5L).toDF("node")
    val direct = GraphOps.bfs(und, sources, 3).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // probe returns the whole relation (worst-case over-covering bucket)
    val probed = GraphOps
      .bfsIndexed(_ => und, sources, 3)
      .collect()
      .map(r => r.getLong(0) -> r.getInt(1))
      .toMap
    assert(probed == direct)
    und.unpersist()
  }

  test("driver-collect ops enforce the reference's small-graph gate") {
    // a 12-node path exceeds an explicit maxNodes=10 gate → fail fast
    val path = (1L until 12L).map(i => (i, i + 1)).toDF("src", "dst")
    val eb = intercept[IllegalArgumentException](GraphOps.betweennessCentrality(path, maxNodes = 10))
    assert(eb.getMessage.contains("gated to graphs with <= 10 nodes"))
    val ed = intercept[IllegalArgumentException](GraphOps.dfs(path, Seq(1L), 3, maxNodes = 10))
    assert(ed.getMessage.contains("gated to graphs with <= 10 nodes"))
    // at/below the gate both still run (values pinned by the nx goldens
    // and the DFS differential elsewhere in the suite)
    assert(GraphOps.betweennessCentrality(path, maxNodes = 12).count() == 12L)
    assert(GraphOps.dfs(path, Seq(1L), 3, maxNodes = 12).count() == 4L)
    // the DEFAULT dfs gate equals the reference's 1000-node centrality
    // gate (performance_optimizer.py:384-389): a 1001-node path trips it
    val big = (1L until 1001L).map(i => (i, i + 1)).toDF("src", "dst")
    val edd = intercept[IllegalArgumentException](GraphOps.dfs(big, Seq(1L), 1))
    assert(edd.getMessage.contains("<= 1000 nodes"))
  }
}
