package graft.community

import graft.{TestSeeds, TestSpark}
import graft.graph.GraphOps
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Seeded randomized differentials for the community/centrality operators
  * against independent in-memory models (the fixed NetworkX-parity goldens
  * in CliquePercolationSpec/CentralitySpec pin known values; these sweeps
  * cover random graph shapes the goldens do not reach):
  *
  *  - triangles vs brute-force O(n³) enumeration
  *  - k=3 clique percolation vs union-find over edge-sharing triangles
  *  - closeness (Wasserman–Faust) vs per-source BFS recomputation
  *  - betweenness (Brandes) vs the pair-sum σ formulation — a DIFFERENT
  *    algorithm (σ_st(v) = σ_sv·σ_vt when d(s,v)+d(v,t)=d(s,t)), so a
  *    bookkeeping bug in the dependency accumulation cannot self-confirm
  *  - Louvain's internal modularity accounting vs a from-scratch Q
  */
class CommunityDifferentialSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def randomEdges(seed: Long, n: Int, p: Double): Seq[(Int, Int)] = {
    val rnd = new scala.util.Random(seed)
    (for {
      i <- 0 until n
      j <- (i + 1) until n
      if rnd.nextDouble() < p
    } yield (i, j)).toSeq
  }

  private def edgesDf(edges: Seq[(Int, Int)], asString: Boolean): DataFrame = {
    import spark.implicits._
    if (asString) edges.map { case (a, b) => (s"n$a", s"n$b") }.toDF("src", "dst")
    else edges.map { case (a, b) => (a.toLong, b.toLong) }.toDF("src", "dst")
  }

  private def adjOf(edges: Seq[(Int, Int)]): Map[Int, Set[Int]] =
    (edges ++ edges.map(_.swap))
      .groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }
      .withDefaultValue(Set.empty)

  private def bfsDist(adj: Map[Int, Set[Int]], s: Int): Map[Int, Int] = {
    var dist = Map(s -> 0)
    var frontier = Set(s)
    var d = 0
    while (frontier.nonEmpty) {
      d += 1
      frontier = frontier.flatMap(adj).filterNot(dist.contains)
      dist ++= frontier.map(_ -> d)
    }
    dist
  }

  test("triangles == brute-force enumeration (seeded)") {
    for (seed <- Seq(3L, 17L, 41L).map(_ + TestSeeds.offset)) {
      val es = randomEdges(seed, 10, 0.35)
      val adj = adjOf(es)
      val expected = (for {
        a <- 0 until 10; b <- (a + 1) until 10; c <- (b + 1) until 10
        if adj(a)(b) && adj(a)(c) && adj(b)(c)
      } yield (s"n$a", s"n$b", s"n$c")).toSet
      val got = CliquePercolation
        .triangles(edgesDf(es, asString = true))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2)))
        .toSet
      assert(got == expected, s"seed=$seed: triangle sets diverged")
    }
  }

  test("k=3 clique percolation == edge-sharing union-find model (seeded)") {
    for (seed <- Seq(7L, 29L, 61L).map(_ + TestSeeds.offset)) {
      val es = randomEdges(seed, 11, 0.3)
      val adj = adjOf(es)
      val tris = (for {
        a <- 0 until 11; b <- (a + 1) until 11; c <- (b + 1) until 11
        if adj(a)(b) && adj(a)(c) && adj(b)(c)
      } yield Seq(a, b, c)).toVector
      // union-find: triangles sharing an edge (2 nodes) percolate
      val parent = scala.collection.mutable.ArrayBuffer.tabulate(tris.size)(identity)
      def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      for {
        i <- tris.indices; j <- (i + 1) until tris.size
        if tris(i).toSet.intersect(tris(j).toSet).size == 2
      } parent(find(i)) = find(j)
      val expected = tris.indices
        .groupBy(find)
        .values
        .map(_.flatMap(tris).toSet.map((n: Int) => s"n$n"))
        .toSet
      val got = CliquePercolation
        .communities(edgesDf(es, asString = true))
        .collect()
        .map(r => r.getString(0) -> r.getString(1))
        .groupBy(_._1)
        .values
        .map(_.map(_._2).toSet)
        .toSet
      assert(got == expected, s"seed=$seed: community node-sets diverged")
    }
  }

  test("closeness centrality == BFS + Wasserman-Faust model (seeded)") {
    for (seed <- Seq(11L, 37L).map(_ + TestSeeds.offset)) {
      // p low enough that disconnected components (the WF correction's
      // whole point) actually occur
      val es = randomEdges(seed, 12, 0.18)
      if (es.nonEmpty) {
        val adj = adjOf(es)
        val universe = es.flatMap(t => Seq(t._1, t._2)).distinct
        val n = universe.size
        val expected = universe.map { u =>
          val dist = bfsDist(adj, u)
          val r = dist.size
          val sumd = dist.values.sum
          val c = if (r > 1 && n > 1) (r - 1).toDouble * (r - 1) / ((n - 1).toDouble * sumd) else 0.0
          s"n$u" -> c
        }.toMap
        val got = GraphOps
          .closenessCentrality(edgesDf(es, asString = true))
          .collect()
          .map(r => r.getString(0) -> r.getDouble(1))
          .toMap
        assert(got.keySet == expected.keySet, s"seed=$seed: node universes diverged")
        for ((k, v) <- expected)
          assert(math.abs(got(k) - v) < 1e-9, s"seed=$seed: closeness($k): got ${got(k)}, model $v")
      }
    }
  }

  test("betweenness centrality == pair-sum sigma model (seeded)") {
    for (seed <- Seq(13L, 47L).map(_ + TestSeeds.offset)) {
      val es = randomEdges(seed, 10, 0.3)
      if (es.nonEmpty) {
        val adj = adjOf(es)
        val universe = es.flatMap(t => Seq(t._1, t._2)).distinct.sorted
        val n = universe.size
        // per-source shortest-path counts (plain BFS DP, no dependency pass)
        val sp: Map[Int, (Map[Int, Int], Map[Int, Double])] = universe.map { s =>
          val dist = bfsDist(adj, s)
          val sigma = scala.collection.mutable.Map(s -> 1.0)
          for (v <- dist.keys.toSeq.sortBy(dist)) if (v != s)
            // .toSeq before .map: mapping over the neighbor Set would
            // collapse predecessors with EQUAL sigma before the sum
            sigma(v) = adj(v).toSeq.filter(w => dist.contains(w) && dist(w) == dist(v) - 1).map(sigma).sum
          s -> (dist, sigma.toMap)
        }.toMap
        val raw = universe.map { v =>
          var acc = 0.0
          for {
            s <- universe; t <- universe
            if s < t && v != s && v != t
            (ds, sigS) = sp(s)
            if ds.contains(t) && ds.contains(v)
            (dt, sigT) = sp(t)
            if ds(v) + dt(v) == ds(t)
          } acc += sigS(v) * sigT(v) / sigS(t)
          v -> acc
        }.toMap
        val norm = if (n > 2) 2.0 / ((n - 1.0) * (n - 2.0)) else 0.0
        val got = GraphOps
          .betweennessCentrality(edgesDf(es, asString = false))
          .collect()
          .map(r => r.getLong(0).toInt -> r.getDouble(1))
          .toMap
        assert(got.keySet == raw.keySet, s"seed=$seed: node universes diverged")
        for ((k, v) <- raw)
          assert(math.abs(got(k) - v * norm) < 1e-9, s"seed=$seed: betweenness($k): got ${got(k)}, model ${v * norm}")
      }
    }
  }

  test("Louvain modularity accounting == from-scratch Q of the returned labels (seeded)") {
    for (seed <- Seq(19L, 53L).map(_ + TestSeeds.offset)) {
      val es = randomEdges(seed, 12, 0.25)
      if (es.nonEmpty) {
        val df = edgesDf(es, asString = true)
        val labels = Louvain.cluster(df)
        val lbl = labels.collect().map(r => r.getString(0) -> r.getString(1)).toMap
        // from-scratch Q over the raw undirected simple graph (unit
        // weights): Q = Σ_C [ e_C/m − (Σ_C k / 2m)² ]
        val m = es.size.toDouble
        val adj = adjOf(es)
        val eC = es.groupBy(t => lbl(s"n${t._1}"))
          .collect { case (c, inEs) => c -> inEs.count(t => lbl(s"n${t._1}") == lbl(s"n${t._2}")).toDouble }
        val kC = lbl.groupBy(_._2).map { case (c, ns) =>
          // keys is a Set — .toSeq first, or equal degrees collapse
          c -> ns.keys.toSeq.map(nn => adj(nn.drop(1).toInt).size).sum.toDouble
        }
        val q = kC.map { case (c, k) => eC.getOrElse(c, 0.0) / m - math.pow(k / (2 * m), 2) }.sum
        val engineQ = Louvain.modularity(Louvain.canonical(df), labels)
        assert(math.abs(engineQ - q) < 1e-9, s"seed=$seed: modularity accounting: engine $engineQ, model $q")
      }
    }
  }
}
