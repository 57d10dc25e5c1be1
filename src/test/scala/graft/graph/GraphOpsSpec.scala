package graft.graph

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // two components: {1,2,3,4} (chain+branch), {10,11}; singleton via self-loop {20}
  private def edges = Seq((1L, 2L), (2L, 3L), (2L, 4L), (10L, 11L), (20L, 20L)).toDF("src", "dst")

  test("connectedComponents: min-id per component, any shape") {
    val got = GraphOps
      .connectedComponents(edges)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("connectedComponents matches brute-force on a pseudo-random graph") {
    val rnd = new scala.util.Random(42)
    val es = (1 to 60).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    val got = GraphOps
      .connectedComponents(es.toDF("src", "dst"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    // reference union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = { val p = parent.getOrElse(x, x); if (p == x) x else { val r = find(p); parent(x) = r; r } }
    def union(a: Long, b: Long): Unit = { val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    es.foreach { case (a, b) => union(a, b) }
    val want = es.flatMap(e => Seq(e._1, e._2)).distinct.map(n => n -> find(n)).toMap
    assert(got == want)
  }

  test("connectedComponentsAuto ≡ connectedComponents on random string-id graphs (both paths)") {
    val rnd = new scala.util.Random(7)
    // md5-like string ids so min is lexicographic on both paths
    def id(i: Int) = f"u${rnd.nextInt(40)}%03d"
    val es = (1 to 80).map(_ => (id(rnd.nextInt(40)), id(rnd.nextInt(40))))
    val df = es.toDF("src", "dst")
    def canon(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getString(0) -> r.getString(1)).toMap
    val dist = canon(GraphOps.connectedComponents(df).collect())
    val auto = canon(GraphOps.connectedComponentsAuto(df).collect())
    assert(auto == dist, "driver union-find fast path must be value-identical")
    // force the DISTRIBUTED fallback through the auto entry point
    val prev = System.getProperty("graft.graph.localccmax")
    System.setProperty("graft.graph.localccmax", "3")
    try {
      val fb = canon(GraphOps.connectedComponentsAuto(df).collect())
      assert(fb == dist, "over-bound input must take the superstep path, same values")
    } finally {
      if (prev == null) System.clearProperty("graft.graph.localccmax")
      else System.setProperty("graft.graph.localccmax", prev)
    }
  }

  test("connectedComponentsAuto ≡ superstep path on random LONG-id graphs (type-preserving)") {
    val rnd = new scala.util.Random(11)
    val es = (1 to 80).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val df = es.toDF("src", "dst")
    def canon(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val auto = GraphOps.connectedComponentsAuto(df)
    assert(
      auto.schema.fields.map(_.dataType).toSeq ==
        Seq(org.apache.spark.sql.types.LongType, org.apache.spark.sql.types.LongType),
      "fast path must preserve the integral node type",
    )
    val fast = canon(auto.collect())
    val dist = canon(GraphOps.connectedComponentsIter(df)._1.collect())
    assert(fast == dist, "long-id driver union-find must equal the superstep path")
  }

  test("bfs driver fast path ≡ distributed superstep path (long and string ids, fallback)") {
    val rnd = new scala.util.Random(23)
    val es = (1 to 120).map(_ => (rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
    val df = es.toDF("src", "dst")
    val srcs = Seq(0L, 7L, 999L).toDF("node") // 999 isolated: stays at dist 0
    def canon(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getLong(0) -> r.getInt(1)).toMap
    val fast = canon(GraphOps.bfs(df, srcs, 3).collect())
    // force the distributed path through the same entry point
    val prev = System.getProperty("graft.graph.localccmax")
    System.setProperty("graft.graph.localccmax", "3")
    val dist =
      try canon(GraphOps.bfs(df, srcs, 3).collect())
      finally {
        if (prev == null) System.clearProperty("graft.graph.localccmax")
        else System.setProperty("graft.graph.localccmax", prev)
      }
    assert(fast == dist, "driver BFS must equal the superstep path")
    assert(fast(999L) == 0, "isolated source stays at dist 0")
    // string ids too
    val sdf = es.map { case (a, b) => (s"n$a", s"n$b") }.toDF("src", "dst")
    val sfast = GraphOps.bfs(sdf, Seq("n0").toDF("node"), 2).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    // compare against the long-id result for the same seed/depth
    val lfast = GraphOps.bfs(df, Seq(0L).toDF("node"), 2).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(sfast == lfast.map { case (n, d) => s"n$n" -> d })
  }

  test("findPaths driver fast path ≡ distributed superstep path") {
    val rnd = new scala.util.Random(31)
    val es = (1 to 60).map(_ => (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
    val df = es.toDF("src", "dst")
    def canon(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(_.getSeq[Long](0).mkString("->")).sorted.toSeq
    val fast = canon(GraphOps.findPaths(df, Seq(0L, 1L), Set(2L, 3L), 3).collect())
    val prev = System.getProperty("graft.graph.localccmax")
    System.setProperty("graft.graph.localccmax", "3")
    val dist =
      try canon(GraphOps.findPaths(df, Seq(0L, 1L), Set(2L, 3L), 3).collect())
      finally {
        if (prev == null) System.clearProperty("graft.graph.localccmax")
        else System.setProperty("graft.graph.localccmax", prev)
      }
    assert(fast == dist, "driver path enumeration must equal the superstep path")
  }

  test("connectedComponents: 1000-node path (worst-case diameter) converges in O(log n) supersteps") {
    val path = (0L until 999L).map(i => (i, i + 1)).toDF("src", "dst")
    val (labels, iters) = GraphOps.connectedComponentsIter(path, maxIter = 50)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length == 1000 && got.forall(_._2 == 0L), "single component rooted at 0")
    // pointer doubling: reach squares per superstep → ≤ ~log2(1000)+slack,
    // vs ~999 supersteps for plain min-propagation
    assert(iters <= 13, s"expected O(log n) supersteps, took $iters")
  }

  test("dfs: lexicographic preorder, depth bound, cycle safety") {
    //    1 → 2 → 4
    //    1 → 3 → 4 ;  4 → 1 (cycle)
    val es = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val got = GraphOps
      .dfs(es, Seq(1L), maxDepth = 5)
      .orderBy(col("visit_order"))
      .collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getInt(3)))
    // preorder: 1, then smallest neighbor 2 first, deep before wide
    assert(got.toSeq == Seq((1L, 0, 0), (2L, 1, 1), (4L, 2, 2), (3L, 3, 1)))
    // depth bound cuts the walk
    val shallow = GraphOps.dfs(es, Seq(1L), maxDepth = 1).collect().map(_.getLong(1)).toSet
    assert(shallow == Set(1L, 2L, 3L))
    // visited set at depth d == BFS reachable set at depth d
    val bfsSet = GraphOps.bfs(es, Seq(1L).toDF("node"), 2).collect().map(_.getLong(0)).toSet
    val dfsSet = GraphOps.dfs(es, Seq(1L), 2).collect().map(_.getLong(1)).toSet
    assert(bfsSet.subsetOf(dfsSet), s"dfs $dfsSet must cover bfs $bfsSet")
  }

  test("bfs: min distance with early termination") {
    val u = GraphOps.undirect(edges)
    val got = GraphOps
      .bfs(u, Seq(1L).toDF("node"), 3)
      .collect()
      .map(r => r.getLong(0) -> r.getInt(1))
      .toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 2))
  }

  test("bfs respects maxDepth") {
    val u = GraphOps.undirect(edges)
    val got = GraphOps.bfs(u, Seq(1L).toDF("node"), 1).collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L))
  }

  test("label propagation converges deterministically") {
    val lp1 = GraphOps.labelPropagation(edges, maxIter = 10).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lp2 = GraphOps.labelPropagation(edges, maxIter = 10).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lp1 == lp2)
    // nodes in different components never share a label
    val comp = Map(1L -> 1, 2L -> 1, 3L -> 1, 4L -> 1, 10L -> 2, 11L -> 2, 20L -> 3)
    lp1.groupBy(_._2).values.foreach { members =>
      assert(members.keys.map(comp).toSet.size == 1)
    }
  }

  test("degrees counts parallel edges") {
    val d = GraphOps
      .degrees(Seq((1L, 2L), (1L, 2L), (2L, 3L)).toDF("src", "dst"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(d == Map(1L -> 2L, 2L -> 3L, 3L -> 1L))
  }
}
