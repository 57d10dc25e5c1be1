package graft.graph

import scala.util.Random

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Seeded randomized differential tests for the traversal operators: BFS
  * min-distance, DFS preorder, and simple-path enumeration on random
  * directed graphs, each checked against an independent in-memory
  * formulation (recursive / queue-based, not a re-transcription of the
  * Spark loop). Random shapes cover cycles, unreachable islands,
  * multi-source frontiers, and depth cutoffs that fixtures miss.
  */
class GraphDifferentialSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def randomGraph(rnd: Random, n: Int, m: Int): Seq[(Long, Long)] =
    Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter { case (a, b) => a != b }.distinct

  test("bfs matches a queue-based multi-source model on random graphs") {
    import spark.implicits._
    val rnd = new Random(7L + graft.TestSeeds.offset)
    for (round <- 0 until 4) {
      val edges = randomGraph(rnd, 14, 28)
      val adj = edges.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
      val sources = Seq.fill(1 + rnd.nextInt(2))(rnd.nextInt(14).toLong).distinct
      val maxDepth = 1 + rnd.nextInt(4)

      // independent model: classic queue BFS from the source set
      val dist = scala.collection.mutable.Map(sources.map(_ -> 0): _*)
      var frontier = sources.toSet
      var d = 0
      while (d < maxDepth && frontier.nonEmpty) {
        d += 1
        frontier = frontier.flatMap(adj.getOrElse(_, Set.empty)).filterNot(dist.contains)
        frontier.foreach(dist(_) = d)
      }

      val got = GraphOps
        .bfs(edges.toDF("src", "dst"), sources.toDF("node"), maxDepth)
        .collect()
        .map(r => r.getLong(0) -> r.getInt(1))
        .toMap
      assert(got == dist.toMap, s"round $round: bfs diverged (edges=$edges sources=$sources depth=$maxDepth)")
    }
  }

  test("dfs matches a recursive preorder model on random graphs") {
    import spark.implicits._
    val rnd = new Random(11L + graft.TestSeeds.offset)
    for (round <- 0 until 4) {
      val edges = randomGraph(rnd, 12, 24)
      val adj = edges.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).distinct.sorted }
      val sources = Seq.fill(1 + rnd.nextInt(3))(rnd.nextInt(12).toLong).distinct
      val maxDepth = 1 + rnd.nextInt(4)

      // independent model: recursive lexicographic preorder per start
      def preorder(start: Long): Seq[(Long, Long, Int, Int)] = {
        val seen = scala.collection.mutable.LinkedHashMap.empty[Long, Int]
        def visit(node: Long, depth: Int): Unit = {
          seen(node) = depth
          if (depth < maxDepth)
            adj.getOrElse(node, Seq.empty).foreach(m => if (!seen.contains(m)) visit(m, depth + 1))
        }
        visit(start, 0)
        seen.toSeq.zipWithIndex.map { case ((node, depth), order) => (start, node, order, depth) }
      }
      val expect = sources.flatMap(preorder).toSet

      val got = GraphOps
        .dfs(edges.toDF("src", "dst"), sources, maxDepth)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
        .toSet
      assert(got == expect, s"round $round: dfs diverged (edges=$edges sources=$sources depth=$maxDepth)")
    }
  }

  test("findPaths matches exhaustive simple-path enumeration on random graphs") {
    import spark.implicits._
    val rnd = new Random(13L + graft.TestSeeds.offset)
    for (round <- 0 until 4) {
      val edges = randomGraph(rnd, 10, 20)
      val adj = edges.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).distinct }
      val sources = Seq.fill(1 + rnd.nextInt(2))(rnd.nextInt(10).toLong).distinct
      val targets = Seq.fill(1 + rnd.nextInt(3))(rnd.nextInt(10).toLong).toSet
      val maxDepth = 1 + rnd.nextInt(3)

      // independent model: recursive enumeration of simple paths with at
      // most maxDepth edges, recorded whenever the head is a target
      val found = scala.collection.mutable.Set.empty[Seq[Long]]
      def extend(path: List[Long]): Unit = {
        if (targets.contains(path.head)) found += path.reverse
        if (path.size <= maxDepth)
          adj.getOrElse(path.head, Seq.empty).foreach(m => if (!path.contains(m)) extend(m :: path))
      }
      sources.foreach(s => extend(List(s)))

      val got = GraphOps
        .findPaths(edges.toDF("src", "dst"), sources, targets, maxDepth)
        .collect()
        .map(_.getSeq[Long](0).toSeq)
        .toSet
      assert(got == found.toSet, s"round $round: findPaths diverged (edges=$edges sources=$sources targets=$targets depth=$maxDepth)")
    }
  }
}
