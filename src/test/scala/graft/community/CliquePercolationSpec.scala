package graft.community

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** k=3 clique percolation parity with NetworkX `k_clique_communities`
  * (`community_detector.py:287`): triangles chained by SHARED EDGES form
  * one community; a shared node alone does not merge (overlap instead);
  * nodes on no triangle are in no community.
  */
class CliquePercolationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def communitiesOf(edges: Seq[(String, String)]): Map[String, Set[String]] =
    CliquePercolation
      .communities(edges.toDF("src", "dst"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }

  test("two triangles sharing an edge are ONE community of 4") {
    // a-b-c and b-c-d share edge b-c
    val got = communitiesOf(Seq(("a", "b"), ("b", "c"), ("a", "c"), ("b", "d"), ("c", "d")))
    assert(got.values.toSet == Set(Set("a", "b", "c", "d")))
  }

  test("two triangles sharing only a node stay separate and OVERLAP on it") {
    // a-b-c and c-d-e share only node c (NetworkX: two communities)
    val got = communitiesOf(
      Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e"), ("c", "e")),
    )
    assert(got.values.toSet == Set(Set("a", "b", "c"), Set("c", "d", "e")))
  }

  test("nodes on no triangle belong to no community; direction/duplicates ignored") {
    // one triangle + a dangling path x-y-z (no triangle), reversed dup edges
    val got = communitiesOf(
      Seq(("a", "b"), ("b", "a"), ("b", "c"), ("a", "c"), ("x", "y"), ("y", "z")),
    )
    assert(got.values.toSet == Set(Set("a", "b", "c")))
  }

  test("triangle chain percolates transitively; hub wheel is one community") {
    // chain t1..t4: 1-2-3, 2-3-4, 3-4-5, 4-5-6 → one community {1..6};
    // separate wheel: hub h with spokes to a 5-cycle → all triangles share
    // edges through the hub ring
    val chain = Seq(("1", "2"), ("2", "3"), ("1", "3"), ("2", "4"), ("3", "4"), ("3", "5"), ("4", "5"), ("4", "6"), ("5", "6"))
    val ring = Seq("p", "q", "r", "s", "t")
    val wheel = ring.zip(ring.tail :+ ring.head).map { case (u, v) => (u, v) } ++ ring.map(n => ("h", n))
    val got = communitiesOf(chain ++ wheel)
    assert(got.values.toSet == Set(Set("1", "2", "3", "4", "5", "6"), (ring :+ "h").toSet))
  }
}
