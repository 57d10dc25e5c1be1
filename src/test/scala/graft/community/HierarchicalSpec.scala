package graft.community

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class HierarchicalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cluster(points: Seq[(String, Seq[Double])], k: Int): Map[String, String] =
    Hierarchical
      .wardCommunities(points.toDF("id", "vec"), "id", "vec", k)
      .collect()
      .map(r => r.getString(0) -> r.getString(1))
      .toMap

  test("ward recovers three separable clusters") {
    val pts = Seq(
      "a1" -> Seq(0.0, 0.0), "a2" -> Seq(0.1, 0.0), "a3" -> Seq(0.0, 0.1),
      "b1" -> Seq(10.0, 10.0), "b2" -> Seq(10.1, 10.0),
      "c1" -> Seq(-10.0, 5.0), "c2" -> Seq(-10.0, 5.1), "c3" -> Seq(-10.1, 5.0),
    )
    val got = cluster(pts, 3)
    assert(got("a1") == "a1" && got("a2") == "a1" && got("a3") == "a1")
    assert(got("b1") == "b1" && got("b2") == "b1")
    assert(got("c1") == "c1" && got("c2") == "c1" && got("c3") == "c1")
  }

  test("ward merge order follows variance increase, not raw proximity chains") {
    // Four colinear points: 0, 1, 2.4, 3.4. Pairs (0,1) and (2.4,3.4) merge
    // first (d=1 each); Ward's criterion then keeps the two pairs apart at
    // k=2 rather than chaining through the middle gap of 1.4.
    val pts = Seq(
      "p0" -> Seq(0.0), "p1" -> Seq(1.0), "p2" -> Seq(2.4), "p3" -> Seq(3.4),
    )
    val got = cluster(pts, 2)
    assert(got("p0") == got("p1") && got("p2") == got("p3") && got("p0") != got("p2"))
  }

  test("deterministic across runs and k=1 folds everything") {
    val pts = (0 until 20).map(i => s"n$i" -> Seq(math.sin(i.toDouble), math.cos(i.toDouble), i / 10.0))
    val a = cluster(pts, 4)
    val b = cluster(pts, 4)
    assert(a == b)
    val one = cluster(pts, 1)
    assert(one.values.toSet.size == 1 && one.values.head == "n0")
  }

  test("node-count gate fails fast") {
    val pts = (0 until 30).map(i => s"n$i" -> Seq(i.toDouble))
    intercept[IllegalArgumentException](
      Hierarchical.wardCommunities(pts.toDF("id", "vec"), "id", "vec", 2, maxNodes = 10),
    )
  }
}
