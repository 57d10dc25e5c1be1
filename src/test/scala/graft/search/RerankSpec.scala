package graft.search

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RerankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rrf: score = sum of 1/rank across lists (search_utils.py:1867-1882)") {
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val b = Seq((20L, 1), (10L, 2)).toDF("id", "rank")
    val got = Rerank.rrf(Seq(a, b)).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(10L) - 1.5) < 1e-12)
    assert(math.abs(got(20L) - 1.5) < 1e-12)
    assert(math.abs(got(30L) - (1.0 / 3)) < 1e-12)
  }

  test("minMax normalization; constant column → 0") {
    val df = Seq((1L, 2.0), (2L, 4.0), (3L, 6.0)).toDF("id", "s")
    val got = Rerank.minMax(df, "s", "n").collect().map(r => r.getLong(0) -> r.getAs[Double]("n")).toMap
    assert(got == Map(1L -> 0.0, 2L -> 0.5, 3L -> 1.0))
    val const = Seq((1L, 5.0), (2L, 5.0)).toDF("id", "s")
    assert(Rerank.minMax(const, "s", "n").collect().forall(_.getAs[Double]("n") == 0.0))
  }

  test("minMaxAll == chained single-column minMax (one stats pass)") {
    val df = Seq(
      (1L, 2.0, 10.0, 7.0),
      (2L, 4.0, 10.0, 3.0),
      (3L, 6.0, 10.0, 5.0),
    ).toDF("id", "a_raw", "b_raw", "c_raw")
    val chained =
      Rerank.minMax(Rerank.minMax(Rerank.minMax(df, "a_raw", "a"), "b_raw", "b"), "c_raw", "c")
    val fused = Rerank.minMaxAll(df, Seq("a_raw" -> "a", "b_raw" -> "b", "c_raw" -> "c"))
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[Long]("id"), r.getAs[Double]("a"), r.getAs[Double]("b"), r.getAs[Double]("c"))
    assert(fused.collect().map(key).sortBy(_._1).toSeq == chained.collect().map(key).sortBy(_._1).toSeq)
    // constant column (b_raw) maps to 0 in both forms
    assert(fused.collect().forall(_.getAs[Double]("b") == 0.0))
  }

  test("mmr: first pick is max relevance; diversification avoids near-dup") {
    val e1 = Array(1.0, 0.0)
    val e1b = Array(0.999, 0.01) // near-duplicate of e1
    val e2 = Array(0.0, 1.0)
    val cands = Seq((1L, 0.9, e1), (2L, 0.89, e1b), (3L, 0.5, e2))
    val picked = Rerank.mmr(cands, k = 2, lambda = 0.5).map(_._1)
    assert(picked.head == 1L)
    assert(picked(1) == 3L, s"expected diversified pick 3, got $picked")
  }

  test("mmr deterministic tie-break to smaller id") {
    val cands = Seq((5L, 0.5, Array(1.0, 0.0)), (2L, 0.5, Array(0.0, 1.0)))
    assert(Rerank.mmr(cands, k = 1).map(_._1) == Seq(2L))
  }

  test("mmr golden selection: exact greedy order and scores on a fixed candidate set") {
    // hand-computed greedy λ=0.5 walk (search_utils.py:1972-2010 is fully
    // deterministic — this is q_mmr's correctness oracle, since the greedy
    // argmax recursion is not expressible as one SQL query):
    //  r1: all maxSim=0 → argmax 0.5·rel → id1 (0.5)
    //  r2: id2 = .45−.5·1 = −.05; id3 = .4−0 = .4; id4 = .35−.5·.6 = .05 → id3 (0.4)
    //  r3: id2 = −.05; id4 = .35−.5·max(.6,.8) = −.05 → tie → smaller id2 (−.05)
    //  r4: id4 = .35−.5·max(.6,.8,.6) = −.05
    val cands = Seq(
      (1L, 1.0, Array(1.0, 0.0)),
      (2L, 0.9, Array(1.0, 0.0)),
      (3L, 0.8, Array(0.0, 1.0)),
      (4L, 0.7, Array(0.6, 0.8)),
    )
    val got = Rerank.mmr(cands, k = 4, lambda = 0.5)
    assert(got.map(_._1) == Seq(1L, 3L, 2L, 4L), s"pick order: $got")
    val exp = Seq(0.5, 0.4, -0.05, -0.05)
    got.map(_._2).zip(exp).foreach { case (g, e) => assert(math.abs(g - e) < 1e-12, s"$got") }
  }
}
