package graft.community

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LouvainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def clique(ids: Seq[Long]): Seq[(Long, Long)] =
    for { a <- ids; b <- ids if a < b } yield (a, b)

  test("two cliques joined by one bridge: recovers the cliques, exact modularity") {
    // 4-clique {1..4}, 4-clique {5..8}, bridge 4–5
    val es = (clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(5L, 6L, 7L, 8L)) :+ (4L, 5L))
      .toDF("src", "dst")
    val got = Louvain
      .cluster(es)
      .collect()
      .map(r => r.getString(0).toLong -> r.getString(1).toLong)
      .toMap
    assert(Seq(1L, 2L, 3L, 4L).map(got).toSet.size == 1, "first clique = one community")
    assert(Seq(5L, 6L, 7L, 8L).map(got).toSet.size == 1, "second clique = one community")
    assert(got(1L) != got(5L), "cliques are distinct communities")
    // canonical ids: smallest member
    assert(got(1L) == 1L && got(5L) == 5L)
    // Q = 2·(6/13 − (13/26)²) for this graph
    val labels = got.toSeq.toDF("node", "community")
    val q = Louvain.modularity(
      es.select(col("src").cast("string").as("u"), col("dst").cast("string").as("v"), lit(1.0).as("w")),
      labels,
    )
    assert(math.abs(q - 2.0 * (6.0 / 13.0 - 0.25)) < 1e-9, s"Q=$q")
  }

  test("analyzeStructure: sizes + modularity of a partition (community_detector.py:398-460)") {
    val es = (clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(5L, 6L, 7L, 8L)) :+ (4L, 5L))
      .toDF("src", "dst")
    val labels = Seq(
      (1L, "a"), (2L, "a"), (3L, "a"), (4L, "a"),
      (5L, "b"), (6L, "b"), (7L, "b"),
      (8L, "c"),
    ).toDF("node", "label")
    val r = Communities.analyzeStructure(labels, es).collect().head
    assert(r.getAs[Long]("total_communities") == 3L)
    assert(math.abs(r.getAs[Double]("average_size") - 8.0 / 3.0) < 1e-9)
    assert(r.getAs[Long]("largest_community_size") == 4L)
    assert(r.getAs[Long]("smallest_community_size") == 1L)
    // Q for {1-4},{5-7},{8}: e_a=6, e_b=3, e_c=0; Σk_a=13, Σk_b=10 (node 5
    // carries the bridge), Σk_c=3; m=13
    val want = (6.0 / 13 - math.pow(13.0 / 26, 2)) + (3.0 / 13 - math.pow(10.0 / 26, 2)) + (0.0 - math.pow(3.0 / 26, 2))
    assert(math.abs(r.getAs[Double]("modularity") - want) < 1e-9)
    // empty partition → all-zero stats (reference :413-420)
    val empty = Communities.analyzeStructure(labels.limit(0), es.limit(0)).collect().head
    assert(empty.getAs[Long]("total_communities") == 0L && empty.getAs[Double]("modularity") == 0.0)
  }

  test("local moving never decreases tracked modularity vs singletons") {
    val es = (clique(Seq(1L, 2L, 3L)) ++ clique(Seq(4L, 5L, 6L)) :+ (3L, 4L)).toDF("src", "dst")
    val (_, q) = Louvain.localMove(es)
    // singleton modularity is negative; any real clustering beats it
    assert(q > 0.0)
  }

  test("ring of triangles: contraction level merges triangles, not the ring") {
    // 3 triangles {1,2,3} {4,5,6} {7,8,9} ring-connected 3–4, 6–7, 9–1
    val es = (clique(Seq(1L, 2L, 3L)) ++ clique(Seq(4L, 5L, 6L)) ++ clique(Seq(7L, 8L, 9L)) ++
      Seq((3L, 4L), (6L, 7L), (9L, 1L))).toDF("src", "dst")
    val got = Louvain
      .cluster(es)
      .collect()
      .map(r => r.getString(0).toLong -> r.getString(1))
      .toMap
    assert(got(1L) == got(2L) && got(2L) == got(3L))
    assert(got(4L) == got(5L) && got(5L) == got(6L))
    assert(got(7L) == got(8L) && got(8L) == got(9L))
    assert(Set(got(1L), got(4L), got(7L)).size == 3)
  }

  test("weighted edges steer membership: heavy bridge absorbs the endpoint") {
    // path 1–2 (w=1), 2–3 (w=10): 2 and 3 bind; 1 stays out at best split
    val es = Seq((1L, 2L, 1.0), (2L, 3L, 10.0)).toDF("src", "dst", "weight")
    val labels = Louvain.cluster(es).collect().map(r => r.getString(0).toLong -> r.getString(1)).toMap
    assert(labels(2L) == labels(3L), "heavy edge keeps 2,3 together")
  }

  test("deterministic across runs") {
    val es = (clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(5L, 6L, 7L, 8L)) :+ (4L, 5L)).toDF("src", "dst")
    val a = Louvain.cluster(es).orderBy("node").collect().toSeq
    val b = Louvain.cluster(es).orderBy("node").collect().toSeq
    assert(a == b)
  }
}
