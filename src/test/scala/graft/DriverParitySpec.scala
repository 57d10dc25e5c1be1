package graft

import java.nio.file.Files

import graft.kg.{Fixtures, Ids}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Driver-surface parity: point lookups, by-embedding vector queries
  * (single + batch, ANN-indexed edges), and the traversal facade
  * (huggingface_driver.py:512-1077).
  */
class DriverParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val g: GraphitiSpark = {
    val x = new GraphitiSpark(spark, Files.createTempDirectory("gparity").toString)
    x.addEpisodeBulk(Fixtures.pagesDf(), "fixture-v1")
    x
  }

  test("getNodeByUuid / getEdgeByUuid: hit returns the row, miss is None") {
    val n = g.store.load("nodes").orderBy(col("uuid")).limit(1).collect()(0)
    assert(g.getNodeByUuid(n.getAs[String]("uuid")).map(_.getAs[String]("name")) == Some(n.getAs[String]("name")))
    assert(g.getNodeByUuid("no-such-uuid").isEmpty)
    val e = g.store.load("edges").orderBy(col("uuid")).limit(1).collect()(0)
    assert(g.getEdgeByUuid(e.getAs[String]("uuid")).map(_.getAs[String]("fact")) == Some(e.getAs[String]("fact")))
    assert(g.getEdgeByUuid("no-such-uuid").isEmpty)
    // episodic flavor routes to the episodes table
    val ep = g.store.load("episodes").orderBy(col("uuid")).limit(1).collect()(0)
    assert(g.getNodeByUuid(ep.getAs[String]("uuid"), "Episodic").isDefined)
  }

  test("getNodesByGroupIds / getEdgesByGroupIds: scoped, deterministic, limited") {
    val all = g.getNodesByGroupIds(Seq("default")).collect()
    assert(all.length == g.store.load("nodes").count())
    assert(all.map(_.getAs[String]("uuid")).toSeq == all.map(_.getAs[String]("uuid")).toSeq.sorted)
    assert(g.getNodesByGroupIds(Seq("other")).count() == 0)
    assert(g.getNodesByGroupIds(Seq("default"), limit = Some(3)).count() == 3)
    assert(g.getEdgesByGroupIds(Seq("default"), limit = Some(3)).count() == 3)
  }

  test("queryNodesByEmbedding: a node's own embedding ranks it first at score 1") {
    val n = g.store.load("nodes").orderBy(col("uuid")).limit(1).collect()(0)
    val v = n.getAs[scala.collection.Seq[Float]]("name_embedding").toArray
    val top = g.queryNodesByEmbedding(v, k = 3).collect()
    assert(top.nonEmpty)
    assert(top.head.getAs[String]("uuid") == n.getAs[String]("uuid"))
    assert(math.abs(top.head.getAs[Double]("score") - 1.0) < 1e-6)
    // threshold above 1 filters everything
    assert(g.queryNodesByEmbedding(v, k = 3, threshold = 1.5).count() == 0)
  }

  test("queryEdgesByEmbedding: ANN-indexed probe returns the edge itself; batch = one job over all vectors") {
    g.buildSearchIndexes()
    assert(g.store.exists("edge_ann"))
    val rows = g.store.load("edges").orderBy(col("uuid")).limit(2).collect()
    val vs = rows.map(_.getAs[scala.collection.Seq[Float]]("fact_embedding").toArray).toSeq
    val single = g.queryEdgesByEmbedding(vs.head, k = 2).collect()
    assert(single.head.getAs[String]("uuid") == rows(0).getAs[String]("uuid"))
    val batch = g.batchQueryEdgesByEmbedding(vs, k = 2).collect()
    // each qid's rank-1 hit is its own edge
    for ((r, i) <- rows.zipWithIndex) {
      val r1 = batch.filter(b => b.getAs[Long]("qid") == i.toLong && b.getAs[Int]("rk") == 1)
      assert(r1.length == 1 && r1.head.getAs[String]("uuid") == r.getAs[String]("uuid"))
    }
    assert(g.vectorSearchStats.collect().map(_.getAs[String]("index")).contains("edge_ann"))
  }

  test("temporal facade wrappers run over the live store") {
    val stats = g.getTemporalStats.collect()(0)
    assert(stats.getAs[Long]("total_records") == g.store.load("edges").count())
    val checks = g.temporalConsistencyCheck().collect().map(_.getString(0)).toSet
    assert(checks == Set("validity_periods", "overlapping_records", "missing_temporal_data"))
    assert(g.temporalOccurrenceDistribution.count() > 0)
    val span = (stats.getAs[java.sql.Timestamp]("span_start"), stats.getAs[java.sql.Timestamp]("span_end"))
    assert(g.temporalRangeQuery(span._1, new java.sql.Timestamp(span._2.getTime + 1000)).count() > 0)
  }

  test("traverseGraph / batchTraversal: multi-origin one-job BFS equals per-origin BFS") {
    val starts = g.store
      .load("edges")
      .orderBy(col("uuid"))
      .limit(2)
      .collect()
      .map(_.getAs[String]("source_uuid"))
      .distinct
      .toSeq
    val multi = g.batchTraversal(starts, maxDepth = 2).collect()
    for (s <- starts) {
      val solo = g
        .traverseGraph(s, maxDepth = 2)
        .collect()
        .map(r => (r.getAs[String]("node"), r.getAs[Int]("dist")))
        .toSet
      val part = multi
        .filter(_.getAs[String]("origin") == s)
        .map(r => (r.getAs[String]("node"), r.getAs[Int]("dist")))
        .toSet
      assert(part == solo, s"batch traversal diverges from single-origin BFS for $s")
    }
  }
}
