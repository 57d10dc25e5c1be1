package graft

import java.nio.file.Files

import graft.community.Communities
import graft.kg.{Embedder, Fixtures}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Entity-level temporal versioning (temporal_versioning,
  * temporal_manager.py:1324-1410) and community embedding search
  * (query_communities_by_embedding, huggingface_driver.py:696-720).
  */
class VersioningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val g: GraphitiSpark = {
    val x = new GraphitiSpark(spark, Files.createTempDirectory("gver").toString)
    x.addEpisodeBulk(Fixtures.pagesDf(), "fixture-v1")
    Communities.build(x.store)
    x
  }

  test("createEntityVersion / listEntityVersions / restoreEntityVersion round-trip") {
    val node = g.store.load("nodes").orderBy(col("uuid")).limit(1).collect()(0)
    val uuid = node.getAs[String]("uuid")
    val origSummary = node.getAs[String]("summary")

    assert(g.createEntityVersion(uuid, Fixtures.ts(1000L)) === Some(1L))
    assert(g.createEntityVersion(uuid, Fixtures.ts(2000L)) === Some(2L))
    val versions = g.listEntityVersions(uuid).collect()
    assert(versions.map(_.getAs[Long]("version")).toSeq == Seq(1L, 2L))
    assert(versions.forall(_.getAs[String]("summary") == origSummary))

    // mutate the live node (what a later ingest's stats refresh would do),
    // then restore v1 — name/labels/summary/attributes roll back
    val mutated = g.store
      .load("nodes")
      .filter(col("uuid") === uuid)
      .withColumn("summary", lit("MUTATED"))
    g.store.mergeBucketed("nodes", mutated, Seq("uuid"), "test mutation")
    assert(
      g.store.load("nodes").filter(col("uuid") === uuid).collect()(0).getAs[String]("summary") == "MUTATED",
    )
    assert(g.restoreEntityVersion(uuid, 1L))
    val after = g.store.load("nodes").filter(col("uuid") === uuid).collect()(0)
    assert(after.getAs[String]("summary") == origSummary)
    // created_at immutable across restore
    assert(after.getAs[java.sql.Timestamp]("created_at") == node.getAs[java.sql.Timestamp]("created_at"))
  }

  test("versioning of a missing entity / missing version fails cleanly") {
    assert(g.createEntityVersion("no-such-uuid", Fixtures.ts(0L)).isEmpty)
    assert(g.listEntityVersions("no-such-uuid").collect().isEmpty)
    assert(!g.restoreEntityVersion("no-such-uuid", 1L))
    val uuid = g.store.load("nodes").orderBy(col("uuid")).limit(1).collect()(0).getAs[String]("uuid")
    assert(!g.restoreEntityVersion(uuid, 99L))
  }

  test("temporalSearch: range + substring match, edges via month probe, nodes via created_at") {
    // fixture window: all facts live in Jan 2024 (Epoch 2024-01-01)
    val from = Fixtures.ts(0L)
    val to = Fixtures.ts(10 * 86400L)
    val hits = g.temporalSearch("lives in", Some(from), Some(to), limit = 5).collect()
    assert(hits.nonEmpty && hits.length <= 5)
    assert(hits.forall(_.getAs[String]("fact").toLowerCase.contains("lives in")))
    val ts = hits.map(_.getAs[java.sql.Timestamp]("valid_at").getTime)
    assert(ts.forall(t => t >= from.getTime && t < to.getTime))
    assert(ts.toSeq == ts.toSeq.sorted)
    // no match outside the range
    assert(g.temporalSearch("lives in", Some(Fixtures.ts(-86400L)), Some(from)).collect().isEmpty)
    // open start bound falls back to a direct filter
    assert(g.temporalSearch("lives in", None, Some(to), limit = 5).collect().nonEmpty)
    // node flavor matches names by substring on created_at window
    val nodes = g.temporalSearch("customer", Some(from), Some(to), limit = 5, entityType = "node").collect()
    assert(nodes.nonEmpty && nodes.forall(_.getAs[String]("name").toLowerCase.contains("customer")))
  }

  test("communitiesByEmbedding ranks the matching community first and respects k / minScore") {
    val target = g.store.load("communities").orderBy(col("uuid")).limit(1).collect()(0)
    val q = Embedder.embed(target.getAs[String]("summary"))
    val hits = g.communitiesByEmbedding(q, k = 3).collect()
    assert(hits.nonEmpty && hits.length <= 3)
    assert(hits.head.getAs[String]("uuid") == target.getAs[String]("uuid"))
    assert(hits.head.getAs[Double]("score") > 0.999)
    // scores ordered descending
    val scores = hits.map(_.getAs[Double]("score")).toSeq
    assert(scores == scores.sorted.reverse)
    // an impossible threshold returns nothing
    assert(g.communitiesByEmbedding(q, k = 3, minScore = 1.5).collect().isEmpty)
  }
}
