package graft.kg

import java.nio.file.Files

import graft.TestSpark
import graft.io.SnapshotStore
import graft.streaming.IncrementalIngest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Group isolation — the reference partitions every node/edge operation by
  * group_id (`huggingface_driver.py:535-554`, `nodes.py:91-97`): the same
  * surface form in two groups must yield two distinct entity nodes, never
  * link across groups, and contradictions in one group must not close
  * facts in another.
  */
class GroupScopingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def page(url: String, off: Long, body: String) = {
    val html = s"<html><body><p>$body</p></body></html>".getBytes("UTF-8")
    (url, Fixtures.ts(off), html, null.asInstanceOf[String], "en")
  }

  private def pagesDf(rows: (String, java.sql.Timestamp, Array[Byte], String, String)*) =
    rows.toDF("url", "warc_ts", "html", "text", "lang")

  test("same surface in two groups: distinct uuids, no cross-group link, no cross-group invalidation") {
    val store = new SnapshotStore(spark, Files.createTempDirectory("ggroups").toString)
    IncrementalIngest.ingestBatch(
      store,
      pagesDf(page("https://a.example/1", 0L, "Acme lives in NATION_0.")),
      batchId = 0L,
      groupId = "tenantA",
    )
    IncrementalIngest.ingestBatch(
      store,
      pagesDf(
        page("https://b.example/1", 60L, "Acme lives in NATION_0."),
        // contradiction INSIDE tenantB only
        page("https://b.example/2", 7200L, "Acme lives in NATION_1."),
      ),
      batchId = 1L,
      groupId = "tenantB",
    )

    // distinct uuids per group for the same surface
    val ua = Ids.entity("tenantA", "Acme")
    val ub = Ids.entity("tenantB", "Acme")
    assert(ua != ub)
    val acmeNodes = store.load("nodes").filter(col("name") === "Acme").collect()
    assert(acmeNodes.map(_.getAs[String]("uuid")).toSet == Set(ua, ub))
    assert(
      acmeNodes.map(r => r.getAs[String]("uuid") -> r.getAs[String]("group_id")).toMap ==
        Map(ua -> "tenantA", ub -> "tenantB"),
    )

    // the linker never pairs across groups (an idle link pass writes no
    // uuid_map at all — absent table ≡ empty map, vacuously no pair)
    val m =
      if (store.exists("uuid_map")) store.load("uuid_map").collect().map(r => (r.getString(0), r.getString(1)))
      else Array.empty[(String, String)]
    assert(!m.exists { case (u, c) => Set(u, c) == Set(ua, ub) })

    // tenantB's contradiction closed only tenantB's fact; tenantA's is open
    val aFacts = store.load("edges").filter(col("group_id") === "tenantA").collect()
    assert(aFacts.length == 1 && aFacts(0).getAs[java.sql.Timestamp]("invalid_at") == null)
    val bFacts = store
      .load("edges")
      .filter(col("group_id") === "tenantB")
      .orderBy(col("valid_at"))
      .collect()
    assert(bFacts.length == 2)
    assert(bFacts(0).getAs[java.sql.Timestamp]("invalid_at") == Fixtures.ts(7200L))
    // every edge endpoint stays inside its own group's uuid space
    assert(aFacts(0).getAs[String]("source_uuid") == ua)
    assert(bFacts.forall(_.getAs[String]("source_uuid") == ub))
  }

  test("bulk pipeline with non-default groupId produces group-scoped uuids end to end") {
    val store = new SnapshotStore(spark, Files.createTempDirectory("ggroupbulk").toString)
    new KgPipeline(store, "tenantX").run(Fixtures.pagesDf(), "fixture-v1")
    // index-1 entity: no alias page (i % 4 != 0), not a mover — its uuid is
    // its own canonical
    val e = f"Customer#${2}%09d"
    val u = Ids.entity("tenantX", e)
    assert(store.load("nodes").filter(col("uuid") === u).count() == 1)
    assert(store.load("nodes").filter(col("group_id") =!= "tenantX").count() == 0)
    assert(store.load("edges").filter(col("source_uuid") === u && col("name") === "lives_in").count() == 1)
    // episode uuids are group-scoped too, and MENTIONS join up
    val ep = Ids.episode("tenantX", "https://t.example/c/1")
    assert(store.load("episodes").filter(col("uuid") === ep).count() == 1)
    assert(
      store
        .load("episodic_edges")
        .filter(col("episode_uuid") === ep && col("entity_uuid") === u)
        .count() == 1,
    )
  }
}
