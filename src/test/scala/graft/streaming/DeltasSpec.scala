package graft.streaming

import java.nio.file.Files

import graft.{GraphitiSpark, TestSpark}
import graft.kg.{Fixtures, Ids}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Delta operation log: create/validate/apply/rollback/merge/chunked
  * application (incremental_updater.py:38-91, 390-585, 805-1020).
  */
class DeltasSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(): GraphitiSpark = {
    val g = new GraphitiSpark(spark, Files.createTempDirectory("gdeltas").toString)
    g.addEpisodeBulk(Fixtures.pagesDf(), "fixture-v1")
    g
  }

  private val emptyOps = Seq.empty[(String, String)].toDF("op", "entity_type")

  test("apply mutates the graph; rollback republishes every pre-version") {
    val g = fresh()
    val d = g.deltas
    val edgesBefore = g.store.load("edges").collect().map(_.getAs[String]("uuid")).toSet
    val nodesBefore = g.store.load("nodes").count()
    val victim = edgesBefore.toSeq.sorted.head

    val ops = Seq(
      ("add", "node", null, "DeltaNode#1", "a delta-born node"),
      ("add", "edge", null, null, null),
      ("remove", "edge", victim, null, null),
    ).toDF("op", "entity_type", "uuid", "name", "summary")
      .withColumn("source", when(col("op") === "add" && col("entity_type") === "edge", lit("DeltaNode#1")))
      .withColumn("relation", when(col("op") === "add" && col("entity_type") === "edge", lit("linked_to")))
      .withColumn("target", when(col("op") === "add" && col("entity_type") === "edge", lit("NATION_0")))
      .withColumn(
        "valid_at",
        when(col("op") === "add" && col("entity_type") === "edge", lit(Fixtures.ts(1000L))).cast("timestamp"),
      )
    assert(d.createDelta("d1", ops) == 3L)
    assert(d.validateDelta("d1").collect().isEmpty)

    val state = d.applyDelta("d1").collect()(0)
    assert(state.getAs[String]("status") == "applied")
    // node added with its summary patched
    val newNode = g.store.load("nodes").filter(col("name") === "DeltaNode#1").collect()
    assert(newNode.length == 1 && newNode.head.getAs[String]("summary") == "a delta-born node")
    // edge added through the canonical merge; victim removed
    val edgesAfter = g.store.load("edges").collect().map(_.getAs[String]("uuid")).toSet
    assert(!edgesAfter.contains(victim))
    assert(
      g.store.load("edges").filter(col("fact") === "DeltaNode#1 linked_to NATION_0").count() == 1,
    )

    assert(d.rollbackDelta("d1"))
    assert(g.store.load("edges").collect().map(_.getAs[String]("uuid")).toSet == edgesBefore)
    assert(g.store.load("nodes").count() == nodesBefore)
    assert(d.monitorDeltaProgress("d1").collect()(0).getAs[String]("status") == "rolled_back")
  }

  test("validation rejects malformed and missing-target ops without mutating") {
    val g = fresh()
    val d = g.deltas
    val before = g.store.load("edges").count()
    val bad = Seq(
      ("frobnicate", "edge", null), // unknown op
      ("remove", "node", "no-such-uuid"), // missing target
    ).toDF("op", "entity_type", "uuid")
    d.createDelta("bad1", bad)
    val issues = d.validateDelta("bad1").collect()
    assert(issues.length == 2)
    assert(issues.map(_.getAs[String]("issue")).toSet == Set("malformed operation", "remove of missing node"))
    val res = d.applyDelta("bad1").collect()
    assert(res.map(_.getAs[String]("issue")).toSet.nonEmpty)
    assert(d.monitorDeltaProgress("bad1").collect()(0).getAs[String]("status") == "rejected")
    assert(g.store.load("edges").count() == before)
  }

  test("mergeDeltas concatenates; processLargeDelta chunks; stats and clear") {
    val g = fresh()
    val d = g.deltas
    d.createDelta("a", Seq(("add", "node", "MergeNode#1")).toDF("op", "entity_type", "name"))
    d.createDelta("b", Seq(("add", "node", "MergeNode#2")).toDF("op", "entity_type", "name"))
    assert(d.mergeDeltas("ab", "a", "b") == 2L)
    // chunked application: 5 node adds in chunks of 2
    val many = (1 to 5).map(i => ("add", "node", s"ChunkNode#$i")).toDF("op", "entity_type", "name")
    d.createDelta("big", many)
    val st = d.processLargeDelta("big", chunkSize = 2).collect()(0)
    assert(st.getAs[String]("status") == "applied")
    for (i <- 1 to 5)
      assert(g.store.load("nodes").filter(col("name") === s"ChunkNode#$i").count() == 1, s"ChunkNode#$i missing")
    // stats roll up by status; clearing drops the two pending deltas
    val stats = d.getUpdateStatistics.collect().map(r => r.getString(0) -> r.getAs[Long]("deltas")).toMap
    assert(stats.getOrElse("applied", 0L) >= 1L) // big (the one rollback unit)
    assert(stats.getOrElse("chunk", 0L) == 3L) // demoted, not independently rollback-able
    assert(stats.getOrElse("pending", 0L) == 3L) // a, b, ab
    // a demoted chunk refuses individual rollback
    assert(!d.rollbackDelta("big#0"))
    assert(d.clearPendingDeltas() == 3L)
    assert(d.getUpdateStatistics.collect().map(r => r.getString(0)).toSet.contains("cleared"))
    // rollback of the chunked parent restores the pre-chunk state
    assert(d.rollbackDelta("big"))
    assert(g.store.load("nodes").filter(col("name").startsWith("ChunkNode#")).count() == 0)
  }

  test("rollback restores only tables snapshotted at apply time; later unrelated tables survive") {
    val g = fresh()
    val d = g.deltas
    d.createDelta("r1", Seq(("add", "node", "RollNode#1")).toDF("op", "entity_type", "name"))
    d.applyDelta("r1")
    // an unrelated non-delta write AFTER the apply creates a new table —
    // the rollback must not delete it (it has no Prev row)
    g.store.commit(Seq(("x", 1L)).toDF("k", "v"), "unrelated_after", "post-apply table")
    assert(d.rollbackDelta("r1"))
    assert(g.store.exists("unrelated_after"), "tables created after the apply must survive rollback")
    assert(g.store.load("nodes").filter(col("name") === "RollNode#1").count() == 0)
  }

  test("duplicate summary ops on one entity collapse to the last (no duplicate node rows)") {
    val g = fresh()
    val d = g.deltas
    val ops = Seq(
      (1, "add", "node", "DupNode#1", "first summary"),
      (2, "update", "node", "DupNode#1", "second summary"),
    ).toDF("seq", "op", "entity_type", "name", "summary")
    d.createDelta("dup1", ops)
    d.applyDelta("dup1")
    val rows = g.store.load("nodes").filter(col("name") === "DupNode#1").collect()
    assert(rows.length == 1, s"exactly one node row, got ${rows.length}")
    assert(rows.head.getAs[String]("summary") == "second summary", "last op by seq wins")
  }

  test("re-registering a delta id purges the prior incarnation's ops") {
    val g = fresh()
    val d = g.deltas
    d.createDelta("ghost", (1 to 4).map(i => ("add", "node", s"GhostNode#$i")).toDF("op", "entity_type", "name"))
    // re-register with FEWER ops: the old higher-seq rows must vanish
    assert(d.createDelta("ghost", Seq(("add", "node", "GhostNode#9")).toDF("op", "entity_type", "name")) == 1L)
    d.applyDelta("ghost")
    assert(g.store.load("nodes").filter(col("name") === "GhostNode#9").count() == 1)
    assert(
      g.store.load("nodes").filter(col("name").startsWith("GhostNode#") && col("name") =!= "GhostNode#9").count() == 0,
      "ghost ops from the first incarnation must not apply",
    )
  }

  test("parallelDeltaApplication returns uniform state rows even when one delta is rejected") {
    val g = fresh()
    val d = g.deltas
    d.createDelta("ok1", Seq(("add", "node", "ParNode#1")).toDF("op", "entity_type", "name"))
    d.createDelta("bad2", Seq(("remove", "node", "no-such-uuid")).toDF("op", "entity_type", "uuid"))
    d.createDelta("ok3", Seq(("add", "node", "ParNode#3")).toDF("op", "entity_type", "name"))
    val res = d.parallelDeltaApplication(Seq("ok1", "bad2", "ok3")).collect()
    val byId = res.map(r => r.getAs[String]("delta_id") -> r.getAs[String]("status")).toMap
    assert(byId == Map("ok1" -> "applied", "bad2" -> "rejected", "ok3" -> "applied"))
    assert(g.store.load("nodes").filter(col("name").isin("ParNode#1", "ParNode#3")).count() == 2)
  }

  test("bulk upserts: entities insert-if-absent, edges adopt on re-assert") {
    val g = fresh()
    val nodesBefore = g.store.load("nodes").count()
    assert(g.bulkUpsertEntities(Seq("UpsertA", "UpsertB")) == 2L)
    assert(g.bulkUpsertEntities(Seq("UpsertA", "UpsertC")) == 1L) // A already present
    assert(g.store.load("nodes").count() == nodesBefore + 3)
    g.bulkUpsertEdges(Seq(("UpsertA", "knows", "UpsertB")), Fixtures.ts(2000L))
    val e = g.store.load("edges").filter(col("fact") === "UpsertA knows UpsertB").collect()
    assert(e.length == 1)
    // re-assert later: adopts (keeps original valid_at), no duplicate row
    g.bulkUpsertEdges(Seq(("UpsertA", "knows", "UpsertB")), Fixtures.ts(9000L))
    val e2 = g.store.load("edges").filter(col("fact") === "UpsertA knows UpsertB").collect()
    assert(e2.length == 1)
    assert(e2.head.getAs[java.sql.Timestamp]("valid_at") == Fixtures.ts(2000L))
  }

  test("deleteEdgesByUuids keeps siblings and refreshes indexes") {
    val g = fresh()
    g.buildSearchIndexes()
    val grp = g.store
      .load("edges")
      .groupBy(col("group_id"), col("source_uuid"), col("name"))
      .agg(count(lit(1)).as("n"), min(col("uuid")).as("victim"))
      .filter(col("n") >= 2)
      .orderBy(col("victim"))
      .limit(1)
      .collect()(0)
    val victim = grp.getAs[String]("victim")
    val removed = g.deleteEdgesByUuids(Seq(victim))
    assert(removed == 1L)
    assert(g.store.load("edges").filter(col("uuid") === victim).count() == 0)
    // siblings of the contention group survived
    assert(
      g.store
        .load("edges")
        .filter(col("source_uuid") === grp.getAs[String]("source_uuid") && col("name") === grp.getAs[String]("name"))
        .count() == grp.getAs[Long]("n") - 1,
    )
    // the keyword index no longer returns the removed edge
    val postings = graft.search.SearchIndexes
      .postingsForTerms(
        g.store, "edges",
        Seq.tabulate(1)(_ => "lives").toDF("term"),
      )
    assert(postings.filter(col("id") === victim).count() == 0)
  }
}
