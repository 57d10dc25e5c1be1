package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.TestSpark
import graft.io.SnapshotStore
import graft.kg.KgPipeline
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Re-ingesting a page whose content CHANGED must behave like the page
  * update it is: retracted facts leave the graph (re-derived exactly from
  * their remaining supporters), mention counts replace (never double),
  * stale MENTIONS rows and raw triples are deleted, and every supporting
  * episode's entity_edges list follows edge-uuid changes. The oracle is a
  * bulk rebuild over the FINAL corpus — incremental history must converge
  * to it wherever re-ingest introduces no adoption (kept-history) effects.
  */
class ReIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: Long) = new Timestamp((1704067200L + s) * 1000L)

  private def pagesDf(rows: Seq[(String, Long, String)]): DataFrame = {
    import spark.implicits._
    rows
      .map { case (url, off, body) =>
        val html = s"<html><head><title>t</title></head><body><p>$body</p></body></html>".getBytes("UTF-8")
        (url, ts(off), html, null.asInstanceOf[String], "en")
      }
      .toDF("url", "warc_ts", "html", "text", "lang")
  }

  private val A = "https://r.example/a"
  private val B = "https://r.example/b"
  private val aV1 = (A, 100L,
    "Customer#000000001 lives in NATION_0. Customer#000000001 works at Supplier#000000001. " +
      "Customer#000000009 works at Supplier#000000009.")
  private val bV1 = (B, 200L,
    "Customer#000000002 lives in NATION_0. Customer#000000001 works at Supplier#000000001.")
  private val aV2 = (A, 300L, "Customer#000000001 lives in NATION_1.")

  private def edgesKey(store: SnapshotStore) =
    store
      .load("edges")
      .select("source_uuid", "name", "target_uuid", "valid_at", "invalid_at", "episodes", "uuid")
      .collect()
      .map(_.toString)
      .toSet

  private def mentionKey(store: SnapshotStore) =
    store.load("episodic_edges").select("episode_uuid", "entity_uuid").collect().map(_.toString).toSet

  private def rawKey(store: SnapshotStore) =
    store.load("raw_triples").select("url", "subj", "pred", "obj").collect().map(_.toString).toSet

  private def nodeCounts(store: SnapshotStore) =
    store
      .load("nodes")
      .select(col("name"), element_at(col("attributes"), "mention_count").as("mc"))
      .collect()
      .map(r => r.getString(0) -> r.getString(1))
      .toMap

  private def entityEdges(store: SnapshotStore) =
    store
      .load("episode_entity_edges")
      .select(col("uuid"), col("entity_edges"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toSet)
      .toMap

  test("changed page re-ingest converges to a bulk rebuild over the final corpus") {
    val inc = new SnapshotStore(spark, Files.createTempDirectory("ri1").toString)
    IncrementalIngest.ingestBatch(inc, pagesDf(Seq(aV1, bV1)), 0L)
    graft.search.SearchIndexes.build(inc)
    IncrementalIngest.ingestBatch(inc, pagesDf(Seq(aV2)), 1L)

    val bulk = new SnapshotStore(spark, Files.createTempDirectory("ri2").toString)
    new KgPipeline(bulk).run(pagesDf(Seq(aV2, bV1)), "all")

    assert(rawKey(inc) == rawKey(bulk), "raw_triples kept stale facts of the replaced page")
    // exact valid_at re-derivation: (C1 works_at S1) was first asserted by
    // A v1 at t=100; with A's assertion retracted it must re-derive to
    // B's t=200 — which is also what the bulk rebuild computes
    assert(edgesKey(inc) == edgesKey(bulk), "edges diverged from the final-corpus rebuild")
    assert(
      inc.load("edges").filter(col("name") === "works_at").select("valid_at").collect().map(_.getTimestamp(0)).toSeq
        == Seq(ts(200)),
    )
    assert(mentionKey(inc) == mentionKey(bulk), "stale MENTIONS rows survived the re-ingest")
    // nodes: presence + mention counts (created_at keeps the earliest-ever
    // assertion by design — the reference's immutable created_at — so it
    // is deliberately NOT compared against the history-blind bulk rebuild)
    assert(nodeCounts(inc) == nodeCounts(bulk), "mention counts double-counted or kept retracted mentions")
    assert(!nodeCounts(inc).contains("Customer#000000009") && !nodeCounts(inc).contains("Supplier#000000009"))
    // every supporting episode's entity_edges followed the uuid changes —
    // including NON-batch episode B, whose works_at edge got a new uuid
    assert(entityEdges(inc) == entityEdges(bulk), "entity_edges lists did not follow edge-uuid changes")
    // the graph/temporal indexes track the live edges through retraction
    val e = inc.load("edges").select(col("source_uuid").as("src"), col("target_uuid").as("dst"))
    val expectedAdj = e
      .unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      .groupBy("src", "dst").agg(count(lit(1)).as("cnt"))
      .collect().map(_.toString).toSet
    val gotAdj = graft.search.SearchIndexes.adjacency(inc).collect().map(_.toString).toSet
    assert(gotAdj == expectedAdj, "graph_adj kept retracted pairs")

    // idempotence: re-ingesting the identical content must change nothing
    val before = (rawKey(inc), edgesKey(inc), mentionKey(inc), nodeCounts(inc), entityEdges(inc))
    IncrementalIngest.ingestBatch(inc, pagesDf(Seq(aV2)), 2L)
    val after = (rawKey(inc), edgesKey(inc), mentionKey(inc), nodeCounts(inc), entityEdges(inc))
    assert(after == before, "re-ingesting identical content was not idempotent")
  }

  test("a re-asserted fact keeps its original valid_at (adoption semantics)") {
    val inc = new SnapshotStore(spark, Files.createTempDirectory("ri3").toString)
    IncrementalIngest.ingestBatch(inc, pagesDf(Seq(aV1)), 0L)
    val aV2adopt = (A, 300L, "Customer#000000001 lives in NATION_1. Customer#000000001 works at Supplier#000000001.")
    IncrementalIngest.ingestBatch(inc, pagesDf(Seq(aV2adopt)), 1L)
    // (C1 works_at S1) is still asserted → the existing edge is adopted:
    // valid_at stays the FIRST assertion time (resolve_extracted_edge,
    // edge_operations.py:414-535), unlike the retraction path
    val row = inc
      .load("edges")
      .filter(col("name") === "works_at")
      .filter(array_contains(col("episodes"), graft.kg.Ids.episode("default", A)))
      .collect()
    assert(row.length == 1)
    assert(row(0).getAs[Timestamp]("valid_at") == ts(100))
  }
}
