package graft.kg

import java.nio.file.Files

import graft.TestSpark
import graft.io.SnapshotStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end: fixture corpus → pipeline → canonical triple P/R vs golden,
  * alias canonicalization, contradiction invalidation, point-in-time
  * reads, and stage-level resume from committed snapshots.
  */
class KgPipelineSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def freshStore(): SnapshotStore =
    new SnapshotStore(spark, Files.createTempDirectory("graftkg").toString)

  private def runPipeline(store: SnapshotStore): Unit =
    new KgPipeline(store).run(Fixtures.pagesDf(), "fixture-v1")

  test("triple P/R >= 0.95 vs golden after canonicalization") {
    val store = freshStore()
    runPipeline(store)
    val nodes = store.load("nodes").select(col("uuid"), col("name"))
    val got = store
      .load("edges")
      .join(nodes.withColumnRenamed("uuid", "source_uuid").withColumnRenamed("name", "subj"), Seq("source_uuid"))
      .join(nodes.withColumnRenamed("uuid", "target_uuid").withColumnRenamed("name", "obj"), Seq("target_uuid"))
      .select(col("subj"), col("name"), col("obj"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet
    val gold = Fixtures.goldenTriples
    val tp = (got intersect gold).size.toDouble
    val precision = tp / got.size
    val recall = tp / gold.size
    assert(precision >= 0.95, s"precision $precision, got extra: ${(got diff gold).take(5)}")
    assert(recall >= 0.95, s"recall $recall, missing: ${(gold diff got).take(5)}")
  }

  test("alias surfaces canonicalize to the padded entity (min-uuid component)") {
    val store = freshStore()
    runPipeline(store)
    val m = store.load("uuid_map").collect().map(r => (r.getString(0), r.getString(1))).toMap
    // every mapped uuid's canonical is the lexicographic min of its component
    val comps = m.groupBy(_._2)
    comps.foreach { case (canon, members) =>
      val all = members.keys.toSeq :+ canon
      assert(all.min == canon, s"canonical $canon is not min of $all")
    }
    // alias Customer#1 and Customer#000000001 share a component
    val u1 = Ids.entity("default", "Customer#000000001")
    val u2 = Ids.entity("default", "Customer#1")
    assert(m.getOrElse(u1, u1) == m.getOrElse(u2, u2))
  }

  test("contradiction invalidation + point-in-time read") {
    val store = freshStore()
    runPipeline(store)
    val e2 = f"Customer#${3}%09d" // ents(2) — the index-2 mover
    val edges = store
      .load("edges")
      .filter(col("name") === "lives_in")
      .filter(col("source_uuid") === Ids.entity("default", e2))
      .orderBy(col("valid_at"))
      .collect()
    assert(edges.length == 2, s"expected 2 lives_in facts for $e2, got ${edges.length}")
    val first = edges(0)
    val second = edges(1)
    assert(first.getAs[java.sql.Timestamp]("invalid_at") == second.getAs[java.sql.Timestamp]("valid_at"))
    assert(second.getAs[java.sql.Timestamp]("invalid_at") == null)
    // point-in-time: before the move only the first fact is valid
    val mid = Fixtures.ts(43200L)
    val validMid = Invalidation
      .validAt(store.load("edges").filter(col("source_uuid") === Ids.entity("default", e2) && col("name") === "lives_in"), mid)
      .collect()
    assert(validMid.length == 1 && validMid(0).getAs[java.sql.Timestamp]("valid_at") == first.getAs[java.sql.Timestamp]("valid_at"))
  }

  test("identity-prebuild + patch equals a full remap-then-rebuild edge set") {
    // the fixture corpus HAS duplicate surfaces (padded/unpadded aliases),
    // so stage 6's affected-group patch path is exercised; its output must
    // be row-identical to the naive order (remap everything, then dedupe +
    // invalidate once)
    val store = freshStore()
    runPipeline(store)
    val t = store.load("raw_triples")
    val m = store.load("uuid_map")
    val raw = t.select(
      md5(concat(lit("en|default|"), col("subj"))).as("source_uuid"),
      col("pred").as("name"),
      md5(concat(lit("en|default|"), col("obj"))).as("target_uuid"),
      col("fact"),
      lit("default").as("group_id"),
      col("warc_ts").as("valid_at"),
      col("warc_ts").as("created_at"),
      array(md5(concat(lit("ep|default|"), col("url")))).as("episodes"),
    )
    val expected = Invalidation
      .dedupeAndInvalidate(Linking.remapPointers(raw, m))
      .select(
        col("group_id"), col("source_uuid"), col("name"), col("target_uuid"),
        col("valid_at"), col("invalid_at"), col("expired_at"),
        col("episodes"),
      )
      .collect()
      .map(_.toString)
      .sorted
    val got = store
      .load("edges")
      .select(
        col("group_id"), col("source_uuid"), col("name"), col("target_uuid"),
        col("valid_at"), col("invalid_at"), col("expired_at"),
        col("episodes"),
      )
      .collect()
      .map(_.toString)
      .sorted
    assert(got.length == expected.length, s"row count ${got.length} vs ${expected.length}")
    assert(got.sameElements(expected))
  }

  test("re-run resumes: no stage recommits when fingerprints match") {
    val store = freshStore()
    runPipeline(store)
    val versionsBefore = Seq("episodes", "raw_triples", "nodes_raw", "uuid_map", "nodes", "edges")
      .map(t => t -> store.currentVersion(t))
    runPipeline(store) // same input fingerprint → all stages skipped
    val versionsAfter = Seq("episodes", "raw_triples", "nodes_raw", "uuid_map", "nodes", "edges")
      .map(t => t -> store.currentVersion(t))
    assert(versionsBefore == versionsAfter)
  }

  test("partial run resumes from the last committed stage") {
    val store = freshStore()
    // simulate a crash after stage 2 by running a pipeline that only has
    // stages 1-2 committed: run full pipeline against a store where we
    // pre-commit episodes+raw_triples with matching fingerprints
    val full = freshStore()
    runPipeline(full)
    // copy first two stage snapshots into the fresh store
    Seq("episodes", "raw_triples").foreach { t =>
      val fpJson = full.commitInfo(t, full.currentVersion(t).get)
      val fp = "\"fingerprint\":\"([0-9a-f]+)\"".r.findFirstMatchIn(fpJson).get.group(1)
      store.commit(full.load(t), t, s"copied $t", fp)
    }
    runPipeline(store) // must not recommit episodes/raw_triples (v stays 0)
    assert(store.currentVersion("episodes").contains(0))
    assert(store.currentVersion("raw_triples").contains(0))
    assert(store.exists("edges")) // later stages completed
  }

  test("resume between the overlapped stages: episodes committed, triples not") {
    // stages 1+2 run as concurrent jobs off one in-memory frame; a crash
    // between their commits leaves episodes committed but raw_triples
    // missing — extraction must then read the committed snapshot back
    val store = freshStore()
    val full = freshStore()
    runPipeline(full)
    val fpJson = full.commitInfo("episodes", full.currentVersion("episodes").get)
    val fp = "\"fingerprint\":\"([0-9a-f]+)\"".r.findFirstMatchIn(fpJson).get.group(1)
    store.commit(full.load("episodes"), "episodes", "copied episodes", fp)
    runPipeline(store)
    assert(store.currentVersion("episodes").contains(0)) // not recommitted
    assert(store.load("raw_triples").count() == full.load("raw_triples").count())
    assert(store.load("edges").count() == full.load("edges").count())
  }

  test("rollback re-points to an older snapshot") {
    val store = freshStore()
    runPipeline(store)
    import spark.implicits._
    val v0 = store.currentVersion("edges").get
    val n0 = store.load("edges").count()
    store.commit(store.load("edges").limit(1), "edges", "truncate (simulated bad write)")
    assert(store.load("edges").count() == 1)
    store.rollback("edges", v0)
    assert(store.load("edges").count() == n0)
  }

  test("per-partition lineage metrics recorded with each commit") {
    val store = freshStore()
    runPipeline(store)
    val info = store.commitInfo("edges", store.currentVersion("edges").get)
    assert(info.contains("\"partition_rows\""))
    assert(info.contains("\"rows\""))
  }
}
