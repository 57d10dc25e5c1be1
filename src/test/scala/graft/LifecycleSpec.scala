package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.io.SnapshotStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Temporal lifecycle operators: conflict-resolution strategies
  * (temporal_manager.py:530-618, _merge_temporal_records :1447-1465) and
  * age-based auto cleanup (:1227-1322).
  */
class LifecycleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: Long) = new Timestamp(s * 1000L)

  /** Store with 3 conflicting records of one logical edge + 1 singleton. */
  private def freshStore(): GraphitiSpark = {
    import spark.implicits._
    val g = new GraphitiSpark(spark, Files.createTempDirectory("lifecycle").toString)
    val edges = Seq(
      // conflicting group: same (group_id, src, name, dst), 3 validity records
      ("e1", "default", "sA", "lives_in", "tB", ts(100), Some(ts(200)), Option.empty[Timestamp]),
      ("e2", "default", "sA", "lives_in", "tB", ts(200), Some(ts(300)), Option.empty[Timestamp]),
      ("e3", "default", "sA", "lives_in", "tB", ts(300), Option.empty[Timestamp], Option.empty[Timestamp]),
      // singleton: no conflict, must be untouched by every strategy
      ("e4", "default", "sC", "lives_in", "tD", ts(150), Some(ts(400)), Option.empty[Timestamp]),
    ).toDF("uuid", "group_id", "source_uuid", "name", "target_uuid", "valid_at", "invalid_at", "expired_at")
    g.store.commit(edges, "edges", "fixture")
    g
  }

  test("first_wins expires all but the earliest record of a conflicting group") {
    val g = freshStore()
    val now = ts(1000)
    g.resolveConflicts("first_wins", now)
    val rows = g.store.load("edges").collect().map(r => r.getAs[String]("uuid") -> r.getAs[Timestamp]("expired_at")).toMap
    assert(rows("e1") == null)
    assert(rows("e2") == now && rows("e3") == now)
    assert(rows("e4") == null, "singleton group must be untouched")
  }

  test("last_wins expires all but the latest record") {
    val g = freshStore()
    val now = ts(1000)
    g.resolveConflicts("last_wins", now)
    val rows = g.store.load("edges").collect().map(r => r.getAs[String]("uuid") -> r.getAs[Timestamp]("expired_at")).toMap
    assert(rows("e3") == null)
    assert(rows("e1") == now && rows("e2") == now)
    assert(rows("e4") == null)
  }

  test("merge collapses a conflicting group to one record spanning the union") {
    val g = freshStore()
    g.resolveConflicts("merge", ts(1000))
    val rows = g.store.load("edges").collect()
    assert(rows.length == 2, s"3 conflicting records collapse to 1, singleton kept: ${rows.toSeq}")
    val merged = rows.find(_.getAs[String]("uuid") == "e1").get
    assert(merged.getAs[Timestamp]("valid_at") == ts(100))
    // max non-null invalid_at (the reference's max(..., default=None) —
    // open records don't reopen the merged interval unless ALL are open)
    assert(merged.getAs[Timestamp]("invalid_at") == ts(300))
    val single = rows.find(_.getAs[String]("uuid") == "e4").get
    assert(single.getAs[Timestamp]("invalid_at") == ts(400))
  }

  test("merge keeps the interval open when every record is open") {
    import spark.implicits._
    val g = new GraphitiSpark(spark, Files.createTempDirectory("lifecycle2").toString)
    val edges = Seq(
      ("e1", "default", "sA", "lives_in", "tB", ts(100), Option.empty[Timestamp], Option.empty[Timestamp]),
      ("e2", "default", "sA", "lives_in", "tB", ts(200), Option.empty[Timestamp], Option.empty[Timestamp]),
    ).toDF("uuid", "group_id", "source_uuid", "name", "target_uuid", "valid_at", "invalid_at", "expired_at")
    g.store.commit(edges, "edges", "fixture")
    g.resolveConflicts("merge", ts(1000))
    val rows = g.store.load("edges").collect()
    assert(rows.length == 1 && rows(0).getAs[Timestamp]("invalid_at") == null)
  }

  test("invalidate expires every record of a conflicting group; unknown strategy rejected") {
    val g = freshStore()
    val now = ts(1000)
    g.resolveConflicts("invalidate", now)
    val rows = g.store.load("edges").collect().map(r => r.getAs[String]("uuid") -> r.getAs[Timestamp]("expired_at")).toMap
    assert(rows("e1") == now && rows("e2") == now && rows("e3") == now)
    assert(rows("e4") == null)
    intercept[IllegalArgumentException] { g.resolveConflicts("majority_vote", now) }
  }

  test("setValidityPeriod rewrites the interval; getValidAt honors it (temporal_manager.py:137-189,288-318)") {
    val g = freshStore()
    // e4 starts [150, 400); move it to [120, 250)
    g.setValidityPeriod("e4", ts(120), Some(ts(250)))
    val row = g.store.load("edges").filter(col("uuid") === "e4").collect().head
    assert(row.getAs[Timestamp]("valid_at") == ts(120))
    assert(row.getAs[Timestamp]("invalid_at") == ts(250))
    assert(row.getAs[Timestamp]("manual_invalid_at") == ts(250)) // durable across rebuilds
    // point queries: inside → the row; before start / after end → None
    assert(g.getValidAt("e4", ts(200)).exists(_.getAs[String]("uuid") == "e4"))
    assert(g.getValidAt("e4", ts(100)).isEmpty)
    assert(g.getValidAt("e4", ts(250)).isEmpty) // end-exclusive
    // open-ended: no validTo leaves invalid_at untouched
    g.setValidityPeriod("e3", ts(290))
    val e3 = g.store.load("edges").filter(col("uuid") === "e3").collect().head
    assert(e3.getAs[Timestamp]("valid_at") == ts(290) && e3.getAs[Timestamp]("invalid_at") == null)
    // other rows untouched
    assert(g.store.load("edges").filter(col("uuid") === "e1").collect().head.getAs[Timestamp]("valid_at") == ts(100))
  }

  test("cleanupAged soft archives in place; hard deletes; records newer than cutoff kept") {
    val g = freshStore()
    val archived = g.cleanupAged("soft", ts(250)) // e1 (invalid_at 200) is old
    assert(archived == 1L)
    val soft = g.store.load("edges")
    assert(soft.filter(col("archived")).collect().map(_.getAs[String]("uuid")).toSeq == Seq("e1"))
    assert(soft.count() == 4, "soft cleanup keeps rows queryable")

    val removed = g.cleanupAged("hard", ts(350)) // e1, e2 now older than cutoff
    assert(removed == 2L)
    val kept = g.store.load("edges").collect().map(_.getAs[String]("uuid")).toSet
    assert(kept == Set("e3", "e4"))
    intercept[IllegalArgumentException] { g.cleanupAged("medium", ts(0)) }
  }
}
