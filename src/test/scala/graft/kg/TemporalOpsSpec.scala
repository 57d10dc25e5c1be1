package graft.kg

import java.nio.file.Files
import java.sql.Timestamp

import graft.TestSpark
import graft.io.SnapshotStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-violation fixture for the temporal analysis surface
  * (TemporalOps): every check/anomaly/duplicate below is seeded exactly
  * once, so each count is asserted, not sampled.
  */
class TemporalOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def t(h: Double) = new Timestamp(Fixtures.Epoch * 1000L + (h * 3600L * 1000L).toLong)

  private def edge(
      uuid: String,
      src: String,
      rel: String,
      dst: String,
      createdH: Double,
      validH: Option[Double],
      invalidH: Option[Double] = None,
  ): EntityEdge =
    EntityEdge(
      uuid = uuid,
      source_uuid = src,
      target_uuid = dst,
      name = rel,
      fact = s"$src $rel $dst",
      group_id = "g",
      created_at = t(createdH),
      fact_embedding = Seq(1f, 0f),
      episodes = Seq("ep1"),
      expired_at = None,
      valid_at = validH.map(t),
      invalid_at = invalidH.map(t),
      manual_invalid_at = None,
    )

  private lazy val store: SnapshotStore = {
    val s = new SnapshotStore(spark, Files.createTempDirectory("temporalops").toString)
    import spark.implicits._
    val rows =
      Seq(
        // overlap: e1 closed at 10h but e2 starts at 5h
        edge("e1", "A", "rel", "B", 0, Some(0), Some(10)),
        edge("e2", "A", "rel", "C", 0, Some(5)),
        // gap: e3 starts 100 days after e2
        edge("e3", "A", "rel", "D", 0, Some(100 * 24.0)),
        // inverted interval (validity_periods + inconsistencies)
        edge("e4", "D", "rel", "B", 0, Some(20), Some(20)),
        // missing valid_at
        edge("e5", "E", "rel", "B", 0, None),
        // duplicates in (A, rel2, B): d1/d2 within 24h of group max; d2 has
        // the latest created_at and is kept; d0 is 40h before the max
        edge("d0", "A", "rel2", "B", 1, Some(10)),
        edge("d1", "A", "rel2", "B", 1, Some(50)),
        edge("d2", "A", "rel2", "B", 2, Some(50.5)),
      ) ++
        // outlier group: 10 records at 0h, one at 11h → pop z-score 3.16
        (0 until 10).map(i => edge(s"c$i", "C", "rel3", s"T$i", 0, Some(0))) :+
        edge("cx", "C", "rel3", "TX", 0, Some(11))
    s.commit(rows.toDS().toDF(), "edges", "temporal fixture")
    s
  }

  test("consistencyCheck counts every planted violation once") {
    val got = TemporalOps
      .consistencyCheck(store, Seq("validity_periods", "overlapping_records", "missing_temporal_data", "temporal_gaps"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(
      got == Map(
        "validity_periods" -> 1L, // e4
        "overlapping_records" -> 1L, // e1 overlapped by e2
        "missing_temporal_data" -> 1L, // e5
        "temporal_gaps" -> 1L, // e2 → e3
      ),
    )
  }

  test("detectAnomalies labels the planted rows by type") {
    val got = TemporalOps
      .detectAnomalies(store)
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSet
    assert(got == Set(("gaps", "e2"), ("overlaps", "e1"), ("inconsistencies", "e4"), ("outliers", "cx")))
  }

  test("duplicateTemporalUuids keeps the latest-created record per window") {
    val dups = TemporalOps.duplicateTemporalUuids(store, windowHours = 24).collect().map(_.getString(0)).toSet
    assert(dups == Set("d1")) // d2 kept (latest created_at); d0 outside the 24h window
  }

  test("duplicateTemporalNodeUuids: within-window same-name duplicates, latest kept") {
    import spark.implicits._
    val s = new SnapshotStore(spark, Files.createTempDirectory("temporalops-nodes").toString)
    val nodes = Seq(
      // (g, Alice): n1/n2 within 24h of cluster max — n2 (latest) kept;
      // n0 is 40h before the max → outside the window, untouched
      ("n0", "g", "Alice", t(0)),
      ("n1", "g", "Alice", t(39)),
      ("n2", "g", "Alice", t(40)),
      // other name: singleton, untouched
      ("n3", "g", "Bob", t(40)),
      // same name, OTHER group: singleton, untouched (clusters are scoped)
      ("n4", "h", "Alice", t(40)),
    ).toDF("uuid", "group_id", "name", "created_at")
    s.commit(nodes, "nodes", "node dedup fixture")
    val dups = TemporalOps.duplicateTemporalNodeUuids(s, windowHours = 24).collect().map(_.getString(0)).toSet
    assert(dups == Set("n1"))
  }

  test("temporalDeduplication stamps invalidated_at on duplicate nodes (reference node half)") {
    import spark.implicits._
    val g = new graft.GraphitiSpark(spark, Files.createTempDirectory("temporal-dedup-nodes").toString)
    g.store.commit(
      Seq(
        ("n1", "g", "Alice", t(39)),
        ("n2", "g", "Alice", t(40)),
        ("n3", "g", "Bob", t(40)),
      ).toDF("uuid", "group_id", "name", "created_at"),
      "nodes",
      "fixture",
    )
    g.store.commit(
      Seq(edge("e1", "A", "rel", "B", 0, Some(0))).toDS().toDF(),
      "edges",
      "fixture",
    )
    val n = g.temporalDeduplication(t(100), windowHours = 24)
    assert(n == 1L) // n1 (node); no edge duplicates
    val stamped = g.store
      .load("nodes")
      .collect()
      .map(r => r.getAs[String]("uuid") -> Option(r.getAs[Timestamp]("invalidated_at")))
      .toMap
    assert(stamped("n1").contains(t(100)))
    assert(stamped("n2").isEmpty && stamped("n3").isEmpty)
  }

  test("temporal node dedup is record-only parity: flagged nodes stay visible (disclosed contract)") {
    // the reference's node half (temporal_manager.py:672-695) WRITES
    // invalidated_at on duplicate nodes and no search lane, lookup or
    // lifecycle path ever reads it back — "nodes don't have direct
    // invalidation". The engine keeps that contract: the stamp is
    // recorded (test above) and the flagged node remains fully visible
    // to the driver lookups; consumers that want duplicates hidden
    // filter invalidated_at explicitly. Auto-hiding here would diverge
    // from reference behavior.
    import spark.implicits._
    val g = new graft.GraphitiSpark(spark, Files.createTempDirectory("temporal-dedup-vis").toString)
    g.store.commit(
      Seq(
        ("n1", "g", "Alice", t(39)),
        ("n2", "g", "Alice", t(40)),
      ).toDF("uuid", "group_id", "name", "created_at"),
      "nodes",
      "fixture",
    )
    g.store.commit(Seq(edge("e1", "A", "rel", "B", 0, Some(0))).toDS().toDF(), "edges", "fixture")
    assert(g.temporalDeduplication(t(100), windowHours = 24) == 1L)
    // flagged n1 still resolves by uuid, stamp intact
    val n1 = g.getNodeByUuid("n1")
    assert(n1.isDefined, "record-only contract: flagged node must stay visible to point lookups")
    assert(Option(n1.get.getAs[Timestamp]("invalidated_at")).contains(t(100)))
    // and in the group lookup surface
    val grp = g.getNodesByGroupIds(Seq("g")).collect().map(_.getAs[String]("uuid")).toSet
    assert(grp == Set("n1", "n2"), "record-only contract: group lookups must not auto-hide")
    // the documented opt-in filter recipe hides it
    val live = g.store.load("nodes").filter(org.apache.spark.sql.functions.col("invalidated_at").isNull)
    assert(live.collect().map(_.getAs[String]("uuid")).toSet == Set("n2"))
  }

  test("temporalStats: one-row aggregate over counts, span, per-relation map") {
    val row = TemporalOps.temporalStats(store).collect()(0)
    assert(row.getAs[Long]("total_records") == 19L)
    assert(row.getAs[Long]("invalidated_records") == 2L) // e1, e4
    assert(row.getAs[Long]("valid_records") == 17L)
    assert(row.getAs[Timestamp]("span_start") == t(0))
    assert(row.getAs[Timestamp]("span_end") == t(100 * 24.0))
    val byType = row.getAs[Map[String, Long]]("records_by_entity_type")
    assert(byType == Map("rel" -> 5L, "rel2" -> 3L, "rel3" -> 11L))
    assert(row.getAs[Double]("ingestion_rate_per_hour") > 0)
  }

  test("rangeQuery / pointQuery / aggregation over the edge timeline") {
    val r = TemporalOps.rangeQuery(store, t(0), t(12), "edge")
    assert(r.collect().map(_.getAs[String]("uuid")).toSet == Set("e1", "e2", "d0", "cx") ++ (0 until 10).map(i => s"c$i"))
    // group scoping + limit
    assert(TemporalOps.rangeQuery(store, t(0), t(12), "edge", groupIds = Seq("nope")).count() == 0)
    assert(TemporalOps.rangeQuery(store, t(0), t(12), "edge", limit = Some(3)).count() == 3)
    // point query: e1 is live at 5h, dead at 10h
    val at5 = TemporalOps.pointQuery(store, t(5), "edge").collect().map(_.getAs[String]("uuid")).toSet
    assert(at5.contains("e1") && at5.contains("e2"))
    val at10 = TemporalOps.pointQuery(store, t(10), "edge").collect().map(_.getAs[String]("uuid")).toSet
    assert(!at10.contains("e1"))
    // aggregation: count grouped by relation name
    val agg = TemporalOps
      .aggregation(store, "count", t(0), t(12), groupBy = Some("name"))
      .collect()
      .map(r0 => r0.getString(0) -> r0.getLong(1))
      .toMap
    assert(agg == Map("rel" -> 2L, "rel2" -> 1L, "rel3" -> 11L))
    // d2 (created 2h) is valid at 50.5h — outside the range rows; the
    // latest in-range created_at is d0's 1h
    assert(TemporalOps.aggregation(store, "max", t(0), t(12)).collect()(0).getAs[Timestamp](0) == t(1))
  }
}
