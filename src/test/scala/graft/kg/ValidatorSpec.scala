package graft.kg

import java.nio.file.Files
import java.sql.Timestamp

import graft.TestSpark
import graft.io.SnapshotStore
import graft.search.AdvancedConfig
import org.scalatest.funsuite.AnyFunSuite

/** Distributed validation rules (validator.py:127-757) and the fluent
  * advanced-search config (advanced_config.py:187-720).
  */
class ValidatorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("validator flags exactly the planted violations, clean graph reports zero failures") {
    val store = new SnapshotStore(spark, Files.createTempDirectory("validator").toString)
    val nodes = Seq(
      ("n1", "Alice", Seq("Person"), Map("entity_type" -> "Person"), Some(ts(1))),
      ("n2", "", Seq("Person"), Map("entity_type" -> "Person"), Some(ts(1))), // empty name
      ("n3", "Bob", Seq.empty[String], Map("entity_type" -> "Person"), Some(ts(1))), // no label
      ("n4", "Carol", Seq("Person"), Map.empty[String, String], Option.empty[Timestamp]), // bad attrs + no created_at
    ).toDF("uuid", "name", "labels", "attributes", "created_at")
    val edges = Seq(
      ("e1", "default", "n1", "knows", "n3", "Alice knows Bob", ts(10), Option.empty[Timestamp], Seq("ep1")),
      ("e2", "default", "n1", "knows", "n4", "Alice knows Carol", ts(10), Some(ts(5)), Seq("ep1")), // invalid_at < valid_at
      ("e3", "default", "nX", "knows", "n1", "ghost edge", ts(10), Option.empty[Timestamp], Seq("epMissing")), // dangling + missing episode
      ("e4", "default", "n1", "knows", "n4", "Alice knows Carol", ts(20), Option.empty[Timestamp], Seq("ep1")), // 2nd OPEN fact in (default, n1, knows)
    ).toDF("uuid", "group_id", "source_uuid", "name", "target_uuid", "fact", "valid_at", "invalid_at", "episodes")
    val episodes = Seq(("ep1", "u1")).toDF("uuid", "name")
    store.commit(nodes, "nodes", "fixture")
    store.commit(edges, "edges", "fixture")
    store.commit(episodes, "episodes", "fixture")

    val report = new Validator(store).validateAll().collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(report("entity_name_nonempty") == 1)
    assert(report("entity_has_label") == 1)
    assert(report("entity_attributes_wellformed") == 1)
    assert(report("entity_temporal_sane") == 1)
    assert(report("entity_uuid_unique") == 0)
    assert(report("edge_fact_nonempty") == 0)
    assert(report("edge_temporal_interval") == 1)
    assert(report("edge_endpoints_resolve") == 1, "nX does not resolve")
    assert(report("graph_episodes_resolve") == 1, "epMissing")
    assert(report("graph_no_orphan_nodes") == 1, "n2 has no incident edge")
    // two open facts in the same (group, source, name) contention group
    assert(report("graph_single_open_fact") == 1)
  }

  test("validateIncremental pre-flights a batch without touching the store") {
    val store = new SnapshotStore(spark, Files.createTempDirectory("validator2").toString)
    val v = new Validator(store)
    val badNodes = Seq(("n1", " ")).toDF("uuid", "name")
    val badEdges = Seq(("e1", "f", ts(10), Some(ts(5)))).toDF("uuid", "fact", "valid_at", "invalid_at")
    val rep = v.validateIncremental(badNodes, badEdges).collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(rep("entity_name_nonempty") == 1)
    assert(rep("edge_temporal_interval") == 1)
  }

  test("advanced config: fluent build, validate catches problems, lowers onto KgSearchConfig") {
    val cfg = AdvancedConfig()
      .withSemantic(enabled = true, minScore = 0.7)
      .withGraph(enabled = true, maxDepth = 2)
      .withRanking("mmr")
      .withLimit(5)
      .withGroups(Seq("tenantA"))
      .withTemporal(validAfter = Some(ts(100)))
    assert(cfg.validate().isEmpty)
    val l = cfg.toKgSearch
    assert(l.config.limit == 5 && l.config.reranker == "mmr" && l.config.simMinScore == 0.7 && l.config.bfsMaxDepth == 2)
    assert(l.filters.validAt.nonEmpty)
    // scoping params must survive the lowering (group filter + as-of ride
    // as KgSearch's separate parameters, not silently dropped)
    assert(l.groupIds == Seq("tenantA") && l.asOf.isEmpty)
    // lane enables become lane toggles
    val lanes = AdvancedConfig().withKeyword(false).toKgSearch.config
    assert(!lanes.keywordLane && lanes.semanticLane && lanes.graphLane)
    // weights + temporal instant lower onto the hybrid engine
    val h = AdvancedConfig.graphOptimized.copy(asOf = Some(ts(7))).toHybrid
    assert(h.graphWeight == 0.7 && h.semanticWeight == 0.2 && h.temporalFilter.contains(ts(7)))
    assert(AdvancedConfig().withSemantic(enabled = false).toHybrid.semanticWeight == 0.0)

    val bad = AdvancedConfig(weights = Map("semantic" -> 0.9, "keyword" -> 0.9), ranking = "magic", limit = 0)
    val problems = bad.validate()
    assert(problems.exists(_.contains("sum to 1")))
    assert(problems.exists(_.contains("unknown ranking")))
    assert(problems.exists(_.contains("limit")))
    intercept[IllegalArgumentException](bad.toKgSearch)
  }

  test("advanced config presets validate and carry the reference's tuning (integration.py:392-529)") {
    val presets = Seq(
      AdvancedConfig.semanticOptimized,
      AdvancedConfig.graphOptimized,
      AdvancedConfig.hybridBalanced,
      AdvancedConfig.domainSpecific("technical"),
      AdvancedConfig.domainSpecific("business"),
      AdvancedConfig.domainSpecific("personal"),
    )
    presets.foreach(p => assert(p.validate().isEmpty, s"preset invalid: ${p.validate()}"))
    assert(AdvancedConfig.semanticOptimized.weights("semantic") == 0.7)
    assert(AdvancedConfig.graphOptimized.graphMaxDepth == 8)
    assert(AdvancedConfig.hybridBalanced.limit == 15)
    assert(AdvancedConfig.domainSpecific("personal").graphMaxDepth == 10)
    intercept[IllegalArgumentException](AdvancedConfig.domainSpecific("nope"))
  }
}
