package graft.kg

import java.nio.file.Files

import graft.{GraphitiSpark, TestSpark}
import graft.io.SnapshotStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Entity-type exclusion — `extract_nodes(excluded_entity_types)`
  * (`node_operations.py:74,163-164`), mirroring the reference's
  * `tests/test_entity_exclusion_int.py` scenarios deterministically:
  * exclude specific types, exclude everything, exclude nothing, and
  * reject unknown type names. Excluded entities never become nodes and
  * the triples referencing them never become edges.
  */
class ExclusionSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def labels(store: SnapshotStore): Set[String] =
    store.load("nodes").select(col("labels")(0)).collect().map(_.getString(0)).toSet

  test("exclude specific types: no such nodes, no edges referencing them") {
    val store = new SnapshotStore(spark, Files.createTempDirectory("excl").toString)
    // fixture types: Customer# = Person, Supplier# = Organization,
    // NATION_ = Place (test_exclude_specific_custom_types analog).
    // Excluding Place: lives_in facts (Person → Place) vanish; works_at
    // facts (Person → Organization) survive. Entities whose every fact
    // referenced an excluded type drop out with their facts (engine
    // semantics: nodes = entities appearing in surviving facts).
    new KgPipeline(store, excludedEntityTypes = Seq("Place"))
      .run(Fixtures.pagesDf(), "excl-v1")
    assert(labels(store) == Set("Person", "Organization"), "no Place node may remain")
    // edges: every endpoint resolves to a kept node
    val nodes = store.load("nodes").select(col("uuid")).collect().map(_.getString(0)).toSet
    val eps = store
      .load("edges")
      .select(explode(array(col("source_uuid"), col("target_uuid"))).as("u"))
      .collect()
      .map(_.getString(0))
      .toSet
    assert(eps.subsetOf(nodes), "no edge may reference an excluded entity")
    val rels = store.load("edges").select(col("name")).distinct().collect().map(_.getString(0)).toSet
    assert(!rels.contains("lives_in"), "relations targeting excluded types must vanish")
    assert(rels.contains("works_at"), "relations between kept types must survive")
  }

  test("exclude every type extracts an empty graph (test_exclude_all_types analog)") {
    val store = new SnapshotStore(spark, Files.createTempDirectory("excl-all").toString)
    new KgPipeline(store, excludedEntityTypes = Extract.KnownEntityTypes)
      .run(Fixtures.pagesDf(), "excl-v2")
    assert(store.load("raw_triples").isEmpty)
    assert(!store.exists("nodes") || store.load("nodes").isEmpty)
    assert(!store.exists("edges") || store.load("edges").isEmpty)
    // episodes still ingest — exclusion is an extraction filter, not an
    // ingest gate (the reference stores the episode regardless)
    assert(store.load("episodes").count() > 0)
  }

  test("empty exclusion list is the identity (test_exclude_no_types analog)") {
    val a = new SnapshotStore(spark, Files.createTempDirectory("excl-none").toString)
    val b = new SnapshotStore(spark, Files.createTempDirectory("excl-base").toString)
    new KgPipeline(a, excludedEntityTypes = Nil).run(Fixtures.pagesDf(), "excl-v3")
    new KgPipeline(b).run(Fixtures.pagesDf(), "excl-v3")
    def key(s: SnapshotStore, t: String) =
      s.load(t).select(col("uuid")).collect().map(_.getString(0)).toSet
    assert(key(a, "nodes") == key(b, "nodes"))
    assert(key(a, "edges") == key(b, "edges"))
  }

  test("unknown excluded type fails fast (validate_excluded_entity_types analog)") {
    val store = new SnapshotStore(spark, Files.createTempDirectory("excl-bad").toString)
    val e = intercept[IllegalArgumentException](
      new KgPipeline(store, excludedEntityTypes = Seq("NonExistentType")),
    )
    assert(e.getMessage.contains("NonExistentType"))
    val g = new GraphitiSpark(spark, Files.createTempDirectory("excl-bad2").toString)
    intercept[IllegalArgumentException](
      g.addEpisode("https://x.example/1", Fixtures.ts(0), "<html></html>".getBytes, excludedEntityTypes = Seq("Nope")),
    )
  }

  test("incremental ingest honors the exclusion list") {
    val g = new GraphitiSpark(spark, Files.createTempDirectory("excl-inc").toString)
    val html = "<html><body><p>Customer#7 lives in NATION_2. Customer#7 works at Supplier#1.</p></body></html>"
    g.addEpisode("https://x.example/p1", Fixtures.ts(0), html.getBytes, excludedEntityTypes = Seq("Place"))
    val names = g.store.load("nodes").select(col("name")).collect().map(_.getString(0)).toSet
    assert(names == Set("Customer#7", "Supplier#1"), s"got $names")
    val rels = g.store.load("edges").select(col("name")).collect().map(_.getString(0)).toSet
    assert(rels == Set("works_at"), "lives_in targets a Place → excluded")
  }
}
