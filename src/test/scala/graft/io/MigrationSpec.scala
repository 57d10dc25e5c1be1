package graft.io

import java.nio.file.Files

import graft.TestSpark
import graft.kg.{Fixtures, Ids, KgPipeline}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Migration (migration.py analog): migrating a store's episodes into a
  * fresh store through the ingest algebra must reproduce the identical
  * graph (the extracted text IS the episode content, so re-extraction is
  * deterministic); skip-existing makes re-migration a no-op; triplet
  * batches land the same edges as the single-row addTriplet path.
  */
class MigrationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshStore(tag: String) = new SnapshotStore(spark, Files.createTempDirectory(tag).toString)

  private def edgesKey(store: SnapshotStore) =
    store
      .load("edges")
      .select("source_uuid", "name", "target_uuid", "valid_at", "invalid_at")
      .collect()
      .map(_.toString)
      .toSet

  test("episode migration reproduces the identical graph; integrity check passes") {
    val source = freshStore("mig-src")
    new KgPipeline(source).run(Fixtures.pagesDf(), "all")

    val target = freshStore("mig-dst")
    val stats = Migration.migrateEpisodes(target, source.load("episodes"), batchSize = 7)
    assert(stats.migrated == source.load("episodes").count())
    assert(stats.skippedExisting == 0)
    assert(stats.batches >= 2, "batchSize=7 must split the corpus into multiple committed batches")

    assert(edgesKey(target) == edgesKey(source))
    val report = Migration.validateIntegrity(source, target).collect()
    assert(report.nonEmpty && report.forall(_.getAs[Boolean]("matches")),
      s"integrity mismatches: ${report.filterNot(_.getAs[Boolean]("matches")).mkString(", ")}")
  }

  test("skip-existing: re-migration is a no-op") {
    val source = freshStore("mig-src2")
    new KgPipeline(source).run(Fixtures.pagesDf(), "all")
    val target = freshStore("mig-dst2")
    Migration.migrateEpisodes(target, source.load("episodes"))
    val v = target.currentVersion("edges").get
    val again = Migration.migrateEpisodes(target, source.load("episodes"))
    assert(again.migrated == 0 && again.skippedExisting == again.totalRows)
    assert(target.currentVersion("edges").get == v, "no new edge snapshot when everything is skipped")
  }

  test("validateTriplets splits invalid rows; batchAddTriplets matches the addTriplet path") {
    import spark.implicits._
    val triplets = Seq(
      ("Ada Lovelace", "collaborated_with", "Charles Babbage"),
      ("Ada Lovelace", "wrote", "Notes on the Analytical Engine"),
      ("", "broken", "x"), // invalid: empty source
      ("y", "   ", "z"), // invalid: blank relation
    ).toDF("source", "relation", "target")
    val (ok, bad) = Migration.validateTriplets(triplets)
    assert(ok.count() == 2 && bad.count() == 2)

    val bulk = freshStore("mig-trip-bulk")
    val stats = Migration.batchAddTriplets(bulk, triplets, batchSize = 1)
    assert(stats.migrated == 2 && stats.invalidRows == 2 && stats.edgesAdded == 2)

    val single = freshStore("mig-trip-single")
    val g = new graft.GraphitiSpark(spark, single.root)
    val at = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    g.addTriplet("Ada Lovelace", "collaborated_with", "Charles Babbage", at)
    g.addTriplet("Ada Lovelace", "wrote", "Notes on the Analytical Engine", at)
    assert(edgesKey(bulk) == edgesKey(single))

    // save_node semantics: both endpoints exist as nodes with embeddings
    val nodes = bulk.load("nodes")
    assert(nodes.filter(col("uuid") === Ids.entity("default", "Ada Lovelace")).count() == 1)
    assert(nodes.filter(size(col("name_embedding")) === 0).count() == 0)
  }

  test("batchAddTriplets keeps the nodes keyword index consistent with the primaries") {
    import spark.implicits._
    val store = freshStore("mig-trip-idx")
    // seed a graph + build every search index, then add triplets with a
    // brand-new entity name — keyword search must find it without a rebuild
    new KgPipeline(store).run(Fixtures.pagesDf(), "fixture-v1")
    graft.search.SearchIndexes.build(store)
    val triplets = Seq(("Zanzibar Research Station", "studies", "Coral Reefs")).toDF("source", "relation", "target")
    Migration.batchAddTriplets(store, triplets)
    val probed = graft.search.SearchIndexes
      .postingsForTerms(store, "nodes", Seq("zanzibar").toDF("term"))
      .collect()
    assert(probed.length == 1 && probed.head.getAs[String]("id") == Ids.entity("default", "Zanzibar Research Station"))
    // stats moved by exactly the two inserted node docs
    val stats = store.load("nodes_bm25stats").collect()(0)
    assert(stats.getAs[Long]("n_docs") == store.load("nodes").count())
  }

  test("toPages maps reference episode spellings and defaults") {
    import spark.implicits._
    val foreign = Seq(
      ("u1", "body text", "2024-02-01 00:00:00"),
    ).toDF("name", "episode_body", "reference_time")
      .withColumn("reference_time", col("reference_time").cast("timestamp"))
    val p = Migration.toPages(foreign).collect().head
    assert(p.getAs[String]("url") == "u1")
    assert(p.getAs[String]("text") == "body text")
    assert(p.getAs[java.sql.Timestamp]("warc_ts") == java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))
    assert(p.getAs[String]("lang") == "en")
  }
}
