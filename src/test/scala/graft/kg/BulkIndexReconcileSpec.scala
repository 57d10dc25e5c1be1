package graft.kg

import java.nio.file.Files

import graft.{GraphitiSpark, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A bulk run over a store whose incremental-path indexes already exist
  * must RECONCILE them: the bulk pipeline replaces nodes_raw / uuid_map /
  * edges wholesale, while locateEdges, deleteNodesByUuids, incremental
  * linking and addTriplet trust edge_uuids / edge_endpoints / node_blocks /
  * uuid_map_by_uuid whenever the table exists. A stale index silently
  * no-ops point mutations on bulk-created rows and keeps locating rows
  * that no longer exist (reference contract: every maintenance op sees the
  * full post-ingest graph — graphiti.py:587-873 rebuilds its in-memory
  * indices per add_episode_bulk call).
  */
class BulkIndexReconcileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pagesB = (21 to 26)
    .map { i =>
      (
        s"https://b.example/c/$i",
        Fixtures.ts(5000 + i * 60L),
        s"<html><body><p>Customer#$i lives in NATION_${i % 5}.</p></body></html>".getBytes("UTF-8"),
        null.asInstanceOf[String],
        "en",
      )
    }
    .toDF("url", "warc_ts", "html", "text", "lang")

  test("a second bulk load reconciles every pre-existing locate/probe index") {
    val g = new GraphitiSpark(spark, Files.createTempDirectory("bulk-recon").toString)
    g.addEpisodeBulk(Fixtures.pagesDf(), "fixture-v1")
    for (t <- Seq("edge_uuids", "edge_endpoints", "node_blocks", "uuid_map_by_uuid"))
      assert(g.store.exists(t), s"$t missing after first bulk (stage-10 bootstrap)")
    val aEdgeUuid = g.store.load("edges").select("uuid").orderBy("uuid").first().getString(0)

    g.addEpisodeBulk(pagesB, "fixture-v2")

    // content parity: each index equals its from-scratch derivation over
    // the REPLACED primaries (no corpus-A leftovers, no missing B rows)
    def setOf(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toString).toSet
    val edges = g.store.load("edges")
    assert(
      setOf(g.store.load("edge_uuids")) ==
        setOf(edges.select(col("uuid"), col("group_id"), col("source_uuid"), col("name"))),
      "edge_uuids must mirror the committed edges",
    )
    assert(
      setOf(g.store.load("edge_endpoints")) ==
        setOf(
          edges
            .select(
              explode(array(col("source_uuid"), col("target_uuid"))).as("endpoint_uuid"),
              col("group_id"), col("source_uuid"), col("name"),
            )
            .distinct(),
        ),
      "edge_endpoints must mirror the committed edges' endpoints",
    )
    assert(
      setOf(g.store.load("node_blocks")) ==
        setOf(Linking.blockingKeys(g.store.load("nodes_raw"))),
      "node_blocks must mirror the committed nodes_raw",
    )
    assert(
      setOf(g.store.load("uuid_map_by_uuid")) == setOf(g.store.load("uuid_map")),
      "uuid_map_by_uuid must mirror the committed uuid_map",
    )

    // side-table GC: dead corpus-A keys leave the keyed side tables too
    // (absence == empty list for entity_edges; stats probe by live cuuid)
    val liveEps = edges
      .select(explode(col("episodes")).as("uuid")).distinct()
      .collect().map(_.getString(0)).toSet
    val eeKeys = g.store.load("episode_entity_edges").select("uuid").collect().map(_.getString(0)).toSet
    assert(eeKeys.subsetOf(liveEps), s"dead episode keys left behind: ${eeKeys -- liveEps}")
    val nodeUuids = g.store.load("nodes").select("uuid").collect().map(_.getString(0)).toSet
    val statKeys = g.store.load("node_stats").select("cuuid").collect().map(_.getString(0)).toSet
    assert(statKeys.subsetOf(nodeUuids), s"dead stats cuuids left behind: ${(statKeys -- nodeUuids).take(5)}")

    // functional: a point mutation LOCATES a bulk-B edge (the stale index
    // would silently no-op here), and a corpus-A uuid no longer resolves
    val bEdgeUuid = g.store.load("edges").select("uuid").orderBy("uuid").first().getString(0)
    g.invalidateEdges(Seq(bEdgeUuid), Fixtures.ts(9999), "reconcile-proof")
    val stamped = g.getEdgeByUuid(bEdgeUuid)
    assert(stamped.isDefined)
    assert(
      Option(stamped.get.getAs[java.sql.Timestamp]("expired_at")).contains(Fixtures.ts(9999)),
      "invalidateEdges must reach the bulk-created edge through the reconciled index",
    )
    assert(g.getEdgeByUuid(aEdgeUuid).isEmpty, "replaced corpus-A edge must not resolve")

    // delete cascade through the reconciled endpoint index: removing a
    // B node removes every B edge citing it
    val bNode = Ids.entity("default", "Customer#22")
    assert(g.getNodeByUuid(bNode).isDefined)
    g.deleteNodesByUuids(Seq(bNode))
    assert(
      g.store.load("edges")
        .filter(col("source_uuid") === bNode || col("target_uuid") === bNode)
        .isEmpty,
      "deleteNodesByUuids must cascade to bulk-created edges via edge_endpoints",
    )
  }
}
