package graft

import java.nio.file.Files

import graft.community.Communities
import graft.io.SnapshotStore
import graft.kg.{Fixtures, Ids}
import graft.search.{Bm25, SearchIndexes}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Every delete/override op must leave the query-time search indexes
  * consistent with the tables (the reference leaves them stale until a
  * separate rebuild_indices pass — huggingface_driver.py:433-444; here a
  * delete refreshes in the same call). The oracle for each index is a
  * FRESH rebuild from the live tables: live reconciled view == rebuild.
  */
class DeleteConsistencySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshStore(): (GraphitiSpark, SnapshotStore) = {
    val g = new GraphitiSpark(spark, Files.createTempDirectory("gdel").toString)
    g.addEpisodeBulk(Fixtures.pagesDf(), "fixture-v1")
    Communities.build(g.store)
    SearchIndexes.build(g.store) // adds communities postings to the pipeline-built set
    (g, g.store)
  }

  /** Assert every index's live view equals a fresh derivation from the
    * current tables. `prevEdges`/`prevDocs` widen the probe key set to the
    * PRE-mutation rows, so ghost entries (removed rows still in an index)
    * are probed and caught.
    */
  private def assertIndexConsistent(store: SnapshotStore, prevEdges: DataFrame, prevDocs: Map[String, DataFrame]): Unit = {
    val edges = store.load("edges")
    // graph adjacency == recomputed undirected pair counts
    val wantAdj = edges
      .select(col("source_uuid").as("src"), col("target_uuid").as("dst"))
      .unionByName(edges.select(col("target_uuid").as("src"), col("source_uuid").as("dst")))
      .groupBy("src", "dst")
      .count()
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val gotAdj = SearchIndexes
      .adjacency(store)
      .collect()
      .map(r => (r.getAs[String]("src"), r.getAs[String]("dst")) -> r.getAs[Long]("cnt"))
      .toMap
    assert(gotAdj == wantAdj, "graph_adj view != fresh pair counts")

    // month index == recomputed month membership
    val wantMonths = edges
      .filter(col("valid_at").isNotNull)
      .select(date_format(col("valid_at"), "yyyy-MM").as("month"), col("uuid"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSet
    val gotMonths = SearchIndexes
      .monthIndex(store)
      .collect()
      .map(r => (r.getAs[String]("month"), r.getAs[String]("uuid")))
      .toSet
    assert(gotMonths == wantMonths, "edge_months view != fresh month rows")

    // ANN buckets == recomputed signatures (probe with prev ∪ live sigs)
    val sigsOf = (df: DataFrame) =>
      df.select(graft.sim.Ann.signatureCol(col("fact_embedding")).as("sig")).distinct()
    val probeSigs = sigsOf(prevEdges).unionByName(sigsOf(edges)).distinct()
    val wantAnn = edges
      .select(graft.sim.Ann.signatureCol(col("fact_embedding")).as("sig"), col("uuid"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1)))
      .toSet
    val gotAnn = SearchIndexes
      .annForSigs(store, probeSigs)
      .select(col("sig"), col("uuid"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1)))
      .toSet
    assert(gotAnn == wantAnn, "edge_ann view != fresh signatures")

    // text postings + corpus stats per surface (probe with prev ∪ live terms)
    val liveDocs = Map(
      "edges" -> edges.select(col("uuid").as("id"), col("fact").as("text")),
      "nodes" -> store.load("nodes").select(col("uuid").as("id"), col("name").as("text")),
      "episodes" -> store.load("episodes").select(col("uuid").as("id"), col("content").as("text")),
      "communities" -> store.load("communities").select(col("uuid").as("id"), col("summary").as("text")),
    )
    liveDocs.foreach { case (table, docs) =>
      val probeTerms = Bm25
        .termFreqs(prevDocs(table).unionByName(docs))
        .select(col("term"))
        .distinct()
      val want = Bm25
        .termFreqs(docs)
        .collect()
        .map(r => (r.getAs[String]("term"), r.getAs[String]("id"), r.getAs[Long]("tf")))
        .toSet
      val got = SearchIndexes
        .postingsForTerms(store, table, probeTerms)
        .select(col("term"), col("id"), col("tf"))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSet
      assert(got == want, s"${table}_postings view != fresh index")
      val wantStats = Bm25.corpusStats(docs).collect()(0)
      val gotStats = store.load(s"${table}_bm25stats").collect()(0)
      assert(
        gotStats.getAs[Long]("n_docs") == wantStats.getAs[Long]("n_docs") &&
          gotStats.getAs[Long]("total_dl") == wantStats.getAs[Long]("total_dl"),
        s"${table}_bm25stats drifted",
      )
    }
  }

  private def snapshotPrev(store: SnapshotStore): (DataFrame, Map[String, DataFrame]) = {
    val prevEdges = store.load("edges").localCheckpoint()
    val docs = Map(
      "edges" -> prevEdges.select(col("uuid").as("id"), col("fact").as("text")),
      "nodes" -> store.load("nodes").select(col("uuid").as("id"), col("name").as("text")).localCheckpoint(),
      "episodes" -> store.load("episodes").select(col("uuid").as("id"), col("content").as("text")).localCheckpoint(),
      "communities" -> store.load("communities").select(col("uuid").as("id"), col("summary").as("text")).localCheckpoint(),
    )
    (prevEdges, docs)
  }

  test("deleteNodesByUuids: cascades + every index view == fresh rebuild") {
    val (g, store) = freshStore()
    val target = Fixtures.canonSurface(f"Customer#${1}%09d", hasAlias = true)
    val uuid = Ids.entity("default", target)
    val (prevEdges, prevDocs) = snapshotPrev(store)
    val hadEdges = prevEdges.filter(col("source_uuid") === uuid || col("target_uuid") === uuid).count()
    assert(hadEdges > 0, "fixture entity should have edges")

    g.deleteNodesByUuids(Seq(uuid))

    assert(store.load("nodes").filter(col("uuid") === uuid).isEmpty)
    val edges = store.load("edges")
    assert(edges.filter(col("source_uuid") === uuid || col("target_uuid") === uuid).isEmpty)
    // other groups' rows untouched beyond the cascade
    assert(edges.count() == prevEdges.count() - hadEdges)
    // MENTIONS rows of the entity gone
    assert(store.load("episodic_edges").filter(col("entity_uuid") === uuid).isEmpty)
    // entity_edges lists cite no removed edge uuid
    val removedUuids = prevEdges
      .filter(col("source_uuid") === uuid || col("target_uuid") === uuid)
      .select(col("uuid"))
      .collect()
      .map(_.getString(0))
      .toSet
    val cited = store
      .load("episode_entity_edges")
      .select(explode(col("entity_edges")).as("e"))
      .collect()
      .map(_.getString(0))
      .toSet
    assert(cited.intersect(removedUuids).isEmpty, "entity_edges lists still cite removed edges")
    assertIndexConsistent(store, prevEdges, prevDocs)
  }

  test("removeEpisode: sole-supporter edges leave the indexes") {
    val (g, store) = freshStore()
    val (prevEdges, prevDocs) = snapshotPrev(store)
    // a move page asserts a fact no other episode supports
    val url = "https://t.example/move/2"
    val epUuid = Ids.episode("default", url)
    val vanishing = prevEdges
      .filter(array_contains(col("episodes"), epUuid) && size(col("episodes")) === 1)
      .count()
    assert(vanishing > 0, "fixture move page should solely support an edge")
    g.removeEpisode(url)
    assert(store.load("episodes").filter(col("uuid") === epUuid).isEmpty)
    assert(store.load("edges").filter(array_contains(col("episodes"), epUuid)).isEmpty)
    assertIndexConsistent(store, prevEdges, prevDocs)
  }

  test("cleanupAged hard + setValidityPeriod keep the month index live") {
    val (g, store) = freshStore()
    // manufacture an invalidated-early edge: the fixture contradictions
    // produce invalid_at on moved facts
    val cutoff = Fixtures.ts(400000L)
    val (prevEdges, prevDocs) = snapshotPrev(store)
    val aged = prevEdges.filter(col("invalid_at").isNotNull && col("invalid_at") < lit(cutoff)).count()
    assert(aged > 0, "fixture should hold invalidated edges")
    val removed = g.cleanupAged("hard", cutoff)
    assert(removed == aged)
    assertIndexConsistent(store, prevEdges, prevDocs)

    // setValidityPeriod moves an edge to another month; range probe follows
    val (prevEdges2, prevDocs2) = snapshotPrev(store)
    val e = store.load("edges").orderBy(col("uuid")).limit(1).collect()(0)
    val newFrom = java.sql.Timestamp.valueOf("2024-06-15 00:00:00")
    g.setValidityPeriod(e.getAs[String]("uuid"), newFrom)
    val probed = SearchIndexes
      .edgesValidInRange(store, java.sql.Timestamp.valueOf("2024-06-01 00:00:00"), java.sql.Timestamp.valueOf("2024-07-01 00:00:00"))
      .select(col("uuid"))
      .collect()
      .map(_.getString(0))
      .toSet
    assert(probed == Set(e.getAs[String]("uuid")))
    assertIndexConsistent(store, prevEdges2, prevDocs2)
  }

  test("resolveConflicts merge: deleted group members leave the edge indexes") {
    // merge is the one conflict strategy that DELETES rows — it must hold
    // the same index-consistency contract as the other delete ops. A
    // minimal edges-only store: one 2-row conflict group + a singleton.
    val store = new SnapshotStore(spark, Files.createTempDirectory("gconfm").toString)
    val ts = (m: Long) => new java.sql.Timestamp(m * 60000L)
    val emb1 = Seq(1.0f, 0.0f, 0.5f)
    val emb2 = Seq(0.0f, 1.0f, 0.5f)
    val edges = Seq(
      ("e1", "a", "b", "linked_to", "alpha first fact", "default", Some(ts(10)), None: Option[java.sql.Timestamp], None: Option[java.sql.Timestamp], ts(10), Seq("ep1"), emb1),
      ("e2", "a", "b", "linked_to", "alpha second fact", "default", Some(ts(20)), None: Option[java.sql.Timestamp], None: Option[java.sql.Timestamp], ts(20), Seq("ep2"), emb2),
      ("e3", "a", "c", "knows", "gamma single fact", "default", Some(ts(30)), None: Option[java.sql.Timestamp], None: Option[java.sql.Timestamp], ts(30), Seq("ep3"), emb1),
    ).toDF("uuid", "source_uuid", "target_uuid", "name", "fact", "group_id", "valid_at", "invalid_at", "expired_at", "created_at", "episodes", "fact_embedding")
    store.commit(edges, "edges", "conflict fixture")
    SearchIndexes.buildText(store, "edges", "uuid", "fact")
    SearchIndexes.buildAnn(store)
    SearchIndexes.buildGraph(store)
    SearchIndexes.buildTemporal(store)

    val g = new GraphitiSpark(spark, store.root)
    g.resolveConflicts("merge", ts(99))
    val live = store.load("edges")
    assert(live.collect().map(_.getAs[String]("uuid")).sorted.toSeq == Seq("e1", "e3"), "e2 merged away")

    // every edge index view must equal a fresh derivation from live edges
    // (probe keys widened with the removed row's terms/sig/months)
    val probeTerms = Bm25.termFreqs(edges.select(col("uuid").as("id"), col("fact").as("text")))
      .select(col("term")).distinct()
    val gotPost = SearchIndexes.postingsForTerms(store, "edges", probeTerms)
      .select(col("term"), col("id")).collect().map(r => (r.getString(0), r.getString(1))).toSet
    val wantPost = Bm25.termFreqs(live.select(col("uuid").as("id"), col("fact").as("text")))
      .select(col("term"), col("id")).collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(gotPost == wantPost, "edges_postings holds a ghost doc after merge")
    val stats = store.load("edges_bm25stats").collect()(0)
    assert(stats.getAs[Long]("n_docs") == 2L, "bm25 stats drifted")
    val probeSigs = edges.select(graft.sim.Ann.signatureCol(col("fact_embedding")).as("sig")).distinct()
    val gotAnn = SearchIndexes.annForSigs(store, probeSigs)
      .select(col("uuid")).collect().map(_.getString(0)).toSet
    assert(gotAnn == Set("e1", "e3"), "edge_ann holds a ghost vector after merge")
    val gotAdj = SearchIndexes.adjacency(store).groupBy().agg(sum(col("cnt"))).collect()(0).getLong(0)
    assert(gotAdj == 4L, s"graph_adj pair multiplicity should drop to 2 undirected pairs, got $gotAdj")
    val gotMonths = SearchIndexes.monthIndex(store).select(col("uuid")).collect().map(_.getString(0)).toSet
    assert(gotMonths == Set("e1", "e3"), "edge_months holds a ghost row after merge")
  }

  test("deleteGroup purges tables, side tables and indexes") {
    val (g, store) = freshStore()
    val (prevEdges, prevDocs) = snapshotPrev(store)
    g.deleteGroup("default")
    Seq("episodes", "nodes", "nodes_raw", "edges", "episodic_edges", "raw_triples", "communities").foreach { t =>
      assert(store.load(t).isEmpty, s"$t should be empty after group delete")
    }
    Seq("node_stats", "uuid_map", "uuid_map_by_uuid", "node_blocks", "episode_entity_edges").foreach { t =>
      if (store.exists(t)) assert(store.load(t).isEmpty, s"$t should be empty after group delete")
    }
    assertIndexConsistent(store, prevEdges, prevDocs)
  }
}
