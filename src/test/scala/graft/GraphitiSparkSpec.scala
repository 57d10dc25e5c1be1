package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.kg.{Fixtures, Ids}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphitiSparkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fresh(): GraphitiSpark = {
    val g = new GraphitiSpark(spark, Files.createTempDirectory("gfacade").toString)
    g.addEpisodeBulk(Fixtures.pagesDf(), "fixture-v1")
    g
  }

  test("random addTriplet/invalidateEdges interleavings match the bitemporal model") {
    // differential over facade op SEQUENCES: every addTriplet re-runs the
    // dedupe+invalidate rebuild of its contention group, and every manual
    // invalidation must survive all later rebuilds (ADVICE round 1) —
    // expected state is an in-memory replay of the reference rules:
    // valid = min assertion time per (s,p,o); invalid = min(first strictly
    // later contradicting assertion in the (s,p) group, earliest manual)
    val rnd = new scala.util.Random(41L)
    val g = new GraphitiSpark(spark, Files.createTempDirectory("gseq").toString)
    val times = (0 until 4).map(i => Fixtures.ts(i * 1000L))
    val srcs = Seq("SrcA", "SrcB")
    val objs = Seq("ObjX", "ObjY", "ObjZ")
    var asserted = Map.empty[(String, String), Long] // (src,obj) → min valid
    var manual = Map.empty[(String, String), Long] // (src,obj) → min manual at
    for (_ <- 0 until 10) {
      val src = srcs(rnd.nextInt(srcs.size))
      val obj = objs(rnd.nextInt(objs.size))
      if (asserted.nonEmpty && rnd.nextInt(10) < 3) {
        // manual invalidation of a random existing edge, by uuid lookup
        val (s, o) = asserted.keys.toSeq.sorted.apply(rnd.nextInt(asserted.size))
        val at = Fixtures.ts(1500L + rnd.nextInt(3) * 1000L)
        val uuid = g.store
          .load("edges")
          .filter(
            col("source_uuid") === Ids.entity("default", s) &&
              col("name") === "rel" && col("target_uuid") === Ids.entity("default", o),
          )
          .collect()
          .head
          .getAs[String]("uuid")
        g.invalidateEdges(Seq(uuid), at, "test")
        manual = manual.updated((s, o), manual.get((s, o)).fold(at.getTime)(math.min(_, at.getTime)))
      } else {
        val t = times(rnd.nextInt(times.size))
        g.addTriplet(src, "rel", obj, t)
        asserted = asserted.updated((src, obj), asserted.get((src, obj)).fold(t.getTime)(math.min(_, t.getTime)))
      }
    }
    val got = g.store
      .load("edges")
      .collect()
      .map { r =>
        val k = (r.getAs[String]("source_uuid"), r.getAs[String]("target_uuid"))
        k -> ((r.getAs[Timestamp]("valid_at").getTime, Option(r.getAs[Timestamp]("invalid_at")).map(_.getTime)))
      }
      .toMap
    val want = asserted.map { case ((s, o), v) =>
      val contradiction = asserted.collect { case ((s2, o2), v2) if s2 == s && o2 != o && v2 > v => v2 } match {
        case vs if vs.isEmpty => None
        case vs => Some(vs.min)
      }
      val m = manual.get((s, o))
      val invalid = (contradiction, m) match {
        case (Some(a), Some(b)) => Some(math.min(a, b))
        case (a, b) => a.orElse(b)
      }
      ((Ids.entity("default", s), Ids.entity("default", o)), (v, invalid))
    }
    assert(got == want)
  }

  test("addEpisode ingests a single page incrementally") {
    val g = fresh()
    val before = g.store.load("edges").count()
    g.addEpisode(
      "https://t.example/new",
      Fixtures.ts(999999L),
      "<html><body><p>Customer#000000099 lives in NATION_4.</p></body></html>".getBytes("UTF-8"),
    )
    assert(g.store.load("edges").count() == before + 1)
    assert(g.store.load("episodes").filter(col("name") === "https://t.example/new").count() == 1)
  }

  test("addTriplet resolves against existing graph (contradiction closes old fact)") {
    val g = fresh()
    val e = f"Customer#${1}%09d" // non-mover
    g.addTriplet(e, "lives_in", "NATION_4", new Timestamp(Fixtures.ts(500000L).getTime))
    val facts = g.store
      .load("edges")
      .filter(col("source_uuid") === Ids.entity("default", e) && col("name") === "lives_in")
      .orderBy(col("valid_at"))
      .collect()
    assert(facts.length == 2)
    assert(facts(0).getAs[Timestamp]("invalid_at") == facts(1).getAs[Timestamp]("valid_at"))
  }

  test("removeEpisode cascades: episode gone, sole-support edges dropped") {
    val g = fresh()
    val url = "https://t.example/move/2" // the mover-update page
    val epUuid = Ids.episode("default", url)
    val supported = g.store.load("edges").filter(array_contains(col("episodes"), epUuid)).count()
    assert(supported >= 1)
    g.removeEpisode(url)
    assert(g.store.load("episodes").filter(col("uuid") === epUuid).count() == 0)
    assert(g.store.load("edges").filter(array_contains(col("episodes"), epUuid)).count() == 0)
  }

  test("invalidateEdges stamps invalid_at/expired_at on listed uuids") {
    val g = fresh()
    val uuid = g.store.load("edges").filter(col("invalid_at").isNull).limit(1).collect()(0).getAs[String]("uuid")
    val at = new Timestamp(Fixtures.ts(700000L).getTime)
    g.invalidateEdges(Seq(uuid), at, "manual correction")
    val row = g.store.load("edges").filter(col("uuid") === uuid).collect()(0)
    assert(row.getAs[Timestamp]("invalid_at") == at)
    assert(row.getAs[Timestamp]("expired_at") == at)
  }

  test("manual invalidation survives a later batch rebuilding the same contention group") {
    val g = fresh()
    val e = f"Customer#${2}%09d" // no alias, not a mover → one open lives_in fact
    val src = Ids.entity("default", e)
    val edge = g.store
      .load("edges")
      .filter(col("source_uuid") === src && col("name") === "lives_in")
      .collect()(0)
    val at = new Timestamp(Fixtures.ts(700000L).getTime)
    g.invalidateEdges(Seq(edge.getAs[String]("uuid")), at, "manual correction")
    // a new episode re-asserts the SAME fact → mergeEdges rebuilds the group
    g.addEpisode(
      "https://t.example/reassert",
      Fixtures.ts(800000L),
      s"<html><body><p>$e lives in NATION_1.</p></body></html>".getBytes("UTF-8"),
    )
    val after = g.store
      .load("edges")
      .filter(col("source_uuid") === src && col("name") === "lives_in")
      .collect()(0)
    assert(after.getAs[Timestamp]("manual_invalid_at") == at)
    assert(after.getAs[Timestamp]("invalid_at") == at) // not reopened by the rebuild
  }

  test("removeEpisode deletes nodes mentioned only by that episode") {
    val g = fresh()
    val url = "https://t.example/solo"
    g.addEpisode(
      url,
      Fixtures.ts(900000L),
      "<html><body><p>Zyzzyva#77 lives in NATION_0.</p></body></html>".getBytes("UTF-8"),
    )
    val solo = Ids.entity("default", "Zyzzyva#77")
    assert(g.store.load("nodes").filter(col("uuid") === solo).count() == 1)
    g.removeEpisode(url)
    // Zyzzyva#77 was mentioned only by the removed episode → node deleted;
    // NATION_0 is mentioned by other episodes → kept
    assert(g.store.load("nodes").filter(col("uuid") === solo).count() == 0)
    val n0 = {
      val m = g.store.load("uuid_map").filter(col("uuid") === Ids.entity("default", "NATION_0")).collect()
      if (m.nonEmpty) m(0).getString(1) else Ids.entity("default", "NATION_0")
    }
    assert(g.store.load("nodes").filter(col("uuid") === n0).count() == 1)
  }

  test("nodes carry the full reference schema; episodes carry entity_edges") {
    val g = fresh()
    val row = g.store.load("nodes").limit(1).collect()(0)
    Seq("uuid", "name", "group_id", "labels", "created_at", "name_embedding", "summary", "attributes")
      .foreach(c => assert(row.fieldIndex(c) >= 0))
    assert(g.store.load("nodes").filter(col("created_at").isNull).count() == 0)
    assert(g.store.load("nodes").filter(col("summary").isNull).count() == 0)
    val n2 = Ids.entity("default", f"Customer#${2}%09d")
    val attrs = g.store.load("nodes").filter(col("uuid") === n2).collect()(0).getMap[String, String](7)
    assert(attrs("entity_type") == "Person")
    assert(attrs("mention_count").toInt >= 1)
    // every episode that produced an edge lists it in entity_edges (served
    // from the normalized episode_entity_edges side table via the view)
    val ep = Ids.episode("default", "https://t.example/c/1")
    val epView = g.episodesWithEntityEdges
    val ee = epView.filter(col("uuid") === ep).collect()(0).getSeq[String](
      epView.schema.fieldIndex("entity_edges"),
    )
    assert(ee.nonEmpty)
    val edgeUuids = g.store.load("edges").filter(array_contains(col("episodes"), ep)).collect().map(_.getAs[String]("uuid")).toSet
    assert(ee.toSet == edgeUuids)
  }

  test("deleteNodesByUuids cascades to incident edges") {
    val g = fresh()
    val n = Ids.entity("default", "NATION_0")
    val canonical = {
      val m = g.store.load("uuid_map").filter(col("uuid") === n).collect()
      if (m.nonEmpty) m(0).getString(1) else n
    }
    g.deleteNodesByUuids(Seq(canonical))
    assert(g.store.load("nodes").filter(col("uuid") === canonical).count() == 0)
    assert(
      g.store
        .load("edges")
        .filter(col("source_uuid") === canonical || col("target_uuid") === canonical)
        .count() == 0,
    )
  }

  test("deleteGroup empties group-scoped tables") {
    val g = fresh()
    g.deleteGroup("default")
    assert(g.store.load("edges").count() == 0)
    assert(g.store.load("nodes").count() == 0)
  }

  test("retrieveEpisodes: last-n window before reference time") {
    val g = fresh()
    val eps = g.retrieveEpisodes(Fixtures.ts(300L), lastN = 3).collect()
    assert(eps.length == 3)
    assert(eps.forall(_.getAs[Timestamp]("valid_at").getTime <= Fixtures.ts(300L).getTime))
  }

  test("retrieveEpisodes: group_ids and source filters (graph_data_operations.py:144-151)") {
    val g = fresh()
    val all = g.retrieveEpisodes(Fixtures.ts(300L), lastN = 100).collect()
    assert(all.nonEmpty && all.forall(_.getAs[String]("source") == "text"))
    // matching scope returns the same window; non-matching scope is empty
    val scoped = g.retrieveEpisodes(Fixtures.ts(300L), lastN = 100, groupIds = Seq("default"), source = Some("text"))
    assert(scoped.count() == all.length)
    assert(g.retrieveEpisodes(Fixtures.ts(300L), lastN = 100, groupIds = Seq("other")).count() == 0)
    assert(g.retrieveEpisodes(Fixtures.ts(300L), lastN = 100, source = Some("json")).count() == 0)
  }

  test("resultsToContextString: deterministic FACTS/ENTITIES/EPISODES/COMMUNITIES block") {
    val g = fresh()
    val res = g.search("works at Supplier#2", config = graft.search.KgSearchConfig(limit = 3))
    val s1 = g.resultsToContextString(res)
    val s2 = g.resultsToContextString(g.search("works at Supplier#2", config = graft.search.KgSearchConfig(limit = 3)))
    assert(s1 == s2, "equal searches must yield byte-equal context strings")
    for (tag <- Seq("FACTS", "ENTITIES", "EPISODES", "COMMUNITIES"))
      assert(s1.contains(s"<$tag>") && s1.contains(s"</$tag>"), s"missing $tag section")
    // open-ended facts serialize invalid_at as "Present" (search_helpers.py:31-36)
    assert(s1.contains("\"fact\":"), s"no facts in context: $s1")
    assert(s1.contains("\"invalid_at\":"))
  }
}
