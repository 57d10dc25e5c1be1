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
}
