package graft.kg

import java.nio.file.Files
import java.sql.Timestamp

import graft.{GraphitiSpark, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Episode-level pre-ingest validation (`EpisodeProcessor
  * .validate_episode`, episode_processor.py:526-577 + :777-823): every
  * rule planted exactly once against a clean control episode.
  */
class EpisodeValidationSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("each validation rule fires exactly on its planted violation") {
    import spark.implicits._
    val entities = Seq(
      ("u1", "Alice"), ("u1", "Acme"),
      ("u2", ""), // empty name
      ("u3", "Bob"),
    ).toDF("url", "name")
    val edges = Seq(
      // clean edge
      ("u1", "Alice", "Acme", "Alice works at Acme.", Some(ts(10)), Option.empty[Timestamp]),
      // empty fact
      ("u2", "X", "Y", "", Option.empty[Timestamp], Option.empty[Timestamp]),
      // dangling endpoints (Carol not extracted on u3)
      ("u3", "Carol", "Bob", "Carol knows Bob.", Some(ts(10)), Option.empty[Timestamp]),
      // inverted interval
      ("u1", "Alice", "Acme", "Alice works at Acme.", Some(ts(20)), Some(ts(20))),
    ).toDF("url", "source_name", "target_name", "fact", "valid_at", "invalid_at")
    val pages = Seq(
      ("u1", "Alice works at Acme."),
      ("u2", "some words entirely uncovered by anything extracted here today"),
      ("u3", "Carol knows Bob."),
    ).toDF("url", "text")

    val got = EpisodeValidation
      .validateEpisodes(entities, edges, pages)
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(got.count { case (u, i) => u == "u2" && i == "entity has empty name" } == 1)
    assert(got.count { case (u, i) => u == "u2" && i == "edge has empty fact" } == 1)
    assert(got.count { case (u, i) => u == "u3" && i == "edge source not found in extracted entities" } == 1)
    // X/Y on u2 are dangling too (u2 extracted only the empty-name entity)
    assert(got.count { case (u, i) => u == "u2" && i.contains("not found in extracted entities") } == 2)
    assert(got.count { case (u, i) => u == "u1" && i == "edge has valid_at >= invalidated_at".replace("invalidated_at", "invalid_at") } == 1)
    assert(got.count { case (u, i) => u == "u2" && i == "low content coverage" } == 1)
    // the clean episode u1 reports ONLY the planted temporal violation
    assert(got.count(_._1 == "u1") == 1)
  }

  test("validatePages + GraphitiSpark facade: clean corpus reports nothing") {
    import spark.implicits._
    val pages = Seq(
      ("https://v.example/1", "Customer#3 lives in NATION_1.", ts(100)),
    ).toDF("url", "text", "warc_ts")
    assert(EpisodeValidation.validatePages(pages).isEmpty)

    val g = new GraphitiSpark(spark, Files.createTempDirectory("epval").toString)
    g.addEpisode(
      "https://v.example/1", ts(100),
      "<html><body><p>Customer#3 lives in NATION_1.</p></body></html>".getBytes,
    )
    assert(g.validateEpisodes().isEmpty)
    assert(g.validateEpisodes(Some("https://v.example/1")).isEmpty)
  }

  test("addEpisodeBulk(validate=true) quarantines planted violations, ingests only the clean subset") {
    import spark.implicits._
    val filler = (1 to 40).map(i => s"filler$i").mkString(" ")
    def page(url: String, body: String) =
      (url, ts(100), s"<html><body><p>$body</p></body></html>".getBytes, null.asInstanceOf[String], "en")
    val pages = Seq(
      page("https://v.example/ok", "Customer#7 lives in NATION_2."),
      page("https://v.example/bad", s"Customer#8 lives in NATION_3. $filler"),
    ).toDF("url", "warc_ts", "html", "text", "lang")
    val g = new GraphitiSpark(spark, Files.createTempDirectory("epgate").toString)
    g.addEpisodeBulk(pages, "gate-v1", validate = true)
    // the planted low-coverage page is quarantined, not ingested
    val rej = g.store.load("rejected_episodes").collect()
    assert(rej.map(_.getAs[String]("url")).toSet == Set("https://v.example/bad"))
    assert(rej.map(_.getAs[String]("issue")).toSet == Set("low content coverage"))
    val ingested = g.store.load("raw_triples").select("url").distinct().collect().map(_.getString(0)).toSet
    assert(ingested == Set("https://v.example/ok"))
    // a clean corpus with validate=true ingests everything, rejects nothing new
    g.addEpisodeBulk(
      Seq(page("https://v.example/ok2", "Supplier#4 supplies Customer#7.")).toDF("url", "warc_ts", "html", "text", "lang"),
      "gate-v2", validate = true,
    )
    assert(g.store.load("rejected_episodes").count() == rej.length.toLong)
    assert(g.store.load("raw_triples").filter(col("url") === "https://v.example/ok2").count() > 0)
  }

  test("coverage floor flags an episode whose text is mostly unextracted prose") {
    import spark.implicits._
    val filler = (1 to 40).map(i => s"filler$i").mkString(" ")
    val pages = Seq(
      ("https://v.example/low", s"Customer#3 lives in NATION_1. $filler", ts(100)),
    ).toDF("url", "text", "warc_ts")
    val got = EpisodeValidation.validatePages(pages).collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq == Seq(("https://v.example/low", "low content coverage")))
  }
}
