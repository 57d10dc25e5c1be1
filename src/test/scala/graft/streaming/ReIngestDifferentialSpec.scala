package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.{TestSeeds, TestSpark}
import graft.io.SnapshotStore
import graft.kg.{Ids, KgPipeline}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Seeded randomized differential for the page-UPDATE (re-ingest) path:
  * a random schedule of ingests and content-changing re-ingests must
  *
  *  1. converge to a bulk rebuild over the FINAL corpus on every
  *     valid_at-independent surface (raw_triples, MENTIONS, mention
  *     counts, edge fact/supporter sets), and
  *  2. match an in-memory replay model on the valid_at/invalid_at
  *     lifecycle, where adoption (a re-asserted fact keeps its original
  *     valid_at — `resolve_extracted_edge`, edge_operations.py:414-535)
  *     makes the bulk rebuild the WRONG oracle, and
  *  3. keep every derived surface (entity_edges lists, graph/temporal
  *     indexes) consistent with the live edges.
  *
  * Fixture splits cover the interleavings someone thought of; the seeded
  * schedule covers retraction→re-derivation, adoption, supporter handoff,
  * invalidation ties (two facts of one page version share a valid_at) and
  * full-retraction node/edge disappearance in combinations the hand-built
  * ReIngestSpec corpus does not reach.
  */
class ReIngestDifferentialSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val G = "default"
  private def ts(off: Long) = new Timestamp((1704067200L + off) * 1000L)

  private val custs = (1 to 4).map(i => f"Customer#$i%09d")
  private val nats = (0 to 2).map(i => s"NATION_$i")
  private val sups = (1 to 3).map(i => f"Supplier#$i%09d")
  private val urls = (0 until 6).map(i => s"https://rd.example/p$i")

  private case class Page(url: String, off: Long, triples: Set[(String, String, String)])

  /** Deterministic content for (url, version): 1-3 distinct triples. */
  private def contentOf(seed: Long, urlIdx: Int, version: Int): Set[(String, String, String)] = {
    val rnd = new scala.util.Random(seed * 1000003L + urlIdx * 7919L + version * 104729L)
    val n = 1 + rnd.nextInt(3)
    Iterator
      .continually {
        if (rnd.nextBoolean()) (custs(rnd.nextInt(custs.size)), "lives_in", nats(rnd.nextInt(nats.size)))
        else (custs(rnd.nextInt(custs.size)), "works_at", sups(rnd.nextInt(sups.size)))
      }
      .take(8)
      .toSeq
      .distinct
      .take(n)
      .toSet
  }

  private def render(t: (String, String, String)): String = t match {
    case (s, "lives_in", o) => s"$s lives in $o."
    case (s, "works_at", o) => s"$s works at $o."
    case other              => throw new IllegalArgumentException(other.toString)
  }

  private def pagesDf(pages: Seq[Page]): DataFrame = {
    import spark.implicits._
    pages
      .map { p =>
        val body = p.triples.toSeq.sorted.map(render).mkString(" ")
        val html = s"<html><head><title>t</title></head><body><p>$body</p></body></html>".getBytes("UTF-8")
        (p.url, ts(p.off), html, null.asInstanceOf[String], "en")
      }
      .toDF("url", "warc_ts", "html", "text", "lang")
  }

  // ---- in-memory replay model of the edge lifecycle ----
  private case class FactState(validAt: Long, episodes: Set[String])

  /** Replay the schedule; returns fact → (validAt, invalidAt, supporters).
    * `canon` maps a SURFACE triple to its canonical form (identity when no
    * alias spellings are in play). Retractions are computed at surface
    * level first — a page that swaps spellings of a still-asserted fact
    * goes down the engine's retraction+re-derivation path, not adoption —
    * then keyed canonically.
    */
  private def replay(
      schedule: Seq[Seq[Page]],
      canon: ((String, String, String)) => (String, String, String) = identity,
  ): Map[(String, String, String), (Long, Option[Long], Set[String])] = {
    var stored = Map.empty[String, (Long, Set[(String, String, String)])] // url -> (ts, surface triples)
    var facts = Map.empty[(String, String, String), FactState]

    for (batch <- schedule) {
      val oldT = batch.map(p => p.url -> stored.get(p.url).map(_._2).getOrElse(Set.empty)).toMap
      stored = stored ++ batch.map(p => p.url -> (p.off, p.triples))
      val batchTs = batch.map(p => p.url -> p.off).toMap

      val retractions: Map[(String, String, String), Set[String]] = batch
        .flatMap(p => (oldT(p.url) -- p.triples).map(f => canon(f) -> p.url))
        .groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      val assertions: Map[(String, String, String), Set[String]] = batch
        .flatMap(p => p.triples.map(f => canon(f) -> p.url))
        .groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap

      // facts with >=1 retraction re-derive from remaining supporters'
      // CURRENT content (exclusion + supporter re-extraction in mergeEdges)
      for ((f, retractedBy) <- retractions) {
        val st = facts.getOrElse(f, FactState(Long.MaxValue, Set.empty))
        val remaining = (st.episodes -- retractedBy).filter(u => stored(u)._2.exists(t => canon(t) == f))
        val allSup = remaining ++ assertions.getOrElse(f, Set.empty)
        if (allSup.isEmpty) facts -= f
        else facts += f -> FactState(allSup.map(u => stored(u)._1).min, allSup)
      }
      // non-retracted assertions: adopt (min valid_at, union episodes)
      for ((f, by) <- assertions if !retractions.contains(f)) {
        val tMin = by.map(batchTs).min
        facts.get(f) match {
          case Some(st) => facts += f -> FactState(math.min(st.validAt, tMin), st.episodes ++ by)
          case None     => facts += f -> FactState(tMin, by)
        }
      }
    }

    // contradiction rule: invalid_at = min STRICTLY later valid_at in the
    // (source, name) contention group (Invalidation.invalidate)
    facts.map { case (f @ (s, p, _), st) =>
      val later = facts.collect {
        case ((s2, p2, _), st2) if s2 == s && p2 == p && st2.validAt > st.validAt => st2.validAt
      }
      f -> (st.validAt, if (later.isEmpty) None else Some(later.min), st.episodes)
    }
  }

  // ---- alias spellings (canonical-remap interleavings): the alias page
  // keeps BOTH forms of Customer#1 live in every version (so the final
  // uuid_map component matches what a bulk rebuild over the final corpus
  // computes), while its objects rotate with the version — retractions
  // and invalidations churn inside the canonicalized contention groups.
  private val P1 = custs.head // "Customer#000000001"
  private val A1 = "Customer#1" // normName-linked alias spelling
  private lazy val c1Form = Seq(P1, A1).minBy(Ids.entity(G, _)) // min-uuid component canonical
  private def canonName(n: String): String = if (n == P1 || n == A1) c1Form else n
  private def canonTriple(t: (String, String, String)): (String, String, String) =
    (canonName(t._1), t._2, canonName(t._3))
  private val aliasUrl = "https://rd.example/alias"

  private def contentOfAlias(seed: Long, version: Int): Set[(String, String, String)] = {
    val rnd = new scala.util.Random(seed * 1000003L + 6 * 7919L + version * 104729L)
    val base = Set(
      (P1, "lives_in", nats(version % nats.size)),
      (A1, "works_at", sups(version % sups.size)),
    )
    val extra =
      if (rnd.nextDouble() < 0.5) Set((A1, "lives_in", nats(rnd.nextInt(nats.size)))) else Set.empty
    val extra2 =
      if (rnd.nextDouble() < 0.5) Set((custs(1 + rnd.nextInt(3)), "works_at", sups(rnd.nextInt(sups.size))))
      else Set.empty
    base ++ extra ++ extra2
  }

  private def runSchedule(seed: Long, aliasMode: Boolean = false): Unit = {
    val rnd = new scala.util.Random(seed)
    val version = scala.collection.mutable.Map.empty[Int, Int].withDefaultValue(0)
    val firstAliasBatch = if (aliasMode) rnd.nextInt(3) else -1
    val schedule: Seq[Seq[Page]] = (0 until 5).map { b =>
      val k = 1 + rnd.nextInt(if (aliasMode) 2 else 3)
      val picked = rnd.shuffle(urls.indices.toList).take(k).sorted
      val regular = picked.map { ui =>
        version(ui) += 1
        Page(urls(ui), 1000L + b * 100L + ui, contentOf(seed, ui, version(ui)))
      }
      val withAlias =
        aliasMode && (b == firstAliasBatch || (b > firstAliasBatch && rnd.nextDouble() < 0.4))
      if (withAlias) {
        version(6) += 1
        regular :+ Page(aliasUrl, 1000L + b * 100L + 6, contentOfAlias(seed, version(6)))
      } else regular
    }

    val inc = new SnapshotStore(spark, Files.createTempDirectory(s"rid$seed-i").toString)
    schedule.zipWithIndex.foreach { case (batch, b) =>
      IncrementalIngest.ingestBatch(inc, pagesDf(batch), b.toLong)
      if (b == 0) graft.search.SearchIndexes.build(inc) // exercise index refreshes from batch 1 on
    }

    val finalPages = schedule.flatten.groupBy(_.url).values.map(_.maxBy(_.off)).toSeq.sortBy(_.url)
    val bulk = new SnapshotStore(spark, Files.createTempDirectory(s"rid$seed-b").toString)
    new KgPipeline(bulk).run(pagesDf(finalPages), "all")

    // ---- 1. valid_at-independent surfaces converge to the bulk rebuild ----
    def rawKey(st: SnapshotStore) =
      st.load("raw_triples").select("url", "subj", "pred", "obj").collect().map(_.toString).toSet
    assert(rawKey(inc) == rawKey(bulk), s"seed=$seed: raw_triples kept stale facts")

    def mentionKey(st: SnapshotStore) =
      st.load("episodic_edges").select("episode_uuid", "entity_uuid").collect().map(_.toString).toSet
    assert(mentionKey(inc) == mentionKey(bulk), s"seed=$seed: stale MENTIONS rows")

    def nodeCounts(st: SnapshotStore) =
      st.load("nodes")
        .select(col("name"), element_at(col("attributes"), "mention_count"))
        .collect()
        .map(r => r.getString(0) -> r.getString(1))
        .toMap
    assert(nodeCounts(inc) == nodeCounts(bulk), s"seed=$seed: mention counts diverged")

    def factSupporters(st: SnapshotStore) =
      st.load("edges")
        .select(col("source_uuid"), col("name"), col("target_uuid"), col("episodes"))
        .collect()
        .map(r => ((r.getString(0), r.getString(1), r.getString(2)), r.getSeq[String](3).toSet))
        .toMap
    assert(factSupporters(inc) == factSupporters(bulk), s"seed=$seed: edge fact/supporter sets diverged")

    // ---- 2. lifecycle matches the replay model (NOT the bulk rebuild) ----
    val model = replay(schedule, if (aliasMode) canonTriple else identity).map {
      case ((s, p, o), (v, inv, sup)) =>
        (Ids.entity(G, s), p, Ids.entity(G, o)) ->
          ((ts(v), inv.map(ts), sup.map(u => Ids.episode(G, u))))
    }
    val got = inc
      .load("edges")
      .select(col("source_uuid"), col("name"), col("target_uuid"), col("valid_at"), col("invalid_at"), col("episodes"))
      .collect()
      .map(r =>
        (r.getString(0), r.getString(1), r.getString(2)) ->
          ((r.getTimestamp(3), Option(r.getTimestamp(4)), r.getSeq[String](5).toSet)))
      .toMap
    assert(got.keySet == model.keySet, s"seed=$seed: live fact set diverged from the replay model")
    for ((k, (mv, mi, ms)) <- model) {
      val (gv, gi, gs) = got(k)
      assert(gv == mv, s"seed=$seed: valid_at of $k: got $gv, model $mv (adoption/re-derivation broken)")
      assert(gi == mi, s"seed=$seed: invalid_at of $k: got $gi, model $mi")
      assert(gs == ms, s"seed=$seed: supporters of $k: got $gs, model $ms")
    }

    // ---- 3. derived surfaces consistent with the live edges ----
    val edges = inc.load("edges").select("uuid", "source_uuid", "target_uuid", "valid_at", "episodes").localCheckpoint()
    val expectedLists = edges
      .select(col("uuid").as("edge_uuid"), explode(col("episodes")).as("uuid"))
      .groupBy("uuid")
      .agg(array_sort(collect_set(col("edge_uuid"))).as("expected"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toSeq)
      .toMap
    val gotLists = inc
      .load("episode_entity_edges")
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toSeq)
      .toMap
    // every episode with edges must carry exactly its live list; edge-less
    // episodes carry an explicit empty list
    for ((ep, exp) <- expectedLists)
      assert(gotLists.getOrElse(ep, Nil) == exp, s"seed=$seed: entity_edges of $ep stale")
    for ((ep, lst) <- gotLists if !expectedLists.contains(ep))
      assert(lst.isEmpty, s"seed=$seed: entity_edges of edge-less episode $ep non-empty")

    val e = edges.select(col("source_uuid").as("src"), col("target_uuid").as("dst"))
    val expectedAdj = e
      .unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      .groupBy("src", "dst").agg(count(lit(1)).as("cnt"))
      .collect().map(_.toString).toSet
    val gotAdj = graft.search.SearchIndexes.adjacency(inc).collect().map(_.toString).toSet
    assert(gotAdj == expectedAdj, s"seed=$seed: graph_adj diverged from live edges")

    val probed = graft.search.SearchIndexes
      .edgesValidInRange(inc, Timestamp.valueOf("1970-01-01 00:00:00"), Timestamp.valueOf("2100-01-01 00:00:00"))
      .select("uuid").collect().map(_.getString(0)).toSet
    val live = edges.filter(col("valid_at").isNotNull).select("uuid").collect().map(_.getString(0)).toSet
    assert(probed == live, s"seed=$seed: edge_months diverged from live edges")
  }

  // one seed per mode in the default run (each schedule costs ~5
  // incremental batches + a bulk rebuild); GRAFT_TEST_SEED_OFFSET sweeps
  // fresh universes in CI without paying them on every local run
  test("random ingest/re-ingest schedules == bulk rebuild + replay model (seeded)") {
    runSchedule(5L + TestSeeds.offset)
  }

  test("alias-remap schedules: canonical merge × retraction == bulk rebuild + replay model (seeded)") {
    runSchedule(31L + TestSeeds.offset, aliasMode = true)
  }
}
