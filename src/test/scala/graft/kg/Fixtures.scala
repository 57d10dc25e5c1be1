package graft.kg

import java.sql.Timestamp

import graft.TestSpark
import org.apache.spark.sql.DataFrame

/** Deterministic tiny web corpus (FIXTURES.md §1): gazetteer entities with
  * Zipf-ish repetition, alias spellings of the same entity (unpadded ids),
  * and a controlled contradiction (same (subj, pred), different obj at a
  * later warc_ts). Golden triples are derived from the same generation
  * rules — the corpus-level ground truth for P/R.
  */
object Fixtures {

  val Epoch = 1704067200L // 2024-01-01T00:00:00Z

  def ts(offsetSec: Long): Timestamp = new Timestamp((Epoch + offsetSec) * 1000L)

  /** (url, warc_ts offset, body sentence(s), golden triples for the page) */
  case class Page(url: String, off: Long, body: String, golden: Seq[(String, String, String)])

  val pages: Seq[Page] = {
    val ents = (1 to 20).map(i => f"Customer#$i%09d")
    val aliases = ents.map(e => e.replaceAll("#0+", "#")) // Customer#1 …
    val nations = (0 until 5).map(i => s"NATION_$i")
    val canon = (e: String) => e // canonical surface = padded form
    val base = ents.zipWithIndex.map { case (e, i) =>
      val n = nations(i % 5)
      Page(
        s"https://t.example/c/$i",
        i * 60L,
        s"$e lives in $n. $e works at Supplier#${i % 3}.",
        Seq((e, "lives_in", n), (e, "works_at", s"Supplier#${i % 3}")),
      )
    }
    // alias pages: every 4th entity re-asserted under its alias spelling
    val alias = ents.zipWithIndex.collect {
      case (e, i) if i % 4 == 0 =>
        val a = aliases(i)
        val n = nations(i % 5)
        Page(
          s"https://t.example/alias/$i",
          2000L + i * 60L,
          s"$a lives in $n.",
          Seq((e, "lives_in", n)), // canonicalizes onto the padded entity
        )
    }
    // contradictions: entities 2 and 6 move to the next nation later
    val moved = Seq(2, 6).map { i =>
      val e = ents(i)
      val n2 = nations((i + 1) % 5)
      Page(
        s"https://t.example/move/$i",
        86400L + i * 60L,
        s"$e lives in $n2.",
        Seq((e, "lives_in", n2)),
      )
    }
    base ++ alias ++ moved
  }

  /** pages frame in the driver-contract schema (html binary, text null). */
  def pagesDf(): DataFrame = {
    val spark = TestSpark.spark
    import spark.implicits._
    pages
      .map { p =>
        val html =
          s"<html><head><title>t</title></head><body><p>${p.body}</p></body></html>".getBytes("UTF-8")
        (p.url, ts(p.off), html, null.asInstanceOf[String], "en")
      }
      .toDF("url", "warc_ts", "html", "text", "lang")
  }

  /** Canonical surface for an entity: among its known alias spellings the
    * one with the lexicographically smallest deterministic uuid — the
    * compress_uuid_map rule (`bulk_utils.py:455-470`) applied to our
    * content-hash ids.
    */
  def canonSurface(padded: String, hasAlias: Boolean): String = {
    val surfaces = if (hasAlias) Seq(padded, padded.replaceAll("#0+", "#")) else Seq(padded)
    surfaces.minBy(s => Ids.entity("default", s))
  }

  /** Golden canonical triple set (alias surfaces resolved by min-uuid). */
  def goldenTriples: Set[(String, String, String)] = {
    val aliased = (1 to 20).zipWithIndex.collect {
      case (_, i) if i % 4 == 0 => f"Customer#${i + 1}%09d"
    }.toSet
    def canon(s: String): String =
      if (s.startsWith("Customer#")) canonSurface(s, aliased.contains(s)) else s
    pages.flatMap(_.golden).map { case (s, p, o) => (canon(s), p, canon(o)) }.toSet
  }
}
