package graft.kg

import graft.{TestSeeds, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Randomized differential for [[Linking.duplicatePairs]] against an
  * independent in-memory brute-force model of the blocking contract:
  * two nodes are duplicates iff they share a group AND (their normalized
  * names are equal OR both have ≥2 word tokens with token-Jaccard ≥ 0.8).
  *
  * The engine's LSH path is probabilistic in THEORY (8 width-1 MinHash
  * bands; a Jaccard-0.8 pair escapes all bands with p ≤ 0.2^8 ≈ 2.6e-6)
  * but deterministic in fact (md5-based hashes, no RNG), so for a fixed
  * seed corpus the comparison is exact and stable — the same discipline
  * as the other seeded differentials (ReIngestDifferentialSpec etc.).
  */
class LinkingDifferentialSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def normName(s: String): String =
    "\\b0+(\\d)".r
      .replaceAllIn(s.toLowerCase.replaceAll("[^a-z0-9]+", " "), m => m.group(1))
      .replace(" ", "")

  private def tokens(s: String): Set[String] =
    s.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet

  private def jaccard(a: Set[String], b: Set[String]): Double =
    if (a.isEmpty && b.isEmpty) 0.0 else a.intersect(b).size.toDouble / a.union(b).size

  /** Random corpus: id-style names with padded/unpadded alias variants,
    * multi-word names drawn from a small shared vocabulary (so token sets
    * overlap heavily — the LSH-collision-rich regime), across two groups.
    */
  private def corpus(rnd: Random): Seq[(String, String, String)] = {
    val vocab = Vector("Global", "Acme", "Holdings", "Systems", "United", "Pacific", "Data", "Trading", "Partners", "Group")
    val names = Seq.newBuilder[String]
    (0 until 40).foreach { _ =>
      val id = rnd.nextInt(200)
      names += s"Customer#$id"
      if (rnd.nextBoolean()) names += f"Customer#$id%06d" // padded alias
    }
    (0 until 40).foreach { _ =>
      val k = 2 + rnd.nextInt(4)
      val ws = Seq.fill(k)(vocab(rnd.nextInt(vocab.size)))
      names += ws.mkString(" ")
      if (rnd.nextInt(3) == 0) names += ws.map(w => if (rnd.nextBoolean()) w.toLowerCase else w).mkString(" ") // case alias
    }
    val distinct = names.result().distinct
    distinct.map { n =>
      val g = if (rnd.nextBoolean()) "gA" else "gB"
      (Ids.entity(g, n), n, g)
    }
  }

  private def run(seed: Long): Int = {
    import spark.implicits._
    val rnd = new Random(seed)
    val rows = corpus(rnd)
    val nodes = rows.toDF("uuid", "name", "group_id")

    val got = Linking
      .duplicatePairs(nodes)
      .collect()
      .map(r => Set(r.getString(0), r.getString(1)))
      .toSet

    val want = (for {
      Seq((u1, n1, g1), (u2, n2, g2)) <- rows.combinations(2)
      if g1 == g2
      t1 = tokens(n1)
      t2 = tokens(n2)
      if normName(n1) == normName(n2) || (t1.size >= 2 && t2.size >= 2 && jaccard(t1, t2) >= 0.8)
    } yield Set(u1, u2)).toSet

    assert(got == want, s"seed=$seed: engine pairs != brute-force model")
    want.size
  }

  test("random alias corpora: duplicatePairs == brute-force norm/Jaccard model (seeded)") {
    val totalPairs = (1L to 3L).map(s => run(s + TestSeeds.offset)).sum
    // non-vacuous: the corpora must actually contain duplicate pairs
    assert(totalPairs > 10, s"differential is vacuous: only $totalPairs expected pairs across seeds")
  }

  test("groups isolate: identical names across groups never pair (seeded)") {
    import spark.implicits._
    val rnd = new Random(99L + TestSeeds.offset)
    val names = Seq.fill(30)(s"Customer#${rnd.nextInt(50)}").distinct ++ Seq("Acme Global", "Acme  Global")
    val rows = names.flatMap(n => Seq((Ids.entity("gA", n), n, "gA"), (Ids.entity("gB", n), n, "gB")))
    val nodes = rows.toDF("uuid", "name", "group_id")
    val byUuid = rows.map(r => r._1 -> r._3).toMap
    val crossed = Linking
      .duplicatePairs(nodes)
      .collect()
      .map(r => (byUuid(r.getString(0)), byUuid(r.getString(1))))
      .filter { case (a, b) => a != b }
    assert(crossed.isEmpty, "cross-group duplicate pairs must never form")
  }
}
