package graft.kg

import java.sql.Timestamp

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential testing of the bitemporal dedupe+invalidate algebra
  * against a direct in-memory model of the reference semantics
  * (`resolve_extracted_edge` dedupe, `edge_operations.py:414-535`;
  * `resolve_edge_contradictions` strict-inequality invalidation,
  * `edge_operations.py:381-411`): seeded random fact sets exercising
  * ties, re-assertions, manual invalidations and singleton groups at
  * once — the fixture specs pin each rule, this pins their composition
  * over arbitrary interleavings. Also: results must be invariant to
  * input partitioning (determinism on a cluster is a correctness
  * property, not a given).
  */
// top level: Spark encoders cannot synthesize inner-class instances
final case class InvalidationDifferentialFact(
    group_id: String,
    source_uuid: String,
    name: String,
    target_uuid: String,
    fact: String,
    valid_at: Timestamp,
    created_at: Timestamp,
    episodes: Seq[String],
    manual_invalid_at: Option[Timestamp],
)

class InvalidationDifferentialSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private type Fact = InvalidationDifferentialFact
  private val Fact = InvalidationDifferentialFact

  /** (valid_at, created_at, episodes, manual, invalid_at, expired_at) per
    * (g, s, n, t) — the full observable state of one deduped edge.
    */
  private type Key = (String, String, String, String)
  private type State = (Long, Long, Seq[String], Option[Long], Option[Long], Option[Long])

  /** The in-memory model: dedupe re-assertions per (g,s,n,t) to the
    * earliest valid_at/created_at with unioned episodes and the earliest
    * manual invalidation, then close each fact at the minimum STRICTLY
    * later valid_at within its (g,s,n) contention group, capped by the
    * manual invalidation if that is earlier.
    */
  private def model(facts: Seq[Fact]): Map[Key, State] = {
    val deduped: Map[Key, (Long, Long, Seq[String], Option[Long])] =
      facts.groupBy(f => (f.group_id, f.source_uuid, f.name, f.target_uuid)).map { case (k, fs) =>
        k -> (
          fs.map(_.valid_at.getTime).min,
          fs.map(_.created_at.getTime).min,
          fs.flatMap(_.episodes).distinct.sorted,
          fs.flatMap(_.manual_invalid_at.map(_.getTime)) match {
            case Nil => None
            case ms => Some(ms.min)
          },
        )
      }
    deduped.map { case (k @ (g, s, n, _), (v, c, eps, manual)) =>
      val groupTimes = deduped.collect { case ((g2, s2, n2, _), (v2, _, _, _)) if (g2, s2, n2) == ((g, s, n)) => v2 }
      val contradiction = groupTimes.filter(_ > v) match {
        case ts if ts.isEmpty => None
        case ts => Some(ts.min)
      }
      val invalid = (contradiction, manual) match {
        case (Some(a), Some(b)) => Some(math.min(a, b))
        case (a, b) => a.orElse(b)
      }
      k -> ((v, c, eps, manual, invalid, invalid))
    }
  }

  private def randomFacts(seed: Long): Seq[Fact] = {
    val rnd = new scala.util.Random(seed)
    // 4 event times only → guaranteed valid_at ties within groups; 3
    // possible targets → guaranteed same-target re-assertions (dedupe)
    val times = (0 until 4).map(i => Timestamp.valueOf(f"2024-01-${10 + i * 7}%02d 00:00:00"))
    (0 until 120).map { i =>
      val g = s"g${rnd.nextInt(2)}"
      val s = s"src${rnd.nextInt(6)}"
      val n = Seq("lives_in", "works_at")(rnd.nextInt(2))
      val t = s"tgt${rnd.nextInt(3)}"
      Fact(
        group_id = g,
        source_uuid = s,
        name = n,
        target_uuid = t,
        fact = s"$s $n $t.",
        valid_at = times(rnd.nextInt(times.size)),
        created_at = times(rnd.nextInt(times.size)),
        episodes = Seq.fill(1 + rnd.nextInt(2))(s"ep${rnd.nextInt(20)}").distinct,
        manual_invalid_at =
          if (rnd.nextInt(8) == 0) Some(Timestamp.valueOf("2024-01-15 00:00:00")) else None,
      )
    }
  }

  private def run(facts: Seq[Fact], partitions: Int): Map[Key, State] =
    Invalidation
      .dedupeAndInvalidate(facts.toDF().repartition(partitions))
      .collect()
      .map { r =>
        val key = (r.getAs[String]("group_id"), r.getAs[String]("source_uuid"), r.getAs[String]("name"), r.getAs[String]("target_uuid"))
        def ts(c: String): Option[Long] = Option(r.getAs[Timestamp](c)).map(_.getTime)
        key -> ((
          r.getAs[Timestamp]("valid_at").getTime,
          r.getAs[Timestamp]("created_at").getTime,
          r.getAs[Seq[String]]("episodes"),
          ts("manual_invalid_at"),
          ts("invalid_at"),
          ts("expired_at"),
        ))
      }
      .toMap

  test("dedupeAndInvalidate == in-memory reference model on seeded random fact sets") {
    for (seed <- Seq(1L, 7L, 99L)) {
      val facts = randomFacts(seed)
      val got = run(facts, partitions = 5)
      val want = model(facts)
      assert(got.keySet == want.keySet, s"seed=$seed: deduped key sets differ")
      for ((k, w) <- want)
        assert(got(k) == w, s"seed=$seed key=$k: got ${got(k)}, want $w")
    }
  }

  test("result is invariant to input partitioning (1 vs 13 partitions)") {
    val facts = randomFacts(5L)
    assert(run(facts, partitions = 1) == run(facts, partitions = 13))
  }
}
