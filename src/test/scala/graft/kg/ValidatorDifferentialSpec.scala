package graft.kg

import java.nio.file.Files
import java.sql.Timestamp

import scala.util.Random

import graft.TestSpark
import graft.io.SnapshotStore
import org.scalatest.funsuite.AnyFunSuite

/** Top-level row shapes (Spark encoders cannot synthesize inner-class case
  * classes).
  */
case class VNode(
    uuid: String,
    name: Option[String],
    labels: Option[Seq[String]],
    attributes: Option[Map[String, String]],
    created_at: Option[Timestamp],
)
case class VEdge(
    uuid: String,
    group_id: String,
    source_uuid: Option[String],
    target_uuid: Option[String],
    name: String,
    fact: Option[String],
    valid_at: Timestamp,
    invalid_at: Option[Timestamp],
    episodes: Seq[String],
)
case class VEpisode(uuid: String)

/** Seeded randomized differential for the Validator (validator.py:127-757):
  * random node/edge/episode tables with randomly corrupted fields, each
  * rule's expected failure count computed by an independent in-memory
  * implementation over the same generated rows, compared against the
  * distributed report exactly. Random corruption hits rule interactions
  * (an empty source fails presence AND endpoint resolution; a null
  * endpoint group still keys multi-open detection) that one-violation
  * fixtures never exercise.
  */
class ValidatorDifferentialSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("validateAll failure counts match an in-memory model on randomly corrupted tables") {
    import spark.implicits._
    val rnd = new Random(90125L + graft.TestSeeds.offset)

    for (round <- 0 until 2) {
      val epIds = (0 until 5).map(i => s"ep$i")
      val nodeIds = (0 until 20).map(i => f"n$i%02d")

      def corrupt(p: Double) = rnd.nextDouble() < p

      val nodes = nodeIds.map { id =>
        VNode(
          // ~10%: reuse a fixed uuid to make duplicate groups
          if (corrupt(0.1)) "nDUP" else id,
          if (corrupt(0.15)) (if (rnd.nextBoolean()) None else Some("  ")) else Some(s"Entity $id"),
          if (corrupt(0.15)) (if (rnd.nextBoolean()) None else Some(Seq.empty)) else Some(Seq("Entity")),
          if (corrupt(0.15)) (if (rnd.nextBoolean()) None else Some(Map("other" -> "x")))
          else Some(Map("entity_type" -> "Entity")),
          if (corrupt(0.15)) None else Some(ts(100 + rnd.nextInt(100))),
        )
      }
      val nodeUuids = nodes.map(_.uuid)

      def endpoint(): Option[String] = rnd.nextInt(10) match {
        case 0 => None
        case 1 => Some("")
        case 2 => Some("ghost-" + rnd.nextInt(3))
        case _ => Some(nodeUuids(rnd.nextInt(nodeUuids.size)))
      }

      val edges = (0 until 25).map { i =>
        val va = 100 + rnd.nextInt(200)
        VEdge(
          f"e$i%02d",
          s"g${rnd.nextInt(2)}",
          endpoint(),
          endpoint(),
          s"rel${rnd.nextInt(3)}",
          if (corrupt(0.12)) (if (rnd.nextBoolean()) None else Some(" ")) else Some(s"fact $i"),
          ts(va.toLong),
          rnd.nextInt(3) match {
            case 0 => None // open
            case 1 => Some(ts(va + 1 + rnd.nextInt(50)))
            case _ => Some(ts(va - 1 - rnd.nextInt(50))) // inverted interval
          },
          Seq.fill(1 + rnd.nextInt(2))(
            if (corrupt(0.2)) s"ghost-ep${rnd.nextInt(3)}" else epIds(rnd.nextInt(epIds.size)),
          ),
        )
      }

      // ---- independent in-memory model of every rule ----
      val blank = (s: Option[String]) => s.isEmpty || s.get.trim.isEmpty
      val nodeUuidSet = nodeUuids.toSet
      val endpointOccurrences = edges.flatMap(e => Seq(e.source_uuid, e.target_uuid))
      val expect = Map(
        "entity_name_nonempty" -> nodes.count(n => blank(n.name)).toLong,
        "entity_has_label" -> nodes.count(n => n.labels.forall(_.isEmpty)).toLong,
        "entity_attributes_wellformed" -> nodes.count(n => n.attributes.forall(!_.contains("entity_type"))).toLong,
        "entity_temporal_sane" -> nodes.count(_.created_at.isEmpty).toLong,
        "entity_uuid_unique" -> nodeUuids.groupBy(identity).count(_._2.size > 1).toLong,
        "edge_source_present" -> edges.count(e => e.source_uuid.isEmpty || e.source_uuid.contains("")).toLong,
        "edge_target_present" -> edges.count(e => e.target_uuid.isEmpty || e.target_uuid.contains("")).toLong,
        "edge_fact_nonempty" -> edges.count(e => blank(e.fact)).toLong,
        "edge_temporal_interval" -> edges.count(e => e.invalid_at.exists(_.before(e.valid_at))).toLong,
        // failures are counted in EDGE units (one row per edge with ≥1
        // dangling endpoint / unresolved episode), never per exploded
        // occurrence — otherwise failures could exceed checked
        "edge_endpoints_resolve" ->
          edges.count(e =>
            Seq(e.source_uuid, e.target_uuid).exists(o => !o.exists(nodeUuidSet.contains)),
          ).toLong,
        "graph_no_orphan_nodes" ->
          nodes.count(n => !endpointOccurrences.flatten.toSet.contains(n.uuid)).toLong,
        "graph_episodes_resolve" ->
          edges.count(_.episodes.exists(!epIds.contains(_))).toLong,
        "graph_single_open_fact" ->
          edges
            .filter(_.invalid_at.isEmpty)
            .groupBy(e => (e.group_id, e.source_uuid, e.name))
            .count(_._2.size > 1)
            .toLong,
      )

      val store = new SnapshotStore(spark, Files.createTempDirectory(s"validator-diff$round").toString)
      store.commit(nodes.toDF(), "nodes", "fixture")
      store.commit(edges.toDF(), "edges", "fixture")
      store.commit(epIds.map(VEpisode).toDF(), "episodes", "fixture")

      val got = new Validator(store)
        .validateAll()
        .collect()
        .map(r => r.getAs[String]("rule") -> r.getAs[Long]("failures"))
        .toMap
      assert(got.keySet == expect.keySet, s"round $round: rule set mismatch")
      for ((rule, n) <- expect)
        assert(got(rule) == n, s"round $round: $rule expected $n got ${got(rule)}")
    }
  }
}
