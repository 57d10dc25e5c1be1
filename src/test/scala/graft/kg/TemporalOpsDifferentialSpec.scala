package graft.kg

import java.nio.file.Files
import java.sql.Timestamp

import graft.{TestSeeds, TestSpark}
import graft.io.SnapshotStore
import org.scalatest.funsuite.AnyFunSuite

/** Seeded randomized differential for the temporal analysis surface:
  * random bitemporal edge sets vs independent in-memory models of the
  * windowed-dedup and anomaly rules (the planted fixture in
  * TemporalOpsSpec pins known cases; these sweeps cover interval shapes
  * the fixture does not reach).
  */
class TemporalOpsDifferentialSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark


  private def t(h: Double) = new Timestamp(Fixtures.Epoch * 1000L + (h * 3600L * 1000L).toLong)

  private final case class E(
      uuid: String,
      src: String,
      rel: String,
      dst: String,
      createdH: Double,
      validH: Option[Double],
      invalidH: Option[Double],
  )

  private def randomEdges(seed: Long): Seq[E] = {
    val rnd = new scala.util.Random(seed)
    val srcs = Seq("A", "B", "C")
    val rels = Seq("r1", "r2")
    val dsts = Seq("X", "Y", "Z")
    (0 until 40).map { i =>
      val valid = if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(2000) * 1.0)
      val invalid = valid.filter(_ => rnd.nextInt(3) == 0).map(v => v + rnd.nextInt(100) - 20)
      E(f"e$i%03d", srcs(rnd.nextInt(3)), rels(rnd.nextInt(2)), dsts(rnd.nextInt(3)), rnd.nextInt(500) * 1.0, valid, invalid)
    }
  }

  private def commit(edges: Seq[E]): SnapshotStore = {
    val s = new SnapshotStore(spark, Files.createTempDirectory("topsdiff").toString)
    import spark.implicits._
    val rows = edges.map(e =>
      EntityEdge(
        e.uuid, e.src, e.dst, e.rel, s"${e.src} ${e.rel} ${e.dst}", "g", t(e.createdH),
        Seq(1f, 0f), Seq("ep"), None, e.validH.map(t), e.invalidH.map(t), None,
      ),
    )
    s.commit(rows.toDS().toDF(), "edges", "differential fixture")
    s
  }

  /** In-memory model of duplicateTemporalUuids: per (src, rel, dst) over
    * OPEN valid rows, those within windowH of the group max lose all but
    * the latest-created (ties: greater uuid kept — row_number orders by
    * created desc, uuid asc, so rank 1 is min uuid among ties).
    */
  private def modelDuplicates(edges: Seq[E], windowH: Double): Set[String] =
    edges
      .filter(e => e.validH.isDefined && e.invalidH.isEmpty)
      .groupBy(e => (e.src, e.rel, e.dst))
      .values
      .flatMap { grp =>
        val mx = grp.flatMap(_.validH).max
        val inWin = grp.filter(e => mx - e.validH.get <= windowH)
        if (inWin.size <= 1) Nil
        else {
          val keep = inWin.minBy(e => (-e.createdH, e.uuid)) // latest created, then min uuid
          inWin.filterNot(_ == keep).map(_.uuid)
        }
      }
      .toSet

  /** In-memory models of the four anomaly rules. */
  private def modelAnomalies(edges: Seq[E], gapDays: Int): Set[(String, String)] = {
    val out = scala.collection.mutable.Set.empty[(String, String)]
    // inconsistencies: invalid <= valid (both set). expired/created not
    // modeled — fixture rows never set expired_at
    edges.foreach { e =>
      for (v <- e.validH; iv <- e.invalidH) if (iv <= v) out += (("inconsistencies", e.uuid))
    }
    // per contention group (src, rel) ordered by (valid, uuid)
    edges
      .filter(_.validH.isDefined)
      .groupBy(e => (e.src, e.rel))
      .values
      .foreach { grp =>
        val sorted = grp.sortBy(e => (e.validH.get, e.uuid))
        sorted.sliding(2).foreach {
          case Seq(a, b) =>
            if (b.validH.get - a.validH.get > gapDays * 24.0)
              out += (("gaps", a.uuid))
            for (iv <- a.invalidH) if (b.validH.get < iv) out += (("overlaps", a.uuid))
          case _ => ()
        }
        // outliers: pop z-score over valid epochs, groups >= 3
        if (grp.size >= 3) {
          val xs = grp.map(_.validH.get)
          val mu = xs.sum / xs.size
          val sigma = math.sqrt(xs.map(x => (x - mu) * (x - mu)).sum / xs.size)
          if (sigma > 0)
            grp.foreach(e => if (math.abs(e.validH.get - mu) > 3 * sigma) out += (("outliers", e.uuid)))
        }
      }
    out.toSet
  }

  test("windowed temporal dedup matches the in-memory model (seeded sweep)") {
    for (seed <- Seq(7L, 23L, 91L).map(_ + TestSeeds.offset)) {
      val edges = randomEdges(seed)
      val s = commit(edges)
      val got = TemporalOps.duplicateTemporalUuids(s, windowHours = 48).collect().map(_.getString(0)).toSet
      assert(got == modelDuplicates(edges, 48.0), s"seed=$seed")
      s.deleteRoot()
    }
  }

  test("anomaly detection matches the in-memory models (seeded sweep)") {
    for (seed <- Seq(11L, 37L, 73L).map(_ + TestSeeds.offset)) {
      val edges = randomEdges(seed)
      val s = commit(edges)
      val got = TemporalOps
        .detectAnomalies(s, gapDays = 10)
        .collect()
        .map(r => (r.getString(0), r.getString(1)))
        .toSet
      assert(got == modelAnomalies(edges, 10), s"seed=$seed")
      s.deleteRoot()
    }
  }
}
