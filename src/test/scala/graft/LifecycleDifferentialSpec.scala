package graft

import java.nio.file.Files
import java.sql.Timestamp

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Seeded randomized differential test for the temporal-lifecycle surface
  * (setValidityPeriod / invalidateEdges / resolveConflicts / cleanupAged /
  * getValidAt, temporal_manager.py:137-1322): random op sequences over a
  * randomly seeded edges table, checked row-for-row after EVERY op against
  * an in-memory model of the documented semantics. Fixtures only cover the
  * interleavings someone thought of; the model checks all of them.
  *
  * Model semantics under test (see GraphitiSpark scaladoc):
  *  - setValidityPeriod: valid_at ← from; an explicit end OVERWRITES
  *    invalid_at, records manual_invalid_at, and caps expired_at (least);
  *  - invalidateEdges:   manual_invalid_at ← at; invalid_at/expired_at are
  *    capped with least(at, existing) — never reopened;
  *  - resolveConflicts:  groups = rows sharing (group_id, source_uuid,
  *    name, target_uuid); singletons untouched; ties in valid_at broken by
  *    uuid; merge keeps the earliest row widened to max non-null
  *    invalid_at (null only when every record is open);
  *  - cleanupAged: "old" = invalid_at non-null and < cutoff; soft flags
  *    archived in place, hard deletes; both return the count of rows
  *    MATCHING this call's cutoff (temporal_manager.py:1282 re-counts
  *    already-archived matches);
  *  - getValidAt: valid_at <= t < invalid_at (end-exclusive, null = open).
  */
class LifecycleDifferentialSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private case class M(
      uuid: String,
      group: String,
      src: String,
      name: String,
      dst: String,
      validAt: Long,
      invalidAt: Option[Long],
      expiredAt: Option[Long],
      manualInvalidAt: Option[Long],
      archived: Boolean,
  )

  private def minOpt(a: Long, b: Option[Long]): Option[Long] = Some(b.fold(a)(math.min(a, _)))

  /** The model row set, shaped like the edges table for comparison. */
  private def modelRows(m: Seq[M]): Set[(String, Long, Option[Long], Option[Long], Option[Long], Boolean)] =
    m.map(e => (e.uuid, e.validAt, e.invalidAt, e.expiredAt, e.manualInvalidAt, e.archived)).toSet

  private def tableRows(
      g: GraphitiSpark,
  ): Set[(String, Long, Option[Long], Option[Long], Option[Long], Boolean)] = {
    val df = g.store.load("edges")
    val cols = df.columns.toSet
    df.collect().map { r =>
      def t(c: String): Option[Long] =
        if (!cols.contains(c) || r.isNullAt(r.fieldIndex(c))) None
        else Some(r.getAs[Timestamp](c).getTime / 1000L)
      (
        r.getAs[String]("uuid"),
        r.getAs[Timestamp]("valid_at").getTime / 1000L,
        t("invalid_at"),
        t("expired_at"),
        t("manual_invalid_at"),
        cols.contains("archived") && r.getAs[Boolean]("archived"),
      )
    }.toSet
  }

  test("random lifecycle op sequences match the in-memory bitemporal model") {
    import spark.implicits._
    val rnd = new Random(20260818L + TestSeeds.offset)
    val groups = Seq("g1", "g2")
    val srcs = Seq("s1", "s2")
    val names = Seq("likes", "lives_in")
    val dsts = Seq("t1", "t2")

    var model: Seq[M] = (0 until 22).map { i =>
      val va = rnd.nextInt(1000).toLong
      val inv = if (rnd.nextBoolean()) Some(va + 1 + rnd.nextInt(500)) else None
      M(
        f"e$i%02d",
        groups(rnd.nextInt(2)),
        srcs(rnd.nextInt(2)),
        names(rnd.nextInt(2)),
        dsts(rnd.nextInt(2)),
        va,
        inv,
        None,
        None,
        archived = false,
      )
    }

    val g = new GraphitiSpark(spark, Files.createTempDirectory("lifecycle-diff").toString)
    g.store.commit(
      model
        .map(e => (e.uuid, e.group, e.src, e.name, e.dst, ts(e.validAt), e.invalidAt.map(ts), Option.empty[Timestamp]))
        .toDF("uuid", "group_id", "source_uuid", "name", "target_uuid", "valid_at", "invalid_at", "expired_at"),
      "edges",
      "differential fixture",
    )

    def groupKey(e: M) = (e.group, e.src, e.name, e.dst)

    for (step <- 0 until 30) {
      val uuids = model.map(_.uuid)
      rnd.nextInt(4) match {
        case 0 if uuids.nonEmpty => // setValidityPeriod
          val u = uuids(rnd.nextInt(uuids.size))
          val from = rnd.nextInt(1200).toLong
          val to = if (rnd.nextBoolean()) Some(from + 1 + rnd.nextInt(400)) else None
          g.setValidityPeriod(u, ts(from), to.map(ts))
          model = model.map { e =>
            if (e.uuid != u) e
            else
              to match {
                case Some(t) =>
                  e.copy(
                    validAt = from,
                    invalidAt = Some(t),
                    manualInvalidAt = Some(t),
                    expiredAt = minOpt(t, e.expiredAt),
                  )
                case None => e.copy(validAt = from)
              }
          }
        case 1 if uuids.nonEmpty => // invalidateEdges
          val n = 1 + rnd.nextInt(3)
          val picked = rnd.shuffle(uuids).take(n)
          val at = rnd.nextInt(1500).toLong
          g.invalidateEdges(picked, ts(at), s"diff step $step")
          model = model.map { e =>
            if (!picked.contains(e.uuid)) e
            else
              e.copy(
                manualInvalidAt = Some(at),
                invalidAt = minOpt(at, e.invalidAt),
                expiredAt = minOpt(at, e.expiredAt),
              )
          }
        case 2 => // resolveConflicts
          val strategy = Seq("first_wins", "last_wins", "merge", "invalidate")(rnd.nextInt(4))
          val now = (1500 + rnd.nextInt(500)).toLong
          g.resolveConflicts(strategy, ts(now))
          val byKey = model.groupBy(groupKey)
          model = byKey.toSeq.flatMap { case (_, rows) =>
            if (rows.size == 1) rows
            else {
              val asc = rows.sortBy(e => (e.validAt, e.uuid))
              strategy match {
                case "first_wins" =>
                  asc.head +: asc.tail.map(e => e.copy(expiredAt = minOpt(now, e.expiredAt)))
                case "last_wins" =>
                  asc.init.map(e => e.copy(expiredAt = minOpt(now, e.expiredAt))) :+ asc.last
                case "invalidate" =>
                  asc.map(e => e.copy(expiredAt = minOpt(now, e.expiredAt)))
                case "merge" =>
                  val maxInv = rows.flatMap(_.invalidAt) match {
                    case Nil => None
                    case xs => Some(xs.max)
                  }
                  Seq(asc.head.copy(invalidAt = maxInv))
              }
            }
          }
        case _ => // cleanupAged
          val cutoff = rnd.nextInt(1500).toLong
          val old = (e: M) => e.invalidAt.exists(_ < cutoff)
          if (rnd.nextBoolean()) {
            val archived = g.cleanupAged("soft", ts(cutoff))
            // records_cleaned = rows matching THIS cutoff (the reference
            // re-counts already-archived matches, temporal_manager.py:1282)
            val expectMatched = model.count(old).toLong
            model = model.map(e => if (old(e)) e.copy(archived = true) else e)
            assert(archived == expectMatched, s"step $step: soft count")
          } else {
            val removed = g.cleanupAged("hard", ts(cutoff))
            val expectRemoved = model.count(old).toLong
            model = model.filterNot(old)
            assert(removed == expectRemoved, s"step $step: hard count")
          }
      }

      assert(tableRows(g) == modelRows(model), s"step $step: table diverged from model")

      // two random point-in-time probes per step
      if (model.nonEmpty) {
        for (_ <- 0 until 2) {
          val e = model(rnd.nextInt(model.size))
          val t = rnd.nextInt(1800).toLong
          val expect = e.validAt <= t && e.invalidAt.forall(_ > t)
          assert(
            g.getValidAt(e.uuid, ts(t)).isDefined == expect,
            s"step $step: getValidAt(${e.uuid}, $t) expected $expect",
          )
        }
      }
    }
  }
}
