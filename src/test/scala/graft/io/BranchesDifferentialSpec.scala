package graft.io

import java.nio.file.Files
import java.sql.Timestamp

import scala.util.Random

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Row content for the branched table (top-level: Spark encoders cannot
  * synthesize inner-class case classes).
  */
case class BranchRow(uuid: String, value: String, created_at: Timestamp, priority: Int)

/** Seeded randomized differential test for the branch-per-writer
  * concurrency layer (concurrency_manager.py:225-857): random interleaved
  * branch creates / isolated commits / merges (all four strategies) /
  * deletes, with EVERY live branch's view compared row-for-row against an
  * in-memory model after each op, and merge conflict/added/resolved counts
  * checked against the model's.
  *
  * Model semantics (see Branches scaladoc): a branch pins snapshot
  * versions; commits move only the branch's pins; merge adds source-only
  * rows, keeps untouched target rows, and resolves same-uuid differing-
  * content conflicts per strategy (auto = incoming wins, timestamp =
  * later created_at wins with source winning ties, priority = higher
  * priority wins with source winning ties, manual = target kept and
  * conflicts reported unresolved).
  */
class BranchesDifferentialSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def load(b: Branches, branch: String): Map[String, BranchRow] = {
    import spark.implicits._
    b.load(branch, "edges").as[BranchRow].collect().map(r => r.uuid -> r).toMap
  }

  test("random branch create/commit/merge/delete sequences match the in-memory model") {
    import spark.implicits._
    val rnd = new Random(424242L + graft.TestSeeds.offset)
    val store = new SnapshotStore(spark, Files.createTempDirectory("branches-diff").toString)
    val b = new Branches(store)

    var nextUuid = 0
    def freshRow(): BranchRow = {
      val r = BranchRow(f"u$nextUuid%03d", s"v${rnd.nextInt(1000)}", ts(rnd.nextInt(2000).toLong), rnd.nextInt(10))
      nextUuid += 1
      r
    }

    // seed main
    val seed = (0 until 12).map(_ => freshRow())
    store.commit(seed.toDF(), "edges", "seed")
    val model = scala.collection.mutable.Map[String, Map[String, BranchRow]]("main" -> seed.map(r => r.uuid -> r).toMap)
    var branchN = 0

    def checkAll(step: Int): Unit =
      model.keys.foreach { br =>
        assert(load(b, br) == model(br), s"step $step: branch $br diverged from model")
      }

    for (step <- 0 until 24) {
      val branches = model.keys.toSeq.sorted
      rnd.nextInt(4) match {
        case 0 if model.size < 4 => // createBranch from a random parent
          val parent = branches(rnd.nextInt(branches.size))
          val name = s"br$branchN"
          branchN += 1
          b.createBranch(name, parent, tables = Seq("edges"))
          model(name) = model(parent)

        case 1 => // commit to a random branch: upsert modified + new rows
          val br = branches(rnd.nextInt(branches.size))
          val cur = model(br)
          val modified = rnd
            .shuffle(cur.values.toSeq)
            .take(rnd.nextInt(3))
            .map(r => r.copy(value = s"v${rnd.nextInt(1000)}", created_at = ts(rnd.nextInt(2000).toLong)))
          val added = (0 until rnd.nextInt(3)).map(_ => freshRow())
          val next = cur ++ (modified ++ added).map(r => r.uuid -> r)
          b.commitToBranch(br, "edges", next.values.toSeq.toDF(), s"step $step")
          model(br) = next

        case 2 if model.size > 1 => // merge a random branch pair
          val others = branches.filterNot(_ == "main")
          val source = others(rnd.nextInt(others.size))
          val target = {
            val cands = branches.filterNot(_ == source)
            cands(rnd.nextInt(cands.size))
          }
          val strategy = Seq("auto", "timestamp", "priority", "manual")(rnd.nextInt(4))
          val res = b.mergeBranch(source, target, "edges", strategy)

          val src = model(source)
          val tgt = model(target)
          val conflicts = (src.keySet & tgt.keySet).filter(k => src(k) != tgt(k))
          val srcOnly = src.keySet -- tgt.keySet
          val winners: Map[String, BranchRow] = strategy match {
            case "manual" => conflicts.map(k => k -> tgt(k)).toMap
            case "auto" => conflicts.map(k => k -> src(k)).toMap
            case "timestamp" =>
              conflicts.map { k =>
                k -> (if (!src(k).created_at.before(tgt(k).created_at)) src(k) else tgt(k))
              }.toMap
            case "priority" =>
              conflicts.map(k => k -> (if (src(k).priority >= tgt(k).priority) src(k) else tgt(k))).toMap
          }
          model(target) = (tgt -- conflicts) ++ winners ++ srcOnly.map(k => k -> src(k))
          assert(res.added == srcOnly.size.toLong, s"step $step: merge added count")
          assert(res.conflicts == conflicts.size.toLong, s"step $step: merge conflict count")
          assert(
            res.resolved == (if (strategy == "manual") 0L else conflicts.size.toLong),
            s"step $step: merge resolved count",
          )

        case _ if model.size > 1 => // delete a random non-main branch
          val others = branches.filterNot(_ == "main")
          val victim = others(rnd.nextInt(others.size))
          b.deleteBranch(victim)
          model.remove(victim)

        case _ => // nothing applicable this step
      }
      checkAll(step)
    }

    assert(b.listBranches().toSet == model.keySet, "branch listing matches model")
  }
}
