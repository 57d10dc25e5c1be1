package graft.io

import java.nio.file.Files
import java.sql.Timestamp

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Branch-per-writer concurrency: isolation, row-level merge strategies,
  * optimistic locking, buffered transactions
  * (concurrency_manager.py:225-857).
  */
class BranchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def freshStore(): (SnapshotStore, Branches) = {
    val store = new SnapshotStore(spark, Files.createTempDirectory("branches").toString)
    val edges = Seq(
      ("e1", "f1", ts(100)),
      ("e2", "f2", ts(100)),
    ).toDF("uuid", "fact", "created_at")
    store.commit(edges, "edges", "base")
    (store, new Branches(store))
  }

  test("branch commits are isolated from main until merge") {
    val (store, br) = freshStore()
    br.createBranch("writerA", tables = Seq("edges"))
    br.commitToBranch("writerA", "edges", Seq(("e3", "f3", ts(200))).toDF("uuid", "fact", "created_at")
      .unionByName(br.load("writerA", "edges")), "add e3")
    assert(store.load("edges").count() == 2, "main unchanged")
    assert(br.load("writerA", "edges").count() == 3)
    assert(br.listBranches() == Seq("main", "writerA"))
  }

  test("merge auto: incoming wins conflicts, source-only rows added") {
    val (store, br) = freshStore()
    br.createBranch("b", tables = Seq("edges"))
    val branchEdges = Seq(
      ("e1", "f1-branch", ts(300)), // conflicting content
      ("e2", "f2", ts(100)), // identical → not a conflict
      ("e3", "f3", ts(200)), // new
    ).toDF("uuid", "fact", "created_at")
    br.commitToBranch("b", "edges", branchEdges, "branch work")
    val r = br.mergeBranch("b", "main", "edges", "auto")
    assert(r.added == 1 && r.conflicts == 1 && r.resolved == 1)
    val m = store.load("edges").collect().map(x => x.getString(0) -> x.getString(1)).toMap
    assert(m == Map("e1" -> "f1-branch", "e2" -> "f2", "e3" -> "f3"))
  }

  test("merge timestamp: later created_at wins per conflicting row") {
    val (store, br) = freshStore()
    // main advances e1 AFTER the branch fork
    br.createBranch("b", tables = Seq("edges"))
    store.commit(
      Seq(("e1", "f1-main-newer", ts(500)), ("e2", "f2", ts(100))).toDF("uuid", "fact", "created_at"),
      "edges", "main advance",
    )
    br.commitToBranch(
      "b", "edges",
      Seq(("e1", "f1-branch-older", ts(300)), ("e2", "f2", ts(100))).toDF("uuid", "fact", "created_at"),
      "branch work",
    )
    br.mergeBranch("b", "main", "edges", "timestamp")
    val m = store.load("edges").collect().map(x => x.getString(0) -> x.getString(1)).toMap
    assert(m("e1") == "f1-main-newer", "later target row must win under timestamp strategy")
  }

  test("merge timestamp: null created_at never drops the conflict row") {
    val (store, br) = freshStore()
    br.createBranch("b", tables = Seq("edges"))
    // target e1 has a NULL created_at; source e1 has one → source wins.
    // target e2 non-null vs source NULL → target wins. Both rows must
    // SURVIVE (a null comparison used to exclude the row from both winner
    // filters while the anti-join removed it from the untouched set).
    store.commit(
      Seq(("e1", "f1-main", None: Option[Timestamp]), ("e2", "f2-main", Some(ts(400))))
        .toDF("uuid", "fact", "created_at"),
      "edges", "main advance",
    )
    br.commitToBranch(
      "b", "edges",
      Seq(("e1", "f1-branch", Some(ts(300))), ("e2", "f2-branch", None: Option[Timestamp]))
        .toDF("uuid", "fact", "created_at"),
      "branch work",
    )
    val r = br.mergeBranch("b", "main", "edges", "timestamp")
    assert(r.conflicts == 2 && r.resolved == 2)
    val m = store.load("edges").collect().map(x => x.getString(0) -> x.getString(1)).toMap
    assert(m == Map("e1" -> "f1-branch", "e2" -> "f2-main"))
  }

  test("merge priority: null priority never drops the conflict row") {
    val (store, br) = freshStore()
    val withPrio = (rows: Seq[(String, String, Option[Int])]) =>
      rows.toDF("uuid", "fact", "priority").withColumn("created_at", lit(ts(100)))
    store.commit(withPrio(Seq(("e1", "f1-main", None), ("e2", "f2-main", Some(9)))), "edges", "prio base")
    val br2 = new Branches(store)
    br2.createBranch("p", tables = Seq("edges"))
    br2.commitToBranch(
      "p", "edges",
      withPrio(Seq(("e1", "f1-branch", Some(1)), ("e2", "f2-branch", None))),
      "branch work",
    )
    val r = br2.mergeBranch("p", "main", "edges", "priority")
    assert(r.conflicts == 2 && r.resolved == 2)
    val m = store.load("edges").collect().map(x => x.getString(0) -> x.getString(1)).toMap
    assert(m == Map("e1" -> "f1-branch", "e2" -> "f2-main"))
  }

  test("merge priority: column missing on the TARGET side falls back to source-wins") {
    // a branch created after a schema migration can carry `priority` while
    // the target's pinned snapshot predates it — the strategy must fall
    // back instead of throwing on the target's missing column
    val (store, br) = freshStore()
    store.commit(Seq(("e1", "f1-main")).toDF("uuid", "fact").withColumn("created_at", lit(ts(100))), "edges", "base")
    val br2 = new Branches(store)
    br2.createBranch("p2", tables = Seq("edges"))
    br2.commitToBranch(
      "p2", "edges",
      Seq(("e1", "f1-branch", 5)).toDF("uuid", "fact", "priority").withColumn("created_at", lit(ts(100))),
      "branch adds priority column",
    )
    val r = br2.mergeBranch("p2", "main", "edges", "priority")
    assert(r.conflicts == 1 && r.resolved == 1)
    val m = store.load("edges").collect().map(x => x.getString(0) -> x.getString(1)).toMap
    assert(m == Map("e1" -> "f1-branch"))
  }

  test("merge manual: target kept, conflicts reported unresolved") {
    val (store, br) = freshStore()
    br.createBranch("b", tables = Seq("edges"))
    br.commitToBranch(
      "b", "edges",
      Seq(("e1", "f1-branch", ts(300)), ("e2", "f2", ts(100))).toDF("uuid", "fact", "created_at"),
      "branch work",
    )
    val r = br.mergeBranch("b", "main", "edges", "manual")
    assert(r.conflicts == 1 && r.resolved == 0)
    assert(store.load("edges").collect().map(_.getString(1)).toSet.contains("f1"), "target row kept")
  }

  test("optimistic locking: stale expected version is rejected") {
    val (store, br) = freshStore()
    val v = store.currentVersion("edges").get
    assert(br.checkVersion("edges", v))
    // writer 1 succeeds with CAS
    br.commitWithLock(store.load("edges"), "edges", "w1", v)
    // writer 2 read v earlier → now stale
    intercept[java.util.ConcurrentModificationException] {
      br.commitWithLock(store.load("edges"), "edges", "w2", v)
    }
  }

  test("transaction publishes all tables only at commit; rollback publishes nothing") {
    val (store, br) = freshStore()
    store.commit(Seq(("n1", "NodeOne")).toDF("uuid", "name"), "nodes", "base")
    val txn = br.beginTransaction()
    txn.write("edges", Seq(("e9", "f9", ts(900))).toDF("uuid", "fact", "created_at"))
    txn.write("nodes", Seq(("n9", "NodeNine")).toDF("uuid", "name"))
    assert(store.load("edges").count() == 2 && store.load("nodes").count() == 1, "nothing visible pre-commit")
    val versions = txn.commit("atomic 2-table write")
    assert(versions.keySet == Set("edges", "nodes"))
    assert(store.load("edges").count() == 1 && store.load("nodes").count() == 1)
    assert(store.load("edges").collect()(0).getString(0) == "e9")

    val txn2 = br.beginTransaction()
    txn2.write("edges", Seq(("eX", "fX", ts(999))).toDF("uuid", "fact", "created_at"))
    txn2.rollback()
    assert(store.load("edges").collect()(0).getString(0) == "e9", "rollback leaves pointers alone")
  }

  test("concurrencyStats: per-branch rows, open-transaction and branch totals") {
    val (store, br) = freshStore()
    br.createBranch("w1")
    val txn = br.beginTransaction()
    val rows = br.concurrencyStats().collect()
    assert(rows.map(_.getAs[String]("branch")).toSet == Set("main", "w1"))
    assert(rows.forall(_.getAs[Int]("total_branches") == 2))
    assert(rows.forall(_.getAs[Int]("active_transactions") == 1))
    val w1 = rows.find(_.getAs[String]("branch") == "w1").get
    assert(w1.getAs[String]("parent") == "main")
    txn.rollback()
    assert(br.concurrencyStats().collect().forall(_.getAs[Int]("active_transactions") == 0))
  }
}
