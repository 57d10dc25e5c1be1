package graft.io

import java.nio.file.{Files, Path}

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Bucketed merge-on-read snapshots: rewrite ∝ touched buckets, untouched
  * buckets carried by manifest reference (zero copy).
  */
class BucketedStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshStore(): (SnapshotStore, Path) = {
    val root = Files.createTempDirectory("bstore")
    (new SnapshotStore(spark, root.toString), root)
  }

  private def rowsOf(store: SnapshotStore, t: String): Map[Long, String] =
    store.load(t).collect().map(r => r.getAs[Long]("k") -> r.getAs[String]("v")).toMap

  test("bucketed merge ≡ naive merge (upsert semantics), across several batches") {
    val (bs, _) = freshStore()
    val (ns, _) = freshStore()
    val base = (0L until 500L).map(i => (i, s"v$i")).toDF("k", "v")
    bs.mergeBucketed("t", base, Seq("k"), "base", numBuckets = 16)
    ns.merge("t", base, Seq("k"), "base")
    val batches = Seq(
      Seq((3L, "x3"), (77L, "x77"), (501L, "new501")),
      Seq((77L, "y77"), (502L, "new502")),
      Seq((0L, "z0")),
    )
    batches.foreach { b =>
      bs.mergeBucketed("t", b.toDF("k", "v"), Seq("k"), "batch", numBuckets = 16)
      ns.merge("t", b.toDF("k", "v"), Seq("k"), "batch")
    }
    assert(rowsOf(bs, "t") == rowsOf(ns, "t"))
    assert(rowsOf(bs, "t")(77L) == "y77" && rowsOf(bs, "t").size == 502)
  }

  test("untouched buckets are NOT rewritten: new version holds only touched bucket dirs") {
    val (bs, root) = freshStore()
    val base = (0L until 500L).map(i => (i, s"v$i")).toDF("k", "v")
    bs.mergeBucketed("t", base, Seq("k"), "base", numBuckets = 16)
    val v0Buckets = Files.list(root.resolve("t").resolve("v=0")).iterator().asScala
      .map(_.getFileName.toString).count(_.startsWith("__bucket="))
    assert(v0Buckets == 16, "base load populates every bucket")

    bs.mergeBucketed("t", Seq((3L, "x3")).toDF("k", "v"), Seq("k"), "one row", numBuckets = 16)
    val v1Buckets = Files.list(root.resolve("t").resolve("v=1")).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("__bucket=")).toSeq
    assert(v1Buckets.size == 1, s"a 1-row batch must rewrite exactly 1 bucket, got $v1Buckets")
    // data still complete via manifest references into v=0
    assert(rowsOf(bs, "t").size == 500 && rowsOf(bs, "t")(3L) == "x3")
  }

  test("deleteKeys removes rows without re-inserting") {
    val (bs, _) = freshStore()
    bs.mergeBucketed("t", (0L until 100L).map(i => (i, s"v$i")).toDF("k", "v"), Seq("k"), "base", numBuckets = 8)
    bs.mergeBucketed(
      "t",
      Seq((5L, "upd5")).toDF("k", "v"),
      Seq("k"),
      "upsert+delete",
      numBuckets = 8,
      deleteKeys = Some(Seq(Tuple1(7L)).toDF("k")),
    )
    val got = rowsOf(bs, "t")
    assert(!got.contains(7L) && got(5L) == "upd5" && got.size == 99)
  }

  test("legacy plain-commit table upgrades transparently on first bucketed merge") {
    val (bs, _) = freshStore()
    bs.commit((0L until 50L).map(i => (i, s"v$i")).toDF("k", "v"), "t", "plain")
    bs.mergeBucketed("t", Seq((1L, "x1"), (50L, "new")).toDF("k", "v"), Seq("k"), "upgrade", numBuckets = 8)
    val got = rowsOf(bs, "t")
    assert(got.size == 51 && got(1L) == "x1" && got(0L) == "v0")
  }

  test("rollback re-points to an older bucketed snapshot") {
    val (bs, _) = freshStore()
    bs.mergeBucketed("t", Seq((1L, "a")).toDF("k", "v"), Seq("k"), "v0", numBuckets = 4)
    bs.mergeBucketed("t", Seq((1L, "b")).toDF("k", "v"), Seq("k"), "v1", numBuckets = 4)
    assert(rowsOf(bs, "t")(1L) == "b")
    bs.rollback("t", 0)
    assert(rowsOf(bs, "t")(1L) == "a")
  }

  test("non-unique keys: all old rows of a matching key are replaced (group-replace)") {
    val (bs, _) = freshStore()
    val base = Seq((1L, "g1-a"), (1L, "g1-b"), (2L, "g2-a")).toDF("k", "v")
    bs.mergeBucketed("t", base, Seq("k"), "base", numBuckets = 4)
    bs.mergeBucketed("t", Seq((1L, "g1-rebuilt")).toDF("k", "v"), Seq("k"), "rebuild", numBuckets = 4)
    val got = bs.load("t").collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("v"))).toSet
    assert(got == Set((1L, "g1-rebuilt"), (2L, "g2-a")))
  }
}
