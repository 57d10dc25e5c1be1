package graft.io

import java.nio.file.{Files, Path}

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite


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

  test("bucket-count change (the -Dgraft.buckets knob) folds the table once, loses nothing") {
    val (bs, _) = freshStore()
    bs.mergeBucketed("t", (0L until 300L).map(i => (i, s"v$i")).toDF("k", "v"), Seq("k"), "base", numBuckets = 16)
    // merge under a DIFFERENT count: layout change → one-time full fold
    // at the new count (never a silent mixed layout / stale-row leak)
    bs.mergeBucketed("t", Seq((5L, "x5"), (999L, "new")).toDF("k", "v"), Seq("k"), "rebucket", numBuckets = 64)
    val got = rowsOf(bs, "t")
    assert(got.size == 301 && got(5L) == "x5" && got(999L) == "new" && got(7L) == "v7")
    // probes hash at the NEW stored count
    assert(bs.loadForKeys("t", Seq(5L, 999L, 7L).toDF("k"), Seq("k")).count() == 3L)
    val fp = bs.probeFootprint("t", Seq(5L).toDF("k"), Seq("k"))
    assert(fp.totalBuckets > 16, s"manifest must carry the new bucket count: $fp")
  }

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

  test("a small batch appends a DELTA: no bucket rewritten at all") {
    val (bs, root) = freshStore()
    val base = (0L until 500L).map(i => (i, s"v$i")).toDF("k", "v")
    bs.mergeBucketed("t", base, Seq("k"), "base", numBuckets = 16)
    val v0Buckets = SnapshotStore.listDir(root.resolve("t").resolve("v=0")).iterator
      .map(_.getFileName.toString).count(_.startsWith("__bucket="))
    assert(v0Buckets == 16, "base load populates every bucket")

    bs.mergeBucketed("t", Seq((3L, "x3")).toDF("k", "v"), Seq("k"), "one row", numBuckets = 16)
    val v1Entries = SnapshotStore.listDir(root.resolve("t").resolve("v=1")).iterator
      .map(_.getFileName.toString).toSeq
    assert(!v1Entries.exists(_.startsWith("__bucket=")), s"a small batch must not rewrite buckets, got $v1Entries")
    assert(v1Entries.contains("__delta_updates"), s"expected a delta dir, got $v1Entries")
    // data still complete: manifest references v=0 buckets + the delta
    assert(rowsOf(bs, "t").size == 500 && rowsOf(bs, "t")(3L) == "x3")
  }

  test("delta chain: reads fold updates+tombstones in order; oversized merge compacts") {
    val (bs, root) = freshStore()
    bs.mergeBucketed("t", (0L until 400L).map(i => (i, s"v$i")).toDF("k", "v"), Seq("k"), "base", numBuckets = 8)
    // three small merges → three deltas (incl. an update-then-delete and a
    // delete-then-reinsert across the chain)
    bs.mergeBucketed("t", Seq((301L, "x1")).toDF("k", "v"), Seq("k"), "d1", numBuckets = 8)
    bs.mergeBucketed(
      "t", Seq((302L, "x2")).toDF("k", "v"), Seq("k"), "d2", numBuckets = 8,
      deleteKeys = Some(Seq(Tuple1(301L)).toDF("k")),
    )
    bs.mergeBucketed("t", Seq((301L, "back1")).toDF("k", "v"), Seq("k"), "d3", numBuckets = 8)
    val got = rowsOf(bs, "t")
    assert(got(301L) == "back1" && got(302L) == "x2" && got.size == 400)
    // probe path folds the chain too
    val probed = bs.loadForKeys("t", Seq(301L, 302L, 3L).toDF("k"), Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(probed == Map(301L -> "back1", 302L -> "x2", 3L -> "v3"))
    // an oversized merge (keys 0..199, disjoint from the chain's keys)
    // folds the chain into fresh buckets
    bs.mergeBucketed("t", (0L until 200L).map(i => (i, s"w$i")).toDF("k", "v"), Seq("k"), "fold", numBuckets = 8)
    val vLast = bs.currentVersion("t").get
    val entries = SnapshotStore.listDir(root.resolve("t").resolve(s"v=$vLast")).iterator
      .map(_.getFileName.toString).toSeq
    assert(entries.count(_.startsWith("__bucket=")) == 8, "fold rewrites all buckets")
    val folded = rowsOf(bs, "t")
    assert(folded(0L) == "w0" && folded(399L) == "v399" && folded(302L) == "x2" && folded(301L) == "back1" && folded.size == 400)
    // post-fold merges small again → next small batch is a delta on the new base
    bs.mergeBucketed("t", Seq((7L, "z7")).toDF("k", "v"), Seq("k"), "d-after-fold", numBuckets = 8)
    assert(rowsOf(bs, "t")(7L) == "z7")
  }

  test("delta chain length is bounded: merge #MaxDeltaChain+1 folds") {
    val (bs, root) = freshStore()
    bs.mergeBucketed("t", (0L until 2000L).map(i => (i, s"v$i")).toDF("k", "v"), Seq("k"), "base", numBuckets = 8)
    val cap = bs.MaxDeltaChain
    (1 to cap + 1).foreach { i =>
      bs.mergeBucketed("t", Seq((i.toLong, s"d$i")).toDF("k", "v"), Seq("k"), s"d$i", numBuckets = 8)
    }
    val vLast = bs.currentVersion("t").get
    val entries = SnapshotStore.listDir(root.resolve("t").resolve(s"v=$vLast")).iterator
      .map(_.getFileName.toString).toSeq
    assert(entries.count(_.startsWith("__bucket=")) == 8, s"chain cap must fold, got $entries")
    val got = rowsOf(bs, "t")
    assert(got.size == 2000 && (1 to cap + 1).forall(i => got(i.toLong) == s"d$i"))
  }

  test("empty merge is a NO-OP: no new version, no delta appended") {
    val (bs, _) = freshStore()
    bs.mergeBucketed("t", (0L until 200L).map(i => (i, s"v$i")).toDF("k", "v"), Seq("k"), "base", numBuckets = 16)
    val v0 = bs.versions("t").last
    val none = Seq.empty[(Long, String)].toDF("k", "v")
    // MaxDeltaChain+2 empty merges: without the short-circuit these would
    // build a delta chain and force a full compaction rewrite
    (1 to 10).foreach(i => bs.mergeBucketed("t", none, Seq("k"), s"empty $i", numBuckets = 16))
    assert(bs.versions("t").last == v0, "empty merges must not create versions")
    bs.mergeBucketed("t", none, Seq("k"), "empty w/ empty deletes", numBuckets = 16, deleteKeys = Some(none.select(col("k"))))
    assert(bs.versions("t").last == v0)
    assert(rowsOf(bs, "t").size == 200)
  }

  test("changing bucketBy forces a full rewrite — no stale same-key rows left behind") {
    val (bs, _) = freshStore()
    val base = (0L until 300L).map(i => (i, s"g${i % 7}", s"v$i")).toDF("k", "g", "v")
    bs.mergeBucketed("t", base, Seq("k"), "base by k", numBuckets = 16)
    // re-layout by a different bucket column; the same keys carry new values
    val upd = (0L until 300L).map(i => (i, s"g${i % 7}", s"w$i")).toDF("k", "g", "v")
    bs.mergeBucketed("t", upd, Seq("k"), "relayout by g", numBuckets = 16, bucketBy = Seq("g"))
    val got = bs.load("t").collect().map(r => r.getAs[Long]("k") -> r.getAs[String]("v")).toMap
    assert(got == (0L until 300L).map(i => i -> s"w$i").toMap, "old-layout rows must not survive")
    // and the new layout is probe-able by the new bucket column
    val probed = bs.loadForKeys("t", Seq("g3").toDF("g"), Seq("g")).collect().map(_.getAs[Long]("k")).toSet
    assert(probed == (0L until 300L).filter(_ % 7 == 3).toSet)
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

  test("random merge/delete history ≡ in-memory map; loadForKeys agrees after every batch") {
    // seeded random op sequences drive the delta-append / bucket-rewrite /
    // chain-fold decision through states the hand-written cases don't:
    // upserts + deletes in one merge, deletes of absent keys, probes for
    // keys that were deleted mid-chain
    for (seed <- Seq(7L, 31L)) {
      val rnd = new scala.util.Random(seed)
      val (bs, _) = freshStore()
      var model = (0L until 200L).map(i => i -> s"v$i").toMap
      bs.mergeBucketed("t", model.toSeq.toDF("k", "v"), Seq("k"), "base", numBuckets = 8)
      for (batch <- 0 until 8) {
        val upserts = (0 until 1 + rnd.nextInt(5)).map(_ => rnd.nextLong(260) -> s"b$batch-${rnd.nextInt(100)}").toMap
        val deletes = (0 until rnd.nextInt(4)).map(_ => rnd.nextLong(260)).toSet -- upserts.keySet
        model = (model -- deletes) ++ upserts
        bs.mergeBucketed(
          "t", upserts.toSeq.toDF("k", "v"), Seq("k"), s"batch $batch", numBuckets = 8,
          deleteKeys = if (deletes.isEmpty) None else Some(deletes.toSeq.map(Tuple1(_)).toDF("k")),
        )
        assert(rowsOf(bs, "t") == model, s"seed=$seed batch=$batch: full load drifted")
        val probeKeys = (0 until 12).map(_ => rnd.nextLong(280)) // present, absent, deleted
        val probed = bs
          .loadForKeys("t", probeKeys.map(Tuple1(_)).toDF("k"), Seq("k"))
          .collect().map(r => r.getAs[Long]("k") -> r.getAs[String]("v")).toMap
        assert(probed == probeKeys.flatMap(k => model.get(k).map(k -> _)).toMap, s"seed=$seed batch=$batch: probe drifted")
      }
    }
  }

  test("non-unique keys: all old rows of a matching key are replaced (group-replace)") {
    val (bs, _) = freshStore()
    val base = Seq((1L, "g1-a"), (1L, "g1-b"), (2L, "g2-a")).toDF("k", "v")
    bs.mergeBucketed("t", base, Seq("k"), "base", numBuckets = 4)
    bs.mergeBucketed("t", Seq((1L, "g1-rebuilt")).toDF("k", "v"), Seq("k"), "rebuild", numBuckets = 4)
    val got = bs.load("t").collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("v"))).toSet
    assert(got == Set((1L, "g1-rebuilt"), (2L, "g2-a")))
  }

  test("write spread: one bucket per write task (no bucket-id hash collisions in files)") {
    // round-6 optimization: mergeBucketed's write repartition places
    // exactly one __bucket value per task (SnapshotStore.spreadExpr) —
    // without it, murmur3(bucket id) collides and a straggler task owns
    // 2-3 buckets. Observable contract: every bucket dir holds exactly
    // one part file on a first build (one owning task each).
    val (bs, root) = freshStore()
    val n = 64
    val df = (0L until 5000L).map(i => (i, s"v$i")).toDF("k", "v")
    bs.mergeBucketed("t", df, Seq("k"), "base", numBuckets = n)
    val vdir = root.resolve("t").resolve("v=0")
    val bucketDirs = Files.list(vdir).iterator()
    var checked = 0
    bucketDirs.forEachRemaining { d =>
      if (d.getFileName.toString.startsWith("__bucket=")) {
        val b = d.getFileName.toString.stripPrefix("__bucket=").toInt
        val parts = Files.list(d).iterator()
        var files = 0
        parts.forEachRemaining { f =>
          if (f.getFileName.toString.endsWith(".parquet")) {
            files += 1
            // task index == bucket id (part-%05d-…): the spread mapping
            // puts bucket b in shuffle partition b exactly
            assert(
              f.getFileName.toString.startsWith(f"part-$b%05d-"),
              s"bucket $b written by a different task: ${f.getFileName}",
            )
          }
        }
        assert(files == 1, s"bucket dir $d has $files part files (expected exactly 1)")
        checked += 1
      }
    }
    assert(checked > 50, s"expected ~64 bucket dirs, saw $checked")
    // content unaffected: all rows present
    assert(bs.load("t").count() == 5000L)
  }
}
