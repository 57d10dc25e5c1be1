package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Point mutations must not rewrite the corpus: `invalidateEdges`,
  * `setValidityPeriod`, `removeEpisode`'s edge cascade and `cleanupAged`
  * write through the store's keyed bucketed merge (delta-appended when the
  * touched set is small, affected-bucket rewrite otherwise) — the same
  * primitive incremental ingest uses — never a full-table `commit`.
  * Asserted here on the MANIFEST: on a 64-bucket edges table, a
  * uuid-targeted invalidation leaves every bucket owned by its original
  * version (delta path), and a compaction-sized one rewrites only the hit
  * groups' buckets (reference contract: `invalidate_edges`,
  * temporal_manager.py:212-286, touches only the targeted rows).
  */
class ScopedMutationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private val GroupKey = Seq("group_id", "source_uuid", "name")

  /** bucket → owning version, from the current snapshot's manifest. */
  private def bucketOwners(root: String, table: String): Map[Int, Int] = {
    val latest = new String(
      Files.readAllBytes(Paths.get(root, table, "_LATEST")),
      StandardCharsets.UTF_8,
    ).trim.toInt
    val mf = Paths.get(root, table, s"v=$latest", "_manifest.json")
    assert(Files.exists(mf), s"$table v=$latest has no manifest — not a bucketed snapshot")
    val s = new String(Files.readAllBytes(mf), StandardCharsets.UTF_8)
    val bucketsAt = s.indexOf("\"buckets\"")
    """"(\d+)":\[(\d+),(\d+)\]""".r
      .findAllMatchIn(s.substring(bucketsAt))
      .map(m => m.group(1).toInt -> m.group(2).toInt)
      .toMap
  }

  private def currentCommitJson(root: String, table: String): String = {
    val latest = new String(
      Files.readAllBytes(Paths.get(root, table, "_LATEST")),
      StandardCharsets.UTF_8,
    ).trim.toInt
    new String(
      Files.readAllBytes(Paths.get(root, table, s"v=$latest", "_commit.json")),
      StandardCharsets.UTF_8,
    )
  }

  /** 64 contention groups × 40 rows, committed BUCKETED (64 buckets). */
  private def freshBucketed(): GraphitiSpark = {
    import spark.implicits._
    val g = new GraphitiSpark(spark, Files.createTempDirectory("scoped-mut").toString)
    val rows = for (grp <- 0 until 64; i <- 0 until 40) yield (
      f"e$grp%02d-$i%02d",
      "default",
      f"s$grp%02d",
      "rel",
      f"t$i%02d",
      ts(100L + i),
      if (i % 3 == 0) Some(ts(200L + i)) else Option.empty[Timestamp],
      Option.empty[Timestamp],
      Seq(f"ep$grp%02d"),
    )
    val df = rows
      .toDF("uuid", "group_id", "source_uuid", "name", "target_uuid", "valid_at", "invalid_at", "expired_at", "episodes")
    g.store.mergeBucketed("edges", df, GroupKey, "bucketed fixture")
    g
  }

  test("uuid-targeted invalidation rides the delta path: zero buckets rewritten") {
    val g = freshBucketed()
    val before = bucketOwners(g.store.root, "edges")
    assert(before.nonEmpty)

    g.invalidateEdges(Seq("e05-07"), ts(1000), "scoped test")

    val after = bucketOwners(g.store.root, "edges")
    assert(after == before, "a 1-uuid invalidation must carry every base bucket by reference")
    assert(currentCommitJson(g.store.root, "edges").contains("\"delta\":true"), "expected a merge-on-read delta commit")
    // semantics intact: the hit row is stamped, its group's other rows are not
    val got = g.store
      .load("edges")
      .filter(col("group_id") === "default" && col("source_uuid") === "s05")
      .collect()
      .map(r => r.getAs[String]("uuid") -> Option(r.getAs[Timestamp]("expired_at")))
      .toMap
    assert(got("e05-07").contains(ts(1000)))
    assert(got("e05-06").isEmpty)
    assert(got.size == 40)
  }

  test("compaction-sized invalidation rewrites ONLY the hit groups' buckets") {
    val g = freshBucketed()
    val before = bucketOwners(g.store.root, "edges")
    // 16 whole groups (640 rows of 2560): over the 10× delta threshold →
    // affected-bucket rewrite path
    val uuids = for (grp <- 0 until 16; i <- 0 until 40) yield f"e$grp%02d-$i%02d"
    g.invalidateEdges(uuids, ts(1000), "scoped rewrite test")

    val after = bucketOwners(g.store.root, "edges")
    assert(after.keySet == before.keySet, "bucket layout unchanged")
    val rewritten = after.count { case (b, v) => before(b) != v }
    assert(rewritten > 0, "a compaction-sized mutation takes the rewrite path")
    assert(rewritten <= 16, s"at most one bucket per hit group may rewrite, got $rewritten")
    val carried = after.count { case (b, v) => before(b) == v }
    assert(carried >= after.size - 16, "untouched buckets must be carried by manifest reference")
    // values: every targeted row stamped, every untouched group pristine
    val stamped = g.store.load("edges").filter(col("expired_at") === ts(1000)).count()
    assert(stamped == 640L)
  }

  test("setValidityPeriod and soft/hard cleanup stay bucket-scoped") {
    val g = freshBucketed()
    val base = bucketOwners(g.store.root, "edges")

    g.setValidityPeriod("e10-03", ts(50), Some(ts(99)))
    val afterSet = bucketOwners(g.store.root, "edges")
    assert(afterSet == base, "1-row validity patch must be a delta append")
    assert(
      g.store.load("edges").filter(col("uuid") === "e10-03").collect().head.getAs[Timestamp]("valid_at") == ts(50),
    )

    // soft cleanup: matches live in EVERY group here (i % 3 == 0 rows),
    // so only the value contract is asserted plus merge-not-commit (the
    // table keeps a manifest — a full `commit` would drop it)
    val n = g.cleanupAged("soft", ts(205))
    assert(n > 0)
    assert(
      bucketOwners(g.store.root, "edges").nonEmpty,
      "soft cleanup must go through the bucketed merge (manifest preserved)",
    )
    val archived = g.store.load("edges").filter(col("archived")).count()
    assert(archived == n)

    val h = g.cleanupAged("hard", ts(205))
    assert(h == archived)
    assert(bucketOwners(g.store.root, "edges").nonEmpty, "hard cleanup must keep the bucketed layout")
    assert(g.store.load("edges").filter(col("invalid_at") < ts(205)).count() == 0L)
  }

  /** Overwrite every edges data file NOT among `keepUris` with garbage:
    * any read of a non-probed bucket afterwards throws, so an op that
    * survives proves its LOCATE step touched only the probed buckets.
    */
  private def corruptTableExcept(root: String, table: String, keepUris: Set[String]): Int = {
    import scala.jdk.CollectionConverters._
    val keep = keepUris.map(u => java.net.URI.create(u).getPath)
    val walk = Files.walk(Paths.get(root, table))
    try {
      val victims = walk.iterator().asScala
        .filter(p => p.toString.endsWith(".parquet"))
        .filterNot(p => keep.contains(p.toAbsolutePath.toString))
        .toList
      victims.foreach(p => Files.write(p, "corrupted-not-parquet".getBytes(StandardCharsets.UTF_8)))
      victims.size
    } finally walk.close()
  }

  private def corruptEdgesExcept(root: String, keepUris: Set[String]): Int =
    corruptTableExcept(root, "edges", keepUris)

  test("point-mutation LOCATE reads only probed buckets (corrupted-corpus proof)") {
    import spark.implicits._
    val g = freshBucketed()
    // the by-uuid locate index the probes ride on (one-time bootstrap)
    graft.streaming.IncrementalIngest.bootstrapIndexes(g.store, spark)
    assert(g.store.exists("edge_uuids"))
    // keep only the two target groups' bucket files readable
    val keep = g.store
      .load("edges")
      .filter(col("source_uuid").isin("s05", "s10"))
      .select(input_file_name().as("f"))
      .distinct()
      .collect()
      .map(_.getString(0))
      .toSet
    val corrupted = corruptEdgesExcept(g.store.root, keep)
    assert(corrupted >= 30, s"expected most bucket files corrupted, got $corrupted")
    // sanity: a corpus scan now fails — so surviving ops cannot have run one
    intercept[Exception] { g.store.load("edges").count() }

    assert(g.getValidAt("e05-07", ts(150)).isDefined, "keyed point read")
    g.setValidityPeriod("e05-07", ts(50))
    g.invalidateEdges(Seq("e10-03"), ts(1000), "corrupt-proof")
    assert(g.deleteEdgesByUuids(Seq("e05-01")) == 1L)

    def group(src: String) =
      g.store
        .loadForKeys("edges", Seq(("default", src, "rel")).toDF("group_id", "source_uuid", "name"), GroupKey)
        .collect()
        .map(r => r.getAs[String]("uuid") -> r)
        .toMap
    val s05 = group("s05")
    assert(s05("e05-07").getAs[Timestamp]("valid_at") == ts(50))
    assert(!s05.contains("e05-01"), "deleted row gone")
    assert(s05.size == 39)
    val s10 = group("s10")
    assert(Option(s10("e10-03").getAs[Timestamp]("expired_at")).contains(ts(1000)))
  }

  test("read-side point lookups probe, never scan (corrupted-corpus proof for the getters)") {
    import spark.implicits._
    val g = freshBucketed()
    graft.streaming.IncrementalIngest.bootstrapIndexes(g.store, spark)
    assert(g.store.exists("edge_uuids"))
    // a uuid-bucketed nodes table alongside the edges fixture
    val nodes = (for (grp <- 0 until 64; i <- 0 until 10)
      yield (f"n$grp%02d-$i%02d", f"name $grp $i", "Entity", "default"))
      .toDF("uuid", "name", "label", "group_id")
    g.store.mergeBucketed("nodes", nodes, Seq("uuid"), "node fixture")
    // miss-path sanity while the corpus is still healthy
    assert(g.getNodeByUuid("no-such-node").isEmpty)
    assert(g.getEdgeByUuid("no-such-edge").isEmpty)
    // keep only the target edge group's bucket files and the target
    // node's own bucket file; everything else becomes garbage
    val keepEdges = g.store
      .load("edges")
      .filter(col("source_uuid") === "s05")
      .select(input_file_name().as("f"))
      .distinct()
      .collect()
      .map(_.getString(0))
      .toSet
    val keepNodes = g.store
      .loadForKeys("nodes", Seq("n07-03").toDF("uuid"), Seq("uuid"))
      .select(input_file_name().as("f"))
      .distinct()
      .collect()
      .map(_.getString(0))
      .toSet
    assert(corruptEdgesExcept(g.store.root, keepEdges) >= 30)
    assert(corruptTableExcept(g.store.root, "nodes", keepNodes) >= 30)
    // a corpus scan now fails — surviving getters cannot have run one
    intercept[Exception] { g.store.load("edges").count() }
    intercept[Exception] { g.store.load("nodes").count() }

    val edge = g.getEdgeByUuid("e05-07")
    assert(edge.isDefined, "keyed edge getter must survive the corrupted corpus")
    assert(edge.get.getAs[String]("target_uuid") == "t07")
    val node = g.getNodeByUuid("n07-03")
    assert(node.isDefined, "keyed node getter must survive the corrupted corpus")
    assert(node.get.getAs[String]("name") == "name 7 3")
  }

  test("removeEpisode cascade locates citing edges via episode_entity_edges, not a corpus scan") {
    import spark.implicits._
    val epUrl = "http://pages/ep05"
    val epUuid = graft.kg.Ids.episode("default", epUrl)
    // ONE bucketed build (no delta chain — the kept bucket must be a base
    // file): group s05's rows cite the episode; rows i<5 cite ONLY it
    val g = new GraphitiSpark(spark, Files.createTempDirectory("scoped-rm-ep").toString)
    val rows = for (grp <- 0 until 64; i <- 0 until 40) yield (
      f"e$grp%02d-$i%02d",
      "default",
      f"s$grp%02d",
      "rel",
      f"t$i%02d",
      ts(100L + i),
      Option.empty[Timestamp],
      Option.empty[Timestamp],
      if (grp != 5) Seq(f"ep$grp%02d")
      else if (i < 5) Seq(epUuid)
      else Seq(epUuid, "other-ep"),
    )
    g.store.mergeBucketed(
      "edges",
      rows.toDF("uuid", "group_id", "source_uuid", "name", "target_uuid", "valid_at", "invalid_at", "expired_at", "episodes"),
      GroupKey, "recited fixture",
    )
    g.store.mergeBucketed(
      "episodes",
      Seq((epUuid, "", "ep content", "test", "", "default", ts(1), ts(1)))
        .toDF("uuid", "name", "content", "source", "source_description", "group_id", "created_at", "valid_at"),
      Seq("uuid"), "episode fixture",
    )
    val citingUuids = (0 until 40).map(i => f"e05-$i%02d")
    g.store.mergeBucketed(
      "episode_entity_edges",
      Seq((epUuid, citingUuids)).toDF("uuid", "entity_edges"),
      Seq("uuid"), "entity_edges fixture",
    )
    graft.streaming.IncrementalIngest.bootstrapIndexes(g.store, spark)
    // only s05's bucket stays readable — the cascade must find its citing
    // rows through episode_entity_edges → edge_uuids, never array_contains
    // over the corpus
    val keep = g.store
      .load("edges")
      .filter(col("source_uuid") === "s05")
      .select(input_file_name().as("f"))
      .distinct()
      .collect()
      .map(_.getString(0))
      .toSet
    assert(corruptEdgesExcept(g.store.root, keep) >= 30)

    g.removeEpisode(epUrl)

    val s05 = g.store
      .loadForKeys("edges", Seq(("default", "s05", "rel")).toDF("group_id", "source_uuid", "name"), GroupKey)
      .collect()
      .map(r => r.getAs[String]("uuid") -> r.getAs[scala.collection.Seq[String]]("episodes").toList)
      .toMap
    assert(s05.size == 35, "rows whose only supporter was the episode are gone")
    assert(s05.keys.forall(_ >= "e05-05"))
    assert(s05.values.forall(e => e == Seq("other-ep")), "survivors lost the removed episode")
    assert(g.store.load("episodes").filter(col("uuid") === epUuid).isEmpty)
  }
}
