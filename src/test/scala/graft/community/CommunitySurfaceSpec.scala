package graft.community

import java.nio.file.Files

import graft.TestSpark
import graft.io.SnapshotStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Community driver surface: group-scoped detection, min-cluster floor,
  * kmeans branch, info rollup, snapshot-chain versioning, TTL caching
  * (huggingface_driver.py:2431-2945).
  */
class CommunitySurfaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Two groups: A = two 3-cliques bridged to nothing (two communities),
    * B = one 3-clique (one community).
    */
  private def freshStore(): SnapshotStore = {
    val s = new SnapshotStore(spark, Files.createTempDirectory("csurface").toString)
    import spark.implicits._
    def emb(i: Int): Seq[Float] = Seq(math.cos(i).toFloat, math.sin(i).toFloat)
    val nodes = ((0 until 6).map(i => (s"a$i", s"NodeA$i", "A", emb(i))) ++
      (0 until 3).map(i => (s"b$i", s"NodeB$i", "B", emb(i + 10))))
      .toDF("uuid", "name", "group_id", "name_embedding")
    def clique(ids: Seq[String], g: String) =
      for { x <- ids; y <- ids if x < y } yield (s"$x-$y", x, y, g)
    val edges = (clique(Seq("a0", "a1", "a2"), "A") ++ clique(Seq("a3", "a4", "a5"), "A") ++
      clique(Seq("b0", "b1", "b2"), "B"))
      .toDF("uuid", "source_uuid", "target_uuid", "group_id")
    s.commit(nodes, "nodes", "fixture nodes")
    s.commit(edges, "edges", "fixture edges")
    s
  }

  test("group-scoped rebuild replaces only the scoped groups' communities") {
    val s = freshStore()
    Communities.build(s)
    val before = s.load("communities").collect()
    assert(before.count(_.getAs[String]("group_id") == "A") == 2)
    assert(before.count(_.getAs[String]("group_id") == "B") == 1)
    val bBefore = before.filter(_.getAs[String]("group_id") == "B").map(_.getAs[String]("uuid")).toSet
    // re-detect ONLY group A with the size floor: 3-cliques survive
    Communities.build(s, groupIds = Seq("A"), minClusterSize = 3)
    val after = s.load("communities").collect()
    assert(after.count(_.getAs[String]("group_id") == "A") == 2)
    assert(after.filter(_.getAs[String]("group_id") == "B").map(_.getAs[String]("uuid")).toSet == bBefore)
    // a floor above the clique size erases group A, leaves B
    Communities.build(s, groupIds = Seq("A"), minClusterSize = 4)
    val erased = s.load("communities").collect()
    assert(erased.count(_.getAs[String]("group_id") == "A") == 0)
    assert(erased.count(_.getAs[String]("group_id") == "B") == 1)
  }

  test("kmeans branch assigns every node; k honored") {
    val s = freshStore()
    Communities.build(s, algorithm = "kmeans", kClusters = Some(2))
    val members = s.load("community_edges").collect()
    assert(members.length == 9) // every node assigned exactly once
    assert(s.load("communities").count() <= 4) // ≤ k per group
  }

  test("info: per-community members and rollup counts") {
    val s = freshStore()
    Communities.build(s)
    val rollup = Communities.info(s).collect()
    assert(rollup.length == 3)
    assert(rollup.map(_.getAs[Long]("member_count")).sorted.toSeq == Seq(3L, 3L, 3L))
    val one = rollup.head.getAs[String]("uuid")
    val detail = Communities.info(s, communityUuid = Some(one)).collect()
    assert(detail.length == 1)
    assert(detail.head.getAs[Long]("member_count") == 3L)
    assert(detail.head.getAs[scala.collection.Seq[String]]("members").size == 3)
    // group scoping
    assert(Communities.info(s, groupIds = Seq("B")).count() == 1)
  }

  test("versioning: create/list/restore ride the snapshot chain") {
    val s = freshStore()
    Communities.build(s)
    val v1 = s.currentVersion("communities").get
    val created = Communities.versioning(s, "create").collect()(0)
    assert(created.getInt(0) > v1)
    assert(Communities.versioning(s, "list").count() >= 2)
    // mutate (rebuild scoped to B only → A's rows vanish), then restore
    Communities.build(s, groupIds = Seq("A"), minClusterSize = 99)
    assert(s.load("communities").filter(col("group_id") === "A").count() == 0)
    Communities.versioning(s, "restore", Some(v1))
    assert(s.load("communities").filter(col("group_id") === "A").count() == 2)
  }

  test("caching: hit while fresh, miss after TTL") {
    val s = freshStore()
    Communities.build(s)
    val t0 = 1000000L
    val n = Communities.cacheCommunities(s, "k1", ttlSeconds = 60L, nowMillis = t0)
    assert(n == 3)
    assert(Communities.cachedCommunities("k1", t0 + 59 * 1000L).map(_.count()) == Some(3L))
    assert(Communities.cachedCommunities("k1", t0 + 61 * 1000L).isEmpty)
    assert(Communities.cachedCommunities("k1", t0).isEmpty) // evicted on expiry
    Communities.clearCommunityCache()
  }
}
