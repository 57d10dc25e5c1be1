package graft.kg

import java.sql.Timestamp

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-built edge frames mirroring the reference's temporal unit tests
  * (`tests/test_temporal_manager.py:38-100`): invalidation windows,
  * re-assertion dedup, point-in-time queries.
  */
class InvalidationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def t(h: Int) = new Timestamp(Fixtures.Epoch * 1000L + h * 3600L * 1000L)

  private def edge(src: String, rel: String, dst: String, at: Int) =
    ("g", src, rel, dst, s"$src $rel $dst", t(at), t(at), Seq(s"ep$at"))

  private val cols =
    Seq("group_id", "source_uuid", "name", "target_uuid", "fact", "valid_at", "created_at", "episodes")

  test("newer contradicting fact closes the older interval (edge_operations.py:381-411)") {
    val edges = Seq(edge("a", "lives_in", "X", 0), edge("a", "lives_in", "Y", 5), edge("a", "lives_in", "Z", 9))
      .toDF(cols: _*)
    val got = Invalidation
      .invalidate(Invalidation.dedupeFacts(edges))
      .orderBy(col("valid_at"))
      .collect()
    assert(got(0).getAs[Timestamp]("invalid_at") == t(5))
    assert(got(1).getAs[Timestamp]("invalid_at") == t(9))
    assert(got(2).getAs[Timestamp]("invalid_at") == null)
    assert(got(0).getAs[Timestamp]("expired_at") == t(5))
  }

  test("re-assertion of the same fact merges episodes, no invalidation") {
    val edges = Seq(edge("a", "lives_in", "X", 0), edge("a", "lives_in", "X", 5)).toDF(cols: _*)
    val got = Invalidation.invalidate(Invalidation.dedupeFacts(edges)).collect()
    assert(got.length == 1)
    assert(got(0).getAs[Timestamp]("valid_at") == t(0))
    assert(got(0).getSeq[String](got(0).fieldIndex("episodes")) == Seq("ep0", "ep5"))
    assert(got(0).getAs[Timestamp]("invalid_at") == null)
  }

  test("different relations never contend") {
    val edges = Seq(edge("a", "lives_in", "X", 0), edge("a", "works_at", "Y", 5)).toDF(cols: _*)
    val got = Invalidation.invalidate(Invalidation.dedupeFacts(edges)).collect()
    assert(got.forall(_.getAs[Timestamp]("invalid_at") == null))
  }

  test("alternating objects: each assertion closes the previous one") {
    val edges = Seq(
      edge("a", "lives_in", "X", 0),
      edge("a", "lives_in", "Y", 2),
      edge("a", "lives_in", "X", 4),
    ).toDF(cols: _*)
    val got = Invalidation
      .invalidate(Invalidation.dedupeFacts(edges))
      .orderBy(col("valid_at"))
      .collect()
    // NOTE: dedupeFacts merges the two X assertions to valid_at=t0, so the
    // group becomes X@0, Y@2 → X invalid at 2, Y open. This matches the
    // reference's dedupe-then-invalidate order (resolve_extracted_edge
    // dedupes before contradiction checks, edge_operations.py:414-535).
    assert(got.length == 2)
    assert(got(0).getAs[Timestamp]("invalid_at") == t(2))
    assert(got(1).getAs[Timestamp]("invalid_at") == null)
  }

  test("simultaneous contradicting facts both stay valid (strict inequality, edge_operations.py:400-409)") {
    val edges = Seq(
      edge("a", "lives_in", "X", 0),
      edge("a", "lives_in", "Y", 0), // same valid_at as X: neither closes the other
      edge("a", "lives_in", "Z", 5),
    ).toDF(cols: _*)
    val got = Invalidation
      .invalidate(Invalidation.dedupeFacts(edges))
      .orderBy(col("target_uuid"))
      .collect()
    // X and Y are both closed by Z (the next STRICTLY later fact), not by
    // each other — no empty validity intervals
    assert(got(0).getAs[Timestamp]("invalid_at") == t(5))
    assert(got(1).getAs[Timestamp]("invalid_at") == t(5))
    assert(got(2).getAs[Timestamp]("invalid_at") == null)
  }

  test("manual_invalid_at survives dedupe and caps invalid_at (invalidate_edges persistence)") {
    val manual = t(3)
    val withManual = Seq(edge("a", "lives_in", "X", 0), edge("a", "lives_in", "Y", 5))
      .toDF(cols: _*)
      .withColumn(
        "manual_invalid_at",
        when(col("target_uuid") === "X", lit(manual)).otherwise(lit(null).cast("timestamp")),
      )
    val got = Invalidation
      .invalidate(Invalidation.dedupeFacts(withManual))
      .orderBy(col("valid_at"))
      .collect()
    // X's window closer would be t(5); the earlier manual invalidation wins
    assert(got(0).getAs[Timestamp]("invalid_at") == manual)
    assert(got(0).getAs[Timestamp]("manual_invalid_at") == manual)
    assert(got(1).getAs[Timestamp]("invalid_at") == null)
  }

  test("point-in-time predicate (temporal_manager.py:310-314)") {
    val edges = Seq(edge("a", "lives_in", "X", 0), edge("a", "lives_in", "Y", 5)).toDF(cols: _*)
    val inv = Invalidation.invalidate(Invalidation.dedupeFacts(edges))
    assert(Invalidation.validAt(inv, t(3)).collect().map(_.getAs[String]("target_uuid")).toSeq == Seq("X"))
    assert(Invalidation.validAt(inv, t(5)).collect().map(_.getAs[String]("target_uuid")).toSeq == Seq("Y"))
    assert(Invalidation.validAt(inv, t(7)).collect().map(_.getAs[String]("target_uuid")).toSeq == Seq("Y"))
  }
}
