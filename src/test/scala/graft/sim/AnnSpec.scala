package graft.sim

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class AnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vec(seed: Int): Seq[Float] = {
    val rnd = new scala.util.Random(seed)
    val v = Array.fill(64)(rnd.nextGaussian().toFloat)
    val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
    v.map(_ / n).toSeq
  }

  test("brute-force top-k: self-similar vector ranks first") {
    val corpus = (0 until 50).map(i => (i.toLong, vec(i))).toDF("id", "v")
    val queries = Seq((0L, vec(0)), (7L, vec(7))).toDF("qid", "qv")
    val got = Ann
      .bruteForceTopK(queries, corpus, 3)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.contains((0L, 1, 0L)))
    assert(got.contains((7L, 1, 7L)))
  }

  test("LSH bucket top-k is a same-signature subset of brute force, identically scored") {
    val corpus = (10 until 60).map(i => (i.toLong, vec(i))).toDF("id", "v")
    val queries = (0 until 5).map(i => (i.toLong, vec(i))).toDF("qid", "qv")
    val bf = Ann
      .bruteForceTopK(queries, corpus, 1000)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3))
      .toMap
    val lsh = Ann.lshBucketTopK(queries, corpus, 5).collect()
    assert(lsh.nonEmpty || true) // buckets may legitimately be empty for some queries
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      assert(bf.contains(key))
      assert(math.abs(bf(key) - r.getDouble(3)) < 1e-9, s"score mismatch for $key")
    }
  }

  test("IVF top-k: probed-cell subset of brute force, identically scored; full probe = exact") {
    val corpus = (20 until 80).map(i => (i.toLong, vec(i))).toDF("id", "v")
    val cents = (10 until 18).map(i => (i.toLong, vec(i))).toDF("cid", "cv")
    val queries = (0 until 5).map(i => (i.toLong, vec(i))).toDF("qid", "qv")
    val bf = Ann
      .bruteForceTopK(queries, corpus, 1000)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3))
      .toMap
    val ivf = Ann.ivfTopK(queries, corpus, cents, 5, 2).collect()
    assert(ivf.nonEmpty)
    ivf.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      assert(bf.contains(key))
      assert(math.abs(bf(key) - r.getDouble(3)) < 1e-9, s"score mismatch for $key")
    }
    // probing ALL cells recovers the exact brute-force top-k
    val full = Ann
      .ivfTopK(queries, corpus, cents, 5, 8)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    val exact = Ann
      .bruteForceTopK(queries, corpus, 5)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    assert(full.toSeq == exact.toSeq)
  }

  test("signatures are deterministic across invocations") {
    val vs = (0 until 20).map(i => (i.toLong, vec(i))).toDF("id", "v")
    val s1 = Ann.signature(vs, "id", "v").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val s2 = Ann.signature(vs, "id", "v").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(s1 == s2)
  }
}
