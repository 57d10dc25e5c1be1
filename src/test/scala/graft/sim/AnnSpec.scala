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

  test("fused HyperplaneSignature == the composed per-plane dot form, bit for bit") {
    import org.apache.spark.sql.functions._
    // the composed form signatureCol replaced: nPlanes separate codegen
    // dots against literal coefficient arrays, summed as bits
    def composedSig(vec: org.apache.spark.sql.Column, nPlanes: Int): org.apache.spark.sql.Column = {
      val n = least(size(vec), lit(64))
      val v = slice(vec, lit(1), n)
      graft.functions.HyperplaneSignature.planeCoefs(nPlanes).zipWithIndex.map { case (coefs, p) =>
        val coefArr = slice(array(coefs.map(lit): _*), lit(1), n)
        when(graft.search.Vectors.dot(v, coefArr) > 0, lit(1 << p)).otherwise(lit(0))
      }.reduce(_ + _).cast("int")
    }
    // 64-dim, short (17-dim) and long (80-dim) vectors; plus a null vector
    // and a null element — both must give signature 0 like the composed
    // null-propagation chain did
    val rnd = new scala.util.Random(11)
    val rows: Seq[(Long, Seq[java.lang.Float])] =
      (0 until 60).map(i => (i.toLong, vec(i).map(java.lang.Float.valueOf))) ++
        Seq(
          (100L, (0 until 17).map(_ => java.lang.Float.valueOf(rnd.nextGaussian().toFloat))),
          (101L, (0 until 80).map(_ => java.lang.Float.valueOf(rnd.nextGaussian().toFloat))),
          (102L, null),
          (103L, Seq(java.lang.Float.valueOf(1f), null, java.lang.Float.valueOf(2f))),
        )
    val df = rows.toDF("id", "v")
    for (w <- Seq(8, 16, 24)) {
      val got = df
        .select(col("id"), Ann.signatureCol(col("v"), w).as("a"), composedSig(col("v"), w).as("b"))
        .collect()
      got.foreach(r => assert(r.getInt(1) == r.getInt(2), s"id ${r.getLong(0)} width $w: ${r.getInt(1)} vs ${r.getInt(2)}"))
      val bad = got.filter(r => r.getLong(0) >= 102L)
      bad.foreach(r => assert(r.getInt(1) == 0, "null vector / element → signature 0"))
    }
  }

  test("wider signatures shrink buckets; multi-probe buys recall back") {
    import org.apache.spark.sql.functions._
    val n = 400
    val corpus = (0 until n).map(i => (i.toLong, vec(i))).toDF("id", "v")
    // expected bucket occupancy halves per extra plane: max bucket at 16
    // planes must be well under max bucket at 8 planes
    def maxBucket(planes: Int): Long = corpus
      .select(Ann.signatureCol(col("v"), planes).as("sig"))
      .groupBy(col("sig")).count().agg(max(col("count"))).collect()(0).getLong(0)
    val m8 = maxBucket(8)
    val m16 = maxBucket(16)
    assert(m16 < m8, s"16-plane buckets ($m16) must be smaller than 8-plane ($m8)")

    // probe set: first element is the exact signature; flips are distinct
    // single-bit variants, deterministic across invocations
    val queries = (0 until 30).map(i => (i.toLong, vec(1000 + i))).toDF("qid", "qv")
    val probes = queries
      .select(col("qid"), Ann.probeSignaturesCol(col("qv"), 16, 4).as("ps"), Ann.signatureCol(col("qv"), 16).as("sig"))
      .collect()
    probes.foreach { r =>
      val ps = r.getSeq[Int](1)
      assert(ps.length == 4 && ps.distinct.length == 4)
      assert(ps.head == r.getInt(2), "first probe must be the exact signature")
      ps.tail.foreach(p => assert(Integer.bitCount(p ^ ps.head) == 1, "flips are single-bit"))
    }

    // recall: candidates reachable at (16 planes, nProbe=4) ⊇ (16, 1);
    // every multi-probe result is still brute-force-scored identically
    val bf = Ann.bruteForceTopK(queries, corpus, 1000).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val narrow = Ann.lshBucketTopK(queries, corpus, 1000, nPlanes = 16, nProbe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val multi = Ann.lshBucketTopK(queries, corpus, 1000, nPlanes = 16, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(narrow.subsetOf(multi.map(t => (t._1, t._2)).toSet))
    assert(multi.size > narrow.size, "low-margin bit flips must reach extra candidates")
    multi.foreach { case (q, id, s) => assert(bf((q, id)) == s) }
  }
}
