package graft.dedup

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mkDoc(seedWords: Seq[String], n: Int, seed: Int): String = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(_ => seedWords(rnd.nextInt(seedWords.size))).mkString(" ")
  }

  private val words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split(" ").toSeq

  // corpus with planted near-duplicates: doc 100 = doc 0 with one word
  // changed; doc 101 = doc 1 verbatim
  private def docs = {
    val base = (0 until 30).map(i => (i.toLong, mkDoc(words, 50, i)))
    val nd1 = (100L, base(0)._2.replaceFirst("alpha", "beta"))
    val nd2 = (101L, base(1)._2)
    (base :+ nd1 :+ nd2).toDF("doc_id", "text")
  }

  test("LSH candidates reproduce the exact all-pairs result at τ=0.5") {
    val exact = Dedup
      .ngramJaccardPairs(docs, "doc_id", "text", 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val lsh = Dedup
      .minhashLshPairs(docs, "doc_id", "text", 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(exact.map(p => (p._1, p._2)).contains((0L, 100L)))
    assert(exact.map(p => (p._1, p._2)).contains((1L, 101L)))
    assert(lsh == exact)
  }

  test("simhash: identical docs share fingerprint; near-dups are hamming-close") {
    val fp = Dedup
      .simhash(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(fp(1L) == fp(101L)) // verbatim duplicate
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(fp(0L), fp(100L)) <= 8, s"near-dup hamming ${hamming(fp(0L), fp(100L))}")
    // unrelated docs differ far more than the near-dup pair on average
    val unrelated = (2 until 10).map(i => hamming(fp(0L), fp(i.toLong)))
    assert(unrelated.min > hamming(fp(0L), fp(100L)))
  }

  test("shingles3 on short texts") {
    val got = Seq((1L, "a b"), (2L, "a b c"), (3L, ""))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.shingles3(col("text")).as("sh"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
      .toMap
    assert(got(1L).isEmpty)
    assert(got(2L) == Seq("a b c"))
    assert(got(3L).isEmpty)
  }
}
