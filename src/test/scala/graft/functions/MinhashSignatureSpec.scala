package graft.functions

import java.math.BigInteger
import java.security.MessageDigest

import scala.util.Random

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native MinhashSignature expression, cross-checked against an
  * independent BigInteger formulation of the same double-hashing math
  * (md5 hex chars 1-15 / 17-31 → h1/h2, (h1 + k·h2) mod 2^60), plus the
  * MinHash invariants (order/duplicate independence) and null semantics.
  */
class MinhashSignatureSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val Mod = BigInteger.ONE.shiftLeft(60)

  private def refSignature(shingles: Seq[String], n: Int): Seq[Long] = {
    val md = MessageDigest.getInstance("MD5")
    val perShingle = shingles.map { s =>
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (new BigInteger(hex.substring(0, 15), 16), new BigInteger(hex.substring(16, 31), 16))
    }
    (0 until n).map { k =>
      perShingle
        .map { case (h1, h2) => h1.add(h2.multiply(BigInteger.valueOf(k.toLong))).mod(Mod).longValueExact() }
        .min
    }
  }

  test("matches the BigInteger reference formulation on random shingle sets") {
    import spark.implicits._
    val rnd = new Random(16L)
    val rows = Seq.fill(30)(Seq.fill(1 + rnd.nextInt(8))(s"tok${rnd.nextInt(40)} w${rnd.nextInt(9)}"))
    val got = rows.toDF("sh")
      .withColumn("mh", graft.dedup.Dedup.minhashSignature(col("sh"), 16))
      .collect()
      .map(r => r.getSeq[String](0) -> r.getSeq[Long](1))
    for ((sh, mh) <- got) assert(mh == refSignature(sh, 16), s"mismatch for $sh")
  }

  test("minhash invariants: order- and duplicate-independent; identical sets agree") {
    import spark.implicits._
    val base = Seq("a b c", "c d e", "x y z")
    val rows = Seq(base, base.reverse, base ++ base).toDF("sh")
      .withColumn("mh", graft.dedup.Dedup.minhashSignature(col("sh"), 8))
      .collect()
      .map(_.getSeq[Long](1))
    assert(rows.distinct.size == 1, "signature must not depend on order or multiplicity")
  }

  test("null and empty arrays yield null; interpreted agrees with codegen") {
    import spark.implicits._
    val df = Seq(Option(Seq("a")), Option(Seq.empty[String]), None).toDF("sh")
      .withColumn("mh", graft.dedup.Dedup.minhashSignature(col("sh"), 4))
    assert(df.collect().count(_.isNullAt(1)) == 2)

    val codegen = Seq(Seq("a", "b")).toDF("sh")
      .select(graft.dedup.Dedup.minhashSignature(col("sh"), 4)).first().getSeq[Long](0)
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = Seq(Seq("a", "b")).toDF("sh")
        .select(graft.dedup.Dedup.minhashSignature(col("sh"), 4)).first().getSeq[Long](0)
      assert(interp == codegen && codegen == refSignature(Seq("a", "b"), 4))
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
