package graft.functions

import graft.{GraftExtensions, TestSpark}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface of the native expressions: GraftExtensions registers
  * dot_f / l2_normalize / minhash_signature / graft_embed /
  * graft_token_counts, and each SQL call returns exactly what the Column
  * API returns.
  */
class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def installed(): Unit = GraftExtensions.install(spark)

  test("SQL functions value-match the Column API") {
    import spark.implicits._
    installed()
    Seq((Seq(1f, 2f, 3f), Seq(4f, 5f, 6f), Seq("ab", "bc", "cd"), "Alice Works at ACME corp"))
      .toDF("a", "b", "s", "txt")
      .createOrReplaceTempView("ext_probe")

    val sql = spark
      .sql("""
        SELECT dot_f(a, b) AS d,
               l2_normalize(a) AS l,
               minhash_signature(s, 16) AS m,
               graft_embed(txt) AS e,
               graft_token_counts(txt) AS tc,
               hyperplane_sig(a, 16) AS hs
        FROM ext_probe
      """)
      .first()

    val api = spark
      .table("ext_probe")
      .select(
        DotProduct.dot(col("a"), col("b")).as("d"),
        L2Normalize.l2normalize(col("a")).as("l"),
        MinhashSignature.minhash(col("s"), 16).as("m"),
        Functions.embedText(col("txt")).as("e"),
        Functions.tokenCounts(col("txt")).as("tc"),
        HyperplaneSignature.sig(col("a"), 16).as("hs"),
      )
      .first()

    assert(sql.getDouble(0) == api.getDouble(0))
    assert(sql.getSeq[Double](1) == api.getSeq[Double](1))
    assert(sql.getSeq[Long](2) == api.getSeq[Long](2))
    assert(sql.getSeq[Float](3) == api.getSeq[Float](3))
    assert(sql.getStruct(4) == api.getStruct(4))
    assert(sql.getInt(5) == api.getInt(5))
  }

  test("arity and literal checks fail fast") {
    installed()
    val e1 = intercept[Exception](spark.sql("SELECT dot_f(array(1.0f))").collect())
    assert(e1.getMessage.contains("dot_f expects 2"))
    val e2 = intercept[Exception](
      spark.sql("SELECT minhash_signature(array('a'), 1 + 1)").collect())
    assert(e2.getMessage.contains("integer literal"))
  }

  test("the extensions class injects without error (builder path)") {
    // The injection hook itself; value parity is covered via install()
    // above (a shared test session cannot be rebuilt with extensions).
    new GraftExtensions()(new SparkSessionExtensions)
  }
}
