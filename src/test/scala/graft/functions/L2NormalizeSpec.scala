package graft.functions

import scala.util.Random

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native L2Normalize expression: bit-identical to the HOF
  * transform/aggregate formulation on non-zero vectors; zero vectors
  * follow the reference's contract (returned unchanged — np.where(norm
  * == 0, ...), helpers.py:99-102), where the HOF form THREW under ANSI
  * mode; interpreted agrees with codegen.
  */
class L2NormalizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def hofNorm(a: org.apache.spark.sql.Column) =
    sqrt(aggregate(zip_with(a, a, (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, v) => acc + v))
  private def hofL2(a: org.apache.spark.sql.Column) = transform(a, x => x.cast("double") / hofNorm(a))

  test("bit-identical to the HOF form on non-zero vectors; empty array → empty") {
    import spark.implicits._
    val rnd = new Random(65L)
    val rows = Seq.fill(50)(Array.fill(16)(rnd.nextFloat() * 2 - 1)) :+ Array.empty[Float]
    val got = rows.toDF("a")
      .withColumn("native", L2Normalize.l2normalize(col("a")))
      .withColumn("hof", hofL2(col("a")))
      .collect()
    for (r <- got) {
      val n = r.getSeq[Double](1)
      val h = r.getSeq[Double](2)
      assert(n == h, s"mismatch for ${r.getSeq[Float](0)}: $n vs $h")
    }
  }

  test("zero vector returns unchanged (reference np.where contract; HOF form threw under ANSI)") {
    import spark.implicits._
    val out = Seq(Array.fill(4)(0f)).toDF("a")
      .select(L2Normalize.l2normalize(col("a")))
      .first()
      .getSeq[Double](0)
    assert(out == Seq(0.0, 0.0, 0.0, 0.0))
  }

  test("null array and null element yield null; interpreted agrees with codegen") {
    import spark.implicits._
    val df = Seq(Option(Seq(3f, 4f)), None).toDF("a")
      .withColumn("n", L2Normalize.l2normalize(col("a")))
    val rows = df.collect()
    assert(rows.count(_.isNullAt(1)) == 1)
    assert(rows.find(!_.isNullAt(1)).get.getSeq[Double](1) == Seq(0.6, 0.8))

    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = Seq(Seq(3f, 4f)).toDF("a").select(L2Normalize.l2normalize(col("a"))).first().getSeq[Double](0)
      assert(interp == Seq(0.6, 0.8))
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
