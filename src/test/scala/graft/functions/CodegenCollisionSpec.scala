package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regression: multiple instances of the same native expression inside ONE
  * generated function must not redefine local variables. With
  * `spark.sql.codegen.fallback=false` a collision is a hard failure instead
  * of Spark's silent interpreted fallback (which passes tests but forfeits
  * whole-stage codegen — the original bug showed up only as a logged
  * CompileException: Redefinition of local variable "dotN").
  */
class CodegenCollisionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withNoFallback[A](body: => A): A = {
    val key = "spark.sql.codegen.fallback"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try body
    finally spark.conf.set(key, prev)
  }

  test("two dot products + cosine-shape expression compile in one projection") {
    import spark.implicits._
    val df = Seq((Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))).toDF("a", "b")
    withNoFallback {
      val row = df
        .select(
          (DotProduct.dot(col("a"), col("b")) /
            sqrt(DotProduct.dot(col("a"), col("a")) * DotProduct.dot(col("b"), col("b")))).as("cos"),
          DotProduct.dot(col("a"), col("a")).as("na"),
        )
        .first()
      assert(math.abs(row.getDouble(1) - 14.0) < 1e-12)
      assert(row.getDouble(0) > 0.97 && row.getDouble(0) < 0.98)
    }
  }

  test("two l2_normalize and two minhash signatures in one projection") {
    import spark.implicits._
    val df = Seq((Seq(3f, 4f), Seq(0f, 2f), Seq("a", "b"), Seq("b", "c"))).toDF("a", "b", "s", "t")
    withNoFallback {
      val row = df
        .select(
          L2Normalize.l2normalize(col("a")).as("na"),
          L2Normalize.l2normalize(col("b")).as("nb"),
          MinhashSignature.minhash(col("s"), 8).as("ms"),
          MinhashSignature.minhash(col("t"), 8).as("mt"),
        )
        .first()
      assert(row.getSeq[Double](0) == Seq(0.6, 0.8))
      assert(row.getSeq[Double](1) == Seq(0.0, 1.0))
      assert(row.getSeq[Long](2).size == 8 && row.getSeq[Long](3).size == 8)
    }
  }
}
