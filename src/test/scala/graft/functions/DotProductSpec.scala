package graft.functions

import scala.util.Random

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native DotProduct expression: bit-identical to the HOF
  * aggregate/zip_with formulation it replaced, null semantics preserved
  * (unequal lengths, null elements), codegen and interpreted agree.
  */
class DotProductSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, v) => acc + v)

  test("bit-identical to the HOF form on random float vectors") {
    import spark.implicits._
    val rnd = new Random(64L)
    val rows = Seq.fill(200)((
      Array.fill(64)(rnd.nextFloat() * 2 - 1),
      Array.fill(64)(rnd.nextFloat() * 2 - 1),
    ))
    val df = rows.toDF("a", "b")
      .withColumn("native", DotProduct.dot(col("a"), col("b")))
      .withColumn("hof", hofDot(col("a"), col("b")))
    val diff = df.filter(col("native") =!= col("hof")).count()
    assert(diff == 0, s"$diff rows differ between native and HOF dot")
    // and equal to a driver-side double-accumulation in the same order
    val first = df.select(col("native")).first().getDouble(0)
    val expect = rows.head._1.zip(rows.head._2).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
    assert(first == expect)
  }

  test("null semantics: unequal lengths and null elements yield null, like zip_with padding") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1f, 2f)), Some(Seq(3f))), // unequal → null
      (Some(Seq(1f, 2f)), None), // null array → null
      (Some(Seq.empty[Float]), Some(Seq.empty[Float])), // empty → 0.0
    ).toDF("a", "b")
      .withColumn("native", DotProduct.dot(col("a"), col("b")))
      .withColumn("hof", hofDot(col("a"), col("b")))
      .collect()
    for (r <- df) {
      val n = if (r.isNullAt(2)) null else r.getDouble(2)
      val h = if (r.isNullAt(3)) null else r.getDouble(3)
      assert(n == h, s"native=$n hof=$h for ${r.getSeq[Float](0)}")
    }
  }

  test("interpreted eval agrees with codegen; double arrays accepted") {
    import spark.implicits._
    val rows = Seq((Array(0.5, -1.5, 2.0), Array(1.0, 2.0, -0.25)))
    def run(): Double =
      rows.toDF("a", "b").select(DotProduct.dot(col("a"), col("b"))).first().getDouble(0)
    val codegen = run()
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(run() == codegen && codegen == 0.5 * 1.0 + -1.5 * 2.0 + 2.0 * -0.25)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
