package graft.functions

import graft.TestSpark
import graft.kg.Embedder
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native EmbedText expression: value-identical to Embedder.embed,
  * null-safe, and visible to codegen as an expression (no UDF boundary).
  */
class EmbedTextSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("embedText equals Embedder.embed exactly, including interpreted (non-codegen) eval") {
    import spark.implicits._
    val texts = Seq("Customer#1 lives in GERMANY.", "", "a b a B\nmixed CASE", "one-token")
    val df = texts.toDF("t").withColumn("e", Functions.embedText(col("t")))
    val got = df.select(col("t"), col("e")).collect().map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    for (t <- texts) assert(got(t) == Embedder.embed(t).toSeq, s"mismatch for '$t'")

    // interpreted path (nullSafeEval) must agree with codegen
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = texts.toDF("t").withColumn("e", Functions.embedText(col("t")))
        .collect().map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
      assert(interp == got)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("null input yields null; plan carries the native expression, not a UDF") {
    import spark.implicits._
    val nulls = Seq(Some("x"), None).toDF("t").withColumn("e", Functions.embedText(col("t")))
    assert(nulls.collect().count(_.isNullAt(1)) == 1)

    // non-local source so ConvertToLocalRelation cannot fold the project
    val df = spark.range(4).select(concat(lit("tok"), col("id")).as("t"))
      .withColumn("e", Functions.embedText(col("t")))
    assert(df.collect().length == 4)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_embed"), plan)
    assert(!plan.toLowerCase.contains("scalaudf") && !plan.contains("UDF("), "UDF boundary still present:\n" + plan)
    // "*(n)" prefixes codegen stages in the simple plan string; the
    // project carrying graft_embed must be inside one
    assert(
      plan.linesIterator.exists(l => l.contains("graft_embed") && l.trim.startsWith("*(")),
      "expression fell out of whole-stage codegen:\n" + plan,
    )
  }
}
