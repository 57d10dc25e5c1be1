package graft.kg

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExtractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("fused single-scan extraction == per-pattern column extraction") {
    val pages = Pages
      .corpus(spark, "/root/testdata/sf0.001")
      .withColumn("text", coalesce(col("text"), HtmlText.textOf(col("html"))))
    val fused = Extract
      .triplesTs(spark, pages)
      .select("url", "subj", "pred", "obj", "fact")
      .collect()
      .map(_.toString)
      .toSet
    val perPattern = Extract
      .triplesOf(pages, col("text"))
      .select("url", "subj", "pred", "obj", "fact")
      .collect()
      .map(_.toString)
      .toSet
    assert(fused == perPattern)
    assert(fused.nonEmpty)
  }

  test("mapPartitions triples == column triples on fixture pages") {
    val pages = Fixtures.pagesDf().withColumn("text", HtmlText.textOf(col("html")))
    val a = Extract.triples(spark, pages).collect().map(t => (t.url, t.subj, t.pred, t.obj)).toSet
    val b = Extract
      .triplesOf(pages, col("text"))
      .select("url", "subj", "pred", "obj")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSet
    assert(a == b)
  }

  test("entity typing by surface shape") {
    assert(Extract.entityTypeOf("Customer#000000001") == "Person")
    assert(Extract.entityTypeOf("Supplier#42") == "Organization")
    assert(Extract.entityTypeOf("NATION_3") == "Place")
    assert(Extract.entityTypeOf("MIDDLE EAST") == "Entity")
  }

  test("entityNodes projection == per-row Scala build (uuid/label/embedding parity)") {
    import spark.implicits._
    val names =
      Seq("Customer#000000001", "Supplier#42", "NATION_3", "MIDDLE EAST", "Acme", "Customer#7")
    val projected = Extract
      .entityNodes(names.toDF("name"), "gX")
      .collect()
      .map(r =>
        (r.getString(0), r.getString(1), r.getString(2), r.getSeq[Float](3).toList, r.getString(4)),
      )
      .toSet
    val perRow = names.map { n =>
      (Ids.entity("gX", n), n, Extract.entityTypeOf(n), Embedder.embed(n).toList, "gX")
    }.toSet
    assert(projected == perRow)
  }

  test("mentions carry positions and types") {
    import spark.implicits._
    val pages = Seq(("u1", "Customer#7 works at Acme. NATION_2 is big."))
      .toDF("url", "text")
    val m = Extract.mentions(spark, pages).collect().sortBy(_.pos)
    assert(m.map(_.surface).toSeq == Seq("Customer#7", "Acme", "NATION_2"))
    assert(m.head.pos == 0 && m.head.entityType == "Person")
  }
}
