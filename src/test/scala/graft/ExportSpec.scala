package graft

import java.nio.file.Files

import graft.kg.{CustomTypes, Fixtures}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Export surfaces: graph tables to json/csv/parquet
  * (huggingface_driver.py:2604-2641) and custom-type definitions as a
  * JSON round-trip (huggingface_driver.py:3225-3284).
  */
class ExportSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val g: GraphitiSpark = {
    val x = new GraphitiSpark(spark, Files.createTempDirectory("gexp").toString)
    x.addEpisodeBulk(Fixtures.pagesDf(), "fixture-v1")
    x
  }

  test("parquet export round-trips the edges table, embeddings dropped by default") {
    val out = Files.createTempDirectory("gexpout").toString
    g.exportGraph(out, format = "parquet")
    val back = spark.read.parquet(s"$out/edges")
    assert(back.count() == g.store.load("edges").count())
    assert(!back.columns.exists(_.endsWith("_embedding")))
    val withEmb = Files.createTempDirectory("gexpout2").toString
    g.exportGraph(withEmb, format = "parquet", includeEmbeddings = true)
    assert(spark.read.parquet(s"$withEmb/edges").columns.contains("fact_embedding"))
    val asJson = Files.createTempDirectory("gexpjson").toString
    g.exportGraph(asJson, format = "json", tables = Seq("edges"))
    assert(spark.read.json(s"$asJson/edges").count() == g.store.load("edges").count())
  }

  test("csv export JSON-encodes array columns and stays readable") {
    val out = Files.createTempDirectory("gexpcsv").toString
    g.exportGraph(out, format = "csv", tables = Seq("nodes"))
    val files = new java.io.File(s"$out/nodes").listFiles().filter(_.getName.endsWith(".csv"))
    assert(files.nonEmpty)
  }

  test("group-filtered export keeps only the requested group") {
    val out = Files.createTempDirectory("gexpgrp").toString
    g.exportGraph(out, format = "parquet", groupIds = Seq("no-such-group"), tables = Seq("edges"))
    assert(spark.read.parquet(s"$out/edges").isEmpty)
  }

  test("custom types JSON export/import round-trips the declarative schema") {
    val reg = CustomTypes.register(
      CustomTypes.builtin,
      CustomTypes.EntityTypeSpec(
        "Product",
        surfacePattern = Some("^[A-Z].*"),
        attributes = Seq(
          CustomTypes.AttributeSpec("sku", required = true, pattern = Some("[A-Z]{2}-\\d+")),
          CustomTypes.AttributeSpec("color"),
        ),
      ),
    )
    val imported = CustomTypes.importJson(CustomTypes.exportJson(reg))
    assert(imported.keySet == reg.keySet)
    val p = imported("Product")
    assert(p.surfacePattern.contains("^[A-Z].*"))
    assert(p.attributes.map(_.name) == Seq("sku", "color"))
    assert(p.attributes.head.required && p.attributes.head.pattern.contains("[A-Z]{2}-\\d+"))
    // imported registry still validates (pattern-driven)
    assert(CustomTypes.validate(imported, "Product", "Widget", Map("sku" -> "AB-12")).isEmpty)
    assert(CustomTypes.validate(imported, "Product", "Widget", Map("sku" -> "nope")).nonEmpty)
    assert(CustomTypes.validate(imported, "Organization", "Acme", Map("founded" -> "soon")).nonEmpty)
  }
}
