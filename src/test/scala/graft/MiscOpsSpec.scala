package graft

import graft.community.KMeansCommunities
import graft.graph.GraphOps
import graft.kg.CustomTypes
import graft.multimodal.Multimodal
import graft.search.Sanitize
import graft.text.TfIdf
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MiscOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("findPaths: all simple paths to targets within depth") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
    val paths = GraphOps
      .findPaths(edges, Seq(1L), Set(3L), maxDepth = 3)
      .collect()
      .map(_.getSeq[Long](0).toList)
      .toSet
    assert(paths == Set(List(1L, 2L, 3L), List(1L, 3L)))
  }

  test("tfidf vectorizer: stopwords removed, idf downweights ubiquitous terms") {
    val docs = Seq(
      (1L, "the spark engine runs spark jobs"),
      (2L, "the duck engine runs sql"),
      (3L, "the spark engine again"),
    ).toDF("doc_id", "text")
    val out = TfIdf.vectorize(docs, "text")
    assert(out.columns.contains("tfidf"))
    val filtered = out.select("filtered").as[Seq[String]].collect()
    assert(filtered.forall(!_.contains("the")))
    assert(out.count() == 3)
  }

  test("kmeans communities: separable clusters recovered") {
    val mk = (base: Float, n: Int, off: Int) =>
      (0 until n).map(i => ((off + i).toString, Seq.fill(8)(base) ++ Seq.fill(56)(0.0f)))
    val a = mk(1.0f, 10, 0) // cluster around e1
    val b = (0 until 10).map(i => ((100 + i).toString, Seq.fill(8)(0.0f) ++ Seq.fill(8)(1.0f) ++ Seq.fill(48)(0.0f)))
    val nodes = (a ++ b).toDF("uuid", "name_embedding")
    val assigned = KMeansCommunities
      .assign(spark, nodes, k = 2)
      .collect()
      .map(r => r.getString(0) -> r.getInt(1))
      .toMap
    val ca = a.map(x => assigned(x._1)).toSet
    val cb = b.map(x => assigned(x._1)).toSet
    assert(ca.size == 1 && cb.size == 1 && ca != cb)
  }

  test("custom type registry validates surface + attributes") {
    val reg = CustomTypes.builtin
    assert(CustomTypes.validate(reg, "Person", "Alice", Map.empty).isEmpty)
    assert(CustomTypes.validate(reg, "Person", "alice", Map.empty).nonEmpty) // lowercase surface
    assert(CustomTypes.validate(reg, "Organization", "Acme", Map("founded" -> "1999")).isEmpty)
    assert(CustomTypes.validate(reg, "Organization", "Acme", Map("founded" -> "soon")).nonEmpty)
    assert(CustomTypes.validate(reg, "Unknown", "x", Map.empty).head.reason == "unknown entity type")
    val withReq = CustomTypes.register(
      reg,
      CustomTypes.EntityTypeSpec("Product", attributes = Seq(CustomTypes.AttributeSpec("sku", required = true))),
    )
    assert(CustomTypes.validate(withReq, "Product", "Widget", Map.empty).nonEmpty)
  }

  test("lucene sanitize escapes the reference's special set") {
    assert(Sanitize.luceneSanitize("a+b") == "a\\+b")
    assert(Sanitize.luceneSanitize("x && y || z") == "x \\&& y \\|| z")
    assert(Sanitize.luceneSanitize("(q:1)?") == "\\(q\\:1\\)\\?")
    assert(Sanitize.luceneSanitize("plain text") == "plain text")
  }

  test("multimodal: binary media → deterministic feature batches") {
    val media = Seq(
      ("m1", "image", Array.fill[Byte](256)(0x10)),
      ("m2", "audio", (0 until 512).map(i => (i % 256).toByte).toArray),
    ).toDF("id", "kind", "media")
    val feats = Multimodal.extractFeatures(spark, media).collect().map(f => f.id -> f).toMap
    assert(feats("m1").features(1) == 1.0f) // all bytes in bin 1
    assert(feats("m2").nBytes == 512L)
    assert(math.abs(feats("m2").features.sum - 1.0f) < 1e-5) // L1 normalized
    // determinism across runs
    val again = Multimodal.extractFeatures(spark, media).collect().map(f => f.id -> f.features.toSeq).toMap
    assert(again("m2") == feats("m2").features.toSeq)
    // sample stub halves the byte count
    assert(Multimodal.sampleStub(feats("m2").features.map(_ => 1.toByte), 2).length == 8)
  }
}
