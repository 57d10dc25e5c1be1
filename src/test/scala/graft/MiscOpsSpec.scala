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

  test("multimodal: REAL mp4 container metadata (moov/mvhd/tkhd box parsing)") {
    def u32(v: Long): Array[Byte] = java.nio.ByteBuffer.allocate(4).putInt(v.toInt).array()
    def box(tp: String, payload: Array[Byte]): Array[Byte] =
      java.nio.ByteBuffer
        .allocate(payload.length + 8)
        .putInt(payload.length + 8)
        .put(tp.getBytes("ISO-8859-1"))
        .put(payload)
        .array()
    // mvhd v0: timescale 600, duration 1800 → 3.0 s
    val mvhd = box("mvhd", Array[Byte](0, 0, 0, 0) ++ u32(0) ++ u32(0) ++ u32(600) ++ u32(1800) ++ Array.fill[Byte](80)(0))
    // tkhd v0: 4 ver/flags + ctime/mtime/id/res/dur (20) + res 8 +
    // layer/alt/vol/res (8) + matrix 36 + 16.16 width/height (8) = 84
    def tkhd(w: Long, h: Long) = box(
      "tkhd",
      Array[Byte](0, 0, 0, 0) ++ u32(0) ++ u32(0) ++ u32(1) ++ u32(0) ++ u32(1800) ++
        Array.fill[Byte](8 + 8 + 36)(0) ++ u32(w << 16) ++ u32(h << 16),
    )
    val moov = box("moov", mvhd ++ box("trak", tkhd(640, 360)) ++ box("trak", tkhd(0, 0)))
    val mp4 = box("ftyp", "isomiso2".getBytes("ISO-8859-1")) ++ moov

    val f = Multimodal.decodeVideoMeta(mp4).get
    assert(f(0) == 640f && f(1) == 360f, s"width/height: ${f(0)}x${f(1)}")
    assert(f(2) == 3.0f, s"duration: ${f(2)}")
    assert(f(3) == 2f, "track count")
    assert(f.length == 20 && math.abs(f.drop(4).sum - 1.0f) < 1e-5, "byte-histogram tail, L1")

    // non-MP4 bytes refuse to parse → batch path falls back to the stub
    assert(Multimodal.decodeVideoMeta(Array.fill[Byte](64)(7)).isEmpty)
    val media = Seq(("v1", "video", mp4), ("v2", "video", Array.fill[Byte](64)(7))).toDF("id", "kind", "media")
    val rows = Multimodal.extractFeatures(spark, media).collect().map(r => r.id -> r.features).toMap
    assert(rows("v1").toSeq == f.toSeq)
    assert(rows("v2").length == 16, "fallback keeps the stub shape")
  }

  test("multimodal: REAL png decode via javax.imageio (width/height/channel means/lum histogram)") {
    // 4×2 image: left half pure red, right half pure blue — known stats
    val im = new java.awt.image.BufferedImage(4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4)
      im.setRGB(x, y, if (x < 2) 0xff0000 else 0x0000ff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    val png = bos.toByteArray

    val f = Multimodal.decodeImage(png).get
    assert(f(0) == 4f && f(1) == 2f) // width, height
    assert(f(2) == 127.5f && f(3) == 0f && f(4) == 127.5f) // mean R/G/B
    // luminance: red = 299*255/1000 = 76 → bin 4; blue = 114*255/1000 = 29 → bin 1
    assert(f(5 + 4) == 0.5f && f(5 + 1) == 0.5f)
    assert(math.abs(f.drop(5).sum - 1.0f) < 1e-6)

    // the image kind flows through extractFeatures' real-decode branch
    val rows = Multimodal
      .extractFeatures(spark, Seq(("p1", "image", png)).toDF("id", "kind", "media"))
      .collect()
    assert(rows.head.features.length == 21 && rows.head.features(0) == 4f)
    // non-image bytes under kind=image fall back to the stub (16 bins)
    val fallback = Multimodal
      .extractFeatures(spark, Seq(("p2", "image", Array.fill[Byte](32)(7))).toDF("id", "kind", "media"))
      .collect()
    assert(fallback.head.features.length == 16)
  }

  test("multimodal: REAL wav decode via javax.sound.sampled (rate/channels/duration/rms/histogram)") {
    // 8000 Hz mono 16-bit WAV, 800 samples of a full-scale square wave
    // (+16384/-16384 alternating every sample): rms = 0.5 exactly,
    // duration 0.1 s, amplitude bins (16384+32768)>>12 = 12 and
    // (-16384+32768)>>12 = 4, half the mass each
    val n = 800
    val pcm = new Array[Byte](2 * n)
    for (i <- 0 until n) {
      val s: Short = if (i % 2 == 0) 16384 else -16384
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong,
    )
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray

    val f = Multimodal.decodeAudio(wav).get
    assert(f.length == 20)
    assert(f(0) == 8000f && f(1) == 1f) // sample rate, channels
    assert(math.abs(f(2) - 0.1f) < 1e-6) // duration
    assert(math.abs(f(3) - 0.5f) < 1e-3) // rms of a half-scale square wave
    assert(f(4 + 12) == 0.5f && f(4 + 4) == 0.5f) // amplitude bins
    // audio kind flows through extractFeatures' real-decode branch;
    // non-audio bytes fall back to the 16-bin stub
    import spark.implicits._
    val rows = Multimodal
      .extractFeatures(
        spark,
        Seq(("a1", "audio", wav), ("a2", "audio", Array.fill[Byte](32)(7))).toDF("id", "kind", "media"),
      )
      .collect()
      .map(r => r.id -> r.features)
      .toMap
    assert(rows("a1").length == 20 && rows("a1")(0) == 8000f)
    assert(rows("a2").length == 16)
  }
}
