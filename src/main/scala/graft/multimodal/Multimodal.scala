package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: media as opaque
  * `binary` columns with typed metadata, processed batch-wise in
  * `mapPartitions` (the Scala analog of `mapInPandas` batch UDFs).
  *
  * IMAGE decode is REAL: `javax.imageio` (PNG/BMP/GIF — ships in the JDK)
  * → width/height + 16-bin luminance histogram + per-channel means
  * ([[decodeImage]]). AUDIO decode is REAL: `javax.sound.sampled`
  * (WAV/AIFF/AU — ships in the JDK) → rate/channels/duration/rms +
  * amplitude histogram ([[decodeAudio]]). VIDEO container metadata is
  * REAL: MP4/ISO-BMFF box parsing (pure JVM) → width/height/duration/
  * track count ([[decodeVideoMeta]]); FRAME decode stays stubbed (no
  * video codec libraries ship in this environment): [[decodeStub]]
  * produces a deterministic byte-histogram "feature vector" so the
  * Spark-side plumbing — schema, url-hash partitioning, batch shape,
  * feature column types — is real and tested end-to-end for every kind.
  */
object Multimodal {

  final case class MediaRow(id: String, kind: String, media: Array[Byte], width: Int, height: Int)
  final case class MediaFeatures(id: String, kind: String, nBytes: Long, features: Array[Float])

  /** REAL image decode (PNG/BMP/GIF via ImageIO): features =
    * [width, height, meanR, meanG, meanB, 16-bin luminance histogram
    * (L1-normalized)] — 21 floats. Returns None if the bytes are not a
    * decodable image (caller falls back to [[decodeStub]]).
    */
  def decodeImage(media: Array[Byte]): Option[Array[Float]] = {
    val img =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(media)))
      catch { case _: java.io.IOException => None }
    img.map { im =>
      val w = im.getWidth
      val h = im.getHeight
      var (sr, sg, sb) = (0.0, 0.0, 0.0)
      val hist = new Array[Float](16)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = im.getRGB(x, y)
          val r = (rgb >> 16) & 0xff
          val g = (rgb >> 8) & 0xff
          val b = rgb & 0xff
          sr += r; sg += g; sb += b
          // ITU-R BT.601 integer luminance, binned to 16 levels
          val lum = (299 * r + 587 * g + 114 * b) / 1000
          hist(lum >> 4) += 1f
          x += 1
        }
        y += 1
      }
      val n = (w.toLong * h).max(1L).toFloat
      Array(w.toFloat, h.toFloat, (sr / n).toFloat, (sg / n).toFloat, (sb / n).toFloat) ++
        hist.map(_ / n)
    }
  }

  /** REAL audio decode (WAV/AIFF/AU via `javax.sound.sampled` — ships in
    * the JDK): decodes to 16-bit signed PCM and emits
    * [sampleRate, channels, durationSec, rms, 16-bin amplitude histogram
    * (L1-normalized)] — 20 floats. Returns None for undecodable bytes
    * (caller falls back to [[decodeStub]]).
    */
  def decodeAudio(media: Array[Byte]): Option[Array[Float]] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    try {
      val ais = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(media))
      try {
        val fmt = ais.getFormat
        val pcmFmt = new AudioFormat(
          AudioFormat.Encoding.PCM_SIGNED,
          fmt.getSampleRate, 16, fmt.getChannels, 2 * fmt.getChannels, fmt.getSampleRate, false,
        )
        val pcm = AudioSystem.getAudioInputStream(pcmFmt, ais)
        val bytes = pcm.readAllBytes()
        val n = bytes.length / 2
        var ss = 0.0
        val hist = new Array[Float](16)
        var i = 0
        while (i < n) {
          val s = (((bytes(2 * i + 1) & 0xff) << 8) | (bytes(2 * i) & 0xff)).toShort.toInt
          ss += s.toDouble * s
          hist((s + 32768) >> 12) += 1f
          i += 1
        }
        val rms = if (n > 0) math.sqrt(ss / n) / 32768.0 else 0.0
        val dur = if (fmt.getChannels > 0) n.toFloat / fmt.getChannels / fmt.getSampleRate else 0f
        val nf = n.max(1).toFloat
        Some(Array(fmt.getSampleRate, fmt.getChannels.toFloat, dur, rms.toFloat) ++ hist.map(_ / nf))
      } finally ais.close()
    } catch { case _: Exception => None }
  }

  /** REAL video container metadata (MP4/ISO-BMFF box parsing — pure JVM,
    * no codec needed): walks the box tree to `moov/mvhd` (timescale +
    * duration) and every `moov/trak/tkhd` (16.16 fixed-point width/
    * height; the max across tracks is the video track — audio tracks
    * carry 0×0), emitting
    * [width, height, durationSec, nTracks, 16-bin byte histogram] —
    * 20 floats, same shape family as the other modalities. FRAME decode
    * stays stubbed (no codecs ship in this environment; the histogram
    * tail stands in for pixel features). Returns None when the bytes are
    * not a parseable MP4 (caller falls back to [[decodeStub]]).
    */
  def decodeVideoMeta(media: Array[Byte]): Option[Array[Float]] = {
    def u32(o: Int): Long =
      if (o + 4 > media.length) -1L
      else ((media(o) & 0xffL) << 24) | ((media(o + 1) & 0xffL) << 16) | ((media(o + 2) & 0xffL) << 8) | (media(o + 3) & 0xffL)
    def u64(o: Int): Long = (u32(o) << 32) | u32(o + 4)
    def boxType(o: Int): String =
      if (o + 8 > media.length) ""
      else new String(media, o + 4, 4, "ISO-8859-1")

    // (offset, payloadStart, end) per box in [lo, hi)
    def boxes(lo: Int, hi: Int): Iterator[(Int, Int, Int)] = new Iterator[(Int, Int, Int)] {
      private var o = lo
      def hasNext: Boolean = o + 8 <= hi && u32(o) != -1L
      def next(): (Int, Int, Int) = {
        val sz = u32(o)
        val (payload, end) =
          if (sz == 1L) (o + 16, o + math.min(u64(o + 8), (hi - o).toLong).toInt)
          else if (sz == 0L) (o + 8, hi)
          else (o + 8, o + math.min(sz, (hi - o).toLong).toInt)
        val r = (o, payload, math.max(end, payload))
        o = r._3
        r
      }
    }

    try {
      val top = boxes(0, media.length).map(b => (boxType(b._1), b)).toSeq
      // a real MP4 leads with ftyp (or styp for segments); require it so
      // arbitrary bytes don't parse accidentally
      if (!top.headOption.exists(t => t._1 == "ftyp" || t._1 == "styp")) return None
      val moov = top.collectFirst { case ("moov", b) => b }.getOrElse(return None)

      var timescale = 0L
      var duration = 0L
      var nTracks = 0
      var w = 0f
      var h = 0f
      boxes(moov._2, moov._3).foreach { b =>
        boxType(b._1) match {
          case "mvhd" =>
            val v = media(b._2) & 0xff
            if (v == 1) { timescale = u32(b._2 + 20); duration = u64(b._2 + 24) }
            else { timescale = u32(b._2 + 12); duration = u32(b._2 + 16) }
          case "trak" =>
            nTracks += 1
            boxes(b._2, b._3).foreach { t =>
              if (boxType(t._1) == "tkhd") {
                val v = media(t._2) & 0xff
                // width/height are the LAST 8 bytes of tkhd's fixed
                // layout (after the 36-byte matrix), same offset from the
                // end for both versions
                val whOff = t._2 + (if (v == 1) 4 + 8 + 8 + 4 + 4 + 8 else 4 + 4 + 4 + 4 + 4 + 4) + 8 + 2 + 2 + 2 + 2 + 36
                val tw = (u32(whOff) >> 16).toFloat
                val th = (u32(whOff + 4) >> 16).toFloat
                if (tw > w || th > h) { w = tw; h = th }
              }
            }
          case _ =>
        }
      }
      if (timescale == 0L && nTracks == 0) None
      else {
        val durSec = if (timescale > 0) duration.toFloat / timescale else 0f
        Some(Array(w, h, durSec, nTracks.toFloat) ++ decodeStub(media))
      }
    } catch { case _: IndexOutOfBoundsException => None }
  }

  /** STUB decode: 16-bin byte histogram, L1-normalized. Deterministic
    * pure function of the bytes — stands in for pixel/audio decoding.
    */
  def decodeStub(media: Array[Byte]): Array[Float] = {
    val h = new Array[Float](16)
    var i = 0
    while (i < media.length) { h(java.lang.Byte.toUnsignedInt(media(i)) >> 4) += 1f; i += 1 }
    val n = media.length.max(1).toFloat
    h.map(_ / n)
  }

  /** STUB resize/frame-sample: deterministic subsample of every k-th byte
    * (stands in for image resize / video frame sampling — keeps the batch
    * shape and output schema of the real operator).
    */
  def sampleStub(media: Array[Byte], k: Int): Array[Byte] =
    media.indices.collect { case i if i % k == 0 => media(i) }.toArray

  /** media table → per-item feature rows, one partition-batch at a time
    * (decoder state initialized once per partition, the mapInPandas batch
    * contract).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media
      .select(col("id"), col("kind"), col("media"))
      .as[(String, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init point for a real decoder; images decode via
        // ImageIO, audio via javax.sound.sampled (both real, pure JDK);
        // video keeps the disclosed stub (no codecs in this environment)
        it.map { case (id, kind, bytes) =>
          val feats = kind match {
            case "image" => decodeImage(bytes).getOrElse(decodeStub(bytes))
            case "audio" => decodeAudio(bytes).getOrElse(decodeStub(bytes))
            case "video" => decodeVideoMeta(bytes).getOrElse(decodeStub(bytes))
            case _ => decodeStub(bytes)
          }
          MediaFeatures(id, kind, bytes.length.toLong, feats)
        }
      }
  }
}
