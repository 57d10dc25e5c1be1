package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: media as opaque
  * `binary` columns with typed metadata, processed batch-wise in
  * `mapPartitions` (the Scala analog of `mapInPandas` batch UDFs).
  *
  * The actual image/audio DECODE is STUBBED (no codec libraries ship in
  * this environment): [[decodeStub]] produces a deterministic
  * byte-histogram "feature vector" so the Spark-side plumbing — schema,
  * url-hash partitioning, batch shape, feature column types — is real and
  * tested end-to-end. Swap [[decodeStub]] for a real decoder (JPEG →
  * pixels, PCM frames, video frame-sampling) without touching the plan.
  */
object Multimodal {

  final case class MediaRow(id: String, kind: String, media: Array[Byte], width: Int, height: Int)
  final case class MediaFeatures(id: String, kind: String, nBytes: Long, features: Array[Float])

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
        // per-partition init point for a real decoder
        it.map { case (id, kind, bytes) =>
          MediaFeatures(id, kind, bytes.length.toLong, decodeStub(bytes))
        }
      }
  }
}
