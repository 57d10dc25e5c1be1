package graft.kg

import java.sql.Timestamp

/** Typed row models mirroring the reference's four graph tables
  * (SURVEY.md §1.1; `graphiti_hf/drivers/huggingface_driver.py:245-322`),
  * with native arrays/maps instead of JSON-in-string columns and ONE
  * canonical bitemporal pair (`valid_at`/`invalid_at` event time,
  * `created_at`/`expired_at` ingestion time — the reference's schema
  * drift between `invalid_at` and `invalidated_at` is deliberately not
  * reproduced, SURVEY.md §1.2).
  *
  * All uuids are deterministic content hashes ([[Ids]]) so golden
  * comparisons, resume, and cross-engine parity are stable
  * (SURVEY.md §7.5.4 — the reference's uuid4 is replaced).
  */
final case class PageRow(url: String, warc_ts: Timestamp, html: Array[Byte], text: String, lang: String)

final case class Episode(
    uuid: String,
    name: String,
    content: String,
    source: String, // message | json | text
    source_description: String,
    group_id: String,
    created_at: Timestamp,
    valid_at: Timestamp,
    entity_edges: Seq[String], // edge uuids created from this episode (graphiti.py:549)
)

final case class EntityNode(
    uuid: String,
    name: String,
    group_id: String,
    labels: Seq[String],
    created_at: Timestamp,
    name_embedding: Seq[Float],
    summary: String,
    attributes: Map[String, String], // typed attribute map (huggingface_driver.py:248-261)
)

final case class EntityEdge(
    uuid: String,
    source_uuid: String,
    target_uuid: String,
    name: String, // relation type
    fact: String, // NL statement
    group_id: String,
    created_at: Timestamp,
    fact_embedding: Seq[Float],
    episodes: Seq[String],
    expired_at: Option[Timestamp],
    valid_at: Option[Timestamp],
    invalid_at: Option[Timestamp],
    manual_invalid_at: Option[Timestamp], // explicit invalidate_edges(); survives rebuilds
)

object Ids {
  // ThreadLocal digest: MessageDigest.getInstance does a synchronized JCA
  // provider lookup — calling it per row/token serializes 32 executor
  // threads (measured: the embed UDF anti-scaled 8→32 cores before this)
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"),
  )
  private val HEX = "0123456789abcdef".toCharArray

  private[graft] def md5bytes(s: String): Array[Byte] = {
    val d = md.get()
    d.reset()
    d.digest(s.getBytes("UTF-8"))
  }

  /** md5 over raw UTF-8 bytes (same digest as [[md5bytes]] without the
    * String round-trip) — used by the native MinhashSignature expression.
    */
  private[graft] def md5raw(utf8: Array[Byte]): Array[Byte] = {
    val d = md.get()
    d.reset()
    d.digest(utf8)
  }

  private def md5hex(s: String): String = {
    val d = md5bytes(s)
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }
  def episode(groupId: String, url: String): String = md5hex(s"ep|$groupId|$url")
  def entity(groupId: String, name: String): String = md5hex(s"en|$groupId|$name")
  def edge(groupId: String, src: String, rel: String, dst: String, validAt: Long): String =
    md5hex(s"ed|$groupId|$src|$rel|$dst|$validAt")
  def community(groupId: String, key: String): String = md5hex(s"co|$groupId|$key")
}

/** Deterministic text embedder — the engine's stand-in for the reference's
  * remote embedding clients (`graphiti_core/embedder/client.py`): a fixed
  * 64-dim hashed bag-of-tokens, L2-normalized. Same contract (newline →
  * space, lowercase) as the reference's pre-embedding normalization
  * (`nodes.py:505`, `edges.py:252`). Pure function of the text bytes, so
  * embeddings are identical across runs, partitions, and engines.
  */
object Embedder {
  val Dim = 64

  /** Codegen entry point for [[graft.functions.EmbedText]]: UTF8String in,
    * UnsafeArrayData out — no boxing, callable from generated Java.
    */
  def embedArrayData(
      s: org.apache.spark.unsafe.types.UTF8String,
  ): org.apache.spark.sql.catalyst.util.ArrayData =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(embed(s.toString))

  def embed(text: String): Array[Float] = {
    val v = new Array[Double](Dim)
    val norm = text.replace('\n', ' ').toLowerCase
    norm.split(" ").foreach { tok =>
      if (tok.nonEmpty) {
        val d = Ids.md5bytes(tok) // thread-local digest, no JCA lookup
        // two md5-derived signals per token: target dim and sign
        val dim = java.lang.Byte.toUnsignedInt(d(0)) % Dim
        val sgn = if ((d(1) & 1) == 1) 1.0 else -1.0
        v(dim) += sgn
        val dim2 = java.lang.Byte.toUnsignedInt(d(2)) % Dim
        val sgn2 = if ((d(3) & 1) == 1) 1.0 else -1.0
        v(dim2) += 0.5 * sgn2
      }
    }
    var ss = 0.0
    var i = 0
    while (i < Dim) { ss += v(i) * v(i); i += 1 }
    val n = math.sqrt(ss)
    val out = new Array[Float](Dim)
    if (n != 0) { i = 0; while (i < Dim) { out(i) = (v(i) / n).toFloat; i += 1 } }
    out
  }
}
