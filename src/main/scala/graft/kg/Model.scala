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
)

final case class EntityNode(
    uuid: String,
    name: String,
    group_id: String,
    labels: Seq[String],
    created_at: Timestamp,
    name_embedding: Seq[Float],
    summary: String,
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
)

object Ids {
  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
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

  def embed(text: String): Array[Float] = {
    val v = new Array[Double](Dim)
    val norm = text.replace('\n', ' ').toLowerCase
    norm.split(" ").filter(_.nonEmpty).foreach { tok =>
      val d = java.security.MessageDigest.getInstance("MD5").digest(tok.getBytes("UTF-8"))
      // two md5-derived signals per token: target dim and sign
      val dim = java.lang.Byte.toUnsignedInt(d(0)) % Dim
      val sgn = if ((d(1) & 1) == 1) 1.0 else -1.0
      v(dim) += sgn
      val dim2 = java.lang.Byte.toUnsignedInt(d(2)) % Dim
      val sgn2 = if ((d(3) & 1) == 1) 1.0 else -1.0
      v(dim2) += 0.5 * sgn2
    }
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0) new Array[Float](Dim) else v.map(x => (x / n).toFloat)
  }
}
