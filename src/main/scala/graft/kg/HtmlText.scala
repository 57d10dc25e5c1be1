package graft.kg

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic HTML → text extraction — the per-row invariant of the
  * engine (byte-identical extracted text per url; BASELINE.json
  * input_hint). The pipeline: drop script/style subtrees, strip tags and
  * comments, decode the basic HTML entities, collapse all whitespace runs
  * to a single space, trim. Mirrors the reference's text normalization
  * contract (newline → space before embedding, `graphiti_core/nodes.py:505`,
  * `edges.py:252`).
  *
  * Two twins that MUST agree byte-for-byte (frozen by HtmlTextSpec):
  *  - [[textOf]]: pure Catalyst column expression chain (regexp_replace is
  *    codegen'd; stays inside WholeStageCodegen — the 100 TB path),
  *  - [[extract]]: plain-Scala function (used in mapPartitions stages and
  *    as the golden-fixture generator).
  */
object HtmlText {

  private val entityMap: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ",
    "&lt;" -> "<",
    "&gt;" -> ">",
    "&quot;" -> "\"",
    "&#39;" -> "'",
    "&apos;" -> "'",
    "&amp;" -> "&", // last: so "&amp;lt;" decodes to "&lt;" not "<"
  )

  /** Column form: html (string or binary) → extracted text. */
  def textOf(html: Column): Column = {
    var c: Column = html.cast("string")
    // drop script/style/head subtrees entirely ((?s) = DOTALL, (?i) = case-insensitive)
    c = regexp_replace(c, "(?is)<(script|style|head)\\b[^>]*>.*?</\\1>", " ")
    // comments
    c = regexp_replace(c, "(?s)<!--.*?-->", " ")
    // tags
    c = regexp_replace(c, "(?s)<[^>]*>", " ")
    // entities
    entityMap.foreach { case (from, to) =>
      c = regexp_replace(c, java.util.regex.Pattern.quote(from), to)
    }
    // whitespace collapse + trim
    trim(regexp_replace(c, "\\s+", " "))
  }

  /** Scala twin of [[textOf]] — keep the steps in lockstep. */
  def extract(html: String): String = {
    var s = html
    s = s.replaceAll("(?is)<(script|style|head)\\b[^>]*>.*?</\\1>", " ")
    s = s.replaceAll("(?s)<!--.*?-->", " ")
    s = s.replaceAll("(?s)<[^>]*>", " ")
    entityMap.foreach { case (from, to) => s = s.replace(from, to) }
    s.replaceAll("\\s+", " ").trim
  }
}
