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

  // Combined markup stripper: script/style/head subtrees, comments, tags —
  // ONE regex pass instead of three full-string copies.
  private val markup = java.util.regex.Pattern.compile(
    "(?is)<(script|style|head)\\b[^>]*>.*?</\\1>|<!--.*?-->|<[^>]*>",
  )

  /** Byte-identical fast twin of [[extract]]: one markup-strip pass, then
    * one manual scan doing entity decoding + whitespace collapse + trim.
    * The engine's hot path (12 full-string regex copies → 2 passes) —
    * memory traffic, not CPU, limits extraction throughput at scale.
    * Equality with [[extract]] is frozen by HtmlTextSpec on fixtures and
    * on the whole synthetic corpus.
    */
  def extractFast(html: String): String = {
    val stripped = markup.matcher(html).replaceAll(" ")
    val n = stripped.length
    val out = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var i = 0
    def emit(c: Char): Unit = {
      // exactly Java regex \s = [ \t\n\x0B\f\r] (NOT Unicode whitespace),
      // to stay byte-identical with the reference pass
      if (c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r') {
        if (out.length() > 0) pendingSpace = true // leading ws trimmed
      } else {
        if (pendingSpace) { out.append(' '); pendingSpace = false }
        out.append(c)
      }
    }
    while (i < n) {
      val c = stripped.charAt(i)
      if (c == '&') {
        // longest-first entity match at this position (same winners as the
        // sequential-replace reference: tokens are mutually non-overlapping)
        val rest = n - i
        if (rest >= 6 && stripped.startsWith("&nbsp;", i)) { emit(' '); i += 6 }
        else if (rest >= 6 && stripped.startsWith("&quot;", i)) { emit('"'); i += 6 }
        else if (rest >= 6 && stripped.startsWith("&apos;", i)) { emit('\''); i += 6 }
        else if (rest >= 5 && stripped.startsWith("&amp;", i)) { emit('&'); i += 5 }
        else if (rest >= 5 && stripped.startsWith("&#39;", i)) { emit('\''); i += 5 }
        else if (rest >= 4 && stripped.startsWith("&lt;", i)) { emit('<'); i += 4 }
        else if (rest >= 4 && stripped.startsWith("&gt;", i)) { emit('>'); i += 4 }
        else { emit(c); i += 1 }
      } else { emit(c); i += 1 }
    }
    out.toString
  }
}
