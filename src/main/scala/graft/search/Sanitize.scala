package graft.search

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** `lucene_sanitize` (`graphiti_core/helpers.py:62-96`): escape Lucene
  * query-syntax special characters with a backslash. Kept for API parity
  * with reference callers that pre-sanitize fulltext queries (our BM25 is
  * native and needs no escaping).
  */
object Sanitize {

  // the reference's escaped set: + - && || ! ( ) { } [ ] ^ " ~ * ? : \ /
  private val SpecialClass = """([+\-!(){}\[\]^"~*?:\\/]|&&|\|\|)"""

  def luceneSanitize(c: Column): Column =
    regexp_replace(c, SpecialClass, """\\$1""")

  def luceneSanitize(s: String): String =
    s.replaceAll(SpecialClass, """\\$1""")
}
