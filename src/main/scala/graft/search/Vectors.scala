package graft.search

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math as native column expressions — no UDFs. Mirrors the
  * reference's cosine / L2-normalize helpers
  * (`graphiti_core/search/search_utils.py:75-86`,
  * `graphiti_core/helpers.py:99-102`). Elements are cast to double before
  * arithmetic so float32 storage doesn't leak precision differences.
  *
  * The dot product is a custom codegen'd expression
  * ([[graft.functions.DotProduct]]): Spark's higher-order lambdas
  * (`aggregate`/`zip_with`) run interpreted per element, which made every
  * cosine lane's inner loop a boxed-eval path. Values are bit-identical
  * to the HOF form (same element order, same double casts).
  */
object Vectors {

  def dot(a: Column, b: Column): Column = graft.functions.DotProduct.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** L2-normalized copy of the vector (normalize_l2, helpers.py:99-102) —
    * native single-pass expression; the HOF `transform(a, x / norm(a))`
    * re-ran the norm aggregate per element.
    */
  def l2normalize(a: Column): Column = graft.functions.L2Normalize.l2normalize(a)
}
