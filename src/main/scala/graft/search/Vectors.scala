package graft.search

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math as higher-order column functions — codegen-friendly, no
  * UDFs. Mirrors the reference's cosine / L2-normalize helpers
  * (`graphiti_core/search/search_utils.py:75-86`,
  * `graphiti_core/helpers.py:99-102`). Elements are cast to double before
  * arithmetic so float32 storage doesn't leak precision differences.
  */
object Vectors {

  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v,
    )

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** L2-normalized copy of the vector (normalize_l2, helpers.py:99-102). */
  def l2normalize(a: Column): Column = {
    transform(a, x => x.cast("double") / norm(a))
  }
}
