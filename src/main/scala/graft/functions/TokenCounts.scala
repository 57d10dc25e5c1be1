package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document token statistics in ONE row-local pass:
  * `struct<dl: int, counts: map<term, tf>>` with the engine's tokenizer
  * contract (`split(lower(text), " ")`, the reference's
  * `text.lower().split()` stand-in — hybrid_search.py:117,223).
  *
  * Why an `Expression`: the BM25 inverted-index build previously computed
  * per-(doc, term) tf by EXPLODING every token occurrence and aggregating
  * with a corpus-wide `groupBy(term, id, dl)` — a shuffle of one row per
  * token (page text: ~10² tokens/doc) on every index build and every
  * incremental refresh. tf is a row-local fact; this expression computes
  * the whole (dl, term→tf) summary inside the scan (whole-stage codegen,
  * one UTF8String pass, no boxing of token strings into a Spark row per
  * occurrence), so the only remaining exchange in an index build is the
  * bucketed write itself, and a micro-batch's postings delta needs no
  * shuffle at all.
  *
  * Tokenizer equivalence is byte-exact with `split(lower(text), " ")`
  * (Java split semantics at limit −1: consecutive spaces yield empty
  * tokens, trailing empties kept, empty input → one empty token), verified
  * by the randomized Bm25DifferentialSpec.
  */
case class TokenCounts(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"graft_token_counts expects a string column, got ${child.dataType}")

  override def dataType: DataType = TokenCounts.Schema

  override def nullSafeEval(input: Any): Any =
    TokenCounts.statsOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenCounts.statsOf($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenCounts = copy(child = newChild)
  override def prettyName: String = "graft_token_counts"
}

object TokenCounts {

  val Schema: StructType = StructType(Seq(
    StructField("dl", IntegerType, nullable = false),
    StructField("counts", MapType(StringType, IntegerType, valueContainsNull = false), nullable = false),
  ))

  /** (token count, term→tf map) of one document. Splits the LOWERCASED
    * bytes on 0x20 (a space byte never occurs inside a UTF-8 multibyte
    * sequence, so byte-splitting is exact), keeping empty segments —
    * identical tokens to `split(lower(text), " ")`.
    */
  def statsOf(s: UTF8String): InternalRow = {
    val lower = s.toLowerCase
    val bytes = lower.getBytes
    val counts = new java.util.LinkedHashMap[UTF8String, Int]()
    var dl = 0
    var start = 0
    var i = 0
    val n = bytes.length
    while (i <= n) {
      if (i == n || bytes(i) == ' '.toByte) {
        val tok = UTF8String.fromBytes(bytes, start, i - start)
        // j.u.Map[_, Int].get unboxes a missing key's null to 0 (BoxesRunTime)
        counts.put(tok, counts.get(tok) + 1)
        dl += 1
        start = i + 1
      }
      i += 1
    }
    val m = counts.size()
    val keys = new Array[Any](m)
    val vals = new Array[Any](m)
    val it = counts.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      keys(k) = e.getKey
      vals(k) = e.getValue
      k += 1
    }
    new GenericInternalRow(Array[Any](
      dl,
      new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals)),
    ))
  }
}
