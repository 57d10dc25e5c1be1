package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the deterministic text embedder
  * (`graft.kg.Embedder.embed` — the engine's stand-in for the reference's
  * embedder clients, `graphiti_core/embedder/client.py`).
  *
  * Why an `Expression` and not a Scala UDF: the edge build embeds every
  * deduped fact — a hot path (`KgPipeline` stage 6, `IncrementalIngest.
  * mergeEdges`). A UDF is an opaque boundary there: each row pays
  * UTF8String→String→UDF→Seq[Float]→Catalyst re-encoding through a
  * generic serializer, and the optimizer cannot see through it. This
  * expression participates in whole-stage codegen (`doGenCode` emits a
  * direct static call), reads the UTF8String once, and writes the result
  * as an `UnsafeArrayData` with no boxing — same bytes out, one less
  * interpreter boundary in the hottest stage.
  */
case class EmbedText(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"graft_embed expects a string column, got ${child.dataType}")
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    graft.kg.Embedder.embedArrayData(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.kg.Embedder.embedArrayData($c)")

  override protected def withNewChildInternal(newChild: Expression): EmbedText = copy(child = newChild)
  override def prettyName: String = "graft_embed"
}

/** Column-level entry points for graft's native expressions. */
object Functions {

  /** Deterministic 64-dim embedding of a text column (codegen'd; identical
    * values to `Embedder.embed`).
    */
  def embedText(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(EmbedText(GraftColumnBridge.expression(c)))
  }

  /** Per-document `struct<dl, counts map<term, tf>>` with the engine's
    * tokenizer contract — one codegen'd pass, no token explode/shuffle.
    */
  def tokenCounts(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(TokenCounts(GraftColumnBridge.expression(c)))
  }
}
