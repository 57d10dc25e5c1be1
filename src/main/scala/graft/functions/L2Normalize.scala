package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native L2 normalization of an embedding column (normalize_l2,
  * `graphiti_core/helpers.py:99-102`).
  *
  * The HOF form `transform(a, x => x / sqrt(aggregate(...)))` re-evaluated
  * the norm aggregate INSIDE the per-element lambda — O(d²) interpreted
  * work per row — and THREW under ANSI mode (Spark 4 default) on a zero
  * vector. This expression computes the norm once, emits the scaled array
  * in a single codegen'd pass, and mirrors the reference's zero-norm
  * contract exactly: `np.where(norm == 0, embedding, embedding / norm)` —
  * a zero vector comes back unchanged (helpers.py:99-102).
  */
case class L2Normalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"l2_normalize expects array<float|double>, got $other")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true // null element → null, like the HOF form

  private def isFloat: Boolean = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val xs = new Array[Double](n)
    var i = 0
    var ss = 0.0
    while (i < n) {
      if (a.isNullAt(i)) return null
      xs(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      ss += xs(i) * xs(i)
      i += 1
    }
    val norm = math.sqrt(ss)
    if (norm != 0.0) { i = 0; while (i < n) { xs(i) = xs(i) / norm; i += 1 } }
    UnsafeArrayData.fromPrimitiveArray(xs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    // freshName per instance so two l2_normalize calls can share a
    // generated function without local-variable redefinition.
    val n = ctx.freshName("l2N")
    val xs = ctx.freshName("l2Xs")
    val ss = ctx.freshName("l2Ss")
    val i = ctx.freshName("l2I")
    val norm = ctx.freshName("l2Norm")
    nullSafeCodeGen(
      ctx,
      ev,
      a => s"""
        |int $n = $a.numElements();
        |double[] $xs = new double[$n];
        |double $ss = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
        |  $xs[$i] = (double) $a.$get($i);
        |  $ss += $xs[$i] * $xs[$i];
        |}
        |if (!${ev.isNull}) {
        |  double $norm = java.lang.Math.sqrt($ss);
        |  if ($norm != 0.0) {
        |    for (int $i = 0; $i < $n; $i++) { $xs[$i] = $xs[$i] / $norm; }
        |  }
        |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($xs);
        |}
      """.stripMargin,
    )
  }

  override protected def withNewChildInternal(newChild: Expression): L2Normalize = copy(child = newChild)
  override def prettyName: String = "l2_normalize"
}

object L2Normalize {

  /** Codegen'd L2-normalized copy of an embedding column. */
  def l2normalize(a: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(L2Normalize(GraftColumnBridge.expression(a)))
  }
}
