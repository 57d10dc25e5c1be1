package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two embedding columns (array<float> or
  * array<double>) — the hot scalar of every cosine lane (ANN scoring,
  * near-dup verification, hybrid search).
  *
  * Why an `Expression`: the previous formulation
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` is correct but Spark
  * evaluates higher-order lambdas INTERPRETED (per element: variable
  * binding + boxed eval — they never enter whole-stage codegen), and
  * zip_with materializes an intermediate products array per row. This
  * expression emits a tight primitive loop in generated code. Arithmetic
  * is kept IDENTICAL to the HOF form — each element cast to double, then
  * left-to-right accumulation — so every stored score and oracle value is
  * bit-for-bit unchanged; unequal lengths and null elements yield null,
  * exactly as zip_with's null padding did.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"dot_f expects array<float|double> inputs, got ${left.dataType} and ${right.dataType}",
      )

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // unequal lengths / null elements → null

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val xf = isFloat(left)
    val yf = isFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xGet = if (isFloat(left)) "getFloat" else "getDouble"
    val yGet = if (isFloat(right)) "getFloat" else "getDouble"
    // freshName per instance: two dot products in one generated function
    // (e.g. cosine = dot(a,b)/sqrt(dot(a,a)*dot(b,b))) must not collide.
    val n = ctx.freshName("dotN")
    val acc = ctx.freshName("dotAcc")
    val i = ctx.freshName("dotI")
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => s"""
        |int $n = $a.numElements();
        |if ($n != $b.numElements()) {
        |  ${ev.isNull} = true;
        |} else {
        |  double $acc = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
        |    $acc += (double) $a.$xGet($i) * (double) $b.$yGet($i);
        |  }
        |  if (!${ev.isNull}) ${ev.value} = $acc;
        |}
      """.stripMargin,
    )
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "dot_f"
}

object DotProduct {

  /** Codegen'd dot product of two embedding columns (bit-identical to the
    * `aggregate(zip_with(...))` form it replaces).
    */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(DotProduct(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }
}
