package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** n-bit random-hyperplane LSH signature of an embedding column in ONE
  * pass over the vector — the fused form of `Ann.signatureCol`'s
  * composition of `nPlanes` separate [[DotProduct]]s, which read the
  * vector `nPlanes` times and cost plan/codegen size ∝ nPlanes (a
  * 24-plane composed plan spent seconds in Janino; this emits one
  * constant-size static call).
  *
  * VALUE-IDENTICAL to the composed form (pinned by AnnSpec parity):
  * planes live on the first min(dim, 64) coordinates; per plane the
  * accumulation is elementwise `(double) v(i) * coef(p)(i)` in ascending
  * i (the exact order DotProduct used, so the FP sum is bit-for-bit
  * equal); bit p set iff the sum is > 0. A null ARRAY or any null
  * ELEMENT yields signature 0 — exactly what the composed
  * `when(dot > 0, bit).otherwise(0)` chain produced under null
  * propagation.
  *
  * Coefficients are the same deterministic md5-parity planes
  * (`hash60("p:i")` odd → +1 else −1) the SQL oracles re-derive.
  */
case class HyperplaneSignature(child: Expression, nPlanes: Int) extends UnaryExpression {

  require(nPlanes >= 1 && nPlanes <= 30, s"nPlanes must be in [1, 30], got $nPlanes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"hyperplane_sig expects array<float|double>, got $other")
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false // null vector → signature 0

  private def isFloat: Boolean = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    HyperplaneSignature.compute(v.asInstanceOf[ArrayData], nPlanes, isFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val code =
      code"""
        |${c.code}
        |int ${ev.value} = graft.functions.HyperplaneSignature.compute(
        |  ${c.isNull} ? null : ${c.value}, $nPlanes, $isFloat);
      """.stripMargin
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignature =
    copy(child = newChild)
  override def prettyName: String = "hyperplane_sig"
}

object HyperplaneSignature {

  /** Scala twin of `Dedup.hash60` parity: hash60(s) is the first 15 hex
    * chars of md5(s) as an integer, so its parity is the parity of the
    * 15th hex digit.
    */
  private def hash60Odd(s: String): Boolean = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    Integer.parseInt(hex.substring(14, 15), 16) % 2 == 1
  }

  /** Plane p coefficient for dim i: +1 if hash60("p:i") is odd else −1 —
    * identical values to the column-composed derivation.
    */
  def planeCoefs(nPlanes: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes, 64)((p, i) => if (hash60Odd(s"$p:$i")) 1.0 else -1.0)

  private val coefCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Array[Double]]]()

  private def coefsFor(nPlanes: Int): Array[Array[Double]] =
    coefCache.computeIfAbsent(nPlanes, (n: Integer) => planeCoefs(n))

  /** Single-pass signature; called from generated code. Null array or any
    * null element → 0 (see class doc).
    */
  def compute(arr: ArrayData, nPlanes: Int, isFloat: Boolean): Int = {
    if (arr == null) return 0
    val coefs = coefsFor(nPlanes)
    val m = math.min(arr.numElements(), 64)
    val acc = new Array[Double](nPlanes)
    var i = 0
    while (i < m) {
      if (arr.isNullAt(i)) return 0
      val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      var p = 0
      while (p < nPlanes) { acc(p) += x * coefs(p)(i); p += 1 }
      i += 1
    }
    var sig = 0
    var p = 0
    while (p < nPlanes) { if (acc(p) > 0.0) sig |= (1 << p); p += 1 }
    sig
  }

  def sig(vec: Column, nPlanes: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(HyperplaneSignature(GraftColumnBridge.expression(vec), nPlanes))
  }
}
