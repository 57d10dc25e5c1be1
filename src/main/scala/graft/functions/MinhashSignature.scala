package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native MinHash signature over a shingle array — the signature stage of
  * the LSH dedup scale path (`dedup/Dedup.minhashLshPairs`) and of entity
  * blocking (`kg/Linking.blockingKeys`).
  *
  * Scheme: ONE md5 per shingle, split into two 60-bit halves h1 (digest
  * bits 0-59) and h2 (bits 64-123); hash k is (h1 + k·h2) mod 2^60 — the
  * Kirsch–Mitzenmacher double-hashing construction, which preserves
  * MinHash's collision behavior while computing n hashes from one digest.
  * The previous column formulation ran n SEPARATE md5s per shingle
  * (hash60(concat(k, ':', shingle)) for each seed k) plus n interpreted
  * HOF passes; this expression is one digest + n fused mul-adds per
  * shingle in a single pass. Deterministic and partitioning-independent,
  * like everything else on the dedup path.
  *
  * Null/empty semantics: null or empty shingle array → null signature
  * (every call site filters size ≥ 1 first); null elements are skipped.
  */
case class MinhashSignature(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "minhash signature needs at least one hash")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"minhash_signature expects array<string>, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MinhashSignature.signature(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // freshName per instance: avoids local-variable redefinition when two
    // signatures land in one generated function.
    val sig = ctx.freshName("mhSig")
    nullSafeCodeGen(
      ctx,
      ev,
      a => s"""
        |org.apache.spark.sql.catalyst.util.ArrayData $sig =
        |  graft.functions.MinhashSignature.signature($a, $n);
        |if ($sig == null) { ${ev.isNull} = true; } else { ${ev.value} = $sig; }
      """.stripMargin,
    )
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature = copy(child = newChild)
  override def prettyName: String = "minhash_signature"
}

object MinhashSignature {

  private val Mask60 = (1L << 60) - 1

  /** Big-endian 60-bit halves of the digest: bits 0-59 and 64-123 (the
    * integer values of hex chars 1-15 and 17-31 — same extraction as
    * `Dedup.hash60`'s conv(substring(md5, ...), 16, 10)).
    */
  private def h60(d: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = off
    while (i < off + 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** One pass over the shingles: per element one md5, n running minima.
    * Returns null for null/empty input (callers filter size ≥ 1).
    */
  def signature(shingles: ArrayData, n: Int): ArrayData = {
    if (shingles == null) return null
    val m = shingles.numElements()
    val mins = new Array[Long](n)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    var i = 0
    while (i < m) {
      if (!shingles.isNullAt(i)) {
        any = true
        val d = graft.kg.Ids.md5raw(shingles.getUTF8String(i).getBytes)
        val h1 = h60(d, 0)
        val h2 = h60(d, 8)
        var k = 0
        var h = h1
        while (k < n) {
          val v = h & Mask60 // (h1 + k*h2) mod 2^60 — 2^64 wraparound nests
          if (v < mins(k)) mins(k) = v
          h += h2
          k += 1
        }
      }
      i += 1
    }
    if (!any) null else UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** Column entry point. */
  def minhash(shingles: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(MinhashSignature(GraftColumnBridge.expression(shingles), n))
  }
}
