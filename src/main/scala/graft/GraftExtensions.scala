package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{DotProduct, EmbedText, HyperplaneSignature, L2Normalize, MinhashSignature, TokenCounts}

/** SparkSessionExtensions entry point: registers graft's native Catalyst
  * expressions as SQL functions, so `spark.sql` users get the same
  * codegen'd kernels the DataFrame API uses:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)          // programmatic
  *   // or: .config("spark.sql.extensions", "graft.GraftExtensions")
  *   .getOrCreate()
  * spark.sql("SELECT dot_f(a.emb, b.emb) FROM ...")
  * }}}
  *
  * Functions:
  *   - `dot_f(array<float|double>, array<float|double>) → double`
  *   - `l2_normalize(array<float|double>) → array<double>`
  *   - `minhash_signature(array<string>, n) → array<bigint>` (n literal)
  *   - `graft_embed(string) → array<float>`
  *   - `graft_token_counts(string) → struct<dl int, counts map<string,int>>`
  *   - `hyperplane_sig(array<float|double>, n) → int` (n literal — the
  *     edge_ann LSH signature, single-pass fused planes)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptions.foreach(ext.injectFunction)
}

object GraftExtensions {

  /** What `SparkSessionExtensions.injectFunction` takes (the
    * FunctionRegistry alias for it is not public in Spark 4.1).
    */
  type FunctionDescription = (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def description(
      name: String,
      usage: String,
      arity: Int,
      build: Seq[Expression] => Expression,
  ): FunctionDescription = (
    FunctionIdentifier(name),
    info(name, usage),
    (args: Seq[Expression]) => {
      if (args.length != arity)
        throw new IllegalArgumentException(s"$name expects $arity argument(s), got ${args.length}")
      build(args)
    },
  )

  /** The full function surface, shared by the extensions path and
    * [[install]].
    */
  val descriptions: Seq[FunctionDescription] = Seq(
    description("dot_f", "dot_f(a, b) - codegen'd dot product of two embedding arrays", 2, {
      case Seq(a, b) => DotProduct(a, b)
    }),
    description("l2_normalize", "l2_normalize(a) - single-pass L2 normalization (zero vector unchanged)", 1, {
      case Seq(a) => L2Normalize(a)
    }),
    description(
      "minhash_signature",
      "minhash_signature(shingles, n) - n-hash MinHash signature (n a literal int)",
      2,
      { case Seq(a, nExpr) =>
        val n = nExpr match {
          case Literal(v: Int, IntegerType) => v
          case other =>
            throw new IllegalArgumentException(
              s"minhash_signature: n must be an integer literal, got $other")
        }
        MinhashSignature(a, n)
      },
    ),
    description(
      "hyperplane_sig",
      "hyperplane_sig(vec, n) - n-bit hyperplane LSH signature (n a literal int)",
      2,
      { case Seq(a, nExpr) =>
        val n = nExpr match {
          case Literal(v: Int, IntegerType) => v
          case other =>
            throw new IllegalArgumentException(
              s"hyperplane_sig: n must be an integer literal, got $other")
        }
        HyperplaneSignature(a, n)
      },
    ),
    description("graft_embed", "graft_embed(text) - deterministic 64-dim embedding", 1, {
      case Seq(a) => EmbedText(a)
    }),
    description("graft_token_counts", "graft_token_counts(text) - (dl, term→tf) with the engine tokenizer", 1, {
      case Seq(a) => TokenCounts(a)
    }),
  )

  /** Register the same functions on an already-created session (the
    * extensions mechanism only runs at session construction).
    */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    descriptions.foreach(org.apache.spark.sql.GraftColumnBridge.registerFunction(spark, _))
}
