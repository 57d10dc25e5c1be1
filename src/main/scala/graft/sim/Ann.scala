package graft.sim

import graft.dedup.Dedup.hash60
import graft.search.Vectors
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`) — the Spark-native replacement for the reference's
  * FAISS indexes (`graphiti_hf/search/vector_search.py:36-189`).
  *
  *  - [[bruteForceTopK]]: exact batched top-k — a broadcast of the (small)
  *    query set against the corpus, per-query window top-k. One corpus
  *    scan, no shuffle of the corpus side; the baseline and the
  *    verification path.
  *  - [[lshBucketTopK]]: random-hyperplane (sign) LSH with deterministic
  *    md5-derived hyperplanes — corpus is bucketed once by an 8-bit
  *    signature (IVF-style partition pruning: only same-bucket candidates
  *    are scored). At 100 TB the signature is a partition column, so a
  *    query probes 1/256 of the corpus.
  */
object Ann {

  /** Exact top-k: queries (qid, qv) × corpus (id, v) → per-qid top-k by
    * cosine desc (ties → smaller id).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val scored = corpus
      .crossJoin(broadcast(queries))
      .withColumn("score", round(Vectors.cosine(col("v"), col("qv")), 6))
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("id"))
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("rk"), col("id"), col("score"))
  }

  /** 8-bit signature of a vector under deterministic hyperplanes:
    * plane p coefficient for dim i = +1 if hash60("p:i") is odd else −1;
    * bit p = 1 iff Σᵢ coef·vᵢ > 0.
    */
  def signature(spark: SparkSession, vecs: DataFrame, idCol: String, vecCol: String, nPlanes: Int = 8): DataFrame = {
    val planes = spark
      .range(nPlanes)
      .select(col("id").cast("int").as("p"))
      .crossJoin(spark.range(64).select(col("id").cast("int").as("i")))
      .withColumn(
        "coef",
        when(hash60(concat(col("p"), lit(":"), col("i"))) % 2 === 1, lit(1.0)).otherwise(lit(-1.0)),
      )
    vecs
      .select(col(idCol).as("id"), posexplode(col(vecCol)).as(Seq("i", "x")))
      .join(broadcast(planes), Seq("i"))
      .groupBy(col("id"), col("p"))
      .agg(sum(col("coef") * col("x").cast("double")).as("dot"))
      .withColumn("bit", when(col("dot") > 0, expr("shiftleft(1, p)")).otherwise(lit(0)))
      .groupBy(col("id"))
      .agg(sum(col("bit")).cast("int").as("sig"))
  }

  /** LSH-bucketed top-k: score only same-signature candidates. */
  def lshBucketTopK(spark: SparkSession, queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val qsig = signature(spark, queries, "qid", "qv").withColumnRenamed("id", "qid")
    val csig = signature(spark, corpus, "id", "v")
    val q = queries.join(qsig, Seq("qid"))
    val c = corpus.join(csig, Seq("id"))
    val scored = c
      .join(broadcast(q), Seq("sig"))
      .withColumn("score", round(Vectors.cosine(col("v"), col("qv")), 6))
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("id"))
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("rk"), col("id"), col("score"))
  }
}
