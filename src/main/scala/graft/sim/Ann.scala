package graft.sim

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

  /** Scala twin of `Dedup.hash60` parity: hash60(s) is the first 15 hex
    * chars of md5(s) as an integer, so its parity is the parity of the
    * 15th hex digit. Used to derive the plane coefficients driver-side.
    */
  private def hash60Odd(s: String): Boolean = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    Integer.parseInt(hex.substring(14, 15), 16) % 2 == 1
  }

  /** Plane p coefficient for dim i: +1 if hash60("p:i") is odd else −1 —
    * identical values to the former DataFrame derivation (same md5 parity).
    */
  private def planeCoefs(nPlanes: Int): Array[Array[Double]] =
    graft.functions.HyperplaneSignature.planeCoefs(nPlanes)

  /** Column form of the signature: bit p = 1 iff Σᵢ coef(p,i)·vᵢ > 0 —
    * the fused native expression ([[graft.functions.HyperplaneSignature]]):
    * ONE pass over the vector advances every plane accumulator (the
    * previous composition of nPlanes separate dots read the vector
    * nPlanes times and cost plan/codegen size ∝ nPlanes), value-identical
    * bit for bit (AnnSpec parity test vs the composed form).
    *
    * Defined for ANY vector dimension: planes live on the first
    * min(dim, 64) coordinates — 64-dim vectors (`Embedder.Dim`) use the
    * full plane (bit-identical to the fixed-64 form the SQL oracles
    * re-derive), other dims project onto the shared prefix subspace. The
    * alternative (a null dot on length mismatch) silently collapsed every
    * off-dimension vector into signature 0, turning the LSH index into a
    * single all-corpus bucket and sig-keyed dedup blocks quadratic.
    */
  def signatureCol(vec: org.apache.spark.sql.Column, nPlanes: Int = 8): org.apache.spark.sql.Column =
    graft.functions.HyperplaneSignature.sig(vec, nPlanes)

  /** n-bit signature of a vector under deterministic hyperplanes. */
  def signature(vecs: DataFrame, idCol: String, vecCol: String, nPlanes: Int = 8): DataFrame =
    vecs.select(col(idCol).as("id"), signatureCol(col(vecCol), nPlanes).as("sig"))

  /** Multi-probe signature set of a QUERY vector: the exact signature plus
    * the `nProbe − 1` variants with the LOWEST-MARGIN bits flipped (margin
    * = |plane dot| — the planes the vector sits closest to, i.e. the bits
    * most likely to differ on a true near neighbor). This is the standard
    * multi-probe LSH recall/cost trade, the hyperplane analog of the
    * minhash band trade documented on `Dedup.lshCandidates`: widening the
    * signature (nPlanes ↑) cuts probe cost ~2× per bit but loses near
    * neighbors that straddle a plane; multi-probe (nProbe ↑) buys the
    * recall back at nProbe× probe cost — still exponentially cheaper than
    * a narrow signature at corpus scale. Corpus rows keep ONE signature;
    * only queries fan out.
    */
  def probeSignaturesCol(
      vec: org.apache.spark.sql.Column,
      nPlanes: Int = 8,
      nProbe: Int = 1,
  ): org.apache.spark.sql.Column = {
    val base = signatureCol(vec, nPlanes)
    if (nProbe <= 1) array(base)
    else {
      val n = least(size(vec), lit(64))
      val v = slice(vec, lit(1), n)
      // (|margin|, bit mask) per plane; sort ascending → flip the closest
      // planes first. The margin ROUNDS to 6 decimals before ordering
      // (same discipline as the cosine scores): the SQL oracle sums the
      // plane dot in a different order, so near-equal raw margins could
      // order differently across engines and diverge the probe sets —
      // after rounding, ties break deterministically on the bit mask.
      val margins = array(planeCoefs(nPlanes).zipWithIndex.map { case (coefs, p) =>
        val coefArr = slice(array(coefs.map(lit): _*), lit(1), n)
        struct(round(abs(graft.search.Vectors.dot(v, coefArr)), 6).as("m"), lit(1 << p).as("mask"))
      }: _*)
      val flips = slice(sort_array(margins), 1, math.min(nProbe - 1, nPlanes))
      concat(array(base), transform(flips, f => base.bitwiseXOR(f.getField("mask"))))
    }
  }

  /** IVF (inverted-file) top-k — the FAISS `IndexIVF` analog
    * (`vector_search.py:36-189` uses flat/IVF FAISS indexes): the corpus is
    * partitioned into cells by nearest centroid and a query scores only the
    * `nProbe` cells nearest to it.
    *
    * The coarse quantizer is evaluated INLINE: the centroid table is tiny
    * by construction (FAISS holds it in RAM too), so it is collected once
    * and each centroid becomes a literal coefficient array in a codegen
    * expression — cell assignment costs one projection over the corpus,
    * with NO shuffle and no per-vector join. At 100 TB `cell` is the
    * physical partition column of the committed index table, so a probe
    * reads nProbe/nCells of the corpus; here the same pruning happens via
    * the equi-join on `cell`.
    *
    * Deterministic: ranking on round(cosine, 6) with ties broken by the
    * smaller centroid/vector id — exactly reproducible by the SQL oracle.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame, k: Int, nProbe: Int): DataFrame = {
    val cents: Array[(Long, Array[Double])] = centroids
      .select(col("cid").cast("long"), col("cv"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Number](1).map(_.doubleValue()).toArray))
    require(cents.nonEmpty, "ivfTopK needs at least one centroid")
    // array of (score, -cid) structs: struct ordering makes array_max /
    // sort_array rank by score desc with ties to the SMALLER cid
    def scoredCells(vec: org.apache.spark.sql.Column) = array(cents.map { case (cid, cv) =>
      struct(
        round(Vectors.cosine(vec, array(cv.map(lit): _*)), 6).as("score"),
        lit(-cid).as("ncid"),
      )
    }: _*)
    val cells = corpus.withColumn(
      "cell",
      (lit(0L) - array_max(scoredCells(col("v"))).getField("ncid")).cast("long"),
    )
    val probed = queries
      .withColumn("pc", slice(sort_array(scoredCells(col("qv")), asc = false), 1, nProbe))
      .withColumn("cell", explode(transform(col("pc"), p => lit(0L) - p.getField("ncid"))))
      .select(col("cell"), col("qid"), col("qv"))
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("id"))
    cells
      .join(broadcast(probed), Seq("cell"))
      .withColumn("score", round(Vectors.cosine(col("v"), col("qv")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("rk"), col("id"), col("score"))
  }

  /** Nearest-centroid assignment as ONE projection: the centroid table is
    * tiny by construction (same contract as [[ivfTopK]]'s coarse
    * quantizer), so each centroid becomes a literal coefficient array and
    * the argmax runs inside codegen — no crossJoin materialization of
    * corpus×centroids and no per-vector window shuffle. Returns
    * (id, cell, score) with ties to the smaller centroid id.
    */
  def assignCells(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val cents: Array[(Long, Array[Double])] = centroids
      .select(col("cid").cast("long"), col("cv"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Number](1).map(_.doubleValue()).toArray))
    require(cents.nonEmpty, "assignCells needs at least one centroid")
    val scoredCells = array(cents.map { case (cid, cv) =>
      struct(
        round(Vectors.cosine(col("v"), array(cv.map(lit): _*)), 6).as("score"),
        lit(-cid).as("ncid"),
      )
    }: _*)
    corpus
      .withColumn("best", array_max(scoredCells))
      .select(
        col("id"),
        (lit(0L) - col("best").getField("ncid")).cast("long").as("cell"),
        col("best").getField("score").as("score"),
      )
  }

  /** LSH-bucketed top-k: score only candidates whose corpus signature
    * matches one of the query's probe signatures. The signature is
    * computed INLINE on both sides (pure expression) — the former
    * id-self-joins re-shuffled the whole corpus just to attach it.
    * `nPlanes` widens the signature (probe cost ~2⁻ⁿ of the corpus per
    * probe); `nProbe` flips the lowest-margin bits to buy recall back —
    * see [[probeSignaturesCol]] for the trade.
    */
  def lshBucketTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      nPlanes: Int = 8,
      nProbe: Int = 1,
  ): DataFrame = {
    val q = queries.withColumn("sig", explode(probeSignaturesCol(col("qv"), nPlanes, nProbe)))
    val c = corpus.withColumn("sig", signatureCol(col("v"), nPlanes))
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
