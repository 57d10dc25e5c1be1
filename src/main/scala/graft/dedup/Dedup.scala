package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication operators for a web-scale training-data
  * pipeline: exact (hash groupBy), n-gram-shingle Jaccard, deterministic
  * MinHash+LSH banding, SimHash. The candidate-blocking + verify shape is
  * the scalable replacement for the reference's all-pairs dedup loops
  * (`graphiti_core/utils/bulk_utils.py:266-294` word-overlap blocking;
  * `graphiti_hf/.../deduplicator.py:343-365` O(n²)).
  *
  * All hash functions are deterministic md5-derived 60-bit integers —
  * identical across engines and partitionings, so results are stable and
  * oracle-checkable (no spark.ml random seeds in the output path).
  */
object Dedup {

  /** 60-bit deterministic hash of a string column (15 hex chars of md5). */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Distinct 3-token shingles of a text column (lowercased,
    * space-tokenized — the reference's tokenizer contract).
    *
    * The token array is LET-BOUND via a single-element `transform` so the
    * `split` runs once per row: referencing `split(...)` directly inside
    * the shingle lambda re-evaluates it for every `element_at` — three
    * splits per shingle, O(tokens²) string work per document (measured
    * ~10× the whole query's cost at sf0.1). Catalyst's subexpression
    * elimination does not reach inside higher-order-function lambdas;
    * binding the array as a lambda variable is the expression-level `let`.
    * Value-identical by construction (same expression, evaluated once).
    */
  def shingles3(text: Column): Column =
    element_at(
      transform(
        array(split(lower(text), " ")),
        t =>
          when(size(t) < 3, array().cast("array<string>")).otherwise(
            array_distinct(
              transform(
                sequence(lit(1), size(t) - lit(2)),
                i => concat_ws(" ", element_at(t, i), element_at(t, i + lit(1)), element_at(t, i + lit(2))),
              ),
            ),
          ),
      ),
      1,
    )

  /** Jaccard similarity of two (distinct-element) array columns. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** MinHash signature: hash k = min over shingles of (h1 + k·h2) mod
    * 2^60, with h1/h2 the two 60-bit halves of ONE md5 per shingle
    * (Kirsch–Mitzenmacher double hashing) — a native single-pass
    * expression; the previous form ran n separate md5s per shingle. See
    * [[graft.functions.MinhashSignature]].
    */
  def minhashSignature(shingleCol: Column, n: Int): Column =
    graft.functions.MinhashSignature.minhash(shingleCol, n)

  /** All-pairs n-gram Jaccard dedup (the verification path): docs
    * (id, text) → pairs (i, j, jac) with jac ≥ threshold > 0, i < j.
    *
    * Formulated as an equi-join on the exploded shingles — |A∩B| comes
    * from a groupBy over shared shingles and |A∪B| = |A|+|B|−|A∩B| — so
    * pairs with ZERO overlap (jac = 0, excluded by any threshold > 0) are
    * never materialized and no shingle array is ever copied into a pair
    * row. Same output as the naive theta join at a fraction of the cost;
    * still quadratic in the worst case (every doc sharing one shingle),
    * which is why the LSH variant remains the 100 TB path.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String, threshold: Double): DataFrame = {
    require(threshold > 0, "zero-overlap pairs are not materialized; threshold must be > 0")
    val sh = docs.select(col(idCol).as("id"), shingles3(col(textCol)).as("sh"))
    val sizes = sh.select(col("id"), size(col("sh")).as("n"))
    // the shingle string never leaves the equi-join — fold it to a 64-bit
    // xxhash64 so the join's build/probe side carries 8 bytes per row
    // instead of a ~25-char trigram (guide §2.3: narrower join keys).
    // |A∩B| via hashed distinct shingles is exact unless two DISTINCT
    // shingles of one candidate pair collide in 64 bits (P ≈ m²/2^65 for
    // m distinct corpus shingles — ~10⁻⁸ here), deterministic per corpus,
    // and the DuckDB oracle re-checks the exact values at every SF.
    val ex = sh.select(col("id"), explode(col("sh")).as("s")).select(col("id"), xxhash64(col("s")).as("s"))
    ex.select(col("id").as("i"), col("s"))
      .join(ex.select(col("id").as("j"), col("s")), Seq("s"))
      .filter(col("i") < col("j"))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("c"))
      .join(sizes.select(col("id").as("i"), col("n").as("ni")), Seq("i"))
      .join(sizes.select(col("id").as("j"), col("n").as("nj")), Seq("j"))
      .withColumn("jac", col("c").cast("double") / (col("ni") + col("nj") - col("c")).cast("double"))
      .filter(col("jac") >= lit(threshold))
      .select(col("i"), col("j"), round(col("jac"), 6).as("jac"))
  }

  /** MinHash-LSH dedup (the 100 TB path): shingle → 16-hash minhash
    * signature → 8 bands of width 2 → bucket self-join on (band, key) →
    * exact-Jaccard verification of candidates only. Output identical to
    * [[ngramJaccardPairs]] whenever band recall is 1 at the threshold
    * (deterministic hashes: P(miss) = (1−s²)⁸ ≈ 3.5e-6 at s = 0.89, and
    * it either passes for a given corpus or not — no run-to-run variance).
    * The O(n²) is replaced by O(candidates); skewed buckets (boilerplate
    * shingles) are bounded by the band key's 120-bit selectivity and can
    * be salted if a hot bucket appears.
    */
  def minhashLshPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      maxBucketSize: Int = Int.MaxValue,
  ): DataFrame = {
    val numHashes = 16
    val bandWidth = 2
    // checkpointed (id, shingles): the band self-join below shuffles SLIM
    // (band, key, id) rows only — a hot bucket of k docs must not shuffle
    // k² shingle-array copies — and surviving candidate pairs (few by
    // construction) fetch the token sets back from this frame for the
    // exact-Jaccard verification. Same re-plan Linking.duplicatePairs got.
    val sig = docs
      .select(col(idCol).as("id"), shingles3(col(textCol)).as("sh"))
      .filter(size(col("sh")) > 0)
      .localCheckpoint()
    val banded = sig
      .withColumn("mh", minhashSignature(col("sh"), numHashes))
      .select(
        col("id"),
        posexplode(
          array((0 until numHashes / bandWidth).map { bnd =>
            concat_ws(
              ":",
              (0 until bandWidth).map(o => element_at(col("mh"), bnd * bandWidth + o + 1)): _*
            )
          }: _*),
        ).as(Seq("band", "key")),
      )
    // hot-bucket guard (web boilerplate: a shingle band shared by k docs
    // yields k² candidate rows): buckets above maxBucketSize are DROPPED —
    // at default ∞ this is a no-op; the 100 TB path sets a cap and accepts
    // the documented recall trade (a near-dup pair this hot almost surely
    // also collides in one of the other 7 bands)
    val guarded =
      if (maxBucketSize == Int.MaxValue) banded
      else {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("band"), col("key"))
        banded.withColumn("__n", count(lit(1)).over(w)).filter(col("__n") <= maxBucketSize).drop("__n")
      }
    val a = guarded.select(col("band"), col("key"), col("id").as("i"))
    val b = guarded.select(col("band"), col("key"), col("id").as("j"))
    a.join(b, Seq("band", "key"))
      .filter(col("i") < col("j"))
      .select(col("i"), col("j"))
      .dropDuplicates("i", "j")
      .join(sig.select(col("id").as("i"), col("sh").as("sha")), Seq("i"))
      .join(sig.select(col("id").as("j"), col("sh").as("shb")), Seq("j"))
      .withColumn("jac", jaccard(col("sha"), col("shb")))
      .filter(col("jac") >= lit(threshold))
      .select(col("i"), col("j"), round(col("jac"), 6).as("jac"))
  }

  /** SimHash fingerprint (60-bit): per token-occurrence hash, ±1 vote per
    * bit, bit set iff the vote sum is positive. Single mapPartitions pass
    * with integer bit-twiddling — the former explode formulation
    * multiplied every token row ×60 bits through two shuffles; votes are
    * integers, so this is EXACTLY the same fingerprint (order-independent
    * sums), shuffle-free.
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).cast("long").as("id"), split(lower(col(textCol)), " ").as("toks"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        // one digest per partition (JCA getInstance per row serializes
        // executor threads on the provider lock)
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, toks) =>
          val votes = new Array[Int](60)
          toks.foreach { t =>
            md.reset()
            val hex = md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
            // hash60: first 15 hex chars as a 60-bit integer
            val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
            var b = 0
            while (b < 60) {
              if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
              b += 1
            }
          }
          var sig = 0L
          var b = 0
          while (b < 60) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
          (id, sig)
        }
      }
      .toDF("id", "simhash")
  }
}
