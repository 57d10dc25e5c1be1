package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 keyword scoring as relational algebra (no Spark built-in) — the
  * scalable re-expression of the reference's in-memory BM25Okapi index
  * (`graphiti_hf/search/hybrid_search.py:108-122,205-252`).
  *
  * Formulation: tokenize → explode → per-(doc, term) tf / per-term df
  * aggregates → broadcast-join the (tiny) per-query-term idf table back →
  * one final groupBy(doc). Only tokens matching the query survive the
  * explode filter, so the shuffled volume is O(matching tokens), not
  * O(corpus tokens). The corpus-stats side (df, avgdl) is a candidate for
  * incremental maintenance as a precomputed table at 100 TB scale.
  *
  * Tokenizer contract: `lower(text)` split on single spaces — must match
  * the reference's `text.lower().split()` (`hybrid_search.py:117,223`).
  * Constants: k1 = 1.2, b = 0.75 (Lucene-style; idf = ln(1+(N-df+0.5)/(df+0.5))
  * is non-negative, avoiding BM25Okapi's negative-idf epsilon clamp).
  */
object Bm25 {
  val K1 = 1.2
  val B = 0.75

  /** Token count of a text under the tokenizer contract, WITHOUT
    * materializing the token array: `split(lower(x), " ")` (limit −1 keeps
    * trailing empty strings) always yields exactly (number of single-space
    * occurrences + 1) elements, and lowercasing never changes a space —
    * so `regexp_count(x, " ") + 1` is value-identical to
    * `size(split(lower(x), " "))` while skipping both the lowercase copy
    * and the array allocation (guide §1.2 per-task work; this runs over
    * every document on every stats scan).
    */
  def dlCol(text: Column): Column = regexp_count(text, lit(" ")) + lit(1)

  /** Score `docs` (idCol, textCol) against `queryTerms`; returns
    * (id, score) for docs with score > 0.
    */
  def score(docs: DataFrame, idCol: String, textCol: String, queryTerms: Seq[String]): DataFrame = {
    // tf is row-local: the native TokenCounts expression computes the
    // (dl, term→tf) summary inside the scan, and only the query's own
    // terms are exploded — the former form exploded EVERY token occurrence
    // and recovered tf with a corpus-wide groupBy(id, dl, term) shuffle.
    // Identical values: TokenCounts is byte-exact with split(lower, " ")
    // and (id, term) is unique here by construction.
    val qt = array(queryTerms.map(lit): _*)
    val base = docs.select(col(idCol).as("id"), graft.functions.Functions.tokenCounts(col(textCol)).as("tc"))
    // stats scan reads only token COUNTS — dlCol counts separators without
    // materializing the per-doc term map or token array (identical dl)
    val corpus = docs.agg(
      count(lit(1)).as("n_docs"),
      avg(dlCol(col(textCol))).as("avgdl"),
    )
    val tf = base
      .select(
        col("id"),
        col("tc.dl").as("dl"),
        explode(map_filter(col("tc.counts"), (k, _) => array_contains(qt, k))).as(Seq("term", "tf")),
      )
      .withColumn("tf", col("tf").cast("long"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(corpus))
      .withColumn("idf", log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn(
        "w",
        col("idf") * (col("tf") * lit(K1 + 1.0)) /
          (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl"))),
      )
      .groupBy(col("id"))
      .agg(sum(col("w")).as("score"))
  }

  // ------------------------------------------------------------------
  // Inverted-index form (SearchIndexes: stats precomputed at pipeline
  // time; a query probes only its terms' posting lists)
  // ------------------------------------------------------------------

  /** Per-(doc, term) frequencies with doc length: (term, id, dl, tf).
    *
    * tf is a ROW-LOCAL fact, so it is computed inside the scan by the
    * native [[graft.functions.TokenCounts]] expression (one codegen'd pass
    * per document) and exploded at one row per DISTINCT term — the former
    * explode-every-occurrence + corpus-wide `groupBy(term, id, dl)` form
    * shuffled one row per token on every index build and refresh. Identical
    * output (Bm25DifferentialSpec cross-checks the tokenizer contract).
    */
  def termFreqs(docs: DataFrame): DataFrame =
    docs
      .select(col("id"), graft.functions.Functions.tokenCounts(col("text")).as("tc"))
      .select(col("id"), col("tc.dl").as("dl"), explode(col("tc.counts")).as(Seq("term", "tf")))
      .select(col("term"), col("id"), col("dl"), col("tf").cast("long").as("tf"))

  /** Full inverted index (term, id, tf, dl, df) — df denormalized per row
    * so scoring needs no query-time aggregation join.
    *
    * df = count of rows per term, which equals countDistinct(id) because
    * (term, id) is unique after the tf aggregate and dl is a function of
    * id — computed as a WINDOW over term instead of the former
    * tf ⋈ groupBy(term) join, which shuffled the corpus-sized tf frame
    * one extra time (the window's term shuffle has the same hot-term
    * placement the join's term shuffle already had, so skew is unchanged;
    * the raw token explode still aggregates map-side on the balanced
    * (term, id, dl) key first).
    */
  def postings(docs: DataFrame): DataFrame =
    termFreqs(docs).withColumn(
      "df",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col("term"))),
    )

  /** The two corpus scalars BM25 needs: (n_docs, total_dl). */
  def corpusStats(docs: DataFrame): DataFrame =
    docs.agg(
      count(lit(1)).as("n_docs"),
      coalesce(sum(dlCol(col("text"))), lit(0L)).as("total_dl"),
    )

  /** Batch form of [[score]]: every query scored in ONE corpus pass — the
    * Spark-first re-expression of `batch_hybrid_search`'s per-query loop
    * (`hybrid_search.py:417-442` runs `hybrid_search` once per query over
    * the same in-memory index). `queryTerms` is the request-sized
    * (query_id, term) relation (distinct terms per query, matching the
    * single-query contract); it is broadcast into the scan, so tf/df/dl
    * are computed once and fanned out to the queries that asked for each
    * term. Shuffles are keyed (query_id, id) — adding queries adds
    * balanced partitions, not passes. Returns (query_id, id, score).
    */
  def scoreBatch(docs: DataFrame, idCol: String, textCol: String, queryTerms: DataFrame): DataFrame = {
    val qt = queryTerms.select(col("query_id"), col("term")).distinct()
    val terms = qt.select(col("term")).distinct()
    val base = docs.select(col(idCol).as("id"), graft.functions.Functions.tokenCounts(col(textCol)).as("tc"))
    val corpus = docs.agg(
      count(lit(1)).as("n_docs"),
      avg(dlCol(col(textCol))).as("avgdl"),
    )
    // one row per (doc, distinct term); the broadcast term join prunes
    // non-query tokens map-side before anything shuffles
    val tf = base
      .select(col("id"), col("tc.dl").as("dl"), explode(col("tc.counts")).as(Seq("term", "tf")))
      .join(broadcast(terms), Seq("term"))
      .withColumn("tf", col("tf").cast("long"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), Seq("term"))
      .join(broadcast(qt), Seq("term")) // fan out to every query containing the term
      .crossJoin(broadcast(corpus))
      .withColumn("idf", log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn(
        "w",
        col("idf") * (col("tf") * lit(K1 + 1.0)) /
          (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl"))),
      )
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("w")).as("score"))
  }

  /** Score from a probed posting set (same formula as [[score]], corpus
    * stats injected instead of recomputed — identical results when the
    * index matches the corpus).
    */
  def scoreIndexed(probed: DataFrame, nDocs: Long, avgdl: Double, queryTerms: Seq[String]): DataFrame =
    probed
      .filter(col("term").isin(queryTerms: _*))
      .withColumn("idf", log(lit(1.0) + (lit(nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn(
        "w",
        col("idf") * (col("tf") * lit(K1 + 1.0)) /
          (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / lit(avgdl))),
      )
      .groupBy(col("id"))
      .agg(sum(col("w")).as("score"))

  /** Batch probe of a posting set: same formula as [[scoreIndexed]] with
    * the (query_id, term) fan-out of [[scoreBatch]]. `probed` must already
    * be restricted to the union of the queries' terms (postingsForTerms).
    */
  def scoreIndexedBatch(probed: DataFrame, nDocs: Long, avgdl: Double, queryTerms: DataFrame): DataFrame =
    probed
      .join(broadcast(queryTerms.select(col("query_id"), col("term")).distinct()), Seq("term"))
      .withColumn("idf", log(lit(1.0) + (lit(nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn(
        "w",
        col("idf") * (col("tf") * lit(K1 + 1.0)) /
          (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / lit(avgdl))),
      )
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("w")).as("score"))

  /** The same formula as a DuckDB SQL oracle over table `tbl`. */
  def oracleSql(tbl: String, idCol: String, textCol: String, queryTerms: Seq[String]): String = {
    val termList = queryTerms.map(t => s"'$t'").mkString(", ")
    s"""
    WITH toks AS (
      SELECT $idCol AS id, string_split(lower($textCol), ' ') AS tokens FROM $tbl),
    lens AS (SELECT id, len(tokens) AS dl FROM toks),
    corpus AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM lens),
    tf AS (
      SELECT t.id, l.dl, u.term, count(*) AS tf
      FROM toks t JOIN lens l ON t.id = l.id, unnest(t.tokens) AS u(term)
      WHERE u.term IN ($termList)
      GROUP BY t.id, l.dl, u.term),
    dfreq AS (SELECT term, count(DISTINCT id) AS df FROM tf GROUP BY term)
    SELECT tf.id,
           sum(ln(1.0 + (c.n_docs - d.df + 0.5) / (d.df + 0.5))
               * (tf.tf * ${K1 + 1.0})
               / (tf.tf + $K1 * (${1.0 - B} + $B * tf.dl / c.avgdl))) AS score
    FROM tf JOIN dfreq d ON tf.term = d.term, corpus c
    GROUP BY tf.id
    """
  }

  /** Batch oracle: [[oracleSql]] with a (query_id, term) VALUES relation.
    * df stays corpus-global per term (as in the engine), so scores for a
    * term are identical across queries.
    */
  def oracleSqlBatch(tbl: String, idCol: String, textCol: String, queries: Seq[(Long, Seq[String])]): String = {
    val qtValues = queries
      .flatMap { case (qid, ts) => ts.distinct.map(t => s"($qid, '$t')") }
      .mkString(", ")
    s"""
    WITH qt(query_id, term) AS (VALUES $qtValues),
    toks AS (
      SELECT $idCol AS id, string_split(lower($textCol), ' ') AS tokens FROM $tbl),
    lens AS (SELECT id, len(tokens) AS dl FROM toks),
    corpus AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM lens),
    tf AS (
      SELECT t.id, l.dl, u.term, count(*) AS tf
      FROM toks t JOIN lens l ON t.id = l.id, unnest(t.tokens) AS u(term)
      WHERE u.term IN (SELECT DISTINCT term FROM qt)
      GROUP BY t.id, l.dl, u.term),
    dfreq AS (SELECT term, count(DISTINCT id) AS df FROM tf GROUP BY term)
    SELECT qt.query_id, tf.id,
           sum(ln(1.0 + (c.n_docs - d.df + 0.5) / (d.df + 0.5))
               * (tf.tf * ${K1 + 1.0})
               / (tf.tf + $K1 * (${1.0 - B} + $B * tf.dl / c.avgdl))) AS score
    FROM tf JOIN dfreq d ON tf.term = d.term JOIN qt ON qt.term = tf.term, corpus c
    GROUP BY qt.query_id, tf.id
    """
  }
}
