package graft.queries

import graft.{QueryDef, T}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * language-ID heuristic, quality scoring, token counting, document
  * fingerprinting. All pure column expressions (whole-stage codegen; no
  * UDFs) over the `documents` table — the shape that survives a 100 TB
  * corpus: one scan, no shuffle except the final small aggregate.
  */
object TextAnalysis {

  // tiny stopword sets for the n-gram language heuristic
  private val EnStops = Seq("the", "a", "of", "and", "to")
  private val DataStops = Seq("spark", "query", "table", "join", "filter")

  def defs: Seq[QueryDef] = Seq(
    // ---- lucene_sanitize escaping chain (helpers.py:62-96) applied to
    // synthetic query strings built from part names ----
    QueryDef(
      "q_lucene_sanitize",
      (s, dir) => {
        val p = T.load(s, dir, "part")
        p.filter(col("p_partkey") < 50)
          .withColumn("q", concat(col("p_name"), lit(" (size:"), col("p_size"), lit(") +brand!")))
          .withColumn("sanitized", graft.search.Sanitize.luceneSanitize(col("q")))
          .select(col("p_partkey"), col("sanitized"))
          .orderBy(col("p_partkey"))
      },
      Some("""
        SELECT p_partkey,
               regexp_replace(p_name || ' (size:' || p_size || ') +brand!',
                              '([+\-!(){}\[\]^"~*?:\\/]|&&|\|\|)', '\\\1', 'g') AS sanitized
        FROM part WHERE p_partkey < 50 ORDER BY p_partkey
      """),
    ),

    // ---- language-ID heuristic: stopword-family hit ratios decide the
    // predicted label; compared against the corpus `lang` column ----
    QueryDef(
      "q_lang_id",
      (s, dir) => {
        val d = T.load(s, dir, "documents")
        val toks = split(lower(col("text")), " ")
        val en = size(filter(toks, t => t.isin(EnStops.map(lit(_)): _*)))
        val dt = size(filter(toks, t => t.isin(DataStops.map(lit(_)): _*)))
        d.withColumn(
          "predicted",
          when(en * lit(3) >= dt, lit("en")).otherwise(lit("data")),
        ).groupBy(col("lang"), col("predicted"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("lang"), col("predicted"))
      },
      Some(s"""
        SELECT lang, predicted, count(*) AS n FROM (
          SELECT lang,
            CASE WHEN len(list_filter(string_split(lower(text), ' '),
                         t -> t IN (${EnStops.map(t => s"'$t'").mkString(",")}))) * 3
                  >= len(list_filter(string_split(lower(text), ' '),
                         t -> t IN (${DataStops.map(t => s"'$t'").mkString(",")})))
                 THEN 'en' ELSE 'data' END AS predicted
          FROM documents) t
        GROUP BY lang, predicted ORDER BY lang, predicted
      """),
    ),

    // ---- quality scoring: length / stopword-ratio / mean-token-length
    // features, combined into a deterministic score ----
    QueryDef(
      "q_quality_score",
      (s, dir) => {
        val d = T.load(s, dir, "documents")
        val toks = split(lower(col("text")), " ")
        d.withColumn("n_tokens", size(toks))
          .withColumn(
            "stop_ratio",
            size(filter(toks, t => t.isin(EnStops.map(lit(_)): _*))).cast("double") /
              greatest(size(toks), lit(1)),
          )
          .withColumn(
            "mean_tok_len",
            (length(col("text")) - size(toks) + lit(1)).cast("double") /
              greatest(size(toks), lit(1)),
          )
          .withColumn(
            "quality",
            round(
              when(col("n_tokens") >= 20, lit(0.5)).otherwise(lit(0.0)) +
                when(col("stop_ratio").between(0.01, 0.4), lit(0.3)).otherwise(lit(0.0)) +
                when(col("mean_tok_len").between(3.0, 8.0), lit(0.2)).otherwise(lit(0.0)),
              2,
            ),
          )
          .groupBy(col("quality"))
          .agg(count(lit(1)).as("n"), round(avg(col("n_tokens")), 4).as("avg_tokens"))
          .orderBy(col("quality"))
      },
      Some(s"""
        SELECT quality, count(*) AS n, round(avg(n_tokens), 4) AS avg_tokens FROM (
          SELECT n_tokens,
                 round(CAST(
                   (CASE WHEN n_tokens >= 20 THEN 0.5 ELSE 0.0 END) +
                   (CASE WHEN stop_ratio BETWEEN 0.01 AND 0.4 THEN 0.3 ELSE 0.0 END) +
                   (CASE WHEN mean_tok_len BETWEEN 3.0 AND 8.0 THEN 0.2 ELSE 0.0 END) AS DOUBLE), 2)
                 AS quality
          FROM (
            SELECT len(string_split(lower(text), ' ')) AS n_tokens,
                   len(list_filter(string_split(lower(text), ' '),
                       t -> t IN (${EnStops.map(t => s"'$t'").mkString(",")})))::DOUBLE
                     / greatest(len(string_split(lower(text), ' ')), 1) AS stop_ratio,
                   (length(text) - len(string_split(lower(text), ' ')) + 1)::DOUBLE
                     / greatest(len(string_split(lower(text), ' ')), 1) AS mean_tok_len
            FROM documents) f) t
        GROUP BY quality ORDER BY quality
      """),
    ),

    // ---- token counting: whitespace tokens + BPE-ish regex pieces
    // (alpha runs / digit runs / other) ----
    QueryDef(
      "q_token_count",
      (s, dir) => {
        val d = T.load(s, dir, "documents")
        d.withColumn("ws_tokens", size(split(col("text"), " ")))
          .withColumn("alpha_pieces", size(regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0))))
          .withColumn("digit_pieces", size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0))))
          .groupBy(col("source"))
          .agg(
            sum(col("ws_tokens")).as("total_ws_tokens"),
            sum(col("alpha_pieces")).as("total_alpha"),
            sum(col("digit_pieces")).as("total_digit"),
            count(lit(1)).as("n_docs"),
          )
          .orderBy(col("source"))
      },
      Some("""
        SELECT source,
               sum(len(string_split(text, ' ')))::BIGINT AS total_ws_tokens,
               sum(len(regexp_extract_all(lower(text), '[a-z]+')))::BIGINT AS total_alpha,
               sum(len(regexp_extract_all(text, '[0-9]+')))::BIGINT AS total_digit,
               count(*) AS n_docs
        FROM documents GROUP BY source ORDER BY source
      """),
    ),

    // ---- document fingerprinting: md5 of the normalized token stream
    // (rolling-hash analog; exact-dedup key) ----
    QueryDef(
      "q_fingerprint",
      (s, dir) => {
        val d = T.load(s, dir, "documents")
        d.withColumn(
          "fp",
          md5(concat_ws("", split(lower(col("text")), " "))),
        ).select(col("doc_id"), col("fp"))
          .orderBy(col("doc_id"))
          .limit(100)
      },
      Some("""
        SELECT doc_id,
               md5(list_aggregate(string_split(lower(text), ' '), 'string_agg', ''))
               AS fp
        FROM documents ORDER BY doc_id LIMIT 100
      """),
    ),

    // ---- exact TF-IDF (the oracle-checked twin of the spark.ml
    // HashingTF+IDF vectorizer in text/TfIdf.scala, whose hash buckets a
    // SQL engine cannot reproduce): explicit terms, spark.ml's smoothed
    // idf = ln((N+1)/(df+1)) + 1, corpus-weight per term = idf * Σtf.
    // One token explode → two aggregates; no shuffle beyond them. ----
    QueryDef(
      "q_tfidf",
      (s, dir) => {
        val d = T.load(s, dir, "documents")
        val tf = d
          .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("term"))
          .filter(col("term").rlike("^[a-z]{4,}$"))
          .groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"))
        val byTerm = tf
          .groupBy(col("term"))
          // (doc_id, term) is unique after the tf aggregate, so the
          // distinct count is a plain count — countDistinct planned an
          // Expand + extra aggregate pass for rows already unique
          .agg(count(lit(1)).as("df"), sum(col("tf")).as("total_tf"))
        val nDocs = d.agg(count(lit(1)).as("n"))
        byTerm
          .filter(col("df") >= 20)
          .crossJoin(broadcast(nDocs))
          .withColumn(
            "tfidf_sum",
            round((log((col("n") + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0)) * col("total_tf"), 6),
          )
          .select(col("term"), col("df"), col("tfidf_sum"))
          .orderBy(col("term"))
      },
      Some("""
        WITH tf AS (
          SELECT doc_id, term, count(*) AS tf
          FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents) t
          WHERE regexp_matches(term, '^[a-z]{4,}$')
          GROUP BY 1, 2
        ), agg AS (
          SELECT term, count(DISTINCT doc_id) AS df, sum(tf) AS total_tf FROM tf GROUP BY 1
        )
        SELECT term, df,
               round((ln(((SELECT count(*) FROM documents) + 1.0) / (df + 1.0)) + 1.0) * total_tf, 6)
               AS tfidf_sum
        FROM agg WHERE df >= 20 ORDER BY term
      """),
    ),
  )
}
