package graft.queries

import graft.{QueryDef, T}
import graft.dedup.{Dedup => D}
import org.apache.spark.sql.functions._

/** Deduplication operator suite over the `documents` table. The brute-
  * force and LSH variants share one oracle: the LSH path must reproduce
  * the exact all-pairs result (candidate blocking + exact verification).
  */
object Dedup {

  // all-pairs 3-gram Jaccard in DuckDB (shared oracle)
  private def jacOracle(threshold: Double) =
    s"""
    WITH toks AS (SELECT doc_id, string_split(lower(text),' ') AS t FROM documents),
    sh AS (SELECT doc_id,
                  list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                 for i in range(1, len(t)-1)]) AS s
           FROM toks WHERE len(t) >= 3 AND doc_id < 600),
    pairs AS (
      SELECT a.doc_id i, b.doc_id j,
             len(list_intersect(a.s, b.s))::DOUBLE
               / len(list_distinct(list_concat(a.s, b.s))) AS jac
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
    SELECT i, j, round(jac, 6) AS jac FROM pairs WHERE jac >= $threshold
    ORDER BY i, j
    """

  def defs: Seq[QueryDef] = Seq(
    // ---- exact dedup: md5 fingerprint groups, representative = min id ----
    QueryDef(
      "q_dedup_exact",
      (s, dir) => {
        T.load(s, dir, "documents")
          .groupBy(md5(col("text")).as("fp"))
          .agg(min(col("doc_id")).as("representative"), count(lit(1)).as("group_size"))
          .orderBy(col("representative"))
      },
      Some("""
        SELECT md5(text) AS fp, min(doc_id) AS representative,
               count(*) AS group_size
        FROM documents GROUP BY md5(text) ORDER BY representative
      """),
    ),

    // ---- n-gram Jaccard near-dup, brute-force all-pairs (verification
    // path; O(n²)) ----
    QueryDef(
      "q_dedup_ngram_jaccard",
      (s, dir) =>
        // O(n²) verification path: bounded to the first 600 doc ids so the
        // all-pairs stays a verification tool at any SF (sf0.01 has 500
        // docs — unbounded there; the LSH query is the scale path)
        D.ngramJaccardPairs(T.load(s, dir, "documents").filter(col("doc_id") < 600), "doc_id", "text", 0.3)
          .orderBy(col("i"), col("j")),
      Some(jacOracle(0.3)),
    ),

    // ---- MinHash+LSH near-dup (the scale path): 16 minhashes, 8 bands ×
    // width 2, bucket join, exact verify — same oracle as brute force ----
    QueryDef(
      "q_dedup_minhash_lsh",
      (s, dir) =>
        D.minhashLshPairs(T.load(s, dir, "documents").filter(col("doc_id") < 600), "doc_id", "text", 0.3)
          .orderBy(col("i"), col("j")),
      Some(jacOracle(0.3)),
    ),

    // ---- SimHash fingerprints (64-bit-family locality hash) ----
    QueryDef(
      "q_dedup_simhash",
      (s, dir) =>
        D.simhash(T.load(s, dir, "documents").filter(col("doc_id") < 100), "doc_id", "text")
          .orderBy(col("id")),
      Some("""
        WITH toks AS (
          SELECT doc_id AS id,
                 ('0x' || substr(md5(u.tok), 1, 15))::BIGINT AS h
          FROM documents, unnest(string_split(lower(text), ' ')) AS u(tok)
          WHERE doc_id < 100),
        votes AS (
          SELECT id, b.bit,
                 sum(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
          FROM toks, (SELECT unnest(range(0, 60)) AS bit) b
          GROUP BY id, b.bit)
        SELECT id, sum(CASE WHEN v > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT AS simhash
        FROM votes GROUP BY id ORDER BY id
      """),
    ),

    // ---- configurable weighted dedup (Deduplicator analog,
    // deduplicator.py:221-293): 0.6·name-token-cosine + 0.4·embedding-
    // cosine + 0.2·attribute-agreement over a synthetic entity table
    // (documents as names, embeddings joined by id, lang/source as the
    // attribute map). Engine side blocks on shared tokens (recall-exact at
    // threshold 0.8 > 0.4+0.2); oracle scores all pairs ----
    QueryDef(
      "q_dedup_weighted",
      (s, dir) => {
        val docs = T.load(s, dir, "documents").filter(col("doc_id") < 300)
        val emb = T.load(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
        val nodes = docs
          .join(emb, docs("doc_id") === emb("vec_id"), "left")
          .select(
            lpad(col("doc_id").cast("string"), 6, "0").as("uuid"),
            col("text").as("name"),
            lit("default").as("group_id"),
            array(lit("Entity")).as("labels"),
            lit(null).cast("timestamp").as("created_at"),
            col("embedding").as("name_embedding"),
            lit("").as("summary"),
            map(lit("lang"), col("lang"), lit("source"), col("source")).as("attributes"),
          )
        graft.dedup.Deduplicator
          .duplicateEntityPairs(nodes, graft.dedup.DeduplicationConfig(similarityThreshold = 0.8))
          .orderBy(col("u1"), col("u2"))
      },
      Some("""
        WITH docs AS (
          SELECT lpad(doc_id::VARCHAR, 6, '0') AS uuid,
                 list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks,
                 lang, source, e.embedding
          FROM documents d LEFT JOIN embeddings e ON d.doc_id = e.vec_id
          WHERE doc_id < 300),
        pairs AS (
          SELECT a.uuid u1, b.uuid u2,
                 list_distinct(a.toks) ta, list_distinct(b.toks) tb,
                 a.lang la, b.lang lb, a.source sa, b.source sb,
                 a.embedding ea, b.embedding eb
          FROM docs a JOIN docs b ON a.uuid < b.uuid),
        emb AS (
          SELECT u1, u2,
                 CASE WHEN ea IS NOT NULL AND eb IS NOT NULL THEN
                   (SELECT sum(x.a * x.b) / (sqrt(sum(x.a * x.a)) * sqrt(sum(x.b * x.b)))
                    FROM (SELECT unnest(ea)::DOUBLE AS a, unnest(eb)::DOUBLE AS b) x)
                 ELSE 0.0 END AS emb_cos
          FROM pairs),
        scored AS (
          SELECT p.u1, p.u2,
                 round(0.6 * (len(list_intersect(ta, tb))::DOUBLE / sqrt(len(ta)::DOUBLE * len(tb)::DOUBLE))
                     + 0.4 * e.emb_cos
                     + 0.2 * ((CASE WHEN la = lb THEN 1.0 ELSE 0.0 END
                             + CASE WHEN sa = sb THEN 1.0 ELSE 0.0 END) / 2.0), 6) AS similarity
          FROM pairs p JOIN emb e ON p.u1 = e.u1 AND p.u2 = e.u2)
        SELECT u1, u2, similarity FROM scored
        WHERE similarity >= 0.8 ORDER BY u1, u2
      """),
    ),

    // ---- embedding-cosine near-dup candidates: top-50 most similar
    // pairs (brute force over the small corpus; LSH-bucketed variant in
    // Similarity module) ----
    QueryDef(
      "q_dedup_embedding",
      (s, dir) => {
        // norms precomputed ONCE per vector (identical doubles to inlining
        // norm() per pair — same expression over the same data), so each
        // of the ~n²/2 pairs does one dot product instead of three
        // zip-aggregates
        val e = T.load(s, dir, "embeddings")
          .filter(col("vec_id") < 1000)
          .withColumn("nrm", graft.search.Vectors.norm(col("embedding")))
        val a = e.select(col("vec_id").as("i"), col("embedding").as("va"), col("nrm").as("na"))
        val b = e.select(col("vec_id").as("j"), col("embedding").as("vb"), col("nrm").as("nb"))
        a.join(b, col("i") < col("j"))
          .withColumn(
            "cos",
            round(graft.search.Vectors.dot(col("va"), col("vb")) / (col("na") * col("nb")), 6),
          )
          .select(col("i"), col("j"), col("cos"))
          .orderBy(col("cos").desc, col("i"), col("j"))
          .limit(50)
      },
      Some("""
        WITH pairs AS (
          SELECT a.vec_id i, b.vec_id j,
                 unnest(a.embedding)::DOUBLE AS x, unnest(b.embedding)::DOUBLE AS y
          FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
          WHERE a.vec_id < 1000 AND b.vec_id < 1000),
        scored AS (
          SELECT i, j, round(sum(x*y)/(sqrt(sum(x*x))*sqrt(sum(y*y))), 6) AS cos
          FROM pairs GROUP BY i, j)
        SELECT i, j, cos FROM scored ORDER BY cos DESC, i, j LIMIT 50
      """),
    ),
  )
}
