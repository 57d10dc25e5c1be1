package graft.queries

import graft.{QueryDef, T}
import graft.search.{Bm25, Rerank, Vectors}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Query-time search operators from SURVEY.md §2.10: BM25 keyword search,
  * cosine top-k vector search, RRF fusion, weighted hybrid fusion with
  * min-max normalization, MMR diversification, mention-count reranking.
  */
object Search {

  private val QueryTerms = Seq("spark", "join", "filter")

  // three batch queries sharing one term ('filter') — exercises the
  // per-term fan-out and the corpus-global df
  private val BatchQueries: Seq[(Long, Seq[String])] = Seq(
    (1L, Seq("spark", "join")),
    (2L, Seq("filter", "shuffle")),
    (3L, Seq("filter", "partition", "broadcast")),
  )

  /** DuckDB oracle for `q_mmr`: the λ=0.5 greedy MMR selection unrolled into
    * 10 explicit steps (DuckDB 1.x cannot evaluate the recursive/correlated
    * form — "Expression with depth > 1 detected in non-lateral join").
    * Each step picks argmax(0.5·rel − 0.5·max_sim_to_selected) from the
    * MATERIALIZED top-20 candidate set, ties to smaller vec_id — exactly
    * `Rerank.mmr` / the reference greedy loop (search_utils.py:1972-2010).
    */
  private def mmrOracleSql: String = {
    def cos(a: String, b: String) =
      s"(list_dot_product($a,$b)/(sqrt(list_dot_product($a,$a))*sqrt(list_dot_product($b,$b))))"
    val head = s"""WITH cand AS MATERIALIZED (
      SELECT e.vec_id, ${cos("e.emb", "q.qv")} AS rel, e.emb
      FROM (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings WHERE vec_id <> 0) e,
           (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0) q
      ORDER BY rel DESC, vec_id LIMIT 20
    ),
    p1 AS (SELECT vec_id, 0.5*rel AS score, emb, rel FROM cand ORDER BY score DESC, vec_id LIMIT 1),
    s1 AS MATERIALIZED (SELECT 1 AS pos, * FROM p1)"""
    val steps = (2 to 10).map { k =>
      s"""p$k AS (
      SELECT c.vec_id, 0.5*c.rel - 0.5*max(${cos("c.emb", "s.emb")}) AS score, c.emb, c.rel
      FROM cand c CROSS JOIN s${k - 1} s
      WHERE c.vec_id NOT IN (SELECT vec_id FROM s${k - 1})
      GROUP BY c.vec_id, c.rel, c.emb
      ORDER BY score DESC, c.vec_id LIMIT 1
    ),
    s$k AS MATERIALIZED (SELECT * FROM s${k - 1} UNION ALL SELECT $k AS pos, * FROM p$k)"""
    }
    (head +: steps).mkString(",\n") +
      "\nSELECT pos::INTEGER AS pos, vec_id, round(score, 6) AS mmr_score FROM s10 ORDER BY pos"
  }

  def defs: Seq[QueryDef] = Seq(
    // ---- BM25 keyword search over document corpus (hybrid_search.py:
    // 108-122) — relational tf/df/idf formulation ----
    QueryDef(
      "q_bm25",
      (s, dir) => {
        Bm25
          .score(T.load(s, dir, "documents"), "doc_id", "text", QueryTerms)
          .withColumn("score", round(col("score"), 6))
          .orderBy(col("score").desc, col("id"))
          .limit(20)
      },
      Some(s"""
        SELECT id, round(score, 6) AS score
        FROM (${Bm25.oracleSql("documents", "doc_id", "text", QueryTerms)}) b
        ORDER BY score DESC, id LIMIT 20
      """),
    ),

    // ---- BM25 via the PRECOMPUTED inverted index (SearchIndexes /
    // performance_optimizer.py:184-237): postings (term, id, tf, dl, df)
    // probed by query term + injected corpus stats — must equal the
    // on-the-fly q_bm25 score exactly (same oracle) ----
    QueryDef(
      "q_bm25_indexed",
      (s, dir) => {
        val docs = T.load(s, dir, "documents").select(col("doc_id").as("id"), col("text"))
        val stats = Bm25.corpusStats(docs).collect()(0)
        val nDocs = stats.getAs[Long]("n_docs")
        val avgdl = stats.getAs[Long]("total_dl").toDouble / nDocs
        Bm25
          .scoreIndexed(Bm25.postings(docs), nDocs, avgdl, QueryTerms)
          .withColumn("score", round(col("score"), 6))
          .orderBy(col("score").desc, col("id"))
          .limit(20)
      },
      Some(s"""
        SELECT id, round(score, 6) AS score
        FROM (${Bm25.oracleSql("documents", "doc_id", "text", QueryTerms)}) b
        ORDER BY score DESC, id LIMIT 20
      """),
    ),

    // ---- batch BM25 (batch_hybrid_search keyword lane, hybrid_search.py:
    // 417-442): three queries scored in ONE corpus pass — terms broadcast
    // into a single scan, per-query top-10 via a window PARTITIONED BY
    // query_id (adding queries adds partitions, not passes) ----
    QueryDef(
      "q_batch_bm25",
      (s, dir) => {
        import s.implicits._
        val qt = BatchQueries
          .flatMap { case (qid, ts) => ts.map(t => (qid, t)) }
          .toDF("query_id", "term")
        val scored = Bm25.scoreBatch(T.load(s, dir, "documents"), "doc_id", "text", qt)
        val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("id"))
        scored
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 10)
          .select(col("query_id"), col("id"), round(col("score"), 6).as("score"))
          .orderBy(col("query_id"), col("score").desc, col("id"))
      },
      Some(s"""
        SELECT query_id, id, round(score, 6) AS score
        FROM (
          SELECT query_id, id, score,
                 row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id) AS rnk
          FROM (${Bm25.oracleSqlBatch("documents", "doc_id", "text", BatchQueries)}) b)
        WHERE rnk <= 10
        ORDER BY query_id, score DESC, id
      """),
    ),

    // ---- cosine top-k semantic search (vector_search.py:229-324):
    // query = vec_id 0's embedding, brute-force scored via higher-order
    // functions, top 20 ----
    QueryDef(
      "q_cosine_topk",
      (s, dir) => {
        val e = T.load(s, dir, "embeddings")
        val q = e.filter(col("vec_id") === lit(0L)).select(col("embedding").as("qv"))
        e.filter(col("vec_id") =!= lit(0L))
          .crossJoin(broadcast(q))
          .withColumn("score", round(Vectors.cosine(col("embedding"), col("qv")), 6))
          .select(col("vec_id"), col("score"))
          .orderBy(col("score").desc, col("vec_id"))
          .limit(20)
      },
      Some("""
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        pairs AS (
          SELECT e.vec_id,
                 unnest(e.embedding)::DOUBLE AS a,
                 unnest(q.qv)::DOUBLE AS b
          FROM embeddings e, q WHERE e.vec_id <> 0)
        SELECT vec_id,
               round(sum(a*b) / (sqrt(sum(a*a)) * sqrt(sum(b*b))), 6) AS score
        FROM pairs GROUP BY vec_id
        ORDER BY score DESC, vec_id LIMIT 20
      """),
    ),

    // ---- RRF fusion of two ranked lists (search_utils.py:1867-1882):
    // list A = docs by n_chars desc, list B = docs by 'spark' tf desc ----
    QueryDef(
      "q_rrf",
      (s, dir) => {
        val d = T.load(s, dir, "documents")
        // top-30 via distributed TakeOrdered (orderBy + limit) FIRST; the
        // unpartitioned row_number window then runs over ≤ 30 rows only —
        // a global window over the full table would single-partition it.
        // constant-but-non-foldable partition key (lit(0) folds to an
        // empty spec): the window runs over the ≤30 already-limited rows
        // in one task without WindowExec's global-move warning
        val wA = Window.partitionBy(pmod(xxhash64(col("doc_id")), lit(1))).orderBy(col("n_chars").desc, col("doc_id"))
        val listA = d
          .orderBy(col("n_chars").desc, col("doc_id"))
          .limit(30)
          .withColumn("rank", row_number().over(wA))
          .select(col("doc_id").as("id"), col("rank"))
        val tf = d
          .withColumn("sp", size(filter(split(lower(col("text")), " "), t => t === lit("spark"))))
        val wB = Window.partitionBy(pmod(xxhash64(col("doc_id")), lit(1))).orderBy(col("sp").desc, col("doc_id"))
        val listB = tf
          .orderBy(col("sp").desc, col("doc_id"))
          .limit(30)
          .withColumn("rank", row_number().over(wB))
          .select(col("doc_id").as("id"), col("rank"))
        Rerank
          .rrf(Seq(listA, listB))
          .withColumn("rrf_score", round(col("rrf_score"), 6))
          .orderBy(col("rrf_score").desc, col("id"))
          .limit(20)
      },
      Some("""
        WITH la AS (
          SELECT doc_id AS id,
                 row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rank
          FROM documents QUALIFY rank <= 30),
        lb AS (
          SELECT doc_id AS id,
                 row_number() OVER (
                   ORDER BY len(list_filter(string_split(lower(text), ' '),
                                            t -> t = 'spark')) DESC, doc_id) AS rank
          FROM documents QUALIFY rank <= 30),
        u AS (SELECT id, 1.0/rank AS part FROM la
              UNION ALL SELECT id, 1.0/rank FROM lb)
        SELECT id, round(sum(part), 6) AS rrf_score FROM u GROUP BY id
        ORDER BY rrf_score DESC, id LIMIT 20
      """),
    ),

    // ---- weighted hybrid fusion 0.4·sem + 0.3·kw + 0.3·aux with per-
    // method min-max normalization (hybrid_search.py:64-79,322-415);
    // sem = cosine vs query vec (embeddings joined on vec_id = doc_id),
    // kw = BM25, aux = brevity prior ----
    QueryDef(
      "q_hybrid_fusion",
      (s, dir) => {
        val d = T.load(s, dir, "documents")
        val e = T.load(s, dir, "embeddings")
        val q = e.filter(col("vec_id") === lit(0L)).select(col("embedding").as("qv"))
        val sem = e
          .crossJoin(broadcast(q))
          .select(col("vec_id").as("id"), Vectors.cosine(col("embedding"), col("qv")).as("sem_raw"))
        val kw = Bm25
          .score(d, "doc_id", "text", QueryTerms)
          .withColumnRenamed("score", "kw_raw")
        val aux = d.select(col("doc_id").as("id"), (lit(1.0) / (lit(1.0) + col("n_chars"))).as("aux_raw"))
        val joined = sem
          .join(kw, Seq("id"), "full_outer")
          .join(aux, Seq("id"), "full_outer")
          .na.fill(0.0, Seq("sem_raw", "kw_raw", "aux_raw"))
        val n3 = Rerank.minMaxAll(
          joined,
          Seq("sem_raw" -> "sem", "kw_raw" -> "kw", "aux_raw" -> "aux"),
        )
        n3.withColumn(
          "score",
          round(lit(0.4) * col("sem") + lit(0.3) * col("kw") + lit(0.3) * col("aux"), 6),
        ).select(col("id"), col("score"))
          .orderBy(col("score").desc, col("id"))
          .limit(25)
      },
      Some(s"""
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        semp AS (
          SELECT e.vec_id AS id, unnest(e.embedding)::DOUBLE AS a, unnest(q.qv)::DOUBLE AS b
          FROM embeddings e, q),
        sem AS (SELECT id, sum(a*b)/(sqrt(sum(a*a))*sqrt(sum(b*b))) AS sem_raw
                FROM semp GROUP BY id),
        kw AS (SELECT id, score AS kw_raw
               FROM (${Bm25.oracleSql("documents", "doc_id", "text", QueryTerms)}) b),
        aux AS (SELECT doc_id AS id, 1.0/(1.0 + n_chars) AS aux_raw FROM documents),
        j AS (
          SELECT coalesce(sem.id, kw.id, aux.id) AS id,
                 coalesce(sem_raw, 0.0) AS sem_raw,
                 coalesce(kw_raw, 0.0) AS kw_raw,
                 coalesce(aux_raw, 0.0) AS aux_raw
          FROM sem FULL JOIN kw ON sem.id = kw.id FULL JOIN aux ON coalesce(sem.id, kw.id) = aux.id),
        n AS (
          SELECT id,
            CASE WHEN max(sem_raw) OVER () = min(sem_raw) OVER () THEN 0.0
                 ELSE (sem_raw - min(sem_raw) OVER ()) / (max(sem_raw) OVER () - min(sem_raw) OVER ()) END AS sem,
            CASE WHEN max(kw_raw) OVER () = min(kw_raw) OVER () THEN 0.0
                 ELSE (kw_raw - min(kw_raw) OVER ()) / (max(kw_raw) OVER () - min(kw_raw) OVER ()) END AS kw,
            CASE WHEN max(aux_raw) OVER () = min(aux_raw) OVER () THEN 0.0
                 ELSE (aux_raw - min(aux_raw) OVER ()) / (max(aux_raw) OVER () - min(aux_raw) OVER ()) END AS aux
          FROM j)
        SELECT id, round(0.4*sem + 0.3*kw + 0.3*aux, 6) AS score FROM n
        ORDER BY score DESC, id LIMIT 25
      """),
    ),

    // ---- MMR diversified top-k (search_utils.py:1972-2010): prefetch
    // 2×limit candidates by cosine relevance, greedy λ=0.5 selection over
    // the collected candidate set (driver-side, small k — the reference's
    // own design) ----
    QueryDef(
      "q_mmr",
      (s, dir) => {
        import s.implicits._
        val e = T.load(s, dir, "embeddings")
        val q = e.filter(col("vec_id") === lit(0L)).select(col("embedding").as("qv"))
        val cands = e
          .filter(col("vec_id") =!= lit(0L))
          .crossJoin(broadcast(q))
          .withColumn("rel", Vectors.cosine(col("embedding"), col("qv")))
          .orderBy(col("rel").desc, col("vec_id"))
          .limit(20)
          .select(col("vec_id"), col("rel"), transform(col("embedding"), _.cast("double")).as("emb"))
          .as[(Long, Double, Array[Double])]
          .collect()
          .toSeq
        val picked = Rerank.mmr(cands, k = 10, lambda = 0.5)
        s.createDataFrame(picked.zipWithIndex.map { case ((id, sc), i) =>
          (i + 1, id, BigDecimal(sc).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }).toDF("pos", "vec_id", "mmr_score")
      },
      Some(mmrOracleSql),
    ),

    // ---- episode-mentions reranker (search_utils.py:1939-1969):
    // rank users by how many events mention them, top 25 ----
    QueryDef(
      "q_rerank_mentions",
      (s, dir) => {
        T.load(s, dir, "events")
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_mentions"))
          .orderBy(col("n_mentions").desc, col("user_id"))
          .limit(25)
      },
      Some("""
        SELECT user_id, count(*) AS n_mentions FROM events
        GROUP BY user_id ORDER BY n_mentions DESC, user_id LIMIT 25
      """),
    ),
  )
}
