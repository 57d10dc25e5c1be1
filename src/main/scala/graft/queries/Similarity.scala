package graft.queries

import graft.{QueryDef, T}
import graft.sim.Ann
import org.apache.spark.sql.functions._

/** Similarity-search operator suite over the `embeddings` table. */
object Similarity {

  def defs: Seq[QueryDef] = Seq(
    // ---- batched exact ANN: 10 query vectors × corpus, top-5 each ----
    QueryDef(
      "q_ann_bruteforce",
      (s, dir) => {
        val e = T.load(s, dir, "embeddings")
        val queries = e.filter(col("vec_id") < 10).select(col("vec_id").as("qid"), col("embedding").as("qv"))
        val corpus = e.filter(col("vec_id") >= 10).select(col("vec_id").as("id"), col("embedding").as("v"))
        Ann.bruteForceTopK(queries, corpus, 5).orderBy(col("qid"), col("rk"))
      },
      Some("""
        WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10),
        c AS (SELECT vec_id AS id, embedding AS v FROM embeddings WHERE vec_id >= 10),
        pairs AS (
          SELECT qid, id, unnest(v)::DOUBLE AS x, unnest(qv)::DOUBLE AS y
          FROM c, q),
        scored AS (
          SELECT qid, id,
                 round(sum(x*y)/(sqrt(sum(x*x))*sqrt(sum(y*y))), 6) AS score
          FROM pairs GROUP BY qid, id),
        ranked AS (
          SELECT qid, id, score,
                 row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS rk
          FROM scored)
        SELECT qid, rk, id, score FROM ranked WHERE rk <= 5 ORDER BY qid, rk
      """),
    ),

    // ---- LSH-bucketed ANN (IVF-style pruning): deterministic random-
    // hyperplane 8-bit signatures; only same-bucket candidates scored ----
    QueryDef(
      "q_ann_lsh",
      (s, dir) => {
        val e = T.load(s, dir, "embeddings")
        val queries = e.filter(col("vec_id") < 10).select(col("vec_id").as("qid"), col("embedding").as("qv"))
        val corpus = e.filter(col("vec_id") >= 10).select(col("vec_id").as("id"), col("embedding").as("v"))
        Ann.lshBucketTopK(queries, corpus, 5).orderBy(col("qid"), col("rk"))
      },
      Some("""
        WITH planes AS (
          SELECT p, i,
                 CASE WHEN ('0x' || substr(md5(p || ':' || i), 1, 15))::BIGINT % 2 = 1
                      THEN 1.0 ELSE -1.0 END AS coef
          FROM (SELECT unnest(range(0, 8)) AS p), (SELECT unnest(range(0, 64)) AS i)),
        vecs AS (
          SELECT vec_id, embedding[u.i]::DOUBLE AS x, u.i - 1 AS i
          FROM embeddings, (SELECT unnest(range(1, 65)) AS i) u),
        sigs AS (
          SELECT vec_id,
                 sum(CASE WHEN dot > 0 THEN (1 << p) ELSE 0 END)::INT AS sig
          FROM (SELECT v.vec_id, pl.p, sum(pl.coef * v.x) AS dot
                FROM vecs v JOIN planes pl ON v.i = pl.i
                GROUP BY v.vec_id, pl.p) d
          GROUP BY vec_id),
        q AS (SELECT e.vec_id AS qid, e.embedding AS qv, s.sig
              FROM embeddings e JOIN sigs s ON e.vec_id = s.vec_id WHERE e.vec_id < 10),
        c AS (SELECT e.vec_id AS id, e.embedding AS v, s.sig
              FROM embeddings e JOIN sigs s ON e.vec_id = s.vec_id WHERE e.vec_id >= 10),
        pairs AS (
          SELECT qid, id, unnest(c.v)::DOUBLE AS x, unnest(q.qv)::DOUBLE AS y
          FROM c JOIN q ON c.sig = q.sig),
        scored AS (
          SELECT qid, id, round(sum(x*y)/(sqrt(sum(x*x))*sqrt(sum(y*y))), 6) AS score
          FROM pairs GROUP BY qid, id),
        ranked AS (
          SELECT qid, id, score,
                 row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS rk
          FROM scored)
        SELECT qid, rk, id, score FROM ranked WHERE rk <= 5 ORDER BY qid, rk
      """),
    ),

    // ---- production-setting LSH ANN: width 16 + multi-probe 4 (the
    // documented corpus-scale configuration — each probe reads ~2⁻¹⁶ of
    // the corpus and the 3 lowest-margin bit flips buy the straddle
    // recall back). The oracle re-derives the md5-parity planes, the
    // 16-bit signatures AND the margin-ordered probe set in SQL, so the
    // scale configuration itself sits under the correctness gate.
    //
    // NON-VACUOUS by construction: at width 16 over the ~500-vector
    // fixture, disjoint random query/corpus vectors share no bucket (the
    // round-4 gate compared ∅ == ∅ — green wired to nothing). Queries are
    // therefore PLANTED NEAR-DUPLICATES of corpus vectors 20..39: each
    // coordinate perturbed by (i%7−3)/1024 — double-exact on both engines
    // (float→double is exact, k/1024 is exact, one IEEE double add each)
    // — so every query provably collides with its unperturbed original
    // (directly or via the margin-ordered probe fan-out) and the
    // cross-engine gate compares a populated candidate set: wrong
    // signatures, a broken probe fan-out, or a margin-ordering bug now
    // produce a VALUE mismatch, not an empty-set pass. ----
    QueryDef(
      "q_ann_lsh16",
      (s, dir) => {
        val e = T.load(s, dir, "embeddings")
        val corpus = e.filter(col("vec_id") >= 10).select(col("vec_id").as("id"), col("embedding").as("v"))
        val queries = e
          .filter(col("vec_id").between(20, 39))
          .select(
            col("vec_id").as("qid"),
            transform(
              col("embedding"),
              (x, i) => x.cast("double") + ((i % 7) - lit(3)).cast("double") / lit(1024.0),
            ).as("qv"),
          )
        Ann.lshBucketTopK(queries, corpus, 5, nPlanes = 16, nProbe = 4).orderBy(col("qid"), col("rk"))
      },
      Some("""
        WITH planes AS (
          SELECT p, i,
                 CASE WHEN ('0x' || substr(md5(p || ':' || i), 1, 15))::BIGINT % 2 = 1
                      THEN 1.0 ELSE -1.0 END AS coef
          FROM (SELECT unnest(range(0, 16)) AS p), (SELECT unnest(range(0, 64)) AS i)),
        cvecs AS (
          SELECT vec_id, embedding[u.i]::DOUBLE AS x, u.i - 1 AS i
          FROM embeddings, (SELECT unnest(range(1, 65)) AS i) u
          WHERE vec_id >= 10),
        qvecs AS (
          SELECT vec_id, embedding[u.i]::DOUBLE + ((u.i - 1) % 7 - 3) / 1024.0 AS x, u.i - 1 AS i
          FROM embeddings, (SELECT unnest(range(1, 65)) AS i) u
          WHERE vec_id BETWEEN 20 AND 39),
        cdots AS (
          SELECT v.vec_id, pl.p, sum(pl.coef * v.x) AS dot
          FROM cvecs v JOIN planes pl ON v.i = pl.i
          GROUP BY v.vec_id, pl.p),
        qdots AS (
          SELECT v.vec_id, pl.p, sum(pl.coef * v.x) AS dot
          FROM qvecs v JOIN planes pl ON v.i = pl.i
          GROUP BY v.vec_id, pl.p),
        csigs AS (
          SELECT vec_id, sum(CASE WHEN dot > 0 THEN (1 << p) ELSE 0 END)::INT AS sig
          FROM cdots GROUP BY vec_id),
        qsigs AS (
          SELECT vec_id, sum(CASE WHEN dot > 0 THEN (1 << p) ELSE 0 END)::INT AS sig
          FROM qdots GROUP BY vec_id),
        flips AS (
          SELECT vec_id, mask FROM (
            SELECT vec_id, (1 << p) AS mask,
                   row_number() OVER (PARTITION BY vec_id ORDER BY round(abs(dot), 6), (1 << p)) AS rk
            FROM qdots)
          WHERE rk <= 3),
        probes AS (
          SELECT vec_id, sig FROM qsigs
          UNION ALL
          SELECT q.vec_id, xor(q.sig, f.mask) AS sig FROM qsigs q JOIN flips f ON q.vec_id = f.vec_id),
        cand AS (
          SELECT pr.vec_id AS qid, cs.vec_id AS id
          FROM probes pr JOIN csigs cs ON pr.sig = cs.sig),
        pairs AS (
          SELECT cand.qid, cand.id, c.x AS x, q.x AS y
          FROM cand
          JOIN cvecs c ON c.vec_id = cand.id
          JOIN qvecs q ON q.vec_id = cand.qid AND q.i = c.i),
        scored AS (
          SELECT qid, id, round(sum(x*y)/(sqrt(sum(x*x))*sqrt(sum(y*y))), 6) AS score
          FROM pairs GROUP BY qid, id),
        ranked AS (
          SELECT qid, id, score,
                 row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS rk
          FROM scored)
        SELECT qid, rk, id, score FROM ranked WHERE rk <= 5 ORDER BY qid, rk
      """),
    ),

    // ---- IVF ANN: corpus inverted into 8 centroid cells (seeds vec_id
    // 10..17, quantizer evaluated as a codegen expression — no shuffle to
    // assign), queries probe the 2 nearest cells only ----
    QueryDef(
      "q_ann_ivf",
      (s, dir) => {
        val e = T.load(s, dir, "embeddings")
        val queries = e.filter(col("vec_id") < 10).select(col("vec_id").as("qid"), col("embedding").as("qv"))
        val cents = e.filter(col("vec_id").between(10, 17)).select(col("vec_id").as("cid"), col("embedding").as("cv"))
        val corpus = e.filter(col("vec_id") > 17).select(col("vec_id").as("id"), col("embedding").as("v"))
        Ann.ivfTopK(queries, corpus, cents, 5, 2).orderBy(col("qid"), col("rk"))
      },
      Some("""
        WITH cents AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
                       WHERE vec_id BETWEEN 10 AND 17),
        c AS (SELECT vec_id AS id, embedding AS v FROM embeddings WHERE vec_id > 17),
        q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10),
        cpairs AS (SELECT cid, id, unnest(v)::DOUBLE AS x, unnest(cv)::DOUBLE AS y FROM c, cents),
        cscored AS (SELECT cid, id, round(sum(x*y)/(sqrt(sum(x*x))*sqrt(sum(y*y))), 6) AS score
                    FROM cpairs GROUP BY cid, id),
        cells AS (SELECT cid AS cell, id FROM (
                    SELECT cid, id, row_number() OVER (PARTITION BY id ORDER BY score DESC, cid) AS rk
                    FROM cscored) WHERE rk = 1),
        qpairs AS (SELECT cid, qid, unnest(qv)::DOUBLE AS x, unnest(cv)::DOUBLE AS y FROM q, cents),
        qscored AS (SELECT cid, qid, round(sum(x*y)/(sqrt(sum(x*x))*sqrt(sum(y*y))), 6) AS score
                    FROM qpairs GROUP BY cid, qid),
        probes AS (SELECT cid AS cell, qid FROM (
                     SELECT cid, qid, row_number() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS rk
                     FROM qscored) WHERE rk <= 2),
        cand AS (SELECT p.qid, cl.id FROM probes p JOIN cells cl ON p.cell = cl.cell),
        pairs AS (SELECT cand.qid, cand.id, unnest(c2.v)::DOUBLE AS x, unnest(q2.qv)::DOUBLE AS y
                  FROM cand JOIN c c2 ON cand.id = c2.id JOIN q q2 ON cand.qid = q2.qid),
        scored AS (SELECT qid, id, round(sum(x*y)/(sqrt(sum(x*x))*sqrt(sum(y*y))), 6) AS score
                   FROM pairs GROUP BY qid, id),
        ranked AS (SELECT qid, id, score,
                          row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS rk
                   FROM scored)
        SELECT qid, rk, id, score FROM ranked WHERE rk <= 5 ORDER BY qid, rk
      """),
    ),

    // ---- k-means-style cluster assignment quality: assign each vector to
    // the nearest of 8 deterministic seed centroids (vec_id 10..17),
    // report per-cluster sizes and mean similarity ----
    QueryDef(
      "q_ann_assign",
      (s, dir) => {
        val e = T.load(s, dir, "embeddings")
        val cents = e
          .filter(col("vec_id").between(10, 17))
          .select(col("vec_id").as("cid"), col("embedding").as("cv"))
        val corpus = e.filter(col("vec_id") > 17).select(col("vec_id").as("id"), col("embedding").as("v"))
        // argmax over 8 literal centroids inside codegen (Ann.assignCells):
        // one corpus scan, partial agg below the only shuffle (8 groups) —
        // the former crossJoin + per-id window shuffled corpus×8 rows
        Ann.assignCells(corpus, cents)
          .groupBy(col("cell").as("centroid"))
          .agg(count(lit(1)).as("n"), round(avg(col("score")), 6).as("mean_sim"))
          .orderBy(col("centroid"))
      },
      Some("""
        WITH cents AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
                       WHERE vec_id BETWEEN 10 AND 17),
        c AS (SELECT vec_id AS id, embedding AS v FROM embeddings WHERE vec_id > 17),
        pairs AS (SELECT qid, id, unnest(v)::DOUBLE AS x, unnest(qv)::DOUBLE AS y FROM c, cents),
        scored AS (SELECT qid, id, round(sum(x*y)/(sqrt(sum(x*x))*sqrt(sum(y*y))), 6) AS score
                   FROM pairs GROUP BY qid, id),
        best AS (SELECT qid, id, score,
                        row_number() OVER (PARTITION BY id ORDER BY score DESC, qid) AS rk
                 FROM scored)
        SELECT qid AS centroid, count(*) AS n, round(avg(score), 6) AS mean_sim
        FROM best WHERE rk = 1 GROUP BY qid ORDER BY centroid
      """),
    ),
  )
}
