package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rerankers from SURVEY.md §2.10. */
object Rerank {

  /** Reciprocal-rank fusion (`search_utils.py:1867-1882`):
    * score(id) = Σ_lists 1/(rank+1), ranks 0-based. Input frames must each
    * have (id, rank) with rank 1-based from row_number; we use 1/rank
    * which equals 1/(0-based rank + 1).
    */
  def rrf(rankedLists: Seq[DataFrame]): DataFrame =
    rankedLists
      .map(_.select(col("id"), (lit(1.0) / col("rank")).as("part")))
      .reduce(_ unionByName _)
      .groupBy(col("id"))
      .agg(sum(col("part")).as("rrf_score"))

  /** Min-max normalization of a score column over the whole frame
    * (`hybrid_search.py:395-415`); constant column maps to 0.
    * Implemented as a 2-row aggregate broadcast-joined back — NOT a
    * global window (an empty partitionBy would funnel the whole frame
    * through one partition at scale).
    */
  def minMax(df: DataFrame, scoreCol: String, outCol: String): DataFrame = {
    val stats = df.agg(min(col(scoreCol)).as("__mn"), max(col(scoreCol)).as("__mx"))
    df.crossJoin(broadcast(stats))
      .withColumn(
        outCol,
        when(col("__mx") === col("__mn"), lit(0.0))
          .otherwise((col(scoreCol) - col("__mn")) / (col("__mx") - col("__mn"))),
      )
      .drop("__mn", "__mx")
  }

  /** [[minMax]] over SEVERAL score columns in ONE aggregate pass.
    * Chaining single-column minMax calls re-evaluates the whole upstream
    * plan once per column (each stats agg is its own job over the full
    * input — for hybrid fusion that upstream is a BM25 corpus pass plus a
    * cosine pass); here all min/max pairs ride one 1-row aggregate and one
    * broadcast join. `cols` maps input column → normalized output column.
    */
  def minMaxAll(df: DataFrame, cols: Seq[(String, String)]): DataFrame = {
    val aggs = cols.flatMap { case (in, _) =>
      Seq(min(col(in)).as(s"__mn_$in"), max(col(in)).as(s"__mx_$in"))
    }
    val stats = df.agg(aggs.head, aggs.tail: _*)
    cols
      .foldLeft(df.crossJoin(broadcast(stats))) { case (acc, (in, out)) =>
        acc.withColumn(
          out,
          when(col(s"__mx_$in") === col(s"__mn_$in"), lit(0.0))
            .otherwise((col(in) - col(s"__mn_$in")) / (col(s"__mx_$in") - col(s"__mn_$in"))),
        )
      }
      .drop(cols.flatMap { case (in, _) => Seq(s"__mn_$in", s"__mx_$in") }: _*)
  }

  /** Maximal-marginal-relevance greedy selection
    * (`search_utils.py:1972-2010`): iteratively pick
    * argmax λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s). Driver-side over
    * the collected top-n candidates (n ≤ ~40 — same deliberate choice as
    * the reference, which runs MMR in-memory over the prefetch set).
    * Ties break to smaller id for determinism.
    */
  def mmr(
      candidates: Seq[(Long, Double, Array[Double])], // (id, relevance, embedding)
      k: Int,
      lambda: Double = 0.5,
  ): Seq[(Long, Double)] = {
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d, na, nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0 || nb == 0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
    }
    val embs = candidates.map(c => c._1 -> c._3).toMap
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    val pool = scala.collection.mutable.LinkedHashMap(candidates.map(c => c._1 -> c): _*)
    while (selected.size < k && pool.nonEmpty) {
      val scored = pool.valuesIterator.map { case (id, rel, emb) =>
        val maxSim =
          if (selected.isEmpty) 0.0
          else selected.map(s => cos(emb, embs(s._1))).max
        (id, lambda * rel - (1 - lambda) * maxSim)
      }.toSeq
      val best = scored.minBy { case (id, s) => (-s, id) }
      selected += best
      pool.remove(best._1)
    }
    selected.toSeq
  }
}
