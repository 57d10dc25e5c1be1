package graft.search

import graft.io.SnapshotStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Query-pattern monitoring + rule-based parameter tuning — the
  * re-expression of `performance_optimizer.py`'s SearchIndexManager
  * monitoring loop (`monitor_search_queries` :891-920, `QueryPattern`
  * :121-129, `optimize_index_parameters` :788-889). Observations land in a
  * `query_log` snapshot (one appended micro-batch per record batch, never
  * a rewrite); pattern aggregation and tuning are one groupBy over it.
  *
  * Unlike the reference's wall-clock auto-trigger, tuning here is an
  * explicit call with deterministic inputs → deterministic suggestions
  * (no hidden Date.now coupling — the caller passes observations).
  */
final class QueryMonitor(store: SnapshotStore) {

  private val Table = "query_log"

  /** Record a batch of observations: (query, query_type, execution_time
    * seconds, result_count). Appends only the batch (bucketed by type).
    *
    * `obs_id` = (batch seq, in-batch index) — NOT a content hash: the log
    * must count every observation, and hashing (query, time, count) would
    * silently merge legitimately-repeated identical observations, making
    * `patterns()` under-report frequency (and concat_ws skips nulls, so
    * distinct null-bearing rows could even collide).
    */
  def record(observations: DataFrame): Unit = {
    val seq = store.versions(Table).lastOption.map(_ + 1).getOrElse(0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(0))
      .orderBy(col("query_type"), col("query"), col("execution_time"), col("result_count"))
    val batch = observations
      .select(
        col("query").cast("string"),
        col("query_type").cast("string"),
        col("execution_time").cast("double"),
        col("result_count").cast("long"),
      )
      // batch-sized frame: the single-partition window costs nothing here
      .withColumn("obs_id", concat_ws("|", lit(seq), row_number().over(w)))
    store.mergeBucketed(
      Table, batch, Seq("obs_id"), "query observations", bucketBy = Seq("query_type"),
    )
  }

  /** Per-type query patterns: frequency, avg/max latency, avg result
    * count — `QueryPattern` + `get_performance_report` shape.
    */
  def patterns(): DataFrame =
    store
      .load(Table)
      .groupBy(col("query_type"))
      .agg(
        count(lit(1)).as("frequency"),
        avg(col("execution_time")).as("avg_latency"),
        max(col("execution_time")).as("max_latency"),
        avg(col("result_count")).as("avg_results"),
      )

  /** Rule-based tuning suggestions from the observed patterns — the
    * deterministic core of `optimize_index_parameters`:
    *  - most frequent type ∈ {semantic, hybrid} → grow the cache budget
    *    (reference: cache_size ×2, :835-837);
    *  - a type's avg latency > 1 s → grow its probe batch (reference:
    *    batch_size ×2, :854-864);
    *  - a type averaging < 1 result → lower its min-score threshold
    *    (recall starvation — the reference's FAISS re-selection analog).
    * Returns (rule, query_type, suggestion).
    */
  def suggest(): DataFrame = {
    val p = patterns().localCheckpoint()
    val spark = p.sparkSession
    import spark.implicits._
    val top = p.orderBy(col("frequency").desc, col("query_type")).limit(1)
    val cacheRule = top
      .filter(col("query_type").isin("semantic", "hybrid"))
      .select(
        lit("grow_cache").as("rule"), col("query_type"),
        lit("double cache budget for the dominant lane").as("suggestion"),
      )
    val latencyRule = p
      .filter(col("avg_latency") > 1.0)
      .select(
        lit("grow_batch").as("rule"), col("query_type"),
        lit("double probe batch size (avg latency > 1s)").as("suggestion"),
      )
    val recallRule = p
      .filter(col("avg_results") < 1.0)
      .select(
        lit("lower_min_score").as("rule"), col("query_type"),
        lit("lower sim_min_score (recall starvation)").as("suggestion"),
      )
    cacheRule.unionByName(latencyRule).unionByName(recallRule).orderBy("rule", "query_type")
  }
}
