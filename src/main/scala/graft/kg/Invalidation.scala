package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bitemporal contradiction invalidation — the key temporal-KG semantic
  * (`resolve_edge_contradictions`, `edge_operations.py:381-411`): when a
  * newer fact for the same (source, relation) asserts a different object,
  * the older fact's `invalid_at` is set to the newer fact's `valid_at`
  * and the row is expired.
  *
  * The reference does this pairwise against search candidates at ingest
  * time; the batch formulation is ONE window over the union of existing +
  * new edges per contention group — no self-join, one shuffle on the
  * group key, correct under any episode arrival order because the window
  * re-sorts by event time (SURVEY.md §7.5.5).
  *
  * Precondition: edges are deduplicated per (group_id, source_uuid, name,
  * target_uuid) first (re-assertions of the same fact adopt the existing
  * edge and append their episode — `resolve_extracted_edge`,
  * `edge_operations.py:414-535`), so consecutive rows in a contention
  * group always differ in target and `lead` is exact.
  */
object Invalidation {

  /** Deduplicate re-asserted facts: same (group_id, source_uuid, name,
    * target_uuid) merge to one edge with the earliest valid_at/created_at
    * and the union of episode uuids.
    */
  def dedupeFacts(edges: DataFrame): DataFrame = {
    // manual_invalid_at survives rebuilds: invalidate_edges() records the
    // user's explicit invalidation here, and every re-dedup keeps the
    // earliest one (the window pass never writes this column)
    val withManual =
      if (edges.columns.contains("manual_invalid_at")) edges
      else edges.withColumn("manual_invalid_at", lit(null).cast("timestamp"))
    withManual
      .groupBy(col("group_id"), col("source_uuid"), col("name"), col("target_uuid"))
      .agg(
        min(col("valid_at")).as("valid_at"),
        min(col("created_at")).as("created_at"),
        first(col("fact")).as("fact"), // fact strings per (s,p,o) are identical by construction
        array_sort(array_distinct(flatten(collect_list(col("episodes"))))).as("episodes"),
        min(col("manual_invalid_at")).as("manual_invalid_at"),
      )
  }

  /** Apply the contradiction rule over the full (deduped) edge set.
    * Adds: uuid (deterministic), invalid_at, expired_at.
    */
  def invalidate(edges: DataFrame): DataFrame = {
    // Strict-inequality semantics (edge_operations.py:400-409): a fact is
    // invalidated only by a contradicting fact with STRICTLY later
    // valid_at — simultaneous facts both stay valid (no empty intervals).
    // Post-dedup every row in a contention group has a distinct target, so
    // the closer is simply the next strictly-greater valid_at in the group:
    // a range window (not lead), so ties skip to the next distinct time.
    val w = Window
      .partitionBy(col("group_id"), col("source_uuid"), col("name"))
      .orderBy(unix_micros(col("valid_at")))
      .rangeBetween(1L, Window.unboundedFollowing)
    val windowed = edges
      .withColumn("invalid_at", timestamp_micros(min(unix_micros(col("valid_at"))).over(w)))
      // ingestion-time expiry mirrors the event-time invalidation (the
      // reference stamps expired_at = utc_now() at the moment the system
      // learns of the contradiction; deterministically that is the
      // newer fact's ingestion == its valid_at here)
      .withColumn("expired_at", col("invalid_at"))
    // an explicit invalidate_edges() call wins if it closes the interval
    // earlier than (or in absence of) a contradicting fact
    if (windowed.columns.contains("manual_invalid_at"))
      windowed
        .withColumn("invalid_at", least(col("invalid_at"), col("manual_invalid_at")))
        .withColumn("expired_at", least(col("expired_at"), col("manual_invalid_at")))
    else windowed
  }

  /** dedupeFacts → invalidate with ONE shuffle: pre-partition by the
    * contention key (group_id, source_uuid, name); the (…, target_uuid)
    * dedupe aggregate and the invalidation window both reuse that
    * partitioning (hash(g,s,n) clusters their keys), so neither inserts
    * its own exchange. The window already requires whole contention
    * groups co-located, so this adds no skew the fused pass didn't have.
    */
  def dedupeAndInvalidate(edges: DataFrame): DataFrame =
    invalidate(dedupeFacts(edges.repartition(col("group_id"), col("source_uuid"), col("name"))))

  /** Point-in-time validity predicate (`temporal_manager.py:310-314`). */
  def validAt(edges: DataFrame, t: java.sql.Timestamp): DataFrame =
    edges.filter(
      col("valid_at") <= lit(t) && (col("invalid_at").isNull || col("invalid_at") > lit(t)),
    )
}
