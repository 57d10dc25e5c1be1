package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators over the page/episode stream beyond the
  * `foreachBatch` ingest (IncrementalIngest): event-time windowed
  * aggregation bounded by a watermark, and arbitrary per-entity state via
  * `flatMapGroupsWithState` — the streaming re-expression of the
  * reference's running processing/monitoring counters
  * (`EpisodeProcessor.get_processing_stats`, episode_processor.py:578-591;
  * `QueryMonitor` patterns, performance_optimizer.py:788-920), which the
  * reference keeps as in-process dicts.
  *
  * Scale shape: the windowed aggregate shuffles once on (window, group_id)
  * with partial aggregation map-side; the watermark bounds state size by
  * event time (late rows beyond it are dropped, state for closed windows
  * is evicted). The keyed state operator partitions by entity surface —
  * state per key is O(1) (three scalars), so total state ∝ distinct
  * entities, spread across executors.
  */
object StreamOps {

  /** Tumbling event-time episode counts per group with a watermark: the
    * streaming twin of `q_time_bucket_agg`'s batch bucketing. Works on a
    * streaming OR batch frame (same plan in both; Spark requires the
    * watermark only for streaming state eviction).
    */
  def windowedEpisodeCounts(
      episodes: DataFrame,
      windowDur: String = "1 day",
      watermark: String = "1 hour",
  ): DataFrame =
    episodes
      .withWatermark("valid_at", watermark)
      .groupBy(window(col("valid_at"), windowDur).as("w"), col("group_id"))
      .agg(count(lit(1)).as("n_episodes"))
      .select(col("w.start").as("window_start"), col("group_id"), col("n_episodes"))

  /** Per-entity running state carried across micro-batches. */
  final case class EntityState(mentions: Long, firstSeen: Timestamp, lastSeen: Timestamp)

  /** One emitted update per touched entity per micro-batch. */
  final case class EntityUpdate(name: String, mentions: Long, firstSeen: Timestamp, lastSeen: Timestamp)

  /** Running per-entity mention counters (count, first/last seen) over a
    * stream of (entity surface, event time) mentions, maintained with
    * `flatMapGroupsWithState` in Update mode — each batch emits the new
    * state row for every entity it touched; untouched entities emit
    * nothing but keep their state.
    */
  def entityMentionState(mentions: Dataset[(String, Timestamp)]): Dataset[EntityUpdate] = {
    import mentions.sparkSession.implicits._
    mentions
      .groupByKey(_._1)
      .flatMapGroupsWithState[EntityState, EntityUpdate](OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (name: String, rows: Iterator[(String, Timestamp)], state: GroupState[EntityState]) =>
          val ts = rows.map(_._2).toArray
          if (ts.isEmpty) Iterator.empty
          else {
            val lo = ts.minBy(_.getTime)
            val hi = ts.maxBy(_.getTime)
            val prev = state.getOption
            val next = prev match {
              case Some(p) =>
                EntityState(
                  p.mentions + ts.length,
                  if (lo.before(p.firstSeen)) lo else p.firstSeen,
                  if (hi.after(p.lastSeen)) hi else p.lastSeen,
                )
              case None => EntityState(ts.length.toLong, lo, hi)
            }
            state.update(next)
            Iterator.single(EntityUpdate(name, next.mentions, next.firstSeen, next.lastSeen))
          }
      }
  }
}
