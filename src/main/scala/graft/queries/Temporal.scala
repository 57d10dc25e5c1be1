package graft.queries

import graft.{QueryDef, T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Bi-temporal lifecycle operators from SURVEY.md §2.11 + §1.2, expressed
  * over the `events` stream table (each event is a "fact" whose validity
  * interval runs until the next fact for the same (user_id, event_type)
  * key — exactly the resolve_edge_contradictions semantic of
  * `edge_operations.py:381-411`: an older fact's invalid_at is set to the
  * newer contradicting fact's valid_at).
  *
  * All interval derivation is a single window (`lead` over
  * partitionBy(key).orderBy(valid_at)) — no self-join, no shuffle beyond
  * the one hash partition on the key, which is the scalable formulation
  * of the reference's O(n²) loops (`temporal_manager.py:1543-1600`).
  */
object Temporal {

  // Shared derivation: events → bitemporal facts with invalid_at = next
  // event's ts for the same (user_id, event_type).
  private val factsSql =
    """
    SELECT event_id, user_id, event_type, ts AS valid_at,
           lead(ts) OVER (PARTITION BY user_id, event_type
                          ORDER BY ts, event_id) AS invalid_at,
           value
    FROM events
    """

  def defs: Seq[QueryDef] = Seq(
    // ---- CNF date-filter DSL (search_filters.py:26-123): outer AND of
    // inner ORs via the SearchFilters builder, over interval-derived facts ----
    QueryDef(
      "q_filter_dsl",
      (s, dir) => {
        import graft.search.SearchFilters._
        val t1 = java.sql.Timestamp.valueOf("2024-02-01 00:00:00")
        val t2 = java.sql.Timestamp.valueOf("2024-04-01 00:00:00")
        val e = T.load(s, dir, "events")
        val w = Window
          .partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        val facts = e
          .withColumn("valid_at", col("ts"))
          .withColumn("invalid_at", lead(col("ts"), 1).over(w))
        val f = Filters(
          validAt = Seq(
            Seq(DateFilter("valid_at", Gte, Some(t1))),
            Seq(DateFilter("valid_at", Lt, Some(t2))),
          ),
          invalidAt = Seq(Seq(DateFilter("invalid_at", IsNull), DateFilter("invalid_at", Gt, Some(t2)))),
        )
        facts
          .filter(toPredicate(f))
          .select(col("event_id"), col("user_id"), col("event_type"))
          .orderBy(col("event_id"))
      },
      Some(s"""
        SELECT event_id, user_id, event_type
        FROM ($factsSql) f
        WHERE valid_at >= TIMESTAMP '2024-02-01 00:00:00'
          AND valid_at <  TIMESTAMP '2024-04-01 00:00:00'
          AND (invalid_at IS NULL OR invalid_at > TIMESTAMP '2024-04-01 00:00:00')
        ORDER BY event_id
      """),
    ),

    // ---- contradiction invalidation (resolve_edge_contradictions,
    // edge_operations.py:381-411): newer fact for same key closes the
    // older fact's validity interval ----
    QueryDef(
      "q_invalidate_contradictions",
      (s, dir) => {
        val e = T.load(s, dir, "events")
        val w = Window
          .partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        e.withColumn("invalid_at", lead(col("ts"), 1).over(w))
          .withColumn("expired", col("invalid_at").isNotNull)
          .filter(col("user_id") < lit(20L))
          .select(
            col("event_id"),
            col("user_id"),
            col("event_type"),
            col("ts").as("valid_at"),
            col("invalid_at"),
            col("expired"),
          )
          .orderBy(col("event_id"))
      },
      Some(s"""
        SELECT event_id, user_id, event_type, valid_at, invalid_at,
               (invalid_at IS NOT NULL) AS expired
        FROM ($factsSql) f
        WHERE user_id < 20
        ORDER BY event_id
      """),
    ),

    // ---- point-in-time validity predicate (temporal_manager.py:310-314):
    // valid_at <= t AND (invalid_at IS NULL OR invalid_at > t) ----
    QueryDef(
      "q_point_in_time",
      (s, dir) => {
        val t0 = lit("2024-02-01 00:00:00").cast("timestamp")
        val e = T.load(s, dir, "events")
        val w = Window
          .partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        e.withColumn("invalid_at", lead(col("ts"), 1).over(w))
          .filter(
            col("ts") <= t0 &&
              (col("invalid_at").isNull || col("invalid_at") > t0),
          )
          .select(col("event_id"), col("user_id"), col("event_type"), col("ts").as("valid_at"))
          .orderBy(col("event_id"))
      },
      Some(s"""
        SELECT event_id, user_id, event_type, valid_at
        FROM ($factsSql) f
        WHERE valid_at <= TIMESTAMP '2024-02-01 00:00:00'
          AND (invalid_at IS NULL OR invalid_at > TIMESTAMP '2024-02-01 00:00:00')
        ORDER BY event_id
      """),
    ),

    // ---- temporal range filter + aggregate (temporal_manager.py:885-975) ----
    QueryDef(
      "q_temporal_range_agg",
      (s, dir) => {
        T.load(s, dir, "events")
          .filter(
            col("ts").between(
              lit("2024-01-10 00:00:00").cast("timestamp"),
              lit("2024-03-01 00:00:00").cast("timestamp"),
            ),
          )
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            round(sum(col("value")), 2).as("total_value"),
            round(avg(col("value")), 4).as("avg_value"),
          )
          .orderBy(col("event_type"))
      },
      Some("""
        SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value,
               round(avg(value), 4) AS avg_value
        FROM events
        WHERE ts BETWEEN TIMESTAMP '2024-01-10 00:00:00' AND TIMESTAMP '2024-03-01 00:00:00'
        GROUP BY event_type ORDER BY event_type
      """),
    ),

    // ---- time-bucketed aggregation (months(ts) partition transform analog,
    // performance_optimizer.py:438-501) ----
    QueryDef(
      "q_time_bucket_agg",
      (s, dir) => {
        T.load(s, dir, "events")
          .withColumn("month", date_trunc("month", col("ts")))
          .groupBy(col("month"), col("event_type"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
          .orderBy(col("month"), col("event_type"))
      },
      Some("""
        SELECT CAST(date_trunc('month', ts) AS TIMESTAMP) AS month, event_type,
               count(*) AS n, round(sum(value), 2) AS total_value
        FROM events
        GROUP BY 1, 2 ORDER BY 1, 2
      """),
    ),

    // ---- conflict resolution: first_wins / last_wins per key
    // (temporal_manager.py:530-618) — emit both winners per key ----
    QueryDef(
      "q_conflict_resolution",
      (s, dir) => {
        val e = T.load(s, dir, "events")
        val wAsc = Window
          .partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        val wDesc = Window
          .partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts").desc, col("event_id").desc)
        e.withColumn("rn_first", row_number().over(wAsc))
          .withColumn("rn_last", row_number().over(wDesc))
          .filter((col("rn_first") === lit(1) || col("rn_last") === lit(1)) && col("user_id") < lit(10L))
          .select(
            col("user_id"),
            col("event_type"),
            col("event_id"),
            (col("rn_first") === lit(1)).as("is_first_wins"),
            (col("rn_last") === lit(1)).as("is_last_wins"),
          )
          .orderBy(col("user_id"), col("event_type"), col("event_id"))
      },
      Some("""
        SELECT user_id, event_type, event_id,
               (rn_first = 1) AS is_first_wins, (rn_last = 1) AS is_last_wins
        FROM (
          SELECT user_id, event_type, event_id,
                 row_number() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts, event_id) AS rn_first,
                 row_number() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts DESC, event_id DESC) AS rn_last
          FROM events) t
        WHERE (rn_first = 1 OR rn_last = 1) AND user_id < 10
        ORDER BY user_id, event_type, event_id
      """),
    ),

    // ---- conflict resolution: MERGE strategy (temporal_manager.py:577-579,
    // 1447-1465 `_merge_temporal_records`): conflicting records of a key
    // collapse to ONE record spanning [min(valid_at), max(invalid_at)],
    // carrying how many records were merged; keys with a single record have
    // no conflict and are skipped (":559-560") ----
    QueryDef(
      "q_conflict_merge",
      (s, dir) => {
        T.load(s, dir, "events")
          .filter(col("user_id") < lit(40L))
          .groupBy(col("user_id"), col("event_type"))
          .agg(
            min(col("ts")).as("valid_at"),
            max(col("ts")).as("invalid_at"),
            count(lit(1)).as("merged_from"),
            min(col("event_id")).as("primary_event"),
          )
          .filter(col("merged_from") > lit(1))
          .orderBy(col("user_id"), col("event_type"))
      },
      Some("""
        SELECT user_id, event_type,
               min(ts) AS valid_at, max(ts) AS invalid_at,
               count(*) AS merged_from, min(event_id) AS primary_event
        FROM events WHERE user_id < 40
        GROUP BY user_id, event_type HAVING count(*) > 1
        ORDER BY user_id, event_type
      """),
    ),

    // ---- age-based auto cleanup (auto_temporal_cleanup,
    // temporal_manager.py:1227-1322): records older than the cutoff are
    // archived (soft) / deleted (hard); emit per-type archive/keep counts
    // at a fixed cutoff — the soft-strategy marking, aggregated ----
    QueryDef(
      "q_cleanup_age",
      (s, dir) => {
        val cutoff = lit("2024-03-01 00:00:00").cast("timestamp")
        T.load(s, dir, "events")
          .withColumn("archived", col("ts") < cutoff)
          .groupBy(col("event_type"))
          .agg(
            sum(when(col("archived"), 1L).otherwise(0L)).as("n_archived"),
            sum(when(!col("archived"), 1L).otherwise(0L)).as("n_kept"),
          )
          .orderBy(col("event_type"))
      },
      Some("""
        SELECT event_type,
               sum(CASE WHEN ts < TIMESTAMP '2024-03-01 00:00:00' THEN 1 ELSE 0 END)::BIGINT AS n_archived,
               sum(CASE WHEN ts >= TIMESTAMP '2024-03-01 00:00:00' THEN 1 ELSE 0 END)::BIGINT AS n_kept
        FROM events GROUP BY event_type ORDER BY event_type
      """),
    ),

    // ---- temporal outlier detection (_detect_temporal_outliers,
    // temporal_manager.py:1989-2013): records more than 3 sample standard
    // deviations from the mean, with their z-scores — one global agg
    // (mean/stddev) broadcast against one scan, no window ----
    QueryDef(
      "q_temporal_outliers",
      (s, dir) => {
        val e = T.load(s, dir, "events")
        val stats = e.agg(
          avg(col("value")).as("m"),
          stddev_samp(col("value")).as("sd"),
        )
        e.crossJoin(broadcast(stats))
          .withColumn("deviation_std", abs(col("value") - col("m")) / col("sd"))
          .filter(col("deviation_std") > lit(3.0))
          .select(
            col("event_id"),
            round(col("deviation_std"), 6).as("deviation_std"),
            lit("value_outlier").as("anomaly_type"),
            lit("medium").as("severity"),
          )
          .orderBy(col("event_id"))
      },
      Some("""
        WITH s AS (SELECT avg(value) AS m, stddev_samp(value) AS sd FROM events)
        SELECT event_id,
               round(abs(value - m) / sd, 6) AS deviation_std,
               'value_outlier' AS anomaly_type,
               'medium' AS severity
        FROM events, s
        WHERE abs(value - m) / sd > 3.0
        ORDER BY event_id
      """),
    ),

    // ---- temporal statistics rollup (TemporalStats, temporal_manager.py:
    // 90-101, 977-1027): per-type record counts, event-time span, and
    // ingestion rate — ONE grouped aggregation (the kg-store twin is
    // kg/TemporalOps.temporalStats) ----
    QueryDef(
      "q_temporal_stats",
      (s, dir) => {
        val e = T.load(s, dir, "events")
        e.groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("total_records"),
            min(col("ts").cast("timestamp")).as("span_start"),
            max(col("ts").cast("timestamp")).as("span_end"),
          )
          .withColumn(
            "rate_per_hour",
            round(
              col("total_records") * lit(3600.0e6) /
                (unix_micros(col("span_end")) - unix_micros(col("span_start"))),
              6,
            ),
          )
          .orderBy(col("event_type"))
      },
      Some("""
        SELECT event_type,
               count(*) AS total_records,
               min(ts) AS span_start,
               max(ts) AS span_end,
               round(count(*) * 3600000000.0 / (epoch_us(max(ts)) - epoch_us(min(ts))), 6) AS rate_per_hour
        FROM events
        GROUP BY event_type
        ORDER BY event_type
      """),
    ),

    // ---- temporal gap detection (diff of consecutive created_at,
    // temporal_manager.py:1749-1784) ----
    QueryDef(
      "q_gap_detection",
      (s, dir) => {
        val e = T.load(s, dir, "events")
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        e.withColumn("prev_ts", lag(col("ts"), 1).over(w))
          .withColumn(
            "gap_us",
            unix_micros(col("ts").cast("timestamp")) -
              unix_micros(col("prev_ts").cast("timestamp")),
          )
          .filter(col("gap_us") > lit(86400000000L))
          .select(col("user_id"), col("event_id"), col("gap_us"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""
        SELECT user_id, event_id, gap_us FROM (
          SELECT user_id, event_id,
                 epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                                       ORDER BY ts, event_id))
                 AS gap_us
          FROM events) t
        WHERE gap_us > 86400000000
        ORDER BY user_id, event_id
      """),
    ),

    // ---- as-of lookup: for each purchase, the most recent prior signup of
    // the same user (window formulation of an as-of join — one shuffle on
    // user_id, no range self-join) ----
    QueryDef(
      "q_asof_prior_signup",
      (s, dir) => {
        val e = T.load(s, dir, "events")
        val w = Window
          .partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        e.withColumn(
          "last_signup_id",
          max(when(col("event_type") === lit("signup"), col("event_id"))).over(w),
        ).filter(col("event_type") === lit("purchase") && col("user_id") < lit(15L))
          .select(col("event_id"), col("user_id"), col("last_signup_id"))
          .orderBy(col("event_id"))
      },
      Some("""
        SELECT event_id, user_id, last_signup_id FROM (
          SELECT event_id, user_id, event_type,
                 max(CASE WHEN event_type = 'signup' THEN event_id END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS last_signup_id
          FROM events) t
        WHERE event_type = 'purchase' AND user_id < 15
        ORDER BY event_id
      """),
    ),

    // ---- consistency checks (temporal_manager.py:1602-2019): validation
    // flags over the fact table, counted per issue kind ----
    QueryDef(
      "q_consistency_checks",
      (s, dir) => {
        val e = T.load(s, dir, "events")
        val w = Window
          .partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        val f = e.withColumn("invalid_at", lead(col("ts"), 1).over(w))
        f.select(
          sum(when(col("invalid_at").isNotNull && col("invalid_at") <= col("ts"), 1).otherwise(0))
            .as("n_inverted_intervals"),
          sum(when(col("value") < lit(0.0), 1).otherwise(0)).as("n_negative_values"),
          sum(when(col("ts") > lit("2025-01-01 00:00:00").cast("timestamp"), 1).otherwise(0))
            .as("n_future_dates"),
          sum(when(col("invalid_at").isNull, 1).otherwise(0)).as("n_open_intervals"),
          count(lit(1)).as("n_total"),
        )
      },
      Some(s"""
        SELECT
          sum(CASE WHEN invalid_at IS NOT NULL AND invalid_at <= valid_at THEN 1 ELSE 0 END)::BIGINT AS n_inverted_intervals,
          sum(CASE WHEN value < 0.0 THEN 1 ELSE 0 END)::BIGINT AS n_negative_values,
          sum(CASE WHEN valid_at > TIMESTAMP '2025-01-01 00:00:00' THEN 1 ELSE 0 END)::BIGINT AS n_future_dates,
          sum(CASE WHEN invalid_at IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_open_intervals,
          count(*) AS n_total
        FROM ($factsSql) f
      """),
    ),

    // ---- historical state snapshot (get_historical_state,
    // temporal_manager.py:349-414): per-user state as of time t =
    // latest fact per (user, type) among those valid at t ----
    QueryDef(
      "q_historical_state",
      (s, dir) => {
        val t0 = lit("2024-03-15 00:00:00").cast("timestamp")
        val e = T.load(s, dir, "events").filter(col("ts") <= t0)
        val w = Window
          .partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts").desc, col("event_id").desc)
        e.withColumn("rn", row_number().over(w))
          .filter(col("rn") === lit(1) && col("user_id") < lit(25L))
          .select(col("user_id"), col("event_type"), col("event_id"), round(col("value"), 2).as("value"))
          .orderBy(col("user_id"), col("event_type"))
      },
      Some("""
        SELECT user_id, event_type, event_id, round(value, 2) AS value FROM (
          SELECT user_id, event_type, event_id, value,
                 row_number() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events WHERE ts <= TIMESTAMP '2024-03-15 00:00:00') t
        WHERE rn = 1 AND user_id < 25
        ORDER BY user_id, event_type
      """),
    ),

    // ---- temporal dedup within a 24h band per identical fact
    // (temporal_manager.py:1543-1600 — the reference's O(n²) loop as a
    // single window: same key, previous occurrence within window) ----
    QueryDef(
      "q_temporal_dedup_band",
      (s, dir) => {
        val e = T.load(s, dir, "events")
        val w = Window
          .partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        e.withColumn("prev_ts", lag(col("ts"), 1).over(w))
          .withColumn(
            "dup_of_prev",
            col("prev_ts").isNotNull &&
              (unix_timestamp(col("ts").cast("timestamp")) -
                unix_timestamp(col("prev_ts").cast("timestamp"))) <= lit(86400L),
          )
          .groupBy(col("event_type"))
          .agg(
            sum(when(col("dup_of_prev"), 1).otherwise(0)).as("n_band_dups"),
            count(lit(1)).as("n"),
          )
          .orderBy(col("event_type"))
      },
      Some("""
        SELECT event_type,
               sum(CASE WHEN dup_of_prev THEN 1 ELSE 0 END)::BIGINT AS n_band_dups,
               count(*) AS n
        FROM (
          SELECT event_type,
                 (prev_ts IS NOT NULL AND
                  date_part('epoch', ts) - date_part('epoch', prev_ts) <= 86400.0)
                 AS dup_of_prev
          FROM (
            SELECT event_type, ts,
                   lag(ts) OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts, event_id) AS prev_ts
            FROM events) a) b
        GROUP BY event_type ORDER BY event_type
      """),
    ),
  )
}
