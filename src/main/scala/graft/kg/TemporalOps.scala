package graft.kg

import java.sql.Timestamp

import graft.io.SnapshotStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal-manager analysis surface over the KG store — the driver
  * wrappers `get_temporal_stats` / `temporal_consistency_check` /
  * `temporal_deduplication` / `detect_temporal_anomalies` /
  * `temporal_range_query` / `temporal_point_query` /
  * `temporal_aggregation` (`huggingface_driver.py:2064-2368`,
  * `temporal_manager.py:620-1240`). Every check/statistic is a Catalyst
  * aggregation or window over the edges snapshot — never a pandas-style
  * row loop — so each runs as one (or a small fixed number of)
  * distributed jobs regardless of corpus size.
  */
object TemporalOps {

  private val Key = Seq("group_id", "source_uuid", "name")

  private def edges(store: SnapshotStore): DataFrame = store.load("edges")

  /** TemporalStats (`temporal_manager.py:90-101`, `temporal_statistics`
    * :977-1027) as ONE aggregation row: record counts by validity,
    * event-time span, ingestion span + rate (rows/hour of created_at),
    * and relation-type counts (`records_by_entity_type` — here the edge
    * relation `name`, the only typed dimension the edges table carries)
    * as a map column.
    */
  def temporalStats(store: SnapshotStore): DataFrame = {
    val perName = edges(store)
      .groupBy(col("name"))
      .agg(
        count(lit(1)).as("n"),
        count(when(col("invalid_at").isNull, 1)).as("nValid"),
        min(col("valid_at")).as("minV"),
        max(col("valid_at")).as("maxV"),
        min(col("created_at")).as("minC"),
        max(col("created_at")).as("maxC"),
      )
    perName
      .agg(
        sum(col("n")).cast("long").as("total_records"),
        sum(col("nValid")).cast("long").as("valid_records"),
        (sum(col("n")) - sum(col("nValid"))).cast("long").as("invalidated_records"),
        min(col("minV")).as("span_start"),
        max(col("maxV")).as("span_end"),
        map_from_entries(sort_array(collect_list(struct(col("name"), col("n"))))).as("records_by_entity_type"),
        min(col("minC")).as("first_ingested_at"),
        max(col("maxC")).as("last_ingested_at"),
      )
      .withColumn(
        "ingestion_rate_per_hour",
        when(
          unix_micros(col("last_ingested_at")) > unix_micros(col("first_ingested_at")),
          col("total_records") * lit(3600.0e6) /
            (unix_micros(col("last_ingested_at")) - unix_micros(col("first_ingested_at"))),
        ).otherwise(col("total_records").cast("double")),
      )
  }

  /** Per-month event-occurrence distribution
    * (`event_occurrence_distribution`, `temporal_manager.py:100`).
    */
  def occurrenceDistribution(store: SnapshotStore): DataFrame =
    edges(store)
      .filter(col("valid_at").isNotNull)
      .groupBy(date_format(col("valid_at"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("records"))
      .orderBy(col("month"))

  /** temporal_consistency_check (`temporal_manager.py:713-768`): one row
    * per requested check with its violation count.
    *
    *  - `validity_periods`: invalid_at ≤ valid_at, or expired_at <
    *    created_at (an interval that ends before it starts — the
    *    `_check_validity_periods` rule);
    *  - `overlapping_records`: within a contention group
    *    (group_id, source_uuid, name), a record whose successor starts
    *    strictly before it ends — overlapping validity the invalidation
    *    pass should have closed (`_check_overlapping_records`);
    *  - `missing_temporal_data`: records with NULL valid_at
    *    (`_check_missing_temporal_data`);
    *  - `temporal_gaps`: adjacent records of a contention group more than
    *    `gapDays` apart (`_check_temporal_gaps`).
    */
  def consistencyCheck(
      store: SnapshotStore,
      checkTypes: Seq[String] = Seq("validity_periods", "overlapping_records", "missing_temporal_data"),
      gapDays: Int = 30,
  ): DataFrame = {
    val e = edges(store)
    val spark = e.sparkSession
    import spark.implicits._
    val w = Window.partitionBy(Key.map(col): _*).orderBy(col("valid_at"), col("uuid"))
    val withNext = e
      .filter(col("valid_at").isNotNull)
      .withColumn("next_valid", lead(col("valid_at"), 1).over(w))
    def countOf(check: String): Long = check match {
      case "validity_periods" =>
        e.filter(
          (col("invalid_at").isNotNull && col("invalid_at") <= col("valid_at")) ||
            (col("expired_at").isNotNull && col("expired_at") < col("created_at")),
        ).count()
      case "overlapping_records" =>
        withNext
          .filter(col("next_valid").isNotNull && col("invalid_at").isNotNull && col("next_valid") < col("invalid_at"))
          .count()
      case "missing_temporal_data" => e.filter(col("valid_at").isNull).count()
      case "temporal_gaps" =>
        withNext
          .filter(
            col("next_valid").isNotNull &&
              (unix_micros(col("next_valid")) - unix_micros(col("valid_at"))) > lit(gapDays * 86400L * 1000000L),
          )
          .count()
      case other => sys.error(s"unknown consistency check: $other")
    }
    checkTypes.map(c => (c, countOf(c))).toDF("check", "issues_found")
  }

  /** temporal_deduplication (`temporal_manager.py:620-712`): within a
    * (group_id, source_uuid, name, target_uuid) group, records whose
    * valid_at falls within `windowHours` of the group's most recent
    * record are duplicates; every one but the latest-created is
    * invalidated (reason "temporal_deduplication" — the reference keeps
    * `max(created_at)` and invalidates the rest). Returns the duplicate
    * uuids — the caller stamps them (GraphitiSpark.temporalDeduplication
    * routes through invalidateEdges so search/temporal indexes stay
    * consistent).
    */
  def duplicateTemporalUuids(store: SnapshotStore, windowHours: Int = 24): DataFrame = {
    val grpKey = Seq("group_id", "source_uuid", "name", "target_uuid").map(col)
    val e = edges(store).filter(col("valid_at").isNotNull && col("invalid_at").isNull)
    val w = Window.partitionBy(grpKey: _*)
    val wPick = Window.partitionBy(grpKey: _*).orderBy(col("created_at").desc, col("uuid"))
    e
      .withColumn("max_valid", max(col("valid_at")).over(w))
      .filter(
        (unix_micros(col("max_valid")) - unix_micros(col("valid_at"))) <= lit(windowHours * 3600L * 1000000L),
      )
      .withColumn("keep_rank", row_number().over(wPick))
      .filter(col("keep_rank") > 1)
      .select(col("uuid"))
  }

  /** Node half of temporal_deduplication (`temporal_manager.py:672-695`,
    * `_group_similar_nodes`): within-window same-name node duplicates per
    * group — every row of a (group_id, name) cluster whose created_at
    * falls within `windowHours` of the cluster's latest, EXCEPT the
    * latest-created record (uuid tiebreak), which is kept.
    */
  def duplicateTemporalNodeUuids(store: SnapshotStore, windowHours: Int = 24): DataFrame = {
    val grpKey = Seq(col("group_id"), col("name"))
    val n = store.load("nodes").filter(col("created_at").isNotNull)
    val w = Window.partitionBy(grpKey: _*)
    val wPick = Window.partitionBy(grpKey: _*).orderBy(col("created_at").desc, col("uuid"))
    n
      .withColumn("max_created", max(col("created_at")).over(w))
      .filter(
        (unix_micros(col("max_created")) - unix_micros(col("created_at"))) <= lit(windowHours * 3600L * 1000000L),
      )
      .withColumn("keep_rank", row_number().over(wPick))
      .filter(col("keep_rank") > 1)
      .select(col("uuid"))
  }

  /** detect_temporal_anomalies (`temporal_manager.py:1182-1225`): one row
    * per anomaly with (anomaly_type, uuid, detail). Types:
    *
    *  - `gaps`: successor more than `gapDays` later in the contention
    *    group (`_detect_temporal_gaps`);
    *  - `overlaps`: successor starts before this record's invalid_at
    *    (`_detect_overlapping_records`);
    *  - `inconsistencies`: inverted validity/ingestion intervals
    *    (`_detect_temporal_inconsistencies`);
    *  - `outliers`: |valid_at − group mean| > 3σ within the contention
    *    group (`_detect_temporal_outliers`' z-score rule), groups of ≥ 3.
    */
  def detectAnomalies(
      store: SnapshotStore,
      anomalyTypes: Seq[String] = Seq("gaps", "overlaps", "inconsistencies", "outliers"),
      gapDays: Int = 30,
  ): DataFrame = {
    val e = edges(store)
    val w = Window.partitionBy(Key.map(col): _*).orderBy(col("valid_at"), col("uuid"))
    val wg = Window.partitionBy(Key.map(col): _*)
    val withNext = e
      .filter(col("valid_at").isNotNull)
      .withColumn("next_valid", lead(col("valid_at"), 1).over(w))
    val parts = anomalyTypes.map {
      case "gaps" =>
        withNext
          .filter(
            col("next_valid").isNotNull &&
              (unix_micros(col("next_valid")) - unix_micros(col("valid_at"))) > lit(gapDays * 86400L * 1000000L),
          )
          .select(
            lit("gaps").as("anomaly_type"),
            col("uuid"),
            concat(lit("next record "), col("next_valid").cast("string")).as("detail"),
          )
      case "overlaps" =>
        withNext
          .filter(col("next_valid").isNotNull && col("invalid_at").isNotNull && col("next_valid") < col("invalid_at"))
          .select(
            lit("overlaps").as("anomaly_type"),
            col("uuid"),
            concat(lit("overlapped by "), col("next_valid").cast("string")).as("detail"),
          )
      case "inconsistencies" =>
        e.filter(
          (col("invalid_at").isNotNull && col("invalid_at") <= col("valid_at")) ||
            (col("expired_at").isNotNull && col("expired_at") < col("created_at")),
        ).select(lit("inconsistencies").as("anomaly_type"), col("uuid"), lit("inverted interval").as("detail"))
      case "outliers" =>
        e.filter(col("valid_at").isNotNull)
          .withColumn("n", count(lit(1)).over(wg))
          .withColumn("mu", avg(unix_micros(col("valid_at"))).over(wg))
          .withColumn("sigma", stddev_pop(unix_micros(col("valid_at"))).over(wg))
          .filter(
            col("n") >= 3 && col("sigma") > 0 &&
              abs(unix_micros(col("valid_at")) - col("mu")) > lit(3.0) * col("sigma"),
          )
          .select(lit("outliers").as("anomaly_type"), col("uuid"), lit("valid_at z-score > 3").as("detail"))
      case other => sys.error(s"unknown anomaly type: $other")
    }
    parts.reduce(_.unionByName(_)).orderBy(col("anomaly_type"), col("uuid"))
  }

  /** temporal_range_query (`temporal_manager.py:812-849`): records whose
    * valid_at (edges) / created_at (nodes, episodes — their only
    * timeline) falls in [start, end), optionally group-scoped and
    * limited after a deterministic (time, uuid) order. Edges ride the
    * month-bucket index probe.
    */
  def rangeQuery(
      store: SnapshotStore,
      start: Timestamp,
      end: Timestamp,
      entityType: String = "edge",
      groupIds: Seq[String] = Nil,
      limit: Option[Int] = None,
  ): DataFrame = {
    val (base, tsCol) = entityType.toLowerCase match {
      case "edge" | "edges" =>
        (graft.search.SearchIndexes.edgesValidInRange(store, start, end), "valid_at")
      case "node" | "nodes" =>
        (store.load("nodes").filter(col("created_at") >= lit(start) && col("created_at") < lit(end)), "created_at")
      case "episode" | "episodes" =>
        (store.load("episodes").filter(col("valid_at") >= lit(start) && col("valid_at") < lit(end)), "valid_at")
      case other => sys.error(s"unknown entity type: $other")
    }
    val scoped =
      if (groupIds.isEmpty) base
      else base.filter(col("group_id").isin(groupIds: _*))
    val ordered = scoped.orderBy(col(tsCol), col("uuid"))
    limit.fold(ordered)(ordered.limit)
  }

  /** temporal_point_query (`temporal_manager.py:850-884`): rows live at
    * `t` — edges by the bitemporal validity predicate, nodes/episodes by
    * created_at/valid_at ≤ t.
    */
  def pointQuery(store: SnapshotStore, t: Timestamp, entityType: String = "edge"): DataFrame =
    entityType.toLowerCase match {
      case "edge" | "edges" => Invalidation.validAt(edges(store), t)
      case "node" | "nodes" => store.load("nodes").filter(col("created_at") <= lit(t))
      case "episode" | "episodes" => store.load("episodes").filter(col("valid_at") <= lit(t))
      case other => sys.error(s"unknown entity type: $other")
    }

  /** temporal_aggregation (`temporal_manager.py:885-975`): count /
    * min(created_at) / max(created_at) over the range-query rows,
    * optionally grouped. The reference's sum/avg branches are literal
    * placeholders over no numeric field (":1016-1024"); count/min/max are
    * the real semantics and the ones implemented.
    */
  def aggregation(
      store: SnapshotStore,
      aggregationType: String,
      start: Timestamp,
      end: Timestamp,
      groupBy: Option[String] = None,
      entityType: String = "edge",
  ): DataFrame = {
    val rows = rangeQuery(store, start, end, entityType)
    val aggCol = aggregationType match {
      case "count" => count(lit(1)).cast("long").as("aggregated_value")
      case "min" => min(col("created_at")).as("aggregated_value")
      case "max" => max(col("created_at")).as("aggregated_value")
      case other => sys.error(s"unsupported aggregation type: $other (count|min|max)")
    }
    groupBy match {
      case None => rows.agg(aggCol)
      case Some(g) => rows.groupBy(col(g)).agg(aggCol).orderBy(col(g))
    }
  }
}
