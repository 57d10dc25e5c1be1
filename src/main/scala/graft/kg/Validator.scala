package graft.kg

import graft.io.SnapshotStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph data validation — the re-expression of the reference's
  * `Validator` (`graphiti_hf/processing/validator.py:127-757`). The
  * reference iterates entities/edges row-by-row through per-rule Python
  * lambdas; here every rule is ONE distributed aggregate over the
  * snapshot tables and the report is a small (rule, severity, failures,
  * checked) frame — the shape that still works when the tables hold 10^12
  * rows.
  *
  * Default rules mirror `_load_default_rules` (:161-246):
  *  - entities: non-empty name (error), ≥1 label (error), well-formed
  *    attributes (warning), temporal sanity (warning), unique uuid (error);
  *  - edges: non-null endpoints (error), non-empty fact (error),
  *    temporal interval sanity invalid_at ≥ valid_at (warning),
  *    structural: endpoints resolve to existing nodes (warning — the
  *    reference checks `_validate_edge_structural`, :741);
  *  - graph: orphan nodes (connectivity, warning), edges citing missing
  *    episodes (consistency, error), ≤1 open fact per contention group
  *    (temporal, warning).
  */
final class Validator(store: SnapshotStore) {

  private def result(rule: String, severity: String, failures: DataFrame, checked: Long): (String, String, Long, Long) =
    (rule, severity, failures.count(), checked)

  /** validate_entities (:247-277): per-rule failure counts over `nodes`. */
  def validateEntities(): Seq[(String, String, Long, Long)] = {
    val nodes = store.load("nodes")
    val n = nodes.count()
    Seq(
      result("entity_name_nonempty", "error", nodes.filter(col("name").isNull || trim(col("name")) === ""), n),
      result("entity_has_label", "error", nodes.filter(col("labels").isNull || size(col("labels")) === 0), n),
      result(
        "entity_attributes_wellformed", "warning",
        nodes.filter(col("attributes").isNull || !map_contains_key(col("attributes"), lit("entity_type"))),
        n,
      ),
      result("entity_temporal_sane", "warning", nodes.filter(col("created_at").isNull), n),
      result(
        "entity_uuid_unique", "error",
        nodes.groupBy(col("uuid")).agg(count(lit(1)).as("c")).filter(col("c") > 1),
        n,
      ),
    )
  }

  /** validate_edges (:279-309). */
  def validateEdges(): Seq[(String, String, Long, Long)] = {
    val edges = store.load("edges")
    val n = edges.count()
    val nodeIds = store.load("nodes").select(col("uuid"))
    Seq(
      result("edge_source_present", "error", edges.filter(col("source_uuid").isNull || col("source_uuid") === ""), n),
      result("edge_target_present", "error", edges.filter(col("target_uuid").isNull || col("target_uuid") === ""), n),
      result("edge_fact_nonempty", "error", edges.filter(col("fact").isNull || trim(col("fact")) === ""), n),
      result(
        "edge_temporal_interval", "warning",
        edges.filter(col("invalid_at").isNotNull && col("invalid_at") < col("valid_at")),
        n,
      ),
      result(
        "edge_endpoints_resolve", "warning",
        // failures in EDGE units (checked = n edges): one row per edge
        // with ≥1 dangling endpoint, not per exploded endpoint (which
        // could double-count an edge and exceed `checked`)
        edges
          .select(col("uuid").as("__edge"), explode(array(col("source_uuid"), col("target_uuid"))).as("uuid"))
          .join(nodeIds, Seq("uuid"), "left_anti")
          .select(col("__edge"))
          .distinct(),
        n,
      ),
    )
  }

  /** validate_graph (:311-349): whole-graph structural/temporal checks. */
  def validateGraph(): Seq[(String, String, Long, Long)] = {
    val nodes = store.load("nodes")
    val edges = store.load("edges")
    val nNodes = nodes.count()
    val endpointIds = edges
      .select(explode(array(col("source_uuid"), col("target_uuid"))).as("uuid"))
      .distinct()
    val orphanNodes = nodes.join(endpointIds, Seq("uuid"), "left_anti")
    // failures in EDGE units (checked = n edges): edges citing ≥1
    // episode uuid with no episodes row
    val missingEpisodes =
      if (store.exists("episodes")) {
        val epIds = store.load("episodes").select(col("uuid"))
        edges
          .select(col("uuid").as("__edge"), explode(col("episodes")).as("uuid"))
          .join(epIds, Seq("uuid"), "left_anti")
          .select(col("__edge"))
          .distinct()
      } else edges.limit(0).select(col("uuid"))
    val multiOpen = edges
      .filter(col("invalid_at").isNull)
      .groupBy(col("group_id"), col("source_uuid"), col("name"))
      .agg(count(lit(1)).as("open"))
      .filter(col("open") > 1)
    val nEdges = edges.count()
    Seq(
      result("graph_no_orphan_nodes", "warning", orphanNodes, nNodes),
      result("graph_episodes_resolve", "error", missingEpisodes, nEdges),
      result("graph_single_open_fact", "warning", multiOpen, nEdges),
    )
  }

  /** Full report as a DataFrame (rule, severity, failures, checked) —
    * `validate_graph` + `ValidationReport.get_summary` (:100-124).
    */
  def validateAll(): DataFrame = {
    val spark = store.spark
    import spark.implicits._
    (validateEntities() ++ validateEdges() ++ validateGraph())
      .toDF("rule", "severity", "failures", "checked")
  }

  /** validate_incremental (:351-420): check ONLY a batch's rows before
    * merging (cheap pre-flight) — returns per-rule failure counts over the
    * proposed frames.
    */
  def validateIncremental(newNodes: DataFrame, newEdges: DataFrame): DataFrame = {
    val spark = store.spark
    import spark.implicits._
    val n = newNodes.count()
    val m = newEdges.count()
    Seq(
      ("entity_name_nonempty", "error", newNodes.filter(col("name").isNull || trim(col("name")) === "").count(), n),
      ("edge_fact_nonempty", "error", newEdges.filter(col("fact").isNull || trim(col("fact")) === "").count(), m),
      (
        "edge_temporal_interval", "warning",
        newEdges.filter(col("invalid_at").isNotNull && col("invalid_at") < col("valid_at")).count(), m,
      ),
    ).toDF("rule", "severity", "failures", "checked")
  }
}
