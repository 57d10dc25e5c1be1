package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Episode-level pre-ingest validation — the reference's
  * `EpisodeProcessor.validate_episode` (`graphiti_hf/processing/
  * episode_processor.py:526-577`) plus its helpers
  * `_validate_temporal_consistency` (:777-794) and
  * `_validate_content_coverage` (:796-823), re-expressed as ONE
  * distributed report over every episode at once (the reference loops
  * per episode): pure filters for the shape checks, an anti-join for
  * edge connectivity, and an exploded-token join aggregate for content
  * coverage — never a per-episode driver loop.
  */
object EpisodeValidation {

  /** Per-episode validation report: (url, issue, detail), empty when
    * everything validates.
    *
    * Inputs (all keyed by `url` — the episode identity):
    *  - `entities`: (url, name) extracted entity mentions;
    *  - `edges`: (url, source_name, target_name, fact, valid_at,
    *    invalid_at) extracted edges (timestamps nullable);
    *  - `pages`: (url, text) the original content.
    *
    * Checks (same rules and 10% coverage floor as the reference):
    *  1. empty entity name / empty edge fact;
    *  2. edge endpoint not among the episode's extracted entities;
    *  3. valid_at >= invalid_at (temporal consistency);
    *  4. < `coverageFloor` of content words covered by extracted
    *     entity names + edge facts.
    */
  def validateEpisodes(
      entities: DataFrame,
      edges: DataFrame,
      pages: DataFrame,
      coverageFloor: Double = 0.1,
  ): DataFrame = {
    val emptyName = entities
      .filter(col("name").isNull || trim(col("name")) === "")
      .select(col("url"), lit("entity has empty name").as("issue"), coalesce(col("name"), lit("<null>")).as("detail"))

    val emptyFact = edges
      .filter(col("fact").isNull || trim(col("fact")) === "")
      .select(col("url"), lit("edge has empty fact").as("issue"), concat(col("source_name"), lit(" -> "), col("target_name")).as("detail"))

    // edge connectivity: both endpoints must be among the episode's own
    // extracted entities (reference: uuids sets; names are the pre-uuid
    // identity here — Ids.entity is a pure function of (group, name))
    val entByEp = entities.select(col("url"), col("name")).distinct()
    def missingEndpoint(endCol: String, label: String) = edges
      .select(col("url"), col(endCol).as("name"))
      .join(entByEp, Seq("url", "name"), "left_anti")
      .select(col("url"), lit(s"edge $label not found in extracted entities").as("issue"), col("name").as("detail"))

    val temporal = edges
      .filter(col("valid_at").isNotNull && col("invalid_at").isNotNull && col("valid_at") >= col("invalid_at"))
      .select(
        col("url"),
        lit("edge has valid_at >= invalid_at").as("issue"),
        concat(col("source_name"), lit(" -> "), col("target_name")).as("detail"),
      )

    // content coverage (:796-823): fraction of DISTINCT lowercased
    // whitespace words of the content that appear among the extracted
    // entity-name/fact words; below the floor → one report row. An
    // episode with NO content words yields no coverage row and is not
    // flagged — the reference guards the whole check with
    // `if content_words:` (:817) and skips empty content the same way.
    val contentWords = pages
      .select(col("url"), explode(split(lower(col("text")), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .distinct()
    val keywords = entities
      .select(col("url"), explode(split(lower(col("name")), "\\s+")).as("word"))
      .unionByName(edges.select(col("url"), explode(split(lower(coalesce(col("fact"), lit(""))), "\\s+")).as("word")))
      .filter(col("word") =!= "")
      .distinct()
    val coverage = contentWords
      .join(keywords.withColumn("__hit", lit(1)), Seq("url", "word"), "left")
      .groupBy(col("url"))
      .agg((sum(coalesce(col("__hit"), lit(0))) / count(lit(1))).as("coverage"))
      .filter(col("coverage") < lit(coverageFloor))
      .select(
        col("url"),
        lit("low content coverage").as("issue"),
        format_string("%.2f%% of content words covered", col("coverage") * 100).as("detail"),
      )

    emptyName
      .unionByName(emptyFact)
      .unionByName(missingEndpoint("source_name", "source"))
      .unionByName(missingEndpoint("target_name", "target"))
      .unionByName(temporal)
      .unionByName(coverage)
      .orderBy(col("url"), col("issue"), col("detail"))
  }

  /** Validate episodes straight from page content with the engine's own
    * deterministic extractor (the shape `EpisodeProcessor.process_episode`
    * runs pre-ingest): entities = mention surfaces, edges = extracted
    * triples with valid_at = warc_ts. Input: (url, text, warc_ts).
    */
  def validatePages(pages: DataFrame, coverageFloor: Double = 0.1): DataFrame = {
    val spark = pages.sparkSession
    val entities = pages.select(col("url"), explode(Extract.mentionCol(col("text"))).as("name"))
    val edges = Extract
      .triplesTs(spark, pages)
      .select(
        col("url"),
        col("subj").as("source_name"),
        col("obj").as("target_name"),
        col("fact"),
        col("warc_ts").as("valid_at"),
        lit(null).cast("timestamp").as("invalid_at"),
      )
    validateEpisodes(entities, edges, pages.select(col("url"), col("text")), coverageFloor)
  }
}
