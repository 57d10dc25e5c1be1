package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic LLM-context formatting of a [[SearchResults]] — the
  * reference's `search_helpers.py`:
  *
  *  - `format_edge_date_range` (search_helpers.py:22-24): `"<valid_at> -
  *    <invalid_at>"` with `"date unknown"` / `"present"` fallbacks;
  *  - `search_results_to_context_string` (search_helpers.py:27-80): the
  *    FACTS / ENTITIES / EPISODES / COMMUNITIES prompt block, each section
  *    a JSON array of the same fields the reference serializes.
  *
  * The row JSON is produced DISTRIBUTED (`to_json` over a struct, one
  * projection per table) and only the final bounded result set (post-limit
  * search output, ≤ tens of rows) is collected to assemble the string —
  * the collect here is the reference's own contract (it returns a Python
  * string for a prompt), not a scale path.
  */
object ContextString {

  /** Column form of `format_edge_date_range`: needs `valid_at`/`invalid_at`. */
  def edgeDateRange: org.apache.spark.sql.Column =
    concat_ws(
      " - ",
      coalesce(col("valid_at").cast("string"), lit("date unknown")),
      coalesce(col("invalid_at").cast("string"), lit("present")),
    )

  private def jsonLines(df: DataFrame, s: org.apache.spark.sql.Column, order: Seq[String]): Seq[String] = {
    val present = order.filter(df.columns.contains)
    val ordered = if (present.isEmpty) df else df.orderBy(present.map(col): _*)
    ordered.select(to_json(s).as("j")).collect().map(_.getString(0)).toSeq
  }

  private def section(tag: String, lines: Seq[String]): String =
    s"<$tag>\n[${lines.mkString(",\n")}]\n</$tag>"

  /** `search_results_to_context_string`: same fields per section as the
    * reference (fact/valid_at/invalid_at, entity_name/summary,
    * source_description/content, community_name/summary), `"Present"` for
    * open-ended facts (search_helpers.py:31-36). Deterministic order: the
    * caller's ranked output is re-sorted by the serialized fields, so equal
    * inputs yield byte-equal context strings.
    */
  def contextString(results: SearchResults): String = {
    val facts = jsonLines(
      results.edges,
      struct(
        col("fact"),
        col("valid_at").cast("string").as("valid_at"),
        coalesce(col("invalid_at").cast("string"), lit("Present")).as("invalid_at"),
      ),
      Seq("fact", "valid_at", "uuid"),
    )
    val entities = jsonLines(
      results.nodes,
      struct(
        col("name").as("entity_name"),
        (if (results.nodes.columns.contains("summary")) col("summary") else lit("")).as("summary"),
      ),
      Seq("name", "uuid"),
    )
    val episodes = jsonLines(
      results.episodes,
      struct(
        (if (results.episodes.columns.contains("source_description")) col("source_description")
         else lit("")).as("source_description"),
        col("content"),
      ),
      Seq("content", "uuid"),
    )
    val communities = results.communities.toSeq.flatMap { c =>
      jsonLines(
        c,
        struct(
          col("name").as("community_name"),
          (if (c.columns.contains("summary")) col("summary") else lit("")).as("summary"),
        ),
        Seq("name", "uuid"),
      )
    }
    Seq(
      "FACTS and ENTITIES represent relevant context to the current conversation.",
      "COMMUNITIES represent a cluster of closely related entities.",
      section("FACTS", facts),
      section("ENTITIES", entities),
      section("EPISODES", episodes),
      section("COMMUNITIES", communities),
    ).mkString("\n")
  }
}
