package graft.kg

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A surface-form entity mention found in a page. */
final case class Mention(url: String, surface: String, entityType: String, pos: Int)

/** A raw extracted triple before linking/canonicalization. Mirrors the
  * reference's extracted-edge contract (`edge_operations.py:112-247`):
  * (source entity, relation name, target entity, natural-language fact).
  */
final case class RawTriple(url: String, subj: String, pred: String, obj: String, fact: String)

/** Deterministic mention + triple extraction (the engine's stand-in for the
  * reference's LLM extractors, same output contracts:
  * extract_nodes `node_operations.py:69-181`, extract_edges
  * `edge_operations.py:112-247`).
  *
  * Two execution forms:
  *  - column-expression form ([[triplesOf]], [[mentionCol]]) — pure Catalyst
  *    `regexp_extract_all`/`explode`, codegen'd, zero driver involvement:
  *    the scale path for simple relation patterns;
  *  - typed `mapPartitions` form ([[mentions]], [[triples]]) — compiled
  *    regex per partition over broadcastable pattern lists, for the
  *    imperative long tail (sentence windows, overlapping matches).
  */
object Extract {

  /** Entity surface shape: TitleCase word optionally keyed with #digits or
    * _digits ("Customer#000000042", "NATION_3", "Acme"), optionally
    * continued by further ALL-CAPS words ("MIDDLE EAST").
    */
  val EntityPattern = "[A-Z][A-Za-z]*(?:#\\d+|_\\d+)?(?: [A-Z]{2,})*"

  /** (relation name, sentence regex with exactly 2 capture groups). */
  val RelationPatterns: Seq[(String, String)] = Seq(
    ("lives_in", s"($EntityPattern) lives in ($EntityPattern)\\."),
    ("located_in", s"($EntityPattern) is located in ($EntityPattern)\\."),
    ("part_of", s"($EntityPattern) is part of ($EntityPattern)\\."),
    ("works_at", s"($EntityPattern) works at ($EntityPattern)\\."),
    ("founded", s"($EntityPattern) founded ($EntityPattern)\\."),
    ("acquired", s"($EntityPattern) acquired ($EntityPattern)\\."),
    ("shops_in_segment", s"($EntityPattern) shops in the ($EntityPattern) segment\\."),
    ("placed", s"($EntityPattern) placed order ($EntityPattern)\\."),
    ("supplies", s"($EntityPattern) supplies ($EntityPattern)\\."),
  )

  /** Every entity type [[entityTypeOf]] can emit. */
  val KnownEntityTypes: Seq[String] = Seq("Entity", "Person", "Organization", "Place")

  /** validate_excluded_entity_types (`graphiti_core/helpers.py`; exercised
    * by `tests/test_entity_exclusion_int.py:294-331`): an exclusion list
    * naming an unknown type fails fast.
    */
  def validateExcludedEntityTypes(excluded: Seq[String]): Unit = {
    val bad = excluded.filterNot(KnownEntityTypes.contains)
    require(
      bad.isEmpty,
      s"unknown entity types in excludedEntityTypes: ${bad.mkString(", ")} " +
        s"(known: ${KnownEntityTypes.mkString(", ")})",
    )
  }

  /** Entity type from surface shape (gazetteer-free deterministic NER). */
  def entityTypeOf(surface: String): String =
    if (surface.startsWith("Customer#")) "Person"
    else if (surface.startsWith("Supplier#")) "Organization"
    else if (surface.startsWith("NATION_") || surface.startsWith("REGION_")) "Place"
    else "Entity"

  // ------------------------------------------------------------------
  // Column-expression form (whole-stage-codegen path)
  // ------------------------------------------------------------------

  /** Column form of [[entityTypeOf]] — same prefix chain as a codegen'd
    * CASE expression (value parity pinned by ExtractSpec).
    */
  def entityTypeCol(c: Column): Column =
    when(c.startsWith("Customer#"), "Person")
      .when(c.startsWith("Supplier#"), "Organization")
      .when(c.startsWith("NATION_") || c.startsWith("REGION_"), "Place")
      .otherwise("Entity")

  /** Distinct surfaces (`name` column) → entity-node rows
    * (uuid, name, label, name_embedding, group_id) as ONE pure-codegen
    * projection: deterministic md5 uuid (== [[Ids.entity]]), CASE label,
    * native `graft_embed` (== [[Embedder.embed]]) — no encoder boundary,
    * no per-row Scala closure. Replaces the old `mapPartitions` node
    * build in the bulk pipeline, incremental ingest and migration.
    * `excludedTypes` drops surfaces whose entity type is excluded — the
    * reference's `extract_nodes(excluded_entity_types)` filter
    * (`node_operations.py:74,163-164`).
    */
  def entityNodes(
      surfaces: DataFrame,
      groupId: String,
      keep: Seq[String] = Nil,
      excludedTypes: Seq[String] = Nil,
  ): DataFrame = {
    val kept =
      if (excludedTypes.isEmpty) surfaces
      else surfaces.filter(!entityTypeCol(col("name")).isin(excludedTypes: _*))
    kept.select(
      Seq(
        md5(concat(lit(s"en|$groupId|"), col("name"))).as("uuid"),
        col("name"),
        entityTypeCol(col("name")).as("label"),
        graft.functions.Functions.embedText(col("name")).as("name_embedding"),
        lit(groupId).as("group_id"),
      ) ++ keep.map(col): _*
    )
  }

  /** Drop triples with an excluded-type endpoint — the downstream effect
    * of the reference's entity-type exclusion: an edge referencing an
    * excluded (never-extracted) entity cannot resolve and never forms
    * (`node_operations.py:163-164`; exercised by
    * `tests/test_entity_exclusion_int.py`). A pure codegen filter — at
    * scale it rides the extraction scan, no extra pass.
    */
  def excludeTypes(triples: DataFrame, excludedTypes: Seq[String]): DataFrame =
    if (excludedTypes.isEmpty) triples
    else
      triples.filter(
        !entityTypeCol(col("subj")).isin(excludedTypes: _*) &&
          !entityTypeCol(col("obj")).isin(excludedTypes: _*),
      )

  /** pages(url, text) → triples(url, subj, pred, obj, fact). One pass per
    * relation pattern, unioned; each pass is scan → regexp_extract_all →
    * explode, fully pipelined with no shuffle.
    */
  def triplesOf(pages: DataFrame, textCol: Column): DataFrame = {
    val withText = pages.withColumn("__t", textCol)
    RelationPatterns.map { case (pred, pat) =>
      withText
        .select(
          col("url"),
          explode(
            arrays_zip(
              regexp_extract_all(col("__t"), lit(pat), lit(1)).as("s"),
              regexp_extract_all(col("__t"), lit(pat), lit(2)).as("o"),
              regexp_extract_all(col("__t"), lit(pat), lit(0)).as("f"),
            ),
          ).as("m"),
        )
        .select(
          col("url"),
          col("m.s").as("subj"),
          lit(pred).as("pred"),
          col("m.o").as("obj"),
          col("m.f").as("fact"),
        )
    }.reduce(_ unionByName _)
      .filter(col("subj").isNotNull && col("subj") =!= lit(""))
  }

  /** All entity mentions as an array column (surfaces in document order). */
  def mentionCol(text: Column): Column =
    regexp_extract_all(text, lit(s"($EntityPattern)"), lit(1))

  // ------------------------------------------------------------------
  // Typed mapPartitions form (imperative long tail; compiled regex reused
  // across the partition — the per-partition batch shape of the reference's
  // CHUNK_SIZE batching, bulk_utils.py:63)
  // ------------------------------------------------------------------

  def mentions(spark: SparkSession, pages: DataFrame): Dataset[Mention] = {
    import spark.implicits._
    val pat = EntityPattern
    pages.select(col("url"), col("text")).as[(String, String)].mapPartitions { it =>
      val re = java.util.regex.Pattern.compile(pat)
      it.flatMap { case (url, text) =>
        if (text == null) Iterator.empty
        else {
          val m = re.matcher(text)
          val out = scala.collection.mutable.ArrayBuffer.empty[Mention]
          while (m.find()) out += Mention(url, m.group(), entityTypeOf(m.group()), m.start())
          out.iterator
        }
      }
    }
  }

  /** All relation patterns fused into ONE alternation (pattern i owns
    * capture groups 2i+1, 2i+2): a single matcher scan per text instead of
    * one scan per pattern. The relation phrases are mutually exclusive and
    * sentence-bounded, so the fused scan finds exactly the union of the
    * per-pattern scans (frozen by ExtractSpec against [[triplesOf]]).
    */
  private lazy val combinedPattern =
    java.util.regex.Pattern.compile(RelationPatterns.map(p => "(?:" + p._2 + ")").mkString("|"))

  /** Single-pass extraction carrying the crawl timestamp — the pipeline's
    * hot path: text is scanned once for ALL patterns (memory traffic, not
    * CPU, bounds extraction throughput) and no join is needed to recover
    * warc_ts. Input columns: (url, text, warc_ts).
    */
  def triplesTs(spark: SparkSession, pages: DataFrame): DataFrame = {
    import spark.implicits._
    val preds = RelationPatterns.map(_._1)
    pages
      .select(col("url"), col("text"), col("warc_ts"))
      .as[(String, String, java.sql.Timestamp)]
      .mapPartitions { it =>
        val re = combinedPattern
        val k = preds.size
        it.flatMap { case (url, text, ts) =>
          if (text == null) Iterator.empty
          else {
            val m = re.matcher(text)
            val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, String, String, String, java.sql.Timestamp)]
            while (m.find()) {
              var i = 0
              var found = false
              while (i < k && !found) {
                val s = m.group(2 * i + 1)
                if (s != null) {
                  out += ((url, s, preds(i), m.group(2 * i + 2), m.group(0), ts))
                  found = true
                }
                i += 1
              }
            }
            out
          }
        }
      }
      .toDF("url", "subj", "pred", "obj", "fact", "warc_ts")
  }

  def triples(spark: SparkSession, pages: DataFrame): Dataset[RawTriple] = {
    import spark.implicits._
    val pats = RelationPatterns
    pages.select(col("url"), col("text")).as[(String, String)].mapPartitions { it =>
      val compiled = pats.map { case (p, r) => (p, java.util.regex.Pattern.compile(r)) }
      it.flatMap { case (url, text) =>
        if (text == null) Iterator.empty
        else compiled.iterator.flatMap { case (pred, re) =>
          val m = re.matcher(text)
          val out = scala.collection.mutable.ArrayBuffer.empty[RawTriple]
          while (m.find()) out += RawTriple(url, m.group(1), pred, m.group(2), m.group(0))
          out
        }
      }
    }
  }
}
