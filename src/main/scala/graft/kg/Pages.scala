package graft.kg

import graft.T
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthesis of the Common-Crawl-style `pages` input table
  * (url:string, warc_ts:timestamp, html:binary, text:string, lang:string)
  * from the driver's TPC-H-ish parquet tables — no external data, seeded by
  * the key columns themselves, so the corpus is identical across runs and
  * engines (the DuckDB oracle can re-derive the expected triples from the
  * same relational source).
  *
  * Page content mirrors the reference's episode bodies
  * (`graphiti_core/nodes.py:353-363`): natural-language sentences carrying
  * entity mentions and relation patterns:
  *   - "<Customer> lives in <NATION>."          → lives_in
  *   - "<Supplier> is located in <NATION>."     → located_in
  *   - "<NATION> is part of <REGION>."          → part_of
  *   - contradiction pages: same (subj, pred) with a different object at a
  *     later warc_ts (drives invalidate-edge semantics,
  *     `edge_operations.py:381-411`).
  */
object Pages {

  /** Epoch base for synthetic crawl timestamps: 2024-01-01T00:00:00Z. */
  val Epoch = 1704067200L

  /** Customer pages: one page per customer describing where they live.
    * Every ~7th customer gets a second, later page that contradicts the
    * first (moves to the next nation) — exercising temporal invalidation.
    */
  def customerPages(spark: SparkSession, dir: String): DataFrame = {
    val c = T.load(spark, dir, "customer")
    val n = broadcast(T.load(spark, dir, "nation"))
    // order history paragraph: one sentence per order, deterministically
    // ordered — gives pages realistic (KB-scale) bodies and a `placed`
    // relation with fan-out
    val o = T.load(spark, dir, "orders")
      .select(
        col("o_custkey"),
        struct(
          col("o_orderkey"),
          concat(lit("placed order Order#"), col("o_orderkey"), lit(".")).as("s"),
        ).as("os"),
      )
      .groupBy(col("o_custkey"))
      .agg(array_sort(collect_list(col("os"))).as("oss"))
      .select(
        col("o_custkey"),
        concat_ws(" ", transform(col("oss"), x => x.getField("s"))).as("order_tail"),
      )
    val base = c
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .join(o, col("c_custkey") === col("o_custkey"), "left")
      .select(
        concat(lit("https://example.org/customer/"), col("c_custkey")).as("url"),
        timestamp_seconds(lit(Epoch) + col("c_custkey") * lit(60L)).as("warc_ts"),
        col("c_custkey"),
        col("c_nationkey"),
        concat(
          col("c_name"), lit(" lives in "), col("n_name"), lit(". "),
          col("c_name"), lit(" shops in the "), col("c_mktsegment"), lit(" segment."),
          when(
            col("order_tail").isNotNull,
            // each order sentence needs the subject: rebuild as
            // "<name> placed order Order#k." per sentence
            concat(lit(" "), regexp_replace(col("order_tail"), lit("placed order"), concat(col("c_name"), lit(" placed order")))),
          ).otherwise(lit("")),
        ).as("body"),
        col("c_name").as("title"),
      )
    // contradiction page: customer moved to nation (c_nationkey+1) % 25,
    // crawled 30 days later.
    val moved = c
      .filter(col("c_custkey") % 7 === lit(0))
      .withColumn("new_nationkey", (col("c_nationkey") + lit(1)) % lit(25))
      .join(n, col("new_nationkey") === col("n_nationkey"))
      .select(
        concat(lit("https://example.org/customer/"), col("c_custkey"), lit("/update")).as("url"),
        timestamp_seconds(lit(Epoch) + col("c_custkey") * lit(60L) + lit(2592000L)).as("warc_ts"),
        col("c_custkey"),
        col("new_nationkey").as("c_nationkey"),
        concat(col("c_name"), lit(" lives in "), col("n_name"), lit(".")).as("body"),
        col("c_name").as("title"),
      )
    wrapHtml(base.unionByName(moved))
  }

  /** Supplier pages: location + nation→region hierarchy sentences. */
  def supplierPages(spark: SparkSession, dir: String): DataFrame = {
    val s = T.load(spark, dir, "supplier")
    val n = broadcast(T.load(spark, dir, "nation"))
    val r = broadcast(T.load(spark, dir, "region"))
    // supply catalog paragraph (line 1 of each order only, for bounded
    // but Zipf-skewed page sizes — hot suppliers get big pages)
    val li = T.load(spark, dir, "lineitem")
      .filter(col("l_linenumber") === 1)
      .select(col("l_suppkey"), col("l_partkey"))
      .distinct()
      .select(
        col("l_suppkey"),
        struct(col("l_partkey"), concat(lit("supplies Part#"), col("l_partkey"), lit(".")).as("s")).as("ps"),
      )
      .groupBy(col("l_suppkey"))
      .agg(array_sort(collect_list(col("ps"))).as("pss"))
      .select(col("l_suppkey"), concat_ws(" ", transform(col("pss"), x => x.getField("s"))).as("supply_tail"))
    val df = s
      .join(n, col("s_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .join(li, col("s_suppkey") === col("l_suppkey"), "left")
      .select(
        concat(lit("https://example.org/supplier/"), col("s_suppkey")).as("url"),
        timestamp_seconds(lit(Epoch) + lit(900L) + col("s_suppkey") * lit(60L)).as("warc_ts"),
        concat(
          col("s_name"), lit(" is located in "), col("n_name"), lit(". "),
          col("n_name"), lit(" is part of "), col("r_name"), lit("."),
          when(
            col("supply_tail").isNotNull,
            concat(lit(" "), regexp_replace(col("supply_tail"), lit("supplies Part#"), concat(col("s_name"), lit(" supplies Part#")))),
          ).otherwise(lit("")),
        ).as("body"),
        col("s_name").as("title"),
      )
    wrapHtml(df)
  }

  /** Full corpus: customers ∪ suppliers. Partitioned by a url hash when
    * written — at 10^12 docs the url-bucket layout keeps extraction
    * embarrassingly parallel with no shuffle before the linking stage.
    */
  def corpus(spark: SparkSession, dir: String): DataFrame =
    customerPages(spark, dir)
      .select("url", "warc_ts", "html", "text", "lang")
      .unionByName(supplierPages(spark, dir).select("url", "warc_ts", "html", "text", "lang"))

  /** Wrap a (url, warc_ts, body, title, ...) frame into the pages schema,
    * with raw html bytes and NULL text (forcing extraction from html —
    * the byte-identical-text invariant is checked against `body`).
    */
  private def wrapHtml(df: DataFrame): DataFrame =
    df.withColumn(
      "html",
      concat(
        lit("<html><head><title>"), col("title"),
        lit("</title></head>\n<body>\n  <h1>"), col("title"),
        lit("</h1>\n  <p>"), col("body"), lit("</p>\n  <!-- crawl -->\n</body></html>"),
      ).cast("binary"),
    ).withColumn("text", lit(null).cast("string"))
      .withColumn("lang", lit("en"))
}
