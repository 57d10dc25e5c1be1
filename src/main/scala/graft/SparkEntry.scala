package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each operator from SURVEY.md §2 is registered as a [[QueryDef]] in one of
  * the `graft.queries.*` modules; entries with an oracle are checked
  * value-for-value against DuckDB by the driver, the rest get a rows-only
  * check.
  */
object SparkEntry {

  private def modules: Seq[QueryDef] =
    graft.queries.Relational.defs ++
      graft.queries.Temporal.defs ++
      graft.queries.Graph.defs ++
      graft.queries.Search.defs ++
      graft.queries.Dedup.defs ++
      graft.queries.TextAnalysis.defs ++
      graft.queries.Similarity.defs ++
      graft.queries.Kg.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Kg.defs.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    modules.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}
