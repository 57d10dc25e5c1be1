package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable operator: a Spark query over the parquet tables in
  * `sfDir` plus (optionally) an equivalent DuckDB SQL oracle over the same
  * tables. Column names MUST match between the two — the driver's comparator
  * sorts columns by name before hashing values.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
)

/** Shared table loading + session conventions. */
object T {
  def load(spark: SparkSession, dir: String, table: String): DataFrame =
    spark.read.parquet(s"$dir/$table.parquet")
}
