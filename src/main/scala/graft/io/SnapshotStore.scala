package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Snapshot-versioned Parquet table store — the engine's stand-in for the
  * reference's HuggingFace-Hub commit model (`_push_to_hub`,
  * `huggingface_driver.py:394-419`: every write is a commit with a
  * message) and for Iceberg snapshots (no Iceberg jars ship in this
  * environment). Layout:
  *
  * {{{
  * root/<table>/v=<N>/part-*.parquet     snapshot data
  * root/<table>/v=<N>/_commit.json      message + stage fingerprint +
  *                                      per-partition lineage metrics
  * root/<table>/_LATEST                 current version pointer (atomic)
  * }}}
  *
  * Commits are write-new-directory + atomic pointer move, so a killed job
  * never corrupts the published snapshot and any stage resumes from the
  * last committed snapshot (north-rule resumability). `rollback` re-points
  * to an older snapshot — the analog of the reference's delta rollback
  * (`incremental_updater.py:913-954`) and branch switching.
  */
final class SnapshotStore(val spark: SparkSession, val root: String) {

  private def tableDir(table: String): Path = Paths.get(root, table)
  private def latestFile(table: String): Path = tableDir(table).resolve("_LATEST")

  def currentVersion(table: String): Option[Int] =
    if (Files.exists(latestFile(table)))
      Some(new String(Files.readAllBytes(latestFile(table)), StandardCharsets.UTF_8).trim.toInt)
    else None

  def versions(table: String): Seq[Int] =
    if (!Files.exists(tableDir(table))) Seq.empty
    else
      Files
        .list(tableDir(table))
        .iterator()
        .asScala
        .map(_.getFileName.toString)
        .filter(_.startsWith("v="))
        .map(_.stripPrefix("v=").toInt)
        .toSeq
        .sorted

  def exists(table: String): Boolean = currentVersion(table).isDefined

  /** Commit `df` as the next snapshot of `table`. Computes per-partition
    * lineage metrics (row count per Spark partition) and stores them with
    * the commit message and optional stage fingerprint. Returns the new
    * version.
    */
  def commit(df: DataFrame, table: String, message: String, fingerprint: String = ""): Int = {
    val next = versions(table).lastOption.getOrElse(-1) + 1
    val dir = tableDir(table).resolve(s"v=$next")
    df.write.mode("overwrite").parquet(dir.toString)
    // per-partition row counts = the lineage/metrics channel committed
    // alongside the snapshot (north rule: per-partition lineage + metrics).
    // Read from the written parquet FOOTERS (metadata only, one file per
    // task partition) — zero recomputation of the stage.
    val partCounts = partitionRowCounts(dir)
    val rows = partCounts.map(_._2).sum
    val metricsJson = partCounts.map { case (p, n) => s""""$p":$n""" }.mkString("{", ",", "}")
    val commitJson =
      s"""{"version":$next,"message":${jstr(message)},"fingerprint":${jstr(fingerprint)},
         |"rows":$rows,"partition_rows":$metricsJson,
         |"committed_at":${System.currentTimeMillis()}}""".stripMargin
    Files.write(dir.resolve("_commit.json"), commitJson.getBytes(StandardCharsets.UTF_8))
    publish(table, next)
    next
  }

  /** Row count per written part file, from parquet footers (no data read). */
  private def partitionRowCounts(dir: Path): Seq[(String, Long)] = {
    val conf = spark.sessionState.newHadoopConf()
    Files
      .list(dir)
      .iterator()
      .asScala
      .filter(p => p.getFileName.toString.startsWith("part-") && p.getFileName.toString.endsWith(".parquet"))
      .toSeq
      .sortBy(_.getFileName.toString)
      .map { p =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new org.apache.hadoop.fs.Path(p.toUri), conf)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try p.getFileName.toString.split("-")(1) -> reader.getRecordCount
        finally reader.close()
      }
  }

  private def publish(table: String, version: Int): Unit = {
    val tmp = tableDir(table).resolve(s"_LATEST.tmp")
    Files.createDirectories(tableDir(table))
    Files.write(tmp, version.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, latestFile(table), StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def load(table: String): DataFrame = {
    val v = currentVersion(table).getOrElse(sys.error(s"no committed snapshot for $table"))
    loadVersion(table, v)
  }

  def loadVersion(table: String, version: Int): DataFrame =
    spark.read.parquet(tableDir(table).resolve(s"v=$version").toString)

  /** Re-point the table at an older snapshot (time travel / rollback). */
  def rollback(table: String, version: Int): Unit = {
    require(versions(table).contains(version), s"unknown version $version of $table")
    publish(table, version)
  }

  def commitInfo(table: String, version: Int): String = {
    val p = tableDir(table).resolve(s"v=$version").resolve("_commit.json")
    new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
  }

  /** Has a snapshot with this stage fingerprint already been committed?
    * (resume-from-checkpoint: a stage whose inputs haven't changed is
    * skipped and its latest snapshot reused)
    */
  def hasFingerprint(table: String, fingerprint: String): Boolean =
    fingerprint.nonEmpty && currentVersion(table).exists { v =>
      commitInfo(table, v).contains(s""""fingerprint":"$fingerprint"""")
    }

  /** Key-based upsert: rows of `updates` replace same-key rows of the
    * current snapshot; new keys are appended (MERGE INTO ... WHEN MATCHED
    * UPDATE WHEN NOT MATCHED INSERT, expressed as anti-join ∪ updates —
    * the copy-on-write analog of Iceberg merge-on-read).
    */
  def merge(table: String, updates: DataFrame, key: Seq[String], message: String): Int = {
    val merged =
      if (!exists(table)) updates
      else load(table).join(updates.select(key.map(col): _*), key, "left_anti").unionByName(updates)
    commit(merged, table, message)
  }

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
