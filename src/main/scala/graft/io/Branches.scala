package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._


/** Branch-per-writer concurrency over the snapshot store — the
  * re-expression of the reference's `ConcurrencyManager`
  * (`graphiti_hf/processing/concurrency_manager.py:225-857`):
  *
  *  - a BRANCH is a named pin file (`_branches/<name>.json`) mapping each
  *    table to a snapshot version; `main` is the live `_LATEST` pointers.
  *    Branch commits write new (unpublished) versions and move only the
  *    branch's pins — concurrent writers never touch each other's state
  *    (create_branch / switch_branch / list_branches / delete_branch,
  *    :225-427);
  *  - MERGE joins source and target rows by uuid: source-only rows are
  *    added, rows present in both with differing content are CONFLICTS
  *    resolved per strategy (auto = incoming wins, timestamp = later
  *    created_at wins, priority = higher `priority` column wins, manual =
  *    target kept + conflicts reported unresolved — MergeStrategy enum
  *    :52-58, handlers :551-662, row-diff detection :895-926);
  *  - OPTIMISTIC LOCKING is version-CAS on the table snapshot
  *    (check_version_conflict / apply_with_lock, :443-493);
  *  - TRANSACTIONS buffer writes and publish every pointer only after all
  *    data is durably written (begin/commit/rollback_transaction,
  *    :664-793).
  */
final class Branches(store: SnapshotStore) {

  /** Tables a branch pins by default (the reference branches the whole
    * graph dataset).
    */
  val DefaultTables: Seq[String] = Seq("nodes", "edges", "episodes", "episodic_edges")

  final case class BranchInfo(name: String, parent: String, pins: Map[String, Int], createdAt: Long)

  final case class MergeResult(table: String, added: Long, conflicts: Long, resolved: Long)

  private def branchDir: Path = Paths.get(store.root, "_branches")
  private def branchFile(name: String): Path = branchDir.resolve(s"$name.json")

  def branchExists(name: String): Boolean = name == "main" || Files.exists(branchFile(name))

  /** Pin the parent's current table versions under a new branch name. */
  def createBranch(name: String, parent: String = "main", tables: Seq[String] = DefaultTables): BranchInfo = {
    require(name != "main" && !branchExists(name), s"branch $name already exists")
    require(branchExists(parent), s"unknown parent branch $parent")
    val pins = tables.flatMap(t => pinOf(parent, t).map(t -> _)).toMap
    val info = BranchInfo(name, parent, pins, System.currentTimeMillis())
    Files.createDirectories(branchDir)
    Files.write(branchFile(name), infoJson(info).getBytes(StandardCharsets.UTF_8))
    info
  }

  def listBranches(): Seq[String] =
    "main" +: (SnapshotStore
                 .listDir(branchDir)
                 .map(_.getFileName.toString)
                 .filter(_.endsWith(".json"))
                 .map(_.stripSuffix(".json"))
                   .sorted)

  def deleteBranch(name: String): Boolean = {
    require(name != "main", "cannot delete main")
    Files.deleteIfExists(branchFile(name))
  }

  def branchInfo(name: String): BranchInfo = {
    require(name != "main", "main has no pin file; read tables directly")
    parseInfo(new String(Files.readAllBytes(branchFile(name)), StandardCharsets.UTF_8))
  }

  private def pinOf(branch: String, table: String): Option[Int] =
    if (branch == "main") store.currentVersion(table)
    else branchInfo(branch).pins.get(table)

  /** Read a table as the branch sees it. */
  def load(branch: String, table: String): DataFrame =
    pinOf(branch, table) match {
      case Some(v) => store.loadVersion(table, v)
      case None => sys.error(s"branch $branch has no pin for $table")
    }

  /** Commit to a branch: data is written as a new (unpublished) snapshot
    * version; only the branch's pin moves. `main`'s live pointer is
    * untouched, so concurrent branch writers are fully isolated.
    */
  def commitToBranch(branch: String, table: String, df: DataFrame, message: String): Int = {
    if (branch == "main") return store.commit(df, table, message)
    val v = store.writeUnpublished(df, table, s"[$branch] $message")
    val info = branchInfo(branch)
    val updated = info.copy(pins = info.pins + (table -> v))
    Files.write(branchFile(branch), infoJson(updated).getBytes(StandardCharsets.UTF_8))
    v
  }

  /** Merge one table of `source` into `target` by uuid. Source-only rows
    * are added; rows present on both sides with differing content are
    * conflicts, resolved per `strategy`:
    *  - "auto":      incoming (source) row wins (:551-572)
    *  - "timestamp": the row with the later `created_at` wins (:592-613)
    *  - "priority":  the row with the higher `priority` column wins
    *                 (:615-636); falls back to source when absent
    *  - "manual":    target rows kept; conflicts reported unresolved
    *                 (:574-590 — flagged for human resolution)
    */
  def mergeBranch(
      source: String,
      target: String = "main",
      table: String = "edges",
      strategy: String = "auto",
  ): MergeResult = {
    require(Set("auto", "timestamp", "priority", "manual").contains(strategy), s"unknown merge strategy: $strategy")
    val src = load(source, table)
    val tgt = load(target, table)
    val fingerprint = (df: DataFrame) =>
      xxhash64(df.columns.sorted.map(c => to_json(struct(col(c)))): _*)
    val s = src.withColumn("__h", fingerprint(src))
    val t = tgt.withColumn("__h", fingerprint(tgt))
    val sKeyed = s.select(col("uuid").as("__u"), col("__h").as("__hs"))
    val tKeyed = t.select(col("uuid").as("__u"), col("__h").as("__ht"))
    val common = sKeyed.join(tKeyed, Seq("__u"))
    val conflictIds = common.filter(col("__hs") =!= col("__ht")).select(col("__u")).localCheckpoint()
    val nConflicts = conflictIds.count()

    val srcOnly = s.join(tKeyed, s("uuid") === tKeyed("__u"), "left_anti").drop("__h")
    val nAdded = srcOnly.count()

    val (winners, nResolved): (DataFrame, Long) = strategy match {
      case "manual" => (tgt.join(conflictIds, tgt("uuid") === conflictIds("__u"), "left_semi"), 0L)
      case "auto" =>
        (src.join(conflictIds, src("uuid") === conflictIds("__u"), "left_semi"), nConflicts)
      case "timestamp" =>
        // BOTH schemas must carry the column (a branch pinned before a
        // schema migration may lack it) — else fall back to source-wins
        if (!src.columns.contains("created_at") || !tgt.columns.contains("created_at"))
          (src.join(conflictIds, src("uuid") === conflictIds("__u"), "left_semi"), nConflicts)
        else
          (resolveByColumn(src, tgt, conflictIds, "created_at"), nConflicts)
      case "priority" =>
        if (!src.columns.contains("priority") || !tgt.columns.contains("priority"))
          (src.join(conflictIds, src("uuid") === conflictIds("__u"), "left_semi"), nConflicts)
        else
          (resolveByColumn(src, tgt, conflictIds, "priority"), nConflicts)
    }
    val untouchedTgt = tgt.join(conflictIds, tgt("uuid") === conflictIds("__u"), "left_anti")
    // allowMissingColumns: a schema-migrated side may carry columns the
    // other side's pinned snapshot predates — its rows take nulls there
    val merged = untouchedTgt
      .unionByName(winners, allowMissingColumns = true)
      .unionByName(srcOnly, allowMissingColumns = true)
    commitToBranch(target, table, merged, s"merge $source into $target ($strategy)")
    MergeResult(table, nAdded, nConflicts, nResolved)
  }

  /** One winner row per conflict uuid by the higher `byCol` value,
    * NULL-SAFE: a plain `__sc >= __tc` is null when either side is null,
    * which both `filter(c)` and `filter(!c)` exclude — the conflict row
    * would vanish from the merged table entirely. Rule: both non-null →
    * later/higher wins (ties → source); exactly one non-null → it wins;
    * both null → source (incoming) wins, consistent with "auto".
    */
  private def resolveByColumn(src: DataFrame, tgt: DataFrame, conflictIds: DataFrame, byCol: String): DataFrame = {
    val sj = src.join(conflictIds, src("uuid") === conflictIds("__u"), "left_semi")
    val tj = tgt.join(conflictIds, tgt("uuid") === conflictIds("__u"), "left_semi")
    val srcWins = when(col("__sc").isNotNull && col("__tc").isNotNull, col("__sc") >= col("__tc"))
      .when(col("__sc").isNotNull, lit(true))
      .when(col("__tc").isNotNull, lit(false))
      .otherwise(lit(true))
    val cmp = sj
      .select(col("uuid"), col(byCol).as("__sc"))
      .join(tj.select(col("uuid"), col(byCol).as("__tc")), Seq("uuid"))
      .select(col("uuid"), srcWins.as("__srcWins"))
    sj.join(cmp.filter(col("__srcWins")).select("uuid"), Seq("uuid"), "left_semi")
      .unionByName(tj.join(cmp.filter(!col("__srcWins")).select("uuid"), Seq("uuid"), "left_semi"))
  }

  // ---------------- optimistic locking + transactions ----------------

  /** True iff the table snapshot is still at the expected version
    * (check_version_conflict, :443-459).
    */
  def checkVersion(table: String, expectedVersion: Int): Boolean =
    store.currentVersion(table).contains(expectedVersion)

  /** Version-CAS commit: fails with ConcurrentModificationException when
    * another writer advanced the table since `expectedVersion` was read
    * (apply_with_lock, :461-493).
    */
  def commitWithLock(df: DataFrame, table: String, message: String, expectedVersion: Int): Int =
    store.synchronized {
      if (!checkVersion(table, expectedVersion))
        throw new java.util.ConcurrentModificationException(
          s"$table moved past v$expectedVersion (now ${store.currentVersion(table)})",
        )
      store.commit(df, table, message)
    }

  /** Buffered multi-table transaction: writes are staged as unpublished
    * versions at commit time and ALL pointers are published only after
    * every write succeeded (begin/commit/rollback_transaction, :664-793).
    */
  final class Txn private[Branches] () {
    private val buffer = scala.collection.mutable.LinkedHashMap.empty[String, DataFrame]
    private var done = false

    def write(table: String, df: DataFrame): Unit = {
      require(!done, "transaction already finished")
      buffer(table) = df
    }

    /** Stage all writes, then flip every pointer. Returns table→version. */
    def commit(message: String): Map[String, Int] = {
      require(!done, "transaction already finished")
      val staged = buffer.map { case (t, df) => t -> store.writeUnpublished(df, t, message) }.toMap
      staged.foreach { case (t, v) => store.publishVersion(t, v) }
      done = true
      txnClosed()
      staged
    }

    def rollback(): Unit = { if (!done) txnClosed(); buffer.clear(); done = true }
  }

  def beginTransaction(): Txn = { openTxns.incrementAndGet(); new Txn() }

  private val openTxns = new java.util.concurrent.atomic.AtomicInteger(0)
  private[io] def txnClosed(): Unit = openTxns.decrementAndGet()

  /** get_concurrency_stats (concurrency_manager.py:832-860 via
    * huggingface_driver.py:1949-1957): one row per branch (main included)
    * with its pin count and creation time, plus the open-transaction and
    * branch totals on every row.
    */
  def concurrencyStats(): DataFrame = {
    val spark = store.spark
    import spark.implicits._
    val names = listBranches()
    val rows = names.map {
      case "main" => ("main", "", 0L, store.tables.size)
      case b =>
        val i = branchInfo(b)
        (i.name, i.parent, i.createdAt, i.pins.size)
    }
    rows
      .map { case (n, p, c, pins) => (n, p, c, pins, openTxns.get(), names.size) }
      .toDF("branch", "parent", "created_at", "pinned_tables", "active_transactions", "total_branches")
  }

  // ---------------- json helpers ----------------

  private def infoJson(i: BranchInfo): String = {
    val pins = i.pins.toSeq.sorted.map { case (t, v) => s""""$t":$v""" }.mkString(",")
    s"""{"name":"${i.name}","parent":"${i.parent}","created_at":${i.createdAt},"pins":{$pins}}"""
  }

  private def parseInfo(s: String): BranchInfo = {
    val name = """"name":"([^"]+)"""".r.findFirstMatchIn(s).get.group(1)
    val parent = """"parent":"([^"]+)"""".r.findFirstMatchIn(s).get.group(1)
    val created = """"created_at":(\d+)""".r.findFirstMatchIn(s).get.group(1).toLong
    val pins = """"([a-z_0-9]+)":(\d+)""".r
      .findAllMatchIn(s.substring(s.indexOf("\"pins\"")))
      .map(m => m.group(1) -> m.group(2).toInt)
      .toMap
    BranchInfo(name, parent, pins, created)
  }
}
