package graft.search

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.io.{DeltaLog, SnapshotStore}
import org.apache.spark.sql.functions._

/** Index persistence / lifecycle parity surface over the snapshot store —
  * the re-expression of the reference's optimizer persistence API
  * (`save_index`/`load_index`, performance_optimizer.py:921-1106;
  * `index_versioning` create/rollback/list, :1223-1340;
  * `cleanup_unused_indices`, :1356-1426). The store's versioned commits
  * already give every index durable, rollback-able versions; this facade
  * adds (a) export/import of a SPECIFIC index family to/from a plain
  * directory (the pickle/faiss-file analog, as parquet), (b) per-index
  * version listing + restore, and (c) a retention sweep that deletes only
  * version directories provably unreachable: never the current version,
  * never a version whose files a live manifest references (bucketed
  * tables carry untouched buckets by reference into older `v=` dirs),
  * never a branch-pinned version or anything IT references, and never a
  * live delta-log segment.
  */
object IndexLifecycle {

  val Kinds: Seq[String] = Seq("text", "vector", "graph", "temporal")

  /** Member tables of an index family (the reference's index_type). */
  def indexTables(kind: String): Seq[String] = kind match {
    case "text" =>
      SearchIndexes.TextSurfaces.flatMap { case (t, _, _) => Seq(s"${t}_postings", s"${t}_bm25stats") }
    case "vector" => Seq("edge_ann")
    case "graph" => Seq("graph_adj", "graph_degrees")
    case "temporal" => Seq("edge_months")
    case "all" => Kinds.flatMap(indexTables)
    case other =>
      throw new IllegalArgumentException(s"Unknown index type: $other (text|vector|graph|temporal|all)")
  }

  /** (merge key, bucketBy) restoring each bucketed index table's probe
    * layout on import — an index imported as a plain commit would lose
    * manifest-addressed bucket pruning (loadForKeys degrades to a scan).
    * None = tiny stats table, plain commit.
    */
  private def layout(table: String): Option[(Seq[String], Seq[String])] =
    if (table.endsWith("_postings")) Some((Seq("term", "id"), Seq("term")))
    else table match {
      case "edge_ann" => Some((Seq("sig", "uuid"), Seq("sig")))
      case "graph_adj" => Some((Seq("src", "dst"), Seq("src")))
      case "graph_degrees" => Some((Seq("node"), Seq("node")))
      case "edge_months" => Some((Seq("month", "uuid"), Seq("month")))
      case _ => None
    }

  /** Export the index family's CURRENT state to `destDir` as parquet —
    * one subdir per table, `<table>__delta` for a live refresh log, and
    * `_export.json` with row counts + the ANN signature width (so an
    * import re-stamps `planes=N` and the width gate keeps holding).
    * Read-only on the store. Returns table → exported rows.
    */
  def exportIndex(store: SnapshotStore, kind: String, destDir: String): Map[String, Long] = {
    val dest = Paths.get(destDir)
    Files.createDirectories(dest)
    val spark = store.spark
    val counts = for (t <- indexTables(kind) if store.exists(t)) yield {
      store.load(t).write.mode("overwrite").parquet(dest.resolve(t).toString)
      DeltaLog.logFrame(store, t).foreach { log =>
        log.write.mode("overwrite").parquet(dest.resolve(s"${t}__delta").toString)
      }
      // row count from the written footers (metadata-only count)
      t -> spark.read.parquet(dest.resolve(t).toString).count()
    }
    val planes = SearchIndexes.storedAnnPlanes(store).getOrElse(SearchIndexes.annPlanes)
    val tablesJson = counts.map { case (t, n) => s""""$t":$n""" }.mkString(",")
    val meta = s"""{"kind":"$kind","ann_planes":$planes,"tables":{$tablesJson}}"""
    Files.write(dest.resolve("_export.json"), meta.getBytes(StandardCharsets.UTF_8))
    counts.toMap
  }

  /** Import an exported index family from `srcDir`, REPLACING the store's
    * current state of each exported table (rows present in the store but
    * absent from the export are deleted — import is a restore, not a
    * union). Bucketed tables are rebuilt under their probe layout; a live
    * refresh log is re-committed after a clear marker so probe-time
    * reconciliation resumes exactly. Returns table → imported rows.
    */
  def importIndex(store: SnapshotStore, kind: String, srcDir: String): Map[String, Long] = {
    val src = Paths.get(srcDir)
    require(Files.isDirectory(src), s"no export at $srcDir")
    val spark = store.spark
    val planes: Option[Int] = {
      val p = src.resolve("_export.json")
      if (!Files.exists(p)) None
      else """"ann_planes":(\d+)""".r
        .findFirstMatchIn(new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
        .map(_.group(1).toInt)
    }
    val counts = for (t <- indexTables(kind) if Files.isDirectory(src.resolve(t))) yield {
      val df = spark.read.parquet(src.resolve(t).toString)
      val msg =
        if (t == "edge_ann") s"ANN signature buckets planes=${planes.getOrElse(SearchIndexes.annPlanes)} (imported)"
        else s"imported $kind index"
      layout(t) match {
        case Some((key, bby)) =>
          // replace semantics: same-key rows overwritten by the import,
          // store-only keys deleted (keyed — version history is kept)
          val gone =
            if (!store.exists(t)) None
            else Some(store.load(t).select(key.map(col): _*).join(df, key, "left_anti"))
          store.mergeBucketed(t, df, key, msg, deleteKeys = gone, bucketBy = bby)
        case None => store.commit(df, t, msg)
      }
      val dt = DeltaLog.deltaTable(t)
      if (store.exists(dt)) DeltaLog.clear(store, t)
      val ddir = src.resolve(s"${t}__delta")
      if (Files.isDirectory(ddir))
        store.commit(spark.read.parquet(ddir.toString), dt, "imported refresh log")
      t -> df.count()
    }
    counts.toMap
  }

  /** Per-table (current version, all versions) of an index family —
    * `index_versioning('list_versions')`.
    */
  def listIndexVersions(store: SnapshotStore, kind: String = "all"): Map[String, (Int, Seq[Int])] =
    indexTables(kind).flatMap { t =>
      store.currentVersion(t).map(cur => t -> (cur, store.versions(t)))
    }.toMap

  /** Re-point one index table at an older committed version —
    * `index_versioning('rollback')`, but targeted (the reference rolls
    * back to max−1 blindly). The abandoned newer versions stay on disk
    * until the retention sweep, which is the "backup" the reference
    * creates explicitly.
    */
  def restoreIndexVersion(store: SnapshotStore, table: String, version: Int): Unit = {
    require(
      indexTables("all").contains(table) || table.endsWith("_delta"),
      s"$table is not an index table — rollback primaries via store.rollback directly",
    )
    store.rollback(table, version)
  }

  final case class CleanupResult(removedVersions: Map[String, Seq[Int]], freedBytes: Long)

  /** Retention sweep over index version directories
    * (`cleanup_unused_indices(retention_days)`): deletes a version only
    * when ALL hold —
    *  - it is not the current version (older OR newer — post-rollback
    *    orphans above the current version sweep under the same rules);
    *  - no SURVIVING version's manifest references its files. Survivors
    *    are the current version, branch-pinned versions, versions still
    *    within retention, and anything a survivor references — computed
    *    as a FIXPOINT, so a restore target that survives the sweep always
    *    finds the bucket files its manifest carries by reference (a
    *    current-and-pins-only reachable set could delete a directory an
    *    older-but-surviving version still points into);
    *  - it is not a live delta-log segment (appends since the last
    *    compaction marker — those reconcile into every probe);
    *  - for `edge_ann`, it is not the newest `planes=N`-stamped version —
    *    the width gate ([[SearchIndexes.storedAnnPlanes]]) resolves from
    *    that commit's message; sweeping it would silently disable the
    *    fail-fast on width mismatch;
    *  - its commit is older than the retention cutoff.
    * Primaries (nodes/edges/…) are untouched — indexes only.
    */
  def cleanupIndexVersions(
      store: SnapshotStore,
      retentionDays: Int = 30,
      now: Long = System.currentTimeMillis(),
  ): CleanupResult = {
    val cutoff = now - retentionDays * 86400000L
    // branch pins: any branch may pin any table at any version
    val branches = new graft.io.Branches(store)
    val pins: Seq[Map[String, Int]] =
      branches.listBranches().filter(_ != "main").map(b => branches.branchInfo(b).pins)
    val all = indexTables("all")
    val sweepTables = (all ++ all.map(DeltaLog.deltaTable)).filter(store.exists)
    var freed = 0L
    val removed = for (t <- sweepTables) yield {
      val cur = store.currentVersion(t).get
      val vs = store.versions(t)
      val base: Set[Int] =
        store.referencedVersions(t, cur) ++
          pins.flatMap(_.get(t)).flatMap(v => store.referencedVersions(t, v)) ++
          (if (t.endsWith("_delta")) DeltaLog.liveVersions(store, t) else Nil) ++
          (if (t == "edge_ann") SearchIndexes.annStampVersion(store).toSet else Set.empty[Int])
      // fixpoint: every version that SURVIVES (current, reachable so far,
      // or not provably past retention) protects the versions its own
      // manifest references — iterate until the reachable set is stable
      @annotation.tailrec
      def expand(reach: Set[Int]): Set[Int] = {
        val survivors = vs.filter(v => v == cur || reach.contains(v) || store.commitTime(t, v).forall(_ >= cutoff))
        val next = base ++ survivors.flatMap(v => store.referencedVersions(t, v))
        if (next == reach) next else expand(next)
      }
      val reachable = expand(base)
      val victims = vs.filter { v =>
        v != cur && !reachable.contains(v) && store.commitTime(t, v).exists(_ < cutoff)
      }
      victims.foreach(v => freed += store.deleteVersion(t, v))
      t -> victims
    }
    CleanupResult(removed.filter(_._2.nonEmpty).toMap, freed)
  }
}
