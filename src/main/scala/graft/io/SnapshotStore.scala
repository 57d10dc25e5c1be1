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

  import SnapshotStore.listDir

  private def tableDir(table: String): Path = Paths.get(root, table)
  private def latestFile(table: String): Path = tableDir(table).resolve("_LATEST")

  def currentVersion(table: String): Option[Int] =
    if (Files.exists(latestFile(table)))
      Some(new String(Files.readAllBytes(latestFile(table)), StandardCharsets.UTF_8).trim.toInt)
    else None

  def versions(table: String): Seq[Int] =
    listDir(tableDir(table))
      .map(_.getFileName.toString)
      .filter(_.startsWith("v="))
      .map(_.stripPrefix("v=").toInt)
      .sorted

  def exists(table: String): Boolean = currentVersion(table).isDefined

  /** Every published table under this store (directories with a _LATEST). */
  def tables: Seq[String] =
    listDir(Paths.get(root))
      .filter(p => Files.isDirectory(p) && Files.exists(p.resolve("_LATEST")))
      .map(_.getFileName.toString)
      .sorted

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

  /** Write `df` as a new snapshot version WITHOUT moving the live
    * pointer — branch commits and staged transaction writes (Branches).
    * Returns the version; readers of `load` never see it until
    * [[publishVersion]].
    */
  def writeUnpublished(df: DataFrame, table: String, message: String): Int = {
    val next = versions(table).lastOption.getOrElse(-1) + 1
    val dir = tableDir(table).resolve(s"v=$next")
    df.write.mode("overwrite").parquet(dir.toString)
    val partCounts = partitionRowCounts(dir)
    val commitJson =
      s"""{"version":$next,"message":${jstr(message)},"fingerprint":"",
         |"rows":${partCounts.map(_._2).sum},"unpublished":true,
         |"committed_at":${System.currentTimeMillis()}}""".stripMargin
    Files.write(dir.resolve("_commit.json"), commitJson.getBytes(StandardCharsets.UTF_8))
    next
  }

  /** Flip the live pointer to an already-written version. */
  def publishVersion(table: String, version: Int): Unit = {
    require(versions(table).contains(version), s"unknown version $version of $table")
    publish(table, version)
  }

  /** Row count per written part file, from parquet footers (no data read).
    * Footers are read CONCURRENTLY at the session's parallelism: this runs
    * on the driver after every commit, and reading dozens of bucket files
    * serially was measurable fixed serial time that Amdahl-capped the
    * 1→4-core scaling run (the 4-core level pays fixed driver work 4×
    * proportionally). Pool width tracks defaultParallelism so the
    * emulated "cluster size" bounds it like any executor-side work.
    */
  private def partitionRowCounts(dir: Path): Seq[(String, Long)] =
    footerCounts(listDir(dir)).map { case (p, n) => p.getFileName.toString.split("-")(1) -> n }

  /** (path, row count) per parquet part file, footer metadata only, read
    * CONCURRENTLY at the session's parallelism — pool width tracks
    * defaultParallelism so the emulated "cluster size" bounds this like
    * any executor-side work.
    */
  private def footerCounts(files: Seq[Path]): Seq[(Path, Long)] = {
    val conf = spark.sessionState.newHadoopConf()
    val parts = files
      .filter(p => p.getFileName.toString.startsWith("part-") && p.getFileName.toString.endsWith(".parquet"))
      .sortBy(_.getFileName.toString)
    def countOf(p: Path): (Path, Long) = {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(p.toUri), conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try p -> reader.getRecordCount
      finally reader.close()
    }
    if (parts.sizeIs <= 2) parts.map(countOf)
    else {
      val pool = java.util.concurrent.Executors
        .newFixedThreadPool(math.max(1, spark.sparkContext.defaultParallelism))
      try {
        import scala.jdk.CollectionConverters._
        pool
          .invokeAll(parts.map(p => ((() => countOf(p)): java.util.concurrent.Callable[(Path, Long)])).asJava)
          .asScala
          .toSeq
          .map(_.get())
      } finally pool.shutdown()
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
    readManifest(table, version) match {
      case Some(m) =>
        // bucketed snapshot: assemble the manifest-referenced bucket dirs
        // (carried buckets live in OLDER version dirs — zero-copy reuse),
        // then apply the delta chain (merge-on-read: each delta's updates
        // replace all same-key rows of everything before it, its delete
        // keys drop rows without re-inserting)
        val dirs = m.buckets.toSeq.sortBy(_._1).map { case (b, (v, _)) =>
          tableDir(table).resolve(s"v=$v").resolve(s"__bucket=$b").toString
        }
        // mergeSchema only when the manifest records heterogeneous bucket
        // schemas: a keyed merge may WIDEN the schema (e.g. a point
        // mutation adding a flag column) — its rewritten buckets then carry
        // more columns than the carried ones, and the default
        // first-file-wins parquet schema would silently drop the new
        // column. The uniform-schema common case skips the footer sweep.
        val base =
          if (dirs.nonEmpty) bucketRead(m).parquet(dirs: _*)
          else if (m.deltas.nonEmpty) spark.read.parquet(deltaUpdatesDir(table, m.deltas.head._1).toString).limit(0)
          else spark.emptyDataFrame
        applyDeltas(table, m, base)
      case None =>
        spark.read.parquet(tableDir(table).resolve(s"v=$version").toString)
    }

  private def deltaUpdatesDir(table: String, version: Int): Path =
    tableDir(table).resolve(s"v=$version").resolve("__delta_updates")
  private def deltaDeletesDir(table: String, version: Int): Path =
    tableDir(table).resolve(s"v=$version").resolve("__delta_deletes")

  /** Fold a manifest's delta chain over `base` in version order. */
  private def applyDeltas(table: String, m: Manifest, base: DataFrame): DataFrame =
    if (m.deltas.isEmpty) base
    else
      m.deltas.foldLeft(base) { case (acc, (dv, _)) =>
        val up = spark.read.parquet(deltaUpdatesDir(table, dv).toString)
        val delDir = deltaDeletesDir(table, dv)
        val upKeys = up.select(m.deltaKey.map(col): _*).distinct()
        val touched =
          if (Files.exists(delDir))
            upKeys.unionByName(spark.read.parquet(delDir.toString).select(m.deltaKey.map(col): _*)).distinct()
          else upKeys
        acc
          .join(broadcast(touched), m.deltaKey, "left_anti")
          .unionByName(up, allowMissingColumns = true)
      }

  /** Index-probe read: rows of `table` whose `keyCols` values appear in
    * `keys`. On a bucketed table this reads ONLY the hash buckets the keys
    * fall in (manifest-addressed partition pruning) — an index probe, not
    * a scan; `keyCols` must equal the table's bucketBy columns. On a plain
    * table it degrades to scan + semi-join.
    */
  def loadForKeys(table: String, keys: DataFrame, keyCols: Seq[String]): DataFrame = {
    val v = currentVersion(table).getOrElse(sys.error(s"no committed snapshot for $table"))
    readManifest(table, v) match {
      case Some(m) =>
        val wanted = keys
          .select(keyCols.map(col): _*)
          .distinct()
          .withColumn("__bucket", bucketExpr(keyCols, m.numBuckets))
        val buckets = wanted.select(col("__bucket")).distinct().collect().map(_.getInt(0)).toSet
        val dirs = m.buckets.collect {
          case (b, (ver, _)) if buckets.contains(b) =>
            tableDir(table).resolve(s"v=$ver").resolve(s"__bucket=$b").toString
        }.toSeq
        if (dirs.isEmpty && m.deltas.isEmpty) load(table).limit(0)
        else {
          val base =
            if (dirs.isEmpty) spark.read.parquet(deltaUpdatesDir(table, m.deltas.head._1).toString).limit(0)
            // mergeSchema only when bucket schemas are heterogeneous
            else bucketRead(m).parquet(dirs: _*)
          // delta chain applies by the MATCH key before the probe filter
          // (the chain is small — bounded by compaction)
          applyDeltas(table, m, base)
            .join(broadcast(wanted.drop("__bucket")), keyCols, "left_semi")
        }
      case None =>
        load(table).join(broadcast(keys.select(keyCols.map(col): _*).distinct()), keyCols, "left_semi")
    }
  }

  /** Measured read footprint of a [[loadForKeys]] probe — the flat-cost
    * evidence for the scale story: `probed*` is what the probe READS
    * (manifest-addressed bucket dirs for the keys' hash buckets, plus the
    * live delta chain every probe reconciles), `total*` the whole table.
    * Probe cost is bounded by keys × (corpus / numBuckets): ∝ touched
    * keys once the bucket count scales with the corpus, never ∝ corpus.
    */
  def probeFootprint(table: String, keys: DataFrame, keyCols: Seq[String]): SnapshotStore.ProbeFootprint = {
    val v = currentVersion(table).getOrElse(sys.error(s"no committed snapshot for $table"))
    val m = readManifest(table, v).getOrElse(sys.error(s"$table is not bucketed — footprint = full scan"))
    val probed = keys
      .select(keyCols.map(col): _*)
      .distinct()
      .select(bucketExpr(keyCols, m.numBuckets).as("__bucket"))
      .distinct()
      .collect()
      .map(_.getInt(0))
      .toSet
    def stats(dirs: Seq[Path]): (Long, Long) = {
      var files = 0L
      var bytes = 0L
      dirs.foreach { d =>
        if (Files.isDirectory(d)) {
          val walk = Files.walk(d)
          try walk.forEach { p =>
            if (p.toString.endsWith(".parquet")) { files += 1; bytes += Files.size(p) }
          } finally walk.close()
        }
      }
      (files, bytes)
    }
    val bucketDirs = m.buckets.toSeq.map { case (b, (ver, _)) =>
      b -> tableDir(table).resolve(s"v=$ver").resolve(s"__bucket=$b")
    }
    val deltaDirs = m.deltas.flatMap { case (dv, _) =>
      Seq(deltaUpdatesDir(table, dv), deltaDeletesDir(table, dv))
    }
    val (df, db) = stats(deltaDirs)
    val (tf, tb) = stats(bucketDirs.map(_._2))
    val (pf, pb) = stats(bucketDirs.collect { case (b, d) if probed.contains(b) => d })
    SnapshotStore.ProbeFootprint(
      probedBuckets = bucketDirs.count(bd => probed.contains(bd._1)),
      totalBuckets = m.buckets.size,
      probedFiles = pf + df,
      totalFiles = tf + df,
      probedBytes = pb + db,
      totalBytes = tb + db,
    )
  }

  /** Row count of the current snapshot from COMMIT METADATA only (manifest
    * bucket counts + delta-chain rows, or the plain commit's recorded
    * rows) — no Spark job. Update-delta rows overcount replacements and
    * tombstones are not subtracted, so this is an upper-bound approximation
    * between compactions; exact after any full (re)write. None when the
    * table is absent or the version predates row recording.
    */
  def approxRowCount(table: String): Option[Long] =
    currentVersion(table).flatMap { v =>
      readManifest(table, v) match {
        case Some(m) => Some(m.buckets.valuesIterator.map(_._2).sum + m.deltas.map(_._2).sum)
        case None => """"rows":(\d+)""".r.findFirstMatchIn(commitInfo(table, v)).map(_.group(1).toLong)
      }
    }

  /** Re-point the table at an older snapshot (time travel / rollback). */
  def rollback(table: String, version: Int): Unit = {
    require(versions(table).contains(version), s"unknown version $version of $table")
    publish(table, version)
  }

  /** Versions whose FILES the given snapshot references: itself, the
    * manifest's bucket owners (buckets carried by reference live in older
    * `v=` dirs), and the merge-on-read delta chain. The reachability set a
    * retention sweep must never delete (IndexLifecycle.cleanupIndexVersions).
    */
  def referencedVersions(table: String, version: Int): Set[Int] =
    readManifest(table, version) match {
      case Some(m) => m.buckets.valuesIterator.map(_._1).toSet ++ m.deltas.map(_._1).toSet + version
      case None => Set(version)
    }

  /** Commit wall-clock millis of a version (from its _commit.json). */
  def commitTime(table: String, version: Int): Option[Long] =
    """"committed_at":(\d+)""".r.findFirstMatchIn(commitInfo(table, version)).map(_.group(1).toLong)

  /** Column names of the current snapshot's newest bucket write, from the
    * MANIFEST alone (one driver-side file read — no parquet footer job).
    * None for plain tables or pre-upgrade manifests; callers needing
    * certainty then fall back to `load(table).columns`.
    */
  def manifestColumns(table: String): Option[Seq[String]] =
    currentVersion(table).flatMap(v => readManifest(table, v)).map(_.cols).filter(_.nonEmpty)

  /** Delete ONE version directory. Retention sweeps only — the caller
    * must have proven the version unreachable (no live manifest references
    * its files, no branch pins it). Refuses the current version. Returns
    * bytes freed.
    */
  def deleteVersion(table: String, version: Int): Long = {
    require(!currentVersion(table).contains(version), s"refusing to delete the CURRENT version $version of $table")
    val dir = tableDir(table).resolve(s"v=$version")
    if (!Files.isDirectory(dir)) return 0L
    var freed = 0L
    val walk = Files.walk(dir)
    try
      walk.sorted(java.util.Comparator.reverseOrder()).forEach { p =>
        if (Files.isRegularFile(p)) freed += Files.size(p)
        Files.deleteIfExists(p)
        ()
      }
    finally walk.close()
    freed
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
    *
    * NOTE: rewrites the WHOLE table per merge — fine for small tables and
    * bulk rebuilds; incremental micro-batches should use [[mergeBucketed]]
    * (work ∝ touched buckets, not corpus).
    */
  def merge(table: String, updates: DataFrame, key: Seq[String], message: String): Int = {
    val merged =
      if (!exists(table)) updates
      else load(table).join(updates.select(key.map(col): _*), key, "left_anti").unionByName(updates)
    commit(merged, table, message)
  }

  // ------------------------------------------------------------------
  // Bucketed merge-on-read: hash-bucket layout + per-version manifest
  // ------------------------------------------------------------------

  /** Default bucket count for bucketed tables. Sized for the test corpus
    * so a scattered-key probe (a batch's ~10² contention keys hash
    * uniformly) still prunes most buckets; at 100 TB size it so one
    * bucket ≈ one executor task's comfortable input (e.g. 2^15–2^17
    * buckets — selectivity scales the same way).
    */
  /** Hash-bucket count for NEWLY bucketed tables (`-Dgraft.buckets`,
    * default 64 — the small-SF test granularity). At corpus scale set
    * 2^15+ so a keyed probe's cost, keys × (corpus / buckets), stays ∝
    * touched keys (measured: [[probeFootprint]] / Bench probe_flat_cost).
    * An EXISTING table keeps the count its manifest records — probes
    * always hash at the stored count — and a merge under a different
    * knob value triggers the one-time full re-bucketing fold
    * (mergeBucketed's layout-change path), never a silent mixed layout.
    */
  def DefaultBuckets: Int = Integer.getInteger("graft.buckets", 64)

  /** Bucket id of a key — pmod(murmur3(key), n), EXACTLY the expression
    * Spark's `HashPartitioning` evaluates for `repartition(n, key)`. The
    * equality is load-bearing twice over (guide §2.4: operations keyed the
    * same way share one exchange): (1) the bucketed write repartitions by
    * the RAW key columns and partition i holds exactly bucket i — one
    * bucket per write task by construction, no bucket-id re-hash collisions
    * (the previous xxhash64 bucket expr needed a preimage table to spread
    * bucket ids over tasks); (2) a builder that pre-partitions its input by
    * the bucket columns (`repartition(numBuckets, bCols)`) satisfies the
    * clustering requirement of any aggregate/distinct keyed on a SUPERSET
    * of those columns, so the aggregate and the bucketed write ride the
    * same single exchange (`prePartitioned` below).
    */
  private def bucketExpr(key: Seq[String], numBuckets: Int) =
    pmod(hash(key.map(col): _*), lit(numBuckets)).cast("int")

  /** Bucketed key-based upsert — the merge-on-read analog of an Iceberg
    * `bucket(key)` partition layout. The table's rows live in `numBuckets`
    * hash buckets of `key`; a merge rewrites ONLY the buckets containing
    * affected keys and carries every other bucket forward by MANIFEST
    * REFERENCE (`_manifest.json`: bucket → version that owns its files) —
    * zero data copied for untouched buckets. Work per merge ∝ batch size +
    * size of touched buckets, not corpus size — the scale-safe shape for
    * micro-batch ingest (the reference's incremental deltas,
    * incremental_updater.py:94-388, against a 10^12-doc corpus).
    *
    * Same replace-by-key semantics as [[merge]] (key may be non-unique:
    * all old rows with a matching key are replaced by the update rows).
    * `deleteKeys` additionally removes old rows whose key matches without
    * re-inserting (for cascade deletes inside touched buckets).
    */
  def mergeBucketed(
      table: String,
      updates: DataFrame,
      key: Seq[String],
      message: String,
      numBuckets: Int = DefaultBuckets,
      deleteKeys: Option[DataFrame] = None,
      bucketBy: Seq[String] = Nil,
      fingerprint: String = "",
      // caller asserts `updates` is ALREADY partitioned as
      // HashPartitioning(bucket cols, numBuckets) — e.g. it ran
      // `repartition(numBuckets, bCols)` so an upstream aggregate could
      // share the exchange — and a FIRST build then writes without its own
      // repartition (partition i already holds exactly bucket i). Safe by
      // construction even if the assertion is wrong: bucket dirs come from
      // the __bucket COLUMN, so a mispartitioned input only writes more
      // files per bucket, never wrong data. Ignored when a prior version
      // exists (those paths stage/fold and repartition anyway).
      prePartitioned: Boolean = false,
  ): Int = {
    // bucketBy (default = key) may be a SUBSET of the match key: rows with
    // equal match keys then still colocate, and the table is additionally
    // probe-able by the bucketBy prefix alone (loadForKeys)
    val bCols = if (bucketBy.nonEmpty) bucketBy else key
    val prev = currentVersion(table)
    val prevManifest = prev
      .flatMap(v => readManifest(table, v))
      // a bucket-count OR bucket-column change invalidates the hash layout
      // → full rewrite (affected-bucket pruning under the new hash would
      // miss the old rows' buckets and leave stale same-key rows behind)
      .filter(m => m.numBuckets == numBuckets && (m.bucketBy.isEmpty || m.bucketBy == bCols))

    // ---- WRITE-FIRST staging (guide §1.2: don't traverse `updates`
    // repeatedly). With a prior version, the old flow ran an
    // `updates.count()` (+ a deletes count) to pick delta-vs-rewrite,
    // then traversed the updates plan AGAIN for the write — and the
    // rewrite path two more times (affected-bucket set, replace-key
    // anti-join). Now the batch is materialized ONCE into a staging dir,
    // row counts come from the parquet FOOTERS (driver-side metadata, no
    // Spark job), and every later consumer reads the staged copy. First
    // builds (no prior version: nothing to decide, nothing carried) stay
    // single-traversal with no staging.
    var updatesSrc = updates
    var deleteSrc: Option[DataFrame] = deleteKeys.map(_.select(key.map(col): _*).distinct())
    var updRows = 0L
    var delRows = 0L
    val staging: Option[Path] =
      if (prev.isEmpty) None
      else {
        val st = tableDir(table).resolve(s"_staging_${java.util.UUID.randomUUID().toString.take(8)}")
        val updDir = st.resolve("updates")
        updates.write.mode("overwrite").parquet(updDir.toString)
        updRows = footerCounts(listDir(updDir)).map(_._2).sum
        updatesSrc = spark.read.parquet(updDir.toString)
        deleteSrc = deleteSrc.map { dk =>
          val delDir = st.resolve("deletes")
          dk.write.mode("overwrite").parquet(delDir.toString)
          delRows = footerCounts(listDir(delDir)).map(_._2).sum
          spark.read.parquet(delDir.toString)
        }
        Some(st)
      }
    def dropStaging(): Unit = staging.foreach { st =>
      if (Files.isDirectory(st)) {
        val s = Files.walk(st)
        try s.sorted(java.util.Comparator.reverseOrder()).forEach(p => Files.deleteIfExists(p))
        finally s.close()
      }
    }
    try {

    // ---- NO-OP short-circuit: an empty merge (0 updates, 0 deletes)
    // changes nothing — without this, recurring empty merges (e.g. a
    // batch with no duplicate pairs touching uuid_map) would each append
    // an empty delta, and every MaxDeltaChain-th one would trigger a full
    // O(corpus) compaction rewrite of a table nothing ever changed.
    if (prev.isDefined && updRows == 0 && delRows == 0) return prev.get

    // ---- DELTA path (merge-on-read): when the batch is small relative to
    // the base, append an update/tombstone delta instead of rewriting the
    // buckets its scattered keys hash into — per-bucket copy-on-write is
    // work ∝ corpus once a batch touches most buckets. Readers fold the
    // chain (loadVersion/loadForKeys); the chain is bounded: the next
    // overweight or long-chain merge folds everything (amortized
    // compaction — Iceberg's delete-file merge-on-read discipline).
    val baseRows = prevManifest.map(_.buckets.valuesIterator.map(_._2).sum).getOrElse(0L)
    val chainRows = prevManifest.map(_.deltas.map(_._2).sum).getOrElse(0L)
    val keyCompatible = prevManifest.exists(m => m.deltaKey.isEmpty || m.deltaKey == key)
    val chainLen = prevManifest.map(_.deltas.size).getOrElse(0)
    val asDelta =
      prevManifest.nonEmpty && keyCompatible && chainLen < MaxDeltaChain &&
        (updRows + delRows + chainRows) * 10 < baseRows
    if (asDelta) {
      val m = prevManifest.get
      val next = versions(table).lastOption.getOrElse(-1) + 1
      val dir = tableDir(table).resolve(s"v=$next")
      Files.createDirectories(dir)
      // batch-sized by the delta condition: fold the staged copy to one
      // file per dir (a tiny read-back job, not a re-traversal of the
      // caller's plan)
      updatesSrc.coalesce(1).write.mode("overwrite").parquet(deltaUpdatesDir(table, next).toString)
      deleteSrc.foreach(_.coalesce(1).write.mode("overwrite").parquet(deltaDeletesDir(table, next).toString))
      // bucket dirs unchanged by a delta append → schema flags carried
      val manifest = Manifest(numBuckets, m.buckets, m.deltas :+ (next -> updRows), key, bCols, m.cols, m.mixed)
      Files.write(dir.resolve("_manifest.json"), manifestJson(manifest).getBytes(StandardCharsets.UTF_8))
      val commitJson =
        s"""{"version":$next,"message":${jstr(message)},"fingerprint":${jstr(fingerprint)},
           |"rows_written":$updRows,"delete_keys":$delRows,"delta":true,
           |"delta_chain":${manifest.deltas.size},"total_buckets":${m.buckets.size},
           |"committed_at":${System.currentTimeMillis()}}""".stripMargin
      Files.write(dir.resolve("_commit.json"), commitJson.getBytes(StandardCharsets.UTF_8))
      publish(table, next)
      return next
    }

    // rewrite path: the affected-bucket set comes from ONE scan of the
    // (staged) batch — only paid on compaction-sized merges
    val affected: Set[Int] =
      if (prev.isEmpty) Set.empty
      else {
        def bucketsOf(df: DataFrame): Seq[Int] = df
          .select(bucketExpr(bCols, numBuckets).as("__bucket")).distinct()
          .collect().map(_.getInt(0)).toSeq
        (bucketsOf(updatesSrc) ++ deleteSrc.toSeq.flatMap(bucketsOf)).toSet
      }

    // legacy plain table (no manifest / re-bucketed) or a pending delta
    // chain: fold ALL existing rows (chain applied by loadVersion) into
    // this write once; subsequent merges are incremental again
    val legacyAll = prev.isDefined && (prevManifest.isEmpty || prevManifest.exists(_.deltas.nonEmpty))

    // previous rows of the affected buckets only (manifest-addressed dirs)
    val oldAffected: Option[DataFrame] =
      if (legacyAll) Some(load(table))
      else
        prevManifest.flatMap { m =>
          val dirs = m.buckets.collect {
            case (b, (v, _)) if affected.contains(b) =>
              tableDir(table).resolve(s"v=$v").resolve(s"__bucket=$b").toString
          }.toSeq
          // mergeSchema only when bucket schemas are heterogeneous
          if (dirs.isEmpty) None else Some(bucketRead(m).parquet(dirs: _*))
        }

    val keptOld = oldAffected.map { old =>
      val afterDel = deleteSrc match {
        case Some(dk) => old.join(dk, key, "left_anti")
        case None => old
      }
      afterDel.join(updatesSrc.select(key.map(col): _*).distinct(), key, "left_anti")
    }
    val merged = keptOld
      .map(_.unionByName(updatesSrc, allowMissingColumns = true))
      .getOrElse(updatesSrc)
      .withColumn("__bucket", bucketExpr(bCols, numBuckets))

    val next = versions(table).lastOption.getOrElse(-1) + 1
    val dir = tableDir(table).resolve(s"v=$next")
    // one task (→ one file) per bucket: without this, every task writes
    // every bucket dir (tasks × buckets files) and the driver's footer
    // metadata pass dominates the merge. Repartitioning by the RAW bucket
    // columns gives partition i == bucket i exactly (bucketExpr IS
    // HashPartitioning's partition-id expression — see its doc), so each
    // task owns exactly ONE bucket with no bucket-id re-hash collisions.
    // A prePartitioned first build skips the exchange outright: the
    // caller's plan already established this partitioning (guide §2.4).
    val toWrite =
      if (prePartitioned && prev.isEmpty) merged
      else merged.repartition(numBuckets, bCols.map(col): _*)
    toWrite
      .write
      .mode("overwrite")
      .partitionBy("__bucket")
      .parquet(dir.toString)
    // an all-empty result writes no bucket dirs; fall back to a PLAIN empty
    // snapshot (schema-preserving — a manifest with zero buckets would lose
    // the schema on load)
    if (bucketDirsIn(dir).isEmpty && (legacyAll || prevManifest.forall(m => m.buckets.forall { case (b, _) => affected.contains(b) }))) {
      merged.drop("__bucket").write.mode("overwrite").parquet(dir.toString)
      val commitJson =
        s"""{"version":$next,"message":${jstr(message)},"fingerprint":${jstr(fingerprint)},
           |"rows":0,"rewritten_buckets":${affected.size},"total_buckets":0,
           |"committed_at":${System.currentTimeMillis()}}""".stripMargin
      Files.write(dir.resolve("_commit.json"), commitJson.getBytes(StandardCharsets.UTF_8))
      publish(table, next)
      return next
    }

    // per-bucket row counts for the WRITTEN buckets from parquet FOOTERS
    // (metadata only, no recompute); carried buckets keep their recorded
    // counts — so total rows and per-bucket lineage cost O(touched), not
    // O(corpus)
    val written = bucketDirsIn(dir)
    // one concurrent footer pass over every written bucket's files (a
    // serial per-bucket × per-file loop here was driver-side fixed time
    // that capped the 1→4-core scaling efficiency)
    val filesByBucket = written.sorted.map(b => b -> listDir(dir.resolve(s"__bucket=$b")))
    val countsByPath = footerCounts(filesByBucket.flatMap(_._2)).toMap
    val writtenCounts = filesByBucket.map { case (b, files) =>
      b -> (next, files.flatMap(countsByPath.get).sum)
    }.toMap
    val carried: Map[Int, (Int, Long)] =
      if (legacyAll) Map.empty
      else prevManifest.map(_.buckets.filterNot { case (b, _) => affected.contains(b) }).getOrElse(Map.empty)
    // heterogeneous-schema tracking: a write that carries old buckets
    // alongside a WIDER (or narrower) new schema leaves the table mixed
    // until the next full fold; mixed tables read with parquet mergeSchema
    val newCols = merged.drop("__bucket").columns.toSeq
    val mixedNow =
      carried.nonEmpty &&
        prevManifest.exists(p => p.mixed || p.cols.isEmpty || p.cols.toSet != newCols.toSet)
    val manifest = Manifest(numBuckets, carried ++ writtenCounts, bucketBy = bCols, cols = newCols, mixed = mixedNow)
    Files.write(
      dir.resolve("_manifest.json"),
      manifestJson(manifest).getBytes(StandardCharsets.UTF_8),
    )
    val rows = manifest.buckets.valuesIterator.map(_._2).sum
    val commitJson =
      s"""{"version":$next,"message":${jstr(message)},"fingerprint":${jstr(fingerprint)},
         |"rows":$rows,"rows_written":${writtenCounts.valuesIterator.map(_._2).sum},
         |"rewritten_buckets":${affected.size},"total_buckets":${manifest.buckets.size},
         |"committed_at":${System.currentTimeMillis()}}""".stripMargin
    Files.write(dir.resolve("_commit.json"), commitJson.getBytes(StandardCharsets.UTF_8))
    publish(table, next)
    next
    } finally dropStaging()
  }

  /** A delta chain longer than this folds on the next merge (bounds the
    * reader-side reconstruction plan depth).
    */
  val MaxDeltaChain = 8

  /** Parquet reader for a manifest's bucket dirs: schema-merging ONLY when
    * the manifest records heterogeneous bucket schemas (mixed) — the
    * footer sweep is wasted work in the uniform common case, and it ran on
    * every index probe.
    */
  private def bucketRead(m: Manifest) =
    if (m.mixed) spark.read.option("mergeSchema", "true") else spark.read

  /** buckets: bucket → (version that owns its files, row count);
    * deltas: merge-on-read chain in version order (version, update rows);
    * deltaKey: the match key the chain's replacements apply by.
    */
  private final case class Manifest(
      numBuckets: Int,
      buckets: Map[Int, (Int, Long)],
      deltas: Seq[(Int, Long)] = Nil,
      deltaKey: Seq[String] = Nil,
      // the hash-layout columns; a merge under a DIFFERENT bucketBy must
      // full-rewrite (its affected-bucket pruning would miss the old rows'
      // buckets, leaving stale same-key rows behind). Nil = unknown
      // (pre-upgrade manifests) = treated compatible.
      bucketBy: Seq[String] = Nil,
      // column names of the newest bucket write; `mixed` = live bucket
      // dirs may differ from it (schema-widening merge with carried
      // buckets) → reads need parquet mergeSchema. Pre-upgrade manifests
      // (cols empty) are treated as mixed (safe).
      cols: Seq[String] = Nil,
      mixed: Boolean = true,
  )

  private def manifestJson(m: Manifest): String = {
    val entries = m.buckets.toSeq.sortBy(_._1).map { case (b, (v, n)) => s""""$b":[$v,$n]""" }.mkString(",")
    val deltas = m.deltas.map { case (v, n) => s"[$v,$n]" }.mkString(",")
    val dkey = m.deltaKey.map(jstr).mkString(",")
    val bby = m.bucketBy.map(jstr).mkString(",")
    val cols = m.cols.map(jstr).mkString(",")
    val mixed = if (m.mixed) 1 else 0
    s"""{"num_buckets":${m.numBuckets},"mixed":$mixed,"cols":[$cols],"bucket_by":[$bby],"delta_key":[$dkey],"deltas":[$deltas],"buckets":{$entries}}"""
  }

  private def readManifest(table: String, version: Int): Option[Manifest] = {
    val p = tableDir(table).resolve(s"v=$version").resolve("_manifest.json")
    if (!Files.exists(p)) None
    else {
      val s = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      val nb = """"num_buckets":(\d+)""".r.findFirstMatchIn(s).get.group(1).toInt
      val bucketsAt = s.indexOf("\"buckets\"")
      val entries = """"(\d+)":\[(\d+),(\d+)\]""".r
        .findAllMatchIn(s.substring(bucketsAt))
        .map(m => m.group(1).toInt -> (m.group(2).toInt, m.group(3).toLong))
        .toMap
      val head = s.substring(0, bucketsAt) // deltas/delta_key live before "buckets"
      val deltas = s.indexOf("\"deltas\"") match {
        case -1 => Nil
        case i =>
          """\[(\d+),(\d+)\]""".r
            .findAllMatchIn(head.substring(head.indexOf("\"deltas\"")))
            .map(m => m.group(1).toInt -> m.group(2).toLong)
            .toSeq
      }
      def strArr(field: String): Seq[String] = head.indexOf(s""""$field"""") match {
        case -1 => Nil
        case i =>
          val seg = head.substring(i)
          val arr = seg.substring(seg.indexOf('['), seg.indexOf(']') + 1)
          """"((?:[^"\\]|\\.)*)"""".r.findAllMatchIn(arr).map(_.group(1)).toSeq
      }
      val cols = strArr("cols")
      // absent flag (pre-upgrade manifest) → mixed (safe: mergeSchema)
      val mixed = """"mixed":(\d)""".r.findFirstMatchIn(head).map(_.group(1) == "1").getOrElse(true)
      Some(Manifest(nb, entries, deltas, strArr("delta_key"), strArr("bucket_by"), cols, mixed))
    }
  }

  private def bucketDirsIn(dir: Path): Seq[Int] =
    listDir(dir)
      .map(_.getFileName.toString)
      .filter(_.startsWith("__bucket="))
      .map(_.stripPrefix("__bucket=").toInt)

  /** Drop one table entirely (every version + pointer). Used by derived
    * tables that can be rebuilt from the primaries (search indexes —
    * `delete_all_indexes`); primaries have `deleteGroup`/rollback for
    * data lifecycle.
    */
  def deleteTable(table: String): Unit = {
    val dir = tableDir(table)
    if (Files.isDirectory(dir)) {
      val s = Files.walk(dir)
      try s.sorted(java.util.Comparator.reverseOrder()).forEach(p => Files.deleteIfExists(p))
      finally s.close()
    }
  }

  /** Delete the whole store directory tree (bench/test cleanup of
    * throwaway tmpfs stores — NOT a data-lifecycle operation; tables have
    * `deleteGroup`/rollback for that).
    */
  def deleteRoot(): Unit = {
    val rootPath = Paths.get(root)
    if (Files.isDirectory(rootPath)) {
      val s = Files.walk(rootPath)
      try s.sorted(java.util.Comparator.reverseOrder()).forEach(p => Files.deleteIfExists(p))
      finally s.close()
    }
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

object SnapshotStore {

  /** What a [[SnapshotStore.probeFootprint]] probe reads vs the table
    * total — parquet data files of the probed hash buckets plus the live
    * delta chain (which reconciles into every probe).
    */
  final case class ProbeFootprint(
      probedBuckets: Int,
      totalBuckets: Int,
      probedFiles: Long,
      totalFiles: Long,
      probedBytes: Long,
      totalBytes: Long,
  )

  /** Directory listing that CLOSES the NIO stream. `Files.list` holds the
    * directory fd until the stream is closed; call sites that drop the
    * stream leak one fd per call (with a pinned pre-touched heap GC almost
    * never runs, so finalizers don't save you — the full test suite used
    * to exhaust the 20k fd limit this way). Empty for non-directories.
    */
  private[io] def listDir(dir: Path): Seq[Path] =
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      val s = Files.list(dir)
      try s.iterator().asScala.toList
      finally s.close()
    }
}
