package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Append-only signed delta log over a bucketed snapshot — the flat-cost
  * refresh discipline for PER-KEY indexes whose batch keys hash across
  * every bucket (postings terms, ANN signatures, adjacency endpoints):
  * copy-on-write per touched bucket would rewrite work ∝ corpus on every
  * micro-batch, so instead each batch APPENDS its signed rows
  * (sign = +1 enter / −1 leave) to `<table>_delta`, and the fold into the
  * bucketed base runs only when the log outgrows `maxFrac` of the base
  * (amortized compaction; the reference's incremental_index_update
  * contract, performance_optimizer.py:1077-1189, with Iceberg
  * merge-on-read delete-file semantics).
  *
  * The log itself is TRUE append: every batch commits ONLY its own rows
  * as the next version of `<table>_delta` (cost ∝ batch, never ∝ log);
  * readers union the version directories since the last compaction
  * marker. `seq` = the commit version, so newest-positive-payload
  * reconciliation orders correctly.
  */
object DeltaLog {

  def deltaTable(table: String): String = s"${table}_delta"

  private val ClearMessage = "compacted into base"

  /** Versions of the log that are LIVE (after the last clear marker).
    * Package-visible for IndexLifecycle's retention sweep (live log
    * versions must never be deleted regardless of age).
    */
  private[graft] def liveVersions(store: SnapshotStore, dt: String): Seq[Int] = {
    val cur = store.currentVersion(dt).getOrElse(return Nil)
    val vs = store.versions(dt).filter(_ <= cur)
    val lastClear = vs.reverse.find(v => store.commitInfo(dt, v).contains(s""""message":"$ClearMessage""""))
    lastClear match {
      case Some(c) => vs.filter(_ > c)
      case None => vs
    }
  }

  /** All live log rows (None when the log is absent or empty). */
  def logFrame(store: SnapshotStore, table: String): Option[DataFrame] = {
    val dt = deltaTable(table)
    val live = liveVersions(store, dt)
    if (live.isEmpty) None
    else Some(live.map(v => store.loadVersion(dt, v)).reduce(_ unionByName _))
  }

  /** Total live log rows from commit metadata (no scan). */
  def logRows(store: SnapshotStore, table: String): Long = {
    val dt = deltaTable(table)
    liveVersions(store, dt).map { v =>
      """"rows":(\d+)""".r.findFirstMatchIn(store.commitInfo(dt, v)).map(_.group(1).toLong).getOrElse(0L)
    }.sum
  }

  /** Append `delta` (payload columns + `sign`) as its own log version;
    * run `rebuild` (which must fold base+log and then [[clear]]) when the
    * log outgrows the base. No-op on an empty delta.
    *
    * `rebuild` runs INLINE — callers whose rebuild reads the index's
    * source table must only use this form when that table is already at
    * its post-batch version (e.g. not while a sibling thread is still
    * merging it); otherwise use [[appendOnly]] and compact after the
    * barrier.
    */
  def append(
      store: SnapshotStore,
      table: String,
      delta: DataFrame,
      rebuild: () => Unit,
      maxFrac: Double = 0.1,
  ): Unit =
    if (appendOnly(store, table, delta, maxFrac)) rebuild()

  /** Append without compacting; returns true when the log has outgrown
    * the base and the caller should run the fold (once its inputs are
    * safe to read).
    */
  def appendOnly(
      store: SnapshotStore,
      table: String,
      delta: DataFrame,
      maxFrac: Double = 0.1,
  ): Boolean = {
    // checkpoint the (batch-sized) delta so the emptiness probe and the
    // commit don't each recompute the signed-rows plan (tokenization /
    // signatures of both doc sets)
    val d = delta.localCheckpoint()
    if (d.isEmpty) return false
    val dt = deltaTable(table)
    val seq = store.versions(dt).lastOption.map(_ + 1).getOrElse(0)
    store.commit(d.withColumn("seq", lit(seq)).coalesce(1), dt, s"delta append seq=$seq")
    val rows = logRows(store, table)
    // base size from commit metadata (manifest bucket counts) — a
    // load(table).count() here was a full base scan job on EVERY append
    val baseRows = store.approxRowCount(table).getOrElse(store.load(table).count())
    rows > 1000L && rows > maxFrac * baseRows
  }

  /** Publish the compaction marker after a rebuild folded the log. */
  def clear(store: SnapshotStore, table: String): Unit = {
    val dt = deltaTable(table)
    if (store.exists(dt))
      store.commit(store.load(dt).limit(0), dt, ClearMessage)
  }

  /** Reconciled rows for the probe keys: base buckets (loadForKeys on
    * `bucketCols`) ⊎ the log's matching rows → groups with net presence,
    * payload from the newest positive row. Cost ∝ probed buckets + log
    * size (the log is bounded by compaction).
    */
  def probe(
      store: SnapshotStore,
      table: String,
      keys: DataFrame,
      bucketCols: Seq[String],
      keyCols: Seq[String],
      payload: Seq[String],
  ): DataFrame = {
    val base = store
      .loadForKeys(table, keys, bucketCols)
      .select((keyCols ++ payload).map(col): _*)
    logFrame(store, table) match {
      case None => base
      case Some(log) =>
        val d = log
          .join(broadcast(keys.select(bucketCols.map(col): _*).distinct()), bucketCols, "left_semi")
          .select((keyCols ++ payload ++ Seq("sign", "seq")).map(col): _*)
        val all = base
          .withColumn("sign", lit(1))
          .withColumn("seq", lit(-1))
          .unionByName(d)
        val net = all.groupBy(keyCols.map(col): _*).agg(sum(col("sign")).as("net"))
        val pay = all
          .filter(col("sign") > 0)
          .groupBy(keyCols.map(col): _*)
          .agg(max(struct((col("seq") +: payload.map(col)): _*)).as("p"))
        net
          .filter(col("net") > 0)
          .join(pay, keyCols)
          .select((keyCols.map(col) ++ payload.map(n => col(s"p.$n").as(n))): _*)
    }
  }
}
