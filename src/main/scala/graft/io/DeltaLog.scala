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
  * Reconciliation: a key-group survives iff base-presence (+1 per base
  * row) plus the log's signs sum > 0; its payload comes from the
  * NEWEST positive row (`seq` stamps each append; base rows are seq −1).
  */
object DeltaLog {

  def deltaTable(table: String): String = s"${table}_delta"

  /** Append `delta` (payload columns + `sign`) to the log; run `rebuild`
    * (which must fold base+log and then [[clear]]) when the log outgrows
    * the base. No-op on an empty delta.
    */
  def append(
      store: SnapshotStore,
      table: String,
      delta: DataFrame,
      rebuild: () => Unit,
      maxFrac: Double = 0.1,
  ): Unit = {
    if (delta.isEmpty) return
    val dt = deltaTable(table)
    val seq = store.currentVersion(dt).map(_ + 1).getOrElse(0)
    val stamped = delta.withColumn("seq", lit(seq))
    val log = if (!store.exists(dt)) stamped else store.load(dt).unionByName(stamped)
    store.commit(log.localCheckpoint(), dt, s"delta append seq=$seq")
    // parquet-footer row counts only — no scan
    val logRows = store.load(dt).count()
    if (logRows > 1000L && logRows > maxFrac * store.load(table).count()) rebuild()
  }

  /** Empty the log after a rebuild folded it into the base. */
  def clear(store: SnapshotStore, table: String): Unit = {
    val dt = deltaTable(table)
    if (store.exists(dt))
      store.commit(store.load(dt).limit(0), dt, "compacted into base")
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
    val dt = deltaTable(table)
    if (!store.exists(dt)) return base
    val d = store
      .load(dt)
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
