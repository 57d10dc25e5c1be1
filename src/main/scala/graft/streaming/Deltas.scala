package graft.streaming

import java.sql.Timestamp

import graft.GraphitiSpark
import graft.io.Migration
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Delta operation log — the reference's `Delta` / `DeltaOperation`
  * machinery (`incremental_updater.py:38-91, 390-585, 805-1020`;
  * driver wrappers `huggingface_driver.py:1352-1615`): typed graph
  * mutations batched into named deltas that validate, apply, and roll
  * back as units.
  *
  * Spark-native re-expression:
  *  - a delta's operations live as ROWS in a `delta_ops` table (not a
  *    driver-side object graph) — validation is joins against the
  *    primaries, application groups the ops by (entity_type, op) into a
  *    FIXED number of distributed mutations (the reference loops
  *    `_apply_operation` per op);
  *  - rollback is snapshot-native: applying records every table's
  *    pre-apply version; rolling back republishes those versions
  *    (content-addressed — nothing is copied), instead of the
  *    reference's per-operation inverse writes (`_rollback_operation`).
  *    Only the most recently applied delta may roll back — an older
  *    rollback would silently drop later deltas' writes (the reference
  *    has the same hazard and does not guard it).
  *
  * Op row schema: `op` (add|update|remove), `entity_type` (node|edge),
  * and per kind: node add/update → `name` (+ mutable `summary`); node
  * remove → `uuid`; edge add/update → `source`, `relation`, `target`
  * (+ `valid_at`) routed through the canonical-probe triplet merge
  * (adds adopt/update on re-assert — the engine's replace semantics);
  * edge remove → `uuid`.
  */
final class Deltas(g: GraphitiSpark) {

  private val store = g.store
  private val spark = g.spark
  import spark.implicits._

  private val Ops = "delta_ops"
  private val State = "delta_state"
  private val Prev = "delta_prev"

  private val OpCols =
    Seq("delta_id", "seq", "op", "entity_type", "uuid", "name", "summary", "source", "relation", "target", "valid_at")

  private def normalized(deltaId: String, ops: DataFrame): DataFrame = {
    var df = ops
    for (c <- Seq("uuid", "name", "summary", "source", "relation", "target"))
      if (!df.columns.contains(c)) df = df.withColumn(c, lit(null).cast("string"))
    if (!df.columns.contains("valid_at")) df = df.withColumn("valid_at", lit(null).cast("timestamp"))
    if (!df.columns.contains("seq")) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(lit(0))
        .orderBy(col("op"), col("entity_type"), col("uuid"), col("name"), col("source"), col("relation"), col("target"))
      // batch-sized frame — the single-partition window costs nothing
      df = df.withColumn("seq", row_number().over(w))
    }
    df.withColumn("delta_id", lit(deltaId))
      .withColumn("valid_at", col("valid_at").cast("timestamp"))
      .select(OpCols.map(col): _*)
  }

  /** create_delta (incremental_updater.py:390-404): register the ops
    * under `deltaId` with status `pending`. Returns the op count.
    */
  def createDelta(deltaId: String, ops: DataFrame): Long = {
    val rows = normalized(deltaId, ops).localCheckpoint()
    // purge any prior incarnation of this delta id: re-registering with
    // FEWER ops must not leave the old higher-seq rows behind (applyDelta
    // would silently run those ghost ops)
    val stale =
      if (!store.exists(Ops)) None
      else {
        val s = opsOf(deltaId).select(col("delta_id"), col("seq")).localCheckpoint()
        if (s.isEmpty) None else Some(s)
      }
    store.mergeBucketed(
      Ops, rows, Seq("delta_id", "seq"), s"delta ops $deltaId",
      deleteKeys = stale, bucketBy = Seq("delta_id"),
    )
    val n = rows.count()
    store.merge(
      State,
      Seq((deltaId, "pending", -1, n)).toDF("delta_id", "status", "applied_seq", "n_ops"),
      Seq("delta_id"),
      s"delta $deltaId pending",
    )
    n
  }

  private def opsOf(deltaId: String): DataFrame =
    store.loadForKeys(Ops, Seq(deltaId).toDF("delta_id"), Seq("delta_id")).filter(col("delta_id") === deltaId)

  private def stateOf(deltaId: String): Option[org.apache.spark.sql.Row] =
    if (!store.exists(State)) None
    else store.load(State).filter(col("delta_id") === deltaId).collect().headOption

  /** validate_delta (incremental_updater.py:467-526): one row per
    * malformed / inapplicable op. Shape checks are pure predicates;
    * existence checks are joins against the primaries (update/remove of
    * a missing row) — never a per-op lookup.
    */
  def validateDelta(deltaId: String): DataFrame = {
    val ops = opsOf(deltaId)
    val badShape = ops.filter(
      !col("op").isin("add", "update", "remove") ||
        !col("entity_type").isin("node", "edge") ||
        (col("entity_type") === "node" && col("op").isin("add", "update") && col("name").isNull) ||
        (col("entity_type") === "edge" && col("op").isin("add", "update") &&
          (col("source").isNull || col("relation").isNull || col("target").isNull)) ||
        (col("op") === "remove" && col("uuid").isNull),
    ).select(col("seq"), lit("malformed operation").as("issue"))
    val nodeUuids =
      if (store.exists("nodes")) store.load("nodes").select(col("uuid")) else Seq.empty[String].toDF("uuid")
    val edgeUuids =
      if (store.exists("edges")) store.load("edges").select(col("uuid")) else Seq.empty[String].toDF("uuid")
    def missing(kind: String, uuids: DataFrame) = ops
      .filter(col("entity_type") === kind && col("op") === "remove" && col("uuid").isNotNull)
      .join(uuids, Seq("uuid"), "left_anti")
      .select(col("seq"), lit(s"remove of missing $kind").as("issue"))
    badShape.unionByName(missing("node", nodeUuids)).unionByName(missing("edge", edgeUuids)).orderBy(col("seq"))
  }

  private def nextAppliedSeq: Int =
    if (!store.exists(State)) 0
    else
      store.load(State).agg(coalesce(max(col("applied_seq")), lit(-1))).collect()(0).getInt(0) + 1

  /** apply_delta (incremental_updater.py:405-466): validate (reject
    * without mutating on any issue), snapshot every table's current
    * version for rollback, then run the op groups as distributed
    * mutations — node saves (insert-if-absent), edge triplet merges
    * (canonical probe; re-asserts adopt), edge deletes, node deletes
    * (cascading), in that order. Returns the state row.
    */
  def applyDelta(deltaId: String, validate: Boolean = true, now: Timestamp = Timestamp.valueOf("2024-01-01 00:00:00")): DataFrame = {
    val st = stateOf(deltaId).getOrElse(sys.error(s"unknown delta: $deltaId"))
    require(st.getAs[String]("status") == "pending", s"delta $deltaId is ${st.getAs[String]("status")}, not pending")
    if (validate) {
      val issues = validateDelta(deltaId).localCheckpoint()
      if (!issues.isEmpty) {
        store.merge(
          State,
          Seq((deltaId, "rejected", -1, st.getAs[Long]("n_ops"))).toDF("delta_id", "status", "applied_seq", "n_ops"),
          Seq("delta_id"),
          s"delta $deltaId rejected",
        )
        return issues
      }
    }
    // pre-apply versions of every published table (the rollback point) —
    // the ops/state/prev tables themselves are excluded: rolling their
    // versions back would erase the bookkeeping of the rollback itself
    val metaTables = Set(Ops, State, Prev, s"${Ops}_delta", s"${State}_delta", s"${Prev}_delta")
    val prevRows = store.tables
      .filterNot(metaTables)
      .map(t => (deltaId, t, store.currentVersion(t).getOrElse(-1)))
    store.mergeBucketed(
      Prev, prevRows.toDF("delta_id", "table", "version"), Seq("delta_id", "table"),
      s"delta $deltaId pre-versions", bucketBy = Seq("delta_id"),
    )

    val ops = opsOf(deltaId).localCheckpoint()
    // 1. node add/update → insert-if-absent saves (+ summary updates)
    val nodeSaves = ops.filter(col("entity_type") === "node" && col("op").isin("add", "update"))
    if (!nodeSaves.isEmpty) {
      Migration.saveNodes(store, nodeSaves.select(col("name")), g.groupId, now, tag = s"delta $deltaId")
      val summaries = nodeSaves.filter(col("summary").isNotNull)
      if (!summaries.isEmpty) {
        val gid = g.groupId
        // two ops naming the same entity must collapse to ONE update row
        // (mergeBucketed keeps ALL update rows of a key — duplicates would
        // persist as duplicate uuid rows in the nodes primary); the
        // reference applies ops in seq order, so the LAST summary wins
        val lastW = org.apache.spark.sql.expressions.Window
          .partitionBy(col("name"))
          .orderBy(col("seq").desc)
        val keyed = summaries
          .withColumn("__rn", row_number().over(lastW))
          .filter(col("__rn") === 1)
          .select(col("name"), col("summary"))
          .as[(String, String)]
          .map { case (n, s) => (graft.kg.Ids.entity(gid, n), s) }
          .toDF("uuid", "new_summary")
        val stored = store.loadForKeys("nodes", keyed.select(col("uuid")), Seq("uuid"))
        val patched = stored
          .join(keyed, Seq("uuid"))
          .withColumn("summary", col("new_summary"))
          .drop("new_summary")
        store.mergeBucketed("nodes", patched, Seq("uuid"), s"delta $deltaId summaries")
      }
    }
    // 2. edge add/update → canonical-probe triplet merge (one batch)
    val edgeSaves = ops.filter(col("entity_type") === "edge" && col("op").isin("add", "update"))
    if (!edgeSaves.isEmpty)
      Migration.batchAddTriplets(
        store,
        edgeSaves.select(col("source"), col("relation"), col("target"), col("valid_at")),
        g.groupId,
        batchSize = Int.MaxValue,
        validAt = now,
      )
    // 3. edge removes, 4. node removes (cascade)
    val edgeRm = ops.filter(col("entity_type") === "edge" && col("op") === "remove")
      .select(col("uuid")).collect().map(_.getString(0)).toSeq
    if (edgeRm.nonEmpty) g.deleteEdgesByUuids(edgeRm)
    val nodeRm = ops.filter(col("entity_type") === "node" && col("op") === "remove")
      .select(col("uuid")).collect().map(_.getString(0)).toSeq
    if (nodeRm.nonEmpty) g.deleteNodesByUuids(nodeRm)

    // tables the mutations CREATED (absent pre-apply, present now) are
    // recorded with version -1 so rollback can distinguish them from
    // tables created LATER by unrelated non-delta operations (which it
    // must leave untouched)
    val preTables = prevRows.map(_._2).toSet
    val created = store.tables
      .filterNot(metaTables)
      .filterNot(preTables)
      .map(t => (deltaId, t, -1))
    if (created.nonEmpty)
      store.mergeBucketed(
        Prev, created.toDF("delta_id", "table", "version"), Seq("delta_id", "table"),
        s"delta $deltaId created-tables", bucketBy = Seq("delta_id"),
      )

    store.merge(
      State,
      Seq((deltaId, "applied", nextAppliedSeq, st.getAs[Long]("n_ops")))
        .toDF("delta_id", "status", "applied_seq", "n_ops"),
      Seq("delta_id"),
      s"delta $deltaId applied",
    )
    monitorDeltaProgress(deltaId)
  }

  /** rollback_delta (incremental_updater.py:527-568): republish every
    * snapshotted table's pre-apply version; tables recorded as CREATED by
    * the delta (Prev version -1) are dropped. Tables with NO Prev row were
    * created by unrelated operations AFTER the apply and are left
    * untouched. NOTE: intervening non-delta writes to tables the delta
    * snapshotted ARE discarded by the republish — same hazard as the
    * reference's per-op inverse writes. Guarded to the most recently
    * applied delta.
    */
  def rollbackDelta(deltaId: String): Boolean = {
    val st = stateOf(deltaId).getOrElse(return false)
    if (st.getAs[String]("status") != "applied") return false
    val latest = store.load(State).agg(coalesce(max(col("applied_seq")), lit(-1))).collect()(0).getInt(0)
    require(
      st.getAs[Int]("applied_seq") == latest,
      s"delta $deltaId is not the most recently applied delta — roll back later deltas first",
    )
    val prev = store
      .loadForKeys(Prev, Seq(deltaId).toDF("delta_id"), Seq("delta_id"))
      .filter(col("delta_id") === deltaId)
      .collect()
      .map(r => r.getAs[String]("table") -> r.getAs[Int]("version"))
      .toMap
    prev.foreach { case (t, v) =>
      if (v >= 0) {
        if (store.currentVersion(t).exists(_ != v)) store.rollback(t, v)
      } else store.deleteTable(t) // created by this delta's apply
    }
    store.merge(
      State,
      Seq((deltaId, "rolled_back", -1, st.getAs[Long]("n_ops"))).toDF("delta_id", "status", "applied_seq", "n_ops"),
      Seq("delta_id"),
      s"delta $deltaId rolled back",
    )
    true
  }

  /** merge_delta (incremental_updater.py:569-585): a new pending delta
    * whose ops are the concatenation (re-sequenced, first delta's ops
    * first).
    */
  def mergeDeltas(targetId: String, firstId: String, secondId: String): Long = {
    val a = opsOf(firstId).withColumn("__o", lit(0))
    val b = opsOf(secondId).withColumn("__o", lit(1))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(lit(0)).orderBy(col("__o"), col("seq"))
    val merged = a.unionByName(b).withColumn("seq", row_number().over(w)).drop("__o", "delta_id")
    createDelta(targetId, merged)
  }

  /** process_large_delta (incremental_updater.py:866-912): apply the ops
    * in seq-ordered chunks — each chunk a bounded batch of distributed
    * mutations, ONE shared rollback point (the pre-versions snapshot of
    * the first chunk).
    */
  def processLargeDelta(deltaId: String, chunkSize: Int = 100, validate: Boolean = true): DataFrame = {
    val st = stateOf(deltaId).getOrElse(sys.error(s"unknown delta: $deltaId"))
    require(st.getAs[String]("status") == "pending", s"delta $deltaId is not pending")
    val n = st.getAs[Long]("n_ops")
    if (n <= chunkSize) return applyDelta(deltaId, validate)
    if (validate) {
      val issues = validateDelta(deltaId).localCheckpoint()
      if (!issues.isEmpty) return issues
    }
    val ops = opsOf(deltaId).localCheckpoint()
    val chunkIds = (0L until n by chunkSize.toLong).zipWithIndex.map { case (lo, i) =>
      val cid = s"$deltaId#$i"
      createDelta(cid, ops.filter(col("seq") > lo && col("seq") <= lo + chunkSize).drop("delta_id"))
      cid
    }
    // the parent's rollback point is the FIRST chunk's: record it before
    // any chunk mutates
    chunkIds.foreach(applyDelta(_, validate = false))
    // demote the chunks from independently-rollback-able deltas: after the
    // PARENT rolls back (restoring the pre-chunk-0 state), rolling back an
    // individual chunk would re-forward tables to its own pre-version
    // (post-previous-chunk state) — so chunks carry status "chunk" (the
    // rollback guard only accepts "applied") and the parent is the one
    // rollback unit
    store.merge(
      State,
      chunkIds.map(c => (c, "chunk", -1, 0L)).toDF("delta_id", "status", "applied_seq", "n_ops"),
      Seq("delta_id"),
      s"delta $deltaId chunks demoted",
    )
    // the parent's rollback point per table = the EARLIEST chunk's record
    // of it (chunk order = application order): chunk 0's pre-version for
    // tables that predate the parent, and the -1 created marker from
    // whichever chunk first saw a table the parent's mutations created
    val chunkOrder = chunkIds.zipWithIndex.toDF("delta_id", "__ord")
    val firstPerTable = org.apache.spark.sql.expressions.Window
      .partitionBy(col("table"))
      .orderBy(col("__ord"))
    val prevOfParent = store
      .loadForKeys(Prev, chunkIds.toDF("delta_id"), Seq("delta_id"))
      .join(broadcast(chunkOrder), Seq("delta_id"))
      .withColumn("__rn", row_number().over(firstPerTable))
      .filter(col("__rn") === 1)
      .select(lit(deltaId).as("delta_id"), col("table"), col("version"))
    store.mergeBucketed(Prev, prevOfParent, Seq("delta_id", "table"), s"delta $deltaId pre-versions", bucketBy = Seq("delta_id"))
    store.merge(
      State,
      Seq((deltaId, "applied", nextAppliedSeq, n)).toDF("delta_id", "status", "applied_seq", "n_ops"),
      Seq("delta_id"),
      s"delta $deltaId applied (${chunkIds.size} chunks)",
    )
    monitorDeltaProgress(deltaId)
  }

  /** parallel_delta_application (incremental_updater.py:913-954): the
    * deltas apply in order — they mutate the SAME tables, so concurrent
    * application would race the single-writer snapshots; the parallelism
    * that matters (within each delta's distributed mutations) already
    * spans the cluster. Returns ONE state row per delta (uniform schema:
    * a rejected delta's row reports status `rejected`; its issue list is
    * available via [[validateDelta]]) — mixing issue frames into the
    * union would throw after sibling deltas already mutated.
    */
  def parallelDeltaApplication(deltaIds: Seq[String], validate: Boolean = true): DataFrame =
    deltaIds
      .map { id =>
        val r = applyDelta(id, validate)
        // applyDelta returns the issues frame on rejection — normalize to
        // the (now status=rejected) state row so the union stays uniform
        if (r.columns.contains("issue")) monitorDeltaProgress(id) else r
      }
      .reduce(_ unionByName _)

  /** monitor_delta_progress (incremental_updater.py:956-1006). */
  def monitorDeltaProgress(deltaId: String): DataFrame =
    store.load(State).filter(col("delta_id") === deltaId)

  /** get_update_statistics (incremental_updater.py:1008-1016). */
  def getUpdateStatistics: DataFrame =
    if (!store.exists(State)) Seq.empty[(String, Long, Long)].toDF("status", "deltas", "total_ops")
    else
      store
        .load(State)
        .groupBy(col("status"))
        .agg(count(lit(1)).as("deltas"), sum(col("n_ops")).as("total_ops"))
        .orderBy(col("status"))

  /** clear_pending_deltas (incremental_updater.py:1017-1020). */
  def clearPendingDeltas(): Long = {
    if (!store.exists(State)) return 0L
    val pending = store.load(State).filter(col("status") === "pending").localCheckpoint()
    val n = pending.count()
    if (n > 0) {
      val gone = store
        .loadForKeys(Ops, pending.select(col("delta_id")), Seq("delta_id"))
        .join(pending.select(col("delta_id")), Seq("delta_id"), "left_semi")
        .select(col("delta_id"), col("seq"))
      store.mergeBucketed(
        Ops, store.load(Ops).limit(0), Seq("delta_id", "seq"), "clear pending delta ops",
        deleteKeys = Some(gone), bucketBy = Seq("delta_id"),
      )
      store.merge(State, pending.withColumn("status", lit("cleared")), Seq("delta_id"), "clear pending deltas")
    }
    n
  }
}
