package graft.search

import graft.io.SnapshotStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Precomputed query-time search indexes, committed as snapshots at
  * pipeline time — the re-expression of the reference's prebuilt indices
  * (`performance_optimizer.py:184-237` builds BM25/embedding indexes up
  * front; `vector_search.py:36-189` persists FAISS indexes):
  *
  *  - `<t>_postings`  (term, id, tf, dl): BM25 inverted index,
  *    BUCKETED BY TERM — a query probes only the hash buckets its terms
  *    fall in instead of re-tokenizing the corpus (Bm25.scoreIndexed);
  *  - `<t>_bm25stats` (n_docs, total_dl): the two corpus scalars BM25
  *    needs (avgdl = total_dl / n_docs);
  *  - `edge_ann` (sig, uuid, v): hyperplane-LSH signature buckets over
  *    fact embeddings, BUCKETED BY SIG — an ANN query probes ~1/256 of
  *    the corpus (Ann.signature semantics; IVF-style pruning).
  *
  * All three refresh INCREMENTALLY: a micro-batch replaces only the
  * posting lists of terms it touches / the signature buckets of vectors
  * it adds or removes (work ∝ batch, never ∝ corpus).
  */
object SearchIndexes {

  private val verbose = sys.env.get("SPARK_GRAFT_VERBOSE").contains("1")
  private def timed[T](stage: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    if (verbose) println(f"[idx] $stage%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  /** (table, idCol, textCol) surfaces with a BM25 lane in KgSearch. */
  val TextSurfaces: Seq[(String, String, String)] = Seq(
    ("edges", "uuid", "fact"),
    ("nodes", "uuid", "name"),
    ("episodes", "uuid", "content"),
    ("communities", "uuid", "summary"),
  )

  /** Build (or rebuild) every index from the current snapshots. The seven
    * builders write DISJOINT tables, so they run as concurrent Spark jobs
    * (graft.io.Concurrent): one build's write/footer tail overlaps the
    * next one's scan instead of serializing seven job chains.
    */
  def build(store: SnapshotStore): Unit = {
    val text: Seq[() => Unit] = TextSurfaces.collect {
      case (t, id, textCol) if store.exists(t) => () => timed(s"text:$t")(buildText(store, t, id, textCol))
    }
    val rest: Seq[() => Unit] =
      if (store.exists("edges"))
        Seq(
          () => timed("ann")(buildAnn(store)),
          () => timed("graph")(buildGraph(store)),
          () => timed("temporal")(buildTemporal(store)),
        )
      else Nil
    graft.io.Concurrent.runAll(text ++ rest)
  }

  def buildText(store: SnapshotStore, table: String, idCol: String, textCol: String): Unit = {
    val docs = store.load(table).select(col(idCol).as("id"), col(textCol).as("text"))
    // FIRST build is single-traversal (mergeBucketed skips its count pass
    // when no prior version exists) — checkpoint the tokenized index only
    // when a REbuild must reuse it for the gone-rows anti-join too
    // stored rows are (term, id, tf, dl) — df is NOT materialized: every
    // probe recounts it live over the reconciled posting list
    // (postingsForTerms), so storing it would only add a corpus-wide
    // window shuffle per build and a stale column per refresh
    val rebuild = store.exists(s"${table}_postings")
    val fresh = if (rebuild) Bm25.termFreqs(docs).localCheckpoint() else Bm25.termFreqs(docs)
    // full (re)build folds the delta log: rows gone from the corpus leave
    val gone =
      if (!rebuild) None
      else Some(
        store.load(s"${table}_postings").select(col("term"), col("id"))
          .join(fresh, Seq("term", "id"), "left_anti"),
      )
    store.mergeBucketed(
      s"${table}_postings", fresh, Seq("term", "id"),
      s"bm25 inverted index for $table", deleteKeys = gone, bucketBy = Seq("term"),
    )
    store.commit(Bm25.corpusStats(docs), s"${table}_bm25stats", s"bm25 corpus stats for $table")
    graft.io.DeltaLog.clear(store, s"${table}_postings")
  }

  /** Reconciled posting lists for the query terms (base buckets ⊎ delta
    * log), df recomputed over the live list — each probed term's FULL
    * posting list is present, so the recount equals the global df.
    */
  def postingsForTerms(store: SnapshotStore, table: String, terms: DataFrame): DataFrame = {
    val probed = graft.io.DeltaLog.probe(
      store, s"${table}_postings", terms, Seq("term"), Seq("term", "id"), Seq("tf", "dl"),
    )
    val df = probed.groupBy(col("term")).agg(countDistinct(col("id")).as("df"))
    probed.join(broadcast(df), Seq("term"))
  }

  /** Hyperplane count for the `edge_ann` signature — a deployment knob
    * (`-Dgraft.ann.planes=N`, default 8) shared by EVERY build / refresh /
    * probe site. Each extra plane halves expected bucket occupancy (a
    * probe reads ~2^-N of the corpus — 8 bits prune only 1/256 at 100 TB;
    * 16-24 bits are the corpus-scale setting); near neighbors straddling
    * a plane are lost, and `-Dgraft.ann.nprobe=M` multi-probe (flip the
    * lowest-margin bits, Ann.probeSignaturesCol) buys that recall back at
    * M x probe cost — the hyperplane analog of the minhash band trade.
    * Changing the width requires an index rebuild (buildAnn): committed
    * buckets are keyed by the width they were built at.
    */
  def annPlanes: Int = Integer.getInteger("graft.ann.planes", 8)

  /** Multi-probe count for edge_ann queries (`-Dgraft.ann.nprobe`, default
    * 1 = exact-signature probe only).
    */
  def annProbes: Int = Integer.getInteger("graft.ann.nprobe", 1)

  /** Newest `planes=N`-stamped `edge_ann` version at or below the current
    * one — the commit the width gate resolves from. The retention sweep
    * must never delete it (IndexLifecycle.cleanupIndexVersions), or a
    * cold resolution would silently lose the fail-fast on width mismatch.
    */
  def annStampVersion(store: SnapshotStore): Option[Int] =
    store.currentVersion("edge_ann").flatMap { cur =>
      store.versions("edge_ann").filter(_ <= cur).reverseIterator
        .find(v => """planes=(\d+)""".r.findFirstIn(store.commitInfo("edge_ann", v)).isDefined)
    }

  // width per (store root, current edge_ann version): the stamp walk
  // reads one _commit.json PER VERSION newest-first — O(versions)
  // driver-side file reads on EVERY annForSigs probe / refreshAnn of a
  // long-lived store with many unstamped merge commits. Committed
  // versions are immutable, so the resolution is a pure function of
  // (root, current version) and caches for the JVM's lifetime.
  private val annWidthCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), Option[Int]]()

  /** Width the committed `edge_ann` buckets were built at — the newest
    * `planes=N` stamp in the table's commit log ([[buildAnn]] writes it;
    * unrelated merges like group deletes don't, so the scan walks back to
    * the last build/compaction). None on stores from before the stamp.
    * Cached per (store, current version) — one stamp walk per committed
    * version, not per probe.
    */
  def storedAnnPlanes(store: SnapshotStore): Option[Int] =
    store.currentVersion("edge_ann") match {
      case None => None
      case Some(cur) =>
        annWidthCache.computeIfAbsent(
          (store.root, cur),
          _ =>
            store.versions("edge_ann").filter(_ <= cur).reverseIterator
              .map(v => """planes=(\d+)""".r.findFirstMatchIn(store.commitInfo("edge_ann", v)))
              .collectFirst { case Some(m) => m.group(1).toInt },
        )
    }

  /** Fail fast when the configured width disagrees with the stored one:
    * probing or delta-appending at a different width than the buckets
    * were built at silently returns wrong candidates / appends under
    * incompatible keys. A width change REQUIRES a rebuild ([[buildAnn]]).
    */
  private def requireAnnWidth(store: SnapshotStore): Unit =
    storedAnnPlanes(store).foreach { w =>
      require(
        w == annPlanes,
        s"edge_ann was built at signature width $w but -Dgraft.ann.planes=$annPlanes — " +
          "rebuild the index (SearchIndexes.buildAnn) or probe at the stored width",
      )
    }

  /** Reconciled ANN bucket rows for the probe signatures. */
  def annForSigs(store: SnapshotStore, sigs: DataFrame): DataFrame = {
    requireAnnWidth(store)
    graft.io.DeltaLog.probe(store, "edge_ann", sigs, Seq("sig"), Seq("sig", "uuid"), Seq("v"))
  }

  def buildAnn(store: SnapshotStore): Unit = {
    val edges = store.load("edges")
    // signature is a pure codegen expression — no join/shuffle per row
    val ann0 = edges.select(
      graft.sim.Ann.signatureCol(col("fact_embedding"), annPlanes).as("sig"),
      col("uuid"),
      col("fact_embedding").as("v"),
    )
    val rebuild = store.exists("edge_ann")
    val ann = if (rebuild) ann0.localCheckpoint() else ann0
    val gone =
      if (!rebuild) None
      else Some(
        store.load("edge_ann").select(col("sig"), col("uuid")).join(ann, Seq("sig", "uuid"), "left_anti"),
      )
    store.mergeBucketed(
      "edge_ann", ann, Seq("sig", "uuid"), s"ANN signature buckets planes=$annPlanes",
      deleteKeys = gone, bucketBy = Seq("sig"),
    )
    graft.io.DeltaLog.clear(store, "edge_ann")
  }

  /** Incremental text-index refresh after a micro-batch replaced
    * `oldDocs` (id, text) with `newDocs` (id, text) — APPEND-ONLY delta
    * log (DeltaLog): old docs' term rows enter with sign −1, new docs'
    * with +1; a batch costs ∝ its own token count, never a rewrite of the
    * term buckets its (scattered) tokens hash into. Corpus stats shift by
    * the delta. Compaction folds via [[buildText]] when the log outgrows
    * the base. No-op if the index was never built.
    */
  def refreshText(
      store: SnapshotStore,
      table: String,
      oldDocs: DataFrame,
      newDocs: DataFrame,
      defer: Boolean = false,
  ): Boolean = {
    if (!store.exists(s"${table}_postings")) return false
    // stats delta FIRST: old docs leave (−1), new docs enter (+1) — ONE
    // signed aggregation job instead of two separate collects. Committing
    // the stats BEFORE the append's compaction decision matters: a
    // compaction rebuild (buildText) recommits authoritative stats from
    // the merged corpus, and reading the stats only AFTER the rebuild
    // would re-apply this batch's delta on top of stats that already
    // include it (double count).
    val stats = store.load(s"${table}_bm25stats").collect()(0)
    def signed(docs: DataFrame, sign: Long) = docs.select(
      lit(sign).as("sign"),
      (lit(sign) * Bm25.dlCol(col("text")).cast("long")).as("sdl"),
    )
    val d = signed(newDocs, 1L)
      .unionByName(signed(oldDocs, -1L))
      .agg(coalesce(sum(col("sign")), lit(0L)), coalesce(sum(col("sdl")), lit(0L)))
      .collect()(0)
    val nDocs = stats.getAs[Long]("n_docs") + d.getLong(0)
    val totalDl = stats.getAs[Long]("total_dl") + d.getLong(1)
    val spark = newDocs.sparkSession
    import spark.implicits._
    store.commit(Seq((nDocs, totalDl)).toDF("n_docs", "total_dl"), s"${table}_bm25stats", s"refresh stats for $table")

    val delta = Bm25.termFreqs(newDocs).withColumn("sign", lit(1))
      .unionByName(Bm25.termFreqs(oldDocs).withColumn("sign", lit(-1)))
      .select(col("term"), col("id"), col("tf"), col("dl"), col("sign"))
    val needs = graft.io.DeltaLog.appendOnly(store, s"${table}_postings", delta)
    // `defer = true` callers run [[compactText]] themselves once the base
    // table's merge has published (compaction reads `store.load(table)`,
    // which must not race a sibling thread still writing that table —
    // IncrementalIngest merges the base table concurrently with this
    // refresh). With `defer = false` the base table must already be at
    // its post-batch version (the serial call sites commit it first).
    if (needs && !defer) { compactText(store, table); false }
    else needs && defer
  }

  /** Fold a text index's delta log into its bucketed base (full rebuild
    * from the table snapshot — runs rarely; amortized over many batches).
    */
  def compactText(store: SnapshotStore, table: String): Unit = {
    val (idCol, textCol) = TextSurfaces.collectFirst { case (t, i, x) if t == table => (i, x) }
      .getOrElse(("id", "text"))
    buildText(store, table, idCol, textCol)
  }

  /** Incremental ANN refresh — APPEND-ONLY delta log like [[refreshText]]:
    * removed vectors sign −1, new vectors +1 under their signatures.
    * No-op if never built. `defer = true` skips the inline compaction
    * (which re-reads the edges table — unsafe while a sibling thread is
    * still merging it) and returns true when the caller must run
    * [[buildAnn]] after its merge barrier.
    */
  def refreshAnn(store: SnapshotStore, oldEdges: DataFrame, newEdges: DataFrame, defer: Boolean = false): Boolean = {
    if (!store.exists("edge_ann")) return false
    requireAnnWidth(store)
    def rows(df: DataFrame): DataFrame = df.select(
      graft.sim.Ann.signatureCol(col("fact_embedding"), annPlanes).as("sig"),
      col("uuid"),
      col("fact_embedding").as("v"),
    )
    val delta = rows(newEdges).withColumn("sign", lit(1))
      .unionByName(rows(oldEdges).withColumn("sign", lit(-1)))
    val needs = graft.io.DeltaLog.appendOnly(store, "edge_ann", delta)
    if (needs && !defer) { buildAnn(store); false }
    else needs && defer
  }

  // ------------------------------------------------------------------
  // Graph index: adjacency lists + degrees, BUCKETED BY src
  // (performance_optimizer.py:340-422 builds adjacency lists + degree/
  // closeness/betweenness centrality up front; here the adjacency is a
  // src-bucketed snapshot so a BFS superstep probes only the buckets its
  // frontier hashes into — cost ∝ frontier, never ∝ corpus)
  // ------------------------------------------------------------------

  /** Undirected (src, dst, cnt) pair counts of an edge batch. `cnt`
    * (parallel-edge multiplicity) is what makes the index INCREMENTALLY
    * maintainable: removing one of two parallel edges decrements instead
    * of deleting the pair another edge still needs.
    */
  private def pairCounts(edges: DataFrame): DataFrame = pairCounts(edges, 0)

  /** [[pairCounts]] pre-partitioned by `src` into `nParts` partitions
    * (0 = session default): HashPartitioning([src], n) satisfies the
    * (src, dst) aggregate's clustering AND, when n == the table's bucket
    * count, IS the graph_adj bucket layout — the aggregate and the
    * bucketed write share one exchange (guide §2.4; SnapshotStore
    * bucketExpr doc).
    */
  private def pairCounts(edges: DataFrame, nParts: Int): DataFrame = {
    val e = edges.select(col("source_uuid").as("src"), col("target_uuid").as("dst"))
    val u = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
    val part = if (nParts > 0) u.repartition(nParts, col("src")) else u
    part
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("cnt"))
  }

  def buildGraph(store: SnapshotStore): Unit = {
    // pairs IS reused below (degrees) — checkpoint unconditionally.
    // Pre-partitioned by src at the bucket count: ONE exchange feeds the
    // (src, dst) aggregate, the src-keyed degree aggregate below (the
    // checkpoint preserves partitioning) and the bucketed graph_adj write.
    val pairs = pairCounts(store.load("edges"), store.DefaultBuckets).localCheckpoint()
    // full (re)build: pairs/nodes no longer present leave the index
    val gonePairs =
      if (!store.exists("graph_adj")) None
      else Some(store.load("graph_adj").select(col("src"), col("dst")).join(pairs, Seq("src", "dst"), "left_anti"))
    val deg = pairs.groupBy(col("src").as("node")).agg(count(lit(1)).as("degree"))
    val goneNodes =
      if (!store.exists("graph_degrees")) None
      else Some(store.load("graph_degrees").select(col("node")).join(deg, Seq("node"), "left_anti"))
    // the two merges write DISJOINT tables from the same checkpointed
    // pairs — concurrent jobs, not a serial chain (this builder was the
    // last finisher of the index-build group)
    graft.io.Concurrent.runAll(Seq(
      () => {
        store.mergeBucketed(
          "graph_adj", pairs, Seq("src", "dst"), "adjacency index",
          deleteKeys = gonePairs, bucketBy = Seq("src"), prePartitioned = true,
        )
        ()
      },
      () => {
        // deg inherits pairs' [src]-hash partitioning (node == src), so a
        // first build writes without re-shuffling its (small) output
        store.mergeBucketed(
          "graph_degrees", deg, Seq("node"), "distinct-neighbor degrees",
          deleteKeys = goneNodes, prePartitioned = true,
        )
        ()
      },
    ))
    // a (re)build folds everything — any pending delta log is stale
    graft.io.DeltaLog.clear(store, "graph_adj")
  }

  /** Signed pair-count deltas folded over base rows → live adjacency.
    * (sum of multiplicities per pair, positives only). */
  private def reconcilePairs(rows: DataFrame): DataFrame =
    rows
      .groupBy(col("src"), col("dst"))
      .agg(sum(col("cnt")).as("cnt"))
      .filter(col("cnt") > 0)

  private def adjLog(store: SnapshotStore): Option[DataFrame] =
    graft.io.DeltaLog.logFrame(store, "graph_adj").map(_.select(col("src"), col("dst"), col("cnt")))

  /** Live adjacency view = bucketed base ⊎ signed delta log. */
  def adjacency(store: SnapshotStore): DataFrame = {
    val base = store.load("graph_adj").select(col("src"), col("dst"), col("cnt"))
    adjLog(store) match {
      case None => base
      case Some(log) => reconcilePairs(base.unionByName(log))
    }
  }

  /** Adjacency probe for a frontier (`keys`: src column): reads only the
    * base buckets the keys hash into plus the (small) delta log.
    */
  def adjacencyForKeys(store: SnapshotStore, keys: DataFrame): DataFrame = {
    val base = store.loadForKeys("graph_adj", keys, Seq("src")).select(col("src"), col("dst"), col("cnt"))
    adjLog(store) match {
      case None => base
      case Some(log) =>
        reconcilePairs(base.unionByName(log.join(keys.select(col("src")).distinct(), Seq("src"), "left_semi")))
    }
  }

  /** Incremental adjacency refresh — APPEND-ONLY (DeltaLog): the batch's
    * NET pair delta (new − old; identical rebuilt pairs cancel to zero
    * and vanish) lands in the `graph_adj_delta` log, so a micro-batch
    * costs ∝ its delta — never a rewrite of scattered src buckets (a
    * batch's new endpoints hash everywhere; copy-on-write per touched
    * bucket would be work ∝ corpus). Compaction folds via [[buildGraph]]
    * when the log outgrows the base.
    */
  def refreshGraph(store: SnapshotStore, oldEdges: DataFrame, newEdges: DataFrame, defer: Boolean = false): Boolean = {
    if (!store.exists("graph_adj")) return false
    val delta = pairCounts(newEdges)
      .unionByName(pairCounts(oldEdges).withColumn("cnt", -col("cnt")))
      .groupBy(col("src"), col("dst"))
      .agg(sum(col("cnt")).as("cnt"))
      .filter(col("cnt") =!= 0)
    val needs = graft.io.DeltaLog.appendOnly(store, "graph_adj", delta)
    if (needs && !defer) { compactGraph(store); false }
    else needs && defer
  }

  /** Fold the delta log into the bucketed base (full rebuild from the
    * edges snapshot — runs rarely; amortized over many batches).
    */
  def compactGraph(store: SnapshotStore): Unit = buildGraph(store)

  /** Degree centrality degree/(n−1) — nx semantics the reference stores in
    * its graph index (`performance_optimizer.py:379-381`), computed at
    * read time over the LIVE adjacency (base ⊎ delta) so incremental
    * refreshes never touch every degree row when n changes.
    */
  def degreeCentrality(store: SnapshotStore): DataFrame = {
    val d = adjacency(store).groupBy(col("src").as("node")).agg(count(lit(1)).as("degree"))
    val n = d.count()
    val denom = if (n > 1) (n - 1).toDouble else 1.0
    d.withColumn("degree_centrality", col("degree") / lit(denom))
  }

  // ------------------------------------------------------------------
  // Temporal index: month buckets of valid_at → edge uuids
  // (performance_optimizer.py:424-511 partitions node/edge uuid lists by
  // year and month of their timestamps for time-based filter pruning)
  // ------------------------------------------------------------------

  /** The edges table's bucket key (IncrementalIngest merges edges
    * bucketed by contention group) — the month index carries it so a
    * range probe can bucket-probe the edges table, not scan it.
    */
  private val EdgeKey = Seq("group_id", "source_uuid", "name")

  private def monthRows(edges: DataFrame): DataFrame =
    edges
      .filter(col("valid_at").isNotNull)
      .select(
        (date_format(col("valid_at"), "yyyy-MM").as("month") +:
          col("uuid") +: EdgeKey.map(col)): _*,
      )

  /** Live (month, uuid, edge-key) membership view = base ⊎ delta log. */
  def monthIndex(store: SnapshotStore): DataFrame = {
    val cols = Seq("month", "uuid") ++ EdgeKey
    val base = store.load("edge_months").select(cols.map(col): _*)
    graft.io.DeltaLog.logFrame(store, "edge_months") match {
      case None => base
      case Some(log) =>
        base.withColumn("cnt", lit(1L))
          .unionByName(log.select((cols :+ "cnt").map(col): _*))
          .groupBy(cols.map(col): _*)
          .agg(sum(col("cnt")).as("cnt"))
          .filter(col("cnt") > 0)
          .select(cols.map(col): _*)
    }
  }

  def buildTemporal(store: SnapshotStore): Unit = {
    val rebuild = store.exists("edge_months")
    val rows0 = monthRows(store.load("edges"))
    val rows = if (rebuild) rows0.localCheckpoint() else rows0
    val gone =
      if (!rebuild) None
      else Some(store.load("edge_months").select(col("month"), col("uuid")).join(rows, Seq("month", "uuid"), "left_anti"))
    store.mergeBucketed(
      "edge_months", rows, Seq("month", "uuid"), "temporal month index",
      deleteKeys = gone, bucketBy = Seq("month"),
    )
    graft.io.DeltaLog.clear(store, "edge_months")
  }

  /** Incremental temporal refresh — APPEND-ONLY like [[refreshGraph]]:
    * net (month, uuid) membership deltas (+1 enter / −1 leave; rebuilt
    * rows that keep their month cancel out) land in `edge_months_delta`;
    * the fold into month buckets runs only when the log outgrows the base.
    */
  def refreshTemporal(store: SnapshotStore, oldEdges: DataFrame, newEdges: DataFrame, defer: Boolean = false): Boolean = {
    if (!store.exists("edge_months")) return false
    val cols = Seq("month", "uuid") ++ EdgeKey
    val delta = monthRows(newEdges).withColumn("cnt", lit(1L))
      .unionByName(monthRows(oldEdges).withColumn("cnt", lit(-1L)))
      .groupBy(cols.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))
      .filter(col("cnt") =!= 0)
    val needs = graft.io.DeltaLog.appendOnly(store, "edge_months", delta)
    if (needs && !defer) { buildTemporal(store); false }
    else needs && defer
  }

  /** Edges whose valid_at falls in [from, to): probes ONLY the month
    * buckets the range covers, then bucket-probes the edges table by the
    * index rows' edge keys — work ∝ matching months, never a corpus scan.
    * Falls back to a direct filter when the index is absent.
    */
  def edgesValidInRange(store: SnapshotStore, from: java.sql.Timestamp, to: java.sql.Timestamp): DataFrame = {
    def direct = store
      .load("edges")
      .filter(col("valid_at") >= lit(from) && col("valid_at") < lit(to))
    if (!store.exists("edge_months")) return direct
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM").withZone(java.time.ZoneOffset.UTC)
    var m = java.time.YearMonth.from(from.toInstant.atZone(java.time.ZoneOffset.UTC))
    val last = java.time.YearMonth.from(to.toInstant.atZone(java.time.ZoneOffset.UTC))
    val months = scala.collection.mutable.ArrayBuffer.empty[String]
    while (!m.isAfter(last)) { months += fmt.format(m.atDay(1)); m = m.plusMonths(1) }
    val cols = Seq("month", "uuid") ++ EdgeKey
    val baseIdx = store
      .loadForKeys("edge_months", months.toSeq.toDF("month"), Seq("month"))
      .filter(col("month").isin(months.toSeq: _*))
      .withColumn("cnt", lit(1L))
    val idx = (graft.io.DeltaLog.logFrame(store, "edge_months") match {
      case None => baseIdx
      case Some(log) =>
        baseIdx
          .unionByName(log.select((cols :+ "cnt").map(col): _*).filter(col("month").isin(months.toSeq: _*)))
          .groupBy(cols.map(col): _*)
          .agg(sum(col("cnt")).as("cnt"))
          .filter(col("cnt") > 0)
    }).localCheckpoint()
    store
      .loadForKeys("edges", idx.select(EdgeKey.map(col): _*), EdgeKey)
      .join(idx.select(col("uuid")), Seq("uuid"), "left_semi")
      .filter(col("valid_at") >= lit(from) && col("valid_at") < lit(to))
  }

  /** Drop every derived search index (and its delta log) —
    * `delete_all_indexes` (`huggingface_driver.py`): the primaries stay,
    * `build` recreates everything from them. Queries over a store without
    * indexes fall back to direct scans, so this is safe at any time.
    */
  def deleteAll(store: SnapshotStore): Unit =
    (TextSurfaces.flatMap { case (t, _, _) => Seq(s"${t}_postings", s"${t}_bm25stats") } ++
      Seq("edge_ann", "graph_adj", "graph_degrees", "edge_months"))
      .foreach { t =>
        // delete the delta log TABLE too (DeltaLog.clear would only append
        // a compaction marker — another version, not a removal)
        store.deleteTable(graft.io.DeltaLog.deltaTable(t))
        store.deleteTable(t)
      }

  /** Rebuild every index whose pending delta log has outgrown `threshold`
    * × its base rows — `auto_rebuild_indices` / `rebuild_indices_if_needed`
    * (`huggingface_driver.py:1282-1314,1514-1529`), with the reference's
    * "data size changed significantly" heuristic made precise: the
    * STALENESS RATIO delta_rows / base_rows is what actually degrades an
    * index here (every probe folds the log on the fly), so it is the
    * rebuild trigger. Returns one row per index:
    * (index, base_rows, delta_rows, ratio, action).
    */
  def autoRebuild(store: SnapshotStore, threshold: Double = 0.8): DataFrame = {
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    val surfaces: Seq[(String, () => Unit)] =
      TextSurfaces.map { case (t, i, x) => (s"${t}_postings", () => buildText(store, t, i, x)) } ++
        Seq(
          ("edge_ann", () => buildAnn(store)),
          ("graph_adj", () => buildGraph(store)),
          ("edge_months", () => buildTemporal(store)),
        )
    surfaces
      .filter { case (t, _) => store.exists(t) }
      .map { case (t, rebuild) =>
        val base = store.approxRowCount(t).getOrElse(store.load(t).count())
        val delta = graft.io.DeltaLog.logRows(store, t)
        val ratio = if (base > 0) delta.toDouble / base else (if (delta > 0) Double.MaxValue else 0.0)
        val action =
          if (ratio > threshold) { rebuild(); "rebuilt" }
          else "fresh"
        (t, base, delta, if (ratio == Double.MaxValue) -1.0 else ratio, action)
      }
      .toDF("index", "base_rows", "delta_rows", "ratio", "action")
  }

  /** One row per committed index with its size and version — the
    * `get_index_statistics` surface (`performance_optimizer.py:733-787`).
    */
  def statistics(store: SnapshotStore): DataFrame = {
    val names =
      TextSurfaces.flatMap { case (t, _, _) => Seq(s"${t}_postings", s"${t}_postings_delta", s"${t}_bm25stats") } ++
        Seq("edge_ann", "edge_ann_delta", "graph_adj", "graph_adj_delta", "graph_degrees", "edge_months", "edge_months_delta")
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    names
      .filter(store.exists)
      .map { t =>
        val rows =
          if (t.endsWith("_delta")) graft.io.DeltaLog.logRows(store, t.stripSuffix("_delta"))
          else store.load(t).count()
        (t, rows, store.currentVersion(t).getOrElse(-1))
      }
      .toDF("index", "rows", "version")
  }
}
