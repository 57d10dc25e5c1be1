package graft.search

import graft.io.SnapshotStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Precomputed query-time search indexes, committed as snapshots at
  * pipeline time — the re-expression of the reference's prebuilt indices
  * (`performance_optimizer.py:184-237` builds BM25/embedding indexes up
  * front; `vector_search.py:36-189` persists FAISS indexes):
  *
  *  - `<t>_postings`  (term, id, tf, dl, df): BM25 inverted index,
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

  /** (table, idCol, textCol) surfaces with a BM25 lane in KgSearch. */
  val TextSurfaces: Seq[(String, String, String)] = Seq(
    ("edges", "uuid", "fact"),
    ("nodes", "uuid", "name"),
    ("episodes", "uuid", "content"),
    ("communities", "uuid", "summary"),
  )

  /** Build (or rebuild) every index from the current snapshots. */
  def build(store: SnapshotStore): Unit = {
    TextSurfaces.foreach { case (t, id, text) =>
      if (store.exists(t)) buildText(store, t, id, text)
    }
    if (store.exists("edges")) buildAnn(store)
  }

  def buildText(store: SnapshotStore, table: String, idCol: String, textCol: String): Unit = {
    val docs = store.load(table).select(col(idCol).as("id"), col(textCol).as("text"))
    store.mergeBucketed(
      s"${table}_postings", Bm25.postings(docs), Seq("term"),
      s"bm25 inverted index for $table", bucketBy = Seq("term"),
    )
    store.commit(Bm25.corpusStats(docs), s"${table}_bm25stats", s"bm25 corpus stats for $table")
  }

  def buildAnn(store: SnapshotStore): Unit = {
    val edges = store.load("edges")
    val sigs = graft.sim.Ann
      .signature(edges.sparkSession, edges.select(col("uuid"), col("fact_embedding")), "uuid", "fact_embedding")
      .withColumnRenamed("id", "uuid")
    val ann = edges
      .select(col("uuid"), col("fact_embedding").as("v"))
      .join(sigs, Seq("uuid"))
      .select(col("sig"), col("uuid"), col("v"))
    store.mergeBucketed("edge_ann", ann, Seq("sig", "uuid"), "ANN signature buckets", bucketBy = Seq("sig"))
  }

  /** Incremental text-index refresh after a micro-batch replaced
    * `oldDocs` (id, text) with `newDocs` (id, text): the posting lists of
    * every TOUCHED term are rebuilt from (their probed old postings minus
    * removed ids) ∪ new term frequencies, with df recomputed inside the
    * group; untouched terms are never read. Corpus stats shift by the
    * delta. No-op if the index was never built.
    */
  def refreshText(store: SnapshotStore, table: String, oldDocs: DataFrame, newDocs: DataFrame): Unit = {
    if (!store.exists(s"${table}_postings")) return
    val newTf = Bm25.termFreqs(newDocs)
    val oldTf = Bm25.termFreqs(oldDocs).localCheckpoint()
    val touched = newTf.select(col("term")).unionByName(oldTf.select(col("term"))).distinct().localCheckpoint()
    val removedIds = oldDocs.select(col("id")).distinct()
    val survivors = store
      .loadForKeys(s"${table}_postings", touched, Seq("term"))
      .drop("df")
      .join(removedIds, Seq("id"), "left_anti")
    val combined = survivors.unionByName(newTf)
    val df = combined.groupBy(col("term")).agg(countDistinct(col("id")).as("df"))
    store.mergeBucketed(
      s"${table}_postings",
      combined.join(df, Seq("term")),
      Seq("term"),
      s"refresh bm25 postings for $table",
      deleteKeys = Some(touched),
      bucketBy = Seq("term"),
    )
    // stats delta: old docs leave, new docs enter
    val stats = store.load(s"${table}_bm25stats").collect()(0)
    val oldAgg = oldDocs.agg(count(lit(1)), coalesce(sum(size(split(lower(col("text")), " "))), lit(0L))).collect()(0)
    val newAgg = newDocs.agg(count(lit(1)), coalesce(sum(size(split(lower(col("text")), " "))), lit(0L))).collect()(0)
    val nDocs = stats.getAs[Long]("n_docs") - oldAgg.getLong(0) + newAgg.getLong(0)
    val totalDl = stats.getAs[Long]("total_dl") - oldAgg.getLong(1) + newAgg.getLong(1)
    val spark = newDocs.sparkSession
    import spark.implicits._
    store.commit(Seq((nDocs, totalDl)).toDF("n_docs", "total_dl"), s"${table}_bm25stats", s"refresh stats for $table")
  }

  /** Incremental ANN refresh: drop removed vectors' bucket rows, add the
    * new vectors under their signatures. No-op if never built.
    */
  def refreshAnn(store: SnapshotStore, oldEdges: DataFrame, newEdges: DataFrame): Unit = {
    if (!store.exists("edge_ann")) return
    val spark = newEdges.sparkSession
    def rows(df: DataFrame): DataFrame = {
      val sigs = graft.sim.Ann
        .signature(spark, df.select(col("uuid"), col("fact_embedding")), "uuid", "fact_embedding")
        .withColumnRenamed("id", "uuid")
      df.select(col("uuid"), col("fact_embedding").as("v")).join(sigs, Seq("uuid")).select(col("sig"), col("uuid"), col("v"))
    }
    val removed = rows(oldEdges).select(col("sig"), col("uuid"))
    store.mergeBucketed(
      "edge_ann", rows(newEdges), Seq("sig", "uuid"), "refresh ANN buckets",
      deleteKeys = Some(removed), bucketBy = Seq("sig"),
    )
  }
}
