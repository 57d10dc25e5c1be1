package graft.streaming

import java.nio.file.Files

import graft.TestSpark
import graft.io.SnapshotStore
import graft.kg.{Fixtures, Ids, KgPipeline}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental ingest must converge to the same graph as a batch rebuild
  * over the full corpus (order-independence of the bitemporal algebra),
  * and the streaming wrapper must drive the same path.
  */
class IncrementalIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def edgesKey(store: SnapshotStore) =
    store
      .load("edges")
      .select("source_uuid", "name", "target_uuid", "valid_at", "invalid_at")
      .collect()
      .map(_.toString)
      .toSet

  test("two incremental batches == one batch rebuild") {
    val full = new SnapshotStore(spark, Files.createTempDirectory("g1").toString)
    new KgPipeline(full).run(Fixtures.pagesDf(), "all")

    val inc = new SnapshotStore(spark, Files.createTempDirectory("g2").toString)
    val pages = Fixtures.pagesDf()
    // split: movers' update pages arrive in a later batch
    val batch1 = pages.filter(!col("url").contains("/move/"))
    val batch2 = pages.filter(col("url").contains("/move/"))
    IncrementalIngest.ingestBatch(inc, batch1, 0L)
    val e3 = Ids.entity("default", f"Customer#${3}%09d")
    // before batch 2: no invalidation for the mover
    val before = inc.load("edges").filter(col("source_uuid") === e3 && col("name") === "lives_in").collect()
    assert(before.length == 1 && before(0).getAs[java.sql.Timestamp]("invalid_at") == null)
    IncrementalIngest.ingestBatch(inc, batch2, 1L)
    assert(edgesKey(inc) == edgesKey(full))
  }

  test("alias arriving later re-canonicalizes existing edges") {
    val inc = new SnapshotStore(spark, Files.createTempDirectory("g3").toString)
    val pages = Fixtures.pagesDf()
    IncrementalIngest.ingestBatch(inc, pages.filter(!col("url").contains("/alias/")), 0L)
    IncrementalIngest.ingestBatch(inc, pages.filter(col("url").contains("/alias/")), 1L)
    val full = new SnapshotStore(spark, Files.createTempDirectory("g4").toString)
    new KgPipeline(full).run(Fixtures.pagesDf(), "all")
    assert(edgesKey(inc) == edgesKey(full))
  }

  test("re-mentioning a previously-deduped alias in a later batch == batch rebuild") {
    // regression: a batch whose surface is a HISTORICAL duplicate has a
    // non-identity remap map with an EMPTY delta (the alias's canonical is
    // unchanged) — the speculative pre-remap edges probe must NOT be used
    // then, or replace-by-key drops the receiving canonical group's stored
    // rows (batch-1 facts would silently vanish)
    val spark0 = spark
    import spark0.implicits._
    val extra = Seq {
      val html =
        "<html><head><title>t</title></head><body><p>Customer#1 lives in NATION_3.</p></body></html>"
          .getBytes("UTF-8")
      ("https://t.example/re/1", Fixtures.ts(500000L), html, null.asInstanceOf[String], "en")
    }.toDF("url", "warc_ts", "html", "text", "lang")

    val inc = new SnapshotStore(spark, Files.createTempDirectory("g7a").toString)
    IncrementalIngest.ingestBatch(inc, Fixtures.pagesDf(), 0L) // establishes Customer#1 → canonical
    IncrementalIngest.ingestBatch(inc, extra, 1L) // re-mentions the deduped alias

    val full = new SnapshotStore(spark, Files.createTempDirectory("g7b").toString)
    new KgPipeline(full).run(Fixtures.pagesDf().unionByName(extra), "all+re")
    assert(edgesKey(inc) == edgesKey(full))
  }

  test("alias remap keeps the graph/temporal indexes consistent with the live edges") {
    // regression: refreshGraph/refreshTemporal must see the PRE-remap
    // stored rows as the "old" side — the remapped frame cancels against
    // the rebuilt rows to a zero delta, leaving phantom pre-remap pairs
    // in graph_adj forever
    val inc = new SnapshotStore(spark, Files.createTempDirectory("g6").toString)
    val pages = Fixtures.pagesDf()
    IncrementalIngest.ingestBatch(inc, pages.filter(!col("url").contains("/alias/")), 0L)
    graft.search.SearchIndexes.build(inc)
    IncrementalIngest.ingestBatch(inc, pages.filter(col("url").contains("/alias/")), 1L)

    val e = inc.load("edges").select(col("source_uuid").as("src"), col("target_uuid").as("dst"))
    val expected = e
      .unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      .groupBy("src", "dst")
      .agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    val got = graft.search.SearchIndexes
      .adjacency(inc)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("cnt")))
      .toSet
    assert(got == expected, "graph_adj diverged from the live edges after a canonical remap")

    // month-bucket probe over all time == the live edge set
    val probed = graft.search.SearchIndexes
      .edgesValidInRange(inc, java.sql.Timestamp.valueOf("1970-01-01 00:00:00"), java.sql.Timestamp.valueOf("2100-01-01 00:00:00"))
      .select("uuid")
      .collect()
      .map(_.getString(0))
      .toSet
    val live = inc.load("edges").filter(col("valid_at").isNotNull).select("uuid").collect().map(_.getString(0)).toSet
    assert(probed == live, "edge_months diverged from the live edges after a canonical remap")
  }

  test("streaming foreachBatch drives the same pipeline; rollback restores") {
    val dir = Files.createTempDirectory("gs").toString
    val inDir = s"$dir/in"
    val store = new SnapshotStore(spark, s"$dir/store")
    Fixtures.pagesDf().write.parquet(inDir)
    val q = IncrementalIngest.stream(spark, store, inDir, s"$dir/ckpt")
    q.awaitTermination(120000)
    val full = new SnapshotStore(spark, Files.createTempDirectory("g5").toString)
    new KgPipeline(full).run(Fixtures.pagesDf(), "all")
    assert(edgesKey(store) == edgesKey(full))
    // rollback the edges table to pre-batch (no version 0 here means the
    // single batch committed version 0; rollback is a no-op guard)
    val v = store.currentVersion("edges").get
    store.rollback("edges", v)
    assert(store.currentVersion("edges").contains(v))
  }

  test("random 3-batch arrival schedule == batch rebuild (edges, nodes, canonical map)") {
    // the fixture corpus mixes aliases (late re-canonicalization) and
    // contradictions (late invalidation); a seeded RANDOM page→batch
    // assignment exercises arrival interleavings the two hand-picked
    // splits above do not
    val rnd = new scala.util.Random(11L)
    val assign = Fixtures.pages.map(p => p.url -> rnd.nextInt(3)).toMap
    val assignUdf = udf((url: String) => assign(url))
    val pages = Fixtures.pagesDf().withColumn("b", assignUdf(col("url")))

    val inc = new SnapshotStore(spark, Files.createTempDirectory("g6").toString)
    for (b <- 0 until 3)
      IncrementalIngest.ingestBatch(inc, pages.filter(col("b") === b).drop("b"), b.toLong)
    val full = new SnapshotStore(spark, Files.createTempDirectory("g7").toString)
    new KgPipeline(full).run(Fixtures.pagesDf(), "all")

    assert(edgesKey(inc) == edgesKey(full))
    def nodesKey(store: SnapshotStore) =
      store
        .load("nodes")
        .select(
          col("uuid"), col("name"), col("summary"), col("created_at"),
          col("attributes")("mention_count").as("mc"),
        )
        .collect()
        .map(_.toString)
        .toSet
    assert(nodesKey(inc) == nodesKey(full))
    def mapKey(store: SnapshotStore) =
      store.load("uuid_map").select("uuid", "canonical").collect().map(_.toString).toSet
    assert(mapKey(inc) == mapKey(full))
  }
}
