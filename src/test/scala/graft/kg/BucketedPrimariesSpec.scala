package graft.kg

import java.nio.file.Files

import graft.{GraphitiSpark, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** `-Dgraft.bulk.bucketed=true` — the corpus-scale primary layout: bulk
  * commits the incrementally-merged primaries BUCKETED, so the first
  * micro-batch after a bulk merges ∝ batch. With the default plain
  * commits that first merge pays the one-time plain→bucketed fold of the
  * whole table (a corpus rewrite at 10^12 documents). The two modes must
  * be value-identical, and the bucketed store's first batch must carry
  * pre-existing buckets by reference instead of rewriting the corpus.
  */
class BucketedPrimariesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Primaries = Seq("episodes", "nodes_raw", "uuid_map", "nodes", "edges", "episodic_edges")

  private def batchPages = Seq(
    (
      "https://bp.example/new/1",
      Fixtures.ts(9000),
      "<html><body><p>Customer#77 lives in NATION_2.</p></body></html>".getBytes("UTF-8"),
      null.asInstanceOf[String],
      "en",
    ),
  ).toDF("url", "warc_ts", "html", "text", "lang")

  test("bucketed-primaries bulk ≡ plain bulk; first micro-batch carries buckets by reference") {
    val plain = new GraphitiSpark(spark, Files.createTempDirectory("bp-plain").toString)
    plain.addEpisodeBulk(Fixtures.pagesDf(), "bp-v1")

    val prev = System.getProperty("graft.bulk.bucketed")
    System.setProperty("graft.bulk.bucketed", "true")
    val bucketed =
      try {
        val g = new GraphitiSpark(spark, Files.createTempDirectory("bp-bucketed").toString)
        g.addEpisodeBulk(Fixtures.pagesDf(), "bp-v1")
        g
      } finally {
        if (prev == null) System.clearProperty("graft.bulk.bucketed")
        else System.setProperty("graft.bulk.bucketed", prev)
      }

    // value parity: every primary's content identical across the modes
    for (t <- Primaries) {
      val a = plain.store.load(t).collect().map(_.toString).toSet
      val b = bucketed.store.load(t).collect().map(_.toString).toSet
      assert(a == b, s"$t differs between plain and bucketed bulk")
    }
    // the bucketed layout is real: manifests exist (keyed probes work
    // from the moment the bulk commits — no one-time upgrade pending)
    for (t <- Primaries) {
      val v = bucketed.store.currentVersion(t).get
      assert(
        bucketed.store.probeFootprint(t, bucketed.store.load(t).limit(1), probeKey(t)).totalBuckets > 0,
        s"$t not committed bucketed",
      )
      assert(bucketed.store.referencedVersions(t, v).nonEmpty)
    }

    // first micro-batch on the BUCKETED store: the edges/episodes merges
    // ride the delta path or rewrite only touched buckets — the current
    // manifest still references pre-batch versions (carried buckets).
    // On the PLAIN store the same batch legacy-folds the whole table:
    // every bucket is owned by the post-batch version.
    graft.streaming.IncrementalIngest.ingestBatch(bucketed.store, batchPages, 1L)
    graft.streaming.IncrementalIngest.ingestBatch(plain.store, batchPages, 1L)
    for (t <- Seq("edges", "episodes")) {
      val vB = bucketed.store.currentVersion(t).get
      val refsB = bucketed.store.referencedVersions(t, vB)
      assert(
        refsB.exists(_ < vB),
        s"bucketed $t: first batch rewrote every bucket (refs=$refsB cur=$vB) — work not ∝ batch",
      )
      val vP = plain.store.currentVersion(t).get
      val refsP = plain.store.referencedVersions(t, vP)
      assert(
        refsP == Set(vP),
        s"plain $t: expected the one-time full fold on batch #1 (refs=$refsP cur=$vP)",
      )
    }
    // and the two stores still agree on content after the batch
    for (t <- Seq("edges", "episodes", "nodes")) {
      val a = plain.store.load(t).collect().map(_.toString).toSet
      val b = bucketed.store.load(t).collect().map(_.toString).toSet
      assert(a == b, s"$t diverged after the first micro-batch")
    }
  }

  private def probeKey(t: String): Seq[String] = t match {
    case "edges" => Seq("group_id", "source_uuid", "name")
    case "uuid_map" => Seq("canonical")
    case "episodic_edges" => Seq("entity_uuid")
    case _ => Seq("uuid")
  }
}
