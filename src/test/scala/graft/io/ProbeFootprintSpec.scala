package graft.io

import java.nio.file.Files

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** probeFootprint measures what a loadForKeys probe READS — the flat-cost
  * evidence: probe cost is keys × (corpus / numBuckets), so the read
  * footprint must be key-bound, never corpus-bound, and must track the
  * manifest-addressed dirs the probe actually opens.
  */
class ProbeFootprintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("k keys read at most k buckets of a 512-bucket table; bytes track the bucket fraction") {
    val s = new SnapshotStore(spark, Files.createTempDirectory("probe-fp").toString)
    val rows = (0 until 20000).map(i => (s"k$i", i.toLong)).toDF("key", "v")
    s.mergeBucketed("t", rows, Seq("key"), "footprint fixture", numBuckets = 512)
    val keys = (0 until 10).map(i => s"k${i * 1000}").toDF("key")
    val fp = s.probeFootprint("t", keys, Seq("key"))
    assert(fp.totalBuckets == 512)
    assert(fp.probedBuckets >= 1 && fp.probedBuckets <= 10, s"probe must be key-bound: $fp")
    assert(fp.probedBytes > 0 && fp.probedFiles > 0)
    assert(fp.probedBytes < fp.totalBytes / 10, s"probe read a corpus-sized fraction: $fp")
    // uniform hash layout: the bytes fraction tracks the bucket fraction
    val bucketFrac = fp.probedBuckets.toDouble / fp.totalBuckets
    val bytesFrac = fp.probedBytes.toDouble / fp.totalBytes
    assert(bytesFrac <= 3 * bucketFrac, s"bytes out of proportion to probed buckets: $fp")
    // and the probe the footprint describes actually answers
    assert(s.loadForKeys("t", keys, Seq("key")).count() == 10L)
  }

  test("footprint is flat in the corpus: 8x rows at fixed keys probes the same buckets") {
    val s = new SnapshotStore(spark, Files.createTempDirectory("probe-fp8").toString)
    val keys = (0 until 10).map(i => s"k${i * 1000}").toDF("key")
    s.mergeBucketed("t", (0 until 20000).map(i => (s"k$i", i.toLong)).toDF("key", "v"),
      Seq("key"), "1x", numBuckets = 512)
    val fp1 = s.probeFootprint("t", keys, Seq("key"))
    // 8x corpus under the same layout (new value rows per key hash alike)
    s.mergeBucketed("t", (0 until 160000).map(i => (s"k${i % 20000}", i.toLong + 1000000L)).toDF("key", "v"),
      Seq("key"), "8x", numBuckets = 512)
    val fp8 = s.probeFootprint("t", keys, Seq("key"))
    assert(fp8.probedBuckets == fp1.probedBuckets, "same keys must probe the same buckets")
    // probe grows with BUCKET size (corpus/buckets), never jumps to corpus
    assert(fp8.probedBytes < fp8.totalBytes / 10, s"8x probe read a corpus-sized fraction: $fp8")
  }
}
