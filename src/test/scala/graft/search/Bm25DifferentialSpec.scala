package graft.search

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential check that the two BM25 evaluation paths are the same
  * function: the one-shot relational form (`Bm25.score`, recomputes
  * corpus stats) and the inverted-index probe form
  * (`Bm25.postings`/`corpusStats` + `scoreIndexed` — what `KgSearch`
  * uses through `SearchIndexes`). Seeded random corpora with skewed
  * term frequencies; any drift between the query path and the index
  * build would silently corrupt every indexed search lane.
  */
class Bm25DifferentialSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def randomCorpus(seed: Long): Seq[(String, String)] = {
    val rnd = new scala.util.Random(seed)
    // Zipf-ish vocabulary: low ids appear far more often (hot terms)
    val vocab = (0 until 15).map(i => s"w$i")
    (0 until 40).map { i =>
      val len = 1 + rnd.nextInt(12)
      val words = Seq.fill(len)(vocab(math.min(rnd.nextInt(vocab.size), rnd.nextInt(vocab.size))))
      (s"d$i", words.mkString(" "))
    }
  }

  test("score == scoreIndexed(postings, corpusStats) on seeded random corpora") {
    for (seed <- Seq(3L, 17L)) {
      val docs = randomCorpus(seed).toDF("id", "text")
      val query = Seq("w0", "w3", "w11")

      val direct = Bm25
        .score(docs, "id", "text", query)
        .collect()
        .map(r => r.getString(0) -> r.getDouble(1))
        .toMap

      val stats = Bm25.corpusStats(docs).collect().head
      val nDocs = stats.getLong(0)
      val avgdl = stats.getLong(1).toDouble / nDocs
      val indexed = Bm25
        .scoreIndexed(Bm25.postings(docs), nDocs, avgdl, query)
        .collect()
        .map(r => r.getString(0) -> r.getDouble(1))
        .toMap

      assert(direct.keySet == indexed.keySet, s"seed=$seed: scored doc sets differ")
      for ((id, s) <- direct)
        assert(math.abs(s - indexed(id)) < 1e-9, s"seed=$seed doc=$id: $s vs ${indexed(id)}")
    }
  }

  test("df inside postings equals the per-term distinct-doc count") {
    val docs = randomCorpus(23L).toDF("id", "text")
    val fromPostings = Bm25
      .postings(docs)
      .select(col("term"), col("df"))
      .distinct()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val direct = docs
      .select(col("id"), explode(split(lower(col("text")), " ")).as("term"))
      .distinct()
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(fromPostings == direct)
  }
}
