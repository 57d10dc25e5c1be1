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

  test("native termFreqs == explode+groupBy over split(lower(text), ' '), tokenizer edge cases included") {
    // the shuffle-free TokenCounts expression must be byte-exact with the
    // relational tokenizer contract, INCLUDING Java split(-1) edge
    // semantics: empty input → one empty token, consecutive spaces yield
    // empty tokens, trailing empties kept, uppercase folds, non-ASCII
    val edge = Seq(
      ("e0", ""),
      ("e1", " "),
      ("e2", "a  b "),
      ("e3", "  "),
      ("e4", "MiXeD CaSe MIXED mixed"),
      ("e5", "héllo wörld héllo"),
      ("e6", "singleton"),
    )
    val rnd = new scala.util.Random(41L)
    val fuzz = (0 until 30).map { i =>
      val chars = "ab C  dé "
      (s"f$i", Seq.fill(rnd.nextInt(12))(chars(rnd.nextInt(chars.length))).mkString)
    }
    val docs = (edge ++ fuzz).toDF("id", "text")
    val got = Bm25.termFreqs(docs)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3))).toSet
    val want = docs
      .select(col("id"), split(lower(col("text")), " ").as("toks"))
      .select(col("id"), size(col("toks")).as("dl"), explode(col("toks")).as("term"))
      .groupBy(col("term"), col("id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3))).toSet
    assert(got == want)
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
