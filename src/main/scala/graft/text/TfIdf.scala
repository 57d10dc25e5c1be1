package graft.text

import org.apache.spark.ml.feature.{HashingTF, IDF, StopWordsRemover, Tokenizer}
import org.apache.spark.sql.DataFrame

/** TF-IDF vectorization via spark.ml — the distributed re-expression of
  * the reference's sklearn TfidfVectorizer config (max 10k features,
  * English stopwords — `graphiti_hf/processing/deduplicator.py:56-59`,
  * `episode_processor.py:90`). 1-2 grams collapse to unigrams here (the
  * reference uses the vectors only for cosine blocking, which our MinHash
  * path covers; unigram TF-IDF keeps the pipeline entirely in spark.ml).
  */
object TfIdf {

  val NumFeatures = 10000

  /** docs(idCol, textCol) → + columns (tokens, filtered, tf, tfidf). */
  def vectorize(docs: DataFrame, textCol: String): DataFrame = {
    val tok = new Tokenizer().setInputCol(textCol).setOutputCol("tokens")
    val stop = new StopWordsRemover().setInputCol("tokens").setOutputCol("filtered")
    val tf = new HashingTF().setInputCol("filtered").setOutputCol("tf").setNumFeatures(NumFeatures)
    val tokens = stop.transform(tok.transform(docs))
    val featurized = tf.transform(tokens)
    val idf = new IDF().setInputCol("tf").setOutputCol("tfidf").fit(featurized)
    idf.transform(featurized)
  }
}
