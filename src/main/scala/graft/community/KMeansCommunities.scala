package graft.community

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** KMeans community detection over node embeddings — the reference's
  * `CommunityDetector` kmeans strategy (`graphiti_hf/processing/
  * community_detector.py:119-396`) on spark.ml, with the
  * silhouette-style optimal-k sweep (`:1262-1284`) simplified to an
  * explicit k (the reference's sweep is a driver-side loop over k; here
  * callers pick k or sweep externally).
  */
object KMeansCommunities {

  /** nodes (uuid, name_embedding: array<float>) → (uuid, community). */
  def assign(spark: SparkSession, nodes: DataFrame, k: Int, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val vecs = nodes
      .select(col("uuid"), col("name_embedding"))
      .as[(String, Seq[Float])]
      .map { case (id, e) => (id, Vectors.dense(e.map(_.toDouble).toArray)) }
      .toDF("uuid", "features")
    val model = new KMeans().setK(k).setSeed(seed).setFeaturesCol("features").fit(vecs)
    model
      .transform(vecs)
      .select(col("uuid"), col("prediction").as("community"))
  }
}
