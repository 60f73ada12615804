package graft.vector

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN index: partition vectors by nearest centroid
  * (seeded k-means), probe the `nProbe` nearest cells at query time.
  *
  * Complements the LSH path in [[Similarity]]: k-means cells adapt to the
  * data distribution (LSH hyperplanes don't), which is what you want when
  * embeddings cluster — the usual case for real corpora. At 100 TB the
  * assignment table is written `partitionBy("cell")` so a probe prunes to
  * nProbe/k of the data at file-listing level; centroids (k × dim floats)
  * are a broadcast-sized artifact.
  */
object Ivf {

  final case class IvfModel(centroids: Array[Array[Double]]) {
    def nearestCells(query: Seq[Double], nProbe: Int): Seq[Int] =
      centroids.zipWithIndex
        .map { case (c, i) => (i, dist2(c, query)) }
        .sortBy { case (i, d) => (d, i) }
        .take(nProbe).map(_._1).toSeq

    private def dist2(a: Array[Double], b: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
  }

  /** Train centroids and return (model, assignments df with `cell`).
    * Deterministic under the fixed seed. */
  def buildIndex(df: DataFrame, idCol: String, embCol: String, k: Int,
      seed: Long = 42L): (IvfModel, DataFrame) = {
    val feat = df.select(col(idCol), col(embCol))
      .withColumn("features",
        org.apache.spark.ml.functions.array_to_vector(col(embCol)))
    val kmeans = new KMeans().setK(k).setSeed(seed).setMaxIter(10)
    val model = kmeans.fit(feat)
    val assigned = model.transform(feat)
      .select(col(idCol), col(embCol), col("prediction").as("cell"))
      .localCheckpoint() // the index artifact; written partitionBy(cell) at scale
    (IvfModel(model.clusterCenters.map(_.toArray)), assigned)
  }

  /** ANN top-k: probe the nProbe nearest cells, exact cosine inside. */
  def annTopK(model: IvfModel, index: DataFrame, idCol: String, embCol: String,
      query: Seq[Double], topK: Int, nProbe: Int = 2): DataFrame = {
    val cells = model.nearestCells(query, nProbe)
    index.filter(col("cell").isin(cells: _*))
      .select(col(idCol),
        round(Similarity.cosine(col(embCol).cast("array<double>"), typedLit(query)), 6)
          .as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(topK)
  }
}
