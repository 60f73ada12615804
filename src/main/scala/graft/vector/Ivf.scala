package graft.vector

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.sql.{Column, DataFrame}
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

  /** Bounded k-means fit input: the full table when it's small, a seeded
    * sample of ~`fitCap` rows when it isn't. At 100 TB the fit would
    * otherwise be `maxIter` full passes over every vector; a bounded
    * sample makes training O(fitCap·k·iter) while ASSIGNMENT stays the
    * only full pass — the standard IVF recipe. */
  private[vector] def fitSample(feat: DataFrame, fitCap: Long, seed: Long): DataFrame = {
    val n = feat.count()
    if (n <= fitCap) feat
    else feat.sample(withReplacement = false, fitCap.toDouble / n, seed)
  }

  /** Train centroids and return (model, assignments df with `cell`).
    * Deterministic under the fixed seed. `path = None` materializes the
    * assignment table via localCheckpoint (executor-local — lost on
    * executor failure); with a `path` it is written via [[writeIndex]]
    * (parquet partitioned by cell) and the durable re-read is returned,
    * so probes prune to their cells at file listing and the artifact
    * survives the job. */
  def buildIndex(df: DataFrame, idCol: String, embCol: String, k: Int,
      seed: Long = 42L, fitCap: Long = 100000L,
      path: Option[String] = None): (IvfModel, DataFrame) = {
    val feat = df.select(col(idCol), col(embCol))
      .withColumn("features",
        org.apache.spark.ml.functions.array_to_vector(col(embCol)))
    val kmeans = new KMeans().setK(k).setSeed(seed).setMaxIter(10)
    val model = kmeans.fit(fitSample(feat, fitCap, seed))
    val assigned = model.transform(feat)
      .select(col(idCol), col(embCol), col("prediction").as("cell"))
    val index = path match {
      case Some(p) => writeIndex(assigned, p); readIndex(df.sparkSession, p)
      case None => assigned.localCheckpoint()
    }
    (IvfModel(model.clusterCenters.map(_.toArray)), index)
  }

  /** Persist the assignment table partitioned by cell — the probe path
    * then prunes to nProbe directories at file listing (the "written
    * partitionBy(cell)" story made concrete; pruning asserted in
    * VectorIndexIOSpec). Centroids travel separately (k × dim doubles —
    * a broadcast-sized artifact). */
  def writeIndex(index: DataFrame, path: String): Unit =
    index.write.partitionBy("cell").mode("overwrite").parquet(path)

  def readIndex(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** ANN top-k: probe the nProbe nearest cells, exact cosine inside. */
  def annTopK(model: IvfModel, index: DataFrame, idCol: String, embCol: String,
      query: Seq[Double], topK: Int, nProbe: Int = 2): DataFrame = {
    val cells = model.nearestCells(query, nProbe)
    annTopKCells(index, idCol, embCol, query, topK, cells)
  }

  /** Probe an explicit cell set (shared by both quantizers). */
  def annTopKCells(index: DataFrame, idCol: String, embCol: String,
      query: Seq[Double], topK: Int, cells: Seq[Int]): DataFrame =
    index.filter(col("cell").isin(cells: _*))
      .select(col(idCol),
        round(Similarity.cosine(col(embCol).cast("array<double>"), typedLit(query)), 6)
          .as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(topK)

  // ---- fixed-centroid coarse quantizer ---------------------------------

  /** IVF assignment against a FIXED centroid set (the "random centroids"
    * coarse quantizer — FAISS-style baseline): cell = argmax cosine
    * (v, cᵢ), ties to the lower index. Unlike the k-means fit, this
    * quantizer is exactly reproducible by any engine from the centroid
    * vectors alone, which is what makes the whole probe path end-to-end
    * oracle-verifiable (q45 recomputes assignment, probe-cell choice and
    * in-cell ranking in DuckDB). Use the k-means path when the corpus
    * actually clusters; this one when you need determinism across
    * engines or a data-independent layout. Assignment is one narrow
    * codegen'd pass (k native-cosine calls per row), no shuffle. */
  def fixedCentroidIndex(df: DataFrame, idCol: String, embCol: String,
      centroids: Seq[Seq[Double]]): DataFrame = {
    val emb = col(embCol).cast("array<double>")
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      struct(Similarity.cosine(emb, typedLit(c)).as("score"),
        lit(-i).as("negIdx"))
    }
    // array_max over (score, negIdx): max score, ties → larger negIdx
    // = smaller index
    df.select(col(idCol), col(embCol),
      (-array_max(array(scored: _*)).getField("negIdx")).cast("int").as("cell"))
  }

  /** Multi-probe fixed-centroid assignment: each vector EXPLODED to its
    * `nProbe` nearest centroids (cosine desc, ties to the lower index),
    * with `probe` = 0-based rank (probe 0 ≡ the [[fixedCentroidIndex]]
    * cell). The standard boundary-miss mitigation for cluster-pruned
    * pair search ([[SemDedup]]): a pair straddling one cell boundary
    * still meets in one member's second-nearest cell. Still a single
    * narrow codegen pass — k cosines per row, a bounded in-row sort,
    * then the nProbe-row explode; no shuffle. */
  def fixedCentroidMultiIndex(df: DataFrame, idCol: String, embCol: String,
      centroids: Seq[Seq[Double]], nProbe: Int): DataFrame = {
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    val emb = col(embCol).cast("array<double>")
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      struct((-Similarity.cosine(emb, typedLit(c))).as("negScore"),
        lit(i).as("idx"))
    }
    // ascending struct sort on (negScore, idx) = cosine desc, ties to
    // the lower centroid index — same order fixedCentroidIndex picks
    df.select(col(idCol), col(embCol),
      posexplode(transform(
        slice(sort_array(array(scored: _*)), 1, nProbe),
        s => s.getField("idx"))))
      .withColumnRenamed("pos", "probe")
      .withColumnRenamed("col", "cell")
  }

  /** Recall@k harness — the ANN quality measurement every IVF
    * deployment owes its users: for each query in `querySlice`, the
    * fixed-centroid probe path's top-k is scored against the exact
    * brute-force top-k, per query, as `n_hits` and floored
    * `recall_ppm`. Both arms rank on the ROUNDED cosine with an id
    * tiebreak (the q37 convention), so the two sets — and therefore the
    * recall — are engine-deterministic. The query itself is EXCLUDED
    * from both arms: a self-hit is guaranteed (probe 0 is its own
    * cell), so leaving it in would pad every recall@k by 1/k — a probe
    * configuration retrieving zero true neighbors would still read 10%
    * at k=10, a false floor baked into the published statistic.
    *
    * Scale shape: the index assigns in one codegen pass and
    * checkpoints; queries multi-probe-assign DISTRIBUTED (no driver
    * loop over queries) and broadcast into the cell-keyed candidate
    * join, so the corpus never shuffles; the brute arm is the q184
    * broadcast scan. Both top-k windows prune map-side
    * (WindowGroupLimit), and the hit count is a (queries × k)-bounded
    * semi-join. At real scale the brute arm runs on a SAMPLED query
    * slice — recall is a statistic, not a per-corpus pass. */
  def annRecall(emb: DataFrame, idCol: String, embCol: String,
      querySlice: Column, centroids: Seq[Seq[Double]], nProbe: Int,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val index = fixedCentroidIndex(emb, idCol, embCol, centroids)
      .localCheckpoint() // probed per query cell; built once
    val queries = emb.filter(querySlice)
    val qCells = fixedCentroidMultiIndex(queries, idCol, embCol,
        centroids, nProbe)
      .select(col(idCol).as("query_id"),
        col(embCol).cast("array<double>").as("__q"), col("cell"))
    def ranked(scored: DataFrame): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(col("cosine").desc, col("cand_id"))
      scored.withColumn("__rnk", row_number().over(w))
        .filter(col("__rnk") <= k).select("query_id", "cand_id")
    }
    val ivfTop = ranked(index.join(broadcast(qCells), Seq("cell"))
      .select(col("query_id"), col("__q"), col(idCol).as("cand_id"),
        col(embCol).cast("array<double>").as("__e"))
      .filter(col("cand_id") =!= col("query_id"))
      .dropDuplicates("query_id", "cand_id") // a vector in 2 probed cells
      .withColumn("cosine", round(Similarity.cosine(col("__e"), col("__q")), 6)))
    val bruteTop = ranked(emb
      .select(col(idCol).as("cand_id"), col(embCol).cast("array<double>").as("__e"))
      .crossJoin(broadcast(queries.select(col(idCol).as("query_id"),
        col(embCol).cast("array<double>").as("__q"))))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("cosine", round(Similarity.cosine(col("__e"), col("__q")), 6)))
    val hits = ivfTop
      .join(bruteTop, Seq("query_id", "cand_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("__h"))
    queries.select(col(idCol).as("query_id"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("__h"), lit(0L)).as("n_hits"), {
          val num = coalesce(col("__h"), lit(0L)) * 1000000L
          ((num - pmod(num, lit(k.toLong))) / k).cast("long").as("recall_ppm")
        })
      .orderBy("query_id")
  }

  /** Driver-side probe-cell choice for the fixed-centroid quantizer:
    * the nProbe centroids most cosine-similar to the query, ties to the
    * lower index. */
  def nearestCentroidCells(centroids: Seq[Seq[Double]], query: Seq[Double],
      nProbe: Int): Seq[Int] = {
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    centroids.zipWithIndex.map { case (c, i) => (i, cos(c, query)) }
      .sortBy { case (i, s) => (-s, i) }
      .take(nProbe).map(_._1)
  }
}
