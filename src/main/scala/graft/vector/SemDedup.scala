package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup (Abbas et al., 2023, "SemDeDup: Data-efficient learning at
  * web-scale through semantic deduplication"): embedding-space near-
  * dedup via cluster-then-prune — assign every vector to its nearest
  * centroid, compare pairs ONLY within a cluster, and keep one
  * representative of each semantic-duplicate pair.
  *
  * This is the third point in the engine's embedding-dedup trade space:
  *   - [[Similarity.exactNearDuplicatePairs]] — exact, all-pairs via
  *     block theta-join: O(N²) compute, any threshold.
  *   - [[Similarity.bandedNearDuplicatePairs]] — sign-bit LSH banding:
  *     near-linear, but only sound at HIGH thresholds.
  *   - SemDeDup — clustering prunes the pair space to within-cluster:
  *     O(Σ|cell|²) compute at ANY threshold, trading recall for pairs
  *     that straddle a cluster boundary (the paper's accepted miss).
  *
  * Scale shape: assignment is one narrow codegen pass (k cosines per
  * row, no shuffle); the pair join shuffles on `cell` only. Cluster
  * count is the knob — the paper uses k ≈ √N so expected cell size is
  * √N and within-cell pairs stay near-linear overall; skewed cells
  * split under AQE skew-join handling. Survivorship is deterministic
  * min-id (same rule as [[graft.text.Dedup.dedupByPairs]]).
  */
object SemDedup {

  /** Semantic-duplicate pairs: within-cell pairs with
    * round(cosine, 6) ≥ threshold. Output (id_a, id_b, cell, cosine),
    * id_a < id_b. `centroids` fixes the quantizer
    * ([[Ivf.fixedCentroidIndex]] — exactly reproducible cross-engine);
    * use [[Ivf.buildIndex]]'s k-means cells via [[pairsInCells]] when
    * adaptivity matters more than reproducibility.
    *
    * `nProbe` > 1 switches to MULTI-PROBE assignment
    * ([[Ivf.fixedCentroidMultiIndex]]): every vector participates in
    * its nProbe nearest cells, so a pair straddling one cell boundary
    * still meets — the standard mitigation for the cluster-boundary
    * recall miss, at nProbe× the assignment rows (pair work stays
    * within-cell). A pair sharing several probe cells is emitted ONCE
    * (its lowest shared cell); emitted cosines are true pair cosines,
    * so multi-probe output ⊆ the exact all-pairs set at the same
    * threshold, with recall between single-probe and exact. */
  def semanticDuplicatePairs(df: DataFrame, idCol: String, embCol: String,
      centroids: Seq[Seq[Double]], threshold: Double,
      nProbe: Int = 1): DataFrame =
    if (nProbe <= 1)
      pairsInCells(Ivf.fixedCentroidIndex(df, idCol, embCol, centroids),
        idCol, embCol, threshold)
    else {
      val multi = Ivf.fixedCentroidMultiIndex(df, idCol, embCol,
          centroids, nProbe)
        .select(col(idCol).as("id"),
          col(embCol).cast("array<double>").as("emb"), col("cell"))
        .localCheckpoint()
      // dedupe cross-probe duplicates: min shared cell; cosine is
      // pair-determined, so min() just picks the one value
      pairJoin(multi, threshold)
        .groupBy("id_a", "id_b")
        .agg(min("cell").as("cell"), min("cosine").as("cosine"))
        .select("id_a", "id_b", "cell", "cosine")
    }

  /** Within-cell duplicate pairs over a prebuilt assignment (`cell`
    * column — fixed-centroid or k-means). The assignment is read twice
    * (both join sides) — materialized once. */
  def pairsInCells(assigned: DataFrame, idCol: String, embCol: String,
      threshold: Double): DataFrame =
    pairJoin(assigned.select(col(idCol).as("id"),
      col(embCol).cast("array<double>").as("emb"), col("cell"))
      .localCheckpoint(), threshold)

  /** The within-cell pair join over an already-materialized
    * (id, emb, cell) frame. */
  private def pairJoin(base: DataFrame, threshold: Double): DataFrame =
    base.select(col("id").as("id_a"), col("emb").as("emb_a"), col("cell"))
      .join(base.select(col("id").as("id_b"), col("emb").as("emb_b"), col("cell")),
        Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", round(Similarity.cosine(col("emb_a"), col("emb_b")), 6))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cell", "cosine")

  /** SemDeDup proper: the corpus minus the greater member of every
    * semantic-duplicate pair. Output (idCol, cell) — survivors with
    * their PRIMARY (nearest-centroid) cluster, the artifact a curation
    * pipeline persists (partitionBy(cell) at scale, like the IVF
    * index). `nProbe` > 1 widens pair DISCOVERY to multi-probe cells
    * (see [[semanticDuplicatePairs]]); survivor cells stay primary. */
  def semDedup(df: DataFrame, idCol: String, embCol: String,
      centroids: Seq[Seq[Double]], threshold: Double,
      nProbe: Int = 1): DataFrame = {
    val assigned = Ivf.fixedCentroidMultiIndex(df, idCol, embCol,
        centroids, math.max(1, nProbe))
      .select(col(idCol).as("id"),
        col(embCol).cast("array<double>").as("emb"), col("probe"),
        col("cell"))
      .localCheckpoint() // pair join reads it twice, survivors once
    val drop = pairJoin(assigned.drop("probe"), threshold)
      .select(col("id_b").as("id")).distinct()
    assigned.filter(col("probe") === 0)
      .join(drop, Seq("id"), "left_anti")
      .select(col("id").as(idCol), col("cell"))
  }
}
