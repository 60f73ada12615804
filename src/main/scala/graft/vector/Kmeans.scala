package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over an embedding column — the full-data
  * clustering [[Ivf.buildIndex]]'s sample-bounded fit deliberately
  * avoids. Use the sampled fit to seed, and this to refine on the whole
  * corpus when cluster quality matters (SemDeDup cells, IVF coarse
  * quantizers, corpus cartography).
  *
  * One Lloyd step = assign every vector to its nearest centroid
  * ([[Ivf.fixedCentroidIndex]] — one codegen pass, cosine, ties to the
  * lower index) + recompute each centroid as the member mean. The mean
  * runs in exact fixed-point: components floor to micros
  * (`floor(x·10⁶)`, one IEEE multiply both engines), per-(cell, dim)
  * integer sums (association-free), and one floor division by the cell
  * count — so a step is bit-identical across engines and partitionings.
  *
  * Scale shape: assignment is a narrow projection (k cosines per row,
  * no shuffle). The mean is a posexplode → hash-agg on (cell, dim) —
  * k·d output rows; hot cells die in map-side partials. Driver traffic
  * per iteration is the k·d centroid table — bounded, independent of
  * corpus size. This is the canonical distributed k-means; anything
  * "cleverer" (per-partition vector sums) is the same aggregation
  * Catalyst already plans, minus codegen.
  */
object Kmeans {

  /** One Lloyd step from fixed centroids: `(cell, dim, centroid_fp,
    * centroid)` — dim is 1-based, `centroid = centroid_fp / 10⁶`.
    * Cells with no members vanish from the output (the caller keeps
    * the previous centroid — standard empty-cluster handling). */
  def lloydStepFp(df: DataFrame, idCol: String, embCol: String,
      centroids: Seq[Seq[Double]]): DataFrame =
    Ivf.fixedCentroidIndex(df, idCol, embCol, centroids)
      .select(col("cell"),
        posexplode(col(embCol).cast("array<double>")).as(Seq("__pos", "__x")))
      .select(col("cell"), (col("__pos") + 1).cast("long").as("dim"),
        floor(col("__x") * lit(1000000L)).cast("long").as("__xfp"))
      .groupBy("cell", "dim")
      .agg(sum("__xfp").as("__sx"), count(lit(1)).as("__n"))
      .select(col("cell"), col("dim"),
        ((col("__sx") - pmod(col("__sx"), col("__n"))) / col("__n"))
          .cast("long").as("centroid_fp"))
      .withColumn("centroid", col("centroid_fp").cast("double") / lit(1000000.0))

  /** Run `iterations` full-data Lloyd steps from `init`. Returns the
    * refined centroids (empty cells keep their previous centroid). */
  def lloyd(df: DataFrame, idCol: String, embCol: String,
      init: Seq[Seq[Double]], iterations: Int): Seq[Seq[Double]] = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    var cents = init.toVector
    for (_ <- 0 until iterations) {
      val step = lloydStepFp(df, idCol, embCol, cents)
        .select("cell", "dim", "centroid").collect()
        .groupBy(_.getInt(0))
        .map { case (c, rows) =>
          c -> rows.sortBy(_.getLong(1)).map(_.getDouble(2)).toVector
        }
      cents = cents.zipWithIndex.map { case (prev, i) =>
        step.getOrElse(i, prev)
      }
    }
    cents
  }
}
