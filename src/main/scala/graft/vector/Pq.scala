package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search") — the memory-bounded ANN path: split the
  * embedding into `M` subspaces, quantize each against its own small
  * codebook, and a vector compresses to `M` small ints (codes). Search
  * runs in the COMPRESSED domain via asymmetric distance computation
  * (ADC): the query precomputes an `M × K` lookup table of per-subspace
  * squared distances, and each candidate's approximate distance is just
  * `M` table lookups summed — no decompression, no float vector reads.
  *
  * Why it matters at 100 TB: a 1024-dim float32 corpus is 4 KB/vector;
  * PQ at M=64, K=256 is 64 BYTES/vector — a 64× storage cut that turns
  * a cluster-sized scan into a per-executor in-memory probe. PQ
  * composes with the IVF cell layout ([[Ivf]]): coarse-quantize into
  * cells, PQ-encode within, prune cells at file listing and scan only
  * codes. This module keeps the two orthogonal — [[encode]] consumes
  * any frame, including one carrying an IVF `cell` column.
  *
  * Determinism: codebooks are explicit literals (data-derived or
  * [[trainCodebooks]] output), assignment is argmin with ties to the
  * lower index, and the ADC sum is a fixed left-associated 4-term (M)
  * chain — the same discipline that makes the fixed-centroid IVF path
  * oracle-checkable end-to-end (q77 replays encode + ADC in SQL).
  *
  * Scale shape: [[encode]] is one narrow codegen'd pass (M·K
  * fold-distances per row, each over `dim/M` elements — same work as
  * ONE full-dim distance per centroid), no shuffle; the codes table is
  * the only thing search ever scans. [[adcTopK]] broadcasts the lookup
  * table inside a literal expression and runs scan → project →
  * TakeOrderedAndProject — no join, no global sort.
  */
object Pq {

  /** M × K × (dim/M) codebooks: `codebooks(m)(k)` is the k-th centroid
    * of subspace m. */
  type Codebooks = Seq[Seq[Seq[Double]]]

  /** Squared L2 between a slice of `emb` and a literal centroid, as a
    * single-evaluation fold (the zip_with array is built once per row —
    * the expression-shape discipline from README §scale). */
  private def sliceDist2(emb: Column, offset: Int, centroid: Seq[Double]): Column =
    aggregate(
      zip_with(slice(emb, offset + 1, centroid.length), typedLit(centroid),
        (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  private def checkCodebooks(codebooks: Codebooks): (Int, Int) = {
    require(codebooks.nonEmpty, "need at least one subspace codebook")
    val d0 = codebooks.head.head.length
    require(codebooks.forall(cb => cb.nonEmpty && cb.forall(_.length == d0)),
      "all codebooks must hold same-width centroids")
    (codebooks.length, d0)
  }

  /** PQ-encode: `(idCol, code)` with `code(m)` = index of the nearest
    * (squared-L2, ties to the lower index) centroid of subspace m.
    * Every other input column is carried through (an IVF `cell` column
    * survives encoding, which is how IVF-PQ composes). With `path` the
    * codes table is written to parquet — the durable compressed index;
    * the re-read is returned. */
  def encode(df: DataFrame, idCol: String, embCol: String,
      codebooks: Codebooks, path: Option[String] = None): DataFrame = {
    val (_, d0) = checkCodebooks(codebooks)
    val emb = col(embCol).cast("array<double>")
    val codeCols = codebooks.zipWithIndex.map { case (cb, m) =>
      // array_min over (dist, idx) structs: min distance, ties → min idx
      array_min(array(cb.zipWithIndex.map { case (c, k) =>
        struct(sliceDist2(emb, m * d0, c).as("dist"), lit(k).as("idx"))
      }: _*)).getField("idx")
    }
    val codes = df.withColumn("code", array(codeCols: _*)).drop(embCol)
    path match {
      case Some(p) =>
        codes.write.mode("overwrite").parquet(p)
        df.sparkSession.read.parquet(p)
      case None => codes
    }
  }

  /** The query-side ADC lookup table: `M × K` squared distances from the
    * query's subspace slices to every centroid. Driver-side, tiny. */
  def adcTable(codebooks: Codebooks, query: Seq[Double]): Seq[Seq[Double]] = {
    val (_, d0) = checkCodebooks(codebooks)
    require(query.length == codebooks.length * d0,
      s"query dim ${query.length} != ${codebooks.length}·$d0")
    codebooks.zipWithIndex.map { case (cb, m) =>
      cb.map { c =>
        var s = 0.0; var i = 0
        while (i < c.length) {
          val dd = query(m * d0 + i) - c(i); s += dd * dd; i += 1
        }
        s
      }
    }
  }

  /** ADC approximate distance column over a codes frame: M table
    * lookups summed in fixed left-associated order (deterministic —
    * never an aggregate whose order the engine picks). */
  def adcDistance(codeCol: Column, table: Seq[Seq[Double]]): Column =
    table.zipWithIndex.map { case (row, m) =>
      element_at(typedLit(row), codeCol.getItem(m) + 1)
    }.reduceLeft(_ + _)

  /** Top-k nearest by ADC distance over the compressed codes — the PQ
    * search path: scan codes, M lookups + (M−1) adds per row,
    * TakeOrderedAndProject. `round` to 6 decimals for cross-engine
    * comparability (same convention as the cosine queries). */
  def adcTopK(codes: DataFrame, idCol: String, codebooks: Codebooks,
      query: Seq[Double], topK: Int): DataFrame =
    codes.select(col(idCol),
        round(adcDistance(col("code"), adcTable(codebooks, query)), 6)
          .as("adist"))
      .orderBy(col("adist"), col(idCol))
      .limit(topK)

  /** Train per-subspace codebooks: M independent k-means fits over the
    * subspace slices, each on a bounded sample ([[Ivf.fitSample]] — at
    * corpus scale training is O(fitCap·K·iter·M) while encoding stays
    * the only full pass). Deterministic under the seed. */
  def trainCodebooks(df: DataFrame, embCol: String, m: Int, k: Int,
      seed: Long = 42L, fitCap: Long = 100000L): Codebooks = {
    require(m > 0 && k > 0, s"m/k must be positive, got $m/$k")
    val dim = df.select(size(col(embCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val d0 = dim / m
    val emb = col(embCol).cast("array<double>")
    (0 until m).map { mi =>
      val feat = df.select(
        org.apache.spark.ml.functions.array_to_vector(
          slice(emb, mi * d0 + 1, d0)).as("features"))
      val fitted = new org.apache.spark.ml.clustering.KMeans()
        .setK(k).setSeed(seed + mi).setMaxIter(10)
        .fit(Ivf.fitSample(feat, fitCap, seed + mi))
      // canonical centroid order so the trained codebook is stable
      // regardless of the engine's internal cluster numbering
      fitted.clusterCenters.map(_.toArray.toSeq).toSeq
        .sortBy(c => c.mkString(","))
    }
  }
}
