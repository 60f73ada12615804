package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, matching the usual build-out of an ANN system:
  *   - brute-force cosine top-k — the exactness baseline. One narrow
  *     pass computing dot/norms inside codegen + a top-k (TakeOrdered,
  *     no full sort shuffle).
  *   - LSH-bucketed ANN (random-hyperplane signatures) — the scale path:
  *     vectors bucket by sign-bit signature; a query probes only its
  *     bucket (+ multi-probe neighbors), turning O(N) scans into
  *     O(N/2^bits). Hyperplanes are derived deterministically from a
  *     seed so index and query sides agree without sharing state.
  *
  * At 100 TB the bucketed table is written partitioned by signature —
  * a probe prunes to a handful of partitions at the file-listing level.
  */
object Similarity {

  /** Dot product of two array<double> columns — sequential left fold,
    * stays in whole-stage codegen. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Exact brute-force cosine top-k against a constant query vector.
    * Deterministic ordering: (similarity desc, id asc). */
  def cosineTopK(df: DataFrame, idCol: String, embCol: String,
      query: Seq[Double], k: Int): DataFrame = {
    val q = typedLit(query)
    df.select(col(idCol),
        round(cosine(asDouble(col(embCol)), q), 6).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplanes: component j of plane p is
    * a hash of (seed, p, j) mapped into [-1, 1]. Same derivation on
    * index and query side — no state to ship. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] =
    (0 until nPlanes).map { p =>
      (0 until dim).map { j =>
        val h = scala.util.hashing.MurmurHash3.productHash((seed, p, j))
        (h.toDouble / Int.MaxValue.toDouble) // [-1, 1]
      }
    }

  /** Sign-bit LSH signature of an embedding under `planes`. */
  def lshSignature(emb: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (plane, i) =>
      when(dot(asDouble(emb), typedLit(plane)) >= 0,
        shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Build the bucketed index: id, embedding, signature bucket. Persist
    * partitioned-by-bucket for partition-pruned probes. */
  def lshIndex(df: DataFrame, idCol: String, embCol: String,
      nPlanes: Int = 8, dim: Int = 64, seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(nPlanes, dim, seed)
    df.select(col(idCol), col(embCol),
      lshSignature(col(embCol), planes).as("bucket"))
  }

  /** Multi-probe neighbor buckets: the query's bucket plus all buckets
    * at hamming distance 1 (flip each bit once). */
  def probeBuckets(sig: Long, nPlanes: Int): Seq[Long] =
    sig +: (0 until nPlanes).map(i => sig ^ (1L << i))

  /** ANN top-k: prune to probe buckets, then exact cosine within them.
    * Recall is tunable via nPlanes (fewer planes = bigger buckets) and
    * the multi-probe radius. */
  def annTopK(index: DataFrame, idCol: String, embCol: String,
      query: Seq[Double], k: Int, nPlanes: Int = 8, seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(nPlanes, query.length, seed)
    val qSig = {
      // driver-side signature of the constant query vector
      planes.zipWithIndex.map { case (plane, i) =>
        val d = plane.zip(query).map { case (a, b) => a * b }.sum
        if (d >= 0) 1L << i else 0L
      }.reduce(_ | _)
    }
    val probes = probeBuckets(qSig, nPlanes)
    index.filter(col("bucket").isin(probes: _*))
      .select(col(idCol),
        round(cosine(asDouble(col(embCol)), typedLit(query)), 6).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** All-pairs near neighbors within LSH buckets (for embedding-cosine
    * near-dup detection): pairs sharing a bucket, verified by exact
    * cosine ≥ threshold. */
  def nearDuplicatePairs(df: DataFrame, idCol: String, embCol: String,
      threshold: Double, nPlanes: Int = 8, dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    val idx = lshIndex(df, idCol, embCol, nPlanes, dim, seed)
      .localCheckpoint() // bucket index built once; pair join reads it 2×
    val a = idx.select(col("bucket"), col(idCol).as("id_a"), col(embCol).as("emb_a"))
    val b = idx.select(col("bucket"), col(idCol).as("id_b"), col(embCol).as("emb_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cosine",
        round(cosine(asDouble(col("emb_a")), asDouble(col("emb_b"))), 6))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
