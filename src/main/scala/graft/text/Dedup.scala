package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators over a documents table — the four standard
  * training-corpus techniques, each designed around ONE shuffle on a
  * bucket/hash key so the plan scales to 100 TB:
  *
  *   - exact:        hash text → groupBy(hash)           (1 shuffle)
  *   - MinHash LSH:  shingle → minhash sig → band →
  *                   groupBy(band bucket) → pair join    (shuffle on bucket)
  *   - SimHash:      64-bit sketch → 16-bit band buckets →
  *                   hamming verify within bucket
  *   - n-gram Jaccard: explode shingles → self-join on shingle →
  *                   pair-count / union verify
  *
  * The LSH paths never compare all N² pairs — candidates only form
  * within identical-bucket groups, which is what makes near-dedup
  * feasible at corpus scale. Bucket skew (a shingle/band shared by
  * thousands of docs) is handled by AQE skew-join splitting; degenerate
  * giant buckets can additionally be capped upstream by filtering
  * ubiquitous shingles (document-frequency cut), standard practice.
  */
object Dedup {

  // ---- exact -----------------------------------------------------------

  /** Exact duplicate groups: normalized-text hash → ids, sizes. */
  def exactDuplicateGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .agg(count(lit(1)).as("n"), min(col(idCol)).as("keep_id"))

  /** Keep one representative (min id) per exact-duplicate group.
    * Implemented as min-id-per-hash + semi-join, not dropDuplicates, so
    * the survivor choice is deterministic under any partitioning. */
  def dedupExact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = exactDuplicateGroups(df, idCol, textCol)
      .select(col("keep_id").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  // ---- shingling -------------------------------------------------------

  /** k-word shingles (distinct), as strings. */
  def shingles(c: Column, k: Int): Column = {
    val toks = TextAnalysis.tokens(c)
    array_distinct(
      when(size(toks) >= k,
        transform(sequence(lit(0), size(toks) - lit(k)),
          i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
        .otherwise(array(concat_ws(" ", toks))))
  }

  // ---- MinHash + LSH ---------------------------------------------------

  /** MinHash signature: for seed s, min over shingles of
    * xxhash64(seed, shingle). Seeded by prepending the seed index —
    * one pass over the shingle array per hash, all inside codegen. */
  def minhashSignature(c: Column, k: Int = 3, numHashes: Int = 32): Column = {
    val sh = shingles(c, k)
    transform(sequence(lit(0), lit(numHashes - 1)),
      s => array_min(transform(sh, x => xxhash64(s, x))))
  }

  /** LSH band buckets from a signature: `bands` buckets, each hashing
    * `rowsPerBand` consecutive signature entries (banding theorem:
    * P(candidate) = 1-(1-j^r)^b for Jaccard j). */
  def lshBuckets(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(lit(b), concat_ws(",", slice(sig, b * rowsPerBand + 1, rowsPerBand)))
          .as("bucket"))
    }: _*)

  /** Candidate near-duplicate pairs via MinHash LSH, verified by
    * signature agreement (estimated Jaccard). Output:
    * (id_a, id_b, est_jaccard) with id_a < id_b. */
  def minhashCandidatePairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.5): DataFrame = {
    val withSig = df.select(col(idCol).as("id"),
      minhashSignature(col(textCol), k, numHashes).as("sig"))
    val rowsPerBand = numHashes / bands
    val exploded = withSig
      .select(col("id"), col("sig"),
        explode(lshBuckets(col("sig"), bands, rowsPerBand)).as("bb"))
      .select(col("id"), col("sig"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    // pairs within a bucket: self-join on (band,bucket); dedup multi-band
    // collisions with distinct on the id pair
    val a = exploded.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val b = exploded.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    val pairs = a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .dropDuplicates("id_a", "id_b")
    pairs.withColumn("est_jaccard",
        aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / lit(numHashes.toDouble))
      .filter(col("est_jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard")
  }

  // ---- SimHash ---------------------------------------------------------

  /** Near-duplicate pairs by SimHash: bucket on 4×16-bit bands (two docs
    * within hamming distance ≤ maxHamming agree on ≥1 band whenever
    * distance < 4 bands), verify with bit_count. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 6): DataFrame = {
    val withSh = df.select(col(idCol).as("id"),
      TextAnalysis.simhash64(col(textCol)).as("sh"))
    val banded = withSh.select(col("id"), col("sh"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("sh"), b * 16).bitwiseAND(lit(0xffffL)).as("bits"))
      }: _*)).as("bb"))
      .select(col("id"), col("sh"), col("bb.band").as("band"), col("bb.bits").as("bits"))
    val a = banded.select(col("band"), col("bits"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("bits"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "bits"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", TextAnalysis.hamming64(col("sh_a"), col("sh_b")))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  // ---- n-gram Jaccard --------------------------------------------------

  /** True Jaccard similarity over k-word shingle sets, computed
    * distributively: explode → self-join on shingle → pair intersection
    * counts vs per-doc set sizes. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      explode(shingles(col(textCol), k)).as("shingle"))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val inter = sh.alias("x").join(sh.alias("y"), Seq("shingle"))
      .filter(col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("sz").as("sz_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
