package graft.util

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc.Upsert

/** Bucket-partitioned COPY-ON-WRITE warehouse table — the scale answer
  * to the snapshot path's full-table rewrite per micro-batch.
  *
  * Layout: `dest/__bucket=<i>/part-*.parquet`, bucket =
  * pmod(xxhash64(keys), n). A merge:
  *   1. computes the (≤ n) buckets the update keys hash into,
  *   2. reads ONLY those bucket directories (partition pruning — the
  *      plan's PartitionFilters cut at file listing, untouched buckets
  *      are never opened),
  *   3. runs the same idempotent [[Upsert.mergeBatch]] kernel on that
  *      subset,
  *   4. swaps ONLY the affected bucket directories (staging → dest with
  *      a per-bucket backup dance, same invariant as [[AtomicSnapshot]]).
  *
  * Rewrite cost is therefore ∝ touched buckets, not table size: a batch
  * touching k of n buckets rewrites k/n of the table — at 100 TB with
  * n sized so a bucket fits an executor (e.g. 4096), a typical CDC batch
  * rewrites a few hundred GB instead of the full table. This is the
  * Delta/Iceberg copy-on-write granularity, implemented on plain
  * parquet; what a table format's transaction log would add is
  * all-or-nothing visibility across buckets — here a crash mid-swap can
  * expose a torn (some-buckets-new) snapshot that the checkpoint's
  * batch REPLAY heals, because the merge kernel is idempotent and
  * monotonic per key. `read` additionally rolls back any bucket whose
  * swap crashed between its two moves, so no bucket is ever lost.
  */
object BucketedTable {

  def bucketCol(keys: Seq[String], n: Int): Column =
    pmod(xxhash64(keys.map(col): _*), lit(n)).cast("int")

  private def oldRoot(dest: String) = s"${dest}__oldb"
  private def stagingRoot(dest: String) = s"${dest}__stagingb"
  private def bucketDir(root: String, b: Int): Path =
    Paths.get(root, s"__bucket=$b")

  private def deleteRecursive(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))

  /** Roll back any bucket whose swap crashed between moves (dest dir
    * missing, backup present). Idempotent; called before read and merge. */
  def recover(dest: String): Unit = {
    val or = Paths.get(oldRoot(dest))
    if (Files.exists(or)) {
      Files.list(or).forEach { backup =>
        val destDir = Paths.get(dest, backup.getFileName.toString)
        if (!Files.exists(destDir)) Files.move(backup, destDir)
        else deleteRecursive(backup)
      }
      deleteRecursive(or)
    }
  }

  /** Full (re)write — initial load only; merges after that are COW. */
  def writeFull(df: DataFrame, dest: String, keys: Seq[String], n: Int): Unit = {
    val staging = stagingRoot(dest)
    df.withColumn("__bucket", bucketCol(keys, n))
      .write.partitionBy("__bucket").mode("overwrite").parquet(staging)
    deleteRecursive(Paths.get(dest))
    Files.move(Paths.get(staging), Paths.get(dest))
  }

  def read(spark: SparkSession, dest: String): Option[DataFrame] = {
    recover(dest)
    if (Files.exists(Paths.get(dest)))
      Some(spark.read.parquet(dest).drop("__bucket"))
    else None
  }

  /** COW merge of one collapsed update batch (same contract as the
    * snapshot path: `updates` carries key cols, `ordCol`, `deleteCol`,
    * data cols). */
  def merge(spark: SparkSession, dest: String, updates: DataFrame,
      keys: Seq[String], ordCol: String, deleteCol: String,
      partialUpdateCols: Seq[String], n: Int): Unit = {
    recover(dest)
    if (!Files.exists(Paths.get(dest))) {
      writeFull(
        Upsert.collapseBatch(updates, keys, col(ordCol), deleteCol,
          partialUpdateCols).drop(deleteCol),
        dest, keys, n)
      return
    }
    val touched = updates.select(bucketCol(keys, n).as("b"))
      .distinct().collect().map(_.getInt(0)).sorted
    if (touched.isEmpty) return
    // partition pruning: only the touched bucket dirs are listed/read
    val target = spark.read.parquet(dest)
      .filter(col("__bucket").isin(touched.map(Integer.valueOf).toSeq: _*))
      .drop("__bucket")
    val merged = Upsert.mergeBatch(target, updates, keys, ordCol, deleteCol,
      partialUpdateCols)
      .withColumn("__bucket", bucketCol(keys, n))
    val staging = stagingRoot(dest)
    deleteRecursive(Paths.get(staging))
    merged.write.partitionBy("__bucket").mode("overwrite").parquet(staging)
    // per-bucket swap with the AtomicSnapshot invariant: the bucket's
    // data survives in either dest or the backup at every instant
    Files.createDirectories(Paths.get(oldRoot(dest)))
    touched.foreach { b =>
      val bDest = bucketDir(dest, b)
      val bOld = bucketDir(oldRoot(dest), b)
      val bStage = bucketDir(staging, b)
      deleteRecursive(bOld)
      if (Files.exists(bDest)) Files.move(bDest, bOld)
      if (Files.exists(bStage)) Files.move(bStage, bDest)
      // else: every key in this bucket was deleted — the dir stays absent
      deleteRecursive(bOld)
    }
    deleteRecursive(Paths.get(oldRoot(dest)))
    deleteRecursive(Paths.get(staging))
  }
}
