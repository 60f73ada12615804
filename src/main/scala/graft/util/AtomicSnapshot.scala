package graft.util

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Crash-safe snapshot-directory swap, shared by the warehouse writer and
  * the DLQ replay ledger.
  *
  * POSIX cannot atomically swap directories, so the dest→old, staging→dest
  * dance has a crash window with dest absent. The invariant here is that
  * data always survives in EITHER `dest` or `dest__old`, and `read`
  * RECOVERS: if dest is missing but old exists, old is moved back before
  * reading. A crash can lose at most the in-flight batch (which the
  * stream replays from its checkpoint — merges are idempotent), never the
  * accumulated snapshot.
  */
object AtomicSnapshot {

  private def oldPath(dest: String) = s"${dest}__old"
  private def stagingPath(dest: String) = s"${dest}__staging"

  private def deleteRecursive(p: Path): Unit = Fs.deleteRecursive(p)

  /** Write `df` as the new snapshot at `dest` (overwrite semantics). */
  def write(df: DataFrame, dest: String): Unit = {
    val staging = stagingPath(dest)
    df.write.mode("overwrite").parquet(staging)
    val destP = Paths.get(dest)
    val oldP = Paths.get(oldPath(dest))
    if (Files.exists(destP)) {
      deleteRecursive(oldP)
      Files.move(destP, oldP)
      Files.move(Paths.get(staging), destP)
      deleteRecursive(oldP)
    } else Files.move(Paths.get(staging), destP)
  }

  /** Read the snapshot, recovering from a crash mid-swap: a missing dest
    * with a surviving `__old` is rolled back before reading. */
  def read(spark: SparkSession, dest: String): Option[DataFrame] = {
    val destP = Paths.get(dest)
    val oldP = Paths.get(oldPath(dest))
    if (!Files.exists(destP) && Files.exists(oldP))
      Files.move(oldP, destP) // crash between the two moves: roll back
    if (Files.exists(destP)) Some(spark.read.parquet(dest)) else None
  }
}
