package graft.util

import java.nio.file.{Files, Path}

/** Shared filesystem helpers (AtomicSnapshot + BucketedTable): every
  * directory stream is closed — these run per micro-batch, so a leaked
  * descriptor per call would exhaust the driver's fd table. */
object Fs {

  def deleteRecursive(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
      finally walk.close()
    }

  def listDir(p: Path): Seq[Path] =
    if (!Files.exists(p)) Seq.empty
    else {
      val s = Files.list(p)
      try {
        val it = s.iterator()
        val buf = scala.collection.mutable.ArrayBuffer.empty[Path]
        while (it.hasNext) buf += it.next()
        buf.toSeq
      } finally s.close()
    }
}
