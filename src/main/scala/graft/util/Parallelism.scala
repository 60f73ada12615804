package graft.util

import org.apache.spark.sql.Dataset

/** One resolution of "the session's configured shuffle width" for every
  * operator that pins an explicit repartition width (the structural
  * fan-out exchanges AQE must not re-coalesce — see the pair-join pins
  * in [[graft.text.Dedup]]). Reading
  * `conf.get("spark.sql.shuffle.partitions").toInt` crashes on managed
  * platforms where the conf holds a non-integer (e.g. "auto");
  * `sessionState.conf.numShufflePartitions` is already an Int, and a
  * read that still fails falls back to the cluster's default
  * parallelism instead of turning a tuning knob into a crash. */
object Parallelism {
  def shuffleWidth(df: Dataset[_]): Int = {
    val ss = df.sparkSession
    try ss.sessionState.conf.numShufflePartitions
    catch { case _: Exception => ss.sparkContext.defaultParallelism }
  }
}
