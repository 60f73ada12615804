package graft.text

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING heavy hitters: maintain the frequent tokens of an
  * unbounded document stream in bounded state — the stream-side half
  * of [[TextAnalysis.heavyHitters]] (whose two-pass batch form
  * delivers exact counts over a finished corpus; run it over the
  * accumulated data when exactness matters — the lambda split this
  * module's near-dedup and curation streams already use).
  *
  * Shape: tokens shard by `xxhash64(token) % buckets` (every
  * occurrence of a token lands in ONE bucket, so a token's bucket
  * count IS its global count), and each bucket's
  * `flatMapGroupsWithState` keeps a Misra-Gries sketch of
  * `m = ⌈10⁶/supportPpm⌉` counters. The pigeonhole guarantee
  * composes: a token with global frequency ≥ supportPpm of the whole
  * stream has bucket-local frequency ≥ supportPpm of the bucket's
  * (smaller) stream, so it survives its bucket's sketch — candidates
  * are a SUPERSET of the true hitters at every trigger.
  *
  * What streaming costs vs the batch two-pass: MG counts are lower
  * bounds (each decrement round subtracts 1 from every survivor), so
  * emissions carry `[min_count, max_count]` with
  * `max_count − min_count = decrement rounds ≤ n_bucket/(m+1)` — the
  * classic MG error, tracked EXACTLY in state rather than bounded
  * after the fact. State is `buckets × m` entries, independent of
  * stream length; every trigger emits each bucket's full current
  * sketch (append mode), so the sink always holds a recent superset
  * snapshot and stale candidates age out by re-emission. */
object StreamingHeavyHitters {

  final case class HitterCandidate(bucket: Int, token: String,
      min_count: Long, max_count: Long, bucket_tokens: Long)

  /** counts = the MG sketch; n = tokens processed by this bucket;
    * dec = decrement rounds so far (the exact undercount of every
    * survivor that was present since its last insertion). */
  final case class SketchState(counts: Map[String, Long], n: Long, dec: Long)

  def candidates(docs: DataFrame, textCol: String, supportPpm: Long,
      buckets: Int = 64, stateTtlMs: Long = 0L): Dataset[HitterCandidate] = {
    require(supportPpm > 0 && supportPpm <= 1000000L,
      s"supportPpm in (0, 1e6], got $supportPpm")
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val spark = docs.sparkSession
    import spark.implicits._
    val m = (1000000L / supportPpm).toInt + 1
    val toks = docs.filter(col(textCol).isNotNull)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .select(pmod(xxhash64(col("token")), lit(buckets)).cast("int")
        .as("bucket"), col("token"))
      .as[(Int, String)]
    val timeoutKind =
      if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    toks.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, timeoutKind)(
        (bucket: Int, rows: Iterator[(Int, String)],
            state: GroupState[SketchState]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(
              SketchState(Map.empty, 0L, 0L))
            val counts = scala.collection.mutable.HashMap[String, Long](
              prev.counts.toSeq: _*)
            var n = prev.n
            var dec = prev.dec
            rows.foreach { case (_, t) =>
              n += 1
              counts.get(t) match {
                case Some(c) => counts.update(t, c + 1)
                case None if counts.size < m => counts.update(t, 1L)
                case None =>
                  dec += 1
                  val dead = counts.iterator.flatMap { case (k, c) =>
                    if (c == 1L) Some(k)
                    else { counts.update(k, c - 1); None }
                  }.toList
                  dead.foreach(counts.remove)
              }
            }
            state.update(SketchState(counts.toMap, n, dec))
            if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
            counts.iterator.map { case (t, c) =>
              HitterCandidate(bucket, t, c, c + dec, n)
            }.toList.iterator
          }
        })
  }
}
