package graft.text

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING near-duplicate detection: flag each arriving document
  * against every document seen before it, without ever joining the
  * stream to the full corpus.
  *
  * Shape: minhash signature per doc → explode to its LSH band buckets →
  * `groupByKey(band, bucket)` → `flatMapGroupsWithState` keeps the
  * (id, signature) entries previously seen IN THAT BUCKET and emits a
  * [[StreamingNearDedup.DupCandidate]] whenever a new doc's signature
  * agrees with a stored one at ≥ threshold. The banding theorem does
  * the heavy lifting exactly as in batch: only near-identical docs
  * share a band bucket, so per-bucket state stays tiny and the
  * comparison work is O(bucket occupancy), not O(corpus).
  *
  * State discipline (what makes this viable on an unbounded stream):
  *   - state lives per (band, bucket) — the natural shard key;
  *   - `maxPerBucket` caps entries per bucket (newest kept), enforced
  *     BOTH on stored state and on in-batch growth, so a degenerate
  *     bucket (boilerplate flood) costs O(arrivals × cap) compares,
  *     never O(arrivals²) — the streaming analog of the batch
  *     document-frequency cut;
  *   - `stateTtlMs` > 0 expires buckets untouched for that long
  *     (processing-time timeout) — total state is then bounded by the
  *     arrival rate × TTL window instead of corpus size. 0 keeps state
  *     forever: exact "against everything ever seen" semantics, at the
  *     cost of state growing with the corpus (≈ bands × docs entries) —
  *     choose per deployment.
  *
  * Emitted pairs are NORMALIZED (larger id flagged as the duplicate of
  * the smaller), so downstream min-id survivorship is deterministic
  * regardless of how arrivals split across micro-batches. Docs with
  * NULL text produce no signature and are passed over (they can't be
  * near-duplicates of anything). A doc matching in several bands
  * yields one candidate per matching band; collapse downstream
  * (`groupBy(doc_id).agg(min(dup_of))` in the sink batch) — candidates
  * are append-only so any sink works.
  */
object StreamingNearDedup {

  /** Ids are strings so any key type survives (a long id arrives as its
    * decimal string — no lossy cast, no encoder crash on non-numeric). */
  final case class DupCandidate(doc_id: String, dup_of: String, band: Int,
      est_jaccard: Double)

  // per-bucket state: ids + signatures of docs seen in this bucket
  final case class BucketState(entries: List[(String, Seq[Long])])

  def candidates(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 32, bands: Int = 16,
      threshold: Double = 0.8, maxPerBucket: Int = 1000,
      stateTtlMs: Long = 0L): Dataset[DupCandidate] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rowsPerBand = numHashes / bands
    val exploded = docs
      .select(col(idCol).cast("string").as("id"),
        Dedup.minhashSignature(col(textCol), k, numHashes).as("sig"))
      .filter(col("id").isNotNull && col("sig").isNotNull) // null text → no sketch
      .select(col("id"), col("sig"),
        explode(Dedup.lshBuckets(col("sig"), bands, rowsPerBand)).as("bb"))
      .select(col("id"), col("sig"), col("bb.band").as("band"),
        col("bb.bucket").as("bucket"))
      .as[(String, Seq[Long], Int, Long)]

    val timeoutKind =
      if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout

    exploded
      .groupByKey { case (_, _, band, bucket) => (band, bucket) }
      .flatMapGroupsWithState(OutputMode.Append, timeoutKind)(
        (key: (Int, Long), rows: Iterator[(String, Seq[Long], Int, Long)],
            state: GroupState[BucketState]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val seen = state.getOption.map(_.entries).getOrElse(Nil)
            // deterministic in-batch order: ids ascending
            val arrivals = rows.toList.sortBy(_._1)
            val out = scala.collection.mutable.ListBuffer.empty[DupCandidate]
            var cur = seen
            arrivals.foreach { case (id, sig, band, _) =>
              // compare against at most maxPerBucket entries (newest first)
              var already = false
              cur.iterator.take(maxPerBucket).foreach { case (eid, esig) =>
                if (eid == id) already = true // re-delivery: don't re-store
                else {
                  var agree = 0
                  var i = 0
                  while (i < sig.length) {
                    if (sig(i) == esig(i)) agree += 1
                    i += 1
                  }
                  val est = agree.toDouble / sig.length
                  if (est >= threshold) {
                    // normalized: larger id is the duplicate of the smaller,
                    // independent of micro-batch boundaries
                    val (dup, of) = if (id > eid) (id, eid) else (eid, id)
                    out += DupCandidate(dup, of, band, est)
                  }
                }
              }
              if (!already) cur = ((id, sig) :: cur).take(maxPerBucket)
            }
            state.update(BucketState(cur))
            if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
            out.iterator
          }
        })
  }
}
