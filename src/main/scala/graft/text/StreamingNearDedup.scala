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
  *   - `maxPerBucket` caps entries per bucket (oldest evicted first) —
  *     the streaming analog of the document-frequency cut, bounding
  *     both memory and per-event compare cost under degenerate buckets.
  *
  * A doc matching in several bands yields one candidate per matching
  * band; collapse downstream (`groupBy(doc_id).agg(min(dup_of))` in the
  * sink batch) — emitted candidates are append-only so any sink works.
  */
object StreamingNearDedup {

  final case class DupCandidate(doc_id: Long, dup_of: Long, band: Int,
      est_jaccard: Double)

  // per-bucket state: ids + signatures of docs seen in this bucket
  final case class BucketState(entries: List[(Long, Seq[Long])])

  def candidates(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 32, bands: Int = 16,
      threshold: Double = 0.8, maxPerBucket: Int = 1000): Dataset[DupCandidate] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rowsPerBand = numHashes / bands
    val exploded = docs
      .select(col(idCol).cast("long").as("id"),
        Dedup.minhashSignature(col(textCol), k, numHashes).as("sig"))
      .select(col("id"), col("sig"),
        explode(Dedup.lshBuckets(col("sig"), bands, rowsPerBand)).as("bb"))
      .select(col("id"), col("sig"), col("bb.band").as("band"),
        col("bb.bucket").as("bucket"))
      .as[(Long, Seq[Long], Int, Long)]

    exploded
      .groupByKey { case (_, _, band, bucket) => (band, bucket) }
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: (Int, Long), rows: Iterator[(Long, Seq[Long], Int, Long)],
            state: GroupState[BucketState]) => {
          val seen = state.getOption.map(_.entries).getOrElse(Nil)
          // deterministic in-batch order: ids ascending, so an in-batch
          // duplicate pair is flagged once, newer against older
          val arrivals = rows.toList.sortBy(_._1)
          val out = scala.collection.mutable.ListBuffer.empty[DupCandidate]
          var cur = seen
          arrivals.foreach { case (id, sig, band, _) =>
            cur.foreach { case (eid, esig) =>
              if (eid != id) {
                var agree = 0
                var i = 0
                while (i < sig.length) {
                  if (sig(i) == esig(i)) agree += 1
                  i += 1
                }
                val est = agree.toDouble / sig.length
                if (est >= threshold) out += DupCandidate(id, eid, band, est)
              }
            }
            cur = (id, sig) :: cur
          }
          state.update(BucketState(cur.take(maxPerBucket)))
          out.iterator
        })
  }
}
