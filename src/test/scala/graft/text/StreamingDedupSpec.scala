package graft.text

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Ingest-time exact dedup over a stream: first occurrence passes,
  * re-occurrences (same fingerprint, any later micro-batch within the
  * watermark) are dropped, reflow/case variants collapse. */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("ts", TimestampType),
    StructField("text", StringType)))

  test("streaming NEAR dedup: arrival flagged against earlier near-identical doc") {
    val in = Files.createTempDirectory("sneardedup").toString
    def row(id: Long, t: String, ts: String) =
      s"""{"doc_id":$id,"ts":"$ts","text":"$t"}"""
    val base = "the quick brown fox jumps over the lazy dog and then naps all afternoon"
    val near = "the quick brown fox jumps over the lazy dog and then naps all evening"
    // batch 1: original + unrelated; batch 2: near-dup + unrelated
    Files.writeString(java.nio.file.Paths.get(s"$in/b0.json"),
      Seq(row(1, base, "2024-01-01T10:00:00Z"),
        row(2, "completely different words about columnar engines", "2024-01-01T10:00:01Z")
      ).mkString("\n"))
    Files.writeString(java.nio.file.Paths.get(s"$in/b1.json"),
      Seq(row(3, near, "2024-01-01T10:00:02Z"),
        row(4, "yet another unrelated text body entirely", "2024-01-01T10:00:03Z")
      ).mkString("\n"))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(in)
    val cands = StreamingNearDedup.candidates(stream, "doc_id", "text",
      k = 2, numHashes = 32, bands = 16, threshold = 0.5)
    val q = cands.writeStream
      .format("memory").queryName("sneardedup_out")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("snd-cp").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val pairs = spark.table("sneardedup_out")
      .select("doc_id", "dup_of").distinct()
      .as[(String, String)].collect().toSet
    // normalized pair (larger id flagged), regardless of pickup order;
    // unrelated docs never flagged
    assert(pairs == Set(("3", "1")),
      s"expected exactly the normalized near-dup pair, got $pairs")
  }

  test("streaming exact dedup drops re-occurrences across micro-batches") {
    val in = Files.createTempDirectory("sdedup").toString
    def row(id: Long, t: String, ts: String) =
      s"""{"doc_id":$id,"ts":"$ts","text":"$t"}"""
    // two files → with maxFilesPerTrigger=1, two micro-batches
    Files.writeString(java.nio.file.Paths.get(s"$in/b0.json"),
      Seq(row(1, "alpha beta gamma", "2024-01-01T10:00:00Z"),
        row(2, "delta epsilon", "2024-01-01T10:00:01Z"),
        row(3, "alpha beta gamma", "2024-01-01T10:00:02Z") // dup in-batch
      ).mkString("\n"))
    Files.writeString(java.nio.file.Paths.get(s"$in/b1.json"),
      Seq(row(4, "ALPHA   beta gamma", "2024-01-01T10:00:03Z"), // reflow dup
        row(5, "zeta eta", "2024-01-01T10:00:04Z")
      ).mkString("\n"))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(in)
    val deduped = Dedup.dedupExactStream(stream, "text", "ts", watermark = "1 hour")
    val q = deduped.writeStream
      .format("memory").queryName("sdedup_out")
      .option("checkpointLocation", Files.createTempDirectory("sdedup-cp").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val ids = spark.table("sdedup_out").select("doc_id").as[Long].collect().toSet
    // docs 1/3/4 share one fingerprint (3 verbatim, 4 via case/reflow
    // normalization): exactly ONE survives — whichever arrived first
    // (file pickup order is not deterministic); 2 and 5 always survive
    assert(ids.size == 3, s"expected 3 survivors, got $ids")
    assert((ids & Set(1L, 3L, 4L)).size == 1,
      s"exactly one of the duplicate trio must survive, got $ids")
    assert(Set(2L, 5L).subsetOf(ids), s"unique docs must survive, got $ids")
  }
}
