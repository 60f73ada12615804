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
