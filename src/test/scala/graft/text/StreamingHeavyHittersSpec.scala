package graft.text

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Streaming Misra-Gries heavy hitters: candidate superset guarantee
  * across micro-batches, exact bound bookkeeping, bounded sketches. */
class StreamingHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  test("hitters survive the sketch across batches with true counts inside the bounds") {
    val in = Files.createTempDirectory("shh").toString
    // 2 batches; "hot" appears 12×, "warm" 6×, 30 singletons spread over
    // both. support 10% of the 48-token stream → threshold 4.8 ⇒
    // {hot, warm} are the true hitters.
    def doc(id: Long, t: String) = s"""{"doc_id":$id,"text":"$t"}"""
    Files.writeString(java.nio.file.Paths.get(s"$in/b0.json"),
      Seq(doc(1, "hot hot hot hot hot hot warm warm warm " +
        (1 to 15).map(i => s"u$i").mkString(" "))).mkString("\n"))
    Files.writeString(java.nio.file.Paths.get(s"$in/b1.json"),
      Seq(doc(2, "hot hot hot hot hot hot warm warm warm " +
        (16 to 30).map(i => s"u$i").mkString(" "))).mkString("\n"))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(in)
    val out = StreamingHeavyHitters.candidates(stream, "text",
      supportPpm = 100000L, buckets = 4)
    val q = out.writeStream.format("memory").queryName("shh_out")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("shh-cp").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val rows = spark.table("shh_out")
      .as[StreamingHeavyHitters.HitterCandidate].collect()
    // last emission per (bucket, token): the final sketch snapshot —
    // keep the row with the largest bucket_tokens
    val fin = rows.groupBy(r => (r.bucket, r.token))
      .view.mapValues(_.maxBy(_.bucket_tokens)).values.toSeq
    val byTok = fin.map(r => r.token -> r).toMap
    // superset guarantee: both true hitters present after the last batch
    assert(byTok.contains("hot") && byTok.contains("warm"),
      s"true hitters missing from final sketches: ${byTok.keys}")
    // exact bound bookkeeping: true counts inside [min, max]
    assert(byTok("hot").min_count <= 12 && 12 <= byTok("hot").max_count)
    assert(byTok("warm").min_count <= 6 && 6 <= byTok("warm").max_count)
    // sketches are bounded: each bucket holds ≤ m = ⌈1e6/1e5⌉+1 = 11
    fin.groupBy(_.bucket).foreach { case (b, rs) =>
      assert(rs.size <= 11, s"bucket $b sketch exceeded m: ${rs.size}")
    }
    // bucket token totals account for the whole 48-token stream
    assert(fin.groupBy(_.bucket).values.map(_.head.bucket_tokens).sum == 48L)
  }
}
