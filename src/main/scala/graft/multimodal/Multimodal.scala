package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The decode step is STUBBED with a deterministic fake (media codec
  * libraries are not available in this container): `decodeStub` derives
  * plausible width/height/duration/features from a stable hash of the
  * payload. Everything AROUND the stub is real and load-bearing:
  *   - the asset schema (binary payload + metadata struct)
  *   - `mapPartitions` batch shape — one iterator per partition, the
  *     JVM analog of `mapInPandas` batches: amortizes per-batch codec
  *     setup, never materializes a partition as a list
  *   - partitioning: assets are repartitioned by id so decode
  *     parallelism matches executor count, independent of file layout
  *   - feature/resize/frame-sample signatures match what a real codec
  *     UDF would expose; swapping in a real decoder changes ONLY the
  *     body of `decodeStub`.
  */
object Multimodal {

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType),   // image | audio | video
    StructField("payload", BinaryType),
    StructField("source", StringType)))

  val decodedSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("n_bytes", LongType),
    StructField("features", ArrayType(FloatType))))

  /** Deterministic fake decode of one payload (STUB — stands in for a
    * real image/audio codec; see object doc). */
  private[multimodal] def decodeStub(mediaType: String,
      payload: Array[Byte]): (Int, Int, Long, Array[Float]) = {
    val h = scala.util.hashing.MurmurHash3.bytesHash(payload, 42)
    val w = 64 + math.floorMod(h, 1920 - 64)
    val ht = 64 + math.floorMod(h >> 8, 1080 - 64)
    val dur = if (mediaType == "image") 0L else 1000L + math.floorMod(h.toLong, 600000L)
    // 8-dim fake feature vector from rolling payload hash
    val feats = new Array[Float](8)
    var acc = h
    var i = 0
    while (i < 8) {
      acc = acc * 31 + (if (payload.length > i) payload(i) else 0)
      feats(i) = (math.floorMod(acc, 1000)) / 1000.0f
      i += 1
    }
    (w, ht, dur, feats)
  }

  /** Synthesize a deterministic asset table from `documents` (text bytes
    * as payload) — test fuel matching the schema above. */
  def syntheticAssets(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      col("text").cast("binary").as("payload"),
      col("source"))

  /** Decoded-asset record (field names/types match [[decodedSchema]]). */
  final case class Decoded(asset_id: Long, media_type: String, width: Int,
      height: Int, duration_ms: Long, n_bytes: Long, features: Seq[Float])

  /** Decode + feature-extract in partition batches (the mapInPandas
    * analog). Repartitions by id first so work spreads evenly across
    * executors regardless of input file layout. Typed-Dataset
    * mapPartitions keeps ser/de in codegen'd encoders (no Row-RDD
    * round-trip). */
  def decodeAndFeaturize(assets: DataFrame, parallelism: Int = 0): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    val parts = if (parallelism > 0) parallelism
      else spark.sparkContext.defaultParallelism
    assets
      .select(col("asset_id").cast("long"), col("media_type"), col("payload"))
      .repartition(parts, col("asset_id"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // batch-scoped "codec" setup would go here (once per partition)
        rows.map { case (id, mt, payloadOrNull) =>
          val payload = if (payloadOrNull == null) Array.empty[Byte] else payloadOrNull
          val (w, h, dur, feats) = decodeStub(mt, payload)
          Decoded(id, mt, w, h, dur, payload.length.toLong, feats.toSeq)
        }
      }
      .toDF()
  }

  /** Resize stub: recomputes metadata for a target box, preserving
    * aspect ratio (the arithmetic a real resizer would do). */
  def resizeMeta(decoded: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(lit(maxW) / col("width"), lit(maxH) / col("height"), lit(1.0))
    decoded
      .withColumn("resized_w", floor(col("width") * scale).cast("int"))
      .withColumn("resized_h", floor(col("height") * scale).cast("int"))
  }

  /** Frame-sample stub for video assets: n evenly spaced timestamps. */
  def frameSamples(decoded: DataFrame, n: Int): DataFrame =
    decoded.filter(col("media_type") === "video")
      .withColumn("frame_ts_ms",
        explode(transform(sequence(lit(0), lit(n - 1)),
          i => (col("duration_ms") * i / n).cast("long"))))
      .select("asset_id", "frame_ts_ms")
}
