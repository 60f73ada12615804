package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The IMAGE path is REAL end-to-end: synthetic assets carry actual PNG
  * payloads (JDK ImageIO encode), and decode reads genuine width/height
  * back out of the bytes — so the driver oracle's formula check
  * (decoded dims == the dims the generator chose) verifies a true
  * encode→decode round-trip, not an arithmetic identity.
  *
  * The AUDIO path is REAL the same way: payloads are genuine PCM WAV
  * bytes (JDK `javax.sound.sampled`, no external codecs), and decode
  * reads the duration back out of the container's frame count — the
  * oracle's duration formula passing certifies a true encode→decode
  * round-trip.
  *
  * VIDEO decode remains a STUB (no video codec in the JDK or this
  * container): payloads are text bytes and the metadata fields are
  * deterministic functions of the asset id — arbitrary values, honest
  * plumbing. Swapping in a real codec changes only [[decodeStubMeta]].
  * Everything around it is load-bearing:
  *   - the asset schema (binary payload + typed metadata)
  *   - `mapPartitions` batch shape — one iterator per partition, the
  *     JVM analog of `mapInPandas` batches: amortizes per-batch codec
  *     setup, never materializes a partition as a list
  *   - partitioning: assets are repartitioned by id so decode
  *     parallelism matches executor count, independent of file layout
  */
object Multimodal {

  // keep ImageIO in-memory: the default FileCache creates (and deletes) a
  // temp file per encode/decode — per-row disk I/O in the executor hot
  // loop, and an outright failure on tmp-less containers
  ImageIO.setUseCache(false)

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

  /** Image dims the generator encodes (and the oracle predicts). */
  private[multimodal] def imageDims(id: Long): (Int, Int) =
    (8 + math.floorMod(id, 24L).toInt, 8 + math.floorMod(id, 16L).toInt)

  /** Real PNG bytes for a deterministic tiny image. */
  private[multimodal] def pngBytes(w: Int, h: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, ((seed + x * 31 + y * 17) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val baos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** REAL image decode: width/height read from the PNG/JPEG bytes. */
  private[multimodal] def decodeImage(payload: Array[Byte]): (Int, Int) = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    if (img == null) (-1, -1) else (img.getWidth, img.getHeight)
  }

  /** Audio sample rate for synthetic WAV assets: 8 kHz mono keeps the
    * longest payload ~33 KB while every whole-millisecond duration is an
    * exact frame count (8 frames/ms). */
  private val AudioHz = 8000
  /** Audio duration the generator encodes (and the oracle predicts).
    * Bounded at ~2 s so a 10⁴-asset corpus stays tens of MB of payload. */
  private[multimodal] def audioDurationMs(id: Long): Long =
    50L + math.floorMod(id * 37L, 2000L)

  /** Real WAV bytes: 16-bit signed mono PCM, deterministic samples. */
  private[multimodal] def wavBytes(durMs: Long, seed: Long): Array[Byte] = {
    val frames = (durMs * AudioHz / 1000L).toInt
    val pcm = new Array[Byte](frames * 2)
    var i = 0
    while (i < frames) {
      val s = ((seed * 31 + i * 7) & 0xffff).toInt - 32768 // deterministic wave
      pcm(2 * i) = (s & 0xff).toByte          // little-endian per the format
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(AudioHz.toFloat, 16, 1,
      true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, frames.toLong)
    val baos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** REAL audio decode: duration read from the WAV container's frame
    * count and sample rate. −1 for undecodable bytes. */
  private[multimodal] def decodeAudio(payload: Array[Byte]): Long =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(payload))
      val frames = ais.getFrameLength
      val rate = ais.getFormat.getSampleRate.toLong
      if (frames < 0 || rate <= 0) -1L else frames * 1000L / rate
    } catch { case _: Exception => -1L }

  /** STUB video metadata (no video codec in the JDK or this container):
    * deterministic function of the asset id — arbitrary but engine-
    * checkable values. A real decoder replaces exactly this body. */
  private[multimodal] def decodeStubMeta(mediaType: String, id: Long): (Int, Int, Long) = {
    val dur = 1000L + math.floorMod(id * 37L, 600000L)
    (320 + 16 * math.floorMod(id, 8L).toInt,
      180 + 9 * math.floorMod(id, 8L).toInt, dur)
  }

  /** Fake 8-dim feature vector from a rolling payload hash (feature
    * EXTRACTION is model-dependent by nature; the plumbing — schema,
    * batching, determinism — is what's exercised). */
  private[multimodal] def fakeFeatures(payload: Array[Byte]): Array[Float] = {
    val feats = new Array[Float](8)
    var acc = scala.util.hashing.MurmurHash3.bytesHash(payload, 42)
    var i = 0
    while (i < 8) {
      acc = acc * 31 + (if (payload.length > i) payload(i) else 0)
      feats(i) = math.floorMod(acc, 1000) / 1000.0f
      i += 1
    }
    feats
  }

  /** Synthesize a deterministic asset table from `documents`: every
    * third doc is an image with a REAL PNG payload, the next an audio
    * asset with a REAL PCM WAV payload; video rows carry text bytes for
    * the stubbed branch. Runs in partition batches (encode is imperative
    * codec work, same shape as decode). */
  def syntheticAssets(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id").cast("long"), col("text"), col("source"))
      .as[(Long, String, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text, source) =>
          val mt = math.floorMod(id, 3L) match {
            case 0L => "image"; case 1L => "audio"; case _ => "video"
          }
          val payload: Array[Byte] = mt match {
            case "image" => val (w, h) = imageDims(id); pngBytes(w, h, id)
            case "audio" => wavBytes(audioDurationMs(id), id)
            case _ => text.getBytes("UTF-8")
          }
          (id, mt, payload, source)
        }
      }
      .toDF("asset_id", "media_type", "payload", "source")
  }

  /** Decoded-asset record (field names/types match [[decodedSchema]]). */
  final case class Decoded(asset_id: Long, media_type: String, width: Int,
      height: Int, duration_ms: Long, n_bytes: Long, features: Seq[Float])

  /** Decode + feature-extract in partition batches (the mapInPandas
    * analog). Repartitions by id first so work spreads evenly across
    * executors regardless of input file layout. Typed-Dataset
    * mapPartitions keeps ser/de in codegen'd encoders (no Row-RDD
    * round-trip). Image width/height come from a REAL ImageIO decode of
    * the payload bytes; audio duration from a REAL WAV-container parse. */
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
        // batch-scoped codec setup would go here (once per partition)
        rows.map { case (id, mt, payloadOrNull) =>
          val payload = if (payloadOrNull == null) Array.empty[Byte] else payloadOrNull
          val (w, h, dur) = mt match {
            case "image" => val (iw, ih) = decodeImage(payload); (iw, ih, 0L)
            case "audio" => (0, 0, decodeAudio(payload))
            case _ => decodeStubMeta(mt, id)
          }
          Decoded(id, mt, w, h, dur, payload.length.toLong, fakeFeatures(payload).toSeq)
        }
      }
      .toDF()
  }

  /** Resize stub: recomputes metadata for a target box, preserving
    * aspect ratio (the arithmetic a real resizer would do). */
  def resizeMeta(decoded: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    // greatest(,1): dimensionless media (audio is 0×0) passes through
    val scale = least(lit(maxW) / greatest(col("width"), lit(1)),
      lit(maxH) / greatest(col("height"), lit(1)), lit(1.0))
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
