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
  * The VIDEO path is REAL in the same sense, over a minimal
  * deterministic container (the JDK ships no video codec, so we define
  * one): `GVID` magic + fps + frame count header, then length-prefixed
  * PNG frames. Decode parses the header for the duration and ImageIO-
  * decodes the first frame for the dimensions — a true encode→decode
  * round-trip, same honesty as the PNG/WAV branches. Swapping in a
  * standard codec changes only [[gvidBytes]]/[[decodeVideo]].
  * Everything around the codecs is load-bearing:
  *   - the asset schema (binary payload + typed metadata)
  *   - `mapPartitions` batch shape — one iterator per partition, the
  *     JVM analog of `mapInPandas` batches: amortizes per-batch codec
  *     setup, never materializes a partition as a list
  *   - partitioning: decode runs on the SCAN partitions by default —
  *     parquet split sizing (`spark.sql.files.maxPartitionBytes`)
  *     already parallelizes a payload table, and shuffling media BYTES
  *     before decode would double the pipeline's I/O at 100 TB of
  *     payload. Pass `parallelism > 0` to opt into a spread shuffle by
  *     asset id — the knob for a SKEWED layout (a few huge files, or
  *     decode cost uncorrelated with bytes) where redistribution is
  *     worth one extra pass over the payload bytes
  */
object Multimodal {

  // keep ImageIO in-memory: the default FileCache creates (and deletes) a
  // temp file per encode/decode — per-row disk I/O in the executor hot
  // loop, and an outright failure on tmp-less containers
  ImageIO.setUseCache(false)

  // ---- pinned per-thread PNG codec instances --------------------------
  // ImageIO.read/write perform a service-registry scan and construct a
  // fresh reader/writer (with its buffers) PER CALL. At 32 concurrent
  // decode tasks over tiny synthetic images that fixed cost dominates
  // and contends (measured round 19: q94's 8-core run beat its 32-core
  // run ~8×). Reader/writer instances are not thread-safe, so one per
  // executor task thread via ThreadLocal; they hold only heap buffers,
  // so no dispose bookkeeping is needed.

  private val pngReaderTL = new ThreadLocal[javax.imageio.ImageReader] {
    override def initialValue(): javax.imageio.ImageReader = {
      val it = ImageIO.getImageReadersByFormatName("png")
      if (it.hasNext) it.next() else null
    }
  }
  private val pngWriterTL = new ThreadLocal[javax.imageio.ImageWriter] {
    override def initialValue(): javax.imageio.ImageWriter = {
      val it = ImageIO.getImageWritersByFormatName("png")
      if (it.hasNext) it.next() else null
    }
  }

  /** The full 8-byte PNG signature — the exact bytes the JDK PNG
    * reader's canDecodeInput checks, so the pinned-reader fast path
    * accepts precisely the payloads ImageIO.read would hand to the PNG
    * reader (anything else falls back to the generic registry path and
    * behaves byte-for-byte as before). */
  private val PngSig =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
  private def isPng(b: Array[Byte]): Boolean = {
    var i = 0
    if (b.length < 8) return false
    while (i < 8) { if (b(i) != PngSig(i)) return false; i += 1 }
    true
  }

  /** Decode image bytes to a BufferedImage (null when no reader claims
    * them) — ImageIO.read semantics through the pinned per-thread PNG
    * reader when the signature matches. */
  private def readImageBuffered(payload: Array[Byte]): java.awt.image.BufferedImage = {
    val r = if (isPng(payload)) pngReaderTL.get() else null
    if (r == null) ImageIO.read(new ByteArrayInputStream(payload))
    else {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
      try { r.setInput(iis, true, true); r.read(0) }
      finally {
        try r.setInput(null) catch { case _: Exception => () }
        iis.close()
      }
    }
  }

  /** Encode a BufferedImage as PNG through the pinned per-thread writer
    * (default write param — byte-identical to `ImageIO.write(img,
    * "png", out)`, which resolves the same JDK PNGImageWriter with the
    * same defaults). */
  private def writePng(img: java.awt.image.BufferedImage,
      baos: ByteArrayOutputStream): Unit = {
    val w = pngWriterTL.get()
    if (w == null) { ImageIO.write(img, "png", baos); return }
    val ios = ImageIO.createImageOutputStream(baos)
    try { w.setOutput(ios); w.write(img) }
    finally {
      try w.setOutput(null) catch { case _: Exception => () }
      ios.close()
    }
  }

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

  /** Real PNG bytes for a deterministic tiny image. Pixels land via ONE
    * bulk setRGB (per-pixel setRGB pays a virtual dispatch + bounds
    * check per call) and the encode goes through the pinned per-thread
    * PNG writer — same bytes, a fraction of the per-row fixed cost. */
  private[multimodal] def pngBytes(w: Int, h: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = new Array[Int](w * h)
    var y = 0
    var i = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        px(i) = ((seed + x * 31 + y * 17) & 0xffffff).toInt
        i += 1
        x += 1
      }
      y += 1
    }
    img.setRGB(0, 0, w, h, px, 0, w)
    val baos = new ByteArrayOutputStream()
    writePng(img, baos)
    baos.toByteArray
  }

  /** REAL image decode: width/height read from the PNG/JPEG bytes. */
  private[multimodal] def decodeImage(payload: Array[Byte]): (Int, Int) = {
    val img = readImageBuffered(payload)
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

  // ---- video: the GVID container ---------------------------------------
  // layout: "GVID" magic (4B) | version 1 (1B) | fps int32 BE |
  //         frameCount int32 BE | frameCount × (len int32 BE + PNG bytes)

  private val GvidMagic = Array[Byte]('G', 'V', 'I', 'D')
  /** Constant frame rate for synthetic clips: 4 fps keeps every whole
    * frame count an exact multiple of 250 ms. */
  private[multimodal] val VideoFps = 4
  /** Frame dims the generator encodes (and the oracle predicts) — tiny
    * frames keep a 10⁴-clip corpus tens of MB of payload. */
  private[multimodal] def videoDims(id: Long): (Int, Int) =
    (16 + math.floorMod(id, 16L).toInt, 9 + math.floorMod(id, 9L).toInt)
  /** Frames per clip (2..8) → 500..2000 ms at 4 fps. */
  private[multimodal] def videoFrameCount(id: Long): Int =
    2 + math.floorMod(id, 7L).toInt
  /** Clip duration the generator encodes (and the oracle predicts). */
  private[multimodal] def videoDurationMs(id: Long): Long =
    videoFrameCount(id) * 1000L / VideoFps

  /** Real GVID bytes: header + per-frame PNG payloads (each frame a
    * genuine ImageIO encode, varied by frame index). */
  private[multimodal] def gvidBytes(id: Long): Array[Byte] = {
    val (w, h) = videoDims(id)
    val frames = videoFrameCount(id)
    val baos = new ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(baos)
    out.write(GvidMagic)
    out.writeByte(1)
    out.writeInt(VideoFps)
    out.writeInt(frames)
    var f = 0
    while (f < frames) {
      val png = pngBytes(w, h, id * 1000L + f)
      out.writeInt(png.length)
      out.write(png)
      f += 1
    }
    out.flush()
    baos.toByteArray
  }

  /** Parse + validate the 13-byte GVID header (magic, version, fps,
    * frame count); None for anything malformed. The ONE copy of the
    * header contract — both [[decodeVideo]] and [[parseGvidFrames]]
    * read through it, so they can never disagree on the same bytes. */
  private def readGvidHeader(in: java.io.DataInputStream): Option[(Int, Int)] = {
    val magic = new Array[Byte](4)
    in.readFully(magic)
    if (!java.util.Arrays.equals(magic, GvidMagic)) None
    // unknown version: reject — don't misparse a future layout into
    // plausible-looking metadata
    else if (in.readByte() != 1) None
    else {
      val fps = in.readInt()
      val frames = in.readInt()
      if (fps <= 0 || frames <= 0) None else Some((fps, frames))
    }
  }

  /** REAL video decode: duration from the container header's frame
    * count × fps, dimensions from an ImageIO decode of the first frame's
    * PNG bytes. (-1, -1, -1) for undecodable payloads. */
  private[multimodal] def decodeVideo(payload: Array[Byte]): (Int, Int, Long) =
    try {
      val in = new java.io.DataInputStream(new ByteArrayInputStream(payload))
      readGvidHeader(in) match {
        case None => (-1, -1, -1L)
        case Some((fps, frames)) =>
          val len = in.readInt()
          // bound the frame allocation by the bytes actually present — a
          // corrupt length prefix must fail cleanly, not allocate GBs (an
          // OutOfMemoryError would escape the Exception catch below)
          if (len <= 0 || len > payload.length - 17) (-1, -1, -1L)
          else {
            val png = new Array[Byte](len)
            in.readFully(png)
            val (w, h) = decodeImage(png)
            (w, h, frames * 1000L / fps)
          }
      }
    } catch { case _: Exception => (-1, -1, -1L) }

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
    * asset with a REAL PCM WAV payload, the next a video asset with a
    * REAL GVID payload (PNG frames). Runs in partition batches (encode
    * is imperative codec work, same shape as decode). */
  def syntheticAssets(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id").cast("long"), col("source"))
      // spread BEFORE the payloads exist: the exchange carries ~30-byte
      // (id, source) rows, and the PNG/WAV/GVID generation plus every
      // downstream decode then runs at session width instead of on the
      // scan's partitioning (a sub-128MB documents file is ONE split, so
      // the whole multimodal family decoded in a single task — measured
      // 1.5 s single-task stages on q93/q94). The payload bytes
      // themselves are never shuffled — the §8 rule: move the small
      // proxy, not the heavy rows.
      .repartition(graft.util.Parallelism.shuffleWidth(documents),
        col("doc_id"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, source) =>
          val mt = math.floorMod(id, 3L) match {
            case 0L => "image"; case 1L => "audio"; case _ => "video"
          }
          val payload: Array[Byte] = mt match {
            case "image" => val (w, h) = imageDims(id); pngBytes(w, h, id)
            case "audio" => wavBytes(audioDurationMs(id), id)
            case _ => gvidBytes(id)
          }
          (id, mt, payload, source)
        }
      }
      .toDF("asset_id", "media_type", "payload", "source")
  }

  /** Decoded-asset record (field names/types match [[decodedSchema]]). */
  final case class Decoded(asset_id: Long, media_type: String, width: Int,
      height: Int, duration_ms: Long, n_bytes: Long, features: Seq[Float])

  /** Opt-in spread shuffle (see the partitioning note in the object
    * doc): `parallelism` = 0 decodes on the scan partitions — no
    * shuffle of payload bytes; > 0 redistributes by asset id first. */
  private def spread(df: DataFrame, parallelism: Int): DataFrame =
    if (parallelism > 0) df.repartition(parallelism, col("asset_id")) else df

  /** Decode + feature-extract in partition batches (the mapInPandas
    * analog). Decodes on the scan partitions by default; `parallelism`
    * > 0 opts into an id-spread shuffle first ([[spread]]).
    * Typed-Dataset mapPartitions keeps ser/de in codegen'd encoders
    * (no Row-RDD round-trip). Image width/height come from a REAL
    * ImageIO decode of the payload bytes; audio duration from a REAL
    * WAV-container parse. */
  def decodeAndFeaturize(assets: DataFrame, parallelism: Int = 0): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    spread(assets
      .select(col("asset_id").cast("long"), col("media_type"), col("payload")),
      parallelism)
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // batch-scoped codec setup would go here (once per partition)
        rows.map { case (id, mt, payloadOrNull) =>
          val payload = if (payloadOrNull == null) Array.empty[Byte] else payloadOrNull
          val (w, h, dur) = mt match {
            case "image" => val (iw, ih) = decodeImage(payload); (iw, ih, 0L)
            case "audio" => (0, 0, decodeAudio(payload))
            case _ => decodeVideo(payload)
          }
          Decoded(id, mt, w, h, dur, payload.length.toLong, fakeFeatures(payload).toSeq)
        }
      }
      .toDF()
  }

  /** One asset's exact PCM statistics. */
  final case class AudioFeat(asset_id: Long, n_samples: Long,
      peak_abs: Long, sum_abs: Long, sum_sq: Long)

  /** REAL audio feature extraction: parse each WAV payload's 16-bit LE
    * mono PCM and compute exact integer signal statistics — sample
    * count, peak |amplitude|, Σ|s|, Σs² (the loudness/energy profile a
    * speech-data pipeline filters on; RMS = sqrt(sum_sq/n) derives
    * downstream). Integer statistics make the REAL decode oracle-exact:
    * the synthetic generator's closed-form samples are re-derived in
    * SQL and must match the decoded bytes bit-for-bit. Same
    * mapPartitions batch shape and opt-in [[spread]] shuffle as
    * [[decodeAndFeaturize]]; undecodable payloads contribute no rows. */
  def audioFeatures(assets: DataFrame, parallelism: Int = 0): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    spread(assets.filter(col("media_type") === "audio")
      .select(col("asset_id").cast("long"), col("payload")), parallelism)
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payloadOrNull) =>
          try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new ByteArrayInputStream(payloadOrNull))
            val fmt = ais.getFormat
            // the statistics below reinterpret raw bytes as 16-bit LE
            // mono signed PCM — any other valid WAV would decode to
            // plausible-looking garbage, so it must yield NO row instead
            if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
                fmt.isBigEndian ||
                fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
              throw new IllegalArgumentException("unsupported PCM layout")
            val bytes = ais.readAllBytes()
            val n = bytes.length / 2
            var peak = 0L; var sabs = 0L; var ssq = 0L
            var i = 0
            while (i < n) {
              val s = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8))
                .toShort.toLong
              val a = math.abs(s)
              if (a > peak) peak = a
              sabs += a; ssq += s * s
              i += 1
            }
            Some(AudioFeat(id, n.toLong, peak, sabs, ssq))
          } catch { case _: Exception => None }
        }
      }
      .toDF()
  }

  /** One asset's exact per-channel pixel statistics. */
  final case class ImageStat(asset_id: Long, n_pixels: Long,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /** REAL image feature extraction: decode each PNG payload and roll up
    * exact integer per-channel sums (mean brightness/color balance
    * derive downstream — the cheap filters an image-data pipeline runs
    * before expensive model scoring). PNG is lossless, so the decoded
    * pixels must equal the generator's closed form bit-for-bit — the
    * image-branch counterpart of [[audioFeatures]]' oracle proof. */
  def imagePixelStats(assets: DataFrame, parallelism: Int = 0): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    spread(assets.filter(col("media_type") === "image")
      .select(col("asset_id").cast("long"), col("payload")), parallelism)
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          try {
            val img = readImageBuffered(payload)
            if (img == null) None
            else {
              val (sr, sg, sb) = channelSums(img)
              Some(ImageStat(id, img.getWidth.toLong * img.getHeight,
                sr, sg, sb))
            }
          } catch { case _: Exception => None }
        }
      }
      .toDF()
  }

  /** Exact per-channel pixel sums via bulk raster access. Round 19
    * measured per-pixel `getRGB(x, y)` as the q94 hot path (it allocates
    * a transfer array and re-dispatches the color model PER PIXEL, and
    * 32 concurrent decoders amplified the GC pressure into an 8-core <
    * 32-core inversion). Fast path: 8-bit 3-band interleaved sRGB
    * rasters (what the JDK PNG reader produces for truecolor PNGs) sum
    * raw bytes straight off the data buffer — for that layout
    * `getRGB`'s color conversion is the identity, so the sums are
    * bit-equal. Anything else takes ONE bulk `getRGB` row fetch (same
    * per-pixel conversion as before, without the per-call overhead). */
  private[multimodal] def channelSums(img: java.awt.image.BufferedImage): (Long, Long, Long) = {
    import java.awt.image.{DataBufferByte, PixelInterleavedSampleModel}
    val w = img.getWidth
    val h = img.getHeight
    var sr = 0L; var sg = 0L; var sb = 0L
    val raster = img.getRaster
    val cm = img.getColorModel
    (raster.getSampleModel, raster.getDataBuffer) match {
      case (sm: PixelInterleavedSampleModel, db: DataBufferByte)
          if sm.getNumBands == 3 && sm.getPixelStride == 3 &&
            cm.getNumComponents == 3 && !cm.hasAlpha &&
            cm.getComponentSize.forall(_ == 8) &&
            cm.getColorSpace.isCS_sRGB =>
        val d = db.getData
        val off = sm.getBandOffsets // band order: 0=R, 1=G, 2=B
        val base0 = db.getOffset - raster.getSampleModelTranslateY *
          sm.getScanlineStride - raster.getSampleModelTranslateX * 3
        val ro = off(0); val go = off(1); val bo = off(2)
        var y = 0
        while (y < h) {
          var p = base0 + y * sm.getScanlineStride
          var x = 0
          while (x < w) {
            sr += d(p + ro) & 0xff; sg += d(p + go) & 0xff
            sb += d(p + bo) & 0xff
            p += 3
            x += 1
          }
          y += 1
        }
      case _ =>
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        var i = 0
        while (i < px.length) {
          val v = px(i)
          sr += (v >> 16) & 0xff; sg += (v >> 8) & 0xff; sb += v & 0xff
          i += 1
        }
    }
    (sr, sg, sb)
  }

  /** Metadata-level resize: recomputes dims for a target box, preserving
    * aspect ratio (the arithmetic a pixel resizer would apply; the pixel
    * pass itself is a decode→rescale→encode over `payload` in the same
    * mapPartitions shape as [[decodeAndFeaturize]]). */
  def resizeMeta(decoded: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    // greatest(,1): dimensionless media (audio is 0×0) passes through
    val scale = least(lit(maxW) / greatest(col("width"), lit(1)),
      lit(maxH) / greatest(col("height"), lit(1)), lit(1.0))
    decoded
      .withColumn("resized_w", floor(col("width") * scale).cast("int"))
      .withColumn("resized_h", floor(col("height") * scale).cast("int"))
  }

  /** One extracted video frame: the actual PNG bytes plus decoded dims
    * and the frame's timestamp in the clip. */
  final case class Frame(asset_id: Long, frame_idx: Int, ts_ms: Long,
      width: Int, height: Int, frame_png: Array[Byte])

  /** REAL frame extraction: parse every PNG frame out of each GVID
    * payload — the operator a vision-model pipeline feeds (decode →
    * per-frame rows → featurize/caption each frame). Same mapPartitions
    * batch shape and opt-in [[spread]] shuffle as
    * [[decodeAndFeaturize]]; dims are ImageIO-decoded from each frame's
    * own bytes, timestamps come from the container frame rate.
    * Non-video and undecodable payloads contribute no rows. Output
    * grows ~frameCount× the video subset — at scale, write it
    * partitioned and feed frames to downstream stages in place (never
    * collect). */
  def extractFrames(assets: DataFrame, parallelism: Int = 0): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    spread(assets
      .filter(col("media_type") === "video")
      .select(col("asset_id").cast("long"), col("payload")), parallelism)
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payloadOrNull) =>
          val payload =
            if (payloadOrNull == null) Array.empty[Byte] else payloadOrNull
          parseGvidFrames(id, payload)
        }
      }
      .toDF()
  }

  /** Iterate a GVID payload's frames — empty for undecodable bytes,
    * including a clip whose well-framed bytes aren't decodable images
    * (all-or-nothing, consistent with [[decodeVideo]]'s rejects). */
  private[multimodal] def parseGvidFrames(id: Long, payload: Array[Byte]): Iterator[Frame] =
    try {
      val in = new java.io.DataInputStream(new ByteArrayInputStream(payload))
      readGvidHeader(in) match {
        case None => Iterator.empty
        case Some((fps, frames)) =>
          var remaining = payload.length - 13
          val out = Vector.newBuilder[Frame]
          var f = 0
          var ok = true
          while (ok && f < frames) {
            val len = in.readInt()
            remaining -= 4
            if (len <= 0 || len > remaining) ok = false
            else {
              val png = new Array[Byte](len)
              in.readFully(png)
              remaining -= len
              val (w, h) = decodeImage(png)
              // a well-framed but non-decodable image voids the clip —
              // never emit (-1,-1)-dim frame rows
              if (w < 0 || h < 0) ok = false
              else {
                out += Frame(id, f, f.toLong * 1000L / fps, w, h, png)
                f += 1
              }
            }
          }
          if (ok) out.result().iterator else Iterator.empty
      }
    } catch { case _: Exception => Iterator.empty }

  /** Frame sampling for video assets: n evenly spaced timestamps. */
  def frameSamples(decoded: DataFrame, n: Int): DataFrame =
    decoded.filter(col("media_type") === "video")
      .withColumn("frame_ts_ms",
        explode(transform(sequence(lit(0), lit(n - 1)),
          i => (col("duration_ms") * i / n).cast("long"))))
      .select("asset_id", "frame_ts_ms")
}
