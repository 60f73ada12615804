package graft.multimodal

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def assets = Multimodal.syntheticAssets(Tables.documents(spark, sf))

  test("synthetic assets match the asset schema") {
    val a = assets
    assert(a.schema.fieldNames.toSeq ==
      Multimodal.assetSchema.fieldNames.toSeq)
    assert(a.schema("payload").dataType.typeName == "binary")
    assert(a.count() > 0)
  }

  test("image branch: REAL PNG payloads decode to the generated dimensions") {
    val d = Multimodal.decodeAndFeaturize(assets)
    val images = d.filter($"media_type" === "image")
      .select("asset_id", "width", "height").as[(Long, Int, Int)].collect()
    assert(images.nonEmpty)
    images.foreach { case (id, w, h) =>
      val (ew, eh) = Multimodal.imageDims(id)
      assert((w, h) == (ew, eh), s"asset $id decoded ${(w, h)} want ${(ew, eh)}")
    }
    // and the decode is genuinely reading bytes, not echoing a formula:
    // a corrupted payload must NOT decode
    assert(Multimodal.decodeImage(Array[Byte](1, 2, 3)) == (-1, -1))
    // round-trip helper sanity straight through ImageIO
    assert(Multimodal.decodeImage(Multimodal.pngBytes(13, 9, 42L)) == (13, 9))
  }

  test("audio branch: REAL WAV payloads decode to the generated duration") {
    val d = Multimodal.decodeAndFeaturize(assets)
    val audio = d.filter($"media_type" === "audio")
      .select("asset_id", "duration_ms").as[(Long, Long)].collect()
    assert(audio.nonEmpty)
    audio.foreach { case (id, dur) =>
      assert(dur == Multimodal.audioDurationMs(id),
        s"asset $id decoded $dur want ${Multimodal.audioDurationMs(id)}")
    }
    // decode genuinely parses bytes, not a formula: corrupt payload fails
    assert(Multimodal.decodeAudio(Array[Byte](1, 2, 3)) == -1L)
    // round-trip helper sanity straight through javax.sound
    assert(Multimodal.decodeAudio(Multimodal.wavBytes(137L, 42L)) == 137L)
  }

  test("video branch: REAL GVID payloads decode to the generated dims/duration") {
    val d = Multimodal.decodeAndFeaturize(assets)
    val vids = d.filter($"media_type" === "video")
      .select("asset_id", "width", "height", "duration_ms")
      .as[(Long, Int, Int, Long)].collect()
    assert(vids.nonEmpty)
    vids.foreach { case (id, w, h, dur) =>
      val (ew, eh) = Multimodal.videoDims(id)
      assert((w, h, dur) == (ew, eh, Multimodal.videoDurationMs(id)),
        s"asset $id decoded ${(w, h, dur)}")
    }
    // decode genuinely parses bytes, not a formula: corrupt payload fails
    assert(Multimodal.decodeVideo(Array[Byte](1, 2, 3)) == (-1, -1, -1L))
    // and a PNG (valid image, wrong magic) is rejected too
    assert(Multimodal.decodeVideo(Multimodal.pngBytes(4, 4, 1L)) == (-1, -1, -1L))
    // round-trip helper sanity straight through the container
    val (w5, h5) = Multimodal.videoDims(5L)
    assert(Multimodal.decodeVideo(Multimodal.gvidBytes(5L)) ==
      (w5, h5, Multimodal.videoDurationMs(5L)))
    // a corrupt frame-length prefix (huge positive int) must be rejected
    // by the bounds check, not attempted as an allocation
    val corrupt = Multimodal.gvidBytes(5L).clone()
    corrupt(13) = 0x7f.toByte; corrupt(14) = 0xf0.toByte
    corrupt(15) = 0; corrupt(16) = 0
    assert(Multimodal.decodeVideo(corrupt) == (-1, -1, -1L))
    // an unknown container version is rejected, not misparsed
    val v2 = Multimodal.gvidBytes(5L).clone()
    v2(4) = 2
    assert(Multimodal.decodeVideo(v2) == (-1, -1, -1L))
  }

  test("extractFrames: every GVID frame comes back as decodable PNG rows") {
    val f = Multimodal.extractFrames(assets)
    val perAsset = f.groupBy("asset_id").count()
      .as[(Long, Long)].collect()
    assert(perAsset.nonEmpty)
    perAsset.foreach { case (id, n) =>
      assert(n == Multimodal.videoFrameCount(id).toLong,
        s"asset $id extracted $n frames")
    }
    val one = f.filter($"asset_id" === 5L).orderBy("frame_idx")
      .select("frame_idx", "ts_ms", "width", "height", "frame_png")
      .collect()
    val (ew, eh) = Multimodal.videoDims(5L)
    one.zipWithIndex.foreach { case (r, i) =>
      assert(r.getInt(0) == i && r.getLong(1) == i.toLong * 250L)
      assert((r.getInt(2), r.getInt(3)) == (ew, eh))
      // the payload bytes are a genuinely decodable standalone PNG
      assert(Multimodal.decodeImage(r.getAs[Array[Byte]](4)) == (ew, eh))
    }
    // frames vary across the clip (per-frame seed), so this is not one
    // image repeated
    assert(one.map(_.getAs[Array[Byte]](4).toSeq).distinct.length == one.length)
    // corrupt payloads contribute zero rows, not failures
    assert(Multimodal.parseGvidFrames(1L, Array[Byte](1, 2, 3)).isEmpty)
    // a well-framed clip whose frame bytes aren't a decodable image is
    // rejected whole — no (-1,-1)-dim frame rows ever ship
    val badFrame = Multimodal.gvidBytes(5L).clone()
    java.util.Arrays.fill(badFrame, 17, badFrame.length, 0.toByte)
    assert(Multimodal.parseGvidFrames(5L, badFrame).isEmpty)
  }

  test("decodeAndFeaturize: deterministic metadata, batch shape") {
    val d1 = Multimodal.decodeAndFeaturize(assets, parallelism = 4)
    val d2 = Multimodal.decodeAndFeaturize(assets, parallelism = 2)
    // determinism independent of partitioning
    val s1 = d1.orderBy("asset_id").collect().map(_.toString).toSeq
    val s2 = d2.orderBy("asset_id").collect().map(_.toString).toSeq
    assert(s1 == s2)
    val row = d1.filter($"asset_id" === 0L).head()
    assert(row.getInt(2) >= 8 && row.getInt(3) >= 8)    // width/height bounds
    assert(row.getLong(5) > 0)                          // n_bytes
    assert(row.getSeq[Float](6).length == 8)            // feature dim
    // images have zero duration; audio/video positive
    val images = d1.filter($"media_type" === "image")
    assert(images.filter($"duration_ms" =!= 0L).count() == 0)
    assert(d1.filter($"media_type" =!= "image")
      .filter($"duration_ms" <= 0L).count() == 0)
  }

  test("decode shuffles payload bytes only when parallelism opts in") {
    // the contract: no Exchange may ever carry the binary `payload`
    // column by default — shuffling media BYTES before decode doubles
    // payload I/O at scale. Pre-payload exchanges (syntheticAssets
    // spreads ~30-byte (id, source) rows before generation) are fine;
    // parallelism > 0 is the explicit payload-spread opt-in.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def exchanges(p: SparkPlan): Seq[ShuffleExchangeLike] =
      p.collect { case e: ShuffleExchangeLike => e } ++
        p.collect { case a: AdaptiveSparkPlanExec => a }
          .flatMap(a => exchanges(a.executedPlan))
    def payloadExchanges(df: org.apache.spark.sql.DataFrame): (Int, Int) = {
      val ex = exchanges(df.queryExecution.executedPlan)
      (ex.size, ex.count(_.output.exists(_.name == "payload")))
    }
    val (n0, p0) = payloadExchanges(Multimodal.decodeAndFeaturize(assets))
    assert(p0 == 0,
      s"default decode must not shuffle payload bytes ($p0 of $n0 exchanges carry payload)")
    val (n4, p4) = payloadExchanges(
      Multimodal.decodeAndFeaturize(assets, parallelism = 4))
    assert(p4 >= 1,
      s"parallelism=4 must spread-shuffle the assets by id ($p4 of $n4 exchanges carry payload)")
  }

  test("channelSums: raster fast path equals the bulk getRGB fallback") {
    // the fast path sums raw bytes off the interleaved sRGB raster; the
    // fallback converts through getRGB. Both must agree with the
    // generator formula on a decoded PNG (fast path) and on a
    // TYPE_INT_RGB image (fallback — its raster is int-packed, not
    // byte-interleaved)
    val (w, h, seed) = (13, 9, 42L)
    val decoded = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.pngBytes(w, h, seed)))
      Multimodal.channelSums(img)
    }
    val intRgb = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, ((seed + x * 31 + y * 17) & 0xffffff).toInt)
      Multimodal.channelSums(img)
    }
    var (er, eg, eb) = (0L, 0L, 0L)
    for (y <- 0 until h; x <- 0 until w) {
      val v = ((seed + x * 31 + y * 17) & 0xffffff).toInt
      er += (v >> 16) & 0xff; eg += (v >> 8) & 0xff; eb += v & 0xff
    }
    assert(decoded == ((er, eg, eb)))
    assert(intRgb == ((er, eg, eb)))
  }

  test("audioFeatures: decoded PCM statistics equal the generator formula") {
    val feats = Multimodal.audioFeatures(assets)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(feats.nonEmpty)
    feats.foreach { case (id, (n, peak, sabs, ssq)) =>
      val frames = (Multimodal.audioDurationMs(id) * 8L).toInt
      var ep = 0L; var es = 0L; var eq = 0L
      (0 until frames).foreach { i =>
        val s = (((id * 31 + i * 7) & 0xffff) - 32768)
        val a = math.abs(s)
        if (a > ep) ep = a
        es += a; eq += s * s
      }
      assert(n == frames.toLong, s"asset $id sample count")
      assert((peak, sabs, ssq) == ((ep, es, eq)), s"asset $id stats")
    }
    // a corrupt payload yields no row, not a crash
    val junk = Seq((999L, "audio", Array[Byte](1, 2, 3)))
      .toDF("asset_id", "media_type", "payload")
    assert(Multimodal.audioFeatures(junk).count() == 0)
  }

  test("imagePixelStats: decoded channel sums equal the generator formula") {
    val stats = Multimodal.imagePixelStats(assets)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(stats.nonEmpty)
    stats.foreach { case (id, (n, sr, sg, sb)) =>
      val (w, h) = Multimodal.imageDims(id)
      var (er, eg, eb) = (0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        val v = ((id + x * 31 + y * 17) & 0xffffff).toInt
        er += (v >> 16) & 0xff; eg += (v >> 8) & 0xff; eb += v & 0xff
      }
      assert(n == w.toLong * h, s"asset $id pixel count")
      assert((sr, sg, sb) == ((er, eg, eb)), s"asset $id channel sums")
    }
  }

  test("resizeMeta preserves aspect ratio within target box") {
    val d = Multimodal.resizeMeta(
      Multimodal.decodeAndFeaturize(assets), maxW = 128, maxH = 128)
    val bad = d.filter($"resized_w" > 128 || $"resized_h" > 128)
    assert(bad.count() == 0)
    // no upscaling
    assert(d.filter($"resized_w" > $"width").count() == 0)
  }

  test("frameSamples: n evenly spaced timestamps per video asset") {
    val d = Multimodal.decodeAndFeaturize(assets)
    val f = Multimodal.frameSamples(d, n = 4)
    val perAsset = f.groupBy("asset_id").count().select("count").as[Long].collect()
    assert(perAsset.nonEmpty && perAsset.forall(_ == 4L))
    assert(f.filter($"frame_ts_ms" < 0).count() == 0)
  }
}
