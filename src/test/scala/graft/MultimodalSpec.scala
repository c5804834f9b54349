package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("binary asset plumbing: schema, stub decode, deterministic features") {
    val assets = Multimodal.assetsFromDocuments(spark, sf)
    val feats = Multimodal.extractFeatures(assets)
    val rows = feats.collect()
    assert(rows.length === 500)
    assert(rows.forall(_.byte_len > 0))
    assert(rows.forall(_.header_hex.length === 16))
    assert(rows.forall(r => r.width >= 1 && r.width <= 1920))
    // determinism: re-running yields identical features
    val again = Multimodal.extractFeatures(assets).collect()
    assert(rows.sortBy(_.asset_id).zip(again.sortBy(_.asset_id))
      .forall { case (a, b) => a == b })
  }

  test("real image decode reads true PNG and JPEG dimensions through Spark") {
    import spark.implicits._
    def encoded(w: Int, h: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0xFF8040)
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, out))
      out.toByteArray
    }
    val assets = Seq(
      Multimodal.Asset(1L, "image", encoded(123, 45, "png"), Map.empty),
      Multimodal.Asset(2L, "image", encoded(64, 256, "jpg"), Map.empty),
      // unreadable bytes fall back to the labeled stub, never throw
      Multimodal.Asset(3L, "image", "not an image".getBytes("UTF-8"), Map.empty)
    ).toDS()
    val feats = Multimodal.extractFeatures(assets).collect()
      .map(f => f.asset_id -> f).toMap
    assert(feats(1L).width === 123 && feats(1L).height === 45)
    assert(feats(2L).width === 64 && feats(2L).height === 256)
    assert(feats(1L).header_hex.startsWith("89504e47")) // PNG magic
    assert(feats(3L).width >= 1) // stub fallback
  }

  test("WAV probe reads byte rate and data size from the RIFF header") {
    // 8000 B/s byte rate, 12000-byte payload → 1500 ms
    val wav = Multimodal.wavBytes(new Array[Byte](12000), sampleRate = 8000)
    val f = Multimodal.decodeWav(Multimodal.Asset(1L, "audio", wav, Map.empty))
    assert(f.isDefined)
    assert(f.get.duration_ms === 1500L)
    assert(f.get.header_hex.startsWith("52494646")) // "RIFF"
    // truncated / non-RIFF bytes → None, never a throw
    assert(Multimodal.decodeWav(
      Multimodal.Asset(2L, "audio", "RIFFbut short".getBytes, Map.empty)).isEmpty)
    assert(Multimodal.decodeWav(
      Multimodal.Asset(3L, "audio", wav.take(30), Map.empty)).isEmpty)
    // adversarial chunk size 0xFFFFFFF8 (-8): the walk must terminate with
    // None, not advance by zero forever
    val evil = java.nio.ByteBuffer.allocate(64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes).putInt(56).put("WAVE".getBytes)
      .put("junk".getBytes).putInt(0xFFFFFFF8).array()
    assert(Multimodal.decodeWav(
      Multimodal.Asset(4L, "audio", evil, Map.empty)).isEmpty)
    // truncated fmt chunk (sz=4): must NOT read the next chunk's bytes as a
    // byte rate — no fmt found, result None
    val shortFmt = java.nio.ByteBuffer.allocate(64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes).putInt(56).put("WAVE".getBytes)
      .put("fmt ".getBytes).putInt(4).putInt(0)
      .put("data".getBytes).putInt(8).array()
    assert(Multimodal.decodeWav(
      Multimodal.Asset(5L, "audio", shortFmt, Map.empty)).isEmpty)
  }

  test("MP4 probe reads mvhd duration and tkhd 16.16 dimensions") {
    val mp4 = Multimodal.mp4Bytes(durationMs = 90500L, width = 640, height = 360)
    val f = Multimodal.decodeMp4(Multimodal.Asset(1L, "video", mp4, Map.empty))
    assert(f.isDefined)
    assert(f.get.duration_ms === 90500L)
    assert(f.get.width === 640 && f.get.height === 360)
    assert(Multimodal.decodeMp4(
      Multimodal.Asset(2L, "video", "not a movie at all".getBytes, Map.empty)).isEmpty)
  }

  test("BMP header synthesizer round-trips through the imageio probe") {
    val bmp = Multimodal.bmpBytes(width = 77, height = 31)
    val f = Multimodal.decodeImage(Multimodal.Asset(1L, "image", bmp, Map.empty))
    assert(f.isDefined)
    assert(f.get.width === 77 && f.get.height === 31)
  }

  test("synthetic media corpus decodes via the real probes, never the stub") {
    val feats = Multimodal.extractFeatures(Multimodal.syntheticAssets(spark, sf))
      .collect()
    assert(feats.nonEmpty)
    // audio assets report zero dimensions (probe result), which the stub
    // can never produce (stub widths are always >= 1)
    assert(feats.filter(_.kind == "audio").forall(f => f.width === 0 && f.duration_ms >= 0))
    assert(feats.filter(_.kind == "video").forall(f => f.width >= 1 && f.width <= 320))
    assert(feats.filter(_.kind == "image").forall(f => f.width >= 1 && f.width <= 100))
  }

  test("resize plan fits every asset inside the box, preserving aspect") {
    val feats = Multimodal.extractFeatures(Multimodal.assetsFromDocuments(spark, sf))
    val resized = Multimodal.resizePlan(feats.toDF(), maxDim = 256).collect()
    assert(resized.nonEmpty)
    resized.foreach { r =>
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      val (tw, th) = (r.getAs[Int]("target_width"), r.getAs[Int]("target_height"))
      if (w > 256 || h > 256) {
        val scale = 256.0 / math.max(w, h)
        assert(tw >= 1 && th >= 1 && tw <= 256 && th <= 256)
        // exact contract: round-half-up of the scaled dim, clamped to >= 1
        assert(tw === math.max(1L, math.round(w * scale)).toInt)
        assert(th === math.max(1L, math.round(h * scale)).toInt)
      } else assert(tw === w && th === h)
    }
  }

  test("frame-sample plan explodes only video assets at the step interval") {
    val feats = Multimodal.extractFeatures(Multimodal.assetsFromDocuments(spark, sf))
    val plan = Multimodal.frameSamplePlan(feats.toDF(), stepMs = 60000L)
    import spark.implicits._
    val kinds = feats.toDF().select("kind").distinct().as[String].collect().toSet
    assert(kinds === Set("image", "audio", "video"))
    assert(plan.count() > 0)
    assert(plan.columns.toSeq === Seq("asset_id", "frame_ts"))
  }
}
