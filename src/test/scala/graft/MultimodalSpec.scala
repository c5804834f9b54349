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
