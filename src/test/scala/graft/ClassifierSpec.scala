package graft

import org.apache.spark.sql.functions._

import graft.operators.Classifier

/** The in-engine linear quality classifier: separability, exact
  * partition-order determinism, guard rails. */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  // Two disjoint vocabularies -> linearly separable under hashed features
  // (no index collisions matter: every "good" token pushes one way).
  private lazy val corpus = Seq(
    (1L, "excellent prose with careful structure and clear argument", 1),
    (2L, "excellent careful writing with clear structure", 1),
    (3L, "clear careful argument in excellent prose", 1),
    (4L, "spam spam click here buy now cheap deal", 0),
    (5L, "buy cheap spam deal click now", 0),
    (6L, "click buy now cheap spam here", 0)
  ).toDF("doc_id", "text", "gold")

  test("two iterations separate a disjoint-vocabulary corpus") {
    val scored = Classifier.trainScore(corpus, "doc_id", "text",
      col("gold") === 1, d = 64, iters = 2, lr = 0.5)
    val rows = scored.select("doc_id", "y", "pred")
      .as[(Long, Int, Boolean)].collect()
    assert(rows.length === 6)
    rows.foreach { case (id, y, pred) =>
      assert(pred === (y == 1), s"doc $id: pred $pred but label $y")
    }
  }

  test("learned margins are bit-identical under repartitioning") {
    def margins(parts: Int): Map[Long, Long] =
      Classifier.trainScore(corpus.repartition(parts), "doc_id", "text",
        col("gold") === 1, d = 64, iters = 2, lr = 0.5)
        .select("doc_id", "margin_micro").as[(Long, Long)].collect().toMap
    assert(margins(1) === margins(7))
  }

  test("calibrationReport matches an independent recompute from served margins") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    val isNew = col("doc_id") % 10 >= 8
    val got = Classifier.calibrationReport(docs, "doc_id", "text",
        col("lang") === "en", isNew, d = 256, iters = 2, lr = 0.5)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // independent recompute: q134's served margins + labels, bucketed in
    // plain Scala with the same softsign/floor arithmetic
    val margins = SparkEntry.queries("q134_classifier_serve")(spark, sf)
      .select("doc_id", "margin_micro").as[(Long, Long)].collect().toMap
    val labels = docs.where(isNew).select(col("doc_id"),
        (col("lang") === "en").cast("long"))
      .as[(Long, Long)].collect()
    val expected = labels.map { case (id, y) =>
      val m = margins(id).toDouble / 1e6
      val p = 0.5 + 0.5 * (m / (1d + math.abs(m)))
      val bin = math.min(math.floor(p * 10).toLong, 9L)
      (bin, y, math.floor(p * 1000).toLong)
    }.groupBy(_._1).map { case (bin, rows) =>
      val n = rows.length.toLong
      val nPos = rows.map(_._2).sum
      (bin, n, nPos, nPos * 1000 / n, rows.map(_._3).sum / n)
    }.toSet
    assert(got === expected)
    assert(got.map(_._2).sum === labels.length.toLong)
  }

  test("thresholdSweep matches an independent recompute from served margins") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    val isNew = col("doc_id") % 10 >= 8
    val ts = Seq(-2000000L, -500000L, 0L, 500000L, 2000000L)
    val got = Classifier.thresholdSweep(docs, "doc_id", "text",
        col("lang") === "en", isNew, d = 256, iters = 2, lr = 0.5, ts)
      .as[(Long, Long, Long, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().toSet
    // independent recompute: q134's served margins + labels, one direct
    // pass per threshold in plain Scala
    val margins = SparkEntry.queries("q134_classifier_serve")(spark, sf)
      .select("doc_id", "margin_micro").as[(Long, Long)].collect().toMap
    val labels = docs.where(isNew).select(col("doc_id"),
        (col("lang") === "en").cast("long"))
      .as[(Long, Long)].collect()
    val pAll = labels.map(_._2).sum
    val nAll = labels.length.toLong
    val expected = ts.map { t =>
      val kept = labels.filter { case (id, _) => margins(id) > t }
      val tp = kept.map(_._2).sum
      val pp = kept.length.toLong
      (t, tp, pp - tp, pAll - tp, nAll - pp - pAll + tp,
        if (pp > 0) Some(tp * 1000 / pp) else None,
        if (pAll > 0) Some(tp * 1000 / pAll) else None,
        if (pp + pAll > 0) Some(tp * 2000 / (pp + pAll)) else None)
    }.toSet
    assert(got === expected)
  }

  test("thresholdSweep at t = 0 agrees with the serve rule, and extremes pin") {
    val ts = Seq(-1000000000L, 0L, 1000000000L)
    // hold out docs 2, 4, 6 (one positive, two negative) so both P and N
    // are non-empty in the scored slice
    val rows = Classifier.thresholdSweep(corpus, "doc_id", "text",
        col("gold") === 1, col("doc_id") % 2 === 0, d = 64, iters = 2,
        lr = 0.5, ts)
      .as[(Long, Long, Long, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    // far-left threshold keeps everything: recall 1000, tn = 0
    assert(rows(-1000000000L)._7 === Some(1000L))
    assert(rows(-1000000000L)._5 === 0L)
    // far-right threshold keeps nothing: tp = 0, precision undefined
    assert(rows(1000000000L)._2 === 0L)
    assert(rows(1000000000L)._6 === None)
  }

  test("parameters fail fast") {
    intercept[IllegalArgumentException] {
      Classifier.trainScore(corpus, "doc_id", "text", col("gold") === 1, d = 0)
    }
    intercept[IllegalArgumentException] {
      Classifier.thresholdSweep(corpus, "doc_id", "text", col("gold") === 1,
        col("doc_id") >= 4, d = 64, iters = 2, lr = 0.5, Seq(5L, 1L))
    }
    intercept[IllegalArgumentException] {
      Classifier.trainScore(corpus, "doc_id", "text", col("gold") === 1,
        iters = 0)
    }
    intercept[IllegalArgumentException] {
      Classifier.trainScore(corpus, "doc_id", "text", col("gold") === 1,
        lr = 0.0)
    }
  }
}
