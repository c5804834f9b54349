package graft

import org.apache.spark.sql.functions._

import graft.operators.CorpusOps

/** Corpus-assembly invariants: packing covers every doc exactly once with
  * in-budget offsets, sampling is growth-stable with sane rates, and source
  * caps are maximal (one more doc would exceed the cap). */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  test("packSequences: every doc exactly once, offset < budget, bins contiguous") {
    val packed = CorpusOps.packSequences(docs, "doc_id", "text",
      budgetTokens = 512, nShards = 4).cache()
    assert(packed.count() === docs.count())
    assert(packed.where(col("offset") < 0 || col("offset") >= 512).isEmpty)
    assert(packed.where(pmod(col("doc_id"), lit(4)) =!= col("shard")).isEmpty)
    // bin numbering per shard is contiguous from 0: max bin == distinct bins - 1
    val bins = packed.groupBy("shard")
      .agg(max("bin").as("mx"), countDistinct("bin").as("n"))
      .where(col("mx") =!= col("n") - 1)
    assert(bins.isEmpty)
    // offset equals running total mod budget: recompute independently
    val recomputed = packed.orderBy("shard", "doc_id")
      .select("shard", "n_tokens", "offset").as[(Long, Long, Long)].collect()
      .groupBy(_._1).forall { case (_, rows) =>
        rows.scanLeft(0L)(_ + _._2).zip(rows).forall {
          case (cumBefore, (_, _, off)) => off === cumBefore % 512
        }
      }
    assert(recomputed)
    packed.unpersist()
  }

  test("packTokenSlices: bins hold exactly the budget and reassemble the stream") {
    // synthetic token lists with known sizes straddling several boundaries
    val rnd = new scala.util.Random(11)
    val rows = (0L until 40L).map(i =>
      (i, (0 until 3 + rnd.nextInt(40)).map(j => s"t${i}_$j")))
    val df = rows.toDF("doc_id", "tokens")
    val cut = CorpusOps.packTokenSlices(df, "doc_id", "tokens",
      budgetTokens = 16, nShards = 4, sep = " ")
      .as[(Long, Long, Long, String)].collect()
    val byShard = rows.groupBy(_._1 % 4)
    byShard.foreach { case (shard, docs) =>
      val stream = docs.sortBy(_._1).flatMap(_._2)
      // every non-final bin holds EXACTLY the budget; the final bin the rest
      val binTokens = cut.filter(_._2 == shard).groupBy(_._3).toSeq.sortBy(_._1)
        .map { case (bin, rs) =>
          bin -> rs.sortBy(_._1).flatMap(_._4.split(" ")).toSeq }
      assert(binTokens.map(_._1) === binTokens.indices.map(_.toLong))
      binTokens.dropRight(1).foreach { case (_, ts) => assert(ts.size === 16) }
      // reassembling (bin, doc) order yields the concatenated stream verbatim
      assert(binTokens.flatMap(_._2) === stream)
    }
    // and the bin labels agree with packSequencesByCount's plan
    val plan = CorpusOps.packSequencesByCount(
        df.select(col("doc_id"), size(col("tokens")).as("n")), "doc_id", "n",
        budgetTokens = 16, nShards = 4)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    cut.groupBy(_._1).foreach { case (doc, rs) =>
      assert(rs.map(_._3).min === plan(doc), s"doc $doc starts in its plan bin")
    }
  }

  test("packBoundaryManifest: seams tile every bin and agree with packTokenSlices") {
    val rnd = new scala.util.Random(13)
    val rows = (0L until 40L).map(i =>
      (i, (0 until 3 + rnd.nextInt(40)).map(j => s"t${i}_$j")))
    val df = rows.toDF("doc_id", "tokens")
    val manifest = CorpusOps.packBoundaryManifest(
        df.select(col("doc_id"), size(col("tokens")).as("n")), "doc_id", "n",
        budgetTokens = 16, nShards = 4)
      .as[(Long, Long, Long, Long, String)].collect()
    val seams = manifest.map { case (shard, bin, nDocs, binToks, b) =>
      val parts = b.split(";").map { s =>
        val Array(doc, st, len) = s.split(":").map(_.toLong); (doc, st, len) }
      ((shard, bin), (nDocs, binToks, parts))
    }.toMap
    // per bin: seams start at 0, are contiguous, and sum to bin_tokens;
    // every bin but each shard's last holds exactly the budget
    seams.foreach { case ((shard, bin), (nDocs, binToks, parts)) =>
      assert(parts.length.toLong === nDocs)
      assert(parts.head._2 === 0L, s"($shard,$bin) starts at 0")
      parts.sliding(2).foreach {
        case Array((_, s1, l1), (_, s2, _)) => assert(s2 === s1 + l1)
        case _ =>
      }
      assert(parts.map(_._3).sum === binToks)
      val lastBin = seams.keys.filter(_._1 === shard).map(_._2).max
      if (bin != lastBin) assert(binToks === 16L, s"($shard,$bin) full")
    }
    // the manifest's (doc, bin, len) agrees with the actually-cut slices
    val cut = CorpusOps.packTokenSlices(df, "doc_id", "tokens",
        budgetTokens = 16, nShards = 4, sep = " ")
      .as[(Long, Long, Long, String)].collect()
      .map { case (doc, shard, bin, chunk) =>
        ((shard, bin, doc), chunk.split(" ").length.toLong) }.toMap
    val fromManifest = seams.toSeq.flatMap { case ((shard, bin), (_, _, parts)) =>
      parts.map { case (doc, _, len) => ((shard, bin, doc), len) } }.toMap
    assert(fromManifest === cut)
  }

  test("epochOrders: one row per (epoch, doc), contiguous positions, epochs permute independently") {
    val out = CorpusOps.epochOrders(docs, "doc_id", nShards = 4, epochs = 3)
      .as[(Long, Long, Long, Int)].collect()
    val nDocs = docs.count()
    assert(out.length.toLong === nDocs * 3)
    // every doc exactly once per epoch
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._1).distinct.length.toLong === nDocs)
    }
    // in-shard positions contiguous from 1
    out.groupBy(r => (r._2, r._3)).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted.toList === (1 to rows.length).toList)
    }
    // epochs are genuinely different permutations: the (shard, pos)
    // placement of documents differs between epoch 0 and epoch 1
    val place = out.groupBy(_._2).map { case (e, rows) =>
      e -> rows.map(r => r._1 -> (r._3, r._4)).toMap
    }
    assert(place(0L) !== place(1L))
    // and each epoch is reproducible: re-running yields identical rows
    val again = CorpusOps.epochOrders(docs, "doc_id", nShards = 4, epochs = 3)
      .as[(Long, Long, Long, Int)].collect()
    assert(out.sortBy(r => (r._2, r._3, r._4)).toSeq ===
      again.sortBy(r => (r._2, r._3, r._4)).toSeq)
  }

  test("curriculumShards: quantile phases from the histogram, phase-major shard order") {
    // 100 distinct scores 1..100, 4 phases → boundaries at 25/50/75 and
    // exactly 25 docs per phase
    val df = (1L to 100L).map(i => (i, i)).toSeq.toDF("doc_id", "score")
    val out = CorpusOps.curriculumShards(df, "doc_id", "score",
        phases = 4, nShards = 4)
      .as[(Long, Long, Long, Long, Int)].collect()
    assert(out.length === 100)
    out.foreach { case (_, score, phase, _, _) =>
      assert(phase === (score - 1) / 25, s"score $score phase $phase")
    }
    // in-shard positions are contiguous from 1 and phase-monotone
    out.groupBy(_._4).foreach { case (_, rows) =>
      val byPos = rows.sortBy(_._5)
      assert(byPos.map(_._5).toList === (1 to rows.length).toList)
      val phasesInOrder = byPos.map(_._3)
      assert(phasesInOrder === phasesInOrder.sorted)
    }
    // degenerate distribution: one score value → every boundary equals it,
    // everything lands in phase 0
    val flat = (1L to 10L).map(i => (i, 7L)).toSeq.toDF("doc_id", "score")
    val flatOut = CorpusOps.curriculumShards(flat, "doc_id", "score",
        phases = 4, nShards = 2)
      .select("phase").as[Long].collect()
    assert(flatOut.forall(_ === 0L))
    // empty input: a clean empty frame with the full schema, not an
    // ArrayIndexOutOfBounds from hist(-1)
    val empty = CorpusOps.curriculumShards(df.where(col("score") < 0),
      "doc_id", "score", phases = 4, nShards = 2)
    assert(empty.columns.toList ===
      List("doc_id", "score", "phase", "shard", "pos"))
    assert(empty.count() === 0L)
  }

  test("stratifiedSample: rates hold approximately and decisions are growth-stable") {
    val sampled = CorpusOps.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.5, "fr" -> 1.0, "de" -> 0.0), defaultRate = 0.2)
    val byLang = sampled.groupBy("lang").count().as[(String, Long)].collect().toMap
    val total = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang("fr") === total("fr"))          // rate 1.0 keeps everything
    assert(!byLang.contains("de"))                // rate 0.0 keeps nothing
    val enRatio = byLang("en").toDouble / total("en")
    assert(enRatio > 0.3 && enRatio < 0.7, s"en ratio $enRatio")
    // growth stability: sampling a subset yields the subset of the decisions
    val half = docs.where(col("doc_id") < 250)
    val sampledHalf = CorpusOps.stratifiedSample(half, "doc_id", "lang",
      Map("en" -> 0.5, "fr" -> 1.0, "de" -> 0.0), defaultRate = 0.2)
      .select("doc_id").as[Long].collect().toSet
    val fullBelow = sampled.where(col("doc_id") < 250)
      .select("doc_id").as[Long].collect().toSet
    assert(sampledHalf === fullBelow)
  }

  test("dedupBlocks: corpus-wide keep-first, hot blocks and empty survivors") {
    // "a b" is the hot block (appears in three docs) — the corpus-wide
    // keep-first decision must keep exactly the doc-1 instance. Doc 2 is
    // entirely made of already-seen blocks → zero survivors, null text.
    val docs = Seq(
      (1L, "a b c d"), // both blocks first occurrences
      (2L, "a b c d"), // both duplicate → empty survivor
      (3L, "a b x y"), // one duplicate, one fresh
      (4L, "e")        // short tail block
    ).toDF("doc_id", "text")
    val out = CorpusOps.dedupBlocks(docs, "doc_id", "text", blockTokens = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(out === Array(
      (1L, 2L, 2L, "a b c d"),
      (2L, 2L, 0L, null),
      (3L, 2L, 1L, "x y"),
      (4L, 1L, 1L, "e")))
  }

  test("weightedSample: matches an independent Efraimidis-Spirakis computation") {
    val k = 3
    val weighted = docs.withColumn("n_tokens",
      size(split(col("text"), " ")).cast("long"))
    val got = CorpusOps.weightedSample(weighted, "doc_id", "source", "n_tokens", k)
      .as[(String, Long)].collect().toSet
    // independent recomputation: md5-prefix uniform -> ln(u)/w -> top-k
    val md = java.security.MessageDigest.getInstance("MD5")
    def pri(id: Long, w: Long): Double = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString.take(8)
      val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 4294967296d
      math.log(u) / w
    }
    val expected = weighted.select("source", "doc_id", "n_tokens")
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).toSeq.flatMap { case (src, rows) =>
        rows.map { case (_, id, w) => (id, pri(id, w)) }
          .sortBy { case (id, p) => (-p, id) }.take(k)
          .map { case (id, _) => (src, id) }
      }.toSet
    assert(got === expected)
    // every group contributes at most k rows
    assert(got.groupBy(_._1).values.forall(_.size <= k))
  }

  test("capSourceTokens: within cap per source, and maximal") {
    val cap = 2000L
    val kept = CorpusOps.capSourceTokens(docs, "doc_id", "source", "text", cap)
    val totals = kept.groupBy("source").agg(sum("n_tokens").as("tot"),
      max("cum_tokens").as("mx"))
    assert(totals.where(col("tot") > cap).isEmpty)
    // maximality: for each source, the smallest DROPPED doc in hash order
    // would push the total past the cap
    val perSourceKept = totals.select("source", "tot").as[(String, Long)]
      .collect().toMap
    val dropped = docs.withColumn("n_tokens",
        size(split(col("text"), " ")).cast("long"))
      .withColumn("h", md5(col("doc_id").cast("string")))
      .join(kept.select("doc_id").withColumn("k", lit(1)), Seq("doc_id"), "left_anti")
      .orderBy("source", "h", "doc_id")
      .select("source", "n_tokens").as[(String, Long)].collect()
      .groupBy(_._1).map { case (s, rows) => s -> rows.head._2 }
    dropped.foreach { case (s, firstDroppedTokens) =>
      assert(perSourceKept.getOrElse(s, 0L) + firstDroppedTokens > cap,
        s"source $s dropped a doc that would still have fit")
    }
  }

  test("temperatureMix: alpha=1 reduces to one uniform corpus-wide rate") {
    // with alpha = 1 the weights are the token totals themselves, so every
    // source's keep rate collapses to budget / totalTokens — verify against
    // an independent recomputation of that closed form
    val budget = 6000L
    val withTok = docs.withColumn("n_tokens",
      size(split(col("text"), " ")).cast("long"))
    val total = withTok.agg(sum("n_tokens")).as[Long].head()
    val rate = budget.toDouble / total
    val expected = withTok.where(
        graft.operators.CorpusOps.hashUniform(col("doc_id")) < rate)
      .select("doc_id").as[Long].collect().toSet
    val got = CorpusOps.temperatureMix(docs, "doc_id", "source", "text",
        alpha = 1.0, budgetTokens = budget)
      .select("doc_id").as[Long].collect().toSet
    assert(got === expected)
  }

  test("temperatureMix: matches the closed-form rates; alpha<1 flattens them") {
    val alpha = 0.3
    val budget = 6000L
    val withTok = docs.withColumn("n_tokens",
      size(split(col("text"), " ")).cast("long"))
    val totals = withTok.groupBy("source").agg(sum("n_tokens").as("t"))
      .as[(String, Long)].collect().toMap
    // independent closed-form recomputation, mirroring the integer-quantized
    // normalizer: rate_s = min(1, budget * wq_s / sum(wq) / tokens_s)
    val wq = totals.map { case (s, t) =>
      s -> math.floor(math.pow(t.toDouble, alpha) * 1e6 + 0.5).toLong }
    val wSum = wq.values.sum.toDouble
    val rates = totals.map { case (s, t) =>
      s -> math.min(1d, budget.toDouble * wq(s).toDouble / wSum / t.toDouble) }
    val md = java.security.MessageDigest.getInstance("MD5")
    def hashU(id: Long): Double = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString.take(8)
      java.lang.Long.parseLong(hex, 16).toDouble / 4294967296d
    }
    val expected = withTok.select("doc_id", "source").as[(Long, String)]
      .collect().filter { case (id, s) => hashU(id) < rates(s) }
      .map(_._1).toSet
    def keptIds(df: org.apache.spark.sql.DataFrame) =
      CorpusOps.temperatureMix(df, "doc_id", "source", "text", alpha, budget)
        .select("doc_id").as[Long].collect().toSet
    assert(keptIds(docs) === expected)
    // flattening is a property of the RATES (the realized sample on a tiny
    // fixture is too noisy): the largest source keeps a strictly smaller
    // fraction than the smallest one when alpha < 1
    assert(rates(totals.maxBy(_._2)._1) < rates(totals.minBy(_._2)._1))
    // and the decision set is identical under any input partitioning
    assert(keptIds(docs.repartition(7)) === expected)
  }

  test("deterministicShuffle: contiguous in-shard positions, stable anywhere") {
    val out = CorpusOps.deterministicShuffle(docs, "doc_id", nShards = 8).cache()
    assert(out.count() === docs.count())
    assert(out.where(col("shard") < 0 || col("shard") >= 8).isEmpty)
    // positions are exactly 1..n within each shard
    val bad = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"),
        countDistinct("pos").as("d"))
      .where(col("mx") =!= col("n") || col("d") =!= col("n"))
    assert(bad.isEmpty)
    // bit-identical under repartitioning
    val again = CorpusOps.deterministicShuffle(docs.repartition(5), "doc_id",
      nShards = 8).orderBy("doc_id").collect().toSeq
    assert(again === out.orderBy("doc_id").collect().toSeq)
    out.unpersist()
  }

  test("shardManifest: XOR checksum matches an independent MD5 recount, order-free") {
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val docs = Seq((1L, "a b"), (2L, "c d e"), (3L, "f"), (17L, "g h i j"))
      .toDF("doc_id", "text")
    val got = CorpusOps.shardManifest(docs, "doc_id", "text", nShards = 4)
      .select("shard", "n_docs", "n_tokens", "ids_xor")
      .as[(Long, Long, Long, Long)].collect().toSet
    val expect = Seq(1L -> 2, 2L -> 3, 3L -> 1, 17L -> 4)
      .map { case (id, nTok) =>
        val shard = java.lang.Long.parseLong(
          md5hex(s"shuffle|$id").substring(0, 8), 16) % 4
        val h = java.lang.Long.parseLong(md5hex(s"id:$id").substring(0, 15), 16)
        (shard, nTok.toLong, h)
      }
      .groupBy(_._1).map { case (shard, rows) =>
        (shard, rows.size.toLong, rows.map(_._2).sum,
          rows.map(_._3).reduce(_ ^ _))
      }.toSet
    assert(got === expect)
    val again = CorpusOps.shardManifest(docs.repartition(7), "doc_id", "text",
      nShards = 4).select("shard", "n_docs", "n_tokens", "ids_xor")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(again === got)
  }

  test("packEfficiencySweep: agrees with the real packTokenSlices layout") {
    val counts = docs.select(col("doc_id"),
      graft.operators.TextAnalysis.tokenCount(col("text")).as("n"))
    val sweep = CorpusOps.packEfficiencySweep(counts, "doc_id", "n",
        budgets = Seq(64, 256), nShards = 4)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    for (b <- Seq(64, 256)) {
      // independent recount from the emitted slices: bins per shard and
      // docs overlapping more than one bin
      val slices = CorpusOps.packTokenSlices(
        docs.select(col("doc_id"),
          graft.operators.TextAnalysis.tokens(col("text")).as("tl")),
        "doc_id", "tl", budgetTokens = b, nShards = 4)
      val nBins = slices.select("shard", "bin").distinct().count()
      val cutDocs = slices.groupBy("doc_id").count().where(col("count") > 1).count()
      val (_, nDocs, total, gotBins, padded, fill, gotCut, _) = sweep(b.toLong)
      assert(gotBins === nBins, s"budget $b bins")
      assert(gotCut === cutDocs, s"budget $b cuts")
      assert(nDocs === docs.count())
      assert(padded === gotBins * b - total)
      assert(fill === total * 1000 / (gotBins * b))
    }
  }

  test("mixturePlan: caps bind, surplus re-flows, invariants hold") {
    // supplies: a=100, b=100, c=1000, zero-weight z=50, budget 60% of 1250
    // = 750, cap 1.0 epoch. Proportional shares at w=(10,10,5): a,b get 300
    // each — both cap at 100; c gets the re-flowed remainder.
    val perDoc = Seq(("a", 100L), ("b", 100L), ("c", 1000L), ("z", 50L))
      .flatMap { case (s, n) => Seq((s, n / 2), (s, n - n / 2)) }
      .toDF("source", "n")
    val got = CorpusOps.mixturePlan(perDoc, "source", "n",
        weights = Map("a" -> 10L, "b" -> 10L, "c" -> 5L),
        budgetPermille = 600, maxEpochsMilli = 1000)
      .as[(String, Long, Long, Long, Boolean, Long, Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("a") === ("a", 100L, 10L, 100L, true, 100L, Some(1000L)))
    assert(got("b") === ("b", 100L, 10L, 100L, true, 100L, Some(1000L)))
    // c takes the remaining 550 uncapped (5/5 of the leftover weight)
    assert(got("c") === ("c", 1000L, 5L, 1000L, false, 550L, Some(550L)))
    assert(got("z") === ("z", 50L, 0L, 50L, false, 0L, Some(0L)))
    // invariants: nothing over cap, total within budget
    got.values.foreach(r => assert(r._6 <= r._4))
    assert(got.values.map(_._6).sum <= 750L)
  }

  test("epochQuotas: full passes + maximal partial prefix, zero-weight gets nothing") {
    val perDoc = Seq(
      (1L, "a", 40L), (2L, "a", 60L),          // a: 100 tokens
      (3L, "b", 100L),                          // b: 100
      (4L, "c", 400L), (5L, "c", 600L),         // c: 1000
      (6L, "z", 50L))                           // z: zero weight
      .toDF("doc_id", "source", "n")
    val got = CorpusOps.epochQuotas(perDoc, "doc_id", "source", "n",
        weights = Map("a" -> 10L, "b" -> 10L, "c" -> 5L),
        budgetPermille = 600, maxEpochsMilli = 1000)
      .as[(Long, String, Long, Long, Boolean, Long)].collect()
      .map(r => r._1 -> r).toMap
    // from the mixturePlan fixture: a,b cap at 100 (1 full pass, rem 0);
    // c gets 550 of 1000 -> 0 full passes, partial prefix of <= 550 tokens
    for (id <- Seq(1L, 2L, 3L)) {
      assert(got(id)._4 === 1L); assert(!got(id)._5); assert(got(id)._6 === 1L)
    }
    // hash order puts doc 4 (md5 "4" = a8..) before doc 5 (e4..): the
    // greedy prefix takes doc 4 (cum 400 <= 550) and stops at doc 5
    // (cum 1000) — capSourceTokens' cumulative semantics, not a knapsack
    assert(got(4L)._5 && got(4L)._6 === 1L)
    assert(!got(5L)._5 && got(5L)._6 === 0L)
    assert(got(6L)._4 === 0L); assert(!got(6L)._5); assert(got(6L)._6 === 0L)
  }

  test("mixturePlan: no caps -> pure proportional split; all-capped is supply-bound") {
    val perDoc = Seq(("a", 300L), ("b", 300L)).toDF("source", "n")
    val free = CorpusOps.mixturePlan(perDoc, "source", "n",
        weights = Map("a" -> 3L, "b" -> 1L),
        budgetPermille = 500, maxEpochsMilli = 2000)
      .as[(String, Long, Long, Long, Boolean, Long, Option[Long])]
      .collect().map(r => r._1 -> r._6).toMap
    // budget 300, no cap binds (caps are 600): a gets 225, b gets 75
    assert(free === Map("a" -> 225L, "b" -> 75L))
    // epoch cap below every proportional share: everything capped at supply
    val tight = CorpusOps.mixturePlan(perDoc, "source", "n",
        weights = Map("a" -> 3L, "b" -> 1L),
        budgetPermille = 1000, maxEpochsMilli = 100)
      .as[(String, Long, Long, Long, Boolean, Long, Option[Long])]
      .collect()
    tight.foreach { r => assert(r._5); assert(r._6 === r._4) }
  }
}
