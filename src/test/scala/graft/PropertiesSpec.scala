package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

import graft.functions.{Blake2b, Blake2s, ScoredCand, TopKAggregator}
import graft.operators.{AsOf, CorpusOps, Fill, Reshape, Rolling, Trim}

/** Property-based invariants (SURVEY.md §5 plan): rolling-sum vs brute force,
  * densify/fill idempotence, trim invariants, hash determinism. */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic forAll: fixed-seed samples from a ScalaCheck Gen. */
  private def forAllSeeded[T](gen: Gen[T], n: Int)(body: T => Unit): Unit =
    (1 to n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private val seriesGen: Gen[List[Option[Double]]] =
    Gen.listOfN(20, Gen.oneOf(
      Gen.const(None),
      Gen.choose(-5, 20).map(v => Some(v.toDouble))))

  private def toDf(vals: List[Option[Double]]) =
    vals.zipWithIndex.map { case (v, i) =>
      ("A", "X", java.sql.Date.valueOf(f"2021-01-${i + 1}%02d"),
        v.map(java.lang.Double.valueOf).orNull)
    }.toDF("areaType", "areaCode", "date", "m")

  test("rollingSum equals the brute-force pandas definition on random series") {
    forAllSeeded(seriesGen, 15) { vals =>
      val got = Rolling.rollingSum(toDf(vals), Seq("areaType", "areaCode"),
          "date", "m", "rs")
        .orderBy("date").select("rs").as[Option[Double]].collect().toList
      val expect = vals.indices.map { i =>
        val frame = vals.slice(math.max(0, i - 6), i + 1)
        if (i >= 6 && frame.forall(_.isDefined)) Some(frame.flatten.sum) else None
      }.toList
      assert(got === expect)
    }
  }

  test("bounded zero-fill is idempotent and only ever replaces nulls with 0") {
    forAllSeeded(seriesGen, 10) { vals =>
      val keys = Seq("areaType", "areaCode")
      val once = Fill.zeroFillBounded(toDf(vals), keys, "date", "m")
      val twice = Fill.zeroFillBounded(once, keys, "date", "m")
      val a = once.orderBy("date").select("m").as[Option[Double]].collect().toList
      val b = twice.orderBy("date").select("m").as[Option[Double]].collect().toList
      assert(a === b)
      a.zip(vals).foreach { case (filled, orig) =>
        assert(filled === orig || (orig.isEmpty && filled.contains(0d)))
      }
    }
  }

  test("densifyDates preserves all original rows and adds only nulls") {
    forAllSeeded(seriesGen, 10) { vals =>
      val df = toDf(vals).where($"m".isNotNull)
      val dense = Reshape.densifyDates(df, Seq("areaType", "areaCode"), "date")
      assert(dense.where($"m".isNotNull).count() === df.count())
      val sumBefore = df.agg(sum("m")).as[Option[Double]].collect()(0)
      val sumAfter = dense.agg(sum("m")).as[Option[Double]].collect()(0)
      assert(sumBefore === sumAfter)
    }
  }

  test("trimEnd never changes surviving values, only nulls the tail") {
    forAllSeeded(seriesGen.map(_.map(v => Some(v.getOrElse(1.0)))), 10) { vals =>
      val out = Trim.trimEnd(toDf(vals), "date", Seq("m"), 5)
        .orderBy("date").select("m").as[Option[Double]].collect().toList
      assert(out.takeRight(5).forall(_.isEmpty))
      assert(out.dropRight(5) === vals.dropRight(5))
    }
  }

  test("asofBackward equals the brute-force latest-at-or-before on random data") {
    val evGen: Gen[(List[(Long, Int)], List[(Long, Int, Double)])] = for {
      lt <- Gen.listOfN(12, Gen.zip(Gen.choose(1L, 3L), Gen.choose(0, 50)))
      rt <- Gen.listOfN(12, Gen.zip(Gen.choose(1L, 3L), Gen.choose(0, 50)))
    } yield (lt, rt.zipWithIndex.map { case ((k, t), i) => (k, t, i.toDouble) })
    forAllSeeded(evGen, 10) { case (lts, rts) =>
      // dedup right (k, t) keeping max v so the expected match is unambiguous
      val rdeduped = rts.groupBy(r => (r._1, r._2)).values.map(_.maxBy(_._3)).toList
      val left = lts.zipWithIndex.map { case ((k, t), i) =>
        (i.toLong, k, java.sql.Timestamp.valueOf(f"2026-01-01 00:${t / 60}%02d:${t % 60}%02d"))
      }.toDF("l_id", "k", "t")
      val right = rdeduped.map { case (k, t, v) =>
        (k, java.sql.Timestamp.valueOf(f"2026-01-01 00:${t / 60}%02d:${t % 60}%02d"), v)
      }.toDF("k", "rt", "v")
      val got = AsOf.asofBackward(left, right, Seq("k"), "t", "rt", Seq("v"))
        .select("l_id", "v").as[(Long, Option[Double])].collect().toMap
      lts.zipWithIndex.foreach { case ((k, t), i) =>
        val expect = rdeduped.filter(r => r._1 == k && r._2 <= t) match {
          case Nil => None
          case xs => Some(xs.maxBy(r => (r._2, r._3))._3)
        }
        assert(got(i.toLong) === expect, s"left#$i key=$k t=$t")
      }
    }
  }

  test("TopKAggregator matches sort-and-take for any split of the input") {
    val inGen = Gen.zip(
      Gen.listOfN(40, Gen.zip(Gen.choose(0, 9).map(_.toDouble), Gen.choose(0L, 1000L))),
      Gen.choose(1, 6))
    forAllSeeded(inGen, 15) { case (pairs, k) =>
      val agg = new TopKAggregator(k)
      // unique ids so the (score desc, id asc) expected order is unambiguous
      val uniq = pairs.zipWithIndex.map { case ((s, i), n) => ScoredCand(s, i * 100 + n) }
      val expect = uniq.sortBy(c => (-c.score, c.id)).take(k)
      (1 until uniq.length).foreach { split =>
        val (a, b) = uniq.splitAt(split)
        val merged = agg.merge(a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
        assert(agg.finish(merged).items === expect, s"split=$split k=$k")
      }
    }
  }

  private val docsGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(5, 25)
    texts <- Gen.listOfN(n, Gen.choose(1, 30).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf("alpha", "beta", "gamma", "delta", "x"))
        .map(_.mkString(" "))))
  } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("packSequences matches the brute-force sequential packing on random docs") {
    forAllSeeded(docsGen, 10) { docs =>
      val budget = 17
      val got = CorpusOps.packSequences(
          docs.toDF("doc_id", "text"), "doc_id", "text", budget, nShards = 3)
        .select("doc_id", "shard", "n_tokens", "bin", "offset")
        .as[(Long, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> r).toMap
      docs.groupBy(_._1 % 3).foreach { case (shard, shardDocs) =>
        var cum = 0L
        shardDocs.sortBy(_._1).foreach { case (id, text) =>
          val nTok = text.split(" ", -1).length.toLong
          val (gid, gShard, gTok, gBin, gOff) = got(id)
          assert(gShard === shard && gTok === nTok)
          assert(gBin === cum / budget, s"doc $id bin")
          assert(gOff === cum % budget, s"doc $id offset")
          cum += nTok
        }
      }
    }
  }

  test("capSourceTokens keeps exactly the maximal hash-order prefix per source") {
    forAllSeeded(docsGen, 10) { docs =>
      val cap = 40L
      val df = docs.map { case (i, t) => (i, s"src${i % 2}", t) }
        .toDF("doc_id", "source", "text")
      val kept = CorpusOps.capSourceTokens(df, "doc_id", "source", "text", cap)
        .select("doc_id").as[Long].collect().toSet
      def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      docs.groupBy(_._1 % 2).foreach { case (_, srcDocs) =>
        val ordered = srcDocs.sortBy { case (i, _) => (md5hex(i.toString), i) }
        var cum = 0L
        ordered.foreach { case (id, text) =>
          cum += text.split(" ", -1).length
          assert(kept.contains(id) === (cum <= cap), s"doc $id cum=$cum")
        }
      }
    }
  }

  test("Misra-Gries keeps its guarantee and error bound under any split point") {
    val streamGen = Gen.zip(
      Gen.listOfN(300, Gen.frequency(
        5 -> Gen.const("hot"), 3 -> Gen.const("warm"),
        10 -> Gen.choose(0, 50).map(i => s"n$i"))),
      Gen.choose(4, 16))
    forAllSeeded(streamGen, 12) { case (stream, k) =>
      val agg = new graft.functions.MisraGriesAggregator(k)
      val n = stream.length
      val truth = stream.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      (1 until n by 37).foreach { split =>
        val (a, b) = stream.splitAt(split)
        val buf = agg.merge(
          a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
        val res = agg.finish(buf)
        assert(res.tokens.size <= k)
        // the frequent-item guarantee survives the merge
        truth.foreach { case (t, c) =>
          if (c > n / (k + 1))
            assert(res.tokens.contains(t), s"$t count=$c k=$k split=$split")
        }
        // every estimate lower-bounds truth, within the summed error bound
        res.tokens.zip(res.estimates).foreach { case (t, e) =>
          assert(e <= truth(t) && truth(t) - e <= n / (k + 1) + 1,
            s"$t est=$e true=${truth(t)} k=$k")
        }
      }
    }
  }

  test("dedupBlocks keeps exactly the (id, pos)-first occurrences, reassembled in order") {
    val corpusGen: Gen[List[(Long, String)]] = for {
      n <- Gen.choose(3, 12)
      texts <- Gen.listOfN(n, Gen.choose(1, 9).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("a", "b", "c")).map(_.mkString(" "))))
    } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    forAllSeeded(corpusGen, 8) { docs =>
      val bt = 2
      val out = CorpusOps.dedupBlocks(
          docs.toDF("doc_id", "text"), "doc_id", "text", bt)
        .select("doc_id", "n_blocks", "n_kept", "deduped_text")
        .as[(Long, Long, Long, Option[String])].collect()
        .map(r => r._1 -> r).toMap
      val blocksOf = docs.map { case (id, t) =>
        id -> t.split(" ", -1).toList.grouped(bt).map(_.mkString(" ")).toList
      }.toMap
      val seen = scala.collection.mutable.Set[String]()
      docs.sortBy(_._1).foreach { case (id, _) =>
        val kept = blocksOf(id).filter(seen.add)
        val (_, gN, gKept, gText) = out(id)
        assert(gN === blocksOf(id).length.toLong, s"doc $id n_blocks")
        assert(gKept === kept.length.toLong, s"doc $id n_kept")
        assert(gText === (if (kept.nonEmpty) Some(kept.mkString(" ")) else None),
          s"doc $id text")
      }
    }
  }

  test("blocklistScan equals a brute-force substring-window recount on random corpora") {
    val tokGen = Gen.oneOf("a", "b", "c", "d")
    val docGen = Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, tokGen).map(_.mkString(" ")))
    val corpusGen = Gen.listOfN(8, docGen)
    val phrases = Seq("a b", "c a", "a b c")
    forAllSeeded(corpusGen, 10) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = graft.operators.TextAnalysis
        .blocklistScan(docs, "doc_id", "text", phrases)
        .as[(Long, String, Long)].collect().toSet
      val expect = (for {
        (t, i) <- texts.zipWithIndex
        toks = t.split(" ").toList
        p <- phrases
        pn = p.split(" ").length
        // shingles() semantics: a doc shorter than pn contributes its whole
        // text as the single window
        windows = if (toks.length < pn) Seq(toks.mkString(" "))
                  else toks.sliding(pn).map(_.mkString(" ")).toSeq
        n = windows.count(_ == p) if n > 0
      } yield (i.toLong, p, n.toLong)).toSet
      assert(got === expect, s"corpus: $texts")
    }
  }

  test("tokenDrift equals a brute-force ppm recount on random two-slice corpora") {
    val tokGen = Gen.oneOf("a", "b", "c", "d", "e")
    val docGen = Gen.chooseNum(1, 10).flatMap(n =>
      Gen.listOfN(n, tokGen).map(_.mkString(" ")))
    val corpusGen = Gen.listOfN(10, docGen)
    forAllSeeded(corpusGen, 10) { texts =>
      // ids 0..4 old, 10..14 new — both slices always non-empty
      val docs = texts.zipWithIndex.map { case (t, i) =>
        (if (i < 5) i.toLong else (i + 5).toLong, t)
      }.toDF("doc_id", "text")
      val got = graft.operators.TextAnalysis
        .tokenDrift(docs, "text", col("doc_id") >= 10, k = 100)
        .as[(String, Long, Long, Long, Long, Long)].collect()
      def counts(sel: Int => Boolean) = texts.zipWithIndex
        .filter { case (_, i) => sel(i) }
        .flatMap(_._1.split(" ")).groupBy(identity).map { case (t, o) => t -> o.size.toLong }
      val co = counts(_ < 5); val cn = counts(_ >= 5)
      val no = co.values.sum; val nn = cn.values.sum
      val expect = (co.keySet ++ cn.keySet).map { t =>
        val o = co.getOrElse(t, 0L); val n = cn.getOrElse(t, 0L)
        val po = o * 1000000L / no; val pn = n * 1000000L / nn
        (t, o, n, po, pn, math.abs(pn - po))
      }
      assert(got.toSet === expect, s"corpus: $texts")
      // ordered slice is (drift desc, token asc)
      assert(got.toList === got.toList.sortBy(r => (-r._6, r._1)))
    }
  }

  test("gramNovelty equals a brute-force unseen-gram recount on random corpora") {
    val tokGen = Gen.oneOf("a", "b", "c")
    val docGen = Gen.chooseNum(2, 8).flatMap(n =>
      Gen.listOfN(n, tokGen).map(_.mkString(" ")))
    val corpusGen = Gen.listOfN(8, docGen)
    forAllSeeded(corpusGen, 10) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) =>
        (if (i < 4) i.toLong else (i + 6).toLong, t)
      }.toDF("doc_id", "text")
      def grams(t: String): Set[String] = {
        val toks = t.split(" ").toList
        if (toks.length < 2) Set(toks.mkString(" "))
        else toks.sliding(2).map(_.mkString(" ")).toSet
      }
      val oldSet = texts.take(4).flatMap(grams).toSet
      val got = graft.operators.TextAnalysis
        .gramNovelty(docs, "doc_id", "text", n = 2, isNew = col("doc_id") >= 10)
        .as[(Long, Long, Long, Long)].collect().toSet
      val expect = texts.zipWithIndex.drop(4).map { case (t, i) =>
        val g = grams(t)
        val unseen = g.count(x => !oldSet.contains(x)).toLong
        ((i + 6).toLong, g.size.toLong, unseen, unseen * 1000 / g.size)
      }.toSet
      assert(got === expect, s"corpus: $texts")
    }
  }

  test("maximalRepeatedSpans equals brute-force islands on random small-vocab corpora") {
    // a 4-symbol vocabulary forces plenty of repeated n-grams, including
    // overlapping and adjacent covers — the edge geometry the operator merges
    val docGen = Gen.listOfN(5,
      Gen.chooseNum(8, 24).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("u", "v", "w", "x")).map(_.mkString(" "))))
    forAllSeeded(docGen, 8) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val n = 3
      val got = graft.operators.Dedup
        .maximalRepeatedSpans(docs.toDF("doc_id", "text"), "doc_id", "text", n)
        .as[(Long, Long, Long, String)].collect().toSet
      // brute force: count every n-gram, mark covered positions, merge runs
      val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
      val counts = toks.values.toSeq
        .flatMap(ts => if (ts.length >= n) ts.sliding(n).map(_.mkString(" ")) else Nil)
        .groupBy(identity).map { case (k, v) => k -> v.size }
      val expect = docs.flatMap { case (id, _) =>
        val ts = toks(id)
        val covered = (for {
          i <- 0 to ts.length - n
          if counts(ts.slice(i, i + n).mkString(" ")) > 1
          p <- i until i + n
        } yield p).distinct.sorted
        covered.foldLeft(List.empty[List[Int]]) {
          case ((run :: rest), p) if run.head == p - 1 => (p :: run) :: rest
          case (acc, p) => List(p) :: acc
        }.map(_.reverse).map(run => (id, run.head + 1L, run.size.toLong,
          ts.slice(run.head, run.head + run.size).mkString(" ")))
      }.toSet
      assert(got === expect, s"corpus: $texts")
    }
  }

  test("bpeTrain merge trajectory equals a list-based reference trainer") {
    // reference trainer on symbol LISTS: the property pins that the
    // sentinel-string replace implements greedy-leftmost merge exactly
    def referenceMerges(wordFreq: Map[String, Long], rounds: Int): List[(Int, String, Long)] = {
      var words: Map[List[String], Long] = wordFreq
        .map { case (w, f) => w.map(_.toString).toList -> f }
      val out = scala.collection.mutable.ListBuffer.empty[(Int, String, Long)]
      for (r <- 1 to rounds) {
        val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
        words.foreach { case (syms, f) =>
          syms.zip(syms.drop(1)).foreach(p => pairs(p) = pairs.getOrElse(p, 0L) + f)
        }
        if (pairs.nonEmpty && out.size == r - 1) {
          val ((a, b), c) = pairs.toSeq
            .minBy { case ((a, b), c) => (-c, "!" + a + "?!" + b + "?") }
          out += ((r, "!" + a + "?!" + b + "?", c))
          words = words.groupBy { case (syms, _) =>
            val merged = scala.collection.mutable.ListBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                merged += (a + b); i += 2
              } else { merged += syms(i); i += 1 }
            }
            merged.toList
          }.map { case (mergedSyms, group) => mergedSyms -> group.values.sum }
        }
      }
      out.toList
    }
    val corpusGen = Gen.listOfN(6,
      Gen.chooseNum(1, 6).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf('a', 'b', 'c')).map(_.mkString)))
    forAllSeeded(corpusGen, 8) { wordList =>
      val docs = Seq((1L, wordList.mkString(" "))).toDF("doc_id", "text")
      // BOTH execution paths must walk the reference trajectory: threshold 0
      // forces the distributed loop, MaxValue the driver-local one
      val dist = graft.operators.TextAnalysis.bpeTrain(docs, "text",
          rounds = 5, localThreshold = 0L)
        .orderBy("round").as[(Int, String, Long)].collect().toList
      val local = graft.operators.TextAnalysis.bpeTrain(docs, "text",
          rounds = 5, localThreshold = Long.MaxValue)
        .orderBy("round").as[(Int, String, Long)].collect().toList
      val freq = wordList
        .filter(w => w.length >= 2 && !w.contains("!") && !w.contains("?"))
        .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
      val expect = referenceMerges(freq, 5)
      assert(dist === expect, s"distributed path, words: $wordList")
      assert(local === expect, s"local path, words: $wordList")
      // ... and leave identical final segmentations (the tokenizer artifact)
      val vd = graft.operators.TextAnalysis.bpeVocab(docs, "text",
        rounds = 5, localThreshold = 0L).as[(String, String)].collect().toSet
      val vl = graft.operators.TextAnalysis.bpeVocab(docs, "text",
        rounds = 5, localThreshold = Long.MaxValue)
        .as[(String, String)].collect().toSet
      assert(vd === vl, s"vocab divergence, words: $wordList")
    }
  }

  test("blake2s/blake2b are deterministic, length-correct, and key-sensitive") {
    forAllSeeded(Gen.zip(Gen.asciiPrintableStr, Gen.choose(1, 32)), 30) { case (s, n) =>
      val data = s.getBytes("UTF-8")
      val d1 = Blake2s.hexDigest(data, "k1".getBytes, n)
      assert(d1.length === n * 2)
      assert(d1 === Blake2s.hexDigest(data, "k1".getBytes, n))
      assert(d1 !== Blake2s.hexDigest(data, "k2".getBytes, n))
      val b1 = Blake2b.hexDigest(data, Array.empty, n)
      assert(b1.length === n * 2 && b1 === Blake2b.hexDigest(data, Array.empty, n))
    }
  }

  test("mixturePlan invariants hold on random supplies/weights/budgets") {
    val gen = for {
      nSrc <- Gen.choose(2, 7)
      supplies <- Gen.listOfN(nSrc, Gen.choose(0L, 5000L))
      weights <- Gen.listOfN(nSrc, Gen.choose(0L, 50L))
      budgetPm <- Gen.choose(100L, 1500L)
      epochsMilli <- Gen.choose(200L, 3000L)
    } yield (supplies, weights, budgetPm, epochsMilli)
    forAllSeeded(gen, 25) { case (supplies, weights, budgetPm, epochsMilli) =>
      val srcs = supplies.indices.map(i => s"s$i")
      val perDoc = srcs.zip(supplies)
        .flatMap { case (s, n) => Seq((s, n / 2), (s, n - n / 2)) }
        .toDF("source", "n")
      val wMap = srcs.zip(weights).toMap[String, Long]
      val plan = CorpusOps.mixturePlan(perDoc, "source", "n", wMap,
          budgetPm, epochsMilli)
        .as[(String, Long, Long, Long, Boolean, Long, Option[Long])].collect()
      val budget = supplies.sum * budgetPm / 1000
      // never over cap, never over budget in total, zero-weight gets zero
      plan.foreach { r =>
        assert(r._6 <= r._4, s"alloc ${r._6} > cap ${r._4}: $r")
        assert(r._6 >= 0L)
        if (r._3 == 0L) { assert(r._6 === 0L); assert(!r._5) }
        if (r._5) assert(r._6 === r._4, s"capped must sit at cap: $r")
      }
      assert(plan.map(_._6).sum <= budget)
      // when NOTHING caps, allocations are the plain proportional floor
      if (plan.forall(!_._5)) {
        val wTot = plan.map(_._3).sum
        if (wTot > 0) plan.foreach { r =>
          assert(r._6 === (BigInt(r._3) * budget / wTot).toLong, s"prop: $r")
        }
      }
      // if the budget covers every cap, everyone with weight caps out
      if (budget >= plan.map(_._4).sum)
        plan.filter(_._3 > 0).foreach(r => assert(r._5, s"must cap: $r"))
    }
  }

  test("packEfficiencySweep invariants hold on random counts for every budget") {
    val gen = for {
      n <- Gen.choose(5, 40)
      counts <- Gen.listOfN(n, Gen.choose(1L, 300L))
    } yield counts
    forAllSeeded(gen, 15) { counts =>
      val df = counts.zipWithIndex.map { case (c, i) => (i.toLong, c) }
        .toDF("doc_id", "n")
      val rows = CorpusOps.packEfficiencySweep(df, "doc_id", "n",
          budgets = Seq(64, 128, 512), nShards = 3)
        .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
      assert(rows.map(_._1).sorted.toList === List(64L, 128L, 512L))
      val total = counts.sum
      rows.foreach { case (b, nDocs, tot, bins, padded, fill, cutDocs, cuts) =>
        assert(nDocs === counts.length.toLong && tot === total)
        assert(padded === bins * b - tot && padded >= 0L)
        assert(fill === tot * 1000 / (bins * b) && fill <= 1000L)
        assert(cutDocs <= cuts, s"each cut doc has >= 1 cut (b=$b)")
        assert(cuts <= bins - 1 + counts.length, s"cuts bounded (b=$b)")
        // bins at least the bare minimum for the volume in 3 shards
        assert(bins >= (tot + b - 1) / b)
      }
      // a larger budget never increases the padded-slot FRACTION's bin count
      val byB = rows.map(r => r._1 -> r._4).toMap
      assert(byB(64L) >= byB(128L) && byB(128L) >= byB(512L))
    }
  }
}
