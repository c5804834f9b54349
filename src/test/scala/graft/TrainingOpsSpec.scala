package graft

import org.apache.spark.sql.functions._

import graft.operators.{CorpusOps, Dedup, Similarity, TextAnalysis}

/** Specs for the round-4 training-pipeline additions: BM25 retrieval,
  * SemDeDup, Bloom-filter decontamination, length-bucketed batching. */
class TrainingOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- BPE merge counting --------------------------------------------

  test("bpeMergePairs: hand-computed pair counts, overlaps counted per occurrence") {
    // "aaab" -> aa(i=1), aa(i=2), ab(i=3); "aa" -> aa; "xy" -> xy; the
    // length-1 word "z" contributes nothing.
    val docs = Seq((1L, "aaab aa z"), (2L, "xy")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeMergePairs(docs, "text", k = 10)
      .as[(String, Long)].collect().toList
    assert(got === List(("aa", 3L), ("ab", 1L), ("xy", 1L)))
  }

  test("bpeMergePairs: top-k slice is deterministic on count ties (pair asc)") {
    val docs = Seq((1L, "ab cd ef")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeMergePairs(docs, "text", k = 2)
      .as[(String, Long)].collect().toList
    assert(got === List(("ab", 1L), ("cd", 1L)))
  }

  // ---- Release novelty -----------------------------------------------

  test("gramNovelty: exact integer permille over seen/unseen grams") {
    val docs = Seq(
      (1L, "a b c"),  // old slice: gram set {"a b", "b c"}
      (11L, "a b x"), // "a b" seen, "b x" unseen -> 500
      (12L, "a b c"), // both seen -> 0
      (13L, "x y z")  // both unseen -> 1000
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gramNovelty(docs, "doc_id", "text", n = 2,
      isNew = col("doc_id") >= 10)
      .select("doc_id", "n_grams", "n_unseen", "novelty_permille")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set((11L, 2L, 1L, 500L), (12L, 2L, 0L, 0L),
      (13L, 2L, 2L, 1000L)))
  }

  // ---- Top principal component ---------------------------------------

  test("topComponentProjections: recovers a planted dominant axis, bit-stable") {
    // variance concentrated on dim 0; projections must order like the dim-0
    // coordinate (component converges to ±e1 from the all-ones start)
    val vecs = Seq(
      (1L, Array(4.0f, 0.1f, 0f, 0f)),
      (2L, Array(2.0f, -0.1f, 0f, 0f)),
      (3L, Array(-2.0f, 0.05f, 0f, 0f)),
      (4L, Array(-4.0f, -0.05f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val proj = Similarity.topComponentProjections(vecs, "vec_id", "embedding",
      dim = 4, iters = 3).as[(Long, Long)].collect().toMap
    val ord = List(1L, 2L, 3L, 4L).map(proj)
    assert(ord === ord.sorted || ord === ord.sorted.reverse, s"not monotone: $ord")
    assert(math.abs(proj(1L)) > math.abs(proj(2L)))
    val proj2 = Similarity.topComponentProjections(vecs.repartition(5),
      "vec_id", "embedding", dim = 4, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(proj === proj2)
  }

  // ---- Blocklist scan ------------------------------------------------

  test("blocklistScan: counts overlapping occurrences per phrase length") {
    val docs = Seq(
      (1L, "x y x y z"),       // "x y" twice (overlapping windows), "y z" once
      (2L, "a b c a b c"),     // "a b c" twice
      (3L, "nothing here")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.blocklistScan(docs, "doc_id", "text",
      Seq("x y", "y z", "a b c"))
      .select("doc_id", "phrase", "n_hits")
      .as[(Long, String, Long)].collect().toSet
    assert(got === Set((1L, "x y", 2L), (1L, "y z", 1L), (2L, "a b c", 2L)))
  }

  // ---- Release drift -------------------------------------------------

  test("tokenDrift: hand-computed integer ppm drift, deterministic order") {
    val docs = Seq(
      (1L, "a a b"),   // old: a:2, b:1 of 3
      (11L, "a b b b") // new: a:1, b:3 of 4
    ).toDF("doc_id", "text")
    // a: 2000000 div 3 = 666666 -> 250000, drift 416666
    // b: 1000000 div 3 = 333333 -> 750000, drift 416667 (ranks first)
    val got = TextAnalysis.tokenDrift(docs, "text", col("doc_id") >= 10, k = 2)
      .select("token", "drift_ppm").as[(String, Long)].collect().toList
    assert(got === List(("b", 416667L), ("a", 416666L)))
  }

  // ---- Hard-negative mining ------------------------------------------

  test("hardNegatives: nearest same-label vector is excluded, top negative is cross-label") {
    // q (label 0) is closest to id 1 (same label) then id 2 (label 1);
    // the mined negative must be id 2 — and id 3 (opposite direction,
    // label 1) ranks after it.
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (1L, Array(0.99f, 0.1f, 0.0f, 0.0f), 0),
      (2L, Array(0.9f, 0.4f, 0.0f, 0.0f), 1),
      (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(vecs, "vec_id", "embedding", "label",
      col("vec_id") === 0, k = 2)
      .select("cand_id").as[Long].collect().toList
    assert(got === List(2L, 3L))
  }

  test("hardNegatives: null-label rows neither query nor serve as negatives") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), Some(0)),
      (1L, Array(1.0f, 0.0f), None),
      (2L, Array(0.5f, 0.5f), Some(1))
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(vecs, "vec_id", "embedding", "label",
      col("vec_id") === 0, k = 5)
      .select("cand_id").as[Long].collect().toList
    assert(got === List(2L))
  }

  test("gopherRules: hand-computed card on a repetitive and a clean doc") {
    val docs = Seq(
      // doc 1: "ab cd ab cd ... " 12 words of 2 chars, extreme 2-gram repeat
      (1L, Seq.fill(6)("ab cd").mkString(" ")),
      // doc 2: 4 distinct 5-char words, one stopword pair, no repeats
      (2L, "alpha bravo the and delta")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherRules(docs, "doc_id", "text",
        Seq("the", "a", "of", "to", "in", "and"))
      .as[(Long, Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    // doc 1: 12 words, 24 chars no-space -> mwl 2000; alpha 1000; 0 stop.
    // text len 35; top 2-gram "ab cd" occurs 6 of 11 -> 6*5*1000/35 = 857.
    // 10-grams: 3 occurrences, all distinct ("ab cd ab cd ab" patterns
    // alternate) -> the repeating text makes all three IDENTICAL when the
    // window phase matches: windows at 1,3 are equal; at 2 differs.
    val d1 = got(1L)
    assert(d1._2 === 12L && d1._3 === 2000L && d1._4 === 1000L && d1._5 === 0L)
    assert(d1._6 === 857L)
    assert(!d1._8) // fails n_words >= 50 (and more)
    // doc 2: 5 words, 21 chars -> mwl 4200; 2 stopwords; all grams unique
    val d2 = got(2L)
    assert(d2._2 === 5L && d2._3 === 4200L && d2._5 === 2L && d2._7 === 0L)
    assert(!d2._8) // fails n_words >= 50 only by length
  }

  test("gopherRules: empty/whitespace docs score null ratios and keep=false, no ANSI crash") {
    // "" and "  " both tokenize to zero-length words: __len = 0 and the
    // only shingle is zero-length (__allch = 0) — pre-guard, ANSI `div`
    // threw DIVIDE_BY_ZERO and one degenerate doc crashed the filter pass
    val docs = Seq((1L, ""), (2L, "  "),
      (3L, "alpha bravo the and delta")).toDF("doc_id", "text")
    val got = TextAnalysis.gopherRules(docs, "doc_id", "text",
        Seq("the", "and"))
      .collect().map(r => r.getLong(0) -> r).toMap
    // the truly empty doc: __len = 0 and its only shingle is zero-length
    // (__allch = 0) — both guarded ratios are null, keep is false
    val d1 = got(1L)
    assert(d1.isNullAt(d1.fieldIndex("top2_char_permille")))
    assert(d1.isNullAt(d1.fieldIndex("dup10_char_permille")))
    assert(!d1.getBoolean(d1.fieldIndex("keep")))
    // whitespace-only: __len > 0 (the divisors are fine) but still keep=false
    assert(!got(2L).getBoolean(got(2L).fieldIndex("keep")))
    // the clean doc's card is unchanged by the guard: top 2-gram
    // "alpha bravo" = 11 chars of 25 -> 440 permille; no duplicated grams
    val d3 = got(3L)
    assert(d3.getLong(d3.fieldIndex("top2_char_permille")) === 440L)
    assert(d3.getLong(d3.fieldIndex("dup10_char_permille")) === 0L)
  }

  test("int8RecallAudit: lossless on grid-aligned values; audit shape holds") {
    // per-dim values at exactly lo/hi -> codes 0/255 decode back exactly,
    // so int8 retrieval must equal the float truth (recall 1000)
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(0.0f, 1.0f)),
      (50L, Array(1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.int8RecallAudit(vecs, "vec_id", "embedding",
        col("vec_id") % 50 === 0, k = 2)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (q, kt, nh, rm) => q -> ((kt, nh, rm)) }.toMap
    assert(got.keySet === Set(0L, 50L))
    got.values.foreach { case (kt, nh, rm) =>
      assert(kt === 2L && nh === 2L && rm === 1000L)
    }
  }

  test("embeddingProfile + vectorNorms: planted dead dim and bad norm surface") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.5f)),
      (2L, Array(0.6f, 0.0f, 0.8f)),
      (3L, Array(3.0f, 0.0f, 4.0f))) // norm 5 — contract violation
      .toDF("vec_id", "embedding")
    val prof = Similarity.embeddingProfile(vecs, "embedding")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(prof(1L)._6 === 3L) // dim 1 dead: every value zero
    assert(prof(0L) === (0L, 3L, (1000000L + 600000L + 3000000L) / 3,
      600000L, 3000000L, 0L))
    val norms = Similarity.vectorNorms(vecs, "vec_id", "embedding")
      .as[(Long, Double, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(!norms(3L)._4 && norms(3L)._3 === 5000L)
    assert(norms(2L)._4 && norms(2L)._3 === 1000L)
  }

  test("embeddingDrift: identical slices read 1.0, a rotated new slice drops") {
    // cell A: new slice == old slice direction -> cos 1.0
    // cell B: new slice rotated 90 degrees -> cos 0.0
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), "A"), (1L, Array(1.0f, 0.0f), "A"),
      (8L, Array(1.0f, 0.0f), "A"), (9L, Array(1.0f, 0.0f), "A"),
      (2L, Array(0.0f, 1.0f), "B"), (3L, Array(0.0f, 1.0f), "B"),
      (18L, Array(1.0f, 0.0f), "B"), (19L, Array(1.0f, 0.0f), "B")
    ).toDF("vec_id", "embedding", "cell")
    val got = Similarity.embeddingDrift(vecs, "embedding", "cell",
        isNew = col("vec_id") % 10 >= 8)
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got("A") === ("A", 2L, 2L, 1.0))
    assert(got("B") === ("B", 2L, 2L, 0.0))
  }

  test("knnGraph: clusters close mutually, a hub-chaser's edges are one-way") {
    // two tight clusters (labels = cells) plus an outlier in label 0 whose
    // nearest neighbors are cluster A, but whom nobody ranks back
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (2L, Array(0.99f, 0.1f, 0.0f, 0.0f), 0),
      (3L, Array(0.98f, 0.15f, 0.0f, 0.0f), 0),
      (4L, Array(0.0f, 1.0f, 0.0f, 0.0f), 1),
      (5L, Array(0.1f, 0.99f, 0.0f, 0.0f), 1),
      (6L, Array(0.15f, 0.98f, 0.0f, 0.0f), 1),
      (7L, Array(0.2f, 0.0f, 0.98f, 0.0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val edges = Similarity.knnGraph(vecs, "vec_id", "embedding", "label",
        k = 2, nProbe = 2)
      .select("src_id", "dst_id", "rank", "mutual")
      .as[(Long, Long, Long, Boolean)].collect()
    assert(edges.length === 14) // 7 nodes x k=2
    val bySrc = edges.groupBy(_._1)
    // every node emits ranks 1..2
    bySrc.values.foreach(es => assert(es.map(_._3).sorted.toList === List(1L, 2L)))
    // cluster members pick each other, all mutual
    for (src <- Seq(1L, 2L, 3L))
      assert(bySrc(src).map(_._2).toSet.subsetOf(Set(1L, 2L, 3L) - src))
    for (src <- Seq(4L, 5L, 6L))
      assert(bySrc(src).map(_._2).toSet.subsetOf(Set(4L, 5L, 6L) - src))
    edges.filter(e => e._1 <= 6L).foreach(e => assert(e._4, s"edge $e"))
    // the outlier chases cluster A; nothing points back
    assert(bySrc(7L).sortBy(_._3).map(_._2).toList === List(1L, 2L))
    bySrc(7L).foreach(e => assert(!e._4, s"edge $e"))
    // mutual flag is exactly reciprocal membership
    val pairSet = edges.map(e => (e._1, e._2)).toSet
    edges.foreach(e => assert(e._4 === pairSet.contains((e._2, e._1))))
  }

  // ---- Embedding-space decontamination -------------------------------

  test("ivfDecontaminate: planted duplicates flagged, unprobed cells pruned") {
    // three unit-vector cells; corpus id 5 is an exact copy of eval 100 but
    // lives in cell 2, whose centroid drifts to (0.5,0,0.5,0) — with
    // nProbe=1 eval 100 probes only cell 0, so id 5 must NOT be flagged
    // (the probe-pruning semantics), while the same-cell copy id 1 is.
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),   // == eval 100, probed cell
      (2L, Array(0.9f, 0.1f, 0.0f, 0.0f), 0),   // cosine 0.9 with eval 100
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f), 1),   // == eval 101
      (4L, Array(0.0f, 0.0f, 1.0f, 0.0f), 2),
      (5L, Array(1.0f, 0.0f, 0.0f, 0.0f), 2),   // copy in the UNPROBED cell
      (100L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0), // eval
      (101L, Array(0.0f, 1.0f, 0.0f, 0.0f), 1)  // eval
    ).toDF("vec_id", "embedding", "label")
    def run(nProbe: Int) =
      Similarity.ivfDecontaminate(vecs, "vec_id", "embedding", "label",
          col("vec_id") >= 100, threshold = 0.9, nProbe = nProbe)
        .as[(Long, Long, Double)].collect().toSet
    assert(run(1) === Set((1L, 100L, 1.0), (2L, 100L, 0.9), (3L, 101L, 1.0)))
    // widening the probe to 2 cells reaches the misplaced copy
    assert(run(2) === Set((1L, 100L, 1.0), (2L, 100L, 0.9), (3L, 101L, 1.0),
      (5L, 100L, 1.0)))
  }

  test("contaminationReport: per-eval counts, worst offender, zero-match completion") {
    // same geometry as the ivfDecontaminate test: eval 100 sees ids 1
    // (cosine 1.0) and 2 (0.9) in its probed cells at nProbe=2 plus the
    // misplaced copy id 5; eval 101 sees id 3; a third eval far from
    // everything reports zero with a null offender
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (2L, Array(0.9f, 0.1f, 0.0f, 0.0f), 0),
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f), 1),
      (4L, Array(0.0f, 0.0f, 1.0f, 0.0f), 2),
      (5L, Array(1.0f, 0.0f, 0.0f, 0.0f), 2),
      (100L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (101L, Array(0.0f, 1.0f, 0.0f, 0.0f), 1),
      (102L, Array(0.0f, 0.0f, 0.0f, 1.0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.contaminationReport(vecs, "vec_id", "embedding",
        "label", col("vec_id") >= 100, threshold = 0.9, nProbe = 2)
      .as[(Long, Long, Option[Long], Option[Double])].collect().toSet
    assert(got === Set(
      (100L, 3L, Some(1L), Some(1.0)), // ids 1, 5 at 1.0 (tie -> lowest id), 2 at 0.9
      (101L, 1L, Some(3L), Some(1.0)),
      (102L, 0L, None, None)))
  }

  test("bpe trajectory is prefix-stable as the round budget grows") {
    // asking for more merges must never change the earlier ones — the
    // property that lets a 32k-merge run be validated by a short
    // distributed prefix (BpeProbe) and lets vocabularies be extended
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    val short = TextAnalysis.bpeTrain(docs, "text", rounds = 20)
      .orderBy("round").as[(Int, String, Long)].collect().toList
    val long = TextAnalysis.bpeTrain(docs, "text", rounds = 200)
      .orderBy("round").as[(Int, String, Long)].collect().toList
    assert(long.take(20) === short)
    assert(long.size > 20, "fixture must support more than 20 merges")
  }

  // ---- Tokenizer fertility scorecard ---------------------------------

  test("tokenizerFertility: hand-computed totals, fallback words, integer ratios") {
    // rounds=1 merges the top pair "aa" (freq 3) only: aa → 1 token,
    // bb/cc/yz stay 2, the length-1 word "x" is vocab-ineligible → fallback.
    val docs = Seq(
      (1L, "aa aa bb", "s1"),
      (2L, "aa cc", "s2"),
      (3L, "x yz", "s2")
    ).toDF("doc_id", "text", "source")
    val vocab = TextAnalysis.bpeVocab(docs, "text", rounds = 1)
    val got = TextAnalysis.tokenizerFertility(docs, "doc_id", "text",
        "source", vocab)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSet
    assert(got === Set(
      // s1: words aa,aa,bb → 1+1+2 = 4 tokens, 6 chars
      ("s1", 1L, 3L, 4L, 6L, 0L, 4000L / 3, 6000L / 4),
      // s2: aa,cc,x,yz → 1+2+1+2 = 6 tokens, 7 chars, "x" falls back
      ("s2", 2L, 4L, 6L, 7L, 1L, 6000L / 4, 7000L / 6)))
  }

  // ---- BM25 ----------------------------------------------------------

  test("bm25: hand-computed scores on a three-doc corpus") {
    val docs = Seq(
      (1L, "cat dog cat"), // dl 3, tf(cat)=2
      (2L, "dog mouse"), //    dl 2, tf(cat)=0
      (3L, "cat bird lion tiger")) // dl 4, tf(cat)=1
      .toDF("doc_id", "text")
    val out = TextAnalysis.bm25(docs, "doc_id", "text", Seq("cat"))
      .orderBy("doc_id").as[(Long, Double)].collect()
    // N=3, df(cat)=2, idf = ln(1 + 1.5/2.5); avgdl = 3
    val idf = math.log(1 + (3 - 2 + 0.5) / (2 + 0.5))
    def s(tf: Long, dl: Long): Double = {
      val raw = idf * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / 3.0))
      math.floor(raw * 1e6 + 0.5) / 1e6
    }
    assert(out.map(_._1).toSeq === Seq(1L, 3L))
    assert(out(0)._2 === s(2, 3))
    assert(out(1)._2 === s(1, 4))
    // the longer doc with lower tf scores strictly lower
    assert(out(1)._2 < out(0)._2)
  }

  test("bm25: score is invariant under repartitioning (integer-quantized sum)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val terms = Seq("vector", "merge", "window", "stream")
    val a = TextAnalysis.bm25(docs, "doc_id", "text", terms)
      .orderBy("doc_id").collect().toSeq
    val b = TextAnalysis.bm25(docs.repartition(7), "doc_id", "text", terms)
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  // ---- SemDeDup ------------------------------------------------------

  test("semDedup: drops the higher id of a within-cluster near-duplicate only") {
    // two well-separated clusters; (11,12) nearly identical, (21,22) apart
    val e = Seq(
      (11L, Seq(1f, 0f, 0f)),
      (12L, Seq(0.999f, 0.045f, 0f)), // cos(11,12) ~ 0.999
      (21L, Seq(0f, 1f, 0f)),
      (22L, Seq(0f, 0.7f, 0.714f))) // cos(21,22) ~ 0.7
      .toDF("vec_id", "embedding")
    val out = Similarity.semDedup(e, "vec_id", "embedding",
      k = 2, iters = 3, threshold = 0.9)
    assert(out.select("drop_id").as[Long].collect().toSeq === Seq(12L))
  }

  test("semDedup: every planted near-duplicate is caught (they co-cluster)") {
    // 200 seeded random unit vectors + 20 planted near-copies (cos ~0.9999).
    // True duplicates sit almost exactly on their original, so k-means puts
    // both in the same cluster and within-cluster search finds all of them —
    // the recall property SemDeDup actually promises. (Borderline pairs near
    // the threshold DO split across clusters: measured 93 of 262 pairs at
    // cos >= 0.35 on the sf0.001 fixture — the documented tradeoff.)
    val rnd = new scala.util.Random(42)
    def unit(): Array[Float] = {
      val v = Array.fill(16)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val base = (0 until 200).map(i => (i.toLong, unit()))
    val dups = base.take(20).map { case (i, v) =>
      (1000L + i, v.map(x => x + (if (x > 0) -1e-4f else 1e-4f)))
    }
    val df = (base ++ dups).map { case (i, v) => (i, v.toSeq) }
      .toDF("vec_id", "embedding")
    val dropped = Similarity.semDedup(df, "vec_id", "embedding",
        k = 8, iters = 4, threshold = 0.99)
      .select("drop_id").as[Long].collect().toSet
    // all 20 planted copies drop (ids 1000..1019); no original drops at 0.99
    assert((1000L until 1020L).forall(dropped.contains), dropped.toSeq.sorted)
    assert(dropped.forall(_ >= 1000L), dropped.toSeq.sorted)
  }

  test("semDedup: never drops across clusters even above threshold") {
    // identical vectors forced into different clusters cannot pair; with
    // k=1 they share a cluster and the higher id drops
    val e = Seq((1L, Seq(1f, 0f)), (2L, Seq(1f, 0f))).toDF("vec_id", "embedding")
    val one = Similarity.semDedup(e, "vec_id", "embedding", 1, 1, 0.99)
    assert(one.select("drop_id").as[Long].collect().toSeq === Seq(2L))
  }

  // ---- Bloom decontamination ----------------------------------------

  test("bloomDecontaminate: exact-equivalent to the unfiltered overlap join") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val bloom = Dedup.bloomDecontaminate(docs, "doc_id", "text",
      benchFilter = col("doc_id") < 10, n = 6, minOverlaps = 2)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    // reference: plain exact shingle-overlap (q77 shape)
    val sh = docs.select(col("doc_id"),
      explode(array_distinct(Dedup.shingles(col("text"), 6))).as("shingle"))
    val bench = sh.where(col("doc_id") < 10).select("shingle").distinct()
    val exact = sh.where(col("doc_id") >= 10)
      .join(bench, Seq("shingle"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlaps"))
      .where(col("n_overlaps") >= 2)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(bloom === exact)
    assert(exact.nonEmpty) // the fixture must actually exercise the operator
  }

  test("bloomDecontaminate: parameters fail fast") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Dedup.bloomDecontaminate(
      docs, "doc_id", "text", col("doc_id") < 1, n = 3, minOverlaps = 1, mBits = 1000))
    intercept[IllegalArgumentException](Dedup.bloomDecontaminate(
      docs, "doc_id", "text", col("doc_id") < 1, n = 3, minOverlaps = 0))
  }

  // ---- Repeated-span scrubbing ----------------------------------------

  test("scrubRepeatedSpans removes exactly the positions under repeated grams") {
    val repeated = "a b c" // the 3-gram planted in both docs
    val docs = Seq(
      (1L, s"x1 x2 $repeated y1 y2"),     // gram at pos 3..5
      (2L, s"$repeated z1 z2 z3 z4"),     // gram at pos 1..3
      (3L, "u1 u2"),                      // shorter than n: untouched
      (4L, "only unique tokens here now"))
      .toDF("doc_id", "text")
    val out = Dedup.scrubRepeatedSpans(docs, "doc_id", "text", n = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out === Seq(
      (1L, 7L, 4L, "x1 x2 y1 y2"),
      (2L, 7L, 4L, "z1 z2 z3 z4"),
      (3L, 2L, 2L, "u1 u2"),
      (4L, 5L, 5L, "only unique tokens here now")))
  }

  test("scrubRepeatedSpans nulls a fully-covered document") {
    val docs = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    val out = Dedup.scrubRepeatedSpans(docs, "doc_id", "text", n = 3)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(out.map(r => (r._1, r._3, r._4)) === Seq((1L, 0L, null), (2L, 0L, null)))
  }

  // ---- Iterative BPE induction ---------------------------------------

  test("bpeTrain: hand-computed merge sequence, greedy-leftmost, early stop") {
    // words: "aaab" ×2, "cd" ×1.  Hand-run of the loop (symbols bracketed
    // "!sym?"):
    //   r1: (a,a) appears twice per "aaab" → 4; merge → "!aa?!a?!b?"
    //       (leftmost non-overlapping: NOT "!a?!aa?!b?")
    //   r2: tie (a,b)=2 vs (aa,a)=2 → pair asc picks "!a?!b?"; → "!aa?!ab?"
    //   r3: (aa,ab) → 2; merge → "!aaab?"
    //   r4: only (c,d) remains → 1; merge → "!cd?"
    //   r5: no adjacent pairs anywhere → loop stops early (rounds=6 asked)
    val docs = Seq((1L, "aaab cd aaab")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrain(docs, "text", rounds = 6)
      .orderBy("round").as[(Int, String, Long)].collect().toList
    assert(got === List(
      (1, "!a?!a?", 4L), (2, "!a?!b?", 2L), (3, "!aa?!ab?", 2L), (4, "!c?!d?", 1L)))
  }

  test("bpeTrain merge cannot match into a longer symbol's prefix") {
    // regression for the prefix-capture bug: after (a,c) and (ac,b) merge,
    // "aacb" segments as [a, acb]; a prefix-only sentinel encoding would
    // let the (a,a) merge of "aa" match "!a!a" into "!a!acb" and corrupt
    // the word to [aacb] — the bracketed "!a?!a?" pattern cannot
    val docs = Seq((1L, "ac ac acb acb aacb aa aa aa")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrain(docs, "text", rounds = 3)
      .orderBy("round").as[(Int, String, Long)].collect().toList
    // r1: (a,c)=5 (ac×2, acb×2, aacb) → aacb segments [a, ac, b].
    // r2: (a,a)=3 (aa×3 only — aacb no longer has an a·a adjacency!) ties
    //     (ac,b)=3, pair asc picks (a,a). The buggy encoding would match
    //     "!a!a" into aacb's "!a!ac!b" here and corrupt it to [aac, b].
    // r3: (ac,b)=3 (acb×2 + intact aacb).
    assert(got.map(g => (g._1, g._2, g._3)) ===
      List((1, "!a?!c?", 5L), (2, "!a?!a?", 3L), (3, "!ac?!b?", 3L)))
    // the corrupted trajectory would have emitted a pair mentioning "aacb"
    // or segmented aacb as one pre-formed symbol; verify the vocab instead:
    val vocab = TextAnalysis.bpeVocab(docs, "text", rounds = 3)
      .as[(String, String)].collect().toMap
    assert(vocab("aacb") === "!a?!acb?")
    assert(vocab("aa") === "!aa?")
  }

  test("bpeTrain reaches 1000+ merges through the driver-local loop") {
    // the distributed loop is ~2 jobs + a collect PER MERGE — fine for the
    // data axis, a driver-orchestration wall on the merge axis (32k merges
    // = ~64k sequential jobs). Below LocalMergeThreshold the collapsed
    // word-freq table collects and ALL rounds run locally with incremental
    // pair counts; this pins that 1000 merges complete (seconds, zero
    // per-round Spark jobs) and that the trajectory prefix matches the
    // distributed path exactly.
    val rnd = new scala.util.Random(7)
    val words = (0 until 800).map { _ =>
      (0 until (4 + rnd.nextInt(12))).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    }
    val docs = words.grouped(40).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, "text", rounds = 1000)
      .orderBy("round").as[(Int, String, Long)].collect().toList
    assert(merges.size === 1000, "corpus supports ≥1000 merges")
    assert(merges.map(_._1) === (1 to 1000).toList)
    // counts are the at-selection frequencies of a greedy trainer: the
    // selected count can never exceed the previous round's (the previous
    // top-1 was maximal and merging only removes/splits pair occurrences
    // without increasing any other pair's count)
    assert(merges.sliding(2).forall { case List(a, b) => b._3 <= a._3; case _ => true })
    // the first rounds must equal the distributed loop verbatim
    val dist = TextAnalysis.bpeTrain(docs, "text", rounds = 5, localThreshold = 0L)
      .orderBy("round").as[(Int, String, Long)].collect().toList
    assert(merges.take(5) === dist)
  }

  test("bpeTokenizeWithVocab emits trained symbols in order; counts are its length") {
    // corpus from the hand-run test: after 6 rounds "aaab" → [aaab],
    // "cd" → [cd]; OOV fallback char-splits anything untrained
    val docs = Seq((1L, "aaab cd aaab"), (2L, "zz aaab")).toDF("doc_id", "text")
    val vocab = TextAnalysis.bpeVocab(docs.where(col("doc_id") === 1), "text", rounds = 6)
    val got = TextAnalysis.bpeTokenizeWithVocab(docs, "doc_id", "text", vocab)
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L) === Seq("aaab", "cd", "aaab"))
    assert(got(2L) === Seq("z", "z", "aaab")) // "zz" untrained → chars
    // the emitted sequence IS the thing q143 counts
    val counts = TextAnalysis.bpeCountWithVocab(docs, "doc_id", "text", vocab)
      .as[(Long, Long)].collect().toMap
    assert(got.view.mapValues(_.size.toLong).toMap === counts)
  }

  test("bpeTrain counts by word frequency: vocabulary-table loop ≡ occurrence counting") {
    // same corpus written as repeated occurrences vs distinct words with
    // multiplicity must select identical merges with identical counts
    val a = Seq((1L, "xy xy xy zw")).toDF("doc_id", "text")
    val b = Seq((1L, "xy zw"), (2L, "xy xy")).toDF("doc_id", "text")
    val ra = TextAnalysis.bpeTrain(a, "text", rounds = 2)
      .as[(Int, String, Long)].collect().toSet
    val rb = TextAnalysis.bpeTrain(b, "text", rounds = 2)
      .as[(Int, String, Long)].collect().toSet
    assert(ra === rb)
    assert(ra === Set((1, "!x?!y?", 3L), (2, "!z?!w?", 1L)))
  }

  test("bpeVocab/bpeTokenCounts: trained segmentation applies with OOV char fallback") {
    // merges on this corpus: (a,a), (a,b), (aa,ab), (b,b), (c,d) → vocab
    // aaab→"!aaab?", cd→"!cd?", bb→"!bb?" (all single symbols)
    val docs = Seq((1L, "aaab cd aaab"), (2L, "a x!y bb")).toDF("doc_id", "text")
    val vocab = TextAnalysis.bpeVocab(docs, "text", rounds = 6)
      .as[(String, String)].collect().toMap
    assert(vocab === Map("aaab" -> "!aaab?", "cd" -> "!cd?", "bb" -> "!bb?"))
    val counts = TextAnalysis.bpeTokenCounts(docs, "doc_id", "text", rounds = 6)
      .orderBy("doc_id").as[(Long, Long)].collect().toList
    // doc 1: three in-vocab words, one symbol each = 3
    // doc 2: "a" (1 char) + "x!y" (sentinel, 3 chars, OOV fallback) + "bb" = 5
    assert(counts === List((1L, 3L), (2L, 5L)))
  }

  // ---- Maximal repeated spans (Lee et al. ExactSubstr semantics) ------

  /** Reference implementation for the maximal-span contract: count every
    * n-gram by brute force, mark covered positions, merge consecutive runs. */
  private def bruteSpans(docs: Seq[(Long, String)], n: Int): Set[(Long, Long, Long, String)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val counts = toks.values.toSeq
      .flatMap(ts => if (ts.length >= n) ts.sliding(n).map(_.mkString(" ")) else Nil)
      .groupBy(identity).map { case (k, v) => k -> v.size }
    docs.flatMap { case (id, _) =>
      val ts = toks(id)
      val covered = (for {
        i <- 0 to ts.length - n
        if counts(ts.slice(i, i + n).mkString(" ")) > 1
        p <- i until i + n
      } yield p).distinct.sorted
      val islands = covered.foldLeft(List.empty[List[Int]]) {
        case (acc @ (run :: rest), p) if run.head == p - 1 => (p :: run) :: rest
        case (acc, p) => List(p) :: acc
      }.map(_.reverse)
      islands.map(run => (id, run.head + 1L, run.size.toLong,
        ts.slice(run.head, run.head + run.size).mkString(" ")))
    }.toSet
  }

  private def plantedDocs: Seq[(Long, String)] = {
    // a 50-token repeat R planted in two docs, plus a 12-token repeat S that
    // OVERLAPS R's tail in doc 2 (partial overlap at a span edge), plus an
    // exactly-n-token repeat T — widths 50, 12, 8 all >> or == n = 8
    val r = (1 to 50).map(i => s"r$i").mkString(" ")
    val s12 = (41 to 52).map(i => s"r$i").mkString(" ") // r41..r50 ++ r51 r52
    val t = (1 to 8).map(i => s"t$i").mkString(" ")
    Seq(
      1L -> s"${(1 to 10).map(i => s"a$i").mkString(" ")} $r ${(1 to 10).map(i => s"b$i").mkString(" ")}",
      2L -> s"$r r51 r52 ${(1 to 6).map(i => s"c$i").mkString(" ")} $t",
      3L -> s"$s12 ${(1 to 9).map(i => s"d$i").mkString(" ")} $t",
      4L -> (1 to 20).map(i => s"e$i").mkString(" "))
  }

  test("maximalRepeatedSpans: a 50-token repeat is ONE span, not 43 8-gram windows") {
    val out = Dedup.maximalRepeatedSpans(plantedDocs.toDF("doc_id", "text"),
      "doc_id", "text", n = 8)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(out === bruteSpans(plantedDocs, 8))
    // doc 1's only span is exactly the planted repeat: starts after the
    // 10-token prefix, runs the full 50 tokens
    val d1 = out.filter(_._1 == 1L)
    assert(d1.map(s => (s._2, s._3)) === Set((11L, 50L)))
    assert(d1.head._4 === (1 to 50).map(i => s"r$i").mkString(" "))
    // doc 2: R and the overlapping 12-token repeat merge into ONE 52-token
    // island (r1..r52) — the edge-overlap case where fixed-width windows
    // and maximal semantics could disagree
    assert(out.filter(_._1 == 2L).exists(s => s._2 == 1L && s._3 == 52L))
    // doc 4 has no repeats and no rows
    assert(!out.exists(_._1 == 4L))
  }

  test("maximalRepeatedSpans positions reconstruct scrubRepeatedSpans exactly") {
    // removing precisely the span intervals from each document must yield
    // q119's scrubbed text — the two operators are one semantics, two views
    val docs = plantedDocs.toDF("doc_id", "text")
    val spans = Dedup.maximalRepeatedSpans(docs, "doc_id", "text", n = 8)
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(s => (s._2, s._3)).toSet).toMap
    val scrubbed = Dedup.scrubRepeatedSpans(docs, "doc_id", "text", n = 8)
      .as[(Long, Long, Long, String)].collect()
    scrubbed.foreach { case (id, _, _, expect) =>
      val ts = plantedDocs.toMap.apply(id).split(" ")
      val drop = spans.getOrElse(id, Set.empty)
        .flatMap { case (start, len) => (start - 1) until (start - 1 + len) }
        .map(_.toInt)
      val rebuilt = ts.zipWithIndex.collect { case (t, i) if !drop(i) => t }
        .mkString(" ")
      assert((if (rebuilt.isEmpty) null else rebuilt) === expect, s"doc $id")
    }
  }

  // ---- weightedSample weight contract --------------------------------

  test("weightedSample: negative weight fails loudly, null weight is skipped") {
    val bad = Seq((1L, "g", 5L), (2L, "g", -1L)).toDF("id", "grp", "w")
    val e = intercept[Exception] {
      CorpusOps.weightedSample(bad, "id", "grp", "w", k = 1).collect()
    }
    assert(e.getMessage.contains("non-positive weight")
      || Option(e.getCause).exists(_.getMessage.contains("non-positive weight")))
    val withNull = Seq((1L, "g", Some(5L)), (2L, "g", None))
      .toDF("id", "grp", "w")
    val out = CorpusOps.weightedSample(withNull, "id", "grp", "w", k = 2)
    assert(out.select("id").as[Long].collect().toSeq === Seq(1L))
  }

  // ---- Length-bucketed batches --------------------------------------

  test("lengthBucketBatches: buckets route correctly and batches are full") {
    val docs = (1 to 50).map(i => (i.toLong, Seq.fill(i % 40 + 1)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val out = CorpusOps.lengthBucketBatches(docs, "doc_id", "text",
      batchSize = 4, bounds = Seq(8, 16, 64)).cache()
    // every doc lands in exactly one batch
    assert(out.agg(sum("n_docs")).as[Long].head === 50L)
    // max_tokens never exceeds the bucket bound
    assert(out.where(col("max_tokens") > col("bucket")).isEmpty)
    // only the LAST batch of a bucket may be short
    val bad = out
      .withColumn("mx", max("batch").over(
        org.apache.spark.sql.expressions.Window.partitionBy("bucket")))
      .where(col("n_docs") =!= 4 && col("batch") =!= col("mx"))
    assert(bad.isEmpty)
    // padding_frac in [0, 1)
    assert(out.where(col("padding_frac") < 0 || col("padding_frac") >= 1).isEmpty)
  }

  test("bm25 equals a brute-force Scala recompute on random corpora") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val vocab = Seq("cat", "dog", "bird", "fish", "x", "y")
    val docGen = Gen.listOfN(12,
      Gen.choose(1, 9).flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab))))
    val terms = Seq("cat", "dog")
    (1 to 8).foreach { i =>
      val texts = docGen.pureApply(Gen.Parameters.default, Seed(i.toLong))
        .map(_.mkString(" "))
      val df = texts.zipWithIndex.map { case (t, j) => (j.toLong, t) }
        .toDF("doc_id", "text")
      val got = TextAnalysis.bm25(df, "doc_id", "text", terms)
        .orderBy("doc_id").as[(Long, Double)].collect().toList
      // brute force, same IEEE shapes
      val toks = texts.map(_.split(" ", -1).toSeq)
      val n = texts.length.toLong
      val avgdl = toks.map(_.length.toLong).sum.toDouble / n
      val dfreq = terms.map(t => t -> toks.count(_.contains(t)).toLong).toMap
      val expect = toks.zipWithIndex.flatMap { case (tk, j) =>
        val cs = terms.flatMap { t =>
          val tf = tk.count(_ == t).toLong
          if (tf == 0 || dfreq(t) == 0) None
          else {
            val idf = math.log(1d + (n - dfreq(t) + 0.5) / (dfreq(t) + 0.5))
            val raw = idf * (tf * (1.2 + 1)) /
              (tf + 1.2 * (1 - 0.75 + 0.75 * tk.length / avgdl))
            Some(math.floor(raw * 1e6 + 0.5).toLong)
          }
        }
        if (cs.isEmpty) None else Some((j.toLong, cs.sum.toDouble / 1e6))
      }.toList
      assert(got === expect, s"seed $i")
    }
  }

  test("lengthBucketBatches: every doc counted once on random length mixes") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val lensGen = Gen.listOfN(30, Gen.choose(1, 200))
    (1 to 5).foreach { i =>
      val lens = lensGen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val df = lens.zipWithIndex.map { case (l, j) =>
        (j.toLong, Seq.fill(l)("w").mkString(" "))
      }.toDF("doc_id", "text")
      val out = CorpusOps.lengthBucketBatches(df, "doc_id", "text",
        batchSize = 4, bounds = Seq(16, 64)).collect()
      assert(out.map(_.getAs[Long]("n_docs")).sum === 30L, s"seed $i")
      // sum_tokens across batches equals the corpus token total
      assert(out.map(_.getAs[Long]("sum_tokens")).sum === lens.map(_.toLong).sum)
    }
  }

  test("lengthBucketBatches: overflow docs land in the overflow bucket") {
    val docs = Seq((1L, Seq.fill(100)("w").mkString(" ")), (2L, "a b"))
      .toDF("doc_id", "text")
    val out = CorpusOps.lengthBucketBatches(docs, "doc_id", "text", 4, Seq(8))
    val buckets = out.select("bucket").as[Long].collect().toSet
    assert(buckets === Set(8L, 1L << 30))
  }
}
