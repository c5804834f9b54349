package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** Near-dup detection on planted duplicates: MinHash-LSH and SimHash must
  * recover an exact duplicate and a lightly-edited near-duplicate. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away " +
    "into the deep green forest while the rain falls softly on the quiet hills"
  private val nearDup = base.replace("quiet hills", "silent hills")
  private val other = "completely different content about spark query engines and " +
    "columnar execution with vectorized operators reading parquet files at scale"

  private lazy val docs = Seq(
    (1L, base), (2L, base), (3L, nearDup), (4L, other)
  ).toDF("doc_id", "text")

  test("minhash LSH finds the exact and near duplicates, not the unrelated doc") {
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("edit-verified near-dups: exact pair has distance 0, tight ratio drops the edited pair") {
    // base vs nearDup differ by "quiet" -> "silent" (~4 char edits over ~140
    // chars, ratio ~0.03): a loose bound keeps it, a tight one rejects it,
    // and the exact duplicate (distance 0) always survives.
    val loose = Dedup.editVerifiedNearDups(docs, "doc_id", "text",
      threshold = 0.5, maxEditRatio = 0.5)
      .select("a_id", "b_id", "edit_dist").as[(Long, Long, Long)].collect()
    assert(loose.exists { case (a, b, d) => a == 1L && b == 2L && d == 0L })
    assert(loose.exists { case (a, b, d) => b == 3L && d > 0L })
    val tight = Dedup.editVerifiedNearDups(docs, "doc_id", "text",
      threshold = 0.5, maxEditRatio = 0.01)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(tight === Set((1L, 2L)))
  }

  test("edit-verified near-dups: maxEditRatio outside (0,1] fails fast") {
    val e = intercept[IllegalArgumentException] {
      Dedup.editVerifiedNearDups(docs, "doc_id", "text",
        threshold = 0.5, maxEditRatio = 0.0)
    }
    assert(e.getMessage.contains("maxEditRatio"))
  }

  test("containment finds a small doc quoted inside a large one that minhash misses") {
    // quoted ⊂ host: Jaccard is ~|quoted|/|host| (small), containment 1.0
    val quoted = "uniquely memorable passage about distributed query planning today"
    val host = base + " " + quoted + " " + other
    val docs2 = Seq((1L, quoted), (2L, host), (3L, other + " extra tail tokens here"))
      .toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs2, "doc_id", "text", threshold = 0.9)
      .select("a_id", "b_id", "containment").as[(Long, Long, Double)].collect()
    assert(cont.exists { case (a, b, c) => a == 1L && b == 2L && c == 1.0 })
    // the same pair is invisible to Jaccard at any near-dup threshold
    val jac = Dedup.minhashNearDups(docs2, "doc_id", "text", threshold = 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(!jac.contains((1L, 2L)))
  }

  test("containment prefix filter is lossless against the all-pairs join") {
    // duplicate-heavy random corpus over a tiny vocabulary (shingles collide
    // constantly) + planted quoted-inside-host containments at every size
    // ratio — the prefix-filtered pass must return EXACTLY the pair set of
    // the unfiltered inverted-index self-join it replaced
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron",
      "pi", "rho", "sigma", "tau", "upsilon")
    def mk(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val bases = (1L to 60L).map(i => (i, mk(5 + rnd.nextInt(40))))
    val planted = (61L to 75L).map { i =>
      val (_, qtxt) = bases(rnd.nextInt(20))
      (i, (mk(rnd.nextInt(8)) + " " + qtxt + " " + mk(rnd.nextInt(8))).trim)
    }
    val corpus = (bases ++ planted).toDF("doc_id", "text")
    val thr = 0.6
    val cap = 30
    val fast = Dedup.containmentPairs(corpus, "doc_id", "text",
        threshold = thr, dfCap = cap)
      .select("a_id", "b_id", "n_inter", "containment")
      .as[(Long, Long, Long, Double)].collect().toSet
    // the unfiltered formulation this round replaced, inlined as the oracle
    val raw = corpus.select(col("doc_id"),
        explode(array_distinct(Dedup.shingles(col("text"), 3))).as("shingle"))
      .select(col("doc_id"), xxhash64(col("shingle")).as("sh_h"))
    val rare = raw.groupBy("sh_h").agg(count(lit(1)).as("__df"))
      .where(col("__df") <= cap).select("sh_h")
    val sh = raw.join(rare, Seq("sh_h"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val slow = sh.select(col("doc_id").as("a_id"), col("sh_h"))
      .join(sh.select(col("doc_id").as("b_id"), col("sh_h")), Seq("sh_h"))
      .where(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("n_inter"))
      .join(sizes.toDF("a_id", "n_a"), Seq("a_id"))
      .join(sizes.toDF("b_id", "n_b"), Seq("b_id"))
      .withColumn("containment", round(col("n_inter").cast("double")
        / least(col("n_a"), col("n_b")), 4))
      .where(col("containment") >= thr)
      .select("a_id", "b_id", "n_inter", "containment")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(slow.nonEmpty, "fixture must produce qualifying pairs")
    assert(fast === slow)
  }

  test("containment: a df-capped shingle contributes to neither side") {
    // one shingle shared by every doc; with dfCap = 2 it is dropped, so the
    // two otherwise-disjoint docs have no intersection left
    val docs2 = Seq(
      (1L, "common shared phrase alpha beta"),
      (2L, "common shared phrase gamma delta"),
      (3L, "common shared phrase epsilon zeta")
    ).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(docs2, "doc_id", "text",
      threshold = 0.1, shingleSize = 3, dfCap = 2)
      .select("a_id", "b_id").as[(Long, Long)].collect()
    assert(pairs.isEmpty)
  }

  test("simhash hamming distance: identical 0, near small, unrelated large") {
    val sh = Dedup.simhash64(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) === sh(2L))
    val nearDist = java.lang.Long.bitCount(sh(1L) ^ sh(3L))
    val farDist = java.lang.Long.bitCount(sh(1L) ^ sh(4L))
    assert(nearDist < farDist)
    assert(nearDist <= 8)
  }

  test("exactFirst keeps exactly one row per key, smallest order value") {
    val df = Seq((1, "a", 10), (1, "b", 5), (2, "c", 1)).toDF("k", "v", "ord")
    val out = Dedup.exactFirst(df, Seq("k"), "ord").orderBy("k")
      .select("v").as[String].collect()
    assert(out === Seq("b", "c"))
  }

  test("connected components label chains, stars and separate clusters") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3), star 10-{11,12,13}, pair 20-21
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (10L, 12L), (10L, 13L),
      (21L, 20L))
      .toDF("a_id", "b_id")
    val comp = Dedup.connectedComponents(pairs, "a_id", "b_id")
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(comp(_) === 1L))
    assert(Seq(10L, 11L, 12L, 13L).forall(comp(_) === 10L))
    assert(Seq(20L, 21L).forall(comp(_) === 20L))
    assert(comp.size === 10)
  }

  test("connected components fails loudly when maxIter is hit before fixpoint") {
    import spark.implicits._
    // chain 1-2-3-4-5-6 has diameter 5; two rounds cannot propagate label 1
    // to node 6, and a silent exit would return split components
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("a_id", "b_id")
    val e = intercept[IllegalArgumentException] {
      Dedup.connectedComponents(chain, "a_id", "b_id", maxIter = 2)
    }
    assert(e.getMessage.contains("did not converge"))
    // ... and the same chain converges with enough rounds
    val comp = Dedup.connectedComponents(chain, "a_id", "b_id")
      .as[(Long, Long)].collect().toMap
    assert((1L to 6L).forall(comp(_) === 1L))
  }

  test("pointer jumping converges a 300-node path within the default 20 rounds") {
    import spark.implicits._
    // plain label propagation would need 299 rounds on this graph; the
    // path-halving jump must bring it under maxIter=20 (~log2(300) + slack)
    val chain = (1L until 300L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val comp = Dedup.connectedComponents(chain, "a_id", "b_id")
      .as[(Long, Long)].collect().toMap
    assert(comp.size === 300)
    assert(comp.values.forall(_ === 1L))
  }

  test("incremental components equal batch components on seeded random graphs") {
    import spark.implicits._
    // the contract SignatureStore relies on: cluster release-1 edges, then
    // roll forward with every edge touching a release-2 node — labels must
    // equal a from-scratch clustering of the full edge set. Seeded random
    // graphs cover bridge cases a fixture misses (a new node merging two old
    // clusters, new-new chains, isolated old clusters).
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val nOld = 30L; val nAll = 45L
      val all = (1 to 80).map { _ =>
        val a = 1L + rnd.nextInt(nAll.toInt); val b = 1L + rnd.nextInt(nAll.toInt)
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      val oldEdges = all.filter(p => p._1 <= nOld && p._2 <= nOld)
      val newEdges = all.filter(p => p._1 > nOld || p._2 > nOld)
      val batch = Dedup.connectedComponents(all.toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap
      val oldClusters = Dedup.connectedComponents(
        oldEdges.toDF("a", "b"), "a", "b").localCheckpoint()
      val oldMap = oldClusters.as[(Long, Long)].collect().toMap
      val inc = Dedup.incrementalComponents(oldClusters,
          newEdges.toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap
      // nodes absent from the increment's graph are singletons there; they
      // keep their old label (or themselves) — on shared nodes labels match
      val incFull = batch.keys.map(k =>
        k -> inc.getOrElse(k, oldMap.getOrElse(k, k))).toMap
      assert(incFull === batch, s"trial $trial diverged")
    }
  }

  test("bruteForceTopK rejects non-integral candidate ids up front") {
    val q = Seq((0L, Array.fill(4)(1.0f))).toDF("q_id", "q_emb")
    val c = Seq(("a", Array.fill(4)(1.0f))).toDF("cand_id", "cand_emb")
    val e = intercept[IllegalArgumentException] {
      Similarity.bruteForceTopK(q, c, k = 1)
    }
    assert(e.getMessage.contains("integral cand_id"))
  }

  test("brute-force and LSH ANN agree on the top match for planted twins") {
    val vecs = Seq(
      (0L, Array.fill(8)(1.0f)), (1L, Array.fill(8)(1.0f)),
      (2L, Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f)))
      .toDF("vec_id", "embedding")
    val q = vecs.where($"vec_id" === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
    val c = vecs.select($"vec_id".as("cand_id"), $"embedding".as("cand_emb"))
    val top = Similarity.bruteForceTopK(q, c, k = 1)
      .select("cand_id").as[Long].collect()
    assert(top === Seq(1L))
  }

  test("scrubBenchmarkSpans: planted eval phrase excised, overlaps merged, clean docs intact") {
    val bench = Seq((100L, "secret eval answer key here")).toDF("doc_id", "text")
    val corpus = Seq(
      // two adjacent plants of the 5-token bench phrase (positions 3..7
      // and 8..12); covered positions merge into one 3..12 run
      (1L, "a b secret eval answer key here secret eval answer key here z"),
      (2L, "totally clean document with nothing shared at all"),
      (3L, "short doc")
    ).toDF("doc_id", "text")
    val got = Dedup.scrubBenchmarkSpans(corpus, "doc_id", "text",
        bench, "text", n = 5)
      .as[(Long, Long, Long, Option[String])].collect()
      .map(r => r._1 -> r).toMap
    // doc 1: 13 tokens; windows matching the bench 5-gram start at 3 and 8,
    // covering positions 3..12 -> kept = a b ... z = 3 tokens
    assert(got(1L) === (1L, 13L, 3L, Some("a b z")))
    // untouched docs re-emit verbatim
    assert(got(2L)._3 === got(2L)._2)
    assert(got(2L)._4 === Some("totally clean document with nothing shared at all"))
    // a doc shorter than n has no windows and passes through whole
    assert(got(3L) === (3L, 2L, 2L, Some("short doc")))
  }

  test("dedup savings card reconciles with the cluster map") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val card = SparkEntry.queries("q177_dedup_savings")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    val clusters = SparkEntry.queries("q87_dedup_clusters")(spark, sf)
      .select("cluster_id").distinct().count()
    assert(card.map(_._3).sum === docs.count())           // every doc counted once
    assert(card.map(_._2).sum === clusters)               // clusters partition docs
    assert(card.map(_._4).sum === docs.count() - clusters) // removable = non-keepers
    card.foreach { r => assert(r._4 === (r._1 - 1) * r._2) }
    // singletons save nothing
    card.find(_._1 == 1L).foreach(r => assert(r._5 === 0L))
  }

  test("clusterSplit: near-dup clusters never straddle the split boundary") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val got = Dedup.clusterSplit(docs, "doc_id", "text", threshold = 0.5)
      .as[(Long, Long, String)].collect()
    assert(got.length === docs.count())
    // no cluster appears with two different splits
    val byCluster = got.groupBy(_._2)
    byCluster.values.foreach { rows =>
      assert(rows.map(_._3).toSet.size === 1, s"cluster ${rows.head._2} leaks")
    }
    // the split is the md5 rule on the ROOT id, not the doc id
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    got.foreach { case (_, root, split) =>
      val expect = if (md5hex(root.toString).substring(0, 2) < "1a") "valid"
        else "train"
      assert(split === expect)
    }
    // roots agree with the carried-verified component labeling
    val comp = Dedup.connectedComponents(
        Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.5),
        "a_id", "b_id")
      .as[(Long, Long)].collect().toMap
    got.foreach { case (id, root, _) =>
      assert(root === comp.getOrElse(id, id))
    }
  }
}
