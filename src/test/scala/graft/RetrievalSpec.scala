package graft

import org.apache.spark.sql.functions._
import graft.operators.Retrieval

/** Hybrid RRF fusion and greedy k-center selection on hand-checkable
  * fixtures: rank lists, fusion arithmetic, tie-breaks, greedy order,
  * and the k-center monotonicity invariant. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("rankTopN ranks by score desc with id tie-break and caps at n") {
    val scored = Seq(
      (10L, 3.0), (11L, 5.0), (12L, 5.0), (13L, 1.0), (14L, 4.0)
    ).toDF("doc_id", "score")
    val got = Retrieval.rankTopN(scored, "doc_id", "score", 3)
      .as[(Long, Long)].collect().toMap
    // 5.0 ties: 11 before 12; then 4.0; 3.0/1.0 fall outside n=3
    assert(got === Map(11L -> 1L, 12L -> 2L, 14L -> 3L))
  }

  test("rrfFuse sums integer micro-unit contributions over the arm union") {
    val lex = Seq((1L, 9.0), (2L, 8.0), (3L, 7.0)).toDF("doc_id", "score")
    val vec = Seq((2L, 0.9), (4L, 0.8)).toDF("doc_id", "score")
    val got = Retrieval.rrfFuse(lex, vec, "doc_id", n = 2, rrfK = 60)
      .orderBy("doc_id")
      .as[(Long, Option[Long], Option[Long], Long)].collect()
    def c(r: Long): Long = math.floor(1000000.0 / (60 + r)).toLong
    // n=2: lex keeps 1,2; vec keeps 2,4; 3 is cut by the lexical top-n
    assert(got === Array(
      (1L, Some(1L), None, c(1)),
      (2L, Some(2L), Some(1L), c(2) + c(1)),
      (4L, None, Some(2L), c(2))))
  }

  test("rrfFuse: a doc ranked first in both arms leads the fused order") {
    val lex = Seq((1L, 9.0), (2L, 8.0)).toDF("doc_id", "score")
    val vec = Seq((1L, 0.9), (3L, 0.8)).toDF("doc_id", "score")
    val top = Retrieval.rrfFuse(lex, vec, "doc_id", n = 2, rrfK = 60)
      .orderBy(col("rrf_micro").desc, col("doc_id"))
      .select("doc_id").as[Long].collect()
    assert(top.head === 1L)
  }

  test("kCenterSelect: orthogonal axes are picked before correlated vectors") {
    // e0/e1/e2 mutually orthogonal; 13 is nearly parallel to e0 — greedy
    // min-max-similarity must take all three axes before the near-duplicate.
    val pool = Seq(
      (10L, Seq(1.0f, 0.0f, 0.0f)),
      (11L, Seq(0.0f, 1.0f, 0.0f)),
      (12L, Seq(0.0f, 0.0f, 1.0f)),
      (13L, Seq(0.999f, 0.04f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = Retrieval.kCenterSelect(pool, "vec_id", "embedding", k = 4)
      .orderBy("sel_ord")
      .as[(Long, Long, Option[Double])].collect()
    assert(got.map(_._2).toSeq === Seq(10L, 11L, 12L, 13L))
    assert(got.head._3.isEmpty) // seed has no prior
    // the near-duplicate's max prior sim is its rounded dot with 10
    assert(got.last._3.contains(0.999))
  }

  test("kCenterSelect: max_prior_sim is non-decreasing in selection order") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .where(col("vec_id") % 5 === 0)
    val sims = Retrieval.kCenterSelect(emb, "vec_id", "embedding", k = 6)
      .orderBy("sel_ord")
      .select("max_prior_sim").as[Option[Double]].collect().flatten
    assert(sims.nonEmpty)
    assert(sims.zip(sims.tail).forall { case (a, b) => b >= a },
      s"max_prior_sim not monotone: ${sims.mkString(", ")}")
  }

  test("rankingMetrics: exact integer MRR/DCG/nDCG, perfect ranking scores 1000") {
    assert(Retrieval.dcgDiscountsMicro(3) === Seq(1000000L, 630930L, 500000L))
    val served = Seq(
      // q 1: perfect (all 3 served are truth)
      (1L, 11L, 1L), (1L, 12L, 2L), (1L, 13L, 3L),
      // q 2: only rank-2 hits
      (2L, 21L, 1L), (2L, 22L, 2L), (2L, 23L, 3L),
      // q 3: no hits
      (3L, 31L, 1L), (3L, 32L, 2L), (3L, 33L, 3L)
    ).toDF("q_id", "cand_id", "rank")
    val truth = Seq(
      (1L, 11L), (1L, 12L), (1L, 13L),
      (2L, 22L), (2L, 90L), (2L, 91L),
      (3L, 92L), (3L, 93L), (3L, 94L)
    ).toDF("q_id", "cand_id")
    val got = Retrieval.rankingMetrics(served, truth, k = 3)
      .orderBy("q_id")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got(0) === ((1L, 3L, 1000000L, 2130930L, 1000L)))
    // q 2: mrr = floor(1e6/2) = 500000; dcg = disc(2) = 630930
    assert(got(1) === ((2L, 1L, 500000L, 630930L,
      math.floor(630930L * 1000.0 / 2130930L).toLong)))
    assert(got(2) === ((3L, 0L, 0L, 0L, 0L)))
  }

  test("mmrSelect: lambda=1000 reduces to pure relevance ranking") {
    val pool = Seq(
      (1L, Seq(1.0f, 0.0f), 0.9), (2L, Seq(0.0f, 1.0f), 0.7),
      (3L, Seq(0.9f, 0.1f), 0.8), (4L, Seq(0.5f, 0.5f), 0.6)
    ).toDF("vec_id", "embedding", "rel")
    val got = Retrieval.mmrSelect(pool, "vec_id", "embedding", "rel",
        k = 3, n = 4, lambdaMilli = 1000L)
      .orderBy("sel_ord").select("vec_id").as[Long].collect()
    assert(got.toSeq === Seq(1L, 3L, 2L))
  }

  test("mmrSelect: lambda=0 spreads like k-center after the relevance seed") {
    // 3 is nearly parallel to the seed (1) — with pure diversity it must
    // lose to the orthogonal 2 even though its relevance is higher
    val pool = Seq(
      (1L, Seq(1.0f, 0.0f), 0.9), (2L, Seq(0.0f, 1.0f), 0.5),
      (3L, Seq(0.999f, 0.04f), 0.8)
    ).toDF("vec_id", "embedding", "rel")
    val got = Retrieval.mmrSelect(pool, "vec_id", "embedding", "rel",
        k = 2, n = 3, lambdaMilli = 0L)
      .orderBy("sel_ord").select("vec_id").as[Long].collect()
    assert(got.toSeq === Seq(1L, 2L))
  }

  test("mmrSelect: mmr_micro is the exact integer objective at pick time") {
    val pool = Seq(
      (1L, Seq(1.0f, 0.0f), 0.9), (2L, Seq(0.6f, 0.8f), 0.7)
    ).toDF("vec_id", "embedding", "rel")
    val got = Retrieval.mmrSelect(pool, "vec_id", "embedding", "rel",
        k = 2, n = 2, lambdaMilli = 700L)
      .orderBy("sel_ord")
      .as[(Long, Long, Option[Long])].collect()
    assert(got(0) === ((0L, 1L, None)))
    // pick 2: rel_milli=700, sim to seed = round(0.6,3)*1000 = 600
    // mmr = 700*700 - 300*600 = 490000 - 180000 = 310000
    assert(got(1) === ((1L, 2L, Some(310000L))))
  }

  test("kCenterPerStratum equals kCenterSelect run on each stratum alone") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .where(col("label") < 3)
    val strat = Retrieval.kCenterPerStratum(emb, "vec_id", "embedding",
        "label", k = 4)
      .as[(Long, Long, Long, Option[Double])].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3, t._4)).sortBy(_._1).toSeq)
      .toMap
    (0L until 3L).foreach { l =>
      val solo = Retrieval.kCenterSelect(emb.where(col("label") === l),
          "vec_id", "embedding", k = 4)
        .as[(Long, Long, Option[Double])].collect().sortBy(_._1).toSeq
      assert(strat(l) === solo, s"stratum $l diverges from the solo greedy")
    }
  }

  test("kCenterSelect: pool smaller than k returns the whole pool, seeded at min id") {
    val pool = Seq((7L, Seq(1.0f, 0.0f)), (3L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val got = Retrieval.kCenterSelect(pool, "vec_id", "embedding", k = 5)
      .orderBy("sel_ord").as[(Long, Long, Option[Double])].collect()
    assert(got.map(_._2).toSeq === Seq(3L, 7L))
    assert(got.map(_._1).toSeq === Seq(0L, 1L))
  }
}
