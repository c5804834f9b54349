package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables

/** Product-quantization invariants: codes are well-formed and partition-
  * independent, ADC ranking is deterministic, and measured recall vs the
  * exact brute-force top-k stays above a pinned floor on the fixture
  * (ADC is approximate by construction — the guard is against recall
  * silently collapsing, not against approximation itself). */
class PQSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  // two tight clusters per subspace half so sub-quantizers have structure
  // to find; ids interleave so the first-ksub init spans both
  private def fixture = {
    val pts = for (i <- 0 until 40) yield {
      val base = Array.tabulate(dim)(d =>
        (if ((i + d) % 2 == 0) 1f else -1f) + i * 0.01f)
      (i.toLong, base.toSeq)
    }
    pts.toDF("id", "emb")
  }

  test("codes: one per subspace, each within [0, ksub)") {
    val cb = Similarity.pqCodebooks(fixture, "id", "emb", dim, m = 2,
      ksub = 4, iters = 2)
    assert(cb.length === 2 && cb.forall(_.length == 4) &&
      cb.forall(_.forall(_.length == dim / 2)))
    val codes = Similarity.pqEncode(fixture, "id", "emb", dim, cb)
      .select(explode($"codes").as("c")).collect().map(_.getInt(0))
    assert(codes.forall(c => c >= 0 && c < 4))
  }

  test("codebooks and ADC top-k identical under any partitioning") {
    val a = Similarity.pqTopK(fixture, "id", "emb", $"id" % 10 === 0,
      dim, m = 2, ksub = 4, iters = 2, k = 3, shortlist = 6)
      .orderBy("q_id", "cand_id").collect().toSeq
    val b = Similarity.pqTopK(fixture.repartition(7), "id", "emb",
      $"id" % 10 === 0, dim, m = 2, ksub = 4, iters = 2, k = 3, shortlist = 6)
      .orderBy("q_id", "cand_id").collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("m must divide dim; degenerate params fail loudly") {
    intercept[IllegalArgumentException] {
      Similarity.pqCodebooks(fixture, "id", "emb", dim, m = 3, ksub = 2,
        iters = 1)
    }
    intercept[IllegalArgumentException] {
      Similarity.pqCodebooks(fixture, "id", "emb", dim, m = 2, ksub = 0,
        iters = 1)
    }
  }

  test("recall@5 vs exact brute force stays above the pinned floor") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.where($"vec_id" % 50 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
    val exact = Similarity.bruteForceTopK(queries,
      emb.select($"vec_id".as("cand_id"), $"embedding".as("cand_emb")), k = 5)
      .select("q_id", "cand_id").as[(Long, Long)].collect().toSet
    val pq = Similarity.pqTopK(emb, "vec_id", "embedding",
      $"vec_id" % 50 === 0, dim = 64, m = 16, ksub = 8, iters = 3, k = 5,
      shortlist = 100)
      .select("q_id", "cand_id").as[(Long, Long)].collect().toSet
    val recall = (exact & pq).size.toDouble / exact.size
    // measured 0.96 on this fixture (near-random vectors are PQ's worst
    // case; real corpus embeddings cluster far more tightly) — the floor
    // guards against recall collapsing, not against approximation
    assert(recall >= 0.8, s"recall@5 collapsed: $recall")
  }
}
