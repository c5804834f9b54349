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

  test("opqRotate: isometric to fp error, and beats plain PQ on anisotropic data") {
    // all the variance is a 4-D cloud in the FIRST subspace (m=2 splits
    // coords 0–3 / 4–7): plain PQ spends subspace B's codes on nothing,
    // while A crams a 4-D cloud into 4 codes. The reflection moves the top
    // component's share of A-variance into B where codes are idle — the
    // eigenvalue-balancing effect a single Householder can buy. (A pure
    // 1-D line fixture is provably NEUTRAL here: splitting a line's
    // variance across subspaces rescales distortion linearly.)
    val pts = for (i <- 0 until 40) yield
      (i.toLong, Array.tabulate(dim)(d =>
        if (d < 4) ((i * 31 + d * 17) % 11 - 5).toDouble
        else ((i * 7 + d) % 3) * 0.01).toSeq)
    val aniso = pts.toDF("id", "emb")
    val rot = Similarity.opqRotate(aniso, "id", "emb", dim, iters = 5)
    val origMap = pts.toMap
    val rotMap = rot.as[(Long, Seq[Double])].collect().toMap
    assert(rotMap.keySet === origMap.keySet)
    // isometry: pairwise dot products preserved to fp error
    def dot(m: Map[Long, Seq[Double]], a: Long, b: Long): Double =
      m(a).zip(m(b)).map { case (x, y) => x * y }.sum
    for ((a, b) <- Seq((0L, 1L), (5L, 17L), (39L, 3L), (20L, 20L)))
      assert(math.abs(dot(origMap, a, b) - dot(rotMap, a, b)) < 1e-6,
        s"dot($a,$b) not preserved")
    // reconstruction error: same budget (m=2, ksub=4) quantizes the rotated
    // corpus strictly better
    def mse(df: org.apache.spark.sql.DataFrame, embCol: String): Double = {
      val cb = Similarity.pqCodebooks(df, "id", embCol, dim, m = 2, ksub = 4,
        iters = 3)
      val codes = Similarity.pqEncode(df, "id", embCol, dim, cb)
        .as[(Long, Seq[Int])].collect().toMap
      val vecs = df.select($"id", col(embCol).cast("array<double>"))
        .as[(Long, Seq[Double])].collect()
      vecs.map { case (id, v) =>
        val rec = codes(id).zipWithIndex.flatMap { case (c, mi) => cb(mi)(c) }
        v.zip(rec).map { case (x, y) => (x - y) * (x - y) }.sum
      }.sum / vecs.length
    }
    val ePlain = mse(aniso, "emb")
    val eRot = mse(rot, "emb_rot")
    assert(eRot < ePlain, s"rotated PQ error $eRot !< plain $ePlain")
    // recall under a TIGHT shortlist (no rerank headroom): ground truth is
    // rotation-invariant, the ADC shortlist is not — rotated must not lose
    val queries = aniso.where($"id" % 10 === 0)
      .select($"id".as("q_id"), $"emb".as("q_emb"))
    val exact = Similarity.bruteForceTopK(queries,
      aniso.select($"id".as("cand_id"), $"emb".as("cand_emb")), k = 3)
      .select("q_id", "cand_id").as[(Long, Long)].collect().toSet
    def recall(df: org.apache.spark.sql.DataFrame, embCol: String): Double = {
      val got = Similarity.pqTopK(df, "id", embCol, $"id" % 10 === 0,
        dim, m = 2, ksub = 4, iters = 3, k = 3, shortlist = 4)
        .select("q_id", "cand_id").as[(Long, Long)].collect().toSet
      (exact & got).size.toDouble / exact.size
    }
    val rPlain = recall(aniso, "emb")
    val rRot = recall(rot, "emb_rot")
    assert(rRot >= rPlain, s"rotated recall $rRot < plain $rPlain")
  }

  test("ivfPqTopK: partition-invariant, self-excluding, and recall holds with full probing") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    def run(df: org.apache.spark.sql.DataFrame, nProbe: Int) =
      Similarity.ivfPqTopK(df, "vec_id", "embedding",
        $"vec_id" % 50 === 0, dim = 64, kCoarse = 8, coarseIters = 4,
        nProbe = nProbe, m = 16, ksub = 8, iters = 3, k = 5, shortlist = 100)
    val a = run(emb, 2).orderBy("q_id", "cand_id").collect().toSeq
    val b = run(emb.repartition(13), 2).orderBy("q_id", "cand_id").collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
    assert(!a.exists(r => r.getLong(0) == r.getLong(1)), "self-match leaked")
    // probing ALL cells removes the IVF approximation: the only loss left
    // is the residual-PQ shortlist, which should recover most of the exact
    // top-5 (residual PQ quantizes better than raw PQ; same 0.8 floor)
    val exact = Similarity.bruteForceTopK(
      emb.where($"vec_id" % 50 === 0)
        .select($"vec_id".as("q_id"), $"embedding".as("q_emb")),
      emb.select($"vec_id".as("cand_id"), $"embedding".as("cand_emb")), k = 5)
      .select("q_id", "cand_id").as[(Long, Long)].collect().toSet
    val full = run(emb, 8).select("q_id", "cand_id")
      .as[(Long, Long)].collect().toSet
    val recall = (exact & full).size.toDouble / exact.size
    assert(recall >= 0.8, s"full-probe recall collapsed: $recall")
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
