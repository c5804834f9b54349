package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Native AdcSumExpr vs the composed `aggregate(zip_with(codes, parts,
  * element_at))` form: identical results on every input the encode path
  * produces, the null/length edge cases, and the codegen property that
  * motivated it (the DotProductSpec discipline applied to the ADC loop). */
class AdcSumSpec extends SparkSpec {
  import spark.implicits._

  test("matches the HOF form on random code/lookup tables") {
    val rnd = new scala.util.Random(11)
    val m = 16
    val ksub = 8
    val rows = (1 to 300).map { i =>
      (i.toLong, Array.fill(m)(rnd.nextInt(ksub)),
        Array.fill(m)(Array.fill(ksub)(rnd.nextLong() % 1000000L)))
    }.toDF("id", "codes", "parts")
    val both = rows.select(
      Similarity.adcSum($"codes", $"parts").as("native"),
      Similarity.adcSumHof($"codes", $"parts").as("hof"))
    assert(both.where($"native" =!= $"hof" ||
      ($"native".isNull =!= $"hof".isNull)).isEmpty)
  }

  test("null array, null row, null code, and length mismatch all yield null") {
    val base = Seq(1).toDF("x")
    def run(codes: org.apache.spark.sql.Column,
            parts: org.apache.spark.sql.Column): Option[Long] =
      base.select(Similarity.adcSum(codes, parts).as("s"))
        .as[Option[Long]].collect().head
    val p2 = array(array(lit(10L), lit(20L)), array(lit(30L), lit(40L)))
    assert(run(array(lit(1), lit(0)), p2) === Some(20L + 30L))
    assert(run(lit(null).cast("array<int>"), p2) === None)
    assert(run(array(lit(1), lit(0)),
      lit(null).cast("array<array<bigint>>")) === None)
    // length mismatch (codes 1 vs parts 2)
    assert(run(array(lit(1)), p2) === None)
    // null code element / null parts row
    assert(run(array(lit(1), lit(null).cast("int")), p2) === None)
    assert(run(array(lit(1), lit(0)),
      array(array(lit(10L), lit(20L)),
        lit(null).cast("array<bigint>"))) === None)
    // out-of-bounds code drops to null instead of throwing
    assert(run(array(lit(5), lit(0)), p2) === None)
    // NEGATIVE codes are out-of-bounds too — null, never index-from-end.
    // (This is the one intended divergence from the HOF form, whose
    // element_at(p, c + 1) would read from the tail at c = -2 and error at
    // c = -1; encode never emits negatives, AdcSum.scala documents it.)
    assert(run(array(lit(-1), lit(0)), p2) === None)
    assert(run(array(lit(-2), lit(0)), p2) === None)
    // null cell inside a row
    assert(run(array(lit(1), lit(0)),
      array(array(lit(10L), lit(null).cast("bigint")),
        array(lit(30L), lit(40L)))) === None)
  }

  test("the native adc sum stays inside whole-stage codegen") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val model = Similarity.ivfPqTrain(emb, "vec_id", "embedding", dim = 64,
      kCoarse = 4, coarseIters = 2, m = 8, ksub = 4, iters = 2)
    val enc = Similarity.ivfPqEncode(emb, "vec_id", "embedding", model)
    val parts = array((0 until 8).map(s =>
      array((0 until 4).map(j => lit((s * 4 + j).toLong)): _*)): _*)
    val q = enc.select(Similarity.adcSum(col("codes"), parts).as("adc"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("graft_adc") && plan.contains("*("), plan)
    assert(q.where(col("adc").isNull).isEmpty) // valid codes always sum
  }

  test("serve answers are unchanged by the native ADC (HOF twin replay)") {
    // full ivfPqServe output vs a clone that scores with the HOF spelling —
    // the operator-level parity pin on the real fixture
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val model = Similarity.ivfPqTrain(emb, "vec_id", "embedding", dim = 64,
      kCoarse = 8, coarseIters = 4, m = 16, ksub = 8, iters = 3)
    val enc = Similarity.ivfPqEncode(emb, "vec_id", "embedding", model)
    val qd = emb.where(col("vec_id") % 50 === 0)
      .select(col("vec_id").cast("long").as("q_id"),
        col("embedding").cast("array<double>").as("q_emb"))
    val fv = emb.select(col("vec_id").cast("long").as("cand_id"),
      col("embedding").cast("array<double>").as("cand_emb"))
    val served = Similarity.ivfPqServe(qd, enc, fv, model, nProbe = 2,
      k = 5, shortlist = 100)
    // HOF twin: recompute the shortlist ADC with the composed form and
    // verify the final top-k agrees end to end
    val dsub = model.dim / model.m
    val centArr = array(model.centroids.map(cv => array(cv.map(lit): _*)): _*)
    val partsCol = array((0 until model.m).map { s =>
      val qs = slice(col("__qr"), s * dsub + 1, dsub)
      array(model.codebooks(s).map(c =>
        floor(Similarity.dot(qs, array(c.map(lit): _*)) * 1e6 + 0.5)
          .cast("long")): _*)
    }: _*)
    val qtab = Similarity.ivfPqProbe(qd, model, 2)
      .withColumn("__qr", zip_with(col("q_emb"),
        element_at(centArr, col("cell") + 1), (a, b) => a - b))
      .select(col("q_id"), col("cell"), partsCol.as("__parts"))
    val short = enc.join(broadcast(qtab), Seq("cell"))
      .where(col("cand_id") =!= col("q_id"))
      .withColumn("adc",
        Similarity.adcSumHof(col("codes"), col("__parts")).cast("double"))
      .where(col("adc").isNotNull)
      .groupBy(col("q_id"))
      .agg(graft.functions.TopKAgg.topK(100)(col("adc"), col("cand_id")).as("tk"))
      .select(col("q_id"), explode(col("tk.items")).as("c"))
      .select(col("q_id"), col("c.id").as("cand_id"))
    val rer = fv.join(broadcast(short), Seq("cand_id"))
      .join(broadcast(qd), Seq("q_id"))
      .withColumn("score", round(Similarity.dot(col("q_emb"), col("cand_emb")), 3))
      .groupBy(col("q_id"))
      .agg(graft.functions.TopKAgg.topK(5)(col("score"), col("cand_id")).as("tk"))
      .select(col("q_id"), explode(col("tk.items")).as("c"))
      .select(col("q_id"), col("c.id").as("cand_id"), col("c.score").as("score"))
    assert(served.exceptAll(rer).isEmpty && rer.exceptAll(served).isEmpty)
  }
}
