package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.pipeline.IndexStore
import graft.sources.Tables

/** The persisted IVFADC index: q146 verifies the frozen-disk SERVE answer
  * against the shared q145 oracle; this spec proves the store lifecycle —
  * model/codes disk round-trip, rebuild idempotence, map-only release
  * append ≡ frozen-encode of the union, and the probed-cell partition
  * pruning the (cell, release) layout exists for. */
class IndexStoreSpec extends SparkSpec {

  private lazy val emb = Tables.load(spark, sf, "embeddings")
  private val isNew = col("vec_id") % 10 >= 8

  private def queriesDf: DataFrame = emb.where(col("vec_id") % 50 === 0)
    .select(col("vec_id").cast("long").as("q_id"),
      col("embedding").cast("array<double>").as("q_emb"))

  private def fullVecs: DataFrame = emb
    .select(col("vec_id").cast("long").as("cand_id"),
      col("embedding").cast("array<double>").as("cand_emb"))

  private def build(path: String, df: DataFrame, release: String = "r1"): Unit =
    IndexStore.build(spark, path, df, "vec_id", "embedding",
      dim = 64, kCoarse = 8, coarseIters = 4, m = 16, ksub = 8, iters = 3,
      release = release)

  test("frozen-disk serve equals the in-job ivfPqTopK answer") {
    val dir = Files.createTempDirectory("ivfadc_rt").toString + "/index"
    build(dir, emb)
    val served = IndexStore.query(spark, dir, queriesDf, fullVecs,
      nProbe = 2, k = 5, shortlist = 100)
    val inJob = Similarity.ivfPqTopK(emb, "vec_id", "embedding",
      col("vec_id") % 50 === 0, dim = 64, kCoarse = 8, coarseIters = 4,
      nProbe = 2, m = 16, ksub = 8, iters = 3, k = 5, shortlist = 100)
    assert(served.count() > 0, "fixture queries must return neighbors")
    assert(served.exceptAll(inJob).isEmpty && inJob.exceptAll(served).isEmpty)
  }

  test("frozen-store kNN graph equals the inline-encode twin; mutual is reciprocal membership") {
    val dir = Files.createTempDirectory("ivfadc_knn").toString + "/index"
    build(dir, emb)
    val nodes = emb.select(col("vec_id").cast("long").as("q_id"),
      col("embedding").cast("array<double>").as("q_emb"))
    val served = IndexStore.knnGraph(spark, dir, nodes, fullVecs,
      nProbe = 2, k = 3, shortlist = 50).cache()
    // inline twin: same train/encode on the same corpus, same graph pass
    val model = Similarity.ivfPqTrain(emb, "vec_id", "embedding", dim = 64,
      kCoarse = 8, coarseIters = 4, m = 16, ksub = 8, iters = 3)
    val inline = Similarity.ivfPqGraphEdges(nodes,
      Similarity.ivfPqEncode(emb, "vec_id", "embedding", model), fullVecs,
      model, nProbe = 2, k = 3, shortlist = 50)
    val servedEdges = served.select("src_id", "dst_id", "score", "rank")
    assert(servedEdges.exceptAll(inline).isEmpty &&
      inline.exceptAll(servedEdges).isEmpty)
    // mutual flag is exactly reciprocal membership; ranks are 1..deg
    val rows = served.select("src_id", "dst_id", "rank", "mutual")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    val eset = rows.map(r => (r._1, r._2)).toSet
    rows.foreach(r => assert(r._4 === eset.contains((r._2, r._1))))
    rows.groupBy(_._1).values.foreach { es =>
      assert(es.map(_._3).sorted.toList === (1L to es.length).toList)
    }
    served.unpersist()
  }

  test("incremental kNN merge equals the from-scratch graph under the frozen quantizer") {
    val isNew = col("vec_id") % 10 >= 8
    val cents = Similarity.kMeansCentroids(emb.where(!isNew), "vec_id",
      "embedding", 8, 4)
    def nodes(d: DataFrame) = d.select(col("vec_id").cast("long").as("q_id"),
      col("embedding").cast("array<double>").as("q_emb"))
    def cands(d: DataFrame) = d.select(col("vec_id").cast("long").as("cand_id"),
      col("embedding").cast("array<double>").as("cand_emb"))
    // decomposability: merging the prior graph with a delta scored only
    // against the new slice must equal scoring old nodes against the UNION
    val prior = Similarity.ivfExactGraphEdges(nodes(emb.where(!isNew)),
      cands(emb.where(!isNew)), cents, nProbe = 2, k = 3)
    val delta = Similarity.ivfExactGraphEdges(nodes(emb.where(!isNew)),
      cands(emb.where(isNew)), cents, nProbe = 2, k = 3)
    val merged = Similarity.mergeKnnEdges(prior, delta, k = 3)
    val scratch = Similarity.ivfExactGraphEdges(nodes(emb.where(!isNew)),
      cands(emb), cents, nProbe = 2, k = 3)
    assert(merged.exceptAll(scratch).isEmpty && scratch.exceptAll(merged).isEmpty)
    // overlapping delta: a pair re-scored by the delta must occupy ONE TopK
    // slot, not evict a genuine neighbor (the union dedups before the TopK)
    val overlapped = Similarity.mergeKnnEdges(prior,
      delta.unionByName(prior), k = 3)
    assert(overlapped.exceptAll(merged).isEmpty &&
      merged.exceptAll(overlapped).isEmpty)
    // and the rolled-forward FULL graph covers every union node with k edges
    val full = Similarity.withMutualFlag(merged.unionByName(
      Similarity.ivfExactGraphEdges(nodes(emb.where(isNew)), cands(emb),
        cents, nProbe = 2, k = 3)))
    val bySrc = full.select("src_id").groupBy("src_id").count()
    assert(bySrc.count() === emb.count())
  }

  test("frozen-store decontaminate equals the inline encode twin and finds planted dups") {
    // corpus = non-eval vectors PLUS one planted exact copy of eval vector
    // 0 under a fresh id — the copy must surface on the drop list at
    // cosine 1.0 with eval 0 as its best match
    val isEval = col("vec_id") % 50 === 0
    val maxId = emb.agg(max("vec_id")).head.getLong(0)
    val planted = emb.where(col("vec_id") === 0)
      .withColumn("vec_id", lit(maxId + 1))
    val corpus = emb.where(!isEval).unionByName(planted)
    val dir = Files.createTempDirectory("ivfadc_decont").toString + "/index"
    build(dir, corpus)
    val evals = emb.where(isEval)
      .select(col("vec_id").cast("long").as("q_id"),
        col("embedding").cast("array<double>").as("q_emb"))
    val fv = corpus.select(col("vec_id").cast("long").as("cand_id"),
      col("embedding").cast("array<double>").as("cand_emb"))
    val served = IndexStore.decontaminate(spark, dir, evals, fv,
      nProbe = 2, shortlist = 100, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // lifecycle parity: the same composition with in-job training/encoding
    val model = Similarity.ivfPqTrain(corpus, "vec_id", "embedding",
      dim = 64, kCoarse = 8, coarseIters = 4, m = 16, ksub = 8, iters = 3)
    val enc = Similarity.ivfPqEncode(corpus, "vec_id", "embedding", model)
    val inline = Similarity.dropListFromMatches(
        Similarity.ivfPqServe(evals, enc, fv, model, nProbe = 2,
          k = 100, shortlist = 100), threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(served === inline)
    assert(served.contains((maxId + 1, 0L, 1.0)), s"planted dup missing from $served")
  }

  test("model round-trips through the meta files bit-for-bit") {
    val dir = Files.createTempDirectory("ivfadc_model").toString + "/index"
    val model = Similarity.ivfPqTrain(emb, "vec_id", "embedding",
      dim = 64, kCoarse = 8, coarseIters = 4, m = 16, ksub = 8, iters = 3)
    build(dir, emb)
    val back = IndexStore.readModel(spark, dir)
    assert(back.dim === model.dim)
    assert(back.centroids.map(_.toSeq).toSeq === model.centroids.map(_.toSeq).toSeq)
    assert(back.codebooks.map(_.map(_.toSeq).toSeq).toSeq
      === model.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("rebuild is idempotent: run-twice leaves an identical index") {
    val dir = Files.createTempDirectory("ivfadc_idem").toString + "/index"
    build(dir, emb)
    val once = IndexStore.readCodes(spark, dir)
      .select("cand_id", "cell", "codes", "release").collect().toSet
    build(dir, emb)
    val twice = IndexStore.readCodes(spark, dir)
      .select("cand_id", "cell", "codes", "release").collect().toSet
    assert(twice === once, "rebuilding must replace, never duplicate")
  }

  test("release append is map-only frozen-encode and idempotent per release") {
    val dir = Files.createTempDirectory("ivfadc_app").toString + "/index"
    // seed index trains on the OLD slice only
    build(dir, emb.where(!isNew))
    val model = IndexStore.readModel(spark, dir)
    IndexStore.append(spark, dir, emb.where(isNew), "vec_id", "embedding",
      release = "r2")
    // quantizers are untouched by the append
    val after = IndexStore.readModel(spark, dir)
    assert(after.centroids.map(_.toSeq).toSeq === model.centroids.map(_.toSeq).toSeq)
    // store codes == encoding the UNION against the same frozen model
    // (append never retrains — the q124 + q127 composition)
    val stored = IndexStore.readCodes(spark, dir)
      .select("cand_id", "cell", "codes").collect().toSet
    val expected = Similarity.ivfPqEncode(emb, "vec_id", "embedding", model)
      .collect().toSet
    assert(stored === expected)
    // re-running the release replaces its partitions, never duplicates
    IndexStore.append(spark, dir, emb.where(isNew), "vec_id", "embedding",
      release = "r2")
    assert(IndexStore.readCodes(spark, dir).count() === emb.count())
  }

  test("vacuum drops exactly the rejected releases' code partitions") {
    val dir = Files.createTempDirectory("ivfadc_vac").toString + "/index"
    build(dir, emb.where(!isNew), release = "r1")
    IndexStore.append(spark, dir, emb.where(isNew), "vec_id", "embedding",
      release = "r2")
    val model = IndexStore.readModel(spark, dir)
    val dropped = IndexStore.vacuum(spark, dir, keep = _ == "r2")
    assert(dropped === Seq("r1"))
    val left = IndexStore.readCodes(spark, dir)
    assert(left.select("release").distinct().collect().map(_.getString(0)).toSeq
      === Seq("r2"))
    assert(left.count() === emb.where(isNew).count())
    // quantizer metadata is release-independent and survives the vacuum
    val after = IndexStore.readModel(spark, dir)
    assert(after.centroids.map(_.toSeq).toSeq === model.centroids.map(_.toSeq).toSeq)
    // vacuuming everything currently kept is a no-op
    assert(IndexStore.vacuum(spark, dir, keep = _ == "r2") === Seq.empty)
  }

  test("serve scans only the probed cells (partition-pruned)") {
    val dir = Files.createTempDirectory("ivfadc_prune").toString + "/index"
    build(dir, emb)
    val model = IndexStore.readModel(spark, dir)
    val oneQ = queriesDf.orderBy("q_id").limit(1)
    val probed = Similarity.ivfPqProbe(oneQ, model, nProbe = 2)
      .select("cell").distinct().collect().map(_.getInt(0)).toSet
    assert(probed.size === 2)
    val plan = IndexStore.query(spark, dir, oneQ, fullVecs,
        nProbe = 2, k = 5, shortlist = 100)
      .queryExecution.executedPlan.toString
    // the code scan must carry a literal cell partition filter — the layout's
    // entire point: unprobed cells' directories are never read
    assert(plan.contains("PartitionFilters") && probed.forall(c =>
      plan.contains(c.toString)),
      s"expected a partition filter on cells $probed in:\n$plan")
    // and the filter excludes the unprobed cells: the pruned scan reads
    // strictly fewer partitions than exist
    val all = IndexStore.readCodes(spark, dir)
      .select("cell").distinct().count()
    assert(all > 2, "fixture must populate more cells than one query probes")
  }
}
