package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.pipeline.{IndexStore, VectorRelease}
import graft.sources.Tables

/** The vector-tier nightly roll-forward (q180): one incremental job must
  * (a) produce artifacts provably identical to a from-scratch union build
  * under the frozen prior-release model, and (b) be disk-idempotent —
  * re-running the same night leaves bit-identical index codes, graph rows
  * and drop flags (the failed-nightly-rerun contract every persisted store
  * in this repo carries). */
class VectorReleaseSpec extends SparkSpec {

  private lazy val emb = Tables.load(spark, sf, "embeddings")
  private val isEval = col("vec_id") % 50 === 0
  private val isNew = col("vec_id") % 10 >= 8

  private def nodes(d: DataFrame): DataFrame =
    d.select(col("vec_id").cast("long").as("q_id"),
      col("embedding").cast("array<double>").as("q_emb"))
  private def cands(d: DataFrame): DataFrame =
    d.select(col("vec_id").cast("long").as("cand_id"),
      col("embedding").cast("array<double>").as("cand_emb"))

  test("roll-forward equals the from-scratch union build; rerun is disk-idempotent") {
    val root = Files.createTempDirectory("vrel").toString
    val idx = s"$root/index"
    val graphPath = s"$root/graph"
    val old = emb.where(!isEval && !isNew)
    val fresh = emb.where(!isEval && isNew)
    IndexStore.build(spark, idx, old, "vec_id", "embedding",
      dim = 64, kCoarse = 8, coarseIters = 4, m = 16, ksub = 8, iters = 3,
      release = "r1")
    val model = IndexStore.readModel(spark, idx)
    val prior = Similarity.ivfExactGraphEdges(nodes(old), cands(old),
      model.centroids, nProbe = 2, k = 3)

    val out = VectorRelease.rollForward(spark, idx, fresh, old,
      nodes(emb.where(isEval)), prior, "vec_id", "embedding", "r2")
      // the rerun below dynamically replaces this run's code files, which
      // would invalidate this plan's listing — pin the rows now
      .localCheckpoint()
    VectorRelease.writeGraph(out, graphPath)

    // (a) graph rows ≡ from-scratch union graph under the same frozen model
    val union = old.unionByName(fresh)
    val scratch = Similarity.withMutualFlag(Similarity.ivfExactGraphEdges(
      nodes(union), cands(union), model.centroids, nProbe = 2, k = 3))
    val gotEdges = out.select("src_id", "dst_id", "score", "rank", "mutual")
    assert(gotEdges.exceptAll(scratch).isEmpty &&
      scratch.exceptAll(gotEdges).isEmpty)

    // (a) drop flags ≡ the frozen-store decontaminate on the union codes
    val drops = IndexStore.decontaminate(spark, idx, nodes(emb.where(isEval)),
        cands(union), nProbe = 2, shortlist = 100, threshold = 0.3)
      .select("vec_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSet
    val flagged = out.where(col("dropped"))
      .select("src_id").distinct()
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSet
    // every flagged source is on the drop list; a dropped vector missing
    // from the graph output would mean it lost its edges, which the
    // roll-forward must not do
    assert(flagged === drops.intersect(
      out.select("src_id").distinct()
        .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSet))
    assert(drops.nonEmpty, "fixture must plant at least one drop")

    // (a) release provenance comes from the store's own code partitions
    val byRelease = out.select("src_id", "release").distinct()
    val wrong = byRelease.where(
      (col("release") === "r2") =!= (col("src_id") % 10 >= 8))
    assert(wrong.isEmpty, s"release provenance mismatch")

    // (b) run-twice disk idempotence: codes, graph and output all identical
    val codes1 = IndexStore.readCodes(spark, idx).collect().toSet
    val out2 = VectorRelease.rollForward(spark, idx, fresh, old,
      nodes(emb.where(isEval)), prior, "vec_id", "embedding", "r2")
      .localCheckpoint()
    VectorRelease.writeGraph(out2, graphPath)
    val codes2 = IndexStore.readCodes(spark, idx).collect().toSet
    assert(codes1 === codes2)
    assert(out2.exceptAll(out).isEmpty && out.exceptAll(out2).isEmpty)
    val g = VectorRelease.readGraph(spark, graphPath)
    val gotPersisted = out.select("src_id", "dst_id", "score", "rank")
    assert(g.exceptAll(gotPersisted).isEmpty &&
      gotPersisted.exceptAll(g).isEmpty)
  }
}
