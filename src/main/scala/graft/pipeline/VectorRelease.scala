package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Vector-tier nightly roll-forward — the ANN counterpart of
  * [[ReleaseBuild.rollForward]], making the index/graph/decontamination
  * artifacts roll forward in ONE incremental job instead of rebuilding
  * (the reference's release-versioned roll-forward applied to the vector
  * tier: one release id drives every downstream artifact,
  * `db_etl_orchestrator/orchestrator.py:115-226`).
  *
  * One call per release does, against the FROZEN quantizers of the
  * persisted [[IndexStore]]:
  *
  *  1. **index append** — the new release's vectors are encoded map-only
  *     ([[IndexStore.append]]: centroid/codebook literals ride with the
  *     plan) and dynamic-overwrite exactly their own (cell, release) code
  *     partitions; prior releases' codes are never re-read, re-running a
  *     failed night replaces rather than duplicates.
  *  2. **graph roll-forward** — the prior release's mutual-kNN edge list
  *     merges with a delta scored ONLY against the new slice
  *     ([[Similarity.ivfExactGraphEdges]] old-nodes × new-candidates +
  *     new-nodes × union), then [[Similarity.mergeKnnEdges]]'s bounded
  *     per-source top-k. Exact scores make the merged graph provably
  *     identical to a from-scratch build on the union corpus under the
  *     same frozen quantizer (the q176 kernel; VectorReleaseSpec pins it).
  *     Per night the engine scores O(|V_old| × delta-resident-cells +
  *     |new| × union-cells) — the old corpus is never re-paired with
  *     itself.
  *  3. **eval drop list** — [[IndexStore.decontaminate]] served from the
  *     just-appended frozen index: eval vectors probe their cells, ADC
  *     shortlists run over the partition-pruned union codes, candidates
  *     at/above the threshold land on the drop list with their best eval
  *     match. Zero training jobs.
  *
  * Output: one row per rolled-forward graph edge with the source vector's
  * release and drop status — (src_id, dst_id, score, rank, mutual,
  * release, dropped) — so one frame hash-pins all three artifacts.
  *
  * Scale shape: the only corpus-sized work is the inherent graph surface
  * (cell-keyed equi-joins, bounded TopK aggregates, map-side partials);
  * the index append is map-only over the delta; the drop list's work
  * scales with the probed population. Nothing broadcasts query-sided,
  * nothing prior-release-sized re-encodes.
  */
object VectorRelease {

  /** Serving/graph dials; defaults are the declared q180 fixture's. */
  case class Params(nProbe: Int = 2, k: Int = 3, shortlist: Int = 100,
                    threshold: Double = 0.3)

  /** The one nightly call, against the persisted index at `path` (already
    * holding the prior releases) and the prior release's edge list.
    *
    * @param newVecs    the new release's vectors (idCol, embCol)
    * @param oldVecs    prior releases' vectors, for the graph delta's
    *                   old-node side (in production the persisted raw-vector
    *                   store; candidate-scoring access only — never
    *                   re-encoded, never self-paired)
    * @param evals      eval/benchmark vectors (q_id long, q_emb
    *                   array<double>)
    * @param priorGraph prior release's edge list (src_id, dst_id, score,
    *                   rank[, mutual])
    * @param release    the new release id (code-partition key)
    */
  def rollForward(spark: SparkSession, path: String, newVecs: DataFrame,
                  oldVecs: DataFrame, evals: DataFrame, priorGraph: DataFrame,
                  idCol: String, embCol: String, release: String,
                  p: Params = Params()): DataFrame = {
    // a rerun of the same night dynamically replaces this release's code
    // partitions — refresh so no stale file listing from a previous attempt
    // survives into this plan (the rollForwardOnDisk contract)
    spark.catalog.refreshByPath(path)
    // 1. map-only frozen-model append of the new release's codes
    IndexStore.append(spark, path, newVecs, idCol, embCol, release)
    val model = IndexStore.readModel(spark, path)

    def nodes(d: DataFrame) = d.select(col(idCol).cast("long").as("q_id"),
      col(embCol).cast("array<double>").as("q_emb"))
    def cands(d: DataFrame) = d.select(col(idCol).cast("long").as("cand_id"),
      col(embCol).cast("array<double>").as("cand_emb"))
    val union = oldVecs.unionByName(newVecs)

    // 2. graph roll-forward under the frozen coarse quantizer
    val oldDelta = Similarity.ivfExactGraphEdges(nodes(oldVecs),
      cands(newVecs), model.centroids, p.nProbe, p.k)
    val newEdges = Similarity.ivfExactGraphEdges(nodes(newVecs),
      cands(union), model.centroids, p.nProbe, p.k)
    val graph = Similarity.withMutualFlag(
      Similarity.mergeKnnEdges(priorGraph, oldDelta, p.k)
        .unionByName(newEdges))

    // 3. eval drop list served FROM the just-appended index
    val drops = IndexStore.decontaminate(spark, path, evals, cands(union),
      p.nProbe, p.shortlist, p.threshold)

    // one frame pinning all three artifacts: edge rows + the source's
    // release (from the store's own codes) + its drop status
    val rel = IndexStore.readCodes(spark, path)
      .select(col("cand_id").as("src_id"), col("release"))
    graph.join(rel, Seq("src_id"))
      .join(drops.select(col("vec_id").as("src_id"), lit(true).as("__d")),
        Seq("src_id"), "left")
      .select(col("src_id"), col("dst_id"), col("score"), col("rank"),
        col("mutual"), col("release"),
        coalesce(col("__d"), lit(false)).as("dropped"))
  }

  /** Persist the rolled-forward edge list. The graph is rewritten whole —
    * unlike the code table, old sources' rows legitimately CHANGE when the
    * delta merges into their top-k, so release partitions are not immutable
    * here; the table is |V|·k edge rows (k small), orders of magnitude
    * below the raw corpus, and the write is idempotent by construction
    * (same frozen model + same releases → identical rows).
    * `localCheckpoint` pins the plan before overwrite so a graph that READS
    * the previous night's files can safely replace them (the
    * [[ReleaseBuild.rollForwardOnDisk]] reasoning). */
  def writeGraph(graph: DataFrame, graphPath: String): Unit =
    graph.localCheckpoint().write.mode("overwrite").parquet(graphPath)

  /** The persisted edge list, schema-normalized. */
  def readGraph(spark: SparkSession, graphPath: String): DataFrame =
    spark.read.parquet(graphPath)
      .select(col("src_id").cast("long").as("src_id"),
        col("dst_id").cast("long").as("dst_id"),
        col("score").cast("double").as("score"),
        col("rank").cast("long").as("rank"))
}
