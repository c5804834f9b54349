package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.pipeline.{IndexStore, StoreAudit, VectorRelease}
import graft.sources.Tables

/** The detect → abort → repair loop closed (q208): a torn store — one
  * tier's release partition rewritten or lost while the other survived,
  * the exact corruption a crashed purge leaves — must (a) abort the
  * nightly maintain with the integrity card in the error instead of
  * reporting success, (b) leave the store recoverable, and (c) be
  * repaired by [[IndexStore.repairRelease]] to a state identical to a
  * never-corrupted build. */
class StoreRepairSpec extends SparkSpec {

  private lazy val emb = Tables.load(spark, sf, "embeddings")
  private val isEval = col("vec_id") % 50 === 0
  private val isNew = col("vec_id") % 10 >= 8

  private def nodes(d: DataFrame): DataFrame =
    d.select(col("vec_id").cast("long").as("q_id"),
      col("embedding").cast("array<double>").as("q_emb"))
  private def cands(d: DataFrame): DataFrame =
    d.select(col("vec_id").cast("long").as("cand_id"),
      col("embedding").cast("array<double>").as("cand_emb"))

  private def buildWithTier(idx: String, slice: DataFrame): Unit = {
    IndexStore.build(spark, idx, slice, "vec_id", "embedding",
      dim = 64, kCoarse = 8, coarseIters = 4, m = 16, ksub = 8, iters = 3,
      release = "r1")
    IndexStore.buildRerank(spark, idx, cands(slice))
  }

  /** Tear one (cell, release) partition out of a tier — the torn-purge /
    * bit-rot / operator-error corruption class. Deterministic choice: the
    * `skip`-th (by name) cell dir holding the release. */
  private def tearOnePartition(idx: String, sub: String, release: String,
                               skip: Int = 0): String = {
    val root = new org.apache.hadoop.fs.Path(s"$idx/$sub")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val victim = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
      .map(_.getPath).sortBy(_.getName)
      .map(c => new org.apache.hadoop.fs.Path(c, s"release=$release"))
      .filter(fs.exists)
      .drop(skip).headOption
      .getOrElse(fail(s"no $sub partition to tear (skip=$skip)"))
    assert(fs.delete(victim, true))
    spark.catalog.refreshByPath(s"$idx/$sub")
    victim.toString
  }

  test("a torn int8 tier aborts maintain with the card in the error; repairRelease recovers; rerun converges") {
    val root = Files.createTempDirectory("repair_gate").toString
    val idx = s"$root/index"
    val old = emb.where(!isEval && !isNew)
    val fresh = emb.where(!isEval && isNew)
    buildWithTier(idx, old)
    val model = IndexStore.readModel(spark, idx)
    val prior = Similarity.ivfExactGraphEdges(nodes(old), cands(old),
      model.centroids, nProbe = 2, k = 3).localCheckpoint()
    // the corruption: r1 loses one rerank partition while its code twin
    // survives (codes stay healthy, so the health verdict does NOT trip a
    // rebalance — only the parity gate can catch this)
    tearOnePartition(idx, "rerank/codes", "r1")
    def night() = VectorRelease.maintain(spark, idx, fresh, old,
      nodes(emb.where(isEval)), prior, "vec_id", "embedding", "r2",
      kCoarse = 8, maxShareMilli = 300,
      priorGeneration = IndexStore.generation(spark, idx))
    val thrown = intercept[IllegalStateException] { night().count() }
    assert(thrown.getMessage.contains("rerank_int8") ||
      thrown.getMessage.contains("parity"),
      s"the abort must carry the card: ${thrown.getMessage}")
    // the card names (rerank_int8, r1); the repair re-appends exactly that
    // release's slice — note the night's r2 append DID land before the
    // gate fired (partition-idempotent, so this is fine), and the repair
    // touches only r1's partitions
    IndexStore.repairRelease(spark, idx, old, "vec_id", "embedding", "r1")
    val out = night()
    assert(out.count() > 0)
    // converged: the repaired store's night equals one on a never-torn
    // store, tier for tier
    val cleanIdx = s"$root/clean"
    buildWithTier(cleanIdx, old)
    VectorRelease.maintain(spark, cleanIdx, fresh, old,
      nodes(emb.where(isEval)), prior, "vec_id", "embedding", "r2",
      kCoarse = 8, maxShareMilli = 300,
      priorGeneration = IndexStore.generation(spark, cleanIdx)).count()
    val gotCodes = IndexStore.readCodes(spark, idx).collect().toSet
    val cleanCodes = IndexStore.readCodes(spark, cleanIdx).collect().toSet
    assert(gotCodes === cleanCodes)
    val gotTier = IndexStore.readRerankCodes(spark, idx).collect().toSet
    val cleanTier = IndexStore.readRerankCodes(spark, cleanIdx)
      .collect().toSet
    assert(gotTier === cleanTier,
      "the repaired int8 tier must equal the never-corrupted one")
  }

  test("repairRelease restores a torn CODE partition to the from-scratch store; other releases untouched") {
    val root = Files.createTempDirectory("repair_codes").toString
    val idx = s"$root/index"
    val old = emb.where(!isEval && !isNew)
    val fresh = emb.where(!isEval && isNew)
    buildWithTier(idx, old)
    IndexStore.append(spark, idx, fresh, "vec_id", "embedding", "r2")
    IndexStore.appendRerank(spark, idx, cands(fresh), "r2")
    val r2Codes = IndexStore.readCodes(spark, idx)
      .where(col("release") === "r2").collect().toSet
    val before = IndexStore.readCodes(spark, idx).collect().toSet
    val beforeTier = IndexStore.readRerankCodes(spark, idx).collect().toSet
    // tear a code partition AND a DIFFERENT cell's rerank partition of r1
    // (a crash window that rewrote neither tier completely; different
    // cells so the divergence shows in both parity directions)
    tearOnePartition(idx, "codes", "r1", skip = 0)
    tearOnePartition(idx, "rerank/codes", "r1", skip = 1)
    // the card detects BOTH directions before repair
    val codesNow = IndexStore.readCodes(spark, idx)
    val parity = StoreAudit.card("rerank_int8",
      IndexStore.readRerankCodes(spark, idx), "cand_id",
      codesNow.select("cand_id", "release"))
    assert(parity.agg(sum(col("orphan") + col("missing"))).head().getLong(0)
      > 0, "the torn tiers must show non-zero parity invariants")
    IndexStore.repairRelease(spark, idx, old, "vec_id", "embedding", "r1")
    assert(IndexStore.readCodes(spark, idx).collect().toSet === before,
      "repair must restore the code table bit-for-bit")
    assert(IndexStore.readRerankCodes(spark, idx).collect().toSet ===
      beforeTier, "repair must restore the int8 tier bit-for-bit")
    assert(IndexStore.readCodes(spark, idx)
      .where(col("release") === "r2").collect().toSet === r2Codes,
      "repair of r1 must not touch r2's partitions")
    // idempotent: repairing a healthy release changes nothing
    IndexStore.repairRelease(spark, idx, old, "vec_id", "embedding", "r1")
    assert(IndexStore.readCodes(spark, idx).collect().toSet === before)
  }
}
