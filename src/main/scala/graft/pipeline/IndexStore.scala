package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.operators.Similarity.IvfPqModel

/** Persisted IVFADC index (Jégou et al. 2011 §IV) — the serving lifecycle
  * around [[Similarity.ivfPqTopK]]'s verified kernels: train and encode ONCE,
  * persist, then answer every query against the frozen index with ZERO
  * training jobs. The reference's serving tier works exactly this way — its
  * query workers read precomputed stores, never re-running the ETL that
  * built them (`despatch_ops_workers/<worker>/queries.py`); this store is that
  * contract for the ANN tier, on the [[SignatureStore]]/[[GramStore]] idiom.
  *
  * Layout under `path`:
  *   - `meta/centroids` — (cell int, cvec array<double>): kCoarse × dim,
  *     kilobytes.
  *   - `meta/codebooks` — (sub int, cluster int, cvec array<double>):
  *     m × ksub × dim/m, kilobytes.
  *   - `codes` — (cand_id long, codes array<int>), parquet PARTITIONED BY
  *     (cell, release): m small ints per vector at rest (the 100 TB side).
  *     Partitioning by `cell` means a query's probed cells map to directories
  *     — the scan never lists, let alone reads, unprobed cells' files;
  *     partitioning by `release` makes appends idempotent dynamic overwrites
  *     of exactly their own partitions (the S9/S10 contract).
  *
  * Lifecycle:
  *   - [[build]]: train quantizers on the seed corpus, encode it, persist
  *     everything (full overwrite — a build IS the index).
  *   - [[append]]: encode a NEW release against the FROZEN quantizers —
  *     map-only (centroid/codebook literals broadcast with the plan), prior
  *     releases' vectors never re-read — and dynamic-overwrite its own
  *     (cell, release) partitions. Re-running a failed append replaces, never
  *     duplicates. This composes the q124 (frozen-centroid cell assign) and
  *     q127 (frozen-codebook encode) halves into the store.
  *   - [[query]]: load the metadata (a kilobyte driver read), probe, prune
  *     the code scan to the probed cells (a literal partition filter — the
  *     collected probe set is ≤ |queries| × nProbe cells), ADC-score, exact
  *     rerank. Work scales with the probed population, not the corpus.
  */
object IndexStore {

  /** Train on `df`, encode it, persist as a fresh index (full overwrite). */
  def build(spark: SparkSession, path: String, df: DataFrame,
            idCol: String, embCol: String, dim: Int, kCoarse: Int,
            coarseIters: Int, m: Int, ksub: Int, iters: Int,
            release: String): Unit = {
    val model = Similarity.ivfPqTrain(df, idCol, embCol, dim, kCoarse,
      coarseIters, m, ksub, iters)
    writeModel(spark, s"$path/meta", model)
    writeCodes(df, idCol, embCol, model, release, s"$path/codes",
      dynamic = false)
  }

  /** JVM-memoized [[build]] for READ-ONLY serving queries: the build is
    * fully deterministic in (corpus, params), so queries that only SERVE
    * from the same frozen index (q146/q156/q170/q175/q178/q182) share one
    * on-disk store per (tag, params) instead of each re-training it —
    * the production lifecycle (build once, serve many) instead of the
    * self-contained-harness artifact of ~8 s of quantizer re-training per
    * query. `tag` must uniquely name the corpus (the sf dir + the filter
    * applied); callers MUST NOT mutate the returned store — mutating
    * queries (append/rebalance/vacuum roll-forwards) build their own
    * private copies. Returns the store path. */
  def sharedBuild(spark: SparkSession, tag: String, df: => DataFrame,
                  idCol: String, embCol: String, dim: Int, kCoarse: Int,
                  coarseIters: Int, m: Int, ksub: Int, iters: Int,
                  release: String): String =
    sharedBuilds.computeIfAbsent(
      s"$tag|$idCol|$embCol|$dim|$kCoarse|$coarseIters|$m|$ksub|$iters|$release",
      _ => {
        val path = java.nio.file.Files
          .createTempDirectory("graft-shared-index").toString
        build(spark, path, df, idCol, embCol, dim, kCoarse, coarseIters,
          m, ksub, iters, release)
        path
      })

  private val sharedBuilds =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Encode a new release against the frozen quantizers and append it —
    * map-only over the new slice, idempotent per release. */
  def append(spark: SparkSession, path: String, newVecs: DataFrame,
             idCol: String, embCol: String, release: String): Unit =
    writeCodes(newVecs, idCol, embCol, readModel(spark, path), release,
      s"$path/codes", dynamic = true)

  /** Query-only serving: no training, no encoding — metadata load + probe +
    * cell-pruned ADC + exact rerank. `queries` is (q_id long, q_emb
    * array<double>); `fullVecs` (cand_id long, cand_emb array<double>)
    * supplies the rerank's full vectors (only |queries| × shortlist ids are
    * read from it, via broadcast joins). Identical answers to
    * [[Similarity.ivfPqTopK]] on the same corpus by construction — both run
    * [[Similarity.ivfPqServe]] on the same encode output. */
  def query(spark: SparkSession, path: String, queries: DataFrame,
            fullVecs: DataFrame, nProbe: Int, k: Int,
            shortlist: Int): DataFrame = {
    val model = readModel(spark, path)
    // The probed-cell set is ≤ |queries| × nProbe ints — collect it and
    // prune the code scan with a LITERAL partition filter, so only the
    // probed cells' directories are ever read (static pruning; no reliance
    // on runtime DPP). IndexStoreSpec pins the PartitionFilters in the plan.
    val probedCells = Similarity.ivfPqProbe(queries, model, nProbe)
      .select(col("cell")).distinct().collect().map(_.getInt(0)).sorted
    val enc = readCodes(spark, path)
      .where(col("cell").isin(probedCells.map(Int.box): _*))
    Similarity.ivfPqServe(queries, enc, fullVecs, model, nProbe, k, shortlist)
  }

  /** Eval-set decontamination served FROM the frozen index — the 100 TB
    * shape of q152: the corpus is never scanned; each eval vector probes its
    * `nProbe` cells, ADC-scores only their persisted codes (partition-pruned
    * scan), exact-reranks its top-`shortlist`, and every candidate at/above
    * `threshold` joins the drop list with its best eval match. Shortlist-
    * bounded by construction: a contaminated vector outside ALL of its eval
    * matches' ADC top-`shortlist` is missed — size `shortlist` to the
    * expected per-eval contamination count (the standard recall/cost dial
    * every ADC serving path has). Zero training jobs; work scales with the
    * probed population, exactly like [[query]]. */
  def decontaminate(spark: SparkSession, path: String, evals: DataFrame,
                    fullVecs: DataFrame, nProbe: Int, shortlist: Int,
                    threshold: Double): DataFrame = {
    val model = readModel(spark, path)
    val probedCells = Similarity.ivfPqProbe(evals, model, nProbe)
      .select(col("cell")).distinct().collect().map(_.getInt(0)).sorted
    val enc = readCodes(spark, path)
      .where(col("cell").isin(probedCells.map(Int.box): _*))
    Similarity.dropListFromMatches(
      Similarity.ivfPqServe(evals, enc, fullVecs, model, nProbe,
        k = shortlist, shortlist = shortlist),
      threshold)
  }

  /** Mutual-kNN graph served FROM the frozen index — the 100 TB shape of
    * the graph build: every encoded vector probes its cells, ADC-scores
    * only resident codes, exact-reranks its shortlist, and edges carry the
    * in-list rank plus the reciprocity flag. Unlike [[query]], the query
    * side IS the corpus: no literal cell-pruning win exists (every cell is
    * probed by someone) and nothing query-sided may broadcast — the ADC
    * pass is the plain cell-keyed equi-join of
    * [[graft.operators.Similarity.ivfPqGraphEdges]]. Zero training jobs;
    * work = Σ_cell probing-nodes × resident codes, the graph's inherent
    * cost under the frozen quantizer. */
  def knnGraph(spark: SparkSession, path: String, nodes: DataFrame,
               fullVecs: DataFrame, nProbe: Int, k: Int,
               shortlist: Int): DataFrame = {
    val model = readModel(spark, path)
    val edges = Similarity.ivfPqGraphEdges(nodes, readCodes(spark, path),
      fullVecs, model, nProbe, k, shortlist)
    val rev = edges.select(col("dst_id").as("src_id"),
      col("src_id").as("dst_id"), lit(1).as("__m"))
    edges.join(rev, Seq("src_id", "dst_id"), "left")
      .select(col("src_id"), col("dst_id"), col("score"), col("rank"),
        col("__m").isNotNull.as("mutual"))
  }

  /** One-row health VERDICT over the frozen store — the decision layer
    * between the q178 detector and the q181 fix: populated-cell count,
    * empty cells (vs the quantizer's kCoarse), extreme shares, and the
    * `needs_rebalance` flag (any empty cell, or a monster cell above
    * `maxShareMilli`). One cell-keyed count reduced to one row; the
    * policy is pure arithmetic on it. */
  def healthVerdict(spark: SparkSession, path: String, kCoarse: Int,
                    maxShareMilli: Long): DataFrame = {
    val codes = readCodes(spark, path)
    val tot = codes.agg(count(lit(1)).as("n_total"))
    codes.groupBy(col("cell")).agg(count(lit(1)).as("n_codes"))
      .crossJoin(broadcast(tot))
      .select(col("cell"), expr("div(n_codes * 1000, n_total)").as("share"))
      .agg(count(lit(1)).as("n_cells_populated"),
        max(col("share")).as("max_share_milli"),
        min(col("share")).as("min_share_milli"))
      // a COMPLETELY empty codes table is the most degenerate store of all:
      // the zero-row aggregates would yield null shares and a null flag —
      // coalesce to 0-shares and needs_rebalance = true so the empty store
      // trips the policy instead of NPE-ing downstream getBoolean reads
      .select(col("n_cells_populated"),
        (lit(kCoarse.toLong) - col("n_cells_populated")).as("n_empty_cells"),
        coalesce(col("max_share_milli"), lit(0L)).as("max_share_milli"),
        coalesce(col("min_share_milli"), lit(0L)).as("min_share_milli"),
        coalesce(col("max_share_milli") > maxShareMilli ||
          col("n_cells_populated") < kCoarse, lit(true)).as("needs_rebalance"))
  }

  /** Recall audit GRID over the frozen index: for every (nProbe, shortlist)
    * combo, the served top-`k` measured against the brute-force truth,
    * micro-averaged to one integer milli recall per combo (total hits /
    * total truth edges — deterministic, no per-query float averaging).
    * The q175 audit widened to the full dial surface. One serve pass per
    * combo — an audit is an offline sweep; each pass is the verified
    * cell-pruned [[query]] path. Output: (n_probe, shortlist, n_true,
    * n_hits, recall_milli), |grid| rows. */
  def recallAudit(spark: SparkSession, path: String, queries: DataFrame,
                  fullVecs: DataFrame, k: Int,
                  grid: Seq[(Int, Int)]): DataFrame = {
    require(grid.nonEmpty, "grid must be non-empty")
    val truth = Similarity.bruteForceTopK(queries, fullVecs, k)
      .select(col("q_id"), col("cand_id"))
    grid.map { case (p, s) =>
      val served = query(spark, path, queries, fullVecs, p, k, s)
        .select(col("q_id"), col("cand_id"), lit(1L).as("__hit"))
      truth.join(served, Seq("q_id", "cand_id"), "left")
        .agg(count(lit(1)).as("n_true"),
          coalesce(sum(col("__hit")), lit(0L)).as("n_hits"))
        .select(lit(p.toLong).as("n_probe"), lit(s.toLong).as("shortlist"),
          col("n_true"), col("n_hits"),
          expr("div(n_hits * 1000, n_true)").as("recall_milli"))
    }.reduce(_ unionByName _)
  }

  /** Close the loop between the recall audit and the serve path: for each
    * recall floor, the CHEAPEST audited dial meeting it — cost order
    * (n_probe asc, shortlist asc): the probed population dominates serve
    * cost, the shortlist only sizes the rerank. A floor no combo meets
    * falls back to the best-recall combo (cheapest among ties), flagged
    * `met = false` so the operator sees the floor is unreachable on this
    * grid. The audit frame is |grid| rows — kilobyte driver state, the
    * k-means-centroid idiom — so the argmin runs on the driver and the
    * result returns as literals. Output: (floor_milli, n_probe, shortlist,
    * recall_milli, met). */
  def recallDial(spark: SparkSession, path: String, queries: DataFrame,
                 fullVecs: DataFrame, k: Int, grid: Seq[(Int, Int)],
                 floors: Seq[Int]): DataFrame = {
    require(floors.nonEmpty, "floors must be non-empty")
    val audit = recallAudit(spark, path, queries, fullVecs, k, grid)
      .select("n_probe", "shortlist", "recall_milli").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val chosen = floors.map { f =>
      val meeting = audit.filter(_._3 >= f)
      if (meeting.nonEmpty) {
        val (p, s, rec) = meeting.minBy { case (p, s, _) => (p, s) }
        (f.toLong, p, s, rec, true)
      } else {
        val (p, s, rec) = audit.minBy { case (p, s, rec) => (-rec, p, s) }
        (f.toLong, p, s, rec, false)
      }
    }
    import spark.implicits._
    chosen.toDF("floor_milli", "n_probe", "shortlist", "recall_milli", "met")
  }

  /** Retention vacuum: delete the code partitions of every release `keep`
    * rejects — [[EavStore.vacuum]]'s contract on the (cell, release) layout
    * (quantizer metadata is release-independent and stays). Returns the
    * distinct dropped release names. A release append after a vacuum simply
    * re-encodes that release map-only. */
  def vacuum(spark: SparkSession, path: String,
             keep: String => Boolean): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(s"$path/codes")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else {
      val dropped = for {
        cell <- fs.listStatus(root).toSeq
        if cell.isDirectory && cell.getPath.getName.startsWith("cell=")
        rel <- fs.listStatus(cell.getPath).toSeq
        if rel.isDirectory && rel.getPath.getName.startsWith("release=")
        name = rel.getPath.getName.stripPrefix("release=")
        if !keep(name)
      } yield {
        // fs.delete reports failure by RETURNING false, not throwing — a
        // silently-failed delete must not be recorded as dropped
        require(fs.delete(rel.getPath, true),
          s"vacuum failed to delete ${rel.getPath}")
        name
      }
      dropped.distinct
    }
  }

  /** Rebalance a degenerate index (q178's detector found empty/monster
    * cells): retrain the coarse quantizer on the raw vectors — sampled by
    * `sampleMod` (deterministic id-mod sample, the repo's RNG-free idiom;
    * 1 = train on everything) — re-encode the RESIDENT population map-only
    * against the new frozen model, and atomically swap the new store in
    * (write-new + vacuum-old). Residual codebooks retrain with the coarse
    * quantizer by default (`retrainCodebooks = false` freezes the old
    * ones — cheaper, codes stay valid residual quantizers, just tuned to
    * the old cell geometry).
    *
    * Only vectors already resident in the store are re-encoded (each keeps
    * its release partition — the provenance survives the rebalance); new
    * vectors enter through [[append]] as always.
    *
    * Crash safety is the marker protocol: the new `meta.next`/`codes.next`
    * are fully written, then a `_SWAP_READY` marker commits the rebalance,
    * then the swap (delete old, rename next) runs. [[recover]] makes any
    * interruption converge: before the marker the old store is untouched
    * (stale `.next` dirs are deleted); after it the swap completes
    * idempotently. Serving reads are single-writer-nightly semantics, as
    * everywhere in this store family.
    *
    * Scale shape: ONE training job over the sample (kilobyte driver
    * state), one map-only encode of the corpus (model literals ride with
    * the plan) plus an id-keyed equi-join to carry each vector's release,
    * one partitioned write. Nothing pair-joins. */
  def rebalance(spark: SparkSession, path: String, vectors: DataFrame,
                idCol: String, embCol: String, kCoarse: Int,
                coarseIters: Int, pqIters: Int,
                retrainCodebooks: Boolean = true,
                sampleMod: Int = 1): Unit = {
    require(sampleMod >= 1, s"sampleMod must be >= 1, got $sampleMod")
    recover(spark, path) // converge any interrupted predecessor first
    val old = readModel(spark, path)
    val sample =
      if (sampleMod == 1) vectors
      else vectors.where(pmod(col(idCol).cast("long"), lit(sampleMod.toLong)) === 0)
    require(!sample.isEmpty,
      s"rebalance sample is empty (sampleMod=$sampleMod matches no ids) — " +
        "the retrained quantizer would be degenerate")
    // Coverage guard BEFORE the retrain: the re-encode below is an INNER
    // join against the resident id set, so a caller passing a partial
    // corpus would silently SHRINK the store. Fail loudly and fail fast —
    // every resident id must appear in `vectors` (an anti-join count;
    // rebalance is a rare nightly op, the extra job is noise next to the
    // retrain it gates).
    val relMap = readCodes(spark, path).select(col("cand_id"), col("release"))
    val uncovered = relMap.select(col("cand_id"))
      .join(vectors.select(col(idCol).cast("long").as("cand_id")),
        Seq("cand_id"), "left_anti")
    val nUncovered = uncovered.count()
    require(nUncovered == 0L,
      s"rebalance vectors frame is missing $nUncovered resident ids " +
        s"(e.g. ${uncovered.limit(5).collect().map(_.getLong(0)).mkString(", ")}) — " +
        "a partial corpus would silently shrink the store; pass every " +
        "resident vector (or vacuum the releases you mean to drop first)")
    val model =
      if (retrainCodebooks)
        Similarity.ivfPqTrain(sample, idCol, embCol, old.dim, kCoarse,
          coarseIters, old.m, old.codebooks(0).length, pqIters)
      else {
        val cents = Similarity.kMeansCentroids(sample, idCol, embCol,
          kCoarse, coarseIters)
        IvfPqModel(old.dim, cents, old.codebooks)
      }
    // resident population only, release provenance carried through
    val enc = Similarity.ivfPqEncode(
        vectors.select(col(idCol), col(embCol)), idCol, embCol, model)
      .join(relMap, Seq("cand_id"))
      .repartition(col("cell"), pmod(xxhash64(col("cand_id")),
        lit(EavStore.FilesPerPartition)))
    writeModel(spark, s"$path/meta.next", model)
    enc.write.mode("overwrite").partitionBy("cell", "release")
      .parquet(s"$path/codes.next")
    val fs = fsOf(spark, path)
    fs.create(new org.apache.hadoop.fs.Path(s"$path/$SwapMarker"), true).close()
    finishSwap(spark, path)
  }

  /** Converge an interrupted [[rebalance]]: with the `_SWAP_READY` marker
    * present the new store is complete — finish the swap; without it any
    * `.next` leftovers are an uncommitted attempt — delete them, leaving
    * the old store exactly as it was. Safe to call any time (no-op on a
    * healthy store). */
  def recover(spark: SparkSession, path: String): Unit = {
    val fs = fsOf(spark, path)
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$path/$SwapMarker")))
      finishSwap(spark, path)
    else
      Seq(s"$path/meta.next", s"$path/codes.next").foreach { p =>
        val hp = new org.apache.hadoop.fs.Path(p)
        if (fs.exists(hp)) require(fs.delete(hp, true), s"failed to delete $p")
      }
  }

  private val SwapMarker = "_SWAP_READY"

  private def fsOf(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The committed swap, each step idempotent so a crashed swap resumes:
    * for meta then codes — if `.next` exists, delete the old dir and
    * rename `.next` in; finally drop the marker. */
  private def finishSwap(spark: SparkSession, path: String): Unit = {
    val fs = fsOf(spark, path)
    Seq("meta", "codes").foreach { d =>
      val next = new org.apache.hadoop.fs.Path(s"$path/$d.next")
      val cur = new org.apache.hadoop.fs.Path(s"$path/$d")
      if (fs.exists(next)) {
        if (fs.exists(cur))
          require(fs.delete(cur, true), s"swap failed to delete $cur")
        require(fs.rename(next, cur), s"swap failed to rename $next")
      }
    }
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/$SwapMarker"), false)
    // both trees were delete+renamed — invalidate BOTH cached file listings
    // (a session that cached a FileIndex over the old meta parquet would
    // otherwise read deleted files or a stale model after the swap)
    spark.catalog.refreshByPath(s"$path/codes")
    spark.catalog.refreshByPath(s"$path/meta")
  }

  /** The persisted code table, schema-normalized: (cand_id, cell int,
    * codes array<int>, release). */
  def readCodes(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/codes")
      .select(col("cand_id").cast("long").as("cand_id"),
        col("cell").cast("int").as("cell"),
        col("codes").cast("array<int>").as("codes"),
        col("release").cast("string").as("release"))

  /** The frozen quantizers, reassembled from the meta files (one kilobyte
    * driver read; `dim` is inferred from the centroid rows). */
  def readModel(spark: SparkSession, path: String): IvfPqModel = {
    val cents = spark.read.parquet(s"$path/meta/centroids")
      .select(col("cell").cast("int"), col("cvec").cast("array<double>"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).map(_._2)
    require(cents.nonEmpty, s"empty centroid table at $path/meta/centroids")
    val cb = spark.read.parquet(s"$path/meta/codebooks")
      .select(col("sub").cast("int"), col("cluster").cast("int"),
        col("cvec").cast("array<double>"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3)).toArray
    IvfPqModel(cents.head.length, cents, cb)
  }

  /** `metaPath` is the meta DIRECTORY (normally `$path/meta`; the rebalance
    * writes its staged copy to `$path/meta.next`). */
  private def writeModel(spark: SparkSession, metaPath: String,
                         model: IvfPqModel): Unit = {
    import spark.implicits._
    model.centroids.zipWithIndex
      .map { case (cv, j) => (j, cv.toSeq) }.toSeq
      .toDF("cell", "cvec")
      .coalesce(1).write.mode("overwrite").parquet(s"$metaPath/centroids")
    model.codebooks.zipWithIndex.flatMap { case (sub, s) =>
      sub.zipWithIndex.map { case (cv, j) => (s, j, cv.toSeq) }
    }.toSeq.toDF("sub", "cluster", "cvec")
      .coalesce(1).write.mode("overwrite").parquet(s"$metaPath/codebooks")
  }

  /** One encode pass → cell/release-partitioned parquet. `dynamic = false`
    * (build) replaces the whole table; `dynamic = true` (append) replaces
    * only the written release's partitions. Files per (cell, release) are
    * bounded by the same small-files clamp as [[EavStore]]. */
  private def writeCodes(df: DataFrame, idCol: String, embCol: String,
                         model: IvfPqModel, release: String, codesPath: String,
                         dynamic: Boolean): Unit = {
    val enc = Similarity.ivfPqEncode(df, idCol, embCol, model)
      .withColumn("release", lit(release))
      .repartition(col("cell"), pmod(xxhash64(col("cand_id")),
        lit(EavStore.FilesPerPartition)))
    val w = enc.write.mode("overwrite")
    (if (dynamic) w.option("partitionOverwriteMode", "dynamic") else w)
      .partitionBy("cell", "release")
      .parquet(codesPath)
  }
}
