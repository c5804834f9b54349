package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Classifier, CorpusOps, Dedup, TextAnalysis}

/** Empirical scaling probe: run the heavy corpus operators on the documents
  * table at 1× and at `factor`× (id-remapped unioned copies, written to
  * parquet so both sizes read through the same scan path) and report the
  * time ratio. A healthy operator's ratio tracks the data ratio (≈ linear);
  * a pair-explosion or driver funnel shows up as a super-linear ratio long
  * before it would OOM a cluster. Prints one JSON line and writes
  * SCALE_PROBE.json.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.ScaleProbe [factor]
  */
object ScaleProbe {

  /** The operators worth probing: the ones whose cost could in principle
    * grow with pair counts rather than row counts. */
  private def ops(spark: SparkSession): Seq[(String, DataFrame => DataFrame)] = Seq(
    "corpus_build" -> (d =>
      graft.queries.TextQueries.corpusBuild(spark, d)),
    "quality_classifier" -> (d =>
      Classifier.trainScore(d, "doc_id", "text", col("lang") === "en",
        d = 256, iters = 2, lr = 0.5)),
    "exact_dedup" -> (d => Dedup.exactByContent(d, "doc_id", "text")),
    "minhash_pairs" -> (d => Dedup.minhashNearDups(d, "doc_id", "text",
      threshold = 0.5)),
    "block_dedup" -> (d => CorpusOps.dedupBlocks(d, "doc_id", "text", blockTokens = 3)),
    "bm25" -> (d => TextAnalysis.bm25(d, "doc_id", "text",
      Seq("vector", "merge", "window", "stream"))),
    "length_batches" -> (d => CorpusOps.lengthBucketBatches(d, "doc_id", "text",
      batchSize = 8, bounds = Seq(16, 32, 64, 128))),
    "bloom_decontaminate" -> (d => Dedup.bloomDecontaminate(d, "doc_id", "text",
      benchFilter = col("doc_id") % 1000 === 0, n = 6, minOverlaps = 2)),
    "span_scrub" -> (d => Dedup.scrubRepeatedSpans(d, "doc_id", "text", n = 8)),
    // same decision kernel as span_scrub plus the doc-keyed island window;
    // on the k×-copied corpus every position is covered (all text repeats),
    // so output rows grow ~k× and the window input is the covered set
    "maximal_spans" -> (d => Dedup.maximalRepeatedSpans(d, "doc_id", "text", n = 8)),
    // the trainer loop is vocabulary-sized (distinct words barely grow under
    // copying); only the w0 build and the final count join scan the corpus
    "bpe_tokens" -> (d => TextAnalysis.bpeTokenCounts(d, "doc_id", "text", rounds = 6)),
    // pair-emitting like minhash_pairs: 8 copies of every text form 8×8
    // cliques, so TRUE pair output grows ~k² and time should track the
    // output count, never the corpus pair space (the df cap only drops
    // shingles hot across >dfCap distinct docs)
    "containment" -> (d => Dedup.containmentPairs(d, "doc_id", "text",
      threshold = 0.8)),
    "novelty" -> (d => TextAnalysis.gramNovelty(d, "doc_id", "text", n = 8,
      isNew = col("doc_id") % 10 >= 8)),
    "release_drift" -> (d => TextAnalysis.tokenDrift(d, "text",
      isNew = col("doc_id") % 10 >= 8, k = 20)),
    "source_manifest" -> (d => CorpusOps.sourceManifest(d, "doc_id", "source")),
    // counts-only manifest: linear in documents, token volume never read
    "pack_manifest" -> (d => CorpusOps.packBoundaryManifest(
      d.select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n")),
      "doc_id", "n", budgetTokens = 512, nShards = 4)),
    // word-keyed broadcast join + source-keyed agg; the vocab trainer is
    // vocabulary-sized (distinct words barely grow under copying)
    "tokenizer_fertility" -> (d => TextAnalysis.tokenizerFertility(
      d, "doc_id", "text", "source",
      TextAnalysis.bpeVocab(d, "text", rounds = 6))),
    // histogram boundaries are score-cardinality driver state; the timed
    // work is one bounded aggregation + the shard-keyed position window
    "curriculum" -> (d => CorpusOps.curriculumShards(
      d.withColumn("q_milli",
        round(TextAnalysis.qualityScore(col("text"),
          Seq("the", "a", "of", "to", "in", "and")) * 1000d).cast("long")),
      "doc_id", "q_milli", phases = 4, nShards = 8)),
    "incremental_dedup" -> (d => {
      val isNew = col("doc_id") % 10 >= 8
      graft.pipeline.SignatureStore.incrementalNearDups(d.where(isNew),
        "doc_id", "text",
        graft.pipeline.SignatureStore.signatures(d.where(!isNew), "doc_id", "text"),
        d, threshold = 0.5)
    }),
    // scoring is per-row; the sweep itself is a |T|+1-bin histogram agg
    "threshold_sweep" -> (d => graft.operators.Classifier.thresholdSweep(
      d, "doc_id", "text", col("lang") === "en", col("doc_id") % 10 >= 8,
      256, iters = 2, lr = 0.5,
      thresholdsMicro = Seq(-2000000L, -500000L, 0L, 500000L, 2000000L))),
    // one source-keyed agg; the water-filling solve is |sources|-row driver
    // state, so time should track the aggregation alone
    "mixture_plan" -> (d => CorpusOps.mixturePlan(
      d.select(col("source"), TextAnalysis.tokenCount(col("text")).as("n")),
      "source", "n",
      weights = (0 until 20).map(i => s"src$i" -> (10L + (i * 37) % 90)).toMap,
      budgetPermille = 600, maxEpochsMilli = 1000)),
    // one shared offset window + |budgets|x map-side fan-out
    "pack_efficiency" -> (d => CorpusOps.packEfficiencySweep(
      d.select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n")),
      "doc_id", "n", budgets = Seq(128, 256, 512), nShards = 4)),
    // OUTPUT-BOUND under copying like minhash_pairs: the k x duplicated
    // corpus has ~k^2 more true near-dup pairs feeding the component step,
    // so read time ratio against the pair count, not the row count
    "cluster_split" -> (d => Dedup.clusterSplit(
      d, "doc_id", "text", threshold = 0.5)))

  /** Embedding-side probes. The query set is pinned to the ORIGINAL id range
    * on both runs (`vec_id <= origMax`) so the measurement isolates how cost
    * grows with the candidate corpus — letting the query set grow with the
    * copies would measure a quadratic |q|×n surface no serving path has. */
  private def embOps(origMax: Long): Seq[(String, DataFrame => DataFrame)] = Seq(
    "pq_ann" -> (e => graft.operators.Similarity.pqTopK(e, "vec_id",
      "embedding", col("vec_id") % 50 === 0 && col("vec_id") <= origMax,
      dim = 64, m = 16, ksub = 8, iters = 3, k = 5, shortlist = 100)),
    "top_component" -> (e => graft.operators.Similarity
      .topComponentProjections(e, "vec_id", "embedding", dim = 64, iters = 3)),
    // trainer is dim-sized driver state; the reflection itself is a pure map
    "opq_rotate" -> (e => graft.operators.Similarity
      .opqRotate(e, "vec_id", "embedding", dim = 64, iters = 3)),
    // cell-pruned ADC: the big-side join input is the probed cells'
    // (cand_id, cell, codes) rows, not the corpus — time should track the
    // probed population while the query set stays pinned
    "ivfpq_ann" -> (e => graft.operators.Similarity.ivfPqTopK(e, "vec_id",
      "embedding", col("vec_id") % 50 === 0 && col("vec_id") <= origMax,
      dim = 64, kCoarse = 8, coarseIters = 4, nProbe = 2,
      m = 16, ksub = 8, iters = 3, k = 5, shortlist = 100)),
    // eval set pinned to the original range; the copied corpus plants exact
    // eval duplicates (cosine 1.0), so the TRUE drop list grows ~k× while
    // cost tracks the probed cells' population — never eval × corpus
    "embed_decontaminate" -> (e => graft.operators.Similarity
      .ivfDecontaminate(e, "vec_id", "embedding", "label",
        col("vec_id") % 50 === 0 && col("vec_id") <= origMax,
        threshold = 0.3, nProbe = 2)),
    // kNN graph under the documented scaling discipline: CELL COUNT grows
    // with the corpus (each id-offset copy gets its own 10 cells via the
    // copy index), so per-node candidate work stays flat while nodes grow
    // k× — with FIXED cells the per-node population would grow k× and the
    // graph cost k²× (the dial IndexStore's kCoarse exists to turn)
    "knn_graph" -> (e => graft.operators.Similarity.knnGraph(
      e.withColumn("cell",
        col("label") + floor(col("vec_id") / lit(origMax + 1)).cast("long") * 10),
      "vec_id", "embedding", "cell", k = 3)),
    // incremental graph roll-forward (q176's shape): frozen old-slice
    // centroids; old nodes score only the new slice, new nodes the union.
    // Work = |V_old|·delta-in-cells + |new|·union-cells. The cell count
    // follows the documented √N dial (kCoarse ∝ √corpus, inferred from the
    // id range so the same lambda serves both probe sizes) — with fixed
    // cells the per-cell population would grow k× and the graph cost k²×
    "incremental_knn" -> { e =>
      val isNew = col("vec_id") % 10 >= 8
      val n = e.agg(max("vec_id")).head.getLong(0) + 1
      val kc = math.ceil(8 * math.sqrt(n.toDouble / (origMax + 1))).toInt
      val cents = graft.operators.Similarity.kMeansCentroids(
        e.where(!isNew), "vec_id", "embedding", kc, 4)
      def nodes(d: DataFrame) = d.select(col("vec_id").cast("long").as("q_id"),
        col("embedding").cast("array<double>").as("q_emb"))
      def cands(d: DataFrame) = d.select(col("vec_id").cast("long").as("cand_id"),
        col("embedding").cast("array<double>").as("cand_emb"))
      val prior = graft.operators.Similarity.ivfExactGraphEdges(
        nodes(e.where(!isNew)), cands(e.where(!isNew)), cents, 2, 3)
      val delta = graft.operators.Similarity.ivfExactGraphEdges(
        nodes(e.where(!isNew)), cands(e.where(isNew)), cents, 2, 3)
      val newEdges = graft.operators.Similarity.ivfExactGraphEdges(
        nodes(e.where(isNew)), cands(e), cents, 2, 3)
      graft.operators.Similarity.withMutualFlag(
        graft.operators.Similarity.mergeKnnEdges(prior, delta, 3)
          .unionByName(newEdges))
    },
    // query set pinned to the original range; brute-force ground truth is a
    // broadcast-queries linear scan, so time tracks the candidate corpus
    "ann_recall" -> { e =>
      val isQ = col("vec_id") % 50 === 0 && col("vec_id") <= origMax
      val ivf = graft.operators.Similarity.ivfTopK(e, "vec_id", "embedding",
          "label", isQ, k = 3)
        .select(col("q_id"), col("cand_id"), lit(1L).as("__hit"))
      graft.operators.Similarity.bruteForceTopK(
          e.where(isQ).select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
          e.select(col("vec_id").as("cand_id"), col("embedding").as("cand_emb")),
          k = 3)
        .join(ivf, Seq("q_id", "cand_id"), "left")
        .groupBy(col("q_id"))
        .agg(count(lit(1)).as("k_true"),
          coalesce(sum(col("__hit")), lit(0L)).as("n_hits"))
    },
    // greedy k-center: k map-only passes over the pool, each ending in a
    // bounded TakeOrdered top-1 — time should track the corpus linearly
    // with FIXED k (output is always k rows)
    "kcenter_select" -> (e => graft.operators.Retrieval.kCenterSelect(
      e, "vec_id", "embedding", k = 8)),
    // stratified k-center: one stratum-keyed shuffle + per-group local
    // greedy; labels stay fixed under copying while per-stratum pools grow
    // k×, so time should track the pool linearly (k·pool local work per
    // stratum) and output stays |strata|·k rows
    "kcenter_stratified" -> (e => graft.operators.Retrieval
      .kCenterPerStratum(e, "vec_id", "embedding", "label", k = 4)),
    // MMR: ONE corpus-sized pass (broadcast-1-query dot + bounded TopK
    // shortlist); the greedy rerank is ≤ n driver-local rows — time should
    // track the scan, output is always k rows
    "mmr_select" -> { e =>
      val q0 = e.where(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>").as("q_emb"))
      val pool = e.where(col("vec_id") =!= 0).join(broadcast(q0))
        .select(col("vec_id"), col("embedding"),
          round(graft.operators.Similarity.dot(col("embedding"),
            col("q_emb")), 3).as("rel"))
      graft.operators.Retrieval.mmrSelect(pool, "vec_id", "embedding",
        "rel", k = 8, n = 20)
    })

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = args.headOption.flatMap(_.toIntOption).getOrElse(8)
    require(factor >= 2, s"factor must be >= 2, got $factor")
    val spark = LocalSession.create()
    val src = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = src.count()

    // factor× corpus: id-remapped copies (distinct ids keep dedup semantics
    // honest — texts DO repeat across copies, which is exactly the hot case
    // for the dedup family). BOTH sizes are rewritten to temp parquet by the
    // same job shape so the two runs scan comparable file layouts — timing
    // the 1× side against the source file's original (possibly single-file)
    // layout would hand the big side extra scan parallelism for free.
    val tmp = java.nio.file.Files.createTempDirectory("scaleprobe").toString
    try {
      src.write.mode("overwrite").parquet(s"$tmp/docs_1x")
      val docs = spark.read.parquet(s"$tmp/docs_1x")
      // copies get ids past the source's max so they can never collide with
      // an original (a fixed stride would silently alias on a larger fixture)
      val off = src.agg(max("doc_id")).head.getLong(0) + 1
      val big = (0 until factor).map { k =>
        src.withColumn("doc_id", col("doc_id") + lit(k.toLong * off))
      }.reduce(_ unionByName _)
      big.write.mode("overwrite").parquet(s"$tmp/docs_big")
      val bigDocs = spark.read.parquet(s"$tmp/docs_big")

      def time(df: => DataFrame): Double = {
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }

      // Same copy-and-rewrite treatment for the embeddings table (the PQ
      // probe's corpus), ids offset past the original max.
      val esrc = spark.read.parquet(s"$sfDir/embeddings.parquet")
      esrc.write.mode("overwrite").parquet(s"$tmp/emb_1x")
      val embs = spark.read.parquet(s"$tmp/emb_1x")
      val eoff = esrc.agg(max("vec_id")).head.getLong(0) + 1
      (0 until factor).map { k =>
        esrc.withColumn("vec_id", col("vec_id") + lit(k.toLong * eoff))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$tmp/emb_big")
      val bigEmbs = spark.read.parquet(s"$tmp/emb_big")

      // Output rows are reported alongside time: for pair-emitting operators a
      // k×-duplicated corpus legitimately has ~k² more true pairs, so the
      // honest scaling signal is time ratio vs OUTPUT ratio, not row ratio.
      // optional 2nd arg: comma-separated op names to probe in isolation
      // (iterating on one operator's scale shape without paying the full
      // inventory; the round artifact still comes from an unfiltered run)
      val only = args.lift(1).map(_.split(",").toSet)
      val probes: Seq[(String, DataFrame, DataFrame, DataFrame => DataFrame)] =
        (ops(spark).map { case (n, op) => (n, docs, bigDocs, op) } ++
          embOps(eoff - 1).map { case (n, op) => (n, embs, bigEmbs, op) })
          .filter { case (n, _, _, _) => only.forall(_.contains(n)) }
      val results0 = probes.map { case (name, small, big, op) =>
        time(op(small)) // untimed warmup pass at 1x (codegen, listings)
        val t1 = time(op(small))
        val tf = time(op(big))
        val o1 = op(small).count()
        val of = op(big).count()
        (name, t1, tf, o1, of)
      }
      // Persisted-index serving (q146's lifecycle): the BUILD is untimed —
      // that is the whole point of persisting — and the timed op is the
      // query-only path (metadata load + probe + cell-pruned ADC + rerank)
      // against the frozen store. kCoarse scales with √N as the corpus
      // grows (FAISS practice: cells stay √N-sized), so the probed
      // population — the serve path's only corpus-dependent term — grows
      // √factor, not factor. Queries stay pinned to the original id range.
      val serveResults =
        if (!only.forall(_.contains("index_serve"))) Seq.empty
        else {
          def run(e: DataFrame, kCoarse: Int, tag: String): (Double, Long) = {
            val p = s"$tmp/index_$tag"
            graft.pipeline.IndexStore.build(spark, p, e, "vec_id", "embedding",
              dim = 64, kCoarse = kCoarse, coarseIters = 4, m = 16, ksub = 8,
              iters = 3, release = "r1")
            val qd = e.where(col("vec_id") % 50 === 0 && col("vec_id") < eoff)
              .select(col("vec_id").cast("long").as("q_id"),
                col("embedding").cast("array<double>").as("q_emb"))
            val fv = e.select(col("vec_id").cast("long").as("cand_id"),
              col("embedding").cast("array<double>").as("cand_emb"))
            def serve(): DataFrame = graft.pipeline.IndexStore.query(
              spark, p, qd, fv, nProbe = 2, k = 5, shortlist = 100)
            time(serve()) // untimed warmup (codegen, listings)
            (time(serve()), serve().count())
          }
          val (t1, o1) = run(embs, 8, "1x")
          val (tf, of) =
            run(bigEmbs, math.ceil(8 * math.sqrt(factor)).toInt, "big")
          Seq(("index_serve", t1, tf, o1, of))
        }
      // Int8-rerank serving (q188's lifecycle): build + rerank-tier build
      // untimed (persisted state); the timed op serves ENTIRELY from the
      // store — cell-pruned ADC + cell-pruned dequantized rerank, no raw
      // corpus access. Same √N kCoarse dial as index_serve; the claim under
      // probe is that removing the raw-vector dependency keeps the serve
      // exponent ~0 while cutting the rerank scan 4× at rest.
      val int8Results =
        if (!only.forall(_.contains("index_serve_int8"))) Seq.empty
        else {
          def run8(e: DataFrame, kCoarse: Int, tag: String): (Double, Long) = {
            val p = s"$tmp/index_i8$tag"
            graft.pipeline.IndexStore.build(spark, p, e, "vec_id", "embedding",
              dim = 64, kCoarse = kCoarse, coarseIters = 4, m = 16, ksub = 8,
              iters = 3, release = "r1")
            graft.pipeline.IndexStore.buildRerank(spark, p,
              e.select(col("vec_id").cast("long").as("cand_id"),
                col("embedding").cast("array<double>").as("cand_emb")))
            val qd = e.where(col("vec_id") % 50 === 0 && col("vec_id") < eoff)
              .select(col("vec_id").cast("long").as("q_id"),
                col("embedding").cast("array<double>").as("q_emb"))
            def serve(): DataFrame = graft.pipeline.IndexStore.queryInt8(
              spark, p, qd, nProbe = 2, k = 5, shortlist = 100)
            time(serve()) // untimed warmup (codegen, listings)
            (time(serve()), serve().count())
          }
          val (t1, o1) = run8(embs, 8, "1x")
          val (tf, of) =
            run8(bigEmbs, math.ceil(8 * math.sqrt(factor)).toInt, "big")
          Seq(("index_serve_int8", t1, tf, o1, of))
        }
      // Index-served kNN graph (q170's lifecycle): build untimed against the
      // same √N-scaled cell counts; the timed op is the all-nodes batch-ADC
      // graph pass. Per-node work = probed cells' population ~ N/kCoarse,
      // so with kCoarse ∝ √N total graph cost grows ~ factor^1.5 — the
      // inherent graph-build surface, not a plan defect; output (k·N edges)
      // grows linearly.
      val graphResults =
        if (!only.forall(_.contains("index_knn"))) Seq.empty
        else {
          def runGraph(e: DataFrame, kCoarse: Int, tag: String): (Double, Long) = {
            val p = s"$tmp/index_g$tag"
            graft.pipeline.IndexStore.build(spark, p, e, "vec_id", "embedding",
              dim = 64, kCoarse = kCoarse, coarseIters = 4, m = 16, ksub = 8,
              iters = 3, release = "r1")
            val nodes = e.select(col("vec_id").cast("long").as("q_id"),
              col("embedding").cast("array<double>").as("q_emb"))
            val fv = e.select(col("vec_id").cast("long").as("cand_id"),
              col("embedding").cast("array<double>").as("cand_emb"))
            def g(): DataFrame = graft.pipeline.IndexStore.knnGraph(
              spark, p, nodes, fv, nProbe = 2, k = 3, shortlist = 50)
            time(g()) // untimed warmup
            (time(g()), g().count())
          }
          val (t1, o1) = runGraph(embs, 8, "1x")
          val (tf, of) =
            runGraph(bigEmbs, math.ceil(8 * math.sqrt(factor)).toInt, "big")
          Seq(("index_knn", t1, tf, o1, of))
        }
      // Vector-tier nightly roll-forward (q180's lifecycle): persisted state
      // (frozen index on the prior corpus + prior edge list) is built
      // UNTIMED — that is what persistence buys — and the timed op is the
      // one nightly call: map-only append of a FIXED-SIZE delta (pinned to
      // the original id range), graph merge, index-served drop list. The
      // claim under probe: per-night cost tracks the delta and the graph's
      // inherent merge surface, never re-encoding or re-pairing the prior
      // corpus with itself. kCoarse ∝ √N as in the other index probes.
      val vrelResults =
        if (!only.forall(_.contains("vector_release"))) Seq.empty
        else {
          def runVrel(e: DataFrame, kCoarse: Int, tag: String): (Double, Long) = {
            val isEval = col("vec_id") % 50 === 0
            // delta pinned to the ORIGINAL range's new slice; the prior
            // corpus (old slices of every copy + copies' new slices) grows
            // with the factor — the nightly steady state
            val isDelta = col("vec_id") % 10 >= 8 && col("vec_id") < eoff
            val old = e.where(!isEval && !isDelta)
            val fresh = e.where(!isEval && isDelta)
            val p = s"$tmp/vrel_$tag"
            graft.pipeline.IndexStore.build(spark, p, old, "vec_id",
              "embedding", dim = 64, kCoarse = kCoarse, coarseIters = 4,
              m = 16, ksub = 8, iters = 3, release = "r1")
            val model = graft.pipeline.IndexStore.readModel(spark, p)
            def nodes(d: DataFrame) = d.select(
              col("vec_id").cast("long").as("q_id"),
              col("embedding").cast("array<double>").as("q_emb"))
            val prior = graft.operators.Similarity.ivfExactGraphEdges(
                nodes(old), old.select(col("vec_id").cast("long").as("cand_id"),
                  col("embedding").cast("array<double>").as("cand_emb")),
                model.centroids, 2, 3)
              .localCheckpoint() // persisted state, not part of the night
            val evals = nodes(e.where(isEval && col("vec_id") < eoff))
            def night(): DataFrame = graft.pipeline.VectorRelease.rollForward(
              spark, p, fresh, old, evals, prior, "vec_id", "embedding", "r2")
            time(night()) // untimed warmup
            (time(night()), night().count())
          }
          val (t1, o1) = runVrel(embs, 8, "1x")
          val (tf, of) =
            runVrel(bigEmbs, math.ceil(8 * math.sqrt(factor)).toInt, "big")
          Seq(("vector_release", t1, tf, o1, of))
        }
      // UNIFIED nightly maintenance (q186's lifecycle): the vector_release
      // fixture plus a seeded int8 rerank tier, run through the ONE
      // maintain call. Claim under probe: a HEALTHY maintained night costs
      // the rollForward shape plus only a kilobyte verdict and a
      // delta-sized tier append — same exponent as vector_release, the
      // composition adds no corpus-sized term. Verdict target = the
      // store's own populated-cell count with a never-tripping share cap,
      // so the probed branch is deterministically the healthy one.
      val mntResults =
        if (!only.forall(_.contains("index_maintain"))) Seq.empty
        else {
          def runMnt(e: DataFrame, kCoarse: Int, tag: String): (Double, Long) = {
            val isEval = col("vec_id") % 50 === 0
            val isDelta = col("vec_id") % 10 >= 8 && col("vec_id") < eoff
            val old = e.where(!isEval && !isDelta)
            val fresh = e.where(!isEval && isDelta)
            val p = s"$tmp/mnt_$tag"
            graft.pipeline.IndexStore.build(spark, p, old, "vec_id",
              "embedding", dim = 64, kCoarse = kCoarse, coarseIters = 4,
              m = 16, ksub = 8, iters = 3, release = "r1")
            def nodes(d: DataFrame) = d.select(
              col("vec_id").cast("long").as("q_id"),
              col("embedding").cast("array<double>").as("q_emb"))
            def cands(d: DataFrame) = d.select(
              col("vec_id").cast("long").as("cand_id"),
              col("embedding").cast("array<double>").as("cand_emb"))
            graft.pipeline.IndexStore.buildRerank(spark, p, cands(old))
            val model = graft.pipeline.IndexStore.readModel(spark, p)
            val prior = graft.operators.Similarity.ivfExactGraphEdges(
                nodes(old), cands(old), model.centroids, 2, 3)
              .localCheckpoint() // persisted state, not part of the night
            val evals = nodes(e.where(isEval && col("vec_id") < eoff))
            // Lloyd's may leave a target cell empty at any scale; the
            // healthy-branch claim needs a verdict that cannot trip
            val kcPop = graft.pipeline.IndexStore.readCodes(spark, p)
              .select("cell").distinct().count().toInt
            def night(): DataFrame = graft.pipeline.VectorRelease.maintain(
              spark, p, fresh, old, evals, prior, "vec_id", "embedding",
              "r2", kCoarse = kcPop, maxShareMilli = 1000)
            time(night()) // untimed warmup
            (time(night()), night().count())
          }
          val (t1, o1) = runMnt(embs, 8, "1x")
          val (tf, of) =
            runMnt(bigEmbs, math.ceil(8 * math.sqrt(factor)).toInt, "big")
          Seq(("index_maintain", t1, tf, o1, of))
        }
      // Store compaction (round 10): persisted fixture = prior corpus as
      // r1 (grows with the factor) plus a FIXED delta appended as r2; the
      // timed op compacts ONLY the r2 batch, code table and int8 tier
      // together. Claim under probe: compact cost tracks the targeted
      // batch plus the partition listing (cells ∝ √N), never the resident
      // store — the rewrite reads and writes only the batch's partitions.
      val cptResults =
        if (!only.forall(_.contains("index_compact"))) Seq.empty
        else {
          def runCpt(e: DataFrame, kCoarse: Int, tag: String): (Double, Long) = {
            val isDelta = col("vec_id") % 10 >= 8 && col("vec_id") < eoff
            val old = e.where(!isDelta)
            val fresh = e.where(isDelta)
            val p = s"$tmp/cpt_$tag"
            graft.pipeline.IndexStore.build(spark, p, old, "vec_id",
              "embedding", dim = 64, kCoarse = kCoarse, coarseIters = 4,
              m = 16, ksub = 8, iters = 3, release = "r1")
            def cands(d: DataFrame) = d.select(
              col("vec_id").cast("long").as("cand_id"),
              col("embedding").cast("array<double>").as("cand_emb"))
            graft.pipeline.IndexStore.buildRerank(spark, p, cands(old))
            graft.pipeline.IndexStore.append(spark, p, fresh, "vec_id",
              "embedding", "r2")
            graft.pipeline.IndexStore.appendRerank(spark, p,
              cands(fresh), "r2")
            def cpt(): Double = {
              val t0 = System.nanoTime()
              graft.pipeline.IndexStore.compact(spark, p, _ == "r2")
              (System.nanoTime() - t0) / 1e9
            }
            cpt() // untimed warmup (listings, codegen); rewrite idempotent
            (cpt(), fresh.count())
          }
          val (t1, o1) = runCpt(embs, 8, "1x")
          val (tf, of) =
            runCpt(bigEmbs, math.ceil(8 * math.sqrt(factor)).toInt, "big")
          Seq(("index_compact", t1, tf, o1, of))
        }
      // Takedown lifecycle (q201/q204, round 10): persisted fixture = the
      // corpus as a frozen store + int8 tier; the takedown batch is FIXED
      // across factors (requests don't grow with the corpus). Two claims
      // under probe: (a) tombstone_serve — serving with a pending blocklist
      // costs what index_serve costs (the exclusion is one broadcast hash
      // probe on the pruned scan, exponent ~0 like the plain serve);
      // (b) takedown_purge — physical reclamation's rewrite is bounded by
      // the batch's partitions; the discovery semi-join scans only the
      // compact code table's id/partition columns, so growth tracks the
      // code-table scan, never the raw corpus.
      val tkdResults =
        if (!only.forall(s => s.contains("tombstone_serve") ||
            s.contains("takedown_purge"))) Seq.empty
        else {
          def runTkd(e: DataFrame, kCoarse: Int,
                     tag: String): ((Double, Long), (Double, Long)) = {
            val p = s"$tmp/tkd_$tag"
            graft.pipeline.IndexStore.build(spark, p, e, "vec_id",
              "embedding", dim = 64, kCoarse = kCoarse, coarseIters = 4,
              m = 16, ksub = 8, iters = 3, release = "r1")
            graft.pipeline.IndexStore.buildRerank(spark, p,
              e.select(col("vec_id").cast("long").as("cand_id"),
                col("embedding").cast("array<double>").as("cand_emb")))
            def batch(m: Int) = e
              .where(col("vec_id") < eoff && col("vec_id") % 97 === m)
              .select(col("vec_id").cast("long").as("cand_id"))
            val qd = e.where(col("vec_id") % 50 === 0 && col("vec_id") < eoff)
              .select(col("vec_id").cast("long").as("q_id"),
                col("embedding").cast("array<double>").as("q_emb"))
            val fv = e.select(col("vec_id").cast("long").as("cand_id"),
              col("embedding").cast("array<double>").as("cand_emb"))
            graft.pipeline.IndexStore.delete(spark, p, batch(3))
            def serve(): DataFrame = graft.pipeline.IndexStore.query(
              spark, p, qd, fv, nProbe = 2, k = 5, shortlist = 100)
            time(serve()) // untimed warmup (codegen, listings)
            val serveRes = (time(serve()), serve().count())
            def purgeT(): Double = {
              val t0 = System.nanoTime()
              graft.pipeline.IndexStore.purge(spark, p)
              (System.nanoTime() - t0) / 1e9
            }
            purgeT() // warmup purge realizes the first batch (a real rewrite)
            val nB = graft.pipeline.IndexStore.delete(spark, p, batch(7))
            (serveRes, (purgeT(), nB))
          }
          val (s1, p1) = runTkd(embs, 8, "1x")
          val (sf, pf) =
            runTkd(bigEmbs, math.ceil(8 * math.sqrt(factor)).toInt, "big")
          Seq(("tombstone_serve", s1._1, sf._1, s1._2, sf._2),
            ("takedown_purge", p1._1, pf._1, p1._2, pf._2))
        }
      // UNIFIED CROSS-TIER TAKEDOWN NIGHT (q206): persisted fixture = the
      // prior-night TEXT stores (signature + gram, the prior corpus split
      // into ONE RELEASE PER COPY so the affected-release construction
      // scales with the corpus: 1 release at 1×, `factor` at factor×) and
      // the prior-night VECTOR store + graph (single release, the runMnt
      // shape). The timed op is one whole night on a filesystem clone of
      // that state (the q206 per-pass-clone idiom — the night MUTATES the
      // stores, so warmup and timed runs each get a pristine clone; clones
      // untimed): text takedown (exact signature delete + gram restore
      // BOUNDED by the one affected release, r0) → text roll-forward →
      // vector metadata delete → takedown-aware maintain → cross-tier
      // manifest gate. Takedown batch and night delta both PINNED to the
      // original id range (requests and nightly crawls don't grow with the
      // resident corpus); kCoarse ∝ √N. Claim under probe: the composed
      // night holds the maintain family's ~0.5 exponent — the text tier
      // adds only compact-store-keyed scans (~200 B/doc signatures, hashed
      // gram longs) and a one-release-bounded restore, never a corpus-text
      // term.
      val utkResults =
        if (!only.forall(_.contains("unified_takedown"))) Seq.empty
        else {
          // frozen prior classifier, trained once on the ORIGINAL old docs
          // (persisted nightly state; identical at both factors)
          val utkW = Classifier.denseWeights(Classifier.trainWeights(
            docs.where(col("doc_id") % 10 < 8), "doc_id", "text",
            col("lang") === "en", d = 256, iters = 2, lr = 0.5), 256)
          def cloneFs(src: String, dst: String): String = {
            val conf = spark.sparkContext.hadoopConfiguration
            val sp = new org.apache.hadoop.fs.Path(src)
            val fs = sp.getFileSystem(conf)
            org.apache.hadoop.fs.FileUtil.copy(fs, sp, fs,
              new org.apache.hadoop.fs.Path(dst), false, conf)
            dst
          }
          def runUtk(d: DataFrame, e: DataFrame, kCoarse: Int, nRel: Int,
                     tag: String): (Double, Long) = {
            val base = s"$tmp/utk_$tag"
            // --- persisted prior-night fixture (untimed) ---
            // the prior TEXT corpus is every copy's OLD slice: keeping the
            // copies' new slices in the store would make the pinned delta
            // (the originals' new slice) an exact duplicate of copy 1's
            // and the roll-forward would rightly dedup the whole night
            // away — an empty manifest measures nothing
            val isNewDoc = col("doc_id") % 10 >= 8
            val isDeltaDoc = isNewDoc && col("doc_id") < off
            val priorDocs = d.where(!isNewDoc)
            for (k <- 0 until nRel) {
              val slice = priorDocs.where(
                col("doc_id") >= k.toLong * off &&
                  col("doc_id") < (k.toLong + 1) * off)
              graft.pipeline.SignatureStore.append(spark,
                s"$base/prior/sigs", s"r$k", slice, "doc_id", "text")
              graft.pipeline.GramStore.append(spark,
                s"$base/prior/grams", s"r$k", slice, "text")
            }
            val isEval = col("vec_id") % 50 === 0
            val isDeltaVec = col("vec_id") % 10 >= 8 && col("vec_id") < eoff
            val oldV = e.where(!isEval && !isDeltaVec)
            val freshV = e.where(!isEval && isDeltaVec)
            graft.pipeline.IndexStore.build(spark, s"$base/prior/store",
              oldV, "vec_id", "embedding", dim = 64, kCoarse = kCoarse,
              coarseIters = 4, m = 16, ksub = 8, iters = 3, release = "r1")
            def nodes(x: DataFrame) = x.select(
              col("vec_id").cast("long").as("q_id"),
              col("embedding").cast("array<double>").as("q_emb"))
            def cands(x: DataFrame) = x.select(
              col("vec_id").cast("long").as("cand_id"),
              col("embedding").cast("array<double>").as("cand_emb"))
            // seed the int8 rerank tier (untimed, the runMnt convention) so
            // the night's vector side IS the q186 kernel — tier purge,
            // frozen-stats delta append and the parity gate included
            graft.pipeline.IndexStore.buildRerank(spark,
              s"$base/prior/store", cands(oldV))
            val model =
              graft.pipeline.IndexStore.readModel(spark, s"$base/prior/store")
            val prior = graft.operators.Similarity.ivfExactGraphEdges(
                nodes(oldV), cands(oldV), model.centroids, 2, 3)
              .localCheckpoint() // persisted state, not part of the night
            val evals = nodes(e.where(isEval && col("vec_id") < eoff))
            // healthy-branch verdict target (the runMnt convention)
            val kcPop = graft.pipeline.IndexStore
              .readCodes(spark, s"$base/prior/store")
              .select("cell").distinct().count().toInt
            // --- the night, on a pristine clone (the q206 idiom) ---
            val tombDocs = d.where(col("doc_id") % 97 === 3 &&
              col("doc_id") < off)
            val tombVecs = e.where(col("vec_id") % 97 === 3 &&
              col("vec_id") < eoff)
            var runIdx = 0
            def night(): (Double, Long) = {
              runIdx += 1
              val root = cloneFs(s"$base/prior", s"$base/run$runIdx")
              val t0 = System.nanoTime()
              graft.pipeline.ReleaseBuild.takedownDocs(spark, s"$root/sigs",
                s"$root/grams", tombDocs.select(col("doc_id")),
                d.where(col("doc_id") % 97 =!= 3), "doc_id", "text")
              val manifest = graft.pipeline.ReleaseBuild.rollForwardOnDisk(
                spark, d.where(isDeltaDoc && col("doc_id") % 97 =!= 3),
                "doc_id", "text", "source",
                d.where(col("doc_id") % 97 =!= 3), s"$root/sigs",
                s"$root/grams", "night", utkW)
              graft.pipeline.IndexStore.delete(spark, s"$root/store",
                tombVecs.select(col("vec_id").as("cand_id")))
              val nightDf = graft.pipeline.VectorRelease.maintain(spark,
                s"$root/store", freshV, oldV, evals, prior, "vec_id",
                "embedding", "r2", kCoarse = kcPop, maxShareMilli = 1000)
              val drops = nightDf.where(col("dropped"))
                .select(col("src_id").as("doc_id")).distinct()
              val res = manifest.join(broadcast(drops), Seq("doc_id"),
                "left_anti")
              res.write.mode("overwrite").format("noop").save()
              ((System.nanoTime() - t0) / 1e9, res.count())
            }
            night() // untimed warmup clone (codegen, listings)
            night()
          }
          val (t1, o1) = runUtk(docs, embs, 8, 1, "1x")
          val (tf, of) = runUtk(bigDocs, bigEmbs,
            math.ceil(8 * math.sqrt(factor)).toInt, factor, "big")
          Seq(("unified_takedown", t1, tf, o1, of))
        }
      // Store integrity audit (q207): persisted fixture = signature + gram
      // stores over the corpus; the card is one store-sized groupBy, an
      // id-keyed dup check and an anti-join vs the universe — every piece
      // keyed on the id, so time should track the store scan (~linear in
      // rows; the gram store grows sub-linearly under copying because
      // repeated text adds no new grams).
      val auditResults =
        if (!only.forall(_.contains("store_audit"))) Seq.empty
        else {
          def runAudit(d: DataFrame, tag: String): (Double, Long) = {
            val p = s"$tmp/audit_$tag"
            val isNew = col("doc_id") % 10 >= 8
            graft.pipeline.SignatureStore.append(spark, s"$p/sigs", "r1",
              d.where(!isNew), "doc_id", "text")
            graft.pipeline.SignatureStore.append(spark, s"$p/sigs", "r2",
              d.where(isNew), "doc_id", "text")
            graft.pipeline.GramStore.append(spark, s"$p/grams", "r1",
              d.where(!isNew), "text")
            graft.pipeline.GramStore.append(spark, s"$p/grams", "r2",
              d.where(isNew), "text")
            def card(): DataFrame = graft.pipeline.StoreAudit.card(
                "signatures",
                graft.pipeline.SignatureStore.read(spark, s"$p/sigs"),
                "doc_id", d.select("doc_id"))
              .unionByName(graft.pipeline.StoreAudit.card("grams",
                graft.pipeline.GramStore.read(spark, s"$p/grams"),
                "gram_h", graft.pipeline.GramStore.grams(d, "text")))
            time(card()) // untimed warmup
            (time(card()), card().count())
          }
          val a1 = runAudit(docs, "1x")
          val af = runAudit(bigDocs, "big")
          Seq(("store_audit", a1._1, af._1, a1._2, af._2))
        }
      // VECTOR-tier audit-driven repair (q208): persisted fixture = frozen
      // store + int8 tier with the prior corpus as r1 and a FIXED delta as
      // r2; the fault injection (untimed) tears r2 out of the rerank tier
      // — the one-tier-rewritten divergence. The timed op is the
      // operational loop: DETECT (the code↔int8 parity card), REPAIR
      // (IndexStore.repairRelease — drop r2's partitions in both tiers,
      // map-only re-encode of the FIXED delta slice), VERIFY (card to
      // zero). Claim under probe: repair itself is release-bounded, so
      // growth tracks the two cards' store-sized keyed scans alone — the
      // store_audit shape, inside the maintain family's band.
      val repairResults =
        if (!only.forall(_.contains("store_repair"))) Seq.empty
        else {
          def runRep(e: DataFrame, kCoarse: Int, tag: String): (Double, Long) = {
            val isDelta = col("vec_id") % 10 >= 8 && col("vec_id") < eoff
            val old = e.where(!isDelta)
            val fresh = e.where(isDelta)
            val p = s"$tmp/rep_$tag"
            graft.pipeline.IndexStore.build(spark, p, old, "vec_id",
              "embedding", dim = 64, kCoarse = kCoarse, coarseIters = 4,
              m = 16, ksub = 8, iters = 3, release = "r1")
            def cands(d: DataFrame) = d.select(
              col("vec_id").cast("long").as("cand_id"),
              col("embedding").cast("array<double>").as("cand_emb"))
            graft.pipeline.IndexStore.buildRerank(spark, p, cands(old))
            graft.pipeline.IndexStore.append(spark, p, fresh, "vec_id",
              "embedding", "r2")
            graft.pipeline.IndexStore.appendRerank(spark, p, cands(fresh), "r2")
            val fs = new org.apache.hadoop.fs.Path(p)
              .getFileSystem(spark.sparkContext.hadoopConfiguration)
            def tear(): Unit = {
              val root = new org.apache.hadoop.fs.Path(s"$p/rerank/codes")
              fs.listStatus(root)
                .filter(st => st.isDirectory &&
                  st.getPath.getName.startsWith("cell="))
                .map(st =>
                  new org.apache.hadoop.fs.Path(st.getPath, "release=r2"))
                .filter(fs.exists)
                .foreach(x => require(fs.delete(x, true), s"tear failed: $x"))
              spark.catalog.refreshByPath(s"$p/rerank/codes")
            }
            def parity = graft.pipeline.StoreAudit.card("rerank_int8",
              graft.pipeline.IndexStore.readRerankCodes(spark, p), "cand_id",
              graft.pipeline.IndexStore.readCodes(spark, p)
                .select("cand_id", "release"))
            def loop(): Double = {
              tear() // fault injection, untimed
              val t0 = System.nanoTime()
              require(parity.agg(sum("missing")).head.getLong(0) > 0,
                "the tear must be detectable")
              graft.pipeline.IndexStore.repairRelease(spark, p, fresh,
                "vec_id", "embedding", "r2")
              graft.pipeline.StoreAudit.assertZero(parity,
                Seq("cross_release_dup", "orphan", "missing"),
                "store_repair probe")
              (System.nanoTime() - t0) / 1e9
            }
            loop() // untimed warmup (codegen, listings)
            (loop(), fresh.count())
          }
          val (t1, o1) = runRep(embs, 8, "1x")
          val (tf, of) =
            runRep(bigEmbs, math.ceil(8 * math.sqrt(factor)).toInt, "big")
          Seq(("store_repair", t1, tf, o1, of))
        }
      // TEXT-tier audit-driven repair (q209): persisted fixture = the
      // signature + gram stores with the prior corpus as r1 and a FIXED
      // delta as r2; the fault injection tears r2 out of BOTH stores. The
      // timed loop: DETECT (the two q207 cards), REPAIR
      // (ReleaseBuild.repairRelease — re-sign the fixed slice, re-derive
      // its novel gram margin against the rest of the store), VERIFY
      // (cards to zero). Claim under probe: the repair's own work is
      // release-bounded (fixed slice + a gram-keyed anti-join), so growth
      // tracks the cards' store-keyed scans — the store_audit shape.
      val textRepairResults =
        if (!only.forall(_.contains("text_repair"))) Seq.empty
        else {
          def runTrep(d: DataFrame, tag: String): (Double, Long) = {
            val p = s"$tmp/trep_$tag"
            val isNew = col("doc_id") % 10 >= 8
            val isDelta = isNew && col("doc_id") < off
            val prior = d.where(!isNew)
            val delta = d.where(isDelta)
            graft.pipeline.SignatureStore.append(spark, s"$p/sigs", "r1",
              prior, "doc_id", "text")
            graft.pipeline.SignatureStore.append(spark, s"$p/sigs", "r2",
              delta, "doc_id", "text")
            graft.pipeline.GramStore.append(spark, s"$p/grams", "r1",
              prior, "text")
            graft.pipeline.GramStore.append(spark, s"$p/grams", "r2",
              delta, "text")
            val universe = prior.select(col("doc_id"),
                lit("r1").as("release"))
              .unionByName(delta.select(col("doc_id"), lit("r2").as("release")))
            val stored = d.where(!isNew || isDelta)
            val fs = new org.apache.hadoop.fs.Path(p)
              .getFileSystem(spark.sparkContext.hadoopConfiguration)
            def tear(): Unit = {
              Seq(s"$p/sigs/release=r2", s"$p/grams/release=r2").foreach { x =>
                require(fs.delete(new org.apache.hadoop.fs.Path(x), true),
                  s"tear failed: $x")
              }
              spark.catalog.refreshByPath(s"$p/sigs")
              spark.catalog.refreshByPath(s"$p/grams")
            }
            def cards = graft.pipeline.StoreAudit.card("signatures",
                graft.pipeline.SignatureStore.read(spark, s"$p/sigs"),
                "doc_id", universe)
              .unionByName(graft.pipeline.StoreAudit.card("grams",
                graft.pipeline.GramStore.read(spark, s"$p/grams"),
                "gram_h", graft.pipeline.GramStore.grams(stored, "text")))
            def loop(): Double = {
              tear() // fault injection, untimed
              val t0 = System.nanoTime()
              require(cards.agg(sum("missing")).head.getLong(0) > 0,
                "the tear must be detectable")
              graft.pipeline.ReleaseBuild.repairRelease(spark, s"$p/sigs",
                s"$p/grams", delta, "doc_id", "text", "r2")
              spark.catalog.refreshByPath(s"$p/sigs")
              spark.catalog.refreshByPath(s"$p/grams")
              graft.pipeline.StoreAudit.assertZero(cards,
                Seq("cross_release_dup", "orphan", "missing"),
                "text_repair probe")
              (System.nanoTime() - t0) / 1e9
            }
            loop() // untimed warmup (codegen, listings)
            (loop(), delta.count())
          }
          val a1 = runTrep(docs, "1x")
          val af = runTrep(bigDocs, "big")
          Seq(("text_repair", a1._1, af._1, a1._2, af._2))
        }
      // Hybrid RRF (q191's shape): both arms scan their corpus once (BM25
      // aggregation chain / broadcast-1-query dot map) and collapse to ≤n
      // rows via the bounded top-k aggregate BEFORE fusion, so the fusion
      // itself is constant-size work — time should track the two linear
      // scans, output stays ≤ 2n rows at any factor.
      val hybridResults =
        if (!only.forall(_.contains("hybrid_rrf"))) Seq.empty
        else {
          def hybrid(d: DataFrame, e: DataFrame): DataFrame = {
            val lex = TextAnalysis.bm25(d, "doc_id", "text",
              Seq("vector", "merge", "window", "stream"))
            val q0 = e.where(col("vec_id") === 0)
              .select(col("embedding").cast("array<double>").as("q_emb"))
            val vec = e.where(col("vec_id") =!= 0)
              .join(broadcast(q0))
              .select(col("vec_id").as("doc_id"),
                round(graft.operators.Similarity.dot(col("embedding"),
                  col("q_emb")), 3).as("score"))
            graft.operators.Retrieval.rrfFuse(lex, vec, "doc_id",
              n = 20, rrfK = 60)
          }
          time(hybrid(docs, embs)) // untimed warmup
          val t1 = time(hybrid(docs, embs))
          val tf = time(hybrid(bigDocs, bigEmbs))
          Seq(("hybrid_rrf", t1, tf,
            hybrid(docs, embs).count(), hybrid(bigDocs, bigEmbs).count()))
        }
      val results = results0 ++ serveResults ++ int8Results ++
        graphResults ++ vrelResults ++ mntResults ++ cptResults ++
        tkdResults ++ utkResults ++ auditResults ++ repairResults ++
        textRepairResults ++ hybridResults
      val qs = results.map { case (name, t1, tf, o1, of) =>
        f""""$name":{"t1":$t1%.3f,"t$factor":$tf%.3f,"ratio":${tf / t1}%.2f,""" +
          s""""out1":$o1,"out$factor":$of}"""
      }.mkString("{", ",", "}")
      val line =
        s"""{"metric":"scale_probe","rows":$n,"factor":$factor,"ops":$qs}"""
      println(line)
      // a filtered probe is a scratch measurement — never let it clobber
      // the full-inventory round artifact
      if (only.isEmpty)
        java.nio.file.Files.write(java.nio.file.Paths.get("SCALE_PROBE.json"),
          (line + "\n").getBytes("UTF-8"))
    } finally {
      spark.stop()
      // the temp corpus is factor× the documents table — leaving it behind
      // (e.g. after a mid-probe failure) accumulates orphaned GBs across runs
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(tmp)).iterator().asScala
        .toSeq.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
