package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-assembly operators for training-data pipelines: deterministic
  * greedy sequence packing, stratified sampling, and per-source token caps —
  * the steps between "cleaned documents" and "training shards".
  *
  * Everything is hash-derived (no RNG) and window/projection-composed, so the
  * same corpus always produces the same shards at any parallelism — the
  * reproducibility property a 100 TB data build needs for resumable runs.
  * Each operator costs exactly one hash shuffle.
  */
object CorpusOps {

  /** First 32 bits of md5(key) as a long — the shared engine-portable hash
    * primitive behind [[hashUniform]] and `Cardinality.linearCount`
    * (DuckDB spells it `('0x' || substr(md5(x), 1, 8))::BIGINT`). */
  def md5Prefix32(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long")

  /** Deterministic uniform in [0, 1) from a key: [[md5Prefix32]] scaled by
    * 2^32. Engine-portable, unlike an RNG seeded per partition. */
  def hashUniform(key: Column): Column =
    md5Prefix32(key).cast("double") / lit(4294967296d)

  /** Token-budget sequence packing ("concatenate then cut"): documents are
    * routed to `nShards` shards by id, greedily concatenated in id order
    * within each shard, and each document labeled with the training bin it
    * starts in — `bin = tokensBefore / budget` — and its offset inside that
    * bin. Documents may straddle a bin boundary, exactly like fixed-window
    * packing of a concatenated token stream.
    *
    * One shuffle (by shard) + one sort (by id); shards pack independently so
    * the operator scales out linearly with `nShards`. */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    budgetTokens: Int, nShards: Int): DataFrame =
    packSequencesByCount(df.select(col(idCol),
        TextAnalysis.tokenCount(col(textCol)).as("__nt")),
      idCol, "__nt", budgetTokens, nShards)

  /** [[packSequences]] over an ALREADY-COMPUTED per-document token-count
    * column — the entry point once a real tokenizer exists: feed it
    * [[TextAnalysis.bpeCountWithVocab]]'s output and the packing plan
    * budgets in trained-tokenizer tokens instead of the whitespace proxy
    * (same plan shape: one window over the shard key). */
  def packSequencesByCount(df: DataFrame, idCol: String, countCol: String,
                           budgetTokens: Int, nShards: Int): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val withShard = df.select(col(idCol),
      col(countCol).cast("long").as("n_tokens"),
      pmod(col(idCol), lit(nShards.toLong)).as("shard"))
    val before = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    withShard
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(before), lit(0L)))
      .select(col(idCol), col("shard"), col("n_tokens"),
        floor(col("cum_before") / budgetTokens).as("bin"),
        pmod(col("cum_before"), lit(budgetTokens.toLong)).as("offset"))
  }

  /** Training-shard EMISSION: the concatenate-then-cut plan
    * ([[packSequences]] labels documents with bins; this actually CUTS) —
    * every document's real token sequence is sliced at its shard's
    * token-budget boundaries, so reassembling a (shard, bin) cell's chunks
    * yields exactly `budgetTokens` tokens of contiguous training data (the
    * shard's final bin may be partial). Input rows carry an
    * `array<string>` token column (e.g.
    * [[TextAnalysis.bpeTokenizeWithVocab]]'s output); output is one row per
    * (document, overlapped bin): (idCol, shard, bin, chunk), chunk =
    * `sep`-joined tokens.
    *
    * Scale shape: one window over the shard key for the running offset
    * (identical to [[packSequences]]), then the bin fan-out and slicing are
    * PURE EXPRESSIONS — a document explodes into ceil(n/budget)+1 rows at
    * most, and no token ever shuffles twice. */
  def packTokenSlices(df: DataFrame, idCol: String, tokensCol: String,
                      budgetTokens: Int, nShards: Int,
                      sep: String = "\u0001"): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val b = lit(budgetTokens.toLong)
    val withShard = df.select(col(idCol), col(tokensCol).as("__tl"),
      pmod(col(idCol), lit(nShards.toLong)).as("shard"))
    val before = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    def fdiv(x: Column): Column = floor(x / b).cast("long")
    val start = greatest(col("__b") * b - col("__o"), lit(0L))
    val end = least(col("__n"), (col("__b") + 1) * b - col("__o"))
    withShard
      .withColumn("__n", size(col("__tl")).cast("long"))
      .withColumn("__o",
        coalesce(sum(col("__n")).over(before), lit(0L)))
      .where(col("__n") > 0)
      .withColumn("__b",
        explode(sequence(fdiv(col("__o")), fdiv(col("__o") + col("__n") - 1))))
      .select(col(idCol), col("shard"), col("__b").as("bin"),
        concat_ws(sep, slice(col("__tl"), (start + 1).cast("int"),
          (end - start).cast("int"))).as("chunk"))
  }

  /** Packed-bin BOUNDARY MANIFEST — the attention-mask sidecar every packed
    * training shard needs: cross-document attention must be masked at the
    * document seams inside each fixed-budget bin, and the trainer reads
    * those seams from a manifest, not by re-tokenizing. One row per
    * (shard, bin): how many documents the bin holds, how many tokens
    * (== `budgetTokens` except each shard's final bin), and the ordered
    * `doc:start:len` boundary list (start = token offset INSIDE the bin).
    *
    * Input is a per-document token-COUNT frame (e.g.
    * [[TextAnalysis.bpeCountWithVocab]] output) — boundaries are pure
    * arithmetic over counts, so no token text is read, let alone shuffled.
    * Scale shape: the same single shard-keyed window as [[packSequences]]
    * for the running offset, a pure-expression bin fan-out (a document
    * overlaps ceil(n/budget)+1 bins at most), then one hash aggregation on
    * (shard, bin); the per-bin sort is bounded by the documents in ONE bin
    * (≤ budgetTokens since every document in it holds ≥1 token). */
  def packBoundaryManifest(df: DataFrame, idCol: String, countCol: String,
                           budgetTokens: Int, nShards: Int): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val b = lit(budgetTokens.toLong)
    val withShard = df.select(col(idCol).as("__id"),
      col(countCol).cast("long").as("__n"),
      pmod(col(idCol), lit(nShards.toLong)).as("shard"))
    val before = Window.partitionBy(col("shard")).orderBy(col("__id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    def fdiv(x: Column): Column = floor(x / b).cast("long")
    val start = greatest(col("__o") - col("__b") * b, lit(0L))
    val len = least(col("__n"), (col("__b") + 1) * b - col("__o")) -
      greatest(col("__b") * b - col("__o"), lit(0L))
    withShard
      .withColumn("__o", coalesce(sum(col("__n")).over(before), lit(0L)))
      .where(col("__n") > 0)
      .withColumn("__b",
        explode(sequence(fdiv(col("__o")), fdiv(col("__o") + col("__n") - 1))))
      .select(col("shard"), col("__b").as("bin"),
        struct(start.as("s"), col("__id"), len.as("l")).as("__e"))
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__e.l")).as("bin_tokens"),
        array_join(transform(array_sort(collect_list(col("__e"))),
          e => concat_ws(":", e.getField("__id"), e.getField("s"),
            e.getField("l"))), ";").as("boundaries"))
  }

  /** Stratified sampling with per-stratum keep rates (e.g. rebalancing a
    * language mix): a document survives iff its hash-uniform falls under its
    * stratum's rate. Growth-stable — adding documents never flips existing
    * keep/drop decisions — and a pure filter (no shuffle at all). */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       rates: Map[String, Double],
                       defaultRate: Double = 0d): DataFrame = {
    require((rates.values.toSeq :+ defaultRate).forall(r => r >= 0 && r <= 1),
      "rates must be within [0, 1]")
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.where(hashUniform(col(idCol)) < rate)
  }

  /** Deterministic weighted reservoir sample (Efraimidis–Spirakis A-ES):
    * each item gets priority ln(u) / w where u is its hash-uniform in (0, 1)
    * and w its weight; the k LARGEST priorities per group are the sample —
    * inclusion probability proportional to weight, exactly the classic
    * scheme, but with the uniform derived from md5(id) instead of an RNG so
    * the draw is reproducible on any cluster and mirrorable by a SQL oracle.
    *
    * Scale shape: the top-k is the bounded [[graft.functions.TopKAgg]]
    * typed aggregate — each input partition reduces to ≤2k candidates per
    * group BEFORE the exchange, so the shuffle carries O(k × partitions)
    * rows per group, never the corpus. A rank-window formulation would
    * shuffle and sort every row.
    *
    * u is offset by +0.5/2^32 to stay strictly inside (0, 1): ln(0) would
    * produce -Inf priorities that silently never sample.
    *
    * Weight contract: weights must be positive. A weight ≤ 0 fails loudly
    * per row (a negative weight would flip the priority sign and ALWAYS
    * sample — a silent data bug); rows with a null weight or id are skipped,
    * the SQL-aggregate convention (and the typed aggregate's non-nullable
    * (Double, Long) encoder would otherwise throw on them). */
  def weightedSample(df: DataFrame, idCol: String, groupCol: String,
                     weightCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val u = (md5Prefix32(col(idCol)).cast("double") + lit(0.5)) / lit(4294967296d)
    val w = when(col(weightCol) <= 0, raise_error(concat(
        lit(s"weightedSample: non-positive weight in '$weightCol' for id "),
        col(idCol).cast("string")))).otherwise(col(weightCol).cast("double"))
    val pri = log(u) / w
    df.where(col(weightCol).isNotNull && col(idCol).isNotNull)
      .withColumn("__pri", pri)
      .groupBy(col(groupCol))
      .agg(graft.functions.TopKAgg.topK(k)(col("__pri"), col(idCol)).as("__top"))
      .select(col(groupCol), explode(col("__top.items")).as("__item"))
      .select(col(groupCol), col("__item.id").as(idCol))
  }

  /** Corpus-level block dedup (the line-level dedup of CCNet-style cleaning,
    * on fixed `blockTokens`-token blocks since the fixture corpus has no
    * newlines): every document is split into consecutive token blocks, each
    * block instance survives iff it is the corpus-wide FIRST occurrence of
    * its exact text (ordered by id, then position), and survivors are
    * re-joined in original order. Emits per-document block counts and the
    * deduplicated text (null when nothing survives).
    *
    * Scale shape: the global keep-first decision is a block-keyed
    * `min(struct(id, pos))` aggregate joined back on the block — min
    * partial-combines map-side, so a boilerplate block repeated millions of
    * times collapses to one candidate per map partition before the wire,
    * and the join-back equi-join splits under AQE skew handling. (The
    * previous formulation — `row_number` over a window keyed by block
    * text — funneled every instance of a hot block through one unsplittable
    * sorted partition.) Reassembly is one group-by shuffle keyed by doc id.
    * Block texts are bounded (`blockTokens` tokens), so the exchanges carry
    * rows proportional to the corpus token count — never a cross product
    * or a join fan-out. */
  def dedupBlocks(df: DataFrame, idCol: String, textCol: String,
                  blockTokens: Int): DataFrame = {
    require(blockTokens > 0, s"blockTokens must be positive, got $blockTokens")
    val toks = split(col(textCol), " ")
    val nBlocks = ceil(size(toks).cast("double") / blockTokens).cast("int")
    val blocks = transform(sequence(lit(0), greatest(nBlocks - 1, lit(0))),
      i => array_join(slice(toks, i * blockTokens + 1, lit(blockTokens)), " "))
    val exploded = df.select(col(idCol), posexplode(blocks).as(Seq("pos", "block")))
    val firstOcc = exploded.groupBy(col("block"))
      .agg(min(struct(col(idCol), col("pos"))).as("__first"))
    exploded
      .join(firstOcc, Seq("block"))
      .withColumn("keep",
        col("__first")(idCol) === col(idCol) && col("__first")("pos") === col("pos"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_blocks"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        array_join(
          transform(
            filter(
              array_sort(collect_list(struct(col("pos"),
                when(col("keep"), col("block")).as("block")))),
              s => s.getField("block").isNotNull),
            s => s.getField("block")),
          " ").as("__txt"))
      .select(col(idCol), col("n_blocks"), col("n_kept"),
        when(col("n_kept") > 0, col("__txt")).as("deduped_text"))
  }

  /** Temperature-based source mixing (the `p_s^α` re-weighting used to
    * flatten a pretraining source distribution): each source's share of a
    * `budgetTokens` target is proportional to `tokens_s^alpha`, so `alpha = 1`
    * preserves the natural mix and `alpha → 0` approaches uniform-per-source.
    * A document survives iff its hash-uniform falls under its source's keep
    * rate `min(1, budget·w_s / tokens_s)` — deterministic and growth-stable.
    *
    * Weights are quantized to integer micro-units (round-half-up of
    * `pow·1e6`, as a decimal(38,0)) before normalization: fixed-point sums
    * commute, so the normalizer — and therefore every keep decision — is
    * identical under any partition order and in the SQL oracle, unlike a
    * floating sum of `pow` values. Decimal, not long: at the operator's
    * stated corpus scale a source of ~1e13 tokens with alpha = 1 puts
    * `tokens·1e6` past Long.MaxValue, where a long quantization would wrap
    * negative and silently zero out the source's keep rate; decimal(38,0)
    * headroom is ~1e38.
    *
    * Scale shape: one map-side-combined aggregation for the per-source
    * totals (rows = #sources), a broadcast of that tiny rate table, then a
    * pure filter over the corpus — no corpus-sized shuffle anywhere. */
  def temperatureMix(df: DataFrame, idCol: String, sourceCol: String,
                     textCol: String, alpha: Double,
                     budgetTokens: Long): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    val tok = df.withColumn("n_tokens", TextAnalysis.tokenCount(col(textCol)))
    val totals = tok.groupBy(col(sourceCol))
      .agg(sum(col("n_tokens")).as("src_tokens"))
      // cast(double → decimal(38,0)) rounds HALF_UP — identical to the
      // oracle's round(x) (half-away-from-zero) for positive x, with no
      // +0.5 double addition on either side (floor(x + 0.5) differs from
      // HALF_UP when the addition itself rounds across an integer boundary,
      // e.g. x = 0.49999999999999994) and no squeeze through a long
      .withColumn("wq",
        (pow(col("src_tokens").cast("double"), lit(alpha)) * 1e6)
          .cast("decimal(38,0)"))
    val wSum = totals.agg(sum(col("wq")).as("w_sum"))
    val rates = totals.crossJoin(broadcast(wSum))
      .withColumn("keep_rate",
        least(lit(1d), lit(budgetTokens.toDouble) * col("wq").cast("double")
          / col("w_sum").cast("double") / col("src_tokens").cast("double")))
      .select(col(sourceCol), col("keep_rate"))
    tok.join(broadcast(rates), Seq(sourceCol))
      .where(hashUniform(col(idCol)) < col("keep_rate"))
      .select(col(idCol), col(sourceCol), col("n_tokens"))
  }

  /** Deterministic global corpus shuffle (the "shuffle the training data"
    * step): every document gets a pseudo-random but reproducible position —
    * shard = md5-prefix of its id modulo `nShards`, position = rank of the
    * full md5 key within the shard. The same corpus yields the same shard
    * layout on any cluster, and adding documents never reorders existing
    * shards relative to each other (ranks shift only within a shard).
    *
    * Scale shape: one hash shuffle keyed by shard + a per-shard sort —
    * never a global single-partition ordering; shards are hash-balanced so
    * skew cannot concentrate the sort. */
  def deterministicShuffle(df: DataFrame, idCol: String, nShards: Int,
                           seed: String = "shuffle"): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val key = md5(concat_ws("|", lit(seed), col(idCol).cast("string")))
    df.withColumn("__key", key)
      .withColumn("shard",
        pmod(conv(substring(col("__key"), 1, 8), 16, 10).cast("long"),
          lit(nShards.toLong)))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("__key"), col(idCol))))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** Curriculum-ordered training shards: documents are bucketed into
    * `phases` quantile phases of an INTEGER difficulty/quality score (phase
    * 0 = lowest scores) and each shard's stream is phase-major — all
    * phase-0 documents precede phase-1, deterministically shuffled inside a
    * phase ([[deterministicShuffle]]'s md5 key). The data-ordering step of
    * curriculum training, with no global sort anywhere.
    *
    * Phase boundaries come from the SCORE HISTOGRAM, not a corpus-wide rank:
    * one map-side-combined aggregation bounded by score cardinality (the
    * caller quantizes, e.g. a 0..1000 milli-score), collected to the driver
    * (kilobytes — the k-means "trainer state" idiom) where boundary k is
    * the smallest score whose cumulative count reaches ceil(n·k/phases).
    * Phase assignment is then a pure literal expression; the only shuffle
    * is the shard-keyed position window, identical to
    * [[deterministicShuffle]]'s. */
  def curriculumShards(df: DataFrame, idCol: String, scoreCol: String,
                       phases: Int, nShards: Int,
                       seed: String = "curriculum"): DataFrame = {
    require(phases > 0, s"phases must be positive, got $phases")
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val hist = df.groupBy(col(scoreCol).cast("long").as("s"))
      .agg(count(lit(1)).as("f"))
      .orderBy("s").collect().map(r => (r.getLong(0), r.getLong(1)))
    // empty input: every boundary target is 0 and indexWhere returns -1 —
    // return the empty projection instead of hist(-1) blowing up
    if (hist.isEmpty)
      return df.select(col(idCol), col(scoreCol), lit(0L).as("phase"),
        lit(0L).as("shard"), lit(0L).as("pos"))
    val n = hist.map(_._2).sum
    val cum = hist.scanLeft(0L)(_ + _._2).tail
    val boundaries = (1 until phases).map { k =>
      val t = (n * k + phases - 1) / phases
      hist(cum.indexWhere(_ >= t))._1
    }
    val phase = boundaries.foldLeft(lit(0L)) { (acc, b) =>
      acc + when(col(scoreCol) > b, 1L).otherwise(0L)
    }
    val key = md5(concat_ws("|", lit(seed), col(idCol).cast("string")))
    df.select(col(idCol), col(scoreCol), phase.as("phase"), key.as("__key"))
      .withColumn("shard",
        pmod(conv(substring(col("__key"), 1, 8), 16, 10).cast("long"),
          lit(nShards.toLong)))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard"))
          .orderBy(col("phase"), col("__key"), col(idCol))))
      .select(col(idCol), col(scoreCol), col("phase"), col("shard"), col("pos"))
  }

  /** Multi-epoch training order: [[deterministicShuffle]] run once per
    * epoch with an epoch-derived seed, so every epoch sees the corpus in a
    * different — but individually reproducible — order (the "reshuffle
    * between epochs" contract of a training dataloader). One row per
    * (epoch, document): (idCol, epoch, shard, pos).
    *
    * Scale shape: the epoch fan-out is a pure `explode` of a literal
    * sequence (rows grow `epochs`×, nothing reshuffles per epoch
    * separately); the only shuffle is ONE window keyed by (epoch, shard) —
    * hash-balanced exactly like the single-epoch shuffle, `epochs` ×
    * `nShards` independent sort groups. */
  def epochOrders(df: DataFrame, idCol: String, nShards: Int,
                  epochs: Int, seed: String = "epoch"): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    require(epochs > 0, s"epochs must be positive, got $epochs")
    val key = md5(concat_ws("|", lit(seed), col("epoch").cast("string"),
      col(idCol).cast("string")))
    df.select(col(idCol),
        explode(sequence(lit(0L), lit(epochs - 1L))).as("epoch"))
      .withColumn("__key", key)
      .withColumn("shard",
        pmod(conv(substring(col("__key"), 1, 8), 16, 10).cast("long"),
          lit(nShards.toLong)))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("epoch"), col("shard"))
          .orderBy(col("__key"), col(idCol))))
      .select(col(idCol), col("epoch"), col("shard"), col("pos"))
  }

  /** Length-bucketed batch packing (the padding-efficiency step of a
    * training dataloader): documents are routed to the smallest length
    * bucket that fits them (`bounds` ascending; anything longer lands in a
    * single overflow bucket), ordered deterministically inside each bucket
    * by (md5(id), id) — content-blind and reproducible — and grouped into
    * fixed-size batches. Emits per-batch stats including `padding_frac`,
    * the fraction of the (max_len × batch_rows) token matrix wasted on
    * padding — the quantity bucketing exists to minimize.
    *
    * Scale shape: one shuffle keyed by bucket for the ranking window + the
    * map-side-combined batch aggregation on (bucket, batch). Buckets are
    * few; batch ranks within a bucket stream through one sort. */
  def lengthBucketBatches(df: DataFrame, idCol: String, textCol: String,
                          batchSize: Int, bounds: Seq[Int]): DataFrame =
    lengthBucketBatchesByCount(df.select(col(idCol),
        TextAnalysis.tokenCount(col(textCol)).as("__nt")),
      idCol, "__nt", batchSize, bounds)

  /** [[lengthBucketBatches]] over an already-computed token-count column
    * (e.g. trained-tokenizer counts from
    * [[TextAnalysis.bpeCountWithVocab]]) — the padding economics a real
    * dataloader sees are in TOKENIZER tokens, not whitespace words. */
  def lengthBucketBatchesByCount(df: DataFrame, idCol: String,
                                 countCol: String, batchSize: Int,
                                 bounds: Seq[Int]): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    require(bounds.nonEmpty && bounds == bounds.sorted && bounds.distinct == bounds,
      s"bounds must be non-empty, ascending, distinct: $bounds")
    require(bounds.head > 0, s"bounds must be positive: $bounds")
    val overflow = 1L << 30
    val nTok = col(countCol).cast("long")
    val bucket = bounds.foldRight(lit(overflow): Column)((bnd, acc) =>
      when(nTok <= bnd, lit(bnd.toLong)).otherwise(acc))
    val w = Window.partitionBy(col("bucket"))
      .orderBy(col("__h"), col(idCol))
    df.select(col(idCol), nTok.as("n_tokens"), bucket.as("bucket"),
        md5(col(idCol).cast("string")).as("__h"))
      .withColumn("batch", floor((row_number().over(w) - 1) / lit(batchSize.toDouble)))
      .groupBy(col("bucket"), col("batch"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("n_tokens")).as("max_tokens"),
        sum(col("n_tokens")).as("sum_tokens"))
      .withColumn("padding_frac",
        round(lit(1d) - col("sum_tokens").cast("double")
          / (col("max_tokens") * col("n_docs")).cast("double"), 4))
  }

  /** Per-source token cap (data-mixing dedup of over-represented domains):
    * within each source, documents are ranked by (hash, id) — a stable,
    * content-blind order — and kept while the running token total stays
    * within `capTokens`; the document that crosses the cap and everything
    * after it are dropped. One shuffle on the source key. */
  def capSourceTokens(df: DataFrame, idCol: String, sourceCol: String,
                      textCol: String, capTokens: Long): DataFrame = {
    require(capTokens > 0, s"capTokens must be positive, got $capTokens")
    val withTokens = df.withColumn("n_tokens",
        TextAnalysis.tokenCount(col(textCol)))
      .withColumn("__h", md5(col(idCol).cast("string")))
    val w = Window.partitionBy(col(sourceCol)).orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    withTokens
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .where(col("cum_tokens") <= capTokens)
      .drop("__h")
  }

  /** [[capSourceTokens]] over an already-computed token-count column (the
    * trained-tokenizer entry point, like [[packSequencesByCount]]): source
    * caps are token BUDGETS, so once a real tokenizer exists they should be
    * enforced in its tokens. Input carries (idCol, sourceCol, countCol);
    * all input columns pass through plus n_tokens and cum_tokens. */
  def capSourceTokensByCount(df: DataFrame, idCol: String, sourceCol: String,
                             countCol: String, capTokens: Long): DataFrame = {
    require(capTokens > 0, s"capTokens must be positive, got $capTokens")
    val withTokens = df.withColumn("n_tokens", col(countCol).cast("long"))
      .withColumn("__h", md5(col(idCol).cast("string")))
    val w = Window.partitionBy(col(sourceCol)).orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    withTokens
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .where(col("cum_tokens") <= capTokens)
      .drop("__h")
  }

  /** Per-source release manifest (the provenance artifact a corpus release
    * ships with): every source's sorted document-id roster as one row —
    * (source, n_docs, manifest).
    *
    * This is the canonical HOT-KEY aggregation: source cardinality is tiny
    * (every key is hot — at 100 TB a source holds billions of ids), and a
    * plain `groupBy(source).agg(collect_list(id))` funnels each source's
    * whole roster through ONE final-aggregation task. [[Skew.saltedCollect]]
    * spreads it over a two-level combine: partial lists build on
    * (source, salt) across `factor` tasks per source, and the final merge
    * per source flattens `factor` pre-built lists instead of consuming raw
    * rows. The salt is content-derived (never rand()), so retries and the
    * oracle agree. */
  def sourceManifest(df: DataFrame, idCol: String, sourceCol: String,
                     factor: Int = 16): DataFrame = {
    require(factor > 0, s"factor must be positive, got $factor")
    Skew.saltedCollect(df.select(col(sourceCol), col(idCol)),
        Seq(sourceCol), idCol, factor, "ids")
      .select(col(sourceCol), size(col("ids")).cast("long").as("n_docs"),
        array_join(transform(col("ids"), i => i.cast("string")), ",")
          .as("manifest"))
  }

  /** Packing-efficiency sweep — the report a team reads to CHOOSE the
    * context length before committing to a [[packSequencesByCount]] /
    * [[packTokenSlices]] layout: for each candidate token budget, how many
    * fixed-budget bins the concatenate-then-cut plan produces, the padding
    * slack (only each shard's final bin is partial under this packing
    * style), the fill rate, and how many documents get cut across bin
    * boundaries (each cut is a mid-document attention seam — the
    * cross-document masking cost q153's manifest encodes).
    *
    * Scale shape: the shard-keyed running offset is budget-INDEPENDENT, so
    * ONE window pass (identical to [[packSequencesByCount]]) serves every
    * candidate; each budget then needs only pure per-row arithmetic — the
    * |budgets|× explode is a map-side fan-out feeding a |budgets|-key hash
    * aggregation (map-side partials), plus a shard-totals aggregate for
    * bin counts. No per-budget pass over the corpus, no second shuffle. */
  def packEfficiencySweep(df: DataFrame, idCol: String, countCol: String,
                          budgets: Seq[Int], nShards: Int): DataFrame = {
    require(budgets.nonEmpty && budgets.forall(_ > 0),
      s"budgets must be positive: $budgets")
    require(budgets == budgets.distinct, s"budgets must be distinct: $budgets")
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val withShard = df.select(col(idCol), col(countCol).cast("long").as("n"),
      pmod(col(idCol), lit(nShards.toLong)).as("shard"))
    val before = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val base = withShard
      .withColumn("o", coalesce(sum(col("n")).over(before), lit(0L)))
      .where(col("n") > 0)
    val bArr = array(budgets.map(b => lit(b.toLong)): _*)
    val perDoc = base.select(col("n"), col("o"), explode(bArr).as("budget"))
      .withColumn("cuts",
        expr("div(o + n - 1, budget) - div(o, budget)"))
      .groupBy(col("budget"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("total_tokens"),
        sum((col("cuts") > 0).cast("long")).as("n_cut_docs"),
        sum(col("cuts")).as("n_cuts"))
    val bins = base.groupBy(col("shard")).agg(sum(col("n")).as("st"))
      .select(col("st"), explode(bArr).as("budget"))
      .groupBy(col("budget"))
      .agg(sum(expr("div(st + budget - 1, budget)")).as("n_bins"))
    perDoc.join(broadcast(bins), Seq("budget"))
      .select(col("budget"), col("n_docs"), col("total_tokens"),
        col("n_bins"),
        (col("n_bins") * col("budget") - col("total_tokens"))
          .as("padded_tokens"),
        expr("div(total_tokens * 1000, n_bins * budget)").as("fill_milli"),
        col("n_cut_docs"), col("n_cuts"))
  }

  /** Token-budget mixture plan — exact water-filling allocation of a
    * training-token budget across sources (the data-budgeting step behind
    * published mixture tuning à la The Pile / DoReMi: target weights say
    * how the budget SHOULD split; per-source supply and an epoch cap say
    * how it CAN). Each source brings `available` tokens (aggregated from
    * `countCol`) and may be consumed at most `maxEpochsMilli/1000` times
    * over, so its hard cap is `div(available · maxEpochsMilli, 1000)`.
    * The budget — `div(Σ available · budgetPermille, 1000)` — is split
    * proportionally to `weights`; a source whose proportional share
    * exceeds its cap is frozen at the cap and its surplus re-flows to the
    * others, recursively (standard water-filling). Sources missing from
    * `weights` get weight 0 and allocation 0 but still report supply.
    *
    * Determinism/exactness: the classic solve sorts by cap/weight and
    * decides cap-outs by an EXACT cross-multiplied prefix test (no
    * division, so no rounding in the decision); allocations and the sort
    * key use floor division on non-negative integers, which Scala `/`,
    * Spark `div` and DuckDB `//` all agree on. Keep Σ weights ≤ ~10³ so
    * `cap · Σw` stays inside a long at 100 TB supplies (the sort key is
    * widened to BigInt / HUGEINT where it can't).
    *
    * Scale shape: the corpus collapses in ONE source-keyed aggregation
    * (map-side partials); the solve runs on the |sources|-row result as
    * driver trainer-state — the k-means/curriculum idiom: metadata-sized
    * state, never corpus data, on the driver. Output is |sources| rows. */
  def mixturePlan(df: DataFrame, sourceCol: String, countCol: String,
                  weights: Map[String, Long], budgetPermille: Long,
                  maxEpochsMilli: Long): DataFrame = {
    require(budgetPermille > 0, s"budgetPermille must be positive, got $budgetPermille")
    require(maxEpochsMilli > 0, s"maxEpochsMilli must be positive, got $maxEpochsMilli")
    require(weights.values.forall(_ >= 0), "weights must be non-negative")
    val spark = df.sparkSession
    import spark.implicits._
    val avail = df.groupBy(col(sourceCol).cast("string").as("source"))
      .agg(sum(col(countCol).cast("long")).as("available_tokens"))
      .as[(String, Long)].collect()
    val budget = avail.map(_._2).sum * budgetPermille / 1000
    final case class Src(source: String, a: Long, w: Long, cap: Long)
    val rows = avail.map { case (s, a) =>
      Src(s, a, weights.getOrElse(s, 0L), a * maxEpochsMilli / 1000)
    }
    val pos = rows.filter(_.w > 0)
      .sortBy(r => (BigInt(r.cap) * 1000000 / r.w, r.source))
    val totalW = pos.map(_.w).sum
    // prefix walk in ratio order: source p caps iff, with everything before
    // it capped, its proportional share of the remaining budget would
    // reach its cap — tested exactly via cross-multiplication
    val capped = scala.collection.mutable.LinkedHashSet.empty[String]
    var cPre = 0L; var wPre = 0L; var prefix = true
    pos.foreach { r =>
      if (prefix &&
          BigInt(r.cap) * (totalW - wPre) <= BigInt(r.w) * (budget - cPre)) {
        capped += r.source; cPre += r.cap
      } else prefix = false
      wPre += r.w
    }
    val wK = pos.filterNot(r => capped(r.source)).map(_.w).sum
    val bRem = budget - cPre
    val out = rows.toSeq.map { r =>
      val alloc =
        if (r.w == 0L) 0L
        else if (capped(r.source)) r.cap
        else if (wK == 0L) 0L
        else (BigInt(r.w) * bRem / wK).toLong
      (r.source, r.a, r.w, r.cap, r.w > 0L && capped(r.source), alloc,
        if (r.a > 0L) Some(alloc * 1000 / r.a) else None)
    }
    out.toDF("source", "available_tokens", "weight", "cap_tokens", "capped",
      "allocated_tokens", "epochs_milli")
  }

  /** Epoch-quota materialization — turn [[mixturePlan]]'s per-source token
    * ALLOCATIONS into a per-document replication plan: a source allocated
    * `alloc` tokens against `avail` available is consumed
    * `full = div(alloc, avail)` complete times, plus a partial pass of
    * `alloc − full·avail` tokens filled by the same stable hash-ordered
    * greedy prefix [[capSourceTokens]] uses (so the partial membership is
    * growth-stable and engine-deterministic). Output per document: its
    * source's full-pass count, whether it makes the partial pass, and the
    * resulting copy count — the exact materialization of "source consumed
    * 2.3× over" that an epoch-building job executes.
    *
    * Scale shape: ONE source-keyed aggregation feeds the |sources|-row
    * water-filling solve (driver trainer-state, as [[mixturePlan]]); the
    * plan broadcast-joins back to documents and the partial-pass prefix is
    * the one source-keyed cumulative window [[capSourceTokensByCount]]
    * already carries. No extra shuffle beyond that window. */
  def epochQuotas(df: DataFrame, idCol: String, sourceCol: String,
                  countCol: String, weights: Map[String, Long],
                  budgetPermille: Long, maxEpochsMilli: Long): DataFrame = {
    val plan = mixturePlan(df.select(col(sourceCol), col(countCol)),
        sourceCol, countCol, weights, budgetPermille, maxEpochsMilli)
      .select(col("source").as(sourceCol), col("available_tokens"),
        col("allocated_tokens"))
      .withColumn("n_full_copies",
        expr("div(allocated_tokens, available_tokens)"))
      .withColumn("__rem",
        col("allocated_tokens") - col("n_full_copies") * col("available_tokens"))
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    df.select(col(idCol), col(sourceCol), col(countCol).cast("long").as("n_tokens"))
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .join(broadcast(plan), Seq(sourceCol))
      .withColumn("in_partial", col("__cum") <= col("__rem"))
      .select(col(idCol), col(sourceCol), col("n_tokens"),
        col("n_full_copies"), col("in_partial"),
        (col("n_full_copies") + col("in_partial").cast("long")).as("n_copies"))
  }

  /** Shard-level export manifest with an order-independent membership
    * checksum: per shard (the q111 md5 assignment), the doc count, token
    * volume, and the XOR of a 60-bit md5-derived hash per member id. XOR
    * commutes and associates, so the checksum needs no per-shard buffering
    * or ordering anywhere — pure map + one aggregation with map-side
    * partials, unlike a sorted-id digest which would collect each shard's
    * full membership into one task. Re-materialize a shard anywhere, fold
    * the same per-id hashes, compare three numbers — done. Integrity is
    * against loss/duplication/corruption, not adversaries (a 60-bit XOR is
    * forgeable by construction). */
  def shardManifest(df: DataFrame, idCol: String, textCol: String,
                    nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val idStr = col(idCol).cast("string")
    val shard = pmod(conv(substring(md5(concat(lit("shuffle|"), idStr)), 1, 8),
      16, 10).cast("long"), lit(nShards.toLong))
    val idHash = conv(substring(md5(concat(lit("id:"), idStr)), 1, 15), 16, 10)
      .cast("long")
    df.select(shard.as("shard"),
        TextAnalysis.tokenCount(col(textCol)).as("n_tok"), idHash.as("__h"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        expr("bit_xor(__h)").as("ids_xor"))
  }
}
