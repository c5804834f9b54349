package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.Tables

/** Text-analysis + dedup queries over the `documents` table — the
  * training-data-pipeline operator family (token counting, language ID,
  * quality scoring, exact dedup, n-gram Jaccard similarity) with DuckDB
  * oracles. The heavier near-dup machinery (MinHash-LSH, SimHash) lives in
  * `graft.operators.Dedup` with rows-only checks.
  */
object TextQueries {

  /** Shared stopword lexicon for the language-ID vote: (lang, token). */
  val lexicon: Seq[(String, String)] = Seq(
    "en" -> "the", "en" -> "and", "en" -> "of", "en" -> "to", "en" -> "in",
    "fr" -> "le", "fr" -> "la", "fr" -> "et", "fr" -> "les", "fr" -> "des",
    "es" -> "el", "es" -> "los", "es" -> "de", "es" -> "y", "es" -> "las",
    "de" -> "der", "de" -> "die", "de" -> "und", "de" -> "das", "de" -> "ist",
    "zh" -> "的", "zh" -> "是", "zh" -> "在", "zh" -> "了", "zh" -> "和")

  private val stopwords = Seq("the", "a", "of", "to", "in", "and")

  private val sharedWeights =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]()

  /** The frozen prior-release quality classifier every release/serving
    * query gates with (trained on the old slice — doc_id % 10 < 8 — at
    * d = 256, iters = 2, lr = 0.5): trained ONCE per JVM per dataset, the
    * way production trains nightly and serves everywhere, instead of
    * re-running the same two training iterations in eight queries. The
    * training is deterministic, so sharing is invisible to every answer;
    * the first caller's fixture_build carries the cost. */
  private[queries] def frozenWeights(s: SparkSession, dir: String,
                                     caller: String): Array[Long] =
    VectorQueries.timedFixture(caller) {
      sharedWeights.computeIfAbsent(dir, _ => {
        val docs = Tables.load(s, dir, "documents")
        val old = docs.where(col("doc_id") % 10 < 8)
        Classifier.denseWeights(Classifier.trainWeights(old, "doc_id",
          "text", col("lang") === "en", d = 256, iters = 2, lr = 0.5), 256)
      })
    }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // R7: unnest with position (converter.py:48-74 analogue on token arrays)
    "q33_unnest_tokens" -> ((s, dir) =>
      Reshape.unnest(
        Tables.load(s, dir, "documents").withColumn("toks", split(col("text"), " ")),
        Seq("doc_id"), "toks", posName = "pos", elemName = "token")
        .withColumn("pos", col("pos").cast("long"))),

    // Token count + char/byte length (text-analysis family)
    "q40_token_count" -> ((s, dir) =>
      Tables.load(s, dir, "documents").select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("n_chars_calc"),
        octet_length(col("text")).cast("long").as("n_bytes"))),

    // Language ID by stopword vote: argmax of lexicon hits, ties → lang asc,
    // no hits → 'unknown'
    "q41_lang_id" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      docs.select(col("doc_id"), col("lang"))
        .join(predictedLang(s, docs), Seq("doc_id"))
    }),

    // Quality scoring: token stats + stopword ratio → bounded score
    "q42_quality" -> ((s, dir) => {
      val stopArr = array(stopwords.map(lit): _*)
      Tables.load(s, dir, "documents")
        .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
        .withColumn("n_stop",
          size(filter(split(col("text"), " "), t => array_contains(stopArr, t))).cast("long"))
        .withColumn("avg_token_len",
          round(length(regexp_replace(col("text"), " ", "")).cast("double") / col("n_tokens"), 3))
        .withColumn("stop_ratio", round(col("n_stop").cast("double") / col("n_tokens"), 3))
        .withColumn("quality_score", TextAnalysis.qualityScore(col("text"), stopwords))
        .select("doc_id", "n_tokens", "n_stop", "avg_token_len", "stop_ratio", "quality_score")
    }),

    // Exact dedup by content hash (hash-groupBy; scale path for 100 TB dedup)
    "q43_dedup_exact" -> ((s, dir) =>
      Tables.load(s, dir, "documents")
        .groupBy(md5(col("text")).as("text_hash"))
        .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper_id"))),

    // Exact token-set Jaccard within source blocks (blocked pairwise
    // similarity — the verifiable core of near-dup detection). The token
    // self-join is bounded: a stopword-grade token appearing in nearly every
    // document of a block would generate ~docs² join rows while carrying no
    // Jaccard discrimination, so tokens with document frequency > dfCap per
    // (source, lang) block are dropped from BOTH the intersection and the
    // set sizes (Jaccard over the capped token sets — the oracle mirrors the
    // same cap). Join fan-out is thus O(dfCap²) pairs per token at any
    // corpus size; MinHash (q45) remains the approximate scale path.
    "q44_jaccard_pairs" -> ((s, dir) => {
      val dfCap = 100
      val raw = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("lang"),
          explode(split(col("text"), " ")).as("token"))
        .distinct()
      // df via groupBy + inner join-back, NOT count-over-window: partial
      // aggregation collapses a hot token ("the") map-side, and the join's
      // build side contains only sub-cap tokens, so hot tokens never reach
      // the pair fan-out at all — a window keyed by token would buffer
      // every occurrence of the hottest token in one unsplittable partition
      val rare = raw.groupBy(col("source"), col("lang"), col("token"))
        .agg(count(lit(1)).as("__df"))
        .where(col("__df") <= dfCap)
        .select(col("source"), col("lang"), col("token"))
      val toks = raw.join(rare, Seq("source", "lang", "token"))
      val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("n_toks"))
      val a = toks.select(col("source"), col("lang"), col("doc_id").as("a_id"), col("token"))
      val b = toks.select(col("source"), col("lang"), col("doc_id").as("b_id"), col("token"))
      val inter = a.join(b, Seq("source", "lang", "token"))
        .where(col("a_id") < col("b_id"))
        .groupBy("a_id", "b_id").agg(count(lit(1)).as("n_inter"))
      inter
        .join(sizes.withColumnRenamed("doc_id", "a_id").withColumnRenamed("n_toks", "n_a"), Seq("a_id"))
        .join(sizes.withColumnRenamed("doc_id", "b_id").withColumnRenamed("n_toks", "n_b"), Seq("b_id"))
        .withColumn("jaccard", round(col("n_inter").cast("double")
          / (col("n_a") + col("n_b") - col("n_inter")), 4))
        .where(col("jaccard") >= 0.5)
        .select("a_id", "b_id", "jaccard")
    }),

    // TF-IDF top terms per document (classic relevance scoring; one shuffle
    // for tf, a broadcast df/idf dim, a rank window)
    "q73_tfidf" -> ((s, dir) => {
      val toks = Tables.load(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      val n = Tables.load(s, dir, "documents").agg(count(lit(1)).as("n_docs"))
      val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      // df from tf (one row per doc×token already) — reusing it avoids a
      // second full shuffle of the raw exploded tokens through distinct()
      val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
      val scored = tf.join(broadcast(dfreq), Seq("token"))
        .crossJoin(broadcast(n))
        .withColumn("score",
          round(col("tf") * log(col("n_docs").cast("double") / col("df")), 4))
      Serving.topNPerGroup(scored, Seq("doc_id"),
          Seq(col("score").desc, col("token").asc), 3, useRowNumber = true)
        .select("doc_id", "token", "score")
    }),

    // Repetition score: 1 - distinct/total 5-gram shingles — high values
    // flag boilerplate/looped text (a standard pretraining quality filter)
    "q76_repetition" -> ((s, dir) =>
      Tables.load(s, dir, "documents")
        .withColumn("sh", Dedup.shingles(col("text"), 5))
        .select(col("doc_id"),
          size(col("sh")).cast("long").as("n_shingles"),
          size(array_distinct(col("sh"))).cast("long").as("n_distinct"),
          round(lit(1d) - size(array_distinct(col("sh"))).cast("double")
            / size(col("sh")), 4).as("repetition"))),

    // Benchmark decontamination: flag documents sharing >= 3 distinct
    // 8-token shingles with a "benchmark" set (here: doc_id < 5)
    "q77_decontaminate" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val sh = docs.select(col("doc_id"),
        explode(array_distinct(Dedup.shingles(col("text"), 8))).as("shingle"))
      val bench = sh.where(col("doc_id") < 5)
        .select(col("shingle")).distinct()
      sh.where(col("doc_id") >= 5)
        .join(broadcast(bench), Seq("shingle"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_overlaps"))
        .where(col("n_overlaps") >= 3)
    }),

    // Multimodal probe: opaque binary column + deterministic stub "decode"
    // (byte length + header hex) — the Spark-side plumbing for binary assets
    "q50_multimodal_probe" -> ((s, dir) =>
      Tables.load(s, dir, "documents").select(
        col("doc_id"),
        octet_length(col("text")).cast("long").as("byte_len"),
        lower(hex(substring(col("text"), 1, 8).cast("binary"))).as("header_hex"))),

    // Real media decode end to end: each doc is wrapped into a genuine
    // WAV / MP4 / BMP whose header encodes sizes derived from the text's
    // byte length, then decoded by the header-only probes (RIFF chunk walk,
    // ISO BMFF box walk, imageio) through the binary-column mapPartitions
    // path. The oracle recomputes every decoded feature from strlen(text)
    // arithmetic — a wrong byte offset anywhere in parser or synthesizer
    // breaks the match.
    "q101_media_decode" -> ((s, dir) =>
      Multimodal.extractFeatures(Multimodal.syntheticAssets(s, dir))
        .toDF()
        .select(col("asset_id"), col("kind"), col("width"), col("height"),
          col("duration_ms"))),

    // Sliding-window chunking: 100-token chunks, stride 80 (20-token
    // overlap) — map-side generate, no shuffle.
    "q85_chunk_docs" -> ((s, dir) =>
      TextAnalysis.chunkDocs(Tables.load(s, dir, "documents"), "doc_id", "text",
        chunkTokens = 100, strideTokens = 80)),

    // Deterministic held-out split: ~10% of documents to "valid" by md5
    // byte cutoff — reproducible across engines/runs/cluster sizes.
    "q84_split_assign" -> ((s, dir) =>
      Tables.load(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.deterministicSplit(col("doc_id")).as("split"))),

    // PII scrub: email + long-digit-run redaction via codegen'd
    // regexp_replace (standard pretraining-privacy pass; patterns kept in
    // the Java∩RE2 regex subset so both engines agree)
    "q80_pii_scrub" -> ((s, dir) =>
      Tables.load(s, dir, "documents").select(col("doc_id"),
        regexp_replace(regexp_replace(col("text"),
          "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
          "[0-9]{6,}", "<NUM>").as("scrubbed"))),

    // Corpus-level block dedup (CCNet line-dedup analogue on 3-token
    // blocks): keep only first occurrences of each exact block corpus-wide,
    // reassemble surviving blocks per document.
    "q99_block_dedup" -> ((s, dir) =>
      CorpusOps.dedupBlocks(Tables.load(s, dir, "documents"),
        "doc_id", "text", blockTokens = 3)),

    // Two-pass heavy hitters: bounded-memory Misra-Gries candidates
    // (mergeable sketch, map-side combined) + exact recount of the candidate
    // set only. With 64 counters the sketch provably surfaces every token
    // above N/65, so the N/20-threshold output equals the exact answer.
    "q100_heavy_hitters" -> ((s, dir) => {
      val toks = Tables.load(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
      val cands = toks.agg(graft.functions.FreqSketch.misraGries(64)(col("token")).as("mg"))
        .select(explode(col("mg.tokens")).as("token"))
      val total = toks.agg(count(lit(1)).as("n_total"))
      toks.join(broadcast(cands), Seq("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(total))
        .where(col("n") >= ceil(col("n_total").cast("double") / 20))
        .select(col("token"), col("n"))
    }),

    // Release diff (dataset-versioning QA): two corpus snapshots full-outer
    // join on id, content hashes compare map-side - added / removed /
    // changed in one id-keyed shuffle per side, the canonical release-audit
    // shape at any corpus size. Snapshots are deterministic slices of the
    // fixture (modular filters + a reversed-text perturbation).
    "q107_corpus_diff" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val cur = docs.where(col("doc_id") % 11 =!= 0)
        .select(col("doc_id"), md5(col("text")).as("cur_hash"))
      val prev = docs.where(col("doc_id") % 13 =!= 0)
        .select(col("doc_id"),
          md5(when(col("doc_id") % 17 === 3, reverse(col("text")))
            .otherwise(col("text"))).as("prev_hash"))
      cur.join(prev, Seq("doc_id"), "full_outer")
        .withColumn("status",
          when(col("prev_hash").isNull, "added")
            .when(col("cur_hash").isNull, "removed")
            .when(col("cur_hash") =!= col("prev_hash"), "changed"))
        .where(col("status").isNotNull)
        .select("doc_id", "status")
    }),

    // Unicode canonicalization ahead of dedup: the native graft_nfc
    // expression (Spark has no built-in NFC; a UDF would break whole-stage
    // codegen). Combining marks are injected deterministically so NFC has
    // real work on every row; the oracle is DuckDB's nfc_normalize.
    "q108_nfc_normalize" -> ((s, dir) => {
      // the replacement is the DECOMPOSED sequence a + U+0301 (combining
      // acute), so NFC has composition work on every row; the oracle injects
      // the identical sequence via chr(769) and composes with nfc_normalize
      val injected = regexp_replace(col("text"), "a", "á")
      Tables.load(s, dir, "documents").select(
        col("doc_id"),
        md5(call_function("graft_nfc", injected)).as("norm_hash"),
        octet_length(call_function("graft_nfc", injected)).cast("long")
          .as("norm_bytes"))
    }),

    // Single-pass table profiler ("ANALYZE TABLE" preflight): per column,
    // row/null counts, oracle-checkable linear-counting distinct, max
    // rendered width - one aggregate over the table, stacked by explode.
    "q106_profile" -> ((s, dir) =>
      Profile.profile(Tables.load(s, dir, "documents"))),

    // Deterministic weighted reservoir sample (Efraimidis-Spirakis via
    // md5-derived uniforms): 5 docs per source, inclusion probability
    // proportional to token count, reproducible on any cluster and mirrored
    // exactly by the oracle. Top-k runs as the bounded TopKAggregator -
    // O(k x partitions) shuffle rows per group, never the corpus.
    "q103_weighted_sample" -> ((s, dir) =>
      CorpusOps.weightedSample(
        Tables.load(s, dir, "documents")
          .withColumn("n_tokens", TextAnalysis.tokenCount(col("text"))),
        "doc_id", "source", "n_tokens", k = 5)),

    // Corpus-bigram LM quality score (the sharper sibling of q97's unigram):
    // mean ln p(w2|w1) with p estimated from the corpus itself.
    "q104_bigram_logprob" -> ((s, dir) =>
      TextAnalysis.bigramLogProb(Tables.load(s, dir, "documents"),
        "doc_id", "text")),

    // C4-style cleaning composite: language-consistency filter (predicted ==
    // labeled) → quality floor → corpus exact-dedup keep-first → PII scrub.
    // Each stage is an already-verified operator; this is the chained
    // pipeline a pretraining data build runs end to end.
    "q102_clean_compose" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val langOk = docs
        .join(predictedLang(s, docs), Seq("doc_id"))
        .where(col("predicted_lang") === col("lang"))
      val quality = langOk
        .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
        .withColumn("n_stop",
          size(filter(split(col("text"), " "),
            t => array_contains(array(stopwords.map(lit): _*), t))).cast("long"))
        .withColumn("quality_score", TextAnalysis.qualityScore(col("text"), stopwords))
        .where(col("quality_score") >= 0.2)
      // keep-first per exact text via min-id aggregate + semi-join (the
      // q99/q119 de-skew shape) — a window keyed by content hash buffers
      // every copy of a flooded boilerplate text in one sort partition
      val keepIds = quality
        .groupBy(md5(col("text")).as("__h"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id")
      val deduped = quality.join(keepIds, Seq("doc_id"), "left_semi")
      deduped.select(col("doc_id"), col("lang"), col("quality_score"),
        regexp_replace(regexp_replace(col("text"),
          "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
          "[0-9]{6,}", "<NUM>").as("scrubbed"))
    }),

    // BM25 ranked retrieval over the corpus for a fixed query-term set:
    // top 20 by (score desc, id) — TakeOrderedAndProject, never a global
    // single-partition sort. Scores are integer-quantized sums, so the
    // ranking is bit-identical in the oracle.
    "q112_bm25" -> ((s, dir) =>
      TextAnalysis.bm25(Tables.load(s, dir, "documents"), "doc_id", "text",
          bm25Terms)
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)),

    // Bloom-filter decontamination: same exact-overlap answer as q77 (the
    // filter has no false negatives and the verify join removes false
    // positives), but the corpus shingle stream is pre-filtered map-side
    // against an 8 KB broadcast bitmap instead of joining in full — the
    // shape that survives a benchmark set too large to broadcast.
    "q114_bloom_decontaminate" -> ((s, dir) =>
      Dedup.bloomDecontaminate(Tables.load(s, dir, "documents"),
        "doc_id", "text", benchFilter = col("doc_id") < 10,
        n = 6, minOverlaps = 2)),

    // Full corpus release build — the end-to-end composition a pretraining
    // data team runs as ONE job: C4-style clean (language-consistency →
    // quality floor → exact-dedup keep-first, q102's stages) → benchmark
    // decontamination (Bloom-prefiltered exact 6-gram overlap against the
    // held-out docs, q114's operator) → temperature-based source mixing to
    // a token budget (q110's operator). Every stage is an individually
    // driver-verified operator; this query verifies their composition —
    // the final (doc_id, source, n_tokens) training manifest is
    // hash-checked end to end. Scale shape inherits from the stages: no
    // corpus-sized shuffle beyond the dedup window's single hash exchange,
    // kilobyte broadcasts for the lexicon / Bloom bitmap / mix rates.
    "q126_corpus_build" -> ((s, dir) =>
      corpusBuild(s, Tables.load(s, dir, "documents"))),

    // Per-source contamination report over the q174 excision pass (matched
    // 5-gram benchmark spans): how much of each source the benchmark
    // overlap actually costs — contaminated doc counts and excised token
    // mass, the per-provider accounting a release note ships.
    "q179_scrub_report" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Dedup.scrubBenchmarkSpans(docs.where(col("doc_id") >= 5),
          "doc_id", "text", docs.where(col("doc_id") < 5), "text", n = 5)
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum((col("n_kept") < col("n_tokens")).cast("long"))
            .as("contaminated_docs"),
          sum(col("n_tokens")).as("tokens_total"),
          sum(col("n_tokens") - col("n_kept")).as("tokens_excised"))
        .withColumn("excised_permille",
          expr("div(tokens_excised * 1000, tokens_total)"))
    }),

    // Contamination-span excision: q77's benchmark (doc_id < 5) but CUT the
    // matched 5-gram spans out of each corpus doc instead of dropping it —
    // the surgical eval-overlap scrub.
    "q174_decontamination_scrub" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Dedup.scrubBenchmarkSpans(docs.where(col("doc_id") >= 5),
        "doc_id", "text", docs.where(col("doc_id") < 5), "text", n = 5)
    }),

    "q119_span_scrub" -> ((s, dir) =>
      Dedup.scrubRepeatedSpans(Tables.load(s, dir, "documents"),
        "doc_id", "text", n = 8)),

    // Maximal repeated spans (Lee et al. 2022 ExactSubstr semantics): each
    // maximal run of tokens belonging to a corpus-repeated substring of ≥ 8
    // tokens, as ONE span row — a 50-token boilerplate repeat is one
    // 50-token span, not 43 overlapping 8-gram windows. Same skew-safe
    // aggregate+join-back decision kernel as q119; the island merge is a
    // doc-keyed (bounded) window.
    "q141_maximal_spans" -> ((s, dir) =>
      Dedup.maximalRepeatedSpans(Tables.load(s, dir, "documents"),
        "doc_id", "text", n = 8)),

    // One BPE vocabulary-induction counting round (Sennrich et al. 2016):
    // corpus-wide adjacent-character-pair frequencies, top-50 merge
    // candidates. Pair-keyed aggregation (alphabet²-bounded key space,
    // map-side partials) + ordered slice; (count desc, pair asc) is a
    // total order so the limit is deterministic.
    "q129_bpe_merges" -> ((s, dir) =>
      TextAnalysis.bpeMergePairs(Tables.load(s, dir, "documents"),
        "text", k = 50)),

    // Full iterative BPE induction (q129 is one counting round of this):
    // six count → top-merge → re-segment rounds over the distinct-word
    // frequency table. The oracle replays the identical loop as six
    // unrolled CTE rounds — `replace` has the same left-to-right
    // non-overlapping semantics in both engines, which IS greedy BPE
    // merge order.
    "q142_bpe_train" -> ((s, dir) =>
      TextAnalysis.bpeTrain(Tables.load(s, dir, "documents"),
        "text", rounds = 6)),

    // Tokenizer APPLICATION: per-document token count under the 6-merge BPE
    // vocabulary q142 trains — eligible words cost their merged-symbol
    // count, out-of-vocabulary input falls back to per-character tokens.
    // The token-budget statistic every mixing/packing stage actually wants
    // once a real tokenizer exists (q40's whitespace count is the proxy).
    "q143_bpe_tokens" -> ((s, dir) =>
      TextAnalysis.bpeTokenCounts(Tables.load(s, dir, "documents"),
        "doc_id", "text", rounds = 6)),

    // The packing family budgeted in TRAINED-tokenizer tokens (closing the
    // loop: q92/q94/q115 budget in whitespace tokens while q142 trains a
    // real vocab): frozen 6-merge vocab → q143's per-doc BPE counts →
    // q92's greedy pack / q94's source cap / q115's length-bucket batching
    // consume those counts via the ...ByCount entry points. Oracles compose
    // the q142 vocab CTE + q143 count CTE + the respective packing SQL.
    "q147_bpe_pack" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val counts = TextAnalysis.bpeCountWithVocab(docs, "doc_id", "text",
        TextAnalysis.bpeVocab(docs, "text", rounds = 6))
      graft.operators.CorpusOps.packSequencesByCount(counts, "doc_id",
        "n_bpe_tokens", budgetTokens = 512, nShards = 4)
    }),

    "q148_bpe_cap" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val counts = TextAnalysis.bpeCountWithVocab(docs, "doc_id", "text",
        TextAnalysis.bpeVocab(docs, "text", rounds = 6))
      graft.operators.CorpusOps.capSourceTokensByCount(
          docs.select(col("doc_id"), col("source")).join(counts, Seq("doc_id")),
          "doc_id", "source", "n_bpe_tokens", capTokens = 2000)
        .select("doc_id", "source", "n_tokens", "cum_tokens")
    }),

    "q149_bpe_batches" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val counts = TextAnalysis.bpeCountWithVocab(docs, "doc_id", "text",
        TextAnalysis.bpeVocab(docs, "text", rounds = 6))
      graft.operators.CorpusOps.lengthBucketBatchesByCount(counts, "doc_id",
        "n_bpe_tokens", batchSize = 8, bounds = Seq(16, 32, 64, 128))
    }),

    // Training-shard slices: the packing plan EXECUTED on real tokenizer
    // output — q150's token sequences are cut at q147's bin boundaries, so
    // each (shard, bin) reassembles to exactly 512 contiguous BPE tokens
    // (final bin per shard partial). One row per (doc, overlapped bin).
    "q151_bpe_shard_slices" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val seqs = TextAnalysis.bpeTokenizeWithVocab(docs, "doc_id", "text",
        TextAnalysis.bpeVocab(docs, "text", rounds = 6))
      graft.operators.CorpusOps.packTokenSlices(seqs, "doc_id", "tokens",
        budgetTokens = 512, nShards = 4)
    }),

    // Tokenizer EMISSION: the per-document token sequence itself (q143's
    // counts are the length of this) — trained symbols in word order, OOV
    // char fallback, serialized with a chr(1) separator for the compare.
    // The oracle replays the vocab CTE and rebuilds each word's token list
    // with DuckDB list comprehensions, string_agg'd in (word, symbol) order.
    "q150_bpe_tokenize" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      TextAnalysis.bpeTokenizeWithVocab(docs, "doc_id", "text",
          TextAnalysis.bpeVocab(docs, "text", rounds = 6))
        .select(col("doc_id"), concat_ws("\u0001", col("tokens")).as("tokens"))
    }),

    // Packed-bin boundary manifest: the attention-mask sidecar for q151's
    // shards — per (shard, bin), the ordered doc:start:len seam list (start
    // = token offset inside the bin), doc count, and token total (512
    // everywhere but each shard's final bin). Pure arithmetic over q143's
    // counts: no token text is read, let alone shuffled.
    "q153_pack_manifest" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val counts = TextAnalysis.bpeCountWithVocab(docs, "doc_id", "text",
        TextAnalysis.bpeVocab(docs, "text", rounds = 6))
      graft.operators.CorpusOps.packBoundaryManifest(counts, "doc_id",
        "n_bpe_tokens", budgetTokens = 512, nShards = 4)
    }),

    // Tokenizer evaluation scorecard: per source, word/token/char totals,
    // per-character-fallback word count, and the standard fertility
    // (tokens-per-word) and compression (chars-per-token) ratios as exact
    // integer milli-units under the frozen 6-merge vocabulary.
    "q154_tokenizer_fertility" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      TextAnalysis.tokenizerFertility(docs, "doc_id", "text", "source",
        TextAnalysis.bpeVocab(docs, "text", rounds = 6))
    }),

    // Curriculum-ordered training shards: quality-milli quantile phases
    // (histogram-derived boundaries — no corpus-wide rank), then q111's
    // deterministic md5 shuffle made phase-major inside each shard. The
    // "order the data easy-to-hard" step of curriculum training.
    "q155_curriculum" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .withColumn("q_milli",
          round(TextAnalysis.qualityScore(col("text"), stopwords) * 1000d)
            .cast("long"))
      graft.operators.CorpusOps.curriculumShards(docs, "doc_id", "q_milli",
        phases = 4, nShards = 8)
    }),

    // The per-document curation scorecard: every verified curation signal
    // in ONE row per document — predicted language + consistency flag, the
    // shared milli-quantized quality score, exact-dup keeper flag, Bloom
    // decontamination flag, the trained classifier margin, and the composed
    // keep decision. The report a data team audits BEFORE committing to a
    // q126-style release build; each signal reuses its driver-verified
    // oracle spelling, so the whole row hash-checks end to end.
    "q137_curation_report" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val qMilli = round(TextAnalysis.qualityScore(col("text"), stopwords)
        * 1000d).cast("long")
      // raw-corpus keeper (min id per exact text), unlike q126's
      // post-quality dedup — a report describes the corpus as found
      val keepers = docs.groupBy(md5(col("text")).as("__h"))
        .agg(min(col("doc_id")).as("keeper_id"))
      val contaminated = Dedup.bloomDecontaminate(docs, "doc_id", "text",
          benchFilter = col("doc_id") < 10, n = 6, minOverlaps = 2)
        .select(col("doc_id")).withColumn("__cont", lit(true))
      val dense = Classifier.denseWeights(
        Classifier.trainWeights(docs, "doc_id", "text",
          col("lang") === "en", d = 256, iters = 2, lr = 0.5), 256)
      docs
        .withColumn("q_milli", qMilli)
        .withColumn("__h", md5(col("text")))
        .join(keepers, Seq("__h"))
        .join(predictedLang(s, docs), Seq("doc_id"))
        .join(broadcast(contaminated), Seq("doc_id"), "left")
        .withColumn("lang_ok", col("lang") === col("predicted_lang"))
        .withColumn("is_keeper", col("doc_id") === col("keeper_id"))
        .withColumn("contaminated", coalesce(col("__cont"), lit(false)))
        .withColumn("margin_micro", Classifier.scoreExpr(col("text"), dense))
        .withColumn("is_benchmark", col("doc_id") < 10)
        .withColumn("keep", !col("is_benchmark") && col("lang_ok")
          && col("q_milli") >= 200 && col("is_keeper") && !col("contaminated"))
        .select("doc_id", "predicted_lang", "lang_ok", "q_milli",
          "is_keeper", "contaminated", "margin_micro", "is_benchmark", "keep")
    }),

    // Blocklist span scan: per-doc occurrence counts of listed phrases —
    // map-side literal membership over overlapping n-grams, one tiny
    // (doc, phrase) aggregation, no text shuffle anywhere.
    "q138_blocklist_scan" -> ((s, dir) =>
      TextAnalysis.blocklistScan(Tables.load(s, dir, "documents"),
        "doc_id", "text", Seq(
          "order fast", "window join", "stream column",
          "big order scan", "group slow spark"))),

    // Release drift: top-20 tokens whose parts-per-million rate moved most
    // between the old and new slices — all-integer arithmetic (div, abs),
    // one token-keyed aggregation + ordered slice.
    "q135_release_drift" -> ((s, dir) =>
      TextAnalysis.tokenDrift(Tables.load(s, dir, "documents"), "text",
        isNew = col("doc_id") % 10 >= 8, k = 20)),

    // Release novelty: per new-release document, how many of its distinct
    // 8-grams the prior corpus has never seen, in exact integer permille —
    // the metric that ranks crawl snapshots before a full dedup pass.
    // One gram-keyed equi-join (exact-decontamination shape) + doc agg.
    "q132_novelty" -> ((s, dir) =>
      TextAnalysis.gramNovelty(Tables.load(s, dir, "documents"),
        "doc_id", "text", n = 8, isNew = col("doc_id") % 10 >= 8)),

    // GPT-3-style linear quality classifier, trained AND applied in-engine:
    // two full-batch logistic iterations over md5-hashed bag-of-words
    // features against the weak label lang = 'en', then every doc scored.
    // Integer micro-unit weights + softsign link make the whole training
    // loop bit-deterministic, so even the learned margins hash-check
    // against a fully unrolled SQL oracle.
    "q131_quality_classifier" -> ((s, dir) =>
      Classifier.trainScore(Tables.load(s, dir, "documents"), "doc_id",
        "text", col("lang") === "en", d = 256, iters = 2, lr = 0.5)),

    // Train-on-old, serve-on-new: weights learned on the prior release
    // (doc_id % 10 < 8) and applied to the new slice as ONE per-row
    // expression — no join, no shuffle, the same frozen-weight path the
    // streaming scorer (StreamEntry.scoreDocs) runs. Long addition
    // commutes, so the token-order expression margins hash-match the
    // oracle's (idx, cnt)-aggregated spelling exactly.
    "q134_classifier_serve" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val isNew = col("doc_id") % 10 >= 8
      VectorQueries.fixtureBuildSec.remove("q134_classifier_serve")
      val w = frozenWeights(s, dir, "q134_classifier_serve")
      docs.where(isNew).select(col("doc_id"),
          Classifier.scoreExpr(col("text"), w).as("margin_micro"))
        .withColumn("pred", col("margin_micro") > 0)
    }),

    // Vocabulary Zipf-coverage curve (q154's concentration half): for
    // k in {10, 100, 1000}, the milli-fraction of emitted token mass the k
    // most frequent symbols cover under the frozen 6-merge vocab.
    "q160_vocab_coverage" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      TextAnalysis.vocabCoverage(docs, "doc_id", "text",
        TextAnalysis.bpeVocab(docs, "text", rounds = 6), ks = Seq(10, 100, 1000))
    }),

    // Classifier calibration report (the audit before trusting q131/q134
    // margins as keep/drop thresholds): train on the old slice, score the
    // new, softsign-map margins to p, bucket p into 10 fixed bins, and
    // compare actual positive rate to mean predicted p per bin — all
    // integer milli-units, one bin-keyed aggregation.
    "q158_calibration" -> ((s, dir) =>
      Classifier.calibrationReport(Tables.load(s, dir, "documents"),
        "doc_id", "text", col("lang") === "en", col("doc_id") % 10 >= 8,
        d = 256, iters = 2, lr = 0.5)),

    // Gopher-style rule card (Rae et al. 2021 Table A1): word-level stats,
    // top-2-gram and duplicate-10-gram character fractions, conjunctive
    // keep — the canonical repetition/quality filter battery per document.
    "q171_gopher_rules" -> ((s, dir) =>
      TextAnalysis.gopherRules(Tables.load(s, dir, "documents"),
        "doc_id", "text", stopwords)),

    // Multi-signal quality ensemble (the FineWeb-style keep gate): for the
    // incoming slice, combine the heuristic quality score, the trained
    // classifier's softsign probability and the vs-old-releases gram
    // novelty into one fixed-weight integer score; keep at >= 700 milli.
    // All three signals are carried-verified; the ensemble is exact
    // integer arithmetic on their milli units.
    "q168_quality_ensemble" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val isNew = col("doc_id") % 10 >= 8
      VectorQueries.fixtureBuildSec.remove("q168_quality_ensemble")
      val w = frozenWeights(s, dir, "q168_quality_ensemble")
      val m = col("margin_micro").cast("double") / lit(1e6)
      val p = lit(0.5) + lit(0.5) * (m / (lit(1d) + abs(m)))
      val scored = docs.where(isNew).select(col("doc_id"),
          Classifier.scoreExpr(col("text"), w).as("margin_micro"),
          round(TextAnalysis.qualityScore(col("text"), stopwords) * 1000d)
            .cast("long").as("q_milli"))
        .withColumn("p_milli", floor(p * 1000).cast("long"))
      val nov = TextAnalysis.gramNovelty(docs, "doc_id", "text", n = 8,
          isNew = isNew)
        .select(col("doc_id"), col("novelty_permille"))
      scored.join(nov, Seq("doc_id"))
        .withColumn("ensemble_milli",
          expr("div(3 * q_milli + 4 * p_milli + 3 * novelty_permille, 10)"))
        .select(col("doc_id"), col("q_milli"), col("p_milli"),
          col("novelty_permille"), col("ensemble_milli"),
          (col("ensemble_milli") >= 700).as("keep"))
    }),

    // Threshold sweep (the choosing half of q158's audit): P/R/F1 of
    // `keep ⇔ margin > t` on the held-out slice for five candidate
    // micro-margin cut-points.
    "q161_threshold_sweep" -> ((s, dir) =>
      Classifier.thresholdSweep(Tables.load(s, dir, "documents"),
        "doc_id", "text", col("lang") === "en", col("doc_id") % 10 >= 8,
        d = 256, iters = 2, lr = 0.5,
        thresholdsMicro = Seq(-2000000L, -500000L, 0L, 500000L, 2000000L))),

    // Per-source dataset card (the summary table a corpus release ships
    // with): docs, token volume, mean quality score, language share, exact
    // duplicate rate — ONE map-side-combined aggregate over the corpus
    // (distinct-text counting rides an md5 count-distinct in the same pass).
    "q118_source_card" -> ((s, dir) => {
      val nTok = size(split(col("text"), " ")).cast("long")
      // the one shared quality definition (also behind q42/q102) — a card
      // must describe the score the pipeline actually filters on. Quantized
      // to integer milli-units before summing so the mean is independent of
      // partition/aggregation order (the repo's determinism idiom).
      val qMilli = round(TextAnalysis.qualityScore(col("text"), stopwords)
        * 1000d).cast("long")
      Tables.load(s, dir, "documents")
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(nTok).as("total_tokens"),
          round(sum(qMilli).cast("double")
            / (count(lit(1)).cast("double") * 1000d), 4).as("mean_quality"),
          round(sum(when(col("lang") === "en", 1L).otherwise(0L))
            .cast("double") / count(lit(1)), 4).as("en_share"),
          round(lit(1d) - countDistinct(md5(col("text"))).cast("double")
            / count(lit(1)), 4).as("dup_rate"))
    }),

    // Cross-source contamination matrix (corpus QA: which sources share
    // content): distinct 8-token shingles common to each source pair.
    // Scale shape: ONE shuffle keyed by shingle; each shingle reduces to its
    // source SET (bounded by #sources, map-side combined via collect_set),
    // and pairs expand from that tiny array — document pairs never join, so
    // a shingle shared by millions of docs costs one row, not a fan-out.
    "q116_source_overlap" -> ((s, dir) => {
      val sh = Tables.load(s, dir, "documents")
        .select(col("source"),
          explode(array_distinct(Dedup.shingles(col("text"), 8))).as("shingle"))
      val srcs = sh.groupBy(col("shingle"))
        .agg(sort_array(collect_set(col("source"))).as("srcs"))
        .where(size(col("srcs")) >= 2)
      srcs
        .select(explode(flatten(transform(col("srcs"), (x, i) =>
          transform(slice(col("srcs"), i + 2, size(col("srcs"))),
            y => struct(x.as("src_a"), y.as("src_b")))))).as("p"))
        .groupBy(col("p.src_a").as("src_a"), col("p.src_b").as("src_b"))
        .agg(count(lit(1)).as("n_shared"))
    }),

    // Incremental cross-release near-dup dedup: the newest release slice
    // (ids ≡ 8,9 mod 10) deduped against the signature STORE of all prior
    // releases — prior releases are never re-shingled or re-signed; their
    // text is touched only to exact-verify the candidate set. The on-disk
    // path (partitioned append, read-back, re-append idempotence, and that
    // the store-read answer equals this inline one) is SignatureStoreSpec;
    // the declared query keeps the store contents inline so it stays pure.
    "q120_incremental_dedup" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val isNew = col("doc_id") % 10 >= 8
      graft.pipeline.SignatureStore.incrementalNearDups(
        docs.where(isNew), "doc_id", "text",
        graft.pipeline.SignatureStore.signatures(
          docs.where(!isNew), "doc_id", "text"),
        docs, threshold = 0.5)
    }),

    // Exact incremental ingest (batch twin of the streaming foreachBatch
    // path): new-release docs surviving content-hash decontamination against
    // the store (no prior text touched) + keep-first within the new slice.
    "q121_incremental_exact" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val isNew = col("doc_id") % 10 >= 8
      graft.pipeline.SignatureStore.incrementalExactKeep(
        docs.where(isNew), "doc_id", "text",
        graft.pipeline.SignatureStore.signatures(
          docs.where(!isNew), "doc_id", "text"))
    }),

    // Incremental END-TO-END release build: the nightly counterpart of
    // q126's from-scratch build — exact dedup vs the signature store (q121)
    // → near-dup gate vs store + earlier kept (q120) → novelty floor vs
    // the gram store (q132) → frozen-weight classifier margin (q134) →
    // temperature mix (q110), all rolled forward against prior-release
    // STATE in one job (prior text touched only for candidate verifies).
    // The declared query passes the prior release's store frames inline so
    // it stays pure; ReleaseBuildSpec pins the persisted-store path to this
    // exact output and proves the rerun idempotent.
    // UNIFIED cross-tier nightly release (one release id drives BOTH
    // tiers): the q140 text-tier manifest (exact/near dedup vs the stores,
    // novelty floor, frozen classifier gate, temperature mix) ANTI-JOINED
    // with the q152 embedding-space contamination drop list over the SAME
    // release slice (doc_id ≡ vec_id in the fixture — the embedding of
    // doc i). A document must pass both tiers to ship. The drop list is
    // eval-bounded, so it broadcasts and the final gate is map-side.
    // Full SQL oracle: the q140 chain + the q152 chain composed (their
    // CTE namespaces are disjoint) with the same anti-join tail.
    "q185_unified_release" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val emb = Tables.load(s, dir, "embeddings")
      val isNew = col("doc_id") % 10 >= 8
      val old = docs.where(!isNew)
      VectorQueries.fixtureBuildSec.remove("q185_unified_release")
      val w = frozenWeights(s, dir, "q185_unified_release")
      val manifest = graft.pipeline.ReleaseBuild.rollForward(
        docs.where(isNew), "doc_id", "text", "source", docs,
        graft.pipeline.SignatureStore.signatures(old, "doc_id", "text"),
        graft.pipeline.GramStore.grams(old, "text"), w)
      val drops = Similarity.ivfDecontaminate(emb, "vec_id", "embedding",
          "label", col("vec_id") % 50 === 0, threshold = 0.3, nProbe = 2)
        .select(col("vec_id").as("doc_id"))
      manifest.join(broadcast(drops), Seq("doc_id"), "left_anti")
    }),

    "q140_release_build" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val isNew = col("doc_id") % 10 >= 8
      val old = docs.where(!isNew)
      VectorQueries.fixtureBuildSec.remove("q140_release_build")
      val w = frozenWeights(s, dir, "q140_release_build")
      graft.pipeline.ReleaseBuild.rollForward(
        docs.where(isNew), "doc_id", "text", "source", docs,
        graft.pipeline.SignatureStore.signatures(old, "doc_id", "text"),
        graft.pipeline.GramStore.grams(old, "text"), w)
    }),

    // DOCUMENT takedown across the text tier (q205): takedown requests
    // arrive between releases; ReleaseBuild.takedownDocs deletes the ids'
    // signature rows EXACTLY and restores each affected release's gram
    // margin from its remaining members; the next nightly then rolls
    // forward against the scrubbed stores. Classifier weights stay frozen
    // (they predate the takedown — the q204 stance). FULL SQL oracle: the
    // q140 chain with the dedup/novelty prior state drawn from the LIVE
    // corpus (doc_id % 9 != 2) while the classifier CTEs keep the full old
    // slice.
    "q205_doc_takedown" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val isNew = col("doc_id") % 10 >= 8
      val old = docs.where(!isNew)
      val isTomb = col("doc_id") % 9 === 2
      VectorQueries.fixtureBuildSec.remove("q205_doc_takedown")
      // prior-night stores build once per JVM (q206 shares the same
      // fixture); each pass mutates a filesystem-copied private clone —
      // the q201 idiom, attributed to fixture_build
      val root = VectorQueries.timedFixture("q205_doc_takedown") {
        val shared = VectorQueries.sharedFixtureRoot(dir, "utkd-prior") {
          r =>
            graft.pipeline.SignatureStore.append(s, s"$r/sigs", "r1", old,
              "doc_id", "text")
            graft.pipeline.GramStore.append(s, s"$r/grams", "r1", old,
              "text")
        }
        VectorQueries.clonePath(s, shared)
      }
      val sigPath = s"$root/sigs"
      val gramPath = s"$root/grams"
      // weights are frozen prior-release state too — the shared fixture
      val w = frozenWeights(s, dir, "q205_doc_takedown")
      graft.pipeline.ReleaseBuild.takedownDocs(s, sigPath, gramPath,
        docs.where(isTomb).select(col("doc_id")), docs.where(!isTomb),
        "doc_id", "text")
      graft.pipeline.ReleaseBuild.rollForwardOnDisk(s,
        docs.where(isNew && !isTomb), "doc_id", "text", "source",
        docs.where(!isTomb), sigPath, gramPath, "r2", w)
    }),

    // Release QA exemplars: the q140 manifest's survivors feed per-source
    // stratified k-center (q194's kernel, k = 2) over their embeddings —
    // the selection-layer close of the release pipeline ("pick the most
    // DIFFERENT survivors of each source for human inspection"). Python
    // oracle = the q140 SQL manifest run in DuckDB + the same greedy
    // recurrence per source stratum.
    "q200_release_exemplars" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val emb = Tables.load(s, dir, "embeddings")
      val isNew = col("doc_id") % 10 >= 8
      val old = docs.where(!isNew)
      VectorQueries.fixtureBuildSec.remove("q200_release_exemplars")
      val w = frozenWeights(s, dir, "q200_release_exemplars")
      val manifest = graft.pipeline.ReleaseBuild.rollForward(
        docs.where(isNew), "doc_id", "text", "source", docs,
        graft.pipeline.SignatureStore.signatures(old, "doc_id", "text"),
        graft.pipeline.GramStore.grams(old, "text"), w)
      val pool = emb
        .join(manifest.select(col("doc_id").as("vec_id"), col("source")),
          Seq("vec_id"))
        .withColumn("stratum", substring(col("source"), 4, 10).cast("long"))
      graft.operators.Retrieval.kCenterPerStratum(pool, "vec_id",
        "embedding", "stratum", k = 2)
    })
  )

  /** Fixed query-term set for q112 (terms from the fixture vocabulary). */
  private val bm25Terms = Seq("vector", "merge", "window", "stream")

  /** Stopword-vote language prediction shared by q41 and the q102 cleaning
    * composite: argmax of lexicon hits (ties → lang asc, no hits →
    * 'unknown'). */
  /** The q126 chain as a reusable function (ScaleProbe drives it against
    * factor-× corpora): C4-style clean → benchmark decontamination →
    * temperature mix. See the q126 declaration for stage-by-stage notes. */
  def corpusBuild(s: SparkSession, docs: DataFrame): DataFrame = {
    val langOk = docs
      .join(predictedLang(s, docs), Seq("doc_id"))
      .where(col("predicted_lang") === col("lang"))
    val quality = langOk
      .withColumn("quality_score",
        TextAnalysis.qualityScore(col("text"), stopwords))
      .where(col("quality_score") >= 0.2)
    // keep-first per exact text as a partial-aggregable min + id semi-join,
    // never a window partitioned by content hash: a boilerplate text that
    // floods the corpus would funnel through ONE unsplittable sort
    // partition in the window form (the q99/q119 de-skew reasoning)
    val keepIds = quality
      .groupBy(md5(col("text")).as("__h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val deduped = quality.join(keepIds, Seq("doc_id"), "left_semi")
    // benchmark = the RAW held-out docs (ids < 10); corpus = the cleaned
    // survivors among the rest — contamination is judged against what the
    // benchmark actually contains, not against its cleaned residue
    val pool = docs.where(col("doc_id") < 10)
      .select(col("doc_id"), col("text"))
      .unionByName(deduped.where(col("doc_id") >= 10)
        .select(col("doc_id"), col("text")))
    val contaminated = Dedup.bloomDecontaminate(pool, "doc_id", "text",
      benchFilter = col("doc_id") < 10, n = 6, minOverlaps = 2)
    // the contaminated-id set is bounded by the benchmark's reach, never
    // corpus-sized — broadcast it so the anti-join is map-side instead of
    // shuffling every cleaned doc (stats can't see through the HAVING)
    val clean = deduped.where(col("doc_id") >= 10)
      .join(broadcast(contaminated.select("doc_id")), Seq("doc_id"),
        "left_anti")
    CorpusOps.temperatureMix(clean, "doc_id", "source", "text",
      alpha = 0.5, budgetTokens = 4000)
  }

  private def predictedLang(s: SparkSession, docs: DataFrame): DataFrame = {
    val lex = s.createDataFrame(lexicon).toDF("cand_lang", "token")
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
    val scores = toks.join(broadcast(lex), Seq("token"))
      .groupBy("doc_id", "cand_lang").agg(count(lit(1)).as("hits"))
    val best = Serving.topNPerGroup(scores, Seq("doc_id"),
      Seq(col("hits").desc, col("cand_lang").asc), 1, useRowNumber = true)
    docs.select(col("doc_id"))
      .join(best.select(col("doc_id"), col("cand_lang")), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cand_lang"), lit("unknown")).as("predicted_lang"))
  }

  private val lexValues = lexicon
    .map { case (l, t) => s"('$l', '$t')" }.mkString(", ")

  /** The q106 oracle, generated per documents column so both engines profile
    * the identical column set with the identical linear-counting sketch. */
  private val profileOracle: String = {
    val branches = Seq("doc_id", "text", "lang", "source", "n_chars").map { c =>
      s"""  SELECT '$c' AS col_name, COUNT(*) AS n_rows,
         |         COUNT(*) - COUNT($c) AS n_null,
         |         COUNT(DISTINCT ('0x' || substr(md5(CAST($c AS VARCHAR)), 1, 8))::BIGINT % 4096) AS filled,
         |         MAX(strlen(CAST($c AS VARCHAR))) AS max_len
         |  FROM documents""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH s AS (
       |$branches
       |)
       |SELECT col_name, n_rows, n_null,
       |       CASE WHEN filled < 4096 THEN
       |         CAST(round(-4096.0 * ln((4096.0 - filled) / 4096)) AS BIGINT)
       |       END AS approx_distinct,
       |       CAST(max_len AS BIGINT) AS max_len
       |FROM s""".stripMargin
  }

  /** DuckDB replay of [[graft.operators.TextAnalysis.bpeTrain]]'s loop,
    * unrolled to `rounds` CTE rounds (the q131 unrolled-oracle pattern):
    * w0 is the sentinel-segmented distinct-word frequency table; each round
    * counts adjacent symbol pairs weighted by word frequency, picks the
    * (count desc, pair asc) top-1, and re-segments with the same literal
    * `replace` the Spark side uses. SUM over BIGINT is HUGEINT in DuckDB,
    * so pair_count re-casts to BIGINT in the final union.
    *
    * Every CTE is `AS MATERIALIZED`: each w_r is referenced twice (p_{r+1}
    * and w_{r+1}), so DuckDB's default inlining re-evaluates the chain
    * 2^rounds times — measured 109.6 s → 0.1 s at sf0.001 for the 6-round
    * chain once materialized. The round-exhaustion guard COALESCEs the
    * scalar subqueries to '' (an empty needle makes replace a no-op,
    * mirroring the Spark loop's early stop; a bare NULL would NULL every
    * seg and silently fall back to per-character counts downstream). */
  /** The q134 serve chain (old-slice training unrolled to 2 iterations,
    * new-slice margins as `mf`) — shared by the q134 oracle and q158's
    * calibration tail. */
  private val classifierServeCtes: String =
    """WITH old AS (SELECT * FROM documents WHERE doc_id % 10 < 8),
        |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM old),
        |feat AS (
        |  SELECT doc_id,
        |         ('0x' || substr(md5(tok), 1, 8))::BIGINT % 256 AS idx,
        |         CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM toks GROUP BY 1, 2
        |),
        |lbl AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM old),
        |nn AS (SELECT COUNT(*) AS n FROM old),
        |g1 AS (
        |  SELECT idx,
        |         SUM(CAST(round((0.5 - y) * cnt * 1e6) AS BIGINT)) AS gsum
        |  FROM feat JOIN lbl USING (doc_id) GROUP BY 1
        |),
        |w1 AS (
        |  SELECT idx,
        |         0 - CAST(round(0.5 * gsum / n) AS BIGINT) AS w_int
        |  FROM g1, nn
        |),
        |m2 AS (
        |  SELECT doc_id, SUM(cnt * w_int) AS margin_micro
        |  FROM feat JOIN w1 USING (idx) GROUP BY 1
        |),
        |p2 AS (
        |  SELECT doc_id, 0.5 + 0.5 * (m / (1 + abs(m))) AS p
        |  FROM (SELECT doc_id, CAST(margin_micro AS DOUBLE) / 1e6 AS m FROM m2)
        |),
        |g2 AS (
        |  SELECT idx,
        |         SUM(CAST(round((p - y) * cnt * 1e6) AS BIGINT)) AS gsum
        |  FROM feat JOIN p2 USING (doc_id) JOIN lbl USING (doc_id) GROUP BY 1
        |),
        |w2 AS (
        |  SELECT w1.idx,
        |         w_int - CAST(round(0.5 * g2.gsum / n) AS BIGINT) AS w_int
        |  FROM w1 JOIN g2 ON w1.idx = g2.idx, nn
        |),
        |newtoks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents WHERE doc_id % 10 >= 8
        |),
        |newfeat AS (
        |  SELECT doc_id,
        |         ('0x' || substr(md5(tok), 1, 8))::BIGINT % 256 AS idx,
        |         CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM newtoks GROUP BY 1, 2
        |),
        |mf AS (
        |  SELECT doc_id, CAST(SUM(cnt * w_int) AS BIGINT) AS margin_micro
        |  FROM newfeat JOIN w2 USING (idx) GROUP BY 1
        |)
        |""".stripMargin.stripSuffix("\n")

  private def bpeRoundCtes(rounds: Int): String = {
    // symbols are BRACKETED "!sym?" (both sentinels load-bearing — see
    // TextAnalysis.bpeTrain's scaladoc); splitting on '?' yields
    // '!'-prefixed symbols with a trailing "" element
    val init =
      """WITH w0 AS MATERIALIZED (
        |  SELECT word, regexp_replace(word, '(.)', '!\1?', 'g') AS seg,
        |         CAST(COUNT(*) AS BIGINT) AS freq
        |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |  WHERE len(word) >= 2 AND NOT contains(word, '!') AND NOT contains(word, '?')
        |  GROUP BY word
        |)""".stripMargin
    val roundCtes = (1 to rounds).map { r =>
      s"""p$r AS MATERIALIZED (
         |  SELECT pair, SUM(freq) AS pair_count FROM (
         |    SELECT unnest([l[i] || '?' || l[i+1] || '?'
         |                   FOR i IN generate_series(1, len(l) - 2)]) AS pair,
         |           freq
         |    FROM (SELECT string_split(seg, '?') AS l, freq FROM w${r - 1})
         |    WHERE len(l) >= 3
         |  ) GROUP BY pair
         |),
         |b$r AS MATERIALIZED (SELECT pair, pair_count FROM p$r
         |        ORDER BY pair_count DESC, pair LIMIT 1),
         |w$r AS MATERIALIZED (SELECT word,
         |               -- mirror the Spark loop's early stop: when a round
         |               -- exhausts (b empty) the scalar subqueries are NULL
         |               -- and replace(seg, NULL, NULL) would NULL every seg;
         |               -- an empty needle makes replace a no-op instead
         |               replace(seg, COALESCE((SELECT pair FROM b$r), ''),
         |                 COALESCE((SELECT '!' || replace(replace(pair, '!', ''), '?', '') || '?'
         |                           FROM b$r), '')) AS seg, freq
         |        FROM w${r - 1})""".stripMargin
    }
    (init +: roundCtes).mkString(",\n")
  }

  private def bpeTrainOracle(rounds: Int): String = {
    val union = (1 to rounds)
      .map(r => s"SELECT CAST($r AS INTEGER) AS round, pair, " +
        s"CAST(pair_count AS BIGINT) AS pair_count FROM b$r")
      .mkString("\nUNION ALL\n")
    bpeRoundCtes(rounds) + "\n" + union
  }

  /** Apply the final round's vocabulary (w`rounds`) to per-document counts:
    * eligible words cost their symbol count, everything else one token per
    * character — `ntok(doc_id, n_bpe)`. Shared by the q143 count oracle and
    * the q147–q149 tokenizer-budgeted packing oracles. */
  private def bpeCountCtes(rounds: Int): String =
    bpeRoundCtes(rounds) +
      s""",
         |toks AS MATERIALIZED (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
         |),
         |cnt AS MATERIALIZED (
         |  SELECT t.doc_id,
         |         COALESCE(len(string_split(v.seg, '!')) - 1, len(t.word)) AS c
         |  FROM toks t LEFT JOIN w$rounds v USING (word)
         |),
         |ntok AS MATERIALIZED (
         |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bpe
         |  FROM cnt GROUP BY doc_id
         |)""".stripMargin

  private def bpeTokensOracle(rounds: Int): String =
    bpeCountCtes(rounds) +
      "\nSELECT doc_id, n_bpe AS n_bpe_tokens FROM ntok"

  /** q92's greedy pack, budgeted in TRAINED-tokenizer tokens. */
  private def bpePackOracle(rounds: Int): String =
    bpeCountCtes(rounds) +
      """,
        |c2 AS (
        |  SELECT doc_id, doc_id % 4 AS shard, n_bpe,
        |         COALESCE(SUM(n_bpe) OVER (
        |           PARTITION BY doc_id % 4 ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        |  FROM ntok
        |)
        |SELECT doc_id, shard, CAST(n_bpe AS BIGINT) AS n_tokens,
        |       CAST(floor(cum_before / 512) AS BIGINT) AS bin,
        |       CAST(cum_before % 512 AS BIGINT) AS "offset"
        |FROM c2""".stripMargin

  /** q94's source cap, budgeted in trained-tokenizer tokens. */
  private def bpeCapOracle(rounds: Int): String =
    bpeCountCtes(rounds) +
      """,
        |src AS (
        |  SELECT d.doc_id, d.source, n.n_bpe AS n_tokens,
        |         md5(CAST(d.doc_id AS VARCHAR)) AS h
        |  FROM documents d JOIN ntok n USING (doc_id)
        |),
        |capped AS (
        |  SELECT doc_id, source, n_tokens,
        |         SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
        |  FROM src
        |)
        |SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
        |       CAST(cum_tokens AS BIGINT) AS cum_tokens
        |FROM capped WHERE cum_tokens <= 2000""".stripMargin

  /** The tokenizer emission oracle: rebuild each word's token list with
    * DuckDB list comprehensions against the vocab CTE (trained symbols for
    * eligible words, per-character fallback otherwise), then string_agg in
    * (word position, symbol position) order with a chr(1) separator —
    * byte-identical to the Spark side's order-preserving flatten. */
  private def bpeTokenizeOracle(rounds: Int): String =
    bpeRoundCtes(rounds) +
      s""",
         |toks AS MATERIALIZED (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS word,
         |         generate_subscripts(string_split(text, ' '), 1) AS pos
         |  FROM documents
         |),
         |wt AS MATERIALIZED (
         |  SELECT t.doc_id, t.pos,
         |         CASE WHEN v.seg IS NOT NULL THEN
         |           [substr(string_split(v.seg, '?')[i], 2)
         |            FOR i IN generate_series(1, len(string_split(v.seg, '?')) - 1)]
         |         ELSE
         |           [substr(t.word, i, 1) FOR i IN generate_series(1, len(t.word))]
         |         END AS tl
         |  FROM toks t LEFT JOIN w$rounds v USING (word)
         |),
         |tok AS MATERIALIZED (
         |  SELECT doc_id, pos, unnest(tl) AS tok, generate_subscripts(tl, 1) AS tp
         |  FROM wt
         |)
         |SELECT d.doc_id, COALESCE(x.tokens, '') AS tokens
         |FROM documents d LEFT JOIN (
         |  SELECT doc_id, string_agg(tok, chr(1) ORDER BY pos, tp) AS tokens
         |  FROM tok GROUP BY doc_id
         |) x USING (doc_id)""".stripMargin

  /** q160's coverage curve: the tokenize chain's symbol histogram, a global
    * frequency rank (oracle-side only — the Spark plan takes ordered
    * slices, never a global window), and per-k mass sums via an
    * inequality left join, with `//` integer milli-units. */
  private def bpeCoverageOracle(rounds: Int): String =
    bpeRoundCtes(rounds) +
      s""",
         |toks AS MATERIALIZED (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS word,
         |         generate_subscripts(string_split(text, ' '), 1) AS pos
         |  FROM documents
         |),
         |wt AS MATERIALIZED (
         |  SELECT t.doc_id, t.pos,
         |         CASE WHEN v.seg IS NOT NULL THEN
         |           [substr(string_split(v.seg, '?')[i], 2)
         |            FOR i IN generate_series(1, len(string_split(v.seg, '?')) - 1)]
         |         ELSE
         |           [substr(t.word, i, 1) FOR i IN generate_series(1, len(t.word))]
         |         END AS tl
         |  FROM toks t LEFT JOIN w$rounds v USING (word)
         |),
         |tok AS MATERIALIZED (
         |  SELECT doc_id, pos, unnest(tl) AS tok FROM wt
         |),
         |f AS (SELECT tok AS t, CAST(COUNT(*) AS BIGINT) AS f FROM tok GROUP BY 1),
         |tot AS (
         |  SELECT CAST(SUM(f) AS BIGINT) AS total_tokens,
         |         CAST(COUNT(*) AS BIGINT) AS n_symbols
         |  FROM f
         |),
         |r AS (SELECT t, f, row_number() OVER (ORDER BY f DESC, t) AS rn FROM f),
         |ks AS (SELECT unnest([10, 100, 1000]) AS k)
         |SELECT CAST(ks.k AS BIGINT) AS k, tot.n_symbols, tot.total_tokens,
         |       CAST(COALESCE(SUM(r.f), 0) AS BIGINT) AS topk_tokens,
         |       (CAST(COALESCE(SUM(r.f), 0) AS BIGINT) * 1000) // tot.total_tokens AS covered_milli
         |FROM ks CROSS JOIN tot LEFT JOIN r ON r.rn <= ks.k
         |GROUP BY ks.k, tot.n_symbols, tot.total_tokens""".stripMargin

  /** Training-shard slices: the tokenize chain aggregated back to one
    * ordered token list per document, the q92 running-offset window over its
    * lengths, then each list cut at bin boundaries with DuckDB list slicing
    * — the same greatest/least arithmetic as the Spark side. */
  private def bpeShardSlicesOracle(rounds: Int): String =
    bpeRoundCtes(rounds) +
      s""",
         |toks AS MATERIALIZED (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS word,
         |         generate_subscripts(string_split(text, ' '), 1) AS pos
         |  FROM documents
         |),
         |wt AS MATERIALIZED (
         |  SELECT t.doc_id, t.pos,
         |         CASE WHEN v.seg IS NOT NULL THEN
         |           [substr(string_split(v.seg, '?')[i], 2)
         |            FOR i IN generate_series(1, len(string_split(v.seg, '?')) - 1)]
         |         ELSE
         |           [substr(t.word, i, 1) FOR i IN generate_series(1, len(t.word))]
         |         END AS tl
         |  FROM toks t LEFT JOIN w$rounds v USING (word)
         |),
         |tok AS MATERIALIZED (
         |  SELECT doc_id, pos, unnest(tl) AS tok, generate_subscripts(tl, 1) AS tp
         |  FROM wt
         |),
         |agg AS MATERIALIZED (
         |  SELECT doc_id, list(tok ORDER BY pos, tp) AS tl FROM tok GROUP BY doc_id
         |),
         |packed AS MATERIALIZED (
         |  SELECT doc_id, doc_id % 4 AS shard, CAST(len(tl) AS BIGINT) AS n, tl,
         |         CAST(COALESCE(SUM(len(tl)) OVER (
         |           PARTITION BY doc_id % 4 ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS o
         |  FROM agg
         |),
         |binned AS (
         |  SELECT doc_id, shard, n, tl, o,
         |         unnest(generate_series(o // 512, (o + n - 1) // 512)) AS b
         |  FROM packed
         |)
         |SELECT doc_id, shard, CAST(b AS BIGINT) AS bin,
         |       array_to_string(
         |         tl[CAST(greatest(b * 512 - o, 0) + 1 AS BIGINT) :
         |            CAST(least(n, (b + 1) * 512 - o) AS BIGINT)],
         |         chr(1)) AS chunk
         |FROM binned""".stripMargin

  /** q153's boundary manifest: the count CTEs, the q92 running-offset
    * window, the bin fan-out via generate_series, then one (shard, bin)
    * aggregation with the seam list string_agg'd in within-bin start order
    * — the same greatest/least arithmetic as the Spark side. */
  private def bpeManifestOracle(rounds: Int): String =
    bpeCountCtes(rounds) +
      """,
        |packed AS (
        |  SELECT doc_id, doc_id % 4 AS shard, n_bpe AS n,
        |         CAST(COALESCE(SUM(n_bpe) OVER (
        |           PARTITION BY doc_id % 4 ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS o
        |  FROM ntok WHERE n_bpe > 0
        |),
        |binned AS (
        |  SELECT doc_id, shard, n, o,
        |         unnest(generate_series(o // 512, (o + n - 1) // 512)) AS b
        |  FROM packed
        |),
        |seg AS (
        |  SELECT shard, CAST(b AS BIGINT) AS bin, doc_id,
        |         greatest(o - b * 512, 0) AS s,
        |         least(n, (b + 1) * 512 - o) - greatest(b * 512 - o, 0) AS l
        |  FROM binned
        |)
        |SELECT shard, bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(l) AS BIGINT) AS bin_tokens,
        |       string_agg(doc_id || ':' || s || ':' || l, ';' ORDER BY s) AS boundaries
        |FROM seg GROUP BY shard, bin""".stripMargin

  /** q154's tokenizer scorecard: per-word costs against the vocab CTE
    * (trained symbol count / per-character fallback), aggregated by source
    * with exact integer milli-ratios (`x * 1000 // y` on BIGINT — the same
    * integral division Spark's `div` performs, so no float can diverge). */
  private def bpeFertilityOracle(rounds: Int): String =
    bpeRoundCtes(rounds) +
      s""",
         |toks AS MATERIALIZED (
         |  SELECT doc_id, source, unnest(string_split(text, ' ')) AS word
         |  FROM documents
         |),
         |cnt AS MATERIALIZED (
         |  SELECT t.source,
         |         COALESCE(len(string_split(v.seg, '!')) - 1, len(t.word)) AS c,
         |         len(t.word) AS ch,
         |         CASE WHEN v.seg IS NULL THEN 1 ELSE 0 END AS fb
         |  FROM toks t LEFT JOIN w$rounds v USING (word)
         |),
         |agg AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_words,
         |         CAST(SUM(c) AS BIGINT) AS n_tokens,
         |         CAST(SUM(ch) AS BIGINT) AS n_chars,
         |         CAST(SUM(fb) AS BIGINT) AS n_fallback_words
         |  FROM cnt GROUP BY source
         |),
         |d AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
         |  FROM documents GROUP BY source
         |)
         |SELECT a.source, d.n_docs, a.n_words, a.n_tokens, a.n_chars,
         |       a.n_fallback_words,
         |       (a.n_tokens * 1000) // a.n_words AS fertility_milli,
         |       (a.n_chars * 1000) // a.n_tokens AS compression_milli
         |FROM agg a JOIN d USING (source)""".stripMargin

  /** q115's length-bucket batching, bucketed on trained-tokenizer counts. */
  private def bpeBatchesOracle(rounds: Int): String =
    bpeCountCtes(rounds) +
      """,
        |b AS (
        |  SELECT doc_id, n_bpe AS n, md5(CAST(doc_id AS VARCHAR)) AS h,
        |         CASE WHEN n_bpe <= 16 THEN 16 WHEN n_bpe <= 32 THEN 32
        |              WHEN n_bpe <= 64 THEN 64 WHEN n_bpe <= 128 THEN 128
        |              ELSE 1073741824 END AS bucket
        |  FROM ntok
        |),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY bucket ORDER BY h, doc_id) AS rn
        |  FROM b
        |)
        |SELECT CAST(bucket AS BIGINT) AS bucket,
        |       CAST(floor((rn - 1) / 8.0) AS BIGINT) AS batch,
        |       COUNT(*) AS n_docs,
        |       MAX(n) AS max_tokens,
        |       CAST(SUM(n) AS BIGINT) AS sum_tokens,
        |       round(1 - CAST(SUM(n) AS DOUBLE) / CAST(MAX(n) * COUNT(*) AS DOUBLE), 4)
        |         AS padding_frac
        |FROM r GROUP BY 1, 2""".stripMargin

  /** q185's oracle = the q140 chain + the q152 chain composed verbatim
    * (their CTE namespaces are disjoint) under the same anti-join tail the
    * engine runs — the documented compose-the-verified-spellings
    * discipline, spliced programmatically so the composition can never
    * drift from its two parents. The `require`s pin the splice markers. */
  private lazy val q185Oracle: String = {
    val q140 = baseOracles("q140_release_build")
    val q152 = VectorQueries.oracles("q152_embed_decontaminate")
    val tMark = "SELECT mt.doc_id, mt.source, mt.n_tokens,"
    val ti = q140.lastIndexOf(tMark)
    require(ti > 0, "q140 oracle tail marker moved; update q185Oracle")
    require(q140.indexOf(tMark) == ti,
      "q140 oracle tail marker is no longer unique; the splice would cut " +
        "at the wrong occurrence — update q185Oracle")
    val vBody = q152.stripPrefix("WITH ")
    val vMark = "SELECT vec_id, eval_id, cosine FROM ("
    val vi = vBody.lastIndexOf(vMark)
    require(vi > 0, "q152 oracle tail marker moved; update q185Oracle")
    require(vBody.indexOf(vMark) == vi,
      "q152 oracle tail marker is no longer unique; the splice would cut " +
        "at the wrong occurrence — update q185Oracle")
    q140.substring(0, ti).trim + ",\ntkeep AS (\n" +
      q140.substring(ti).trim + "\n),\n" +
      vBody.substring(0, vi).trim +
      ",\nvdrop AS (SELECT DISTINCT vec_id FROM scores)\n" +
      """SELECT f.doc_id, f.source, f.n_tokens, f.novelty_permille, f.margin_micro
        |FROM tkeep f LEFT JOIN vdrop d ON d.vec_id = f.doc_id
        |WHERE d.vec_id IS NULL""".stripMargin
  }

  /** q205's oracle = the q140 chain with the dedup/novelty prior state
    * drawn from the LIVE corpus (takedown ids excluded) while the
    * classifier CTEs keep the full old slice (frozen weights predate the
    * takedown). Spliced programmatically from q140's verified spelling —
    * each replaced fragment is `require`d present and unique so the
    * transform can never silently drift. */
  private lazy val q205Oracle: String = {
    val q140 = baseOracles("q140_release_build")
    def replaceOnce(s: String, from: String, to: String): String = {
      val i = s.indexOf(from)
      require(i >= 0, s"q140 oracle fragment moved; update q205Oracle: $from")
      require(s.indexOf(from, i + 1) < 0,
        s"q140 oracle fragment no longer unique; update q205Oracle: $from")
      s.substring(0, i) + to + s.substring(i + from.length)
    }
    var o = replaceOnce(q140, "WITH h AS (",
      "WITH live AS (SELECT * FROM documents WHERE doc_id % 9 <> 2),\nh AS (")
    // h (dedup hashes), t (shingles), gsh (grams) read the live corpus;
    // the classifier CTEs (old/newtoks) and the manifest join keep reading
    // `documents` — frozen weights, and joins already restricted by k-sets
    o = replaceOnce(o, "           FROM documents),\nk1 AS (",
      "           FROM live),\nk1 AS (")
    o = replaceOnce(o, "      FROM documents),\nidx AS (",
      "      FROM live),\nidx AS (")
    o = replaceOnce(o,
      "FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) gt",
      "FROM (SELECT doc_id, string_split(text, ' ') AS t FROM live) gt")
    o
  }

  def oracles: Map[String, String] =
    baseOracles + ("q185_unified_release" -> q185Oracle,
      "q205_doc_takedown" -> q205Oracle)

  private lazy val baseOracles: Map[String, String] = Map(
    "q85_chunk_docs" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |         len(string_split(text, ' ')) AS n
        |  FROM documents
        |),
        |idx AS (
        |  SELECT doc_id, toks,
        |         unnest(generate_series(0,
        |           greatest(CAST(ceil((n - 100) / 80.0) AS BIGINT), 0))) AS chunk_id
        |  FROM t
        |)
        |SELECT doc_id, chunk_id,
        |       array_to_string(toks[chunk_id * 80 + 1 : chunk_id * 80 + 100], ' ') AS chunk_text
        |FROM idx""".stripMargin,

    "q84_split_assign" ->
      """SELECT doc_id,
        |       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
        |            THEN 'valid' ELSE 'train' END AS split
        |FROM documents""".stripMargin,

    "q80_pii_scrub" ->
      """SELECT doc_id,
        |       regexp_replace(regexp_replace(text,
        |         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |         '[0-9]{6,}', '<NUM>', 'g') AS scrubbed
        |FROM documents""".stripMargin,

    "q33_unnest_tokens" ->
      """SELECT doc_id,
        |       generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
        |       unnest(string_split(text, ' ')) AS token
        |FROM documents""".stripMargin,

    "q40_token_count" ->
      """SELECT doc_id,
        |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |       CAST(length(text) AS BIGINT) AS n_chars_calc,
        |       CAST(strlen(text) AS BIGINT) AS n_bytes
        |FROM documents""".stripMargin,

    "q41_lang_id" ->
      s"""WITH lex(cand_lang, token) AS (VALUES $lexValues),
         |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
         |scores AS (
         |  SELECT doc_id, cand_lang, COUNT(*) AS hits
         |  FROM toks JOIN lex USING (token) GROUP BY doc_id, cand_lang
         |),
         |best AS (
         |  SELECT doc_id, cand_lang FROM (
         |    SELECT doc_id, cand_lang,
         |           row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, cand_lang) AS rn
         |    FROM scores
         |  ) WHERE rn = 1
         |)
         |SELECT d.doc_id, d.lang, COALESCE(best.cand_lang, 'unknown') AS predicted_lang
         |FROM documents d LEFT JOIN best ON d.doc_id = best.doc_id""".stripMargin,

    "q42_quality" ->
      """WITH b AS (
        |  SELECT doc_id,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |         CAST(len(list_filter(string_split(text, ' '),
        |              t -> t IN ('the', 'a', 'of', 'to', 'in', 'and'))) AS BIGINT) AS n_stop,
        |         length(replace(text, ' ', '')) AS chars_nospace
        |  FROM documents
        |)
        |SELECT doc_id, n_tokens, n_stop,
        |       round(CAST(chars_nospace AS DOUBLE) / n_tokens, 3) AS avg_token_len,
        |       round(CAST(n_stop AS DOUBLE) / n_tokens, 3) AS stop_ratio,
        |       round(least(CAST(n_tokens AS DOUBLE), 100) / 100
        |             * (1 - CAST(n_stop AS DOUBLE) / n_tokens), 3) AS quality_score
        |FROM b""".stripMargin,

    "q43_dedup_exact" ->
      """SELECT md5(text) AS text_hash, COUNT(*) AS n_copies, min(doc_id) AS keeper_id
        |FROM documents GROUP BY 1""".stripMargin,

    "q44_jaccard_pairs" ->
      """WITH raw AS (
        |  SELECT DISTINCT doc_id, source, lang, token FROM (
        |    SELECT doc_id, source, lang, unnest(string_split(text, ' ')) AS token FROM documents
        |  )
        |),
        |toks AS (
        |  SELECT doc_id, source, lang, token FROM (
        |    SELECT raw.*, COUNT(*) OVER (PARTITION BY source, lang, token) AS df FROM raw
        |  ) WHERE df <= 100
        |),
        |sizes AS (SELECT doc_id, COUNT(*) AS n_toks FROM toks GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_inter
        |  FROM toks a JOIN toks b ON a.source = b.source AND a.lang = b.lang AND a.token = b.token
        |  WHERE a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT a_id, b_id,
        |       round(CAST(n_inter AS DOUBLE) / (sa.n_toks + sb.n_toks - n_inter), 4) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = a_id
        |JOIN sizes sb ON sb.doc_id = b_id
        |WHERE round(CAST(n_inter AS DOUBLE) / (sa.n_toks + sb.n_toks - n_inter), 4) >= 0.5""".stripMargin,

    "q73_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
        |),
        |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        |dfreq AS (
        |  SELECT token, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, token FROM toks)
        |  GROUP BY token
        |),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, token,
        |         round(tf * ln(CAST(n_docs AS DOUBLE) / df), 4) AS score
        |  FROM tf JOIN dfreq USING (token), n
        |)
        |SELECT doc_id, token, score FROM (
        |  SELECT doc_id, token, score,
        |         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS rn
        |  FROM scored
        |) WHERE rn <= 3""".stripMargin,

    "q76_repetition" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |         CASE WHEN len(string_split(text, ' ')) < 5
        |              THEN [array_to_string(string_split(text, ' '), ' ')]
        |              ELSE [array_to_string(string_split(text, ' ')[i:i+4], ' ')
        |                    FOR i IN generate_series(1, len(string_split(text, ' ')) - 4)]
        |         END AS shingles
        |  FROM documents
        |)
        |SELECT doc_id,
        |       CAST(len(shingles) AS BIGINT) AS n_shingles,
        |       CAST(len(list_distinct(shingles)) AS BIGINT) AS n_distinct,
        |       round(1 - CAST(len(list_distinct(shingles)) AS DOUBLE) / len(shingles), 4)
        |         AS repetition
        |FROM sh""".stripMargin,

    "q77_decontaminate" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(t) < 8 THEN [array_to_string(t, ' ')]
        |         ELSE [array_to_string(t[i:i+7], ' ') FOR i IN generate_series(1, len(t) - 7)]
        |    END)) AS shingle
        |  FROM toks
        |),
        |bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 5)
        |SELECT sh.doc_id, COUNT(*) AS n_overlaps
        |FROM sh JOIN bench USING (shingle)
        |WHERE sh.doc_id >= 5
        |GROUP BY sh.doc_id
        |HAVING COUNT(*) >= 3""".stripMargin,

    "q50_multimodal_probe" ->
      """SELECT doc_id,
        |       CAST(strlen(text) AS BIGINT) AS byte_len,
        |       lower(hex(encode(left(text, 8)))) AS header_hex
        |FROM documents""".stripMargin,

    "q101_media_decode" ->
      """SELECT doc_id AS asset_id,
        |       CASE doc_id % 3 WHEN 0 THEN 'image'
        |                       WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |       CAST(CASE doc_id % 3 WHEN 0 THEN strlen(text) % 100 + 1
        |                            WHEN 1 THEN 0
        |                            ELSE strlen(text) % 320 + 1 END AS INT) AS width,
        |       CAST(CASE doc_id % 3 WHEN 0 THEN strlen(text) % 50 + 1
        |                            WHEN 1 THEN 0
        |                            ELSE strlen(text) % 240 + 1 END AS INT) AS height,
        |       CAST(CASE doc_id % 3 WHEN 0 THEN 0
        |                            WHEN 1 THEN strlen(text) // 8
        |                            ELSE strlen(text) END AS BIGINT) AS duration_ms
        |FROM documents""".stripMargin,

    "q106_profile" -> profileOracle,

    "q107_corpus_diff" ->
      """WITH cur AS (
        |  SELECT doc_id, md5(text) AS cur_hash FROM documents WHERE doc_id % 11 != 0
        |),
        |prev AS (
        |  SELECT doc_id,
        |         md5(CASE WHEN doc_id % 17 = 3 THEN reverse(text) ELSE text END) AS prev_hash
        |  FROM documents WHERE doc_id % 13 != 0
        |)
        |SELECT doc_id,
        |       CASE WHEN prev_hash IS NULL THEN 'added'
        |            WHEN cur_hash IS NULL THEN 'removed'
        |            WHEN cur_hash != prev_hash THEN 'changed' END AS status
        |FROM cur FULL OUTER JOIN prev USING (doc_id)
        |WHERE prev_hash IS NULL OR cur_hash IS NULL OR cur_hash != prev_hash""".stripMargin,

    "q108_nfc_normalize" ->
      ("""SELECT doc_id,
         |       md5(nfc_normalize(replace(text, 'a', 'a' || chr(769)))) AS norm_hash,
         |       CAST(strlen(nfc_normalize(replace(text, 'a', 'a' || chr(769)))) AS BIGINT)
         |         AS norm_bytes
         |FROM documents""").stripMargin,

    "q103_weighted_sample" ->
      """WITH w AS (
        |  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens FROM documents
        |),
        |p AS (
        |  SELECT doc_id, source,
        |         ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 0.5)
        |            / 4294967296.0) / n_tokens AS pri
        |  FROM w
        |),
        |r AS (
        |  SELECT doc_id, source,
        |         row_number() OVER (PARTITION BY source ORDER BY pri DESC, doc_id) AS rn
        |  FROM p
        |)
        |SELECT source, doc_id FROM r WHERE rn <= 5""".stripMargin,

    "q104_bigram_logprob" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bg AS (
        |  SELECT doc_id,
        |         unnest(t[1 : len(t) - 1]) AS w1,
        |         unnest(t[2 : len(t)]) AS w2
        |  FROM toks WHERE len(t) >= 2
        |),
        |bc AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
        |tot AS (SELECT w1, SUM(c12) AS c1 FROM bc GROUP BY 1)
        |SELECT doc_id,
        |       round(AVG(ln(CAST(c12 AS DOUBLE) / c1)), 4) AS mean_bigram_logprob
        |FROM bg JOIN bc USING (w1, w2) JOIN tot USING (w1)
        |GROUP BY doc_id""".stripMargin,

    "q99_block_dedup" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |idx AS (
        |  SELECT doc_id, toks,
        |         unnest(generate_series(0,
        |           greatest(CAST(ceil(len(toks) / 3.0) AS BIGINT) - 1, 0))) AS pos
        |  FROM t
        |),
        |b AS (
        |  SELECT doc_id, pos,
        |         array_to_string(toks[pos * 3 + 1 : pos * 3 + 3], ' ') AS block
        |  FROM idx
        |),
        |r AS (
        |  SELECT doc_id, pos, block,
        |         row_number() OVER (PARTITION BY block ORDER BY doc_id, pos) = 1 AS keep
        |  FROM b
        |)
        |SELECT doc_id,
        |       COUNT(*) AS n_blocks,
        |       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |       CASE WHEN SUM(CASE WHEN keep THEN 1 ELSE 0 END) > 0
        |            THEN string_agg(CASE WHEN keep THEN block END, ' ' ORDER BY pos)
        |       END AS deduped_text
        |FROM r GROUP BY doc_id""".stripMargin,

    "q100_heavy_hitters" ->
      """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |tot AS (SELECT COUNT(*) AS n_total FROM toks)
        |SELECT token, COUNT(*) AS n
        |FROM toks, tot
        |GROUP BY token, n_total
        |HAVING COUNT(*) >= ceil(n_total / 20.0)""".stripMargin,

    "q102_clean_compose" ->
      s"""WITH lex(cand_lang, token) AS (VALUES $lexValues),
         |ltoks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
         |scores AS (
         |  SELECT doc_id, cand_lang, COUNT(*) AS hits
         |  FROM ltoks JOIN lex USING (token) GROUP BY doc_id, cand_lang
         |),
         |best AS (
         |  SELECT doc_id, cand_lang FROM (
         |    SELECT doc_id, cand_lang,
         |           row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, cand_lang) AS rn
         |    FROM scores
         |  ) WHERE rn = 1
         |),
         |langok AS (
         |  SELECT d.doc_id, d.lang, d.text FROM documents d
         |  LEFT JOIN best ON d.doc_id = best.doc_id
         |  WHERE d.lang = COALESCE(best.cand_lang, 'unknown')
         |),
         |quality AS (
         |  SELECT doc_id, lang, text,
         |         round(least(CAST(len(string_split(text, ' ')) AS DOUBLE), 100) / 100
         |           * (1 - CAST(len(list_filter(string_split(text, ' '),
         |                t -> t IN ('the', 'a', 'of', 'to', 'in', 'and'))) AS DOUBLE)
         |              / len(string_split(text, ' '))), 3) AS quality_score
         |  FROM langok
         |),
         |qual AS (SELECT * FROM quality WHERE quality_score >= 0.2),
         |dedup AS (
         |  SELECT * FROM (
         |    SELECT doc_id, lang, quality_score, text,
         |           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
         |    FROM qual
         |  ) WHERE rn = 1
         |)
         |SELECT doc_id, lang, quality_score,
         |       regexp_replace(regexp_replace(text,
         |         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         |         '[0-9]{6,}', '<NUM>', 'g') AS scrubbed
         |FROM dedup""".stripMargin,

    // Constants are spelled as the same IEEE expressions the Spark side
    // computes ((1.2 + 1), not 2.2) and per-term contributions are
    // integer-quantized before the sum, so the scores are bit-identical.
    "q112_bm25" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM d),
         |stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS total_dl,
         |                 CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
         |toks AS (SELECT doc_id, unnest(t) AS term FROM d),
         |tf AS (
         |  SELECT doc_id, term, COUNT(*) AS tf FROM toks
         |  WHERE term IN ($bm25TermsSql) GROUP BY 1, 2
         |),
         |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
         |contrib AS (
         |  SELECT tf.doc_id,
         |         CAST(floor(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
         |           * (tf * (1.2 + 1))
         |           / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
         |           * 1e6 + 0.5) AS BIGINT) AS c
         |  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id), stats
         |)
         |SELECT doc_id, CAST(SUM(c) AS DOUBLE) / 1e6 AS score
         |FROM contrib GROUP BY doc_id
         |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    // The Bloom filter is exact-equivalent to the plain overlap join (no
    // false negatives; false positives removed by the verify join), so the
    // oracle is the unfiltered shingle-overlap SQL.
    "q114_bloom_decontaminate" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(t) < 6 THEN [array_to_string(t, ' ')]
        |         ELSE [array_to_string(t[i:i+5], ' ') FOR i IN generate_series(1, len(t) - 5)]
        |    END)) AS shingle
        |  FROM toks
        |),
        |bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 10)
        |SELECT sh.doc_id, COUNT(*) AS n_overlaps
        |FROM sh JOIN bench USING (shingle)
        |WHERE sh.doc_id >= 10
        |GROUP BY sh.doc_id
        |HAVING COUNT(*) >= 2""".stripMargin,

    // The composition oracle chains the verified q102 / q114 / q110 CTE
    // spellings unchanged: same lexicon VALUES, same quality rounding, same
    // 6-gram shingle construction, same integer-quantized tokens^0.5
    // weights and md5-uniform keep draw.
    "q126_corpus_build" ->
      s"""WITH lex(cand_lang, token) AS (VALUES $lexValues),
         |ltoks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
         |scores AS (
         |  SELECT doc_id, cand_lang, COUNT(*) AS hits
         |  FROM ltoks JOIN lex USING (token) GROUP BY doc_id, cand_lang
         |),
         |best AS (
         |  SELECT doc_id, cand_lang FROM (
         |    SELECT doc_id, cand_lang,
         |           row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, cand_lang) AS rn
         |    FROM scores
         |  ) WHERE rn = 1
         |),
         |langok AS (
         |  SELECT d.doc_id, d.lang, d.source, d.text FROM documents d
         |  LEFT JOIN best ON d.doc_id = best.doc_id
         |  WHERE d.lang = COALESCE(best.cand_lang, 'unknown')
         |),
         |quality AS (
         |  SELECT doc_id, lang, source, text,
         |         round(least(CAST(len(string_split(text, ' ')) AS DOUBLE), 100) / 100
         |           * (1 - CAST(len(list_filter(string_split(text, ' '),
         |                t -> t IN ('the', 'a', 'of', 'to', 'in', 'and'))) AS DOUBLE)
         |              / len(string_split(text, ' '))), 3) AS quality_score
         |  FROM langok
         |),
         |qual AS (SELECT * FROM quality WHERE quality_score >= 0.2),
         |dedup AS (
         |  SELECT * FROM (
         |    SELECT doc_id, source, text,
         |           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
         |    FROM qual
         |  ) WHERE rn = 1
         |),
         |pool AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id < 10
         |  UNION ALL
         |  SELECT doc_id, text FROM dedup WHERE doc_id >= 10
         |),
         |ptoks AS (SELECT doc_id, string_split(text, ' ') AS t FROM pool),
         |sh AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    CASE WHEN len(t) < 6 THEN [array_to_string(t, ' ')]
         |         ELSE [array_to_string(t[i:i+5], ' ') FOR i IN generate_series(1, len(t) - 5)]
         |    END)) AS shingle
         |  FROM ptoks
         |),
         |bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 10),
         |contaminated AS (
         |  SELECT sh.doc_id FROM sh JOIN bench USING (shingle)
         |  WHERE sh.doc_id >= 10
         |  GROUP BY sh.doc_id HAVING COUNT(*) >= 2
         |),
         |clean AS (
         |  SELECT doc_id, source, text FROM dedup
         |  WHERE doc_id >= 10
         |    AND doc_id NOT IN (SELECT doc_id FROM contaminated)
         |),
         |t AS (
         |  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
         |  FROM clean
         |),
         |tot AS (
         |  SELECT source, SUM(n_tokens) AS src_tokens,
         |         CAST(round(pow(CAST(SUM(n_tokens) AS DOUBLE), 0.5) * 1e6)
         |              AS HUGEINT) AS wq
         |  FROM t GROUP BY source
         |),
         |r AS (
         |  SELECT source,
         |         least(1.0, 4000.0 * CAST(wq AS DOUBLE)
         |           / CAST((SELECT SUM(wq) FROM tot) AS DOUBLE)
         |           / CAST(src_tokens AS DOUBLE)) AS keep_rate
         |  FROM tot
         |)
         |SELECT t.doc_id, t.source, CAST(t.n_tokens AS BIGINT) AS n_tokens
         |FROM t JOIN r USING (source)
         |WHERE ('0x' || substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 8))::BIGINT
         |        / 4294967296.0
         |      < keep_rate""".stripMargin,

    // the q174 chain aggregated by source with integer permille accounting
    "q179_scrub_report" ->
      """WITH d AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
        |  WHERE doc_id >= 5
        |),
        |bt AS (SELECT string_split(text, ' ') AS t FROM documents WHERE doc_id < 5),
        |bg AS (
        |  SELECT DISTINCT unnest(
        |    CASE WHEN len(t) < 5 THEN [array_to_string(t, ' ')]
        |         ELSE [array_to_string(t[i:i+4], ' ') FOR i IN generate_series(1, len(t) - 4)]
        |    END) AS gram
        |  FROM bt
        |),
        |g0 AS (
        |  SELECT doc_id,
        |         [array_to_string(t[i:i+4], ' ') FOR i IN generate_series(1, len(t) - 4)] AS gs
        |  FROM d WHERE len(t) >= 5
        |),
        |g AS (
        |  SELECT doc_id, unnest(gs) AS gram, generate_subscripts(gs, 1) AS gpos
        |  FROM g0
        |),
        |cov AS (
        |  SELECT DISTINCT doc_id, unnest(generate_series(gpos, gpos + 4)) AS pos
        |  FROM g JOIN bg USING (gram)
        |),
        |exc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_cut FROM cov GROUP BY 1),
        |per AS (
        |  SELECT d.source, CAST(len(d.t) AS BIGINT) AS n_tokens,
        |         COALESCE(exc.n_cut, 0) AS n_cut
        |  FROM d LEFT JOIN exc USING (doc_id)
        |)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(CASE WHEN n_cut > 0 THEN 1 ELSE 0 END) AS BIGINT) AS contaminated_docs,
        |       CAST(SUM(n_tokens) AS BIGINT) AS tokens_total,
        |       CAST(SUM(n_cut) AS BIGINT) AS tokens_excised,
        |       (CAST(SUM(n_cut) AS BIGINT) * 1000) // CAST(SUM(n_tokens) AS BIGINT) AS excised_permille
        |FROM per GROUP BY source""".stripMargin,

    // q119's covered-position chain with the decision set swapped to the
    // benchmark's distinct grams (whole-text shingle for short bench docs,
    // mirroring shinglesOfTokens).
    "q174_decontamination_scrub" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |  WHERE doc_id >= 5
        |),
        |bt AS (SELECT string_split(text, ' ') AS t FROM documents WHERE doc_id < 5),
        |bg AS (
        |  SELECT DISTINCT unnest(
        |    CASE WHEN len(t) < 5 THEN [array_to_string(t, ' ')]
        |         ELSE [array_to_string(t[i:i+4], ' ') FOR i IN generate_series(1, len(t) - 4)]
        |    END) AS gram
        |  FROM bt
        |),
        |g0 AS (
        |  SELECT doc_id,
        |         [array_to_string(t[i:i+4], ' ') FOR i IN generate_series(1, len(t) - 4)] AS gs
        |  FROM d WHERE len(t) >= 5
        |),
        |g AS (
        |  SELECT doc_id, unnest(gs) AS gram, generate_subscripts(gs, 1) AS gpos
        |  FROM g0
        |),
        |cov AS (
        |  SELECT DISTINCT doc_id, unnest(generate_series(gpos, gpos + 4)) AS pos
        |  FROM g JOIN bg USING (gram)
        |),
        |tok AS (
        |  SELECT doc_id, unnest(t) AS tok, generate_subscripts(t, 1) AS pos FROM d
        |),
        |kept AS (
        |  SELECT tok.doc_id, tok.pos, tok.tok
        |  FROM tok ANTI JOIN cov USING (doc_id, pos)
        |),
        |agg AS (
        |  SELECT doc_id, COUNT(*) AS n_kept,
        |         string_agg(tok, ' ' ORDER BY pos) AS scrubbed
        |  FROM kept GROUP BY doc_id
        |)
        |SELECT d.doc_id, CAST(len(d.t) AS BIGINT) AS n_tokens,
        |       CAST(COALESCE(agg.n_kept, 0) AS BIGINT) AS n_kept,
        |       agg.scrubbed
        |FROM d LEFT JOIN agg USING (doc_id)""".stripMargin,

    "q119_span_scrub" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |g0 AS (
        |  SELECT doc_id,
        |         [array_to_string(t[i:i+7], ' ') FOR i IN generate_series(1, len(t) - 7)] AS gs
        |  FROM d WHERE len(t) >= 8
        |),
        |g AS (
        |  SELECT doc_id, unnest(gs) AS gram, generate_subscripts(gs, 1) AS gpos
        |  FROM g0
        |),
        |rep AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) > 1),
        |cov AS (
        |  SELECT DISTINCT doc_id, unnest(generate_series(gpos, gpos + 7)) AS pos
        |  FROM g JOIN rep USING (gram)
        |),
        |tok AS (
        |  SELECT doc_id, unnest(t) AS tok, generate_subscripts(t, 1) AS pos FROM d
        |),
        |kept AS (
        |  SELECT tok.doc_id, tok.pos, tok.tok
        |  FROM tok ANTI JOIN cov USING (doc_id, pos)
        |),
        |agg AS (
        |  SELECT doc_id, COUNT(*) AS n_kept,
        |         string_agg(tok, ' ' ORDER BY pos) AS scrubbed
        |  FROM kept GROUP BY doc_id
        |)
        |SELECT d.doc_id, CAST(len(d.t) AS BIGINT) AS n_tokens,
        |       CAST(COALESCE(agg.n_kept, 0) AS BIGINT) AS n_kept,
        |       agg.scrubbed
        |FROM d LEFT JOIN agg USING (doc_id)""".stripMargin,

    // Same covered-position CTE chain as q119, then textbook
    // gaps-and-islands (pos − row_number is constant on a consecutive run)
    // and a slice of the document's token array for the span text.
    "q141_maximal_spans" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |g0 AS (
        |  SELECT doc_id,
        |         [array_to_string(t[i:i+7], ' ') FOR i IN generate_series(1, len(t) - 7)] AS gs
        |  FROM d WHERE len(t) >= 8
        |),
        |g AS (
        |  SELECT doc_id, unnest(gs) AS gram, generate_subscripts(gs, 1) AS gpos
        |  FROM g0
        |),
        |rep AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) > 1),
        |cov AS (
        |  SELECT DISTINCT doc_id, unnest(generate_series(gpos, gpos + 7)) AS pos
        |  FROM g JOIN rep USING (gram)
        |),
        |isl AS (
        |  SELECT doc_id, pos,
        |         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        |  FROM cov
        |),
        |sp AS (
        |  SELECT doc_id, MIN(pos) AS span_start, COUNT(*) AS span_len
        |  FROM isl GROUP BY doc_id, grp
        |)
        |SELECT sp.doc_id, CAST(sp.span_start AS BIGINT) AS span_start,
        |       CAST(sp.span_len AS BIGINT) AS span_len,
        |       array_to_string(d.t[sp.span_start:sp.span_start + sp.span_len - 1], ' ')
        |         AS span_text
        |FROM sp JOIN d USING (doc_id)""".stripMargin,

    "q142_bpe_train" -> bpeTrainOracle(6),

    "q143_bpe_tokens" -> bpeTokensOracle(6),
    "q147_bpe_pack" -> bpePackOracle(6),
    "q148_bpe_cap" -> bpeCapOracle(6),
    "q149_bpe_batches" -> bpeBatchesOracle(6),
    "q150_bpe_tokenize" -> bpeTokenizeOracle(6),
    "q151_bpe_shard_slices" -> bpeShardSlicesOracle(6),
    "q153_pack_manifest" -> bpeManifestOracle(6),

    // q137's exact q_milli spelling → score histogram → cumulative
    // boundaries at ceil(n·k/4) → phase = boundaries strictly below, then
    // q111's md5 shard/key made phase-major for the in-shard position.
    "q155_curriculum" ->
      """WITH d0 AS (
        |  SELECT doc_id, string_split(text, ' ') AS t,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents
        |),
        |q AS (
        |  SELECT doc_id,
        |         CAST(round(round(least(CAST(n_tok AS DOUBLE), 100) / 100
        |           * (1 - CAST(len(list_filter(t,
        |                tok -> tok IN ('the', 'a', 'of', 'to', 'in', 'and'))) AS DOUBLE)
        |              / n_tok), 3) * 1000) AS BIGINT) AS q_milli
        |  FROM d0
        |),
        |hist AS (SELECT q_milli AS s, CAST(COUNT(*) AS BIGINT) AS f FROM q GROUP BY 1),
        |cum AS (SELECT s, SUM(f) OVER (ORDER BY s) AS c FROM hist),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM q),
        |b AS (
        |  SELECT k, min(s) AS bs
        |  FROM (SELECT unnest(generate_series(1, 3)) AS k) ks, cum, n
        |  WHERE cum.c >= (n.n * k + 3) // 4
        |  GROUP BY k
        |),
        |ph AS (
        |  SELECT q.doc_id, q.q_milli,
        |         (SELECT COUNT(*) FROM b WHERE q.q_milli > b.bs) AS phase,
        |         md5('curriculum|' || CAST(q.doc_id AS VARCHAR)) AS kk,
        |         ('0x' || substr(md5('curriculum|' || CAST(q.doc_id AS VARCHAR)), 1, 8))::BIGINT % 8 AS shard
        |  FROM q
        |)
        |SELECT doc_id, q_milli, CAST(phase AS BIGINT) AS phase, shard,
        |       CAST(row_number() OVER (PARTITION BY shard ORDER BY phase, kk, doc_id) AS INT) AS pos
        |FROM ph""".stripMargin,
    "q154_tokenizer_fertility" -> bpeFertilityOracle(6),
    "q160_vocab_coverage" -> bpeCoverageOracle(6),

    "q129_bpe_merges" ->
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
        |p AS (
        |  SELECT substr(word, CAST(i AS INTEGER), 2) AS pair
        |  FROM w, unnest(generate_series(1, len(word) - 1)) AS t(i)
        |  WHERE len(word) >= 2
        |)
        |SELECT pair, CAST(COUNT(*) AS BIGINT) AS pair_count
        |FROM p GROUP BY pair
        |ORDER BY pair_count DESC, pair LIMIT 50""".stripMargin,

    // Every signal reuses its already-verified spelling: the q126 lexicon
    // vote (predicted lang), q118's q_milli quantization, q43's min-id
    // keeper, q114's exact-overlap contamination, q131's unrolled
    // classifier. The report row is their join.
    "q137_curation_report" ->
      s"""WITH lex(cand_lang, token) AS (VALUES $lexValues),
         |ltoks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
         |scores AS (
         |  SELECT doc_id, cand_lang, COUNT(*) AS hits
         |  FROM ltoks JOIN lex USING (token) GROUP BY doc_id, cand_lang
         |),
         |best AS (
         |  SELECT doc_id, cand_lang FROM (
         |    SELECT doc_id, cand_lang,
         |           row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, cand_lang) AS rn
         |    FROM scores
         |  ) WHERE rn = 1
         |),
         |d0 AS (
         |  SELECT doc_id, string_split(text, ' ') AS t,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
         |  FROM documents
         |),
         |q AS (
         |  SELECT doc_id,
         |         CAST(round(round(least(CAST(n_tok AS DOUBLE), 100) / 100
         |           * (1 - CAST(len(list_filter(t,
         |                tok -> tok IN ('the', 'a', 'of', 'to', 'in', 'and'))) AS DOUBLE)
         |              / n_tok), 3) * 1000) AS BIGINT) AS q_milli
         |  FROM d0
         |),
         |keepers AS (SELECT md5(text) AS h, MIN(doc_id) AS keeper_id FROM documents GROUP BY 1),
         |ctoks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |csh AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    CASE WHEN len(t) < 6 THEN [array_to_string(t, ' ')]
         |         ELSE [array_to_string(t[i:i+5], ' ') FOR i IN generate_series(1, len(t) - 5)]
         |    END)) AS shingle
         |  FROM ctoks
         |),
         |bench AS (SELECT DISTINCT shingle FROM csh WHERE doc_id < 10),
         |cont AS (
         |  SELECT csh.doc_id FROM csh JOIN bench USING (shingle)
         |  WHERE csh.doc_id >= 10
         |  GROUP BY csh.doc_id HAVING COUNT(*) >= 2
         |),
         |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         |feat AS (
         |  SELECT doc_id,
         |         ('0x' || substr(md5(tok), 1, 8))::BIGINT % 256 AS idx,
         |         CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM toks GROUP BY 1, 2
         |),
         |lbl AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents),
         |nn AS (SELECT COUNT(*) AS n FROM documents),
         |g1 AS (
         |  SELECT idx, SUM(CAST(round((0.5 - y) * cnt * 1e6) AS BIGINT)) AS gsum
         |  FROM feat JOIN lbl USING (doc_id) GROUP BY 1
         |),
         |w1 AS (SELECT idx, 0 - CAST(round(0.5 * gsum / n) AS BIGINT) AS w_int FROM g1, nn),
         |m2 AS (
         |  SELECT doc_id, SUM(cnt * w_int) AS margin_micro
         |  FROM feat JOIN w1 USING (idx) GROUP BY 1
         |),
         |p2 AS (
         |  SELECT doc_id, 0.5 + 0.5 * (m / (1 + abs(m))) AS p
         |  FROM (SELECT doc_id, CAST(margin_micro AS DOUBLE) / 1e6 AS m FROM m2)
         |),
         |g2 AS (
         |  SELECT idx, SUM(CAST(round((p - y) * cnt * 1e6) AS BIGINT)) AS gsum
         |  FROM feat JOIN p2 USING (doc_id) JOIN lbl USING (doc_id) GROUP BY 1
         |),
         |w2 AS (
         |  SELECT w1.idx, w_int - CAST(round(0.5 * g2.gsum / n) AS BIGINT) AS w_int
         |  FROM w1 JOIN g2 ON w1.idx = g2.idx, nn
         |),
         |mf AS (
         |  SELECT doc_id, CAST(SUM(cnt * w_int) AS BIGINT) AS margin_micro
         |  FROM feat JOIN w2 USING (idx) GROUP BY 1
         |)
         |SELECT d.doc_id,
         |       COALESCE(best.cand_lang, 'unknown') AS predicted_lang,
         |       d.lang = COALESCE(best.cand_lang, 'unknown') AS lang_ok,
         |       q.q_milli,
         |       d.doc_id = k.keeper_id AS is_keeper,
         |       d.doc_id IN (SELECT doc_id FROM cont) AS contaminated,
         |       mf.margin_micro,
         |       d.doc_id < 10 AS is_benchmark,
         |       (NOT d.doc_id < 10) AND d.lang = COALESCE(best.cand_lang, 'unknown')
         |         AND q.q_milli >= 200 AND d.doc_id = k.keeper_id
         |         AND NOT (d.doc_id IN (SELECT doc_id FROM cont)) AS keep
         |FROM documents d
         |LEFT JOIN best ON d.doc_id = best.doc_id
         |JOIN q ON q.doc_id = d.doc_id
         |JOIN keepers k ON k.h = md5(d.text)
         |JOIN mf ON mf.doc_id = d.doc_id""".stripMargin,

    "q138_blocklist_scan" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |g2 AS (
        |  SELECT doc_id, unnest(
        |    CASE WHEN len(tk) < 2 THEN [array_to_string(tk, ' ')]
        |         ELSE [array_to_string(tk[i:i+1], ' ') FOR i IN generate_series(1, len(tk) - 1)]
        |    END) AS phrase
        |  FROM t
        |),
        |g3 AS (
        |  SELECT doc_id, unnest(
        |    CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
        |         ELSE [array_to_string(tk[i:i+2], ' ') FOR i IN generate_series(1, len(tk) - 2)]
        |    END) AS phrase
        |  FROM t
        |),
        |hits AS (
        |  SELECT doc_id, phrase FROM g2
        |  WHERE phrase IN ('order fast', 'window join', 'stream column')
        |  UNION ALL
        |  SELECT doc_id, phrase FROM g3
        |  WHERE phrase IN ('big order scan', 'group slow spark')
        |)
        |SELECT doc_id, phrase, CAST(COUNT(*) AS BIGINT) AS n_hits
        |FROM hits GROUP BY 1, 2""".stripMargin,

    "q135_release_drift" ->
      """WITH toks AS (
        |  SELECT doc_id % 10 >= 8 AS is_new, unnest(string_split(text, ' ')) AS token
        |  FROM documents
        |),
        |counts AS (
        |  SELECT token,
        |         CAST(SUM(CASE WHEN is_new THEN 0 ELSE 1 END) AS BIGINT) AS c_old,
        |         CAST(SUM(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT) AS c_new
        |  FROM toks GROUP BY 1
        |),
        |tot AS (
        |  SELECT CAST(SUM(c_old) AS BIGINT) AS n_old,
        |         CAST(SUM(c_new) AS BIGINT) AS n_new
        |  FROM counts
        |)
        |SELECT token, c_old, c_new,
        |       CAST((c_old * 1000000) // n_old AS BIGINT) AS ppm_old,
        |       CAST((c_new * 1000000) // n_new AS BIGINT) AS ppm_new,
        |       CAST(abs((c_new * 1000000) // n_new - (c_old * 1000000) // n_old) AS BIGINT) AS drift_ppm
        |FROM counts, tot
        |ORDER BY drift_ppm DESC, token LIMIT 20""".stripMargin,

    "q132_novelty" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(t) < 8 THEN [array_to_string(t, ' ')]
        |         ELSE [array_to_string(t[i:i+7], ' ') FOR i IN generate_series(1, len(t) - 7)]
        |    END)) AS gram
        |  FROM toks
        |),
        |oldg AS (SELECT DISTINCT gram FROM sh WHERE doc_id % 10 < 8),
        |newsh AS (SELECT doc_id, gram FROM sh WHERE doc_id % 10 >= 8)
        |SELECT n.doc_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_grams,
        |       CAST(SUM(CASE WHEN o.gram IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unseen,
        |       CAST((SUM(CASE WHEN o.gram IS NULL THEN 1 ELSE 0 END) * 1000)
        |            // COUNT(*) AS BIGINT) AS novelty_permille
        |FROM newsh n LEFT JOIN oldg o ON n.gram = o.gram
        |GROUP BY 1""".stripMargin,

    // q131's training CTEs restricted to the old slice, then the new slice
    // scored against w2. Unseen-feature docs still get a (zero-margin) row
    // via the LEFT JOIN, matching the expression path's additive-zero.
    "q134_classifier_serve" -> (classifierServeCtes +
      """
        |SELECT d.doc_id,
        |       COALESCE(mf.margin_micro, 0) AS margin_micro,
        |       COALESCE(mf.margin_micro, 0) > 0 AS pred
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 >= 8) d
        |LEFT JOIN mf USING (doc_id)""".stripMargin),

    // q134's serve chain + softsign link + fixed-width p bins, all-integer
    // milli ratios via `//` (Spark `div`).
    "q158_calibration" -> (classifierServeCtes +
      """,
        |sv AS (
        |  SELECT d.doc_id, COALESCE(mf.margin_micro, 0) AS mm,
        |         CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM (SELECT doc_id, lang FROM documents WHERE doc_id % 10 >= 8) d
        |  LEFT JOIN mf USING (doc_id)
        |),
        |pp AS (
        |  SELECT doc_id, y, 0.5 + 0.5 * (m / (1 + abs(m))) AS p
        |  FROM (SELECT doc_id, y, CAST(mm AS DOUBLE) / 1e6 AS m FROM sv)
        |),
        |bb AS (
        |  SELECT least(CAST(floor(p * 10) AS BIGINT), 9) AS bin, y,
        |         CAST(floor(p * 1000) AS BIGINT) AS pm
        |  FROM pp
        |)
        |SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(y) AS BIGINT) AS n_pos,
        |       (CAST(SUM(y) AS BIGINT) * 1000) // CAST(COUNT(*) AS BIGINT) AS pos_rate_milli,
        |       CAST(SUM(pm) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS mean_p_milli
        |FROM bb GROUP BY bin""".stripMargin),

    // word stats per row; per gram width one (doc, gram) count + doc reduce.
    // Top-2-gram tie breaks lexicographically (rn over cnt desc, g asc).
    "q171_gopher_rules" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
        |base AS (
        |  SELECT doc_id,
        |         CAST(len(w) AS BIGINT) AS n_words,
        |         CAST(length(replace(text, ' ', '')) AS BIGINT) AS cns,
        |         CAST(len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]'))) AS BIGINT) AS alpha,
        |         CAST(len(list_filter(w,
        |              x -> x IN ('the', 'a', 'of', 'to', 'in', 'and'))) AS BIGINT) AS n_stop,
        |         CAST(length(text) AS BIGINT) AS tlen
        |  FROM t
        |),
        |g2 AS (
        |  SELECT doc_id, unnest(
        |    CASE WHEN len(w) < 2 THEN [array_to_string(w, ' ')]
        |         ELSE [array_to_string(w[i:i+1], ' ') FOR i IN generate_series(1, len(w) - 1)]
        |    END) AS g
        |  FROM t
        |),
        |c2 AS (SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS cnt FROM g2 GROUP BY 1, 2),
        |t2 AS (
        |  SELECT doc_id, cnt AS t2cnt, CAST(length(g) AS BIGINT) AS t2len FROM (
        |    SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, g) AS rn
        |    FROM c2
        |  ) WHERE rn = 1
        |),
        |g10 AS (
        |  SELECT doc_id, unnest(
        |    CASE WHEN len(w) < 10 THEN [array_to_string(w, ' ')]
        |         ELSE [array_to_string(w[i:i+9], ' ') FOR i IN generate_series(1, len(w) - 9)]
        |    END) AS g
        |  FROM t
        |),
        |c10 AS (SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS cnt FROM g10 GROUP BY 1, 2),
        |d10 AS (
        |  SELECT doc_id,
        |         CAST(SUM(CASE WHEN cnt > 1 THEN cnt * length(g) ELSE 0 END) AS BIGINT) AS dupch,
        |         CAST(SUM(cnt * length(g)) AS BIGINT) AS allch
        |  FROM c10 GROUP BY 1
        |)
        |SELECT b.doc_id, b.n_words,
        |       (b.cns * 1000) // b.n_words AS mean_word_len_milli,
        |       (b.alpha * 1000) // b.n_words AS alpha_word_permille,
        |       b.n_stop,
        |       (t2.t2cnt * t2.t2len * 1000) // b.tlen AS top2_char_permille,
        |       (d10.dupch * 1000) // d10.allch AS dup10_char_permille,
        |       (b.n_words >= 50 AND b.n_words <= 100000
        |        AND (b.cns * 1000) // b.n_words >= 3000
        |        AND (b.cns * 1000) // b.n_words <= 10000
        |        AND (b.alpha * 1000) // b.n_words >= 800
        |        AND b.n_stop >= 2
        |        AND (t2.t2cnt * t2.t2len * 1000) // b.tlen <= 200
        |        AND (d10.dupch * 1000) // d10.allch <= 300) AS keep
        |FROM base b JOIN t2 USING (doc_id) JOIN d10 USING (doc_id)""".stripMargin,

    // q134's serve chain for p, q155's q_milli spelling, q132's novelty
    // chain, joined per doc and combined with the same integer weights.
    "q168_quality_ensemble" -> (classifierServeCtes +
      """,
        |sv AS (
        |  SELECT d.doc_id, COALESCE(mf.margin_micro, 0) AS mm
        |  FROM (SELECT doc_id FROM documents WHERE doc_id % 10 >= 8) d
        |  LEFT JOIN mf USING (doc_id)
        |),
        |pm AS (
        |  SELECT doc_id,
        |         CAST(floor((0.5 + 0.5 * (m / (1 + abs(m)))) * 1000) AS BIGINT) AS p_milli
        |  FROM (SELECT doc_id, CAST(mm AS DOUBLE) / 1e6 AS m FROM sv)
        |),
        |d0 AS (
        |  SELECT doc_id, string_split(text, ' ') AS t,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents WHERE doc_id % 10 >= 8
        |),
        |qm AS (
        |  SELECT doc_id,
        |         CAST(round(round(least(CAST(n_tok AS DOUBLE), 100) / 100
        |           * (1 - CAST(len(list_filter(t,
        |                tok -> tok IN ('the', 'a', 'of', 'to', 'in', 'and'))) AS DOUBLE)
        |              / n_tok), 3) * 1000) AS BIGINT) AS q_milli
        |  FROM d0
        |),
        |atoks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |ash AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(t) < 8 THEN [array_to_string(t, ' ')]
        |         ELSE [array_to_string(t[i:i+7], ' ') FOR i IN generate_series(1, len(t) - 7)]
        |    END)) AS gram
        |  FROM atoks
        |),
        |oldg AS (SELECT DISTINCT gram FROM ash WHERE doc_id % 10 < 8),
        |newsh AS (SELECT doc_id, gram FROM ash WHERE doc_id % 10 >= 8),
        |nv AS (
        |  SELECT n.doc_id,
        |         CAST((SUM(CASE WHEN o.gram IS NULL THEN 1 ELSE 0 END) * 1000)
        |              // COUNT(*) AS BIGINT) AS novelty_permille
        |  FROM newsh n LEFT JOIN oldg o ON n.gram = o.gram
        |  GROUP BY 1
        |)
        |SELECT qm.doc_id, qm.q_milli, pm.p_milli, nv.novelty_permille,
        |       (3 * qm.q_milli + 4 * pm.p_milli + 3 * nv.novelty_permille) // 10
        |         AS ensemble_milli,
        |       (3 * qm.q_milli + 4 * pm.p_milli + 3 * nv.novelty_permille) // 10 >= 700
        |         AS keep
        |FROM qm JOIN pm USING (doc_id) JOIN nv USING (doc_id)""".stripMargin),

    // q134's serve chain + per-threshold confusion counts. The oracle takes
    // the direct |slice|×|T| cross join (fine at oracle scale); the Spark
    // plan collapses to a histogram first — identical integer arithmetic.
    "q161_threshold_sweep" -> (classifierServeCtes +
      """,
        |sv AS (
        |  SELECT d.doc_id, COALESCE(mf.margin_micro, 0) AS mm,
        |         CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM (SELECT doc_id, lang FROM documents WHERE doc_id % 10 >= 8) d
        |  LEFT JOIN mf USING (doc_id)
        |),
        |th AS (SELECT unnest([-2000000, -500000, 0, 500000, 2000000]) AS t),
        |ag AS (
        |  SELECT th.t,
        |         CAST(SUM(CASE WHEN sv.mm > th.t THEN 1 ELSE 0 END) AS BIGINT) AS pp,
        |         CAST(SUM(CASE WHEN sv.mm > th.t AND sv.y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp
        |  FROM th CROSS JOIN sv GROUP BY 1
        |),
        |tot AS (
        |  SELECT CAST(SUM(y) AS BIGINT) AS p_all,
        |         CAST(COUNT(*) AS BIGINT) AS n_all
        |  FROM sv
        |)
        |SELECT CAST(t AS BIGINT) AS threshold_micro, tp,
        |       pp - tp AS fp, p_all - tp AS fn,
        |       n_all - pp - p_all + tp AS tn,
        |       CASE WHEN pp > 0 THEN (tp * 1000) // pp END AS precision_milli,
        |       CASE WHEN p_all > 0 THEN (tp * 1000) // p_all END AS recall_milli,
        |       CASE WHEN pp + p_all > 0 THEN (tp * 2000) // (pp + p_all) END AS f1_milli
        |FROM ag CROSS JOIN tot""".stripMargin),


    // The unrolled twin of Classifier.trainScore (iters = 2, d = 256,
    // lr = 0.5): iteration 1 starts from zero weights, so p = 0.5 exactly;
    // iteration 2 uses the learned micro-unit weights. All corpus-sized
    // sums are sums of exact BIGINTs; round(x)::BIGINT matches Spark's
    // decimal(38,0) HALF_UP for both signs (half away from zero).
    "q131_quality_classifier" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
        |),
        |feat AS (
        |  SELECT doc_id,
        |         ('0x' || substr(md5(tok), 1, 8))::BIGINT % 256 AS idx,
        |         CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM toks GROUP BY 1, 2
        |),
        |lbl AS (
        |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents
        |),
        |nn AS (SELECT COUNT(*) AS n FROM documents),
        |g1 AS (
        |  SELECT idx,
        |         SUM(CAST(round((0.5 - y) * cnt * 1e6) AS BIGINT)) AS gsum
        |  FROM feat JOIN lbl USING (doc_id) GROUP BY 1
        |),
        |w1 AS (
        |  SELECT idx,
        |         0 - CAST(round(0.5 * gsum / n) AS BIGINT) AS w_int
        |  FROM g1, nn
        |),
        |m2 AS (
        |  SELECT doc_id, SUM(cnt * w_int) AS margin_micro
        |  FROM feat JOIN w1 USING (idx) GROUP BY 1
        |),
        |p2 AS (
        |  SELECT doc_id, 0.5 + 0.5 * (m / (1 + abs(m))) AS p
        |  FROM (SELECT doc_id, CAST(margin_micro AS DOUBLE) / 1e6 AS m FROM m2)
        |),
        |g2 AS (
        |  SELECT idx,
        |         SUM(CAST(round((p - y) * cnt * 1e6) AS BIGINT)) AS gsum
        |  FROM feat JOIN p2 USING (doc_id) JOIN lbl USING (doc_id) GROUP BY 1
        |),
        |w2 AS (
        |  SELECT w1.idx,
        |         w_int - CAST(round(0.5 * g2.gsum / n) AS BIGINT) AS w_int
        |  FROM w1 JOIN g2 ON w1.idx = g2.idx, nn
        |),
        |mf AS (
        |  SELECT doc_id, CAST(SUM(cnt * w_int) AS BIGINT) AS margin_micro
        |  FROM feat JOIN w2 USING (idx) GROUP BY 1
        |)
        |SELECT lbl.doc_id, lbl.y, mf.margin_micro, mf.margin_micro > 0 AS pred
        |FROM lbl JOIN mf USING (doc_id)""".stripMargin,

    "q118_source_card" ->
      """WITH d AS (
        |  SELECT source, lang, text, string_split(text, ' ') AS t,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents
        |),
        |q AS (
        |  SELECT source, lang, text, n_tok,
        |         CAST(round(round(least(CAST(n_tok AS DOUBLE), 100) / 100
        |           * (1 - CAST(len(list_filter(t,
        |                tok -> tok IN ('the', 'a', 'of', 'to', 'in', 'and'))) AS DOUBLE)
        |              / n_tok), 3) * 1000) AS BIGINT) AS q_milli
        |  FROM d
        |)
        |SELECT source,
        |       COUNT(*) AS n_docs,
        |       CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
        |       round(CAST(SUM(q_milli) AS DOUBLE)
        |             / (CAST(COUNT(*) AS DOUBLE) * 1000), 4) AS mean_quality,
        |       round(CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE)
        |             / COUNT(*), 4) AS en_share,
        |       round(1 - CAST(COUNT(DISTINCT md5(text)) AS DOUBLE) / COUNT(*), 4)
        |         AS dup_rate
        |FROM q GROUP BY source""".stripMargin,

    "q116_source_overlap" ->
      """WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
        |sh AS (
        |  SELECT DISTINCT source, unnest(list_distinct(
        |    CASE WHEN len(t) < 8 THEN [array_to_string(t, ' ')]
        |         ELSE [array_to_string(t[i:i+7], ' ') FOR i IN generate_series(1, len(t) - 7)]
        |    END)) AS shingle
        |  FROM toks
        |)
        |SELECT a.source AS src_a, b.source AS src_b,
        |       CAST(COUNT(*) AS BIGINT) AS n_shared
        |FROM sh a JOIN sh b USING (shingle)
        |WHERE a.source < b.source
        |GROUP BY 1, 2""".stripMargin,

    // exact-Jaccard ground truth (the q45 oracle shape) restricted to
    // new-vs-(prior ∪ earlier-new) pairs — valid as the engine's oracle
    // because LSH recall is 100% at these parameters (RecallSpec)
    "q120_incremental_dedup" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
        |                  doc_id % 10 >= 8 AS is_new
        |           FROM documents),
        |idx AS (
        |  SELECT doc_id, toks, is_new,
        |         unnest(generate_series(1, greatest(len(toks) - 2, 1))) AS i
        |  FROM t
        |),
        |sh AS (
        |  SELECT DISTINCT doc_id, is_new,
        |         array_to_string(toks[i:least(i + 2, len(toks))], ' ') AS shingle
        |  FROM idx
        |),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS new_id, b.doc_id AS dup_id, COUNT(*) AS n_inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle
        |  WHERE a.is_new AND (NOT b.is_new OR b.doc_id < a.doc_id)
        |  GROUP BY 1, 2
        |)
        |SELECT new_id, dup_id,
        |       round(CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter), 4) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = new_id
        |JOIN sizes sb ON sb.doc_id = dup_id
        |WHERE round(CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter), 4) >= 0.5""".stripMargin,

    "q121_incremental_exact" ->
      """WITH h AS (SELECT doc_id, md5(text) AS content_md5,
        |                  doc_id % 10 >= 8 AS is_new
        |           FROM documents),
        |fresh AS (
        |  SELECT doc_id, content_md5 FROM h n
        |  WHERE is_new AND NOT EXISTS (
        |    SELECT 1 FROM h o WHERE NOT o.is_new AND o.content_md5 = n.content_md5)
        |)
        |SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id, content_md5
        |FROM fresh GROUP BY content_md5""".stripMargin,

    // Chains the verified spellings stage by stage: k1 = q121's exact keep,
    // dup/k2 = q120's exact-Jaccard pairs restricted to k1 survivors,
    // nov/k3 = q132's unseen-gram permille over k2, w1..w2/mf = q134's
    // unrolled classifier (trained on the old slice) gating margin > 0,
    // and the tail is q110's temperature mix computed over the survivors.
    "q140_release_build" ->
      """WITH h AS (SELECT doc_id, md5(text) AS content_md5,
        |                  doc_id % 10 >= 8 AS is_new
        |           FROM documents),
        |k1 AS (
        |  SELECT MIN(doc_id) AS doc_id FROM h n
        |  WHERE is_new AND NOT EXISTS (
        |    SELECT 1 FROM h o WHERE NOT o.is_new AND o.content_md5 = n.content_md5)
        |  GROUP BY content_md5
        |),
        |t AS (SELECT doc_id, string_split(text, ' ') AS toks,
        |             doc_id % 10 >= 8 AS is_new
        |      FROM documents),
        |idx AS (
        |  SELECT doc_id, toks, is_new,
        |         unnest(generate_series(1, greatest(len(toks) - 2, 1))) AS i
        |  FROM t
        |),
        |sh AS (
        |  SELECT DISTINCT doc_id, is_new,
        |         array_to_string(toks[i:least(i + 2, len(toks))], ' ') AS shingle
        |  FROM idx
        |),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS new_id, b.doc_id AS dup_id, COUNT(*) AS n_inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle
        |  WHERE a.doc_id IN (SELECT doc_id FROM k1)
        |    AND (NOT b.is_new
        |         OR (b.doc_id IN (SELECT doc_id FROM k1) AND b.doc_id < a.doc_id))
        |  GROUP BY 1, 2
        |),
        |dup AS (
        |  SELECT DISTINCT new_id FROM inter
        |  JOIN sizes sa ON sa.doc_id = new_id
        |  JOIN sizes sb ON sb.doc_id = dup_id
        |  WHERE round(CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter), 4) >= 0.5
        |),
        |k2 AS (SELECT doc_id FROM k1
        |       WHERE doc_id NOT IN (SELECT new_id FROM dup)),
        |gsh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(gt.t) < 8 THEN [array_to_string(gt.t, ' ')]
        |         ELSE [array_to_string(gt.t[i:i+7], ' ')
        |               FOR i IN generate_series(1, len(gt.t) - 7)]
        |    END)) AS gram
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) gt
        |),
        |oldg AS (SELECT DISTINCT gram FROM gsh WHERE doc_id % 10 < 8),
        |nov AS (
        |  SELECT n.doc_id,
        |         CAST((SUM(CASE WHEN o.gram IS NULL THEN 1 ELSE 0 END) * 1000)
        |              // COUNT(*) AS BIGINT) AS novelty_permille
        |  FROM gsh n JOIN k2 USING (doc_id)
        |  LEFT JOIN oldg o ON n.gram = o.gram
        |  GROUP BY 1
        |),
        |k3 AS (SELECT doc_id, novelty_permille FROM nov
        |       WHERE novelty_permille >= 200),
        |old AS (SELECT * FROM documents WHERE doc_id % 10 < 8),
        |toks2 AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM old),
        |feat AS (
        |  SELECT doc_id,
        |         ('0x' || substr(md5(tok), 1, 8))::BIGINT % 256 AS idx,
        |         CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM toks2 GROUP BY 1, 2
        |),
        |lbl AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM old),
        |nn AS (SELECT COUNT(*) AS n FROM old),
        |g1 AS (
        |  SELECT idx,
        |         SUM(CAST(round((0.5 - y) * cnt * 1e6) AS BIGINT)) AS gsum
        |  FROM feat JOIN lbl USING (doc_id) GROUP BY 1
        |),
        |w1 AS (
        |  SELECT idx,
        |         0 - CAST(round(0.5 * gsum / n) AS BIGINT) AS w_int
        |  FROM g1, nn
        |),
        |m2 AS (
        |  SELECT doc_id, SUM(cnt * w_int) AS margin_micro
        |  FROM feat JOIN w1 USING (idx) GROUP BY 1
        |),
        |p2 AS (
        |  SELECT doc_id, 0.5 + 0.5 * (m / (1 + abs(m))) AS p
        |  FROM (SELECT doc_id, CAST(margin_micro AS DOUBLE) / 1e6 AS m FROM m2)
        |),
        |g2 AS (
        |  SELECT idx,
        |         SUM(CAST(round((p - y) * cnt * 1e6) AS BIGINT)) AS gsum
        |  FROM feat JOIN p2 USING (doc_id) JOIN lbl USING (doc_id) GROUP BY 1
        |),
        |w2 AS (
        |  SELECT w1.idx,
        |         w_int - CAST(round(0.5 * g2.gsum / n) AS BIGINT) AS w_int
        |  FROM w1 JOIN g2 ON w1.idx = g2.idx, nn
        |),
        |newtoks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents WHERE doc_id % 10 >= 8
        |),
        |newfeat AS (
        |  SELECT doc_id,
        |         ('0x' || substr(md5(tok), 1, 8))::BIGINT % 256 AS idx,
        |         CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM newtoks GROUP BY 1, 2
        |),
        |mf AS (
        |  SELECT doc_id, CAST(SUM(cnt * w_int) AS BIGINT) AS margin_micro
        |  FROM newfeat JOIN w2 USING (idx) GROUP BY 1
        |),
        |k4 AS (
        |  SELECT k3.doc_id, k3.novelty_permille, mf.margin_micro
        |  FROM k3 JOIN mf USING (doc_id)
        |  WHERE mf.margin_micro > 0
        |),
        |mt AS (
        |  SELECT d.doc_id, d.source,
        |         CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
        |         k4.novelty_permille, k4.margin_micro
        |  FROM documents d JOIN k4 USING (doc_id)
        |),
        |tot AS (
        |  SELECT source, SUM(n_tokens) AS src_tokens,
        |         CAST(round(pow(CAST(SUM(n_tokens) AS DOUBLE), 0.5) * 1e6)
        |              AS HUGEINT) AS wq
        |  FROM mt GROUP BY source
        |),
        |r AS (
        |  SELECT source,
        |         least(1.0, 4000.0 * CAST(wq AS DOUBLE)
        |           / CAST((SELECT SUM(wq) FROM tot) AS DOUBLE)
        |           / CAST(src_tokens AS DOUBLE)) AS keep_rate
        |  FROM tot
        |)
        |SELECT mt.doc_id, mt.source, mt.n_tokens,
        |       mt.novelty_permille, mt.margin_micro
        |FROM mt JOIN r USING (source)
        |WHERE ('0x' || substr(md5(CAST(mt.doc_id AS VARCHAR)), 1, 8))::BIGINT
        |        / 4294967296.0
        |      < keep_rate""".stripMargin
  )

  /** q112's term list rendered for the oracle's IN clause. */
  private def bm25TermsSql: String =
    bm25Terms.map(t => s"'$t'").mkString(", ")
}
