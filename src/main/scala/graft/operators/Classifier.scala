package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Linear quality classifier over hashed bag-of-words features — the
  * GPT-3-style pretraining filter (Brown et al. 2020 trained a linear
  * classifier on weak source labels and kept documents by score; fastText's
  * supervised mode is the same shape): full-batch logistic regression,
  * trained and applied inside the engine.
  *
  * Everything is built for exact cross-engine determinism, so the whole
  * training loop carries a hash-checked SQL oracle:
  *
  *   - Feature hashing uses md5 (first 8 hex chars mod `d`), not xxhash64 —
  *     md5 is the one hash DuckDB and Spark share bit-for-bit.
  *   - Weights live in integer micro-units; every corpus-sized sum (margins,
  *     gradients) is a sum of exact longs, so no result depends on
  *     partition or aggregation order. Per-row gradient contributions are
  *     quantized HALF_UP before summing (the repo's determinism idiom).
  *   - The link function is the softsign logistic p = 0.5 + 0.5·m/(1+|m|),
  *     not 1/(1+e^-m): it is built from IEEE basic ops only (+, *, /, abs),
  *     which are correctly-rounded and therefore bit-identical across
  *     engines, where libm's `exp` is not guaranteed to agree in the last
  *     ulp between a JVM and anything else. Same squashing shape, exact
  *     reproducibility.
  *
  * Scale shape: the feature build is one (doc, idx)-keyed aggregation; per
  * iteration, the margin pass is a doc-keyed aggregation of exact longs
  * (map-side partials) with the d-row weight table broadcast, and the
  * gradient pass aggregates into at most `d` keys — map-side partial
  * aggregation collapses the corpus to ≤d rows per partition before the
  * wire. The weight state never leaves the cluster: it stays a d-row
  * DataFrame between iterations (no driver loop state beyond the row
  * count), so the trainer is the same shape at 100 TB.
  */
object Classifier {

  /** Feature index of a token: first 32 bits of md5, mod `d`. */
  def featureIndex(tok: Column, d: Int): Column =
    pmod(conv(substring(md5(tok), 1, 8), 16, 10).cast("long"), lit(d))

  /** Hashed bag-of-words: (id, idx, cnt) with cnt = token occurrences. */
  def hashedFeatures(docs: DataFrame, idCol: String, textCol: String,
                     d: Int): DataFrame =
    docs.select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .groupBy(col(idCol), featureIndex(col("tok"), d).as("idx"))
      .agg(count(lit(1)).as("cnt"))

  /** Softsign logistic link over a micro-unit margin column (exact IEEE). */
  private def softsignP(marginMicro: Column): Column = {
    val m = marginMicro.cast("double") / lit(1e6)
    lit(0.5) + lit(0.5) * (m / (lit(1d) + abs(m)))
  }

  /** HALF_UP double→long quantization (matches DuckDB `round(x)::BIGINT`). */
  private def halfUp(x: Column): Column =
    x.cast("decimal(38,0)").cast("long")

  /** Train `iters` full-batch iterations against the 0/1 `label` column and
    * return the learned micro-unit weight table (idx, w_int) — only indices
    * observed in the corpus appear (unobserved weights are zero).
    *
    * `label` must be 0/1 for every row (weak supervision labels like
    * `lang === "en"` cast cleanly); `n` is the corpus row count, taken once
    * up front (metadata-scale action, like the k-means trainer's seeding).
    * The caller owns `feat`'s lifetime via the returned (weights, feat)
    * pair's second element — see [[trainScore]] for the release pattern.
    */
  private def trainWeightsWithFeatures(
      docs: DataFrame, idCol: String, textCol: String, label: Column,
      d: Int, iters: Int, lr: Double): (DataFrame, DataFrame) = {
    require(d > 0, s"d must be positive, got $d")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(lr > 0, s"lr must be positive, got $lr")
    // iterative trainer: cache the hashed-feature projection so each
    // iteration's margin and gradient jobs read it instead of re-tokenizing
    // the corpus (the k-means trainer persists its (id, vec) projection the
    // same way)
    val feat = hashedFeatures(docs, idCol, textCol, d).cache()
    val lbl = docs.select(col(idCol), label.cast("int").as("y"))
    val n = docs.count()

    // Weight state: only indices that occur in the corpus can ever move off
    // zero, so the state is exactly feat's distinct idx set (inner joins
    // below then align with the oracle's, which never materializes the
    // unobserved rows either).
    var w: DataFrame = feat.select(col("idx")).distinct()
      .withColumn("w_int", lit(0L))

    for (_ <- 1 to iters) {
      // margin_micro per doc: an exact long sum (cnt × micro-weights)
      val margins = feat.join(broadcast(w), Seq("idx"))
        .groupBy(col(idCol))
        .agg(sum(col("cnt") * col("w_int")).as("margin_micro"))
      // per-(doc, idx) gradient contribution, quantized HALF_UP to micro
      // units BEFORE the idx aggregation so the sum is exact
      val grad = feat
        .join(margins, Seq(idCol))
        .join(lbl, Seq(idCol))
        .withColumn("p", softsignP(col("margin_micro")))
        .groupBy(col("idx"))
        .agg(sum(halfUp((col("p") - col("y")) * col("cnt") * lit(1e6)))
          .as("gsum"))
      w = w.join(grad, Seq("idx"))
        .select(col("idx"),
          (col("w_int") - halfUp(lit(lr) * col("gsum").cast("double")
            / lit(n.toDouble))).as("w_int"))
        .localCheckpoint() // cut the per-iteration lineage, kMeans-style
    }
    (w, feat)
  }

  /** Learned weight table only (the training half of [[trainScore]]);
    * releases the feature cache before returning (w is already
    * localCheckpoint-materialized). */
  def trainWeights(docs: DataFrame, idCol: String, textCol: String,
                   label: Column, d: Int = 256, iters: Int = 2,
                   lr: Double = 0.5): DataFrame = {
    val (w, feat) = trainWeightsWithFeatures(docs, idCol, textCol, label,
      d, iters, lr)
    feat.unpersist(blocking = false)
    w
  }

  /** Train and score every training document. Returns (id, y, margin_micro,
    * pred): the exact integer margin and the sign classification — both
    * bit-stable outputs (no rounded float crosses the result boundary). */
  def trainScore(docs: DataFrame, idCol: String, textCol: String,
                 label: Column, d: Int = 256, iters: Int = 2,
                 lr: Double = 0.5): DataFrame = {
    val (w, feat) = trainWeightsWithFeatures(docs, idCol, textCol, label,
      d, iters, lr)
    val lbl = docs.select(col(idCol), label.cast("int").as("y"))
    // Final margins materialize eagerly (two longs per doc — the same
    // node-count-sized localCheckpoint the connected-components loop uses)
    // so the feature cache can be released before returning the lazy result.
    val scored = feat.join(broadcast(w), Seq("idx"))
      .groupBy(col(idCol))
      .agg(sum(col("cnt") * col("w_int")).as("margin_micro"))
      .localCheckpoint()
    feat.unpersist(blocking = false)
    lbl.join(scored, Seq(idCol))
      .select(col(idCol), col("y"), col("margin_micro"),
        (col("margin_micro") > 0).as("pred"))
  }

  /** The learned weights as a dense micro-unit array (unobserved indices
    * zero) — a d-row driver collect, metadata-scale like k-means centroids. */
  def denseWeights(w: DataFrame, d: Int): Array[Long] = {
    val arr = Array.fill(d)(0L)
    w.select(col("idx"), col("w_int")).collect().foreach { r =>
      arr(r.getLong(0).toInt) = r.getLong(1)
    }
    arr
  }

  /** Calibration report for the trained quality filter — the check a team
    * runs BEFORE trusting classifier margins as keep/drop thresholds
    * (q131/q134's missing audit): train on the old slice, score the new
    * slice, map margins through the softsign link to p ∈ [0, 1], bucket p
    * into `bins` fixed-width bins, and report per bin how often the label
    * was actually positive. A calibrated filter has pos_rate ≈ mean p per
    * bin; the report is where over/under-confidence shows up.
    *
    * Scale shape: scoring is [[scoreExpr]]'s single per-row expression (no
    * join, no shuffle), so the whole report is ONE hash aggregation keyed
    * by bin (≤ `bins` rows out, map-side partials). Ratios are exact
    * integer milli-units (`x * 1000 div n`) — no float division. */
  def calibrationReport(docs: DataFrame, idCol: String, textCol: String,
                        label: Column, isNew: Column, d: Int, iters: Int,
                        lr: Double, bins: Int = 10): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    val w = denseWeights(
      trainWeights(docs.where(!isNew), idCol, textCol, label, d, iters, lr), d)
    val m = col("margin_micro").cast("double") / lit(1e6)
    val p = lit(0.5) + lit(0.5) * (m / (lit(1d) + abs(m)))
    docs.where(isNew)
      .select(col(idCol), scoreExpr(col(textCol), w).as("margin_micro"),
        label.cast("long").as("y"))
      .withColumn("__p", p)
      .withColumn("bin",
        least(floor(col("__p") * bins).cast("long"), lit(bins - 1L)))
      .withColumn("__pm", floor(col("__p") * 1000).cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
        sum(col("__pm")).as("__sp"))
      .select(col("bin"), col("n"), col("n_pos"),
        expr("div(n_pos * 1000, n)").as("pos_rate_milli"),
        expr("div(__sp, n)").as("mean_p_milli"))
  }

  /** Precision/recall sweep over keep/drop margin thresholds — the curve a
    * team reads to CHOOSE the cut-point that [[calibrationReport]] audits:
    * train on the old slice, score the new, and for each candidate
    * threshold t report the confusion counts and P/R/F1 (milli-units) of
    * the rule `keep ⇔ margin > t` (the strict `>` matches q134's
    * `pred = margin > 0` at t = 0).
    *
    * Scale shape: scoring is [[scoreExpr]]'s per-row expression, and the
    * corpus collapses in ONE hash aggregation keyed by `bin` = how many
    * thresholds sit strictly below the margin (≤ |T|+1 rows out, map-side
    * partials). `margin > t_i ⇔ bin ≥ i` for ascending thresholds, so every
    * per-threshold count is a sum over the kilobyte histogram — the
    * broadcast inequality join touches |T|·(|T|+1) rows, never the corpus.
    * No per-threshold pass, no window, no second shuffle. */
  def thresholdSweep(docs: DataFrame, idCol: String, textCol: String,
                     label: Column, isNew: Column, d: Int, iters: Int,
                     lr: Double, thresholdsMicro: Seq[Long]): DataFrame = {
    require(thresholdsMicro.nonEmpty, "thresholdsMicro must be non-empty")
    require(thresholdsMicro == thresholdsMicro.distinct.sorted,
      s"thresholds must be ascending and distinct: $thresholdsMicro")
    val spark = docs.sparkSession
    import spark.implicits._
    val w = denseWeights(
      trainWeights(docs.where(!isNew), idCol, textCol, label, d, iters, lr), d)
    val tLit = array(thresholdsMicro.map(lit): _*)
    // cached: both the per-threshold sums and the totals read this kilobyte
    // histogram — without the cache the totals branch would re-run the
    // corpus scan + scoring (PlanSpec pins the single scoring pass)
    val hist = docs.where(isNew)
      .select(scoreExpr(col(textCol), w).as("m"), label.cast("long").as("y"))
      .withColumn("bin", size(filter(tLit, t => t < col("m"))).cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"))
      .cache()
    val totals = hist.agg(sum(col("n")).as("n_all"),
      sum(col("n_pos")).as("p_all"))
    val th = thresholdsMicro.zipWithIndex
      .map { case (t, i) => (i + 1L, t) }.toDF("i", "threshold_micro")
    broadcast(th)
      .join(hist, col("bin") >= col("i"), "left")
      .groupBy(col("threshold_micro"))
      .agg(coalesce(sum(col("n_pos")), lit(0L)).as("tp"),
        coalesce(sum(col("n")), lit(0L)).as("__pp"))
      .crossJoin(broadcast(totals))
      .select(col("threshold_micro"), col("tp"),
        (col("__pp") - col("tp")).as("fp"),
        (col("p_all") - col("tp")).as("fn"),
        (col("n_all") - col("__pp") - col("p_all") + col("tp")).as("tn"),
        when(col("__pp") > 0, expr("div(tp * 1000, __pp)"))
          .as("precision_milli"),
        when(col("p_all") > 0, expr("div(tp * 1000, p_all)"))
          .as("recall_milli"),
        when(col("__pp") + col("p_all") > 0,
          expr("div(tp * 2000, __pp + p_all)")).as("f1_milli"))
  }

  /** Frozen-weight scoring as ONE per-row expression — no join, no shuffle,
    * no state: the serving/streaming path (stream twin:
    * `StreamEntry.scoreDocs`). Exactly equals the trained margins: the
    * per-token weight lookups sum in token order as exact longs, and long
    * addition commutes, so the result is bit-identical to the (idx, cnt)
    * aggregated form whatever the token order or partitioning. */
  def scoreExpr(textCol: Column, weights: Array[Long]): Column = {
    // one ArrayType literal (a codegen reference), not d inlined longs:
    // refreshed weights then reuse the same generated code (the
    // Similarity.litVec reasoning)
    val wLit = lit(weights)
    aggregate(
      transform(TextAnalysis.tokens(textCol),
        t => element_at(wLit,
          (featureIndex(t, weights.length) + 1).cast("int"))),
      lit(0L), (acc, x) => acc + x)
  }
}
