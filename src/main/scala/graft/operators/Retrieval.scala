package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TopKAgg

/** Corpus-level retrieval compositions: hybrid lexical+vector rank fusion
  * and diversity-maximizing subset selection — the two selection primitives
  * a training-data pipeline runs after scoring (pick what's RELEVANT across
  * modalities; pick what's DIFFERENT within a pool).
  *
  * Both are deterministic and oracle-verifiable: ranks derive from scores
  * that are integer-quantized (BM25) or rounded-before-ranking (dots), and
  * every tie breaks on the document id.
  */
object Retrieval {

  /** Global top-`n` rank list of a scored frame: `(idCol, rank)` with rank
    * 1-based by (score desc, id asc).
    *
    * Why an aggregate and not a window: a global `row_number()` is a
    * single-partition WindowExec over the whole scored corpus. The bounded
    * [[graft.functions.TopKAggregator]] reduces each input partition to ≤2n
    * rows before the exchange, and `posexplode` of the (already rank-sorted)
    * buffer yields the rank with no window at all — the only thing that
    * crosses the wire is O(n × partitions) rows. */
  def rankTopN(scored: DataFrame, idCol: String, scoreCol: String,
               n: Int): DataFrame =
    scored
      .where(col(scoreCol).isNotNull && col(idCol).isNotNull)
      .agg(TopKAgg.topK(n)(col(scoreCol), col(idCol).cast("long")).as("tk"))
      .select(posexplode(col("tk").getField("items")).as(Seq("pos", "c")))
      .select(col("c").getField("id").as(idCol),
        (col("pos") + 1).cast("long").as("rank"))

  /** Reciprocal-rank fusion of a lexical and a vector arm (Cormack et al.
    * 2009): each arm contributes `floor(1e6 / (rrfK + rank))` integer
    * micro-units for its top-`n` documents, and a document's fused score is
    * the sum over the arms that ranked it. Integer contributions commute, so
    * the fused score is bit-identical under any partition order and in the
    * SQL oracle.
    *
    * Inputs are pre-scored frames `(idCol, scoreCol)` — e.g.
    * [[TextAnalysis.bm25]] for the lexical arm and rounded dot products for
    * the vector arm. Output: `(idCol, lex_rank, vec_rank, rrf_micro)`, one
    * row per document in the union of the two top-`n` lists; an arm that did
    * not rank the document leaves its rank null.
    *
    * Scale shape: each arm collapses to ≤`n` rows via the bounded top-k
    * aggregate BEFORE fusion, so the fusion group-by touches ≤2n rows no
    * matter the corpus size — the arms' own scans are the only corpus-sized
    * work. */
  def rrfFuse(lex: DataFrame, vec: DataFrame, idCol: String,
              scoreCol: String = "score", n: Int = 20,
              rrfK: Int = 60): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    require(rrfK >= 0, s"rrfK must be non-negative, got $rrfK")
    val arms =
      rankTopN(lex, idCol, scoreCol, n).withColumn("arm", lit("lex"))
        .unionByName(
          rankTopN(vec, idCol, scoreCol, n).withColumn("arm", lit("vec")))
    arms
      .groupBy(col(idCol))
      .agg(
        max(when(col("arm") === "lex", col("rank"))).as("lex_rank"),
        max(when(col("arm") === "vec", col("rank"))).as("vec_rank"),
        sum(floor(lit(1000000.0) / (lit(rrfK) + col("rank"))).cast("long"))
          .as("rrf_micro"))
  }

  /** Positional discount table for [[rankingMetrics]]: `floor(1e6 /
    * log2(i+1) + 0.5)` for ranks 1..k — integer micro-units, so DCG sums
    * are exact under any aggregation order (the oracle spells the SAME
    * numbers as literals, generated from this method). */
  def dcgDiscountsMicro(k: Int): Seq[Long] =
    (1 to k).map(i =>
      math.floor(1e6 / (math.log(i + 1.0) / math.log(2.0)) + 0.5).toLong)

  /** Ranked-retrieval quality card: per-query hit count, MRR and nDCG@k of
    * a served ranking against a ground-truth top-k — the audit every ANN
    * serving dial (q175/q182) reports recall for, extended to the
    * rank-sensitive metrics retrieval teams actually tune on.
    *
    * Inputs: `served(q_id, cand_id, rank)` (rank 1-based) and
    * `truth(q_id, cand_id)` (the ideal top-k set, binary relevance).
    * All metrics are exact integers: MRR = floor(1e6 / best hit rank),
    * DCG = Σ [[dcgDiscountsMicro]] over hit positions, nDCG =
    * floor(1000·DCG / IDCG) with IDCG the full-k discount sum — no float
    * logs at evaluation time, so the card is bit-identical in SQL.
    *
    * Scale shape: one equi-join of two k-bounded rank lists + one q-keyed
    * aggregation — both sides are |queries|·k rows, never corpus-sized. */
  def rankingMetrics(served: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val disc = dcgDiscountsMicro(k)
    val idcg = disc.sum
    val discCol = (1 to k).foldRight(lit(0L): Column) { (i, acc) =>
      when(col("rank") === i, lit(disc(i - 1))).otherwise(acc)
    }
    served
      .join(truth.select(col("q_id"), col("cand_id"))
        .withColumn("__hit", lit(1L)), Seq("q_id", "cand_id"), "left")
      .groupBy(col("q_id"))
      .agg(
        sum(coalesce(col("__hit"), lit(0L))).as("n_hits"),
        coalesce(max(when(col("__hit") === 1L,
          floor(lit(1000000.0) / col("rank")).cast("long"))), lit(0L))
          .as("mrr_micro"),
        coalesce(sum(when(col("__hit") === 1L, discCol).otherwise(lit(0L))),
          lit(0L)).as("dcg_micro"))
      .withColumn("ndcg_milli",
        floor(col("dcg_micro") * lit(1000.0) / lit(idcg.toDouble))
          .cast("long"))
  }

  /** Maximal-marginal-relevance selection (Carbonell & Goldstein 1998) over
    * a relevance-shortlisted candidate pool: seed with the most relevant
    * candidate, then repeatedly add the candidate maximizing
    * `lambdaMilli·rel − (1000−lambdaMilli)·maxSimToSelected` — the
    * relevance/diversity dial between q191's pure ranking and q192's pure
    * spread. All arithmetic is integer milli/micro units over
    * rounded-to-3dp dots, so the greedy sequence is bit-identical in the
    * SQL oracle.
    *
    * Inputs: `pool(idCol, embCol)` with a `relevance` column of rounded
    * similarity-to-query (double, 3dp); `n` bounds the shortlist (top-n by
    * relevance desc, id asc — MMR is a rerank of a retrieval shortlist, so
    * the greedy loop never touches more than n candidates), `k` the
    * selection size. Output: `(sel_ord, vec_id, mmr_micro)` — micro-unit
    * MMR objective of each pick at selection time (null for the seed, which
    * is chosen on relevance alone).
    *
    * Scale shape: the shortlist is a bounded TopK aggregate over the scored
    * corpus (the only corpus-sized step); the greedy loop then runs on ≤ n
    * driver-local rows — n is a serving constant (tens), so this is
    * kilobyte driver state like the k-means centroid loop. */
  def mmrSelect(pool: DataFrame, idCol: String, embCol: String,
                relCol: String, k: Int, n: Int = 20,
                lambdaMilli: Long = 700L): DataFrame = {
    require(k > 0 && n >= k, s"need 0 < k <= n, got k=$k n=$n")
    require(lambdaMilli >= 0 && lambdaMilli <= 1000,
      s"lambdaMilli must be in [0, 1000], got $lambdaMilli")
    val spark = pool.sparkSession
    import spark.implicits._
    // bounded shortlist: top-n by (relevance desc, id asc), then the greedy
    // loop is driver-local over ≤ n rows
    val clean = pool.where(col(idCol).isNotNull && col(relCol).isNotNull &&
      col(embCol).isNotNull)
    val shortIds = clean
      .agg(TopKAgg.topK(n)(col(relCol), col(idCol).cast("long")).as("tk"))
      .select(explode(col("tk").getField("items")).as("c"))
      .select(col("c").getField("id").as("__id"),
        col("c").getField("score").as("__rel"))
    // fetch the ≤ n shortlist embeddings with the n-row side BROADCAST, so
    // the corpus streams map-side and never shuffles for the lookup
    val short = clean
      .select(col(idCol).cast("long").as("__id"),
        col(embCol).cast("array<double>").as("__emb"))
      .join(broadcast(shortIds), Seq("__id"))
      .select(col("__id"), col("__rel"), col("__emb"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Double](2).toArray))
    def simMilli(a: Array[Double], b: Array[Double]): Long = {
      var s = 0d; var i = 0
      while (i < math.min(a.length, b.length)) { s += a(i) * b(i); i += 1 }
      // same two-step quantization as the distributed dots: round the
      // double dot to 3dp first, then scale to exact milli units
      math.round(BigDecimal(s).setScale(3, BigDecimal.RoundingMode.HALF_UP)
        .toDouble * 1000d)
    }
    val remaining = scala.collection.mutable.LinkedHashMap(
      short.map { case (id, rel, emb) =>
        id -> ((math.round(rel * 1000d), emb))
      }.toSeq: _*)
    val picked = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Option[Long])]
    if (remaining.nonEmpty) {
      // seed: max relevance, id tie-break (the shortlist's rank-1 row)
      val (seedId, (_, _)) = remaining.minBy { case (id, (rm, _)) => (-rm, id) }
      val selEmbs = scala.collection.mutable.ArrayBuffer(remaining(seedId)._2)
      remaining.remove(seedId)
      picked += ((0L, seedId, None))
      while (picked.length < k && remaining.nonEmpty) {
        val (bestId, bestScore) = remaining.iterator.map {
          case (id, (relMilli, emb)) =>
            val maxSim = selEmbs.iterator.map(simMilli(emb, _)).max
            (id, lambdaMilli * relMilli - (1000L - lambdaMilli) * maxSim)
        }.minBy { case (id, s) => (-s, id) }
        selEmbs += remaining(bestId)._2
        remaining.remove(bestId)
        picked += ((picked.length.toLong, bestId, Some(bestScore)))
      }
    }
    picked.toSeq.toDF("sel_ord", "vec_id", "mmr_micro")
  }

  /** Greedy k-center (farthest-point) selection over an embedding pool —
    * the coreset/diversity primitive behind "pick k maximally-different
    * exemplars" (Sener & Savarese 2018's k-Center-Greedy, in cosine form):
    * seed with the smallest id, then repeatedly add the candidate whose
    * MAXIMUM similarity to the already-selected set is MINIMAL (ties on the
    * smaller id). Dots are rounded to `scale` decimals before the max, so
    * the argmin is stable across engines — the q48 determinism contract.
    *
    * Output: `(sel_ord, vec_id, max_prior_sim)` — selection order from 0,
    * the chosen id, and its max similarity to the previously-selected set
    * (null for the seed). `max_prior_sim` is non-decreasing in `sel_ord`
    * (the classic k-center monotonicity, spec-pinned).
    *
    * Scale shape: k map-only passes over the pool. The selected set (≤ k
    * rows of kilobytes) is inlined as literal arrays, so each pass is
    * `greatest(dot(emb, sel_1), …, dot(emb, sel_i))` + a global top-1 via
    * TakeOrdered — no join, no window, no corpus-sized shuffle; driver state
    * is exactly the k selected vectors. Inherently k sequential rounds, the
    * same round structure as Lloyd's iterations in
    * [[Similarity.kMeansCentroids]]. */
  def kCenterSelect(pool: DataFrame, idCol: String, embCol: String, k: Int,
                    scale: Int = 3): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = pool.sparkSession
    import spark.implicits._
    val base = pool
      .where(col(idCol).isNotNull && col(embCol).isNotNull)
      .select(col(idCol).cast("long").as("vec_id"),
        col(embCol).cast("array<double>").as("emb"))
    val seedRows = base.orderBy(col("vec_id")).limit(1).collect()
    // (ord, id, emb, maxPriorSim) — bounded driver state: ≤ k vectors
    val selected = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Seq[Double], Option[Double])]
    seedRows.foreach { r =>
      selected += ((0L, r.getLong(0), r.getSeq[Double](1), None))
    }
    var exhausted = seedRows.isEmpty
    while (!exhausted && selected.length < k) {
      val selIds = selected.map(_._2).toArray
      // max over selected of the ROUNDED dot: each term rounds before the
      // max, matching the oracle's max over per-pair rounded sums. The
      // selected set rides as ONE matrix literal + array_max(transform(…))
      // instead of k growing greatest(dot(lit-array), …) arms, so every
      // round (and every pool) shares one compiled stage (the
      // Similarity.litVec reasoning); same rounded values, same max.
      val selMat = Similarity.litMat(selected.map(_._3.toArray).toArray)
      val maxSim = array_max(transform(selMat,
        se => round(Similarity.dot(col("emb"), se), scale)))
      // the winner's embedding rides in the same TakeOrdered row, so each
      // round is exactly ONE job over the pool
      val pick = base
        .where(!array_contains(Similarity.litVecL(selIds), col("vec_id")))
        .select(col("vec_id"), maxSim.as("ms"), col("emb"))
        .orderBy(col("ms").asc, col("vec_id").asc)
        .limit(1)
        .collect()
      if (pick.isEmpty) exhausted = true
      else {
        val id = pick.head.getLong(0)
        val ms = pick.head.getDouble(1)
        selected += ((selected.length.toLong, id,
          pick.head.getSeq[Double](2), Some(ms)))
      }
    }
    selected.toSeq
      .map { case (ord, id, _, ms) => (ord, id, ms) }
      .toDF("sel_ord", "vec_id", "max_prior_sim")
  }

  /** Stratified greedy k-center: [[kCenterSelect]]'s exact recurrence run
    * independently inside every stratum (source, cluster, language …) — the
    * scale path for large total selection sizes, since the global greedy is
    * inherently sequential while strata select in parallel. One shuffle on
    * the stratum key, then each group's greedy runs locally via
    * `flatMapGroups` (the rare justified per-group imperative kernel: the
    * recurrence is k sequential argmins, not expressible as joins without k
    * rounds of jobs PER STRATUM).
    *
    * Contract: one stratum's pool must fit in executor memory (the same
    * contract as any collect_list-per-key aggregation); strata are the
    * natural corpus shards (a source, a near-dup cluster), bounded by
    * construction. Output: `(stratum, sel_ord, vec_id, max_prior_sim)`,
    * ≤ k rows per stratum; per-stratum rows are EXACTLY what
    * [[kCenterSelect]] returns on that stratum alone (spec-pinned), so all
    * determinism and monotonicity properties carry over. */
  def kCenterPerStratum(pool: DataFrame, idCol: String, embCol: String,
                        stratumCol: String, k: Int,
                        scale: Int = 3): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = pool.sparkSession
    import spark.implicits._
    val typed = pool
      .where(col(idCol).isNotNull && col(embCol).isNotNull &&
        col(stratumCol).isNotNull)
      .select(col(stratumCol).cast("long").as("_1"),
        col(idCol).cast("long").as("_2"),
        col(embCol).cast("array<double>").as("_3"))
      .as[(Long, Long, Seq[Double])]
    def roundedDot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0d; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { s += a(i) * b(i); i += 1 }
      // same index-order accumulation + HALF_UP rounding as the distributed
      // round(graft_dot(...), scale) the single-pool form plans
      BigDecimal(s).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    typed.groupByKey(_._1).flatMapGroups { (stratum, it) =>
      val rows = it.map(t => (t._2, t._3.toArray)).toArray.sortBy(_._1)
      if (rows.isEmpty) Iterator.empty
      else {
        val selected = scala.collection.mutable.ArrayBuffer(
          (0L, rows.head._1, rows.head._2, Option.empty[Double]))
        val remaining = scala.collection.mutable.LinkedHashMap(rows.tail: _*)
        while (selected.length < k && remaining.nonEmpty) {
          val (id, ms) = remaining.iterator.map { case (cid, emb) =>
            (cid, selected.iterator.map(s => roundedDot(emb, s._3)).max)
          }.minBy { case (cid, m) => (m, cid) }
          selected += ((selected.length.toLong, id, remaining(id), Some(ms)))
          remaining.remove(id)
        }
        selected.iterator.map { case (ord, id, _, ms) => (stratum, ord, id, ms) }
      }
    }.toDF("stratum", "sel_ord", "vec_id", "max_prior_sim")
  }
}
