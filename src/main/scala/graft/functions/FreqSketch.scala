package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** Misra-Gries summary state: at most `k` (token → lower-bound count)
  * counters. A plain Map keeps the buffer encoder trivial; k is small
  * (64 in q100) so the occasional O(k) decrement sweep is cheap. */
case class MGBuf(counts: Map[String, Long])

/** Finished sketch: candidate tokens ranked by estimated count desc
  * (ties → token asc), with the matching lower-bound estimates. */
case class MGResult(tokens: Seq[String], estimates: Seq[Long])

/** Mergeable Misra-Gries heavy-hitters sketch (bounded memory, map-side
  * combined).
  *
  * Guarantee: with `k` counters over a stream of N tokens, every token whose
  * true frequency exceeds N/(k+1) is present in the final candidate set, and
  * each stored count under-estimates the true count by at most N/(k+1)
  * (Misra & Gries 1982). Merging follows the mergeable-summaries
  * construction (Agarwal et al., PODS 2012): sum counters pairwise, then if
  * more than k survive, subtract the (k+1)-th largest count from all and
  * drop the non-positive ones — the error bound still holds for the combined
  * stream, so the sketch is safe under Spark's partial aggregation (each
  * input partition reduces locally, the exchange carries ≤k counters per
  * partition, and merge happens on the reduced buffers).
  *
  * This is pass one of the two-pass exact heavy-hitters pattern (q100): the
  * sketch surfaces a superset of every token above N/(k+1); a broadcast
  * semi-join then recounts exactly that candidate set, so the final output
  * for any threshold ≥ N/(k+1) equals the exact answer while the wide pass
  * over the corpus never holds more than k counters in memory.
  *
  * Re-derivation of the reference's top-N token statistics (an exact
  * GROUP BY in its SQL tier, e.g. coronavirus-dashboard-pipeline-etl's
  * metric-frequency rollups) in a form whose memory is independent of
  * vocabulary size.
  */
class MisraGriesAggregator(k: Int) extends Aggregator[String, MGBuf, MGResult] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: MGBuf = MGBuf(Map.empty)

  override def reduce(b: MGBuf, tok: String): MGBuf = {
    if (tok == null) return b
    val m = b.counts
    m.get(tok) match {
      case Some(c) => MGBuf(m.updated(tok, c + 1))
      case None if m.size < k => MGBuf(m.updated(tok, 1L))
      case None =>
        // All counters occupied: decrement every counter, evict the zeros.
        MGBuf(m.collect { case (t, c) if c > 1 => t -> (c - 1) })
    }
  }

  override def merge(b1: MGBuf, b2: MGBuf): MGBuf = {
    val combined = b2.counts.foldLeft(b1.counts) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (combined.size <= k) MGBuf(combined)
    else {
      // (k+1)-th largest count, subtracted from all: ≤k survivors, and the
      // aggregate undercount stays within the summed error bounds.
      val kth = combined.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(k)
      MGBuf(combined.collect { case (t, c) if c - kth > 0 => t -> (c - kth) })
    }
  }

  override def finish(b: MGBuf): MGResult = {
    val ranked = b.counts.toSeq.sortBy { case (t, c) => (-c, t) }
    MGResult(ranked.map(_._1), ranked.map(_._2))
  }

  override def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
  override def outputEncoder: Encoder[MGResult] = Encoders.product[MGResult]
}

object FreqSketch {
  /** Column-level entry: `misraGries(k)(col("token"))` → struct with
    * `tokens` (ranked candidates) and `estimates` (lower-bound counts). */
  def misraGries(k: Int): UserDefinedFunction =
    udaf(new MisraGriesAggregator(k), Encoders.STRING)
}
