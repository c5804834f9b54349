package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udaf

/** One scored candidate flowing into the top-k aggregate. */
case class ScoredCand(score: Double, id: Long)

/** Bounded accumulation buffer: at most `2k` kept rows between trims. */
case class TopKBuf(items: Seq[ScoredCand])

/** Bounded top-k as a typed `Aggregator` (ranking: score desc, id asc).
  *
  * Why an aggregate and not a window: `row_number().over(partitionBy(q))`
  * forces a full-width shuffle of every scored row. A typed aggregate runs
  * with partial aggregation — each input partition reduces its rows into a
  * ≤2k-element buffer per group *before* the exchange, so the shuffle carries
  * O(k × partitions) rows per group instead of the whole score matrix. At
  * 100 TB of candidates that is the difference between shuffling the corpus
  * and shuffling a few KB per query.
  *
  * The buffer is trimmed lazily (sort only when it doubles past k) so
  * per-row `reduce` stays O(1) amortized.
  */
class TopKAggregator(k: Int) extends Aggregator[ScoredCand, TopKBuf, TopKBuf] {
  require(k > 0, s"k must be positive, got $k")

  private def best(items: Seq[ScoredCand], n: Int): Seq[ScoredCand] =
    items.sortBy(c => (-c.score, c.id)).take(n)

  private def trim(items: Seq[ScoredCand]): Seq[ScoredCand] =
    if (items.length <= 2 * k) items else best(items, k)

  override def zero: TopKBuf = TopKBuf(Vector.empty)
  override def reduce(b: TopKBuf, a: ScoredCand): TopKBuf = TopKBuf(trim(b.items :+ a))
  override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf = TopKBuf(trim(b1.items ++ b2.items))
  override def finish(b: TopKBuf): TopKBuf = TopKBuf(best(b.items, k))
  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}

object TopKAgg {
  /** Column-level entry: `topK(k)(col("score"), col("id"))` → struct with an
    * `items` array of `(score, id)` structs, already sorted by rank. */
  def topK(k: Int): UserDefinedFunction =
    udaf(new TopKAggregator(k), Encoders.product[ScoredCand])
}
