package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for joins whose hot keys overwhelm single tasks at
  * scale. AQE's skew-join split handles most cases at runtime
  * (`spark.sql.adaptive.skewJoin`, on by default); explicit salting remains
  * the tool when one side must be pre-partitioned or AQE can't split (e.g.
  * aggregations keyed by a hot key).
  */
object Skew {

  /** Salted equi-join: the probe side gets a deterministic salt derived from
    * its row content (never `rand()` — retries/speculative tasks must agree),
    * the build side is replicated across all `factor` salt values. The join
    * key becomes (keys..., salt), spreading each hot key over `factor` tasks.
    * Result is row-identical to `big.join(small, keys, "inner")`. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 factor: Int, saltOn: Seq[String]): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(hash(saltOn.map(col): _*), lit(factor)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** Salted hot-key aggregation: partial aggregate on (keys, salt), then final
    * aggregate on keys — a hand-rolled two-level combine for aggregates Spark
    * can't partial-combine automatically (e.g. collect_list of a hot key). */
  def saltedCollect(df: DataFrame, keys: Seq[String], valueCol: String,
                    factor: Int, out: String): DataFrame = {
    val partial = df
      .withColumn("__salt", pmod(hash(col(valueCol)), lit(factor)))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(collect_list(col(valueCol)).as("__part"))
    partial.groupBy(keys.map(col): _*)
      .agg(sort_array(flatten(collect_list(col("__part")))).as(out))
  }
}
