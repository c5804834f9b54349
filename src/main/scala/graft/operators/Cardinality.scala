package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable cardinality estimation.
  *
  * HLL (`approx_count_distinct`) is the right 100 TB default, but its
  * register values are engine-internal — no external oracle can ever verify
  * a result. Linear counting is the classic small-m alternative
  * (Whang et al., ACM TODS 1990): hash each value into one of `m` buckets
  * and estimate `n ≈ -m · ln(empty/m)` from the empty-bucket fraction. With
  * an md5-derived bucket the whole sketch is reproducible in ANY engine —
  * DuckDB computes the identical buckets — so the estimate itself is
  * oracle-checkable, which makes it the verification-friendly member of the
  * sketch family.
  *
  * Scale shape: the inner distinct is on (keys, bucket) whose domain is
  * bounded by `m` per group — partial aggregation collapses each partition
  * to ≤ m rows per group before the exchange, exactly like HLL's register
  * merge. Accuracy ~1/sqrt(m) for n ≲ m·ln(m); saturated groups (every
  * bucket hit) return null rather than +∞.
  */
object Cardinality {

  def linearCount(df: DataFrame, keys: Seq[String], valueCol: String,
                  m: Int = 4096, out: String = "approx_distinct"): DataFrame = {
    require(m > 0, s"m must be positive, got $m")
    val bucket = pmod(CorpusOps.md5Prefix32(col(valueCol)), lit(m.toLong))
    df.select(keys.map(col) :+ bucket.as("__bucket"): _*)
      .groupBy(keys.map(col): _*)
      .agg(countDistinct(col("__bucket")).as("__filled"))
      .select(keys.map(col) :+
        when(col("__filled") < m,
          round(-lit(m.toDouble) * log((lit(m.toDouble) - col("__filled")) / m))
            .cast("long")).as(out): _*)
  }
}
