package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-pass table profiler — the "ANALYZE TABLE" a data pipeline runs
  * before trusting a new drop: per column, row/null counts, an
  * oracle-checkable approximate distinct (the md5-bucket linear counting of
  * [[Cardinality]]) and the max rendered width.
  *
  * Scale shape: ONE aggregate over the table produces every column's stats
  * together (Catalyst plans the multi-distinct via a single-scan Expand —
  * rows multiply by column count in-pipeline, nothing extra is read), then a
  * driver-free explode stacks the one wide row into (column, stats) rows.
  * Statistics are all algebraic/sketch aggregates with map-side partials, so
  * the exchange carries one partial row per partition.
  *
  * Re-derivation of the reference's release-preflight checks
  * (`despatch_ops_workers` row-count/nullity gates) generalized to any
  * table.
  */
object Profile {

  def profile(df: DataFrame, m: Int = 4096): DataFrame = {
    require(m > 0, s"m must be positive, got $m")
    val cols = df.columns.toSeq
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__n_$c"),
        countDistinct(pmod(CorpusOps.md5Prefix32(col(c)), lit(m.toLong)))
          .as(s"__f_$c"),
        // octet_length, not length: the oracle's strlen counts BYTES, and
        // the two diverge on any multi-byte UTF-8 value (q50 convention)
        max(octet_length(col(c).cast("string"))).cast("long").as(s"__len_$c"))
    } :+ count(lit(1)).as("__total")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__total").as("n_rows"),
        (col("__total") - col(s"__n_$c")).as("n_null"),
        when(col(s"__f_$c") < m,
          round(-lit(m.toDouble) * log((lit(m.toDouble) - col(s"__f_$c")) / m))
            .cast("long")).as("approx_distinct"),
        col(s"__len_$c").as("max_len"))
    }
    wide.select(explode(array(stacked: _*)).as("p")).select("p.*")
  }
}
