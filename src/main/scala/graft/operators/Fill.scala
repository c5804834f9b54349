package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fill / normalisation operators (SURVEY.md §2.6 W7-W9, §2.2 P12) —
  * reference `db_etl/processors/normalisation.py`.
  *
  * The reference's bounds are quirky and preserved exactly: both the zero-fill
  * and the forward-fill apply only where
  * `firstNonNullDate <= date < lastNonNullDate` — the *max* bound is strict
  * (`normalisation.py:58-66, 75-84`: `d.date < dm.dropna().date.max()`).
  *
  * All fills are two stacked windows over the same `partitionBy(keys)` —
  * one unordered (min/max bounds), one ordered (running last) — so Spark plans a
  * single shuffle and sorts once.
  */
object Fill {

  private def nonNullBounds(df: DataFrame, keys: Seq[String], dateCol: String,
                            metric: String): (Column, Column) = {
    // Full-frame bounds on the ORDERED (keys, date) spec: same one-pass
    // aggregate as an unordered window, but sort-compatible with the rolling
    // windows stacked after it — no mid-pipeline re-sort.
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(dateCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    (min(when(col(metric).isNotNull, col(dateCol))).over(w),
     max(when(col(metric).isNotNull, col(dateCol))).over(w))
  }

  /** W8: bounded zero-fill — nulls become 0 only between the key's first
    * non-null date (inclusive) and last non-null date (exclusive). */
  def zeroFillBounded(df: DataFrame, keys: Seq[String], dateCol: String,
                      metric: String): DataFrame = {
    val (lo, hi) = nonNullBounds(df, keys, dateCol, metric)
    df.withColumn(metric,
      when(col(dateCol) >= lo && col(dateCol) < hi, coalesce(col(metric), lit(0d)))
        .otherwise(col(metric)))
  }

  /** W7: bounded forward-fill for cumulative metrics — last non-null value
    * carried forward, only inside [firstNonNull, lastNonNull). */
  def forwardFillBounded(df: DataFrame, keys: Seq[String], dateCol: String,
                         metric: String): DataFrame = {
    val (lo, hi) = nonNullBounds(df, keys, dateCol, metric)
    val running = last(col(metric), ignoreNulls = true)
      .over(Window.partitionBy(keys.map(col): _*).orderBy(col(dateCol))
        .rowsBetween(Window.unboundedPreceding, 0))
    df.withColumn(metric,
      when(col(dateCol) >= lo && col(dateCol) < hi, coalesce(col(metric), running))
        .otherwise(col(metric)))
  }

  /** W9/P12: broadcast a group's single non-null value across all its rows
    * (reference `normalisation.py:70-73` area-name repair, `etl.py:629-645`
    * `repl_values`). The reference takes the first non-null; values are
    * constant within a group, so any non-null representative is equivalent —
    * `max` avoids an ordered window. */
  def repairConstant(df: DataFrame, keys: Seq[String], metric: String): DataFrame =
    df.withColumn(metric, max(col(metric)).over(Window.partitionBy(keys.map(col): _*)))

  /** Full `normalise_records` (reference `normalisation.py:25-90`): zero-fill
    * the listed metrics, forward-fill the cumulative ones, repair `areaName`,
    * add `areaNameLower`. */
  def normaliseRecords(df: DataFrame, keys: Seq[String], dateCol: String,
                       zeroFilled: Seq[String], cumulative: Seq[String],
                       areaName: Option[String] = None): DataFrame = {
    val cols = df.columns.toSet
    var d = zeroFilled.filter(cols).foldLeft(df)((acc, m) => zeroFillBounded(acc, keys, dateCol, m))
    d = cumulative.filter(cols).foldLeft(d)((acc, m) => forwardFillBounded(acc, keys, dateCol, m))
    areaName.filter(cols).foreach { n =>
      d = repairConstant(d, keys, n)
      d = d.withColumn(n + "Lower", lower(col(n)))
    }
    d
  }
}
