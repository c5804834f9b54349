package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Rolling / derived-metric operators (SURVEY.md §2.5-2.6): 7-day rolling sums,
  * rates per 100k, lag-7 change, direction labels, the reference's quirky
  * percentage-change rules, cumulative sums and the all-zero guard.
  *
  * Semantics are pandas-faithful (reference `db_etl/processors/rolling.py`,
  * `generic_rate.py`):
  *  - `rolling(7).sum()` has `min_periods = 7` **counting non-null values**, so
  *    the sum is null unless all 7 rows in the frame hold non-null values;
  *  - `diff(periods=7)` is row-based (the pipeline densifies dates first, so
  *    rows == days);
  *  - the 8-row percentage change needs 8 non-null values and applies special
  *    cases before rounding.
  *
  * Everything is a window function over `partitionBy(keys).orderBy(date)` — a
  * single shuffle per distinct partitioning, shared across all derived columns,
  * and fully inside whole-stage codegen (no UDFs).
  */
object Rolling {

  private def byKeys(keys: Seq[String], dateCol: String): WindowSpec =
    Window.partitionBy(keys.map(col): _*).orderBy(col(dateCol))

  /** A3: 7-day rolling sum, pandas `rolling(n, min_periods=n)` semantics:
    * null unless the n-row frame contains n non-null values.
    * Row-based — callers must have densified dates (Reshape.densifyDates). */
  def rollingSum(df: DataFrame, keys: Seq[String], dateCol: String,
                 metric: String, out: String, n: Int = 7): DataFrame = {
    val frame = byKeys(keys, dateCol).rowsBetween(-(n - 1), 0)
    df.withColumn(out,
      when(count(col(metric)).over(frame) === n, sum(col(metric)).over(frame)))
  }

  /** A7: all-zero guard (reference `replace_all_zero`, `rolling.py:58-62`):
    * if a group's column sums to 0 (null-skipping), null the column group-wide.
    * The full-partition sum rides on the SAME (keys, date) ordered window spec
    * as the rolling family — an unordered spec here would void the sort
    * guarantee between the surrounding windows and force Spark to re-sort the
    * whole frame mid-pipeline. */
  def allZeroToNull(df: DataFrame, keys: Seq[String], dateCol: String,
                    metric: String): DataFrame = {
    val w = byKeys(keys, dateCol)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    df.withColumn(metric, when(sum(col(metric)).over(w) === 0, lit(null)).otherwise(col(metric)))
  }

  /** A4/A5: rate per `per` population units, rounded to 1 dp
    * (reference `generic_rate.py:100-133`, `RATE_PRECISION=1`). */
  def ratePer(df: DataFrame, valueCol: String, popCol: String, out: String,
              per: Double = 100000d, precision: Int = 1): DataFrame =
    df.withColumn(out, round(col(valueCol) / col(popCol) * per, precision))

  /** W1: lag-7 change (reference `diff(periods=7)`, `rolling.py:173-180`). */
  def change(df: DataFrame, keys: Seq[String], dateCol: String,
             metric: String, out: String, periods: Int = 7): DataFrame =
    df.withColumn(out, col(metric) - lag(col(metric), periods).over(byKeys(keys, dateCol)))

  /** W2: direction label for a change column (reference `get_directions`,
    * `rolling.py:51-55`): sign → UP/DOWN/SAME, null-propagating. */
  def direction(changeCol: Column): Column =
    when(changeCol > 0, "UP").when(changeCol < 0, "DOWN")
      .when(changeCol === 0, "SAME")

  /** W3: percentage change over an 8-row frame (reference
    * `calculate_percentage_change`, `rolling.py:65-77`), bit-faithful rules:
    *  - needs 8 non-null values in the frame (pandas `rolling(8).apply`);
    *  - numerator = current row, denominator = row 7 back;
    *  - numerator == 0 && denominator > 0  → -100;
    *  - denominator == 0                   → denominator := 1;
    *  - ratio - 1 == -1 (num 0, den < 0)   → 0;
    *  - else (num/den - 1) * 100, rounded to 1 dp.
    */
  def percentageChange(df: DataFrame, keys: Seq[String], dateCol: String,
                       metric: String, out: String): DataFrame = {
    val w = byKeys(keys, dateCol)
    val frame = w.rowsBetween(-7, 0)
    val num = col(metric)
    val den = lag(col(metric), 7).over(w)
    val denOr1 = when(den === 0, 1d).otherwise(den)
    val raw = when(num === 0 && den > 0, -100d)
      .otherwise {
        val fraction = num / denOr1 - 1d
        when(fraction === -1d, 0d).otherwise(round(fraction * 100d, 1))
      }
    df.withColumn(out, when(count(col(metric)).over(frame) === 8, raw))
  }

  /** A6: cumulative sum per key (reference `db_etl/etl.py:938-958`). */
  def cumSum(df: DataFrame, keys: Seq[String], dateCol: String,
             metric: String, out: String): DataFrame =
    df.withColumn(out,
      sum(col(metric)).over(byKeys(keys, dateCol).rowsBetween(Window.unboundedPreceding, 0)))

  /** W6: centered rolling mean (reference homepage thumbnail smoothing,
    * `db_etl_homepage_graphs/utils.py:105`, `rolling(7, center=True).mean()`). */
  def centeredMean(df: DataFrame, keys: Seq[String], dateCol: String,
                   metric: String, out: String, halfWidth: Int = 3): DataFrame =
    df.withColumn(out,
      avg(col(metric)).over(byKeys(keys, dateCol).rowsBetween(-halfWidth, halfWidth)))

  /** The full `change_by_sum` block (reference `rolling.py:84-233`): rolling sum
    * (+ optional small-count substitution), all-zero guard, change, direction,
    * percentage change, base-null propagation (W4), and the MSOA suppression
    * null-out (P11). Emits `{m}RollingSum/Change/Direction/ChangePercentage`.
    */
  def changeBySum(df: DataFrame, keys: Seq[String], dateCol: String,
                  metric: String,
                  minSumAllowed: Option[Double] = None,
                  minSumSub: Double = 2d): DataFrame = {
    val rs = s"${metric}RollingSum"
    var d = rollingSum(df, keys, dateCol, metric, rs)
    minSumAllowed.foreach { m =>
      d = d.withColumn(rs, when(col(rs) < m, minSumSub).otherwise(col(rs)))
    }
    d = allZeroToNull(d, keys, dateCol, rs)
    d = change(d, keys, dateCol, rs, s"${metric}Change")
    d = d.withColumn(s"${metric}Direction", direction(col(s"${metric}Change")))
    d = percentageChange(d, keys, dateCol, rs, s"${metric}ChangePercentage")
    // W4: wherever the base metric is null, null all derived columns.
    val derived = Seq(rs, s"${metric}Change", s"${metric}Direction", s"${metric}ChangePercentage")
    d = derived.foldLeft(d)((acc, c) =>
      acc.withColumn(c, when(col(metric).isNull, lit(null)).otherwise(col(c))))
    // P11 finale: rows where the substituted rolling sum survived → null the
    // whole family including the base metric. Flag first — the fold below
    // overwrites `rs` itself, so the condition must be frozen beforehand.
    if (minSumAllowed.isDefined) {
      d = d.withColumn("__suppress", col(rs) === minSumSub)
      val cols = derived :+ metric
      d = cols.foldLeft(d)((acc, c) =>
        acc.withColumn(c, when(col("__suppress"), lit(null)).otherwise(col(c))))
      d = d.drop("__suppress")
    }
    d
  }
}
