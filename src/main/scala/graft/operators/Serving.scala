package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Serving-layer operators (SURVEY.md §2.5-2.7) — the reference's hand-written
  * SQL re-expressed as Spark relational ops: percentiles for map legends,
  * rank-latest lookups, today-vs-yesterday release deltas, full-outer metric
  * alignment, latest-date semi joins, top-N, JSON cache aggregation.
  */
object Serving {

  /** A8: exact discrete percentiles (reference `percentile_disc` in
    * `despatch_ops_workers/map_percentiles/queries.py:14-96`).
    * PostgreSQL semantics: smallest value whose cume_dist >= p, i.e. the
    * element at 1-based index ceil(p*n) of the sorted group. Computed with a
    * cumulative-count window over the per-key value histogram rather than
    * `percentile_approx` so results are exact and engine-agnostic.
    */
  def percentileDisc(df: DataFrame, keys: Seq[String], valueCol: String,
                     ps: Seq[(String, Double)]): DataFrame = {
    // Value-histogram construction: collapse raw rows to (keys, value, count)
    // with a hash aggregate FIRST (map-side partial combine), then run the
    // cumulative window over the histogram. percentile_disc(p) = the smallest
    // value whose cumulative count reaches ceil(p*n), so the histogram loses
    // nothing — and the window's input is |keys × distinct values| rows, not
    // the corpus. A rank window over raw rows would shuffle every row into
    // its key partition (for a global/constant key: one partition of the
    // entire table); the histogram shuffles counts.
    val hist = df
      .where(col(valueCol).isNotNull)
      .groupBy((keys :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("__c"))
    val wOrd = Window.partitionBy(keys.map(col): _*).orderBy(col(valueCol))
    val cum = wOrd.rowsBetween(Window.unboundedPreceding, 0)
    // full frame on the same ordering: stacks with cum on one sort
    val all = wOrd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val withCum = hist
      .withColumn("__cum", sum(col("__c")).over(cum))
      .withColumn("__n", sum(col("__c")).over(all))
    val aggs =
      min(col(valueCol)).as("min_value") +:
      max(col(valueCol)).as("max_value") +:
      ps.map { case (name, p) =>
        min(when(col("__cum") >= ceil(lit(p) * col("__n")), col(valueCol))).as(name)
      }
    withCum.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** A9: interpolating percentiles (pandas `Series.quantile` / SQL
    * `percentile_cont`, reference `rate_scales_worker/process.py:95-109`):
    * 0-based position p*(n-1), linear interpolation between the bracketing
    * sorted values. Same rank-window construction as percentileDisc so both
    * engines compute bit-identical arithmetic. */
  def percentileCont(df: DataFrame, keys: Seq[String], valueCol: String,
                     ps: Seq[(String, Double)]): DataFrame = {
    // Same value-histogram construction as percentileDisc: the sorted-rank
    // positions lo/hi are recovered from cumulative counts (the value at
    // 1-based rank r is the smallest value whose cumulative count >= r), so
    // the window input is the per-key value histogram, never the raw rows.
    val hist = df
      .where(col(valueCol).isNotNull)
      .groupBy((keys :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("__c"))
    val wOrd = Window.partitionBy(keys.map(col): _*).orderBy(col(valueCol))
    val cum = wOrd.rowsBetween(Window.unboundedPreceding, 0)
    // full frame on the same ordering: stacks with cum on one sort
    val all = wOrd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val withCum = hist
      .withColumn("__cum", sum(col("__c")).over(cum))
      .withColumn("__n", sum(col("__c")).over(all))
    val aggs = ps.map { case (name, p) =>
      val pos = lit(p) * (col("__n") - 1) + 1 // 1-based fractional position
      val lo = floor(pos)
      val hi = ceil(pos)
      val frac = pos - lo
      val vLo = min(when(col("__cum") >= lo, col(valueCol)))
      val vHi = min(when(col("__cum") >= hi, col(valueCol)))
      (vLo + (vHi - vLo) * max(frac)).as(name)
    }
    withCum.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** W5/O2/O3: keep the top `n` rows per group by rank order (reference
    * `RANK() OVER (PARTITION BY ... ORDER BY date DESC)` + `row_num` filters,
    * `main_etl_postprocessors/private_report/queries.py:3-24`). */
  def topNPerGroup(df: DataFrame, keys: Seq[String], order: Seq[Column],
                   n: Int, useRowNumber: Boolean = false): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val r = if (useRowNumber) row_number().over(w) else rank().over(w)
    df.withColumn("__rank", r).where(col("__rank") <= n).drop("__rank")
  }

  /** J8: restrict to rows at the dataset-global latest date via a broadcast
    * semi join (reference `date IN (SELECT MAX(date) ...)`,
    * `despatch_ops_workers/rate_scales/queries.py:22-28`). */
  def atLatestDate(df: DataFrame, dateCol: String): DataFrame =
    df.join(broadcast(df.agg(max(col(dateCol)).as(dateCol))), Seq(dateCol), "left_semi")

  /** J5: today-vs-yesterday release delta (reference
    * `chunk_etl_postprocessing/vaccinations/queries.py:13-92`): aggregate the
    * two slices, left-join today onto yesterday on the entity key, emit the
    * clamped difference `greatest(today - coalesce(yesterday, 0), 0)`. */
  def releaseDelta(today: DataFrame, yesterday: DataFrame, keys: Seq[String],
                   valueCol: String, out: String): DataFrame = {
    val y = yesterday.withColumnRenamed(valueCol, "__prev")
    today.join(y, keys, "left")
      .withColumn(out, greatest(col(valueCol) - coalesce(col("__prev"), lit(0d)), lit(0d)))
      .drop("__prev")
  }

  /** J6: full-outer alignment of N single-metric frames on a shared key
    * (reference dose-uptake alignment, `db_etl_homepage_graphs/queries.py:63-128`). */
  def fullOuterAlign(frames: Seq[DataFrame], keys: Seq[String]): DataFrame =
    frames.reduce((a, b) => a.join(b, keys, "full"))

  /** A13: JSON cache-blob aggregation (reference `cache_prepopulate/query.sql:1-13`,
    * `JSONB_AGG` of row objects per key). Array order is normalized with
    * `sort_array` on the struct's leading field for determinism. */
  def jsonAgg(df: DataFrame, keys: Seq[String], sortField: String,
              fields: Seq[String], out: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(to_json(sort_array(collect_list(struct((sortField +: fields).map(col): _*)))).as(out))

  /** A2: derived-by-max-of-adjacent-column (reference
    * `db_etl/processors/derived_metrics.py:25-100`): on the latest date only,
    * fill a null target from the group-wide max of the source column. */
  def fillLatestFromGroupMax(df: DataFrame, keys: Seq[String], dateCol: String,
                             target: String, source: String): DataFrame = {
    val wAll = Window.partitionBy(keys.map(col): _*)
    // Global max as a broadcast scalar — an empty-partition window here would
    // funnel the whole dataset through one task at scale.
    val latest = df.agg(max(col(dateCol)).as("__latest"))
    df.crossJoin(broadcast(latest))
      .withColumn(target,
        when(col(dateCol) === col("__latest") && col(target).isNull,
          max(col(source)).over(wAll)).otherwise(col(target)))
      .drop("__latest")
  }

  /** Binning (reference `pandas.cut` case-rate bands,
    * `landing_page_map/generate.py:106-151`): half-open [lo, hi) buckets,
    * emitted as the bucket's lower bound; null outside the range. */
  def bin(valueCol: Column, bounds: Seq[Double]): Column =
    bounds.sliding(2).foldLeft(lit(null).cast("double")) { case (acc, Seq(lo, hi)) =>
      when(valueCol >= lo && valueCol < hi, lit(lo)).otherwise(acc)
    }
}
