package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reshaping operators (SURVEY.md §2.3): pivot, melt/unpivot, date-spine
  * densify, tail zero-pad, nest/unnest.
  *
  * Scale notes: the date spine is built by broadcasting the (tiny) date range
  * and cross-joining it onto the distinct key set, so the only shuffles are the
  * `distinct()` on keys and the final left join — both keyed by the natural
  * partition keys, which AQE coalesces at runtime.
  */
object Reshape {

  /** R1: categorical→wide pivot (reference `db_etl/etl.py:897-922`,
    * `pivot_table(aggfunc=max)`). Supplying `categories` up front avoids the
    * extra distinct-collect job Spark otherwise runs to discover pivot values —
    * at 100 TB that discovery pass is a full scan, so always pass them when known. */
  def pivotWide(df: DataFrame, keys: Seq[String], categoryCol: String,
                valueCol: String, categories: Seq[Any] = Nil): DataFrame = {
    val g = df.groupBy(keys.map(col): _*)
    val p = if (categories.nonEmpty) g.pivot(categoryCol, categories) else g.pivot(categoryCol)
    p.agg(max(col(valueCol)))
  }

  /** R2: wide→EAV melt (reference `db_etl_upload/uploader.py:612-618`).
    * Spark-native `unpivot` — a generate, no shuffle. */
  def melt(df: DataFrame, ids: Seq[String], metrics: Seq[String],
           metricName: String = "metric", valueName: String = "payload"): DataFrame =
    df.unpivot(ids.map(col).toArray, metrics.map(col).toArray, metricName, valueName)

  /** R3: date-spine densify (reference `homogenise_dates`,
    * `db_etl/processors/homogenisation.py:28-78`): every key combination gets
    * every date in the *global* [min, max] range; data is outer-joined on.
    * The reference builds the spine as a pandas cross product per areaType;
    * here: distinct keys × broadcast date sequence. */
  def densifyDates(df: DataFrame, keys: Seq[String], dateCol: String,
                   boundsBy: Seq[String] = Nil): DataFrame = {
    // Instead of materializing the full (keys × dates) spine and joining the
    // data onto it (two wide shuffles), emit only the MISSING (key, date)
    // rows — per key, the global date range minus the dates present
    // (array_except is a hash-set pass) — and union them with the original
    // rows. The only shuffle is the per-key collect_set aggregation, whose
    // output is one small row per key.
    //
    // `boundsBy` (must be a subset of `keys`) scopes the [min, max] range:
    // empty = one global range (reference `homogenise_dates` within a chunk);
    // non-empty = one range per group, for inputs that carry several chunks'
    // worth of data (e.g. ChunkRouter route partitions, scoped per category).
    require(boundsBy.forall(keys.contains), s"boundsBy $boundsBy must be within keys $keys")
    val valueCols = df.columns.filterNot((keys :+ dateCol).contains).toSeq
    val present = df.groupBy(keys.map(col): _*)
      .agg(collect_set(col(dateCol)).as("__ds"))
    val bounds = present.groupBy(boundsBy.map(col): _*)
      .agg(min(array_min(col("__ds"))).as("__lo"), max(array_max(col("__ds"))).as("__hi"))
    val withBounds =
      if (boundsBy.isEmpty) present.crossJoin(broadcast(bounds))
      else present.join(broadcast(bounds), boundsBy)
    val missing = withBounds
      .select(keys.map(col) :+
        explode(array_except(
          sequence(col("__lo"), col("__hi"), expr("interval 1 day")),
          col("__ds"))).as(dateCol): _*)
      .select(keys.map(col) ++ Seq(col(dateCol)) ++
        valueCols.map(c => lit(null).cast(df.schema(c).dataType).as(c)): _*)
    df.select((keys :+ dateCol).map(col) ++ valueCols.map(col): _*)
      .unionByName(missing)
  }

  /** R4: demographics densify — same spine with an extra nesting dimension
    * (age band / variant) and a configurable step (daily or weekly,
    * reference `homogenisation.py:81-130`).
    *
    * Like [[densifyDates]], this never materializes-and-joins the full
    * (key × nesting × date) spine — at scale that spine dwarfs the data and
    * its left join re-shuffles both sides. Instead it emits only the MISSING
    * rows (grid dates minus each pair's observed dates) and unions them on:
    * the sole wide shuffle is the per-(key, nesting) `collect_set`, which
    * reduces map-side to one small row per pair. */
  def densifyNested(df: DataFrame, keys: Seq[String], dateCol: String,
                    nestingCol: String, stepDays: Int = 1): DataFrame = {
    val pairCols = keys :+ nestingCol
    val valueCols = df.columns.filterNot((pairCols :+ dateCol).contains).toSeq
    val present = df.groupBy(pairCols.map(col): _*)
      .agg(collect_set(col(dateCol)).as("__ds"))
    val bounds = present
      .agg(min(array_min(col("__ds"))).as("__lo"), max(array_max(col("__ds"))).as("__hi"))
    // Every (key × nesting) combination gets spine rows — including pairs
    // never observed together, which `present` alone would miss.
    val pairs = df.select(keys.map(col): _*).distinct()
      .crossJoin(broadcast(df.select(col(nestingCol)).distinct()))
    val missing = pairs
      .join(present, pairCols, "left")
      .crossJoin(broadcast(bounds))
      .select(pairCols.map(col) :+
        explode(array_except(
          sequence(col("__lo"), col("__hi"), expr(s"interval $stepDays day")),
          coalesce(col("__ds"), array().cast(
            org.apache.spark.sql.types.ArrayType(df.schema(dateCol).dataType))))).as(dateCol): _*)
      .select((keys :+ dateCol :+ nestingCol).map(col) ++
        valueCols.map(c => lit(null).cast(df.schema(c).dataType).as(c)): _*)
    // Off-grid data rows don't exist on a stepped spine (the join-based spine
    // dropped them); on the daily grid every observed date is on-grid.
    val onGrid =
      if (stepDays == 1) df
      else df.crossJoin(broadcast(bounds))
        .where(pmod(datediff(col(dateCol), col("__lo")), lit(stepDays)) === 0)
        .drop("__lo", "__hi")
    onGrid.select((keys :+ dateCol :+ nestingCol).map(col) ++ valueCols.map(col): _*)
      .unionByName(missing)
  }

  /** R5: MSOA-style tail zero-pad (reference `msoa_etl_db/processor.py:146-171`):
    * append explicit zero rows for each key's missing trailing dates up to the
    * dataset-global max date. */
  def zeroPadTail(df: DataFrame, keys: Seq[String], dateCol: String,
                  metric: String): DataFrame = {
    val globalMax = df.agg(max(col(dateCol)).as("gmax"))
    val perKeyMax = df.groupBy(keys.map(col): _*).agg(max(col(dateCol)).as("kmax"))
    val pad = perKeyMax.crossJoin(broadcast(globalMax))
      .where(col("kmax") < col("gmax"))
      .select(keys.map(col) :+
        explode(sequence(date_add(col("kmax"), 1), col("gmax"), expr("interval 1 day"))).as(dateCol): _*)
      .withColumn(metric, lit(0.0))
    df.select((keys :+ dateCol :+ metric).map(col): _*).unionByName(pad)
  }

  /** R6: nest to array-of-structs (reference `db_etl/etl.py:1315-1321`,
    * `groupby().apply(to_dict)`). `sort_array` on a struct whose first field is
    * the sort key gives the deterministic ordering pandas gets from input order. */
  def nest(df: DataFrame, keys: Seq[String], sortCol: String,
           valueCols: Seq[String], outCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(struct((sortCol +: valueCols).map(col): _*))).as(outCol))

  /** R7: unnest (reference `main_etl_nested_metrics_converter/converter.py:48-74`):
    * explode an array column keeping element position. */
  def unnest(df: DataFrame, keys: Seq[String], arrayCol: String,
             posName: String = "pos", elemName: String = "elem"): DataFrame =
    df.select(keys.map(col) :+ posexplode(col(arrayCol)).as(Seq(posName, elemName)): _*)

  /** R9: element-wise pair operation on two nested metrics
    * (reference `calculate_pair_tested`, `db_etl/etl.py:760-801`) without
    * explode/re-nest: `zip_with` keeps it a single codegen'd projection. */
  def zipNested(df: DataFrame, a: String, b: String, out: String)
               (f: (Column, Column) => Column): DataFrame =
    df.withColumn(out, zip_with(col(a), col(b), f))
}
