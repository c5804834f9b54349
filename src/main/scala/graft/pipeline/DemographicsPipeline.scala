package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators._

/** The demographics pipeline (SURVEY.md §3.2, reference `run_demographics`
  * `db_etl/etl.py:1190-1344` with per-category config at `etl.py:1193-1256`):
  * a data-driven spec drives densify → normalise → rolling age rates → rename
  * → nest into one array-of-structs metric column.
  */
object DemographicsPipeline {

  /** One demographics category config (mirror of the reference's dict):
    * which nested dimension, the date step, the base metric and its renamed
    * form, and the output nested-metric name. */
  case class Spec(nestingCol: String, stepDays: Int, baseMetric: String,
                  renamedMetric: String, outputMetric: String,
                  zeroFilled: Boolean = true)

  /** Run one category spec over a long input
    * `(areaType, areaCode, areaName, date, <nestingCol>, <baseMetric>)`. */
  def run(df: DataFrame, spec: Spec, population: DataFrame): DataFrame = {
    val keys = Seq("areaType", "areaCode")
    val nestKeys = keys :+ spec.nestingCol

    // R4: (key × nesting × date) spine at the category's frequency.
    val dense = Reshape.densifyNested(df, keys, "date", spec.nestingCol, spec.stepDays)

    // Demographic normalise (normalisation.py:81-147): zero-fill the whole
    // column (not bounded), repair areaName, cumulative seed at min date.
    val filled =
      if (spec.zeroFilled)
        dense.withColumn(spec.baseMetric, coalesce(col(spec.baseMetric), lit(0d)))
      else dense
    val named =
      if (df.columns.contains("areaName")) Fill.repairConstant(filled, Seq("areaCode"), "areaName")
      else filled

    // A3/A4 with the nesting dimension in the partition key: rolling sum and
    // rate per (area, band), population joined on (areaCode, band).
    val rolled = Rolling.rollingSum(named, nestKeys, "date", spec.baseMetric, "rollingSum")
    val rated = Rolling.ratePer(
      rolled.join(broadcast(population), Seq("areaCode", spec.nestingCol), "left"),
      "rollingSum", "population", "rollingRate").drop("population")

    // Rename base metric (e.g. newCasesBySpecimenDate → cases) and nest (R6):
    // one row per (area, date) holding [{band, cases, rollingSum, rollingRate}].
    val renamed = rated.withColumnRenamed(spec.baseMetric, spec.renamedMetric)
    Reshape.nest(renamed, keys :+ "date", spec.nestingCol,
      Seq(spec.renamedMetric, "rollingSum", "rollingRate"), spec.outputMetric)
  }
}
