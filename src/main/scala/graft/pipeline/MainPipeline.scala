package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions
import graft.operators._
import graft.sources.Tables

/** The flagship end-to-end pipeline — the reference's canonical `process()`
  * order (`db_etl/etl.py:996-1022` + upload `deploy`, SURVEY.md §3.1) composed
  * Spark-first on the supplier daily series:
  *
  *   densify (R3) → normalise zero-fill (W8) → rolling family (A3/W1/W2/W3)
  *   → rates (A4) → trim_end (P5) → melt to EAV (R2) → payload wrap (P8)
  *   → keyed BLAKE2s row hash → partition-keyed EAV rows (S9/S10 shape).
  *
  * Single logical plan: Catalyst shares the (areaCode × date) shuffle across
  * the window stages, dims ride as broadcasts, and the output is partitioned
  * by `partition_id` exactly like the reference's Postgres partition scheme.
  */
object MainPipeline {

  val RecordKey = "graft-record-key" // stands in for the reference's RECORD_KEY env secret

  /** Deterministic stand-in for the release timestamp (`%Y_%-m_%-d` shape,
    * uploader.py:246-252): one value per release, NOT per series row. */
  def releaseDate(releaseId: Int): String = s"2026_8_$releaseId"

  def run(spark: SparkSession, sfDir: String, releaseId: Int = 1): DataFrame = {
    HashFunctions.register(spark)
    val keys = Seq("areaType", "areaCode")
    val daily = Tables.supplierDaily(spark, sfDir)
      .select(lit("supplier").as("areaType"),
        col("l_suppkey").cast("string").as("areaCode"),
        col("date"), col("qty"))

    // R3 + W8: dense daily spine, bounded zero-fill
    val dense = Reshape.densifyDates(daily, keys, "date")
    val filled = Fill.zeroFillBounded(dense, keys, "date", "qty")

    // A3/W1/W2/W3 rolling family
    val rolled = Rolling.changeBySum(filled, keys, "date", "qty")

    // A4: rolling rate per 100k against the broadcast population dim
    val pop = Tables.load(spark, sfDir, "supplier")
      .select(col("s_suppkey").cast("string").as("areaCode"),
        abs(col("s_acctbal")).as("population"))
    val rated = Rolling.ratePer(
      rolled.join(broadcast(pop), Seq("areaCode"), "left"),
      "qtyRollingSum", "population", "qtyRollingRate").drop("population")

    // P5: trailing 5-day trim on the event-dated metrics. The cutoff scalar
    // comes from the RAW daily frame (same max date as the dense frame):
    // deriving it from `rated` would re-derive the whole densify subtree a
    // second time just for one max(date) — ~40% of the old q51 plan.
    val trimmed = Trim.trimEnd(rated, "date",
      Seq("qty", "qtyRollingSum", "qtyRollingRate"), daysToTrim = 5,
      cutoffFrom = Some(daily))

    // R2 + P8: melt wide → EAV long with JSON-wrapped payloads
    val metrics = Seq("qty", "qtyRollingSum", "qtyChange", "qtyDirection",
      "qtyChangePercentage", "qtyRollingRate")
    // `ignoreNullFields=false` so a null metric wraps as {"value":null} like
    // the reference's json.dumps (uploader.py:501-508), not as {}.
    val wrapped = metrics.foldLeft(trimmed) { (acc, m) =>
      acc.withColumn(m,
        to_json(struct(col(m).as("value")), Map("ignoreNullFields" -> "false")))
    }
    val long = Reshape.melt(
      wrapped.select((keys ++ Seq("date") ++ metrics).map(col): _*),
      ids = keys :+ "date", metrics = metrics)

    // Row identity: keyed BLAKE2s over the reference's hash columns
    // (uploader.py:143-192), partition id per (release date, area group).
    // partition_id is keyed by the RELEASE date + area group (reference
    // uploader.py:246-252) — constant per release, so one release writes a
    // handful of partitions, not one per series date.
    long
      .withColumn("release_id", lit(releaseId))
      .withColumn("partition_id",
        concat(lit(releaseDate(releaseId)), lit("|"), col("areaType")))
      .withColumn("hash", HashFunctions.blake2sHex(
        concat(date_format(col("date"), "yyyy-MM-dd"), col("areaType"),
          col("areaCode"), col("metric"), col("release_id").cast("string")),
        RecordKey, 12))
      .select("hash", "release_id", "areaType", "areaCode", "metric",
        "partition_id", "date", "payload")
  }
}
