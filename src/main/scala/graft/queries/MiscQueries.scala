package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions
import graft.operators._
import graft.pipeline.MainPipeline
import graft.sources.Tables

/** Long-format upload-layer queries (trim_sides with full oracle) plus the
  * rows-only-checked operators whose outputs depend on engine-internal hashes
  * or nested types DuckDB can't hash-compare (nest, MinHash, SimHash,
  * fingerprint, LSH ANN, BLAKE2s, full EAV pipeline).
  */
object MiscQueries {

  /** Long EAV-ish frame with three engineered metrics: `clipped` (leading
    * zeros → exercises head trim), `variants` (never trimmed), `gappy`
    * (interior nulls). Shared by the Spark query and the oracle. */
  private def longFrame(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.supplierDaily(s, dir)
    d.select(col("l_suppkey"), col("date"), lit("clipped").as("metric"),
        greatest(col("qty") - 25d, lit(0d)).as("payload"))
      .unionByName(d.select(col("l_suppkey"), col("date"), lit("variants").as("metric"),
        col("qty").as("payload")))
      .unionByName(d.select(col("l_suppkey"), col("date"), lit("gappy").as("metric"),
        when(dayofmonth(col("date")) % 3 === 0, lit(null)).otherwise(col("qty")).as("payload")))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // P6: trim_sides on long rows, pandas-quirk-faithful (uploader.py:55-90)
    "q36_trim_sides" -> ((s, dir) =>
      Trim.trimSides(longFrame(s, dir), Seq("l_suppkey"), "date")
        .withColumn("date", date_format(col("date"), "yyyy-MM-dd"))),

    // P7: weekly-metric null drop (uploader.py:444-475)
    "q37_weekly_drop" -> ((s, dir) =>
      Trim.dropWeeklyNulls(
        longFrame(s, dir).withColumn("metric",
          when(col("metric") === "gappy", "gappyWeekly").otherwise(col("metric"))),
        "metric", "payload")
        .withColumn("date", date_format(col("date"), "yyyy-MM-dd"))),

    // R6: nest to array-of-structs — rows-only (DuckDB can't hash-compare
    // nested arrays through the driver); content asserted in ScalaTest.
    "q34_nest_series" -> ((s, dir) =>
      Reshape.nest(Tables.supplierDaily(s, dir),
        Seq("l_suppkey"), "date", Seq("qty"), "series")),

    // Keyed BLAKE2s row hash — rows-only (no BLAKE2 in DuckDB); RFC vectors
    // asserted in ScalaTest.
    "q35_blake2s_hash" -> ((s, dir) => {
      HashFunctions.register(s)
      Tables.load(s, dir, "documents").select(col("doc_id"),
        HashFunctions.blake2sHex(col("text"), MainPipeline.RecordKey, 12).as("row_hash"))
    }),

    // MinHash-LSH near-dup candidates — rows-only (xxhash64-dependent).
    "q45_minhash_pairs" -> ((s, dir) =>
      Dedup.minhashNearDups(Tables.load(s, dir, "documents"), "doc_id", "text",
        threshold = 0.5)),

    // SimHash fingerprints + near-dup pairs — rows-only.
    "q46_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashNearDups(Tables.load(s, dir, "documents"), "doc_id", "text",
        maxHamming = 6)),

    // Rolling-hash document fingerprint — rows-only.
    "q47_fingerprint" -> ((s, dir) =>
      Tables.load(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fingerprint"))),

    // LSH-bucketed ANN — rows-only (bucket boundaries are seed-dependent).
    "q49_lsh_ann" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      Similarity.lshTopK(
        emb.where(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
        emb.select(col("vec_id").as("cand_id"), col("embedding").as("cand_emb")),
        dim = 64, k = 5)
    }),

    // Full EAV pipeline (flagship, also SparkEntry.entry) — rows-only.
    "q51_eav_pipeline" -> ((s, dir) => MainPipeline.run(s, dir))
  )

  private val longCte =
    """daily AS (
      |  SELECT l_suppkey, CAST(l_shipdate AS DATE) AS date,
      |         CAST(SUM(l_quantity) AS DOUBLE) AS qty
      |  FROM lineitem GROUP BY 1, 2
      |),
      |long AS (
      |  SELECT l_suppkey, date, 'clipped' AS metric, greatest(qty - 25, 0) AS payload FROM daily
      |  UNION ALL
      |  SELECT l_suppkey, date, 'variants', qty FROM daily
      |  UNION ALL
      |  SELECT l_suppkey, date, 'gappy',
      |         CASE WHEN day(date) % 3 = 0 THEN NULL ELSE qty END FROM daily
      |)""".stripMargin

  def oracles: Map[String, String] = Map(
    "q36_trim_sides" ->
      s"""WITH $longCte,
         |pos AS (
         |  SELECT l_suppkey, metric, date, payload,
         |         row_number() OVER w AS p,
         |         SUM(abs(payload)) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM long WINDOW w AS (PARTITION BY l_suppkey, metric ORDER BY date)
         |),
         |b1 AS (
         |  SELECT *, COALESCE(
         |           min(CASE WHEN cum > 0 THEN p END) OVER g,
         |           min(CASE WHEN payload IS NOT NULL THEN p END) OVER g) AS f,
         |         min(CASE WHEN payload IS NOT NULL THEN p END) OVER g AS fnn
         |  FROM pos WINDOW g AS (PARTITION BY l_suppkey, metric)
         |),
         |b2 AS (
         |  SELECT *, max(CASE WHEN payload IS NOT NULL AND p > f + 1 THEN p END) OVER g AS l
         |  FROM b1 WINDOW g AS (PARTITION BY l_suppkey, metric)
         |)
         |SELECT l_suppkey, strftime(date, '%Y-%m-%d') AS date, metric, payload
         |FROM b2
         |WHERE fnn IS NULL OR metric = 'variants' OR l IS NULL
         |      OR (p > f + 1 AND p < l - 1)""".stripMargin,

    "q37_weekly_drop" ->
      s"""WITH $longCte,
         |renamed AS (
         |  SELECT l_suppkey, date,
         |         CASE WHEN metric = 'gappy' THEN 'gappyWeekly' ELSE metric END AS metric,
         |         payload
         |  FROM long
         |)
         |SELECT l_suppkey, strftime(date, '%Y-%m-%d') AS date, metric, payload
         |FROM renamed
         |WHERE NOT (lower(metric) LIKE '%weekly%' AND payload IS NULL)""".stripMargin
  )
}
