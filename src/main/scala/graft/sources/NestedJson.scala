package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S1: the reference's raw nested main-release JSON
  * `{areaType: {areaCode: {metricName: [{date, value, ...}], name: {value}}}}`
  * (parsed at `db_etl/etl.py:1374-1383`, flattened by `extract_category_data`
  * `etl.py:804-868`) shredded Spark-first: `from_json` into nested maps, then
  * two `explode(map_entries(...))` generates — no row-level Python, one pass,
  * fully parallel once the document is split per area file (the reference
  * splits the same way, `main_etl_retrieve_data/retrieve.py:144-163`).
  */
object NestedJson {

  /** Payload entry: one observation of one metric. */
  private val entryType = ArrayType(MapType(StringType, StringType))

  /** areaCode → metricName → array of {date, value-ish fields}. */
  private val docType: DataType =
    MapType(StringType, MapType(StringType, entryType))

  /** Parse one release document (whole-file JSON string) into the long
    * categorical frame `(areaType, areaCode, category, date, value)` — the
    * input shape of the pivot (R1). The document mixes value shapes under one
    * map (`name: {value}` object vs metric `[{date, value}]` arrays), which
    * defeats `from_json` (a single mismatch nulls the whole map), so the
    * shredding uses Spark 4's VariantType: `parse_json` once, then three
    * `variant_explode` laterals over the dynamic keys, branching on the
    * variant's runtime shape. The `name` pseudo-metric becomes the `areaName`
    * column, mirroring `extract_category_data` (`db_etl/etl.py:804-868`). */
  def parseRelease(spark: SparkSession, jsonPath: String): DataFrame = {
    val view = "nested_release_" + java.util.UUID.randomUUID.toString.replace("-", "")
    spark.read.option("wholetext", "true").text(jsonPath).createOrReplaceTempView(view)
    spark.sql(
      s"""WITH l1 AS (
         |  SELECT v1.key AS areaType, v1.value AS areas
         |  FROM $view, LATERAL variant_explode(parse_json(value)) v1
         |),
         |l2 AS (
         |  SELECT areaType, v2.key AS areaCode, v2.value AS metrics
         |  FROM l1, LATERAL variant_explode(areas) v2
         |),
         |l3 AS (
         |  SELECT areaType, areaCode, v3.key AS category, v3.value AS payload
         |  FROM l2, LATERAL variant_explode(metrics) v3
         |),
         |obs AS (
         |  SELECT areaType, areaCode, category,
         |         CAST(variant_get(v4.value, '$$.date', 'string') AS DATE) AS date,
         |         variant_get(v4.value, '$$.value', 'double') AS value
         |  FROM l3, LATERAL variant_explode(payload) v4
         |  WHERE category != 'name' AND schema_of_variant(payload) LIKE 'ARRAY%'
         |),
         |names AS (
         |  SELECT DISTINCT areaType, areaCode,
         |         variant_get(payload, '$$.value', 'string') AS areaName
         |  FROM l3 WHERE category = 'name'
         |)
         |SELECT obs.*, names.areaName
         |FROM obs LEFT JOIN names USING (areaType, areaCode)
         |""".stripMargin)
  }

  /** S2 semantic equivalent: rename metrics *after* parse (the reference
    * string-replaces names in the raw text, `retrieve.py:46-68` — a textual
    * hack; relationally it's just a category-value mapping). */
  def renameCategories(df: DataFrame, renames: Map[String, String]): DataFrame =
    renames.foldLeft(df) { case (acc, (from, to)) =>
      acc.withColumn("category", when(col("category") === from, to).otherwise(col("category")))
    }
}
