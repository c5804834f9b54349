package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{Fill, Reshape, Rolling}

/** Chunk-category routing — the reference's second entry point
  * (`chunk_etl_processor/processor.py:25-85` dispatch table +
  * `db_etl/etl.py:1027-1143` `run_direct` / `run_direct_msoas`): pre-pivoted
  * wide chunks arrive tagged with (category, subcategory, area_type) and are
  * dispatched to one of three processors — the full direct pipeline, the
  * MSOA-lite homogenise+normalise path, or the demographics pipeline.
  *
  * Spark-first reframing: the reference dispatches one blob at a time through
  * a Python function table; here the routing table is a static column
  * expression (`when`-chain — pure projection, pushes down to the scan) and
  * each handler processes its ENTIRE route partition as one DataFrame, so a
  * day's thousands of chunks become three set-oriented pipeline runs instead
  * of thousands of task invocations. Unrouted categories are dropped, exactly
  * like the reference's "no process handler defined" return.
  */
object ChunkRouter {

  /** Route tags. */
  val Direct = "direct"
  val DirectMsoa = "direct_msoa"
  val Demographics = "demographics"

  private val DirectCategories = Seq(
    "vaccination", "positivity", "healthcare", "tests", "cases", "deaths")
  private val DemographicsCategories = Seq(
    "vaccinations-by-vaccination-date", "cases-by-specimen-date",
    "deaths28days-by-death-date", "first-episodes-by-specimen-date",
    "reinfections-by-specimen-date")

  /** The reference's handler table as one column expression. Area type is
    * normalized the way `processor.py:63-64` does: upper-cased, and anything
    * that isn't MSOA routes as if absent. Null when no handler is defined. */
  def routeExpr(category: Column, subcategory: Column, areaType: Column): Column = {
    val isMsoa = upper(areaType) === "MSOA"
    when(category.isin(DirectCategories: _*) && !coalesce(isMsoa, lit(false)),
        Direct)
      .when(category === "vaccinations-by-vaccination-date" && isMsoa, DirectMsoa)
      .when(category.isin(DemographicsCategories: _*) &&
          !coalesce(isMsoa, lit(false)) && subcategory === "age-demographics",
        Demographics)
      .when(category === "variants" && !coalesce(isMsoa, lit(false)) &&
          subcategory === "episodes",
        Demographics)
  }

  /** Tag each chunk row with its route (null = unrouted). */
  def route(chunks: DataFrame, categoryCol: String = "category",
            subcategoryCol: String = "subcategory",
            areaTypeCol: String = "areaType"): DataFrame = {
    require(!chunks.columns.contains("route"),
      "input already has a 'route' column; rename it before routing")
    chunks.withColumn("route",
      routeExpr(col(categoryCol), col(subcategoryCol), col(areaTypeCol)))
  }

  /** Dispatch: run each registered handler on its full route partition and
    * union the results (handlers must agree on an output schema). Rows whose
    * route has no handler are dropped. */
  def runRouted(chunks: DataFrame,
                handlers: Map[String, DataFrame => DataFrame]): DataFrame = {
    require(handlers.nonEmpty, "runRouted needs at least one handler")
    val tagged = route(chunks)
    handlers.map { case (tag, handler) =>
      handler(tagged.where(col("route") === tag).drop("route"))
    }.reduce(_ unionByName _)
  }

  /** `run_direct`'s processing core on a whole route partition: homogenise
    * the date spine, bounded zero-fill, 7-day rolling sum, melt to the EAV
    * shape the daily chunk store deploys (`etl.py:996-1022` direct slice). */
  def directHandler(metric: String)(df: DataFrame): DataFrame = {
    val keys = Seq("category", "areaCode")
    val dense = Reshape.densifyDates(df, keys, "date", boundsBy = Seq("category"))
    val filled = Fill.normaliseRecords(dense, keys, "date",
      zeroFilled = Seq(metric), cumulative = Nil)
    val rolled = Rolling.rollingSum(filled, keys, "date", metric,
      metric + "RollingSum")
    Reshape.melt(
      rolled.withColumn("date", date_format(col("date"), "yyyy-MM-dd")),
      ids = keys :+ "date", metrics = Seq(metric, metric + "RollingSum"),
      metricName = "metric", valueName = "value")
  }

  /** `run_demographics`' core on a route partition: adapt the chunk columns
    * to the spec and run the full demographics pipeline. Produces the nested
    * array-of-structs chunk shape — deliberately different from the direct
    * routes' EAV shape, exactly as in the reference, so it is dispatched on
    * its own rather than unioned with them. Expects one category per
    * invocation (the reference dispatches per chunk; route partitions of a
    * single demographics category preserve that scope). */
  def demographicsHandler(spec: DemographicsPipeline.Spec,
                          population: DataFrame)(df: DataFrame): DataFrame = {
    // Several categories share the demographics route; running two of them
    // through one pipeline call would silently merge their rows once
    // `category` is dropped. Enforce the one-category contract loudly —
    // the check is metadata-scale (a distinct on one column).
    val cats = df.select("category").distinct().collect().map(_.getString(0))
    require(cats.length <= 1,
      s"demographicsHandler expects one category per invocation, got " +
        s"${cats.sorted.mkString(", ")}; dispatch each category separately")
    DemographicsPipeline.run(
      df.select(Seq("areaType", "areaCode", "date", spec.nestingCol,
        spec.baseMetric).map(col): _*),
      spec, population)
  }

  /** `run_direct_msoas`' processing core: homogenise + normalise only
    * (zero-fill the event metric, forward-fill the cumulative one) — no
    * rolling family (`etl.py:1113-1119`). */
  def msoaHandler(zeroFilled: String, cumulative: String)(df: DataFrame): DataFrame = {
    val keys = Seq("category", "areaCode")
    val dense = Reshape.densifyDates(df, keys, "date", boundsBy = Seq("category"))
    val filled = Fill.normaliseRecords(dense, keys, "date",
      zeroFilled = Seq(zeroFilled), cumulative = Seq(cumulative))
    Reshape.melt(
      filled.withColumn("date", date_format(col("date"), "yyyy-MM-dd")),
      ids = keys :+ "date", metrics = Seq(zeroFilled, cumulative),
      metricName = "metric", valueName = "value")
  }
}
