package graft

import org.apache.spark.sql.functions._

import graft.pipeline.ChunkRouter

/** Routing-table semantics (reference `chunk_etl_processor/processor.py:25-85`):
  * area-type normalisation, subcategory-gated demographics routes, and the
  * no-handler drop. */
class ChunkRouterSpec extends SparkSpec {
  import spark.implicits._

  private def routeOf(category: String, subcategory: Option[String],
                      areaType: Option[String]): Option[String] = {
    val df = Seq((category, subcategory, areaType))
      .toDF("category", "subcategory", "areaType")
    val r = ChunkRouter.route(df).select("route").collect().head
    Option(r.getString(0))
  }

  test("direct categories route direct, with non-MSOA area types normalized away") {
    assert(routeOf("cases", None, None) === Some(ChunkRouter.Direct))
    assert(routeOf("cases", None, Some("ltla")) === Some(ChunkRouter.Direct))
    assert(routeOf("deaths", Some("anything"), Some("UTLA")) === Some(ChunkRouter.Direct))
  }

  test("vaccinations-by-vaccination-date at MSOA routes msoa-lite, case-insensitively") {
    assert(routeOf("vaccinations-by-vaccination-date", None, Some("msoa"))
      === Some(ChunkRouter.DirectMsoa))
    assert(routeOf("vaccinations-by-vaccination-date", None, Some("Msoa"))
      === Some(ChunkRouter.DirectMsoa))
  }

  test("demographics routes need the matching subcategory") {
    assert(routeOf("cases-by-specimen-date", Some("age-demographics"), None)
      === Some(ChunkRouter.Demographics))
    assert(routeOf("variants", Some("episodes"), None)
      === Some(ChunkRouter.Demographics))
    assert(routeOf("cases-by-specimen-date", None, None) === None)
    assert(routeOf("variants", None, None) === None)
  }

  test("demographics route dispatches through the full demographics pipeline") {
    import graft.pipeline.DemographicsPipeline
    val chunks = Seq(
      ("cases-by-specimen-date", Option("age-demographics"), "ltla", "A1",
        "2026-01-01", "00_04", 3.0),
      ("cases-by-specimen-date", Option("age-demographics"), "ltla", "A1",
        "2026-01-02", "00_04", 4.0),
      ("nonsense", Option("age-demographics"), "ltla", "A1",
        "2026-01-01", "00_04", 99.0))
      .toDF("category", "subcategory", "areaType", "areaCode", "date", "age",
        "newCases")
      .withColumn("date", to_date(col("date")))
    val pop = Seq(("A1", "00_04", 1000.0)).toDF("areaCode", "age", "population")
    val out = ChunkRouter.runRouted(chunks, Map(
      ChunkRouter.Demographics -> ChunkRouter.demographicsHandler(
        DemographicsPipeline.Spec("age", 1, "newCases", "cases",
          "newCasesAgeDemographics"), pop) _))
    val rows = out.orderBy("date").collect()
    assert(rows.length === 2) // the unrouted category's row is gone
    assert(out.columns.contains("newCasesAgeDemographics"))
    val first = rows.head.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("newCasesAgeDemographics")
    assert(first.head.getAs[String]("age") === "00_04")
    assert(first.head.getAs[Double]("cases") === 3.0)
  }

  test("unknown categories are unrouted and runRouted drops them") {
    assert(routeOf("nonsense", None, None) === None)
    val chunks = Seq(
      ("cases", Option.empty[String], "ltla", "A1", "2026-01-01", 1.0),
      ("nonsense", Option.empty[String], "ltla", "A1", "2026-01-01", 2.0))
      .toDF("category", "subcategory", "areaType", "areaCode", "date", "newCases")
      .withColumn("date", to_date(col("date")))
    val out = ChunkRouter.runRouted(chunks,
      Map(ChunkRouter.Direct -> ChunkRouter.directHandler("newCases") _))
    assert(out.select("category").distinct().as[String].collect().toSeq === Seq("cases"))
  }
}
