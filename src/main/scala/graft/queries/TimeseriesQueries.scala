package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.Tables

/** Core reference-operator queries (SURVEY.md §2.2-2.7) instantiated on the
  * driver's TPC-H-ish test tables, each with an equivalent DuckDB oracle.
  *
  * Fixture mapping (FIXTURES.md §8): supplier ≈ area, ship date ≈ series date,
  * daily quantity ≈ metric value. Output conventions shared with the oracles:
  * dates as `yyyy-MM-dd` strings, aggregated counts as BIGINT, derived doubles
  * rounded explicitly — so the driver's hash compare is byte-stable.
  */
object TimeseriesQueries {

  // ---- shared Spark-side inputs -------------------------------------------

  /** Dense daily (supplier × date) series with nullable qty. */
  private def dense(spark: SparkSession, dir: String): DataFrame =
    Reshape.densifyDates(Tables.supplierDaily(spark, dir), Seq("l_suppkey"), "date")

  /** Dense series with zero-filled qty (the post-normalisation shape the
    * reference's rolling block expects). */
  private def denseZ(spark: SparkSession, dir: String): DataFrame =
    dense(spark, dir).withColumn("qty0", coalesce(col("qty"), lit(0d))).drop("qty")

  private def fmtDate(df: DataFrame): DataFrame =
    df.withColumn("date", date_format(col("date"), "yyyy-MM-dd"))

  // ---- shared oracle CTEs --------------------------------------------------

  private val dailyCte =
    """daily AS (
      |  SELECT l_suppkey, CAST(l_shipdate AS DATE) AS date,
      |         CAST(SUM(l_quantity) AS DOUBLE) AS qty
      |  FROM lineitem GROUP BY 1, 2
      |)""".stripMargin

  private val denseCte =
    s"""$dailyCte,
       |bounds AS (SELECT min(date) AS lo, max(date) AS hi FROM daily),
       |dates AS (
       |  SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS date
       |  FROM bounds
       |),
       |spine AS (
       |  SELECT k.l_suppkey, d.date
       |  FROM (SELECT DISTINCT l_suppkey FROM daily) k CROSS JOIN dates d
       |),
       |dense AS (
       |  SELECT s.l_suppkey, s.date, daily.qty
       |  FROM spine s LEFT JOIN daily ON daily.l_suppkey = s.l_suppkey AND daily.date = s.date
       |)""".stripMargin

  private val denseZCte =
    s"""$denseCte,
       |densez AS (SELECT l_suppkey, date, COALESCE(qty, 0) AS qty0 FROM dense)""".stripMargin

  /** Rolling-sum layer: pandas rolling(7, min_periods=7) over the dense series. */
  private val rsCte =
    s"""$denseZCte,
       |rs AS (
       |  SELECT l_suppkey, date, qty0,
       |         CASE WHEN COUNT(qty0) OVER w7 = 7 THEN SUM(qty0) OVER w7 END AS rolling_sum
       |  FROM densez
       |  WINDOW w7 AS (PARTITION BY l_suppkey ORDER BY date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
       |)""".stripMargin

  // ---- queries -------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // R1: categorical→wide pivot (db_etl/etl.py:897-922)
    "q01_pivot_wide" -> ((s, dir) =>
      Reshape.pivotWide(Tables.load(s, dir, "lineitem"),
        Seq("l_orderkey"), "l_returnflag", "l_quantity", Seq("A", "N", "R"))),

    // R2: wide→EAV melt (db_etl_upload/uploader.py:612-618)
    "q02_melt_long" -> ((s, dir) =>
      Reshape.melt(
        Tables.load(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax"),
        ids = Seq("l_orderkey", "l_linenumber"),
        metrics = Seq("l_quantity", "l_discount", "l_tax"))),

    // R3: date-spine densify (homogenisation.py:28-78)
    "q03_densify_spine" -> ((s, dir) => fmtDate(dense(s, dir))),

    // A3: 7-day rolling sum, pandas min_periods semantics (generic_rate.py:78-92)
    "q04_rolling_sum_7d" -> ((s, dir) =>
      fmtDate(Rolling.rollingSum(denseZ(s, dir), Seq("l_suppkey"), "date", "qty0", "rolling_sum"))),

    // W1+W2: lag-7 change + direction (rolling.py:173-189)
    "q05_change_direction" -> ((s, dir) => {
      val rs = Rolling.rollingSum(denseZ(s, dir), Seq("l_suppkey"), "date", "qty0", "rolling_sum")
      val ch = Rolling.change(rs, Seq("l_suppkey"), "date", "rolling_sum", "change")
      fmtDate(ch.withColumn("direction", Rolling.direction(col("change"))))
    }),

    // W3: quirky 8-row percentage change (rolling.py:65-77)
    "q06_pct_change" -> ((s, dir) => {
      val rs = Rolling.rollingSum(denseZ(s, dir), Seq("l_suppkey"), "date", "qty0", "rolling_sum")
      fmtDate(Rolling.percentageChange(rs, Seq("l_suppkey"), "date", "rolling_sum", "change_percentage")
        .drop("qty0"))
    }),

    // W7: bounded forward-fill (normalisation.py:75-84)
    "q07_ffill_bounded" -> ((s, dir) =>
      fmtDate(Fill.forwardFillBounded(dense(s, dir), Seq("l_suppkey"), "date", "qty"))),

    // W8: bounded zero-fill (normalisation.py:58-66)
    "q08_zerofill_bounded" -> ((s, dir) =>
      fmtDate(Fill.zeroFillBounded(dense(s, dir), Seq("l_suppkey"), "date", "qty"))),

    // P5: trailing-window trim (trimmer.py:39-50)
    "q09_trim_end" -> ((s, dir) =>
      fmtDate(Trim.trimEnd(Tables.supplierDaily(s, dir), "date", Seq("qty"), daysToTrim = 5))),

    // Full MSOA rolling family with small-count suppression
    // (rolling.py:84-233 with min_sum_allowed=3/min_sum_sub=2, msoa processor P11)
    "q10_msoa_family" -> ((s, dir) => {
      val fam = Rolling.changeBySum(denseZ(s, dir), Seq("l_suppkey"), "date", "qty0",
        minSumAllowed = Some(3d), minSumSub = 2d)
      fmtDate(fam).withColumnRenamed("qty0RollingSum", "rolling_sum")
        .withColumnRenamed("qty0Change", "change")
        .withColumnRenamed("qty0Direction", "direction")
        .withColumnRenamed("qty0ChangePercentage", "change_percentage")
    }),

    // A14: deterministic dedup, keep-first (uploader.py:308-312)
    "q11_dedup_first" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .withColumn("date", date_format(col("o_orderdate"), "yyyy-MM-dd"))
      Serving.topNPerGroup(o, Seq("o_custkey", "date"), Seq(col("o_orderkey").asc), 1,
          useRowNumber = true)
        .select("o_orderkey", "o_custkey", "date", "o_totalprice")
    }),

    // W5: rank-latest-per-group (private_report/queries.py:3-24)
    "q12_rank_latest" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      Serving.topNPerGroup(o, Seq("o_custkey"), Seq(col("o_orderdate").desc), 1)
        .select(col("o_custkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("date"),
          col("o_orderkey"), col("o_totalprice"))
    }),

    // A8+O6: exact discrete percentiles per group ∪ whole-range row
    // (map_percentiles/queries.py:14-96)
    "q13_percentiles" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem").select(col("l_returnflag"), col("l_quantity"))
      val ps = Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75)
      // Union BEFORE the percentile pass (mirroring the oracle's src CTE):
      // one window stack over a real union attribute. Relabeling with a
      // literal key and computing separately would constant-fold the
      // partition key into an unpartitioned window (PlanSpec guards this).
      val src = li.unionByName(li.withColumn("l_returnflag", lit("ALL")))
      Serving.percentileDisc(src, Seq("l_returnflag"), "l_quantity", ps)
    }),

    // J6: full-outer alignment of per-status daily order counts
    // (db_etl_homepage_graphs/queries.py:63-128)
    "q14_full_outer_align" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .withColumn("date", date_format(col("o_orderdate"), "yyyy-MM-dd"))
      def slice(st: String, out: String) =
        o.where(col("o_orderstatus") === st).groupBy("date").agg(count(lit(1)).as(out))
      Serving.fullOuterAlign(
        Seq(slice("O", "n_open"), slice("F", "n_filled"), slice("P", "n_partial")),
        Seq("date"))
    }),

    // J8: latest-date semi join (rate_scales/queries.py:22-28)
    "q15_semi_latest" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_suppkey"), to_date(col("l_shipdate")).as("date"), col("l_quantity"))
      Serving.atLatestDate(li, "date")
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("n_items"), sum("l_quantity").cast("double").as("sum_qty"))
    }),

    // O3: top-3 per group with deterministic tiebreak
    // (main_etl_nested_metrics_converter/queries.py:22-57)
    "q16_top3_per_group" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      Serving.topNPerGroup(o, Seq("o_custkey"),
          Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3, useRowNumber = true)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    }),

    // J5: today-vs-yesterday release delta, clamped
    // (chunk_etl_postprocessing/vaccinations/queries.py:13-92)
    "q17_release_delta" -> ((s, dir) => {
      val daily = Tables.supplierDaily(s, dir)
      val latest = Serving.atLatestDate(daily, "date").select(col("l_suppkey"), col("qty"))
      val prevDate = daily.agg(date_sub(max(col("date")), 1).as("date"))
      val prev = daily.join(broadcast(prevDate), Seq("date"), "left_semi")
        .select(col("l_suppkey"), col("qty"))
      Serving.releaseDelta(latest, prev, Seq("l_suppkey"), "qty", "delta")
        .withColumnRenamed("qty", "today_qty")
    }),

    // A2: fill-latest-from-group-max (derived_metrics.py:25-100)
    "q18_adjacent_max" -> ((s, dir) => {
      val d = dense(s, dir)
      fmtDate(Serving.fillLatestFromGroupMax(d, Seq("l_suppkey"), "date", "qty", "qty")
        .withColumnRenamed("qty", "qty_filled"))
        .where(col("qty_filled").isNotNull)
    }),

    // A6: cumulative sum per key (db_etl/etl.py:938-958)
    "q19_cumsum" -> ((s, dir) =>
      fmtDate(Rolling.cumSum(Tables.supplierDaily(s, dir), Seq("l_suppkey"), "date", "qty", "cum_qty"))),

    // P8: EAV payload wrapping {"value": n} (uploader.py:501-508)
    "q20_payload_wrap" -> ((s, dir) =>
      fmtDate(Tables.supplierDaily(s, dir))
        .select(col("l_suppkey"), col("date"),
          to_json(struct(col("qty").cast("long").as("value"))).as("payload"))),

    // J1: star-schema dimension joins, broadcast dims
    // (rate_scales/queries.py:14-29 analogue)
    "q21_star_join" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val sup = Tables.load(s, dir, "supplier")
      val nat = Tables.load(s, dir, "nation")
      val reg = Tables.load(s, dir, "region")
      li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(sum("l_quantity").cast("long").as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1d) - col("l_discount"))), 2).as("revenue"))
    }),

    // A5/J2: incidence rate per 100k against a broadcast population dim
    // (generic_rate.py:121-133)
    "q22_incidence_rate" -> ((s, dir) => {
      val pop = Tables.load(s, dir, "supplier")
        .select(col("s_suppkey").as("l_suppkey"), col("s_acctbal").as("population"))
      fmtDate(Rolling.ratePer(
        Tables.supplierDaily(s, dir).join(broadcast(pop), Seq("l_suppkey")),
        "qty", "population", "qty_rate"))
        .drop("population")
    }),

    // Binning into half-open bands (landing_page_map/generate.py:106-151)
    "q23_binning" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .withColumn("band", Serving.bin(col("o_totalprice"),
          Seq(0d, 50000d, 100000d, 200000d, 400000d, 1000000d)))
        .groupBy("band").agg(count(lit(1)).as("n_orders"))),

    // P9 + scalar string family: normalization of coded strings
    // (etl.py:450-458, cache_prepopulate/query.sql:55-58)
    "q24_string_norm" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"),
          lower(element_at(split(col("o_orderpriority"), "-"), 2)).as("priority_label"),
          substring(col("o_orderpriority"), 1, 1).as("priority_code"))),

    // A11: latest date + max value per group (homepage_graphs/queries.py:30-62)
    "q25_latest_max" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(date_format(max(col("o_orderdate")), "yyyy-MM-dd").as("latest_date"),
          max(col("o_totalprice")).as("max_price"))),

    // A12: count per release (db_etl_update_db/update.py:24-38)
    "q26_count_per_status" -> ((s, dir) =>
      Tables.load(s, dir, "orders").groupBy("o_orderstatus").agg(count(lit(1)).as("n"))),

    // P3+P4: clamp-at-zero and ratio→percentage (etl.py:925-935, converter.py:33-39)
    "q27_clamp_ratio" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_quantity") - lit(30d)).as("centered"), col("l_discount"))
      Trim.ratioToPercentage(
        Trim.negativeToZero(li, Seq("centered")), Seq("l_discount"))
        .withColumnRenamed("centered", "clamped")
        .withColumnRenamed("l_discount", "discount_pct")
    }),

    // W6: centered rolling mean (homepage_graphs/utils.py:105)
    "q28_centered_mean" -> ((s, dir) =>
      fmtDate(Rolling.centeredMean(denseZ(s, dir), Seq("l_suppkey"), "date", "qty0", "smoothed")
        .withColumn("smoothed", round(col("smoothed"), 4)))),

    // W9/P12: repair a group-constant value scattered with nulls
    // (normalisation.py:70-73)
    "q29_name_repair" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      val joined = o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_custkey"),
          when(col("o_orderkey") % 3 === 0, col("c_name")).as("cust_name"))
      Fill.repairConstant(joined, Seq("o_custkey"), "cust_name")
    })
  )

  def oracles: Map[String, String] = Map(
    "q01_pivot_wide" ->
      """SELECT l_orderkey,
        |       max(CASE WHEN l_returnflag = 'A' THEN l_quantity END) AS "A",
        |       max(CASE WHEN l_returnflag = 'N' THEN l_quantity END) AS "N",
        |       max(CASE WHEN l_returnflag = 'R' THEN l_quantity END) AS "R"
        |FROM lineitem GROUP BY l_orderkey""".stripMargin,

    "q02_melt_long" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS payload FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem""".stripMargin,

    "q03_densify_spine" ->
      s"""WITH $denseCte
         |SELECT l_suppkey, strftime(date, '%Y-%m-%d') AS date, qty FROM dense""".stripMargin,

    "q04_rolling_sum_7d" ->
      s"""WITH $rsCte
         |SELECT l_suppkey, strftime(date, '%Y-%m-%d') AS date, qty0, rolling_sum FROM rs""".stripMargin,

    "q05_change_direction" ->
      s"""WITH $rsCte,
         |ch AS (
         |  SELECT l_suppkey, date, qty0, rolling_sum,
         |         rolling_sum - lag(rolling_sum, 7) OVER (PARTITION BY l_suppkey ORDER BY date) AS change
         |  FROM rs
         |)
         |SELECT l_suppkey, strftime(date, '%Y-%m-%d') AS date, qty0, rolling_sum, change,
         |       CASE WHEN change > 0 THEN 'UP' WHEN change < 0 THEN 'DOWN'
         |            WHEN change = 0 THEN 'SAME' END AS direction
         |FROM ch""".stripMargin,

    "q06_pct_change" ->
      s"""WITH $rsCte,
         |l AS (
         |  SELECT l_suppkey, date, rolling_sum,
         |         lag(rolling_sum, 7) OVER w AS den,
         |         COUNT(rolling_sum) OVER (w ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS cnt8
         |  FROM rs WINDOW w AS (PARTITION BY l_suppkey ORDER BY date)
         |)
         |SELECT l_suppkey, strftime(date, '%Y-%m-%d') AS date, rolling_sum,
         |       CASE WHEN cnt8 = 8 THEN
         |         CASE WHEN rolling_sum = 0 AND den > 0 THEN -100.0
         |              WHEN rolling_sum / (CASE WHEN den = 0 THEN 1 ELSE den END) - 1 = -1 THEN 0.0
         |              ELSE round((rolling_sum / (CASE WHEN den = 0 THEN 1 ELSE den END) - 1) * 100, 1)
         |         END
         |       END AS change_percentage
         |FROM l""".stripMargin,

    "q07_ffill_bounded" ->
      s"""WITH $denseCte,
         |b AS (
         |  SELECT l_suppkey, date, qty,
         |         min(CASE WHEN qty IS NOT NULL THEN date END) OVER (PARTITION BY l_suppkey) AS lo,
         |         max(CASE WHEN qty IS NOT NULL THEN date END) OVER (PARTITION BY l_suppkey) AS hi,
         |         last_value(qty IGNORE NULLS) OVER (PARTITION BY l_suppkey ORDER BY date
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
         |  FROM dense
         |)
         |SELECT l_suppkey, strftime(date, '%Y-%m-%d') AS date,
         |       CASE WHEN date >= lo AND date < hi THEN COALESCE(qty, running) ELSE qty END AS qty
         |FROM b""".stripMargin,

    "q08_zerofill_bounded" ->
      s"""WITH $denseCte,
         |b AS (
         |  SELECT l_suppkey, date, qty,
         |         min(CASE WHEN qty IS NOT NULL THEN date END) OVER (PARTITION BY l_suppkey) AS lo,
         |         max(CASE WHEN qty IS NOT NULL THEN date END) OVER (PARTITION BY l_suppkey) AS hi
         |  FROM dense
         |)
         |SELECT l_suppkey, strftime(date, '%Y-%m-%d') AS date,
         |       CASE WHEN date >= lo AND date < hi THEN COALESCE(qty, 0) ELSE qty END AS qty
         |FROM b""".stripMargin,

    "q09_trim_end" ->
      s"""WITH $dailyCte
         |SELECT l_suppkey, strftime(date, '%Y-%m-%d') AS date,
         |       CASE WHEN date <= (SELECT CAST(max(date) - INTERVAL 5 DAY AS DATE) FROM daily)
         |            THEN qty END AS qty
         |FROM daily""".stripMargin,

    "q10_msoa_family" ->
      s"""WITH $rsCte,
         |sub AS (
         |  SELECT l_suppkey, date, qty0,
         |         CASE WHEN rolling_sum < 3 THEN 2 ELSE rolling_sum END AS rs1
         |  FROM rs
         |),
         |z AS (
         |  SELECT l_suppkey, date, qty0,
         |         CASE WHEN SUM(rs1) OVER (PARTITION BY l_suppkey) = 0 THEN NULL ELSE rs1 END AS rs2
         |  FROM sub
         |),
         |ch AS (
         |  SELECT l_suppkey, date, qty0, rs2,
         |         rs2 - lag(rs2, 7) OVER w AS change,
         |         lag(rs2, 7) OVER w AS den,
         |         COUNT(rs2) OVER (w ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS cnt8
         |  FROM z WINDOW w AS (PARTITION BY l_suppkey ORDER BY date)
         |),
         |fam AS (
         |  SELECT l_suppkey, date, qty0, rs2, change,
         |         CASE WHEN change > 0 THEN 'UP' WHEN change < 0 THEN 'DOWN'
         |              WHEN change = 0 THEN 'SAME' END AS direction,
         |         CASE WHEN cnt8 = 8 THEN
         |           CASE WHEN rs2 = 0 AND den > 0 THEN -100.0
         |                WHEN rs2 / (CASE WHEN den = 0 THEN 1 ELSE den END) - 1 = -1 THEN 0.0
         |                ELSE round((rs2 / (CASE WHEN den = 0 THEN 1 ELSE den END) - 1) * 100, 1)
         |           END
         |         END AS change_percentage
         |  FROM ch
         |)
         |SELECT l_suppkey, strftime(date, '%Y-%m-%d') AS date,
         |       CASE WHEN rs2 = 2 THEN NULL ELSE qty0 END AS qty0,
         |       CASE WHEN rs2 = 2 THEN NULL ELSE rs2 END AS rolling_sum,
         |       CASE WHEN rs2 = 2 THEN NULL ELSE change END AS change,
         |       CASE WHEN rs2 = 2 THEN NULL ELSE direction END AS direction,
         |       CASE WHEN rs2 = 2 THEN NULL ELSE change_percentage END AS change_percentage
         |FROM fam""".stripMargin,

    "q11_dedup_first" ->
      """SELECT o_orderkey, o_custkey, date, o_totalprice FROM (
        |  SELECT o_orderkey, o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS date, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey, CAST(o_orderdate AS DATE)
        |                            ORDER BY o_orderkey) AS rn
        |  FROM orders
        |) WHERE rn = 1""".stripMargin,

    "q12_rank_latest" ->
      """SELECT o_custkey, date, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS date, o_orderkey, o_totalprice,
        |         rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC) AS r
        |  FROM orders
        |) WHERE r = 1""".stripMargin,

    "q13_percentiles" ->
      """WITH src AS (
        |  SELECT l_returnflag, l_quantity FROM lineitem
        |  UNION ALL
        |  SELECT 'ALL', l_quantity FROM lineitem
        |),
        |ranked AS (
        |  SELECT l_returnflag, l_quantity,
        |         row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rn,
        |         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM src WHERE l_quantity IS NOT NULL
        |)
        |SELECT l_returnflag,
        |       min(l_quantity) AS min_value,
        |       max(l_quantity) AS max_value,
        |       min(CASE WHEN rn >= ceil(0.25 * n) THEN l_quantity END) AS p25,
        |       min(CASE WHEN rn >= ceil(0.5  * n) THEN l_quantity END) AS p50,
        |       min(CASE WHEN rn >= ceil(0.75 * n) THEN l_quantity END) AS p75
        |FROM ranked GROUP BY l_returnflag""".stripMargin,

    "q14_full_outer_align" ->
      """WITH o AS (SELECT strftime(o_orderdate, '%Y-%m-%d') AS date, o_orderstatus FROM orders),
        |a AS (SELECT date, COUNT(*) AS n_open FROM o WHERE o_orderstatus = 'O' GROUP BY date),
        |b AS (SELECT date, COUNT(*) AS n_filled FROM o WHERE o_orderstatus = 'F' GROUP BY date),
        |c AS (SELECT date, COUNT(*) AS n_partial FROM o WHERE o_orderstatus = 'P' GROUP BY date)
        |SELECT COALESCE(a.date, b.date, c.date) AS date, a.n_open, b.n_filled, c.n_partial
        |FROM a FULL JOIN b ON a.date = b.date
        |       FULL JOIN c ON COALESCE(a.date, b.date) = c.date""".stripMargin,

    "q15_semi_latest" ->
      """SELECT l_suppkey, COUNT(*) AS n_items, CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) = (SELECT max(CAST(l_shipdate AS DATE)) FROM lineitem)
        |GROUP BY l_suppkey""".stripMargin,

    "q16_top3_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders
        |) WHERE rn <= 3""".stripMargin,

    "q17_release_delta" ->
      s"""WITH $dailyCte,
         |latest AS (
         |  SELECT l_suppkey, qty FROM daily WHERE date = (SELECT max(date) FROM daily)
         |),
         |prev AS (
         |  SELECT l_suppkey, qty FROM daily
         |  WHERE date = (SELECT CAST(max(date) - INTERVAL 1 DAY AS DATE) FROM daily)
         |)
         |SELECT latest.l_suppkey, latest.qty AS today_qty,
         |       greatest(latest.qty - COALESCE(prev.qty, 0), 0) AS delta
         |FROM latest LEFT JOIN prev ON latest.l_suppkey = prev.l_suppkey""".stripMargin,

    "q18_adjacent_max" ->
      s"""WITH $denseCte,
         |b AS (
         |  SELECT l_suppkey, date, qty,
         |         max(qty) OVER (PARTITION BY l_suppkey) AS grp_max,
         |         (SELECT max(date) FROM dense) AS latest
         |  FROM dense
         |)
         |SELECT l_suppkey, strftime(date, '%Y-%m-%d') AS date,
         |       CASE WHEN date = latest AND qty IS NULL THEN grp_max ELSE qty END AS qty_filled
         |FROM b
         |WHERE (CASE WHEN date = latest AND qty IS NULL THEN grp_max ELSE qty END) IS NOT NULL""".stripMargin,

    "q19_cumsum" ->
      s"""WITH $dailyCte
         |SELECT l_suppkey, strftime(date, '%Y-%m-%d') AS date, qty,
         |       SUM(qty) OVER (PARTITION BY l_suppkey ORDER BY date
         |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_qty
         |FROM daily""".stripMargin,

    "q20_payload_wrap" ->
      s"""WITH $dailyCte
         |SELECT l_suppkey, strftime(date, '%Y-%m-%d') AS date,
         |       '{"value":' || CAST(CAST(qty AS BIGINT) AS VARCHAR) || '}' AS payload
         |FROM daily""".stripMargin,

    "q21_star_join" ->
      """SELECT r_name, CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
        |       round(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,

    "q22_incidence_rate" ->
      s"""WITH $dailyCte
         |SELECT daily.l_suppkey, strftime(daily.date, '%Y-%m-%d') AS date, daily.qty,
         |       round(daily.qty / supplier.s_acctbal * 100000, 1) AS qty_rate
         |FROM daily JOIN supplier ON daily.l_suppkey = supplier.s_suppkey""".stripMargin,

    "q23_binning" ->
      """SELECT CASE WHEN o_totalprice >= 400000 AND o_totalprice < 1000000 THEN 400000.0
        |            WHEN o_totalprice >= 200000 AND o_totalprice < 400000 THEN 200000.0
        |            WHEN o_totalprice >= 100000 AND o_totalprice < 200000 THEN 100000.0
        |            WHEN o_totalprice >= 50000  AND o_totalprice < 100000 THEN 50000.0
        |            WHEN o_totalprice >= 0      AND o_totalprice < 50000  THEN 0.0
        |       END AS band, COUNT(*) AS n_orders
        |FROM orders GROUP BY 1""".stripMargin,

    "q24_string_norm" ->
      """SELECT o_orderkey,
        |       lower(split_part(o_orderpriority, '-', 2)) AS priority_label,
        |       substring(o_orderpriority, 1, 1) AS priority_code
        |FROM orders""".stripMargin,

    "q25_latest_max" ->
      """SELECT o_custkey, strftime(max(o_orderdate), '%Y-%m-%d') AS latest_date,
        |       max(o_totalprice) AS max_price
        |FROM orders GROUP BY o_custkey""".stripMargin,

    "q26_count_per_status" ->
      "SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY o_orderstatus",

    "q27_clamp_ratio" ->
      """SELECT l_orderkey, l_linenumber,
        |       greatest(l_quantity - 30, 0) AS clamped,
        |       round(l_discount * 100, 1) AS discount_pct
        |FROM lineitem""".stripMargin,

    "q28_centered_mean" ->
      s"""WITH $denseZCte
         |SELECT l_suppkey, strftime(date, '%Y-%m-%d') AS date, qty0,
         |       round(avg(qty0) OVER (PARTITION BY l_suppkey ORDER BY date
         |                             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING), 4) AS smoothed
         |FROM densez""".stripMargin,

    "q29_name_repair" ->
      """WITH j AS (
        |  SELECT o_orderkey, o_custkey,
        |         CASE WHEN o_orderkey % 3 = 0 THEN c_name END AS cust_name
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |)
        |SELECT o_orderkey, o_custkey,
        |       max(cust_name) OVER (PARTITION BY o_custkey) AS cust_name
        |FROM j""".stripMargin
  )
}
