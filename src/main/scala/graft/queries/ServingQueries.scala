package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.Tables

/** Second wave of serving-layer coverage (SURVEY.md §2.5-2.7 remainder):
  * interpolating quantiles, timestamp boxplots, JSON blob aggregation,
  * composite-key 3-way joins, MSOA periodic sampling, interval filters,
  * global sort-rank materialization, and the nested (demographic) densify.
  */
object ServingQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A9: pandas-quantile (percentile_cont) p10/p40/p50/p60/p90
    // (rate_scales_worker/process.py:95-109)
    "q52_percentile_cont" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem").select(col("l_returnflag"), col("l_quantity"))
      Serving.percentileCont(li, Seq("l_returnflag"), "l_quantity",
        Seq("p10" -> 0.1, "p40" -> 0.4, "p50" -> 0.5, "p60" -> 0.6, "p90" -> 0.9))
    }),

    // A10: release-timestamp boxplot — minutes from midnight p75 per category,
    // flag when the latest event ran later than p75
    // (chunk_etl_postprocessing/timestamp_boxplots/process.py:49-143)
    "q53_ts_boxplot" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("sec", unix_timestamp(col("ts")))
        .withColumn("minute", ((col("sec") % 86400) / 60).cast("long"))
      val wOrd = Window.partitionBy(col("event_type")).orderBy(col("minute"))
      // deterministic latest: floored seconds + event_id tiebreak (µs-level
      // timestamp ties would otherwise pick an arbitrary row)
      val wTs = Window.partitionBy(col("event_type"))
        .orderBy(col("sec").desc, col("event_id").desc)
      // group sizes by aggregate + broadcast join-back (a count-over-window
      // with no frame would buffer each category's whole partition)
      val counts = ev.groupBy(col("event_type")).agg(count(lit(1)).as("__n"))
      ev.join(broadcast(counts), Seq("event_type"))
        .withColumn("__rn", row_number().over(wOrd))
        .withColumn("__latest_minute", first(col("minute")).over(wTs))
        .groupBy("event_type")
        .agg(
          min(when(col("__rn") >= ceil(lit(0.75) * col("__n")), col("minute"))).as("p75_minute"),
          max(col("__latest_minute")).as("latest_minute"))
        .withColumn("late_flag", col("latest_minute") > col("p75_minute"))
    }),

    // A13: JSON cache-blob aggregation with deterministic element order
    // (cache_prepopulate/query.sql:1-13)
    "q54_json_blob" -> ((s, dir) => {
      val daily = Tables.load(s, dir, "orders")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("date"), col("o_custkey"))
        .agg(count(lit(1)).as("n"))
      Serving.jsonAgg(daily, Seq("date"), "o_custkey", Seq("n"), "blob")
    }),

    // J7: 3-way inner join on a composite key
    // (map_vaccinations_geojson/queries.py:14-199)
    "q55_triple_join" -> ((s, dir) => {
      val sup = Tables.load(s, dir, "supplier")
        .groupBy("s_nationkey").agg(count(lit(1)).as("n_suppliers"),
          round(sum("s_acctbal"), 2).as("supplier_balance"))
      val cust = Tables.load(s, dir, "customer")
        .groupBy(col("c_nationkey").as("s_nationkey"))
        .agg(count(lit(1)).as("n_customers"))
      val nat = Tables.load(s, dir, "nation")
        .select(col("n_nationkey").as("s_nationkey"), col("n_name"))
      sup.join(cust, Seq("s_nationkey")).join(broadcast(nat), Seq("s_nationkey"))
        .withColumnRenamed("s_nationkey", "nationkey")
    }),

    // MSOA periodic thinning: every 7th day anchored at latest-5
    // (msoa_etl_db/processor.py:67-93)
    "q56_periodic_sample" -> ((s, dir) => {
      val daily = Tables.supplierDaily(s, dir)
      // anchor from the raw scan: the rollup preserves the max ship date,
      // and aggregating `daily` would re-run its shuffle for one scalar
      val anchor = Tables.load(s, dir, "lineitem")
        .agg(date_sub(max(to_date(col("l_shipdate"))), 5).as("__anchor"))
      daily.crossJoin(broadcast(anchor))
        .where(col("date") <= col("__anchor") &&
          datediff(col("__anchor"), col("date")) % 7 === 0)
        .select(col("l_suppkey"), date_format(col("date"), "yyyy-MM-dd").as("date"), col("qty"))
    }),

    // P2: trailing-interval predicate (WHERE date > max - 6 months)
    // (db_etl_homepage_graphs/queries.py:176)
    "q58_interval_filter" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .withColumn("d", to_date(col("o_orderdate")))
      val cutoff = o.agg(add_months(max(col("d")), -6).as("__cutoff"))
      o.crossJoin(broadcast(cutoff)).where(col("d") > col("__cutoff"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
    }),

    // O1: multi-key mixed-direction output ordering, materialized as a global
    // rank so content (not file order) carries the semantics. The top-1000
    // slice is taken with orderBy+limit — Spark plans that as
    // TakeOrderedAndProject (each partition keeps a local top-k heap, the
    // driver merges k×partitions rows), never a shuffle-everything-to-one
    // global sort. The rank itself needs no window at all: the slice is
    // bounded at 1000 rows, so an explicit single partition sorted in place
    // numbers rows with monotonically_increasing_id (sequential from 0
    // within one partition). The full table never funnels anywhere
    // (PlanSpec asserts TakeOrderedAndProject and zero unpartitioned
    // WindowExec across all declared queries).
    "q59_sort_rank" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val ord = Seq(col("o_orderstatus").asc, col("o_custkey").desc,
        col("o_orderdate").desc, col("o_orderkey").asc)
      o.orderBy(ord: _*).limit(1000)
        .coalesce(1).sortWithinPartitions(ord: _*)
        .withColumn("global_rank", monotonically_increasing_id() + 1)
        .select(col("global_rank").cast("long").as("global_rank"),
          col("o_orderkey"), col("o_orderstatus"),
          col("o_custkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("date"))
    }),

    // R5: MSOA tail zero-pad (msoa_etl_db/processor.py:146-171)
    "q65_zero_pad" -> ((s, dir) =>
      Reshape.zeroPadTail(Tables.supplierDaily(s, dir), Seq("l_suppkey"), "date", "qty")
        .withColumn("date", date_format(col("date"), "yyyy-MM-dd"))),

    // P10: value-list override (nation override, uploader.py:569-571)
    "q66_area_override" -> ((s, dir) =>
      Trim.overrideWhereIn(
        Tables.load(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"),
            col("c_mktsegment").as("segment_group")),
        "c_mktsegment", Seq("BUILDING", "MACHINERY"), "segment_group", "industrial")),

    // J3 + JSON emit: GeoJSON feature projection (map_geojson/queries.py:14-38
    // shape — geometry from a joined dim, properties from the aggregate)
    "q69_geojson" -> ((s, dir) => {
      val latest = Tables.load(s, dir, "orders")
        .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
      val geo = Tables.load(s, dir, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_nationkey"))
      latest.join(broadcast(geo), Seq("o_custkey"))
        .select(col("o_custkey"),
          to_json(struct(
            lit("Feature").as("type"),
            struct(lit("Point").as("type"),
              array(col("c_nationkey").cast("long"), col("o_custkey")).as("coordinates"))
              .as("geometry"),
            struct(col("o_custkey").as("id"), col("n_orders")).as("properties")))
            .as("feature"))
    }),

    // Exact distinct counts (the serving layer's cardinality queries)
    "q70_distinct_exact" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_suppkey")).as("n_suppliers"),
          countDistinct(col("l_partkey")).as("n_parts"))),

    // HLL approximate distinct — tolerance-banded oracle (estimates are
    // engine-specific; check.py requires each within 5% of the exact
    // count); the scale path for 100 TB cardinalities.
    "q71_approx_distinct" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))),

    // Greenwald-Khanna quantile sketch (Spark's built-in percentile_approx):
    // the bounded-memory mergeable path for percentiles over 100 TB —
    // completing the sketch family (cardinality: HLL/linear counting,
    // frequency: Misra-Gries, quantiles: GK). check.py verifies each
    // returned value's true rank sits within the sketch's rank-error bound
    // of its target quantile.
    "q105_approx_quantiles" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(percentile_approx(col("l_extendedprice"),
          array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)).as("qs"))
        .select(col("l_returnflag"),
          col("qs").getItem(0).as("p25"),
          col("qs").getItem(1).as("p50"),
          col("qs").getItem(2).as("p75"))),

    // R4: nested densify — (key × category × date) spine, left-join data
    // (homogenisation.py:81-130)
    "q60_densify_nested" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .where(year(col("l_shipdate")) === 1995)
        .select(col("l_suppkey"), col("l_returnflag"),
          to_date(col("l_shipdate")).as("date"), col("l_quantity"))
        .groupBy("l_suppkey", "l_returnflag", "date")
        .agg(sum("l_quantity").cast("double").as("qty"))
      Reshape.densifyNested(li, Seq("l_suppkey"), "date", "l_returnflag")
        .withColumn("date", date_format(col("date"), "yyyy-MM-dd"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q52_percentile_cont" ->
      """WITH ranked AS (
        |  SELECT l_returnflag, l_quantity,
        |         row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rn,
        |         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem WHERE l_quantity IS NOT NULL
        |)
        |SELECT l_returnflag,
        |  max(CASE WHEN rn = floor(0.1*(n-1)+1) THEN l_quantity END)
        |    + (max(CASE WHEN rn = ceil(0.1*(n-1)+1) THEN l_quantity END)
        |       - max(CASE WHEN rn = floor(0.1*(n-1)+1) THEN l_quantity END))
        |      * max(0.1*(n-1)+1 - floor(0.1*(n-1)+1)) AS p10,
        |  max(CASE WHEN rn = floor(0.4*(n-1)+1) THEN l_quantity END)
        |    + (max(CASE WHEN rn = ceil(0.4*(n-1)+1) THEN l_quantity END)
        |       - max(CASE WHEN rn = floor(0.4*(n-1)+1) THEN l_quantity END))
        |      * max(0.4*(n-1)+1 - floor(0.4*(n-1)+1)) AS p40,
        |  max(CASE WHEN rn = floor(0.5*(n-1)+1) THEN l_quantity END)
        |    + (max(CASE WHEN rn = ceil(0.5*(n-1)+1) THEN l_quantity END)
        |       - max(CASE WHEN rn = floor(0.5*(n-1)+1) THEN l_quantity END))
        |      * max(0.5*(n-1)+1 - floor(0.5*(n-1)+1)) AS p50,
        |  max(CASE WHEN rn = floor(0.6*(n-1)+1) THEN l_quantity END)
        |    + (max(CASE WHEN rn = ceil(0.6*(n-1)+1) THEN l_quantity END)
        |       - max(CASE WHEN rn = floor(0.6*(n-1)+1) THEN l_quantity END))
        |      * max(0.6*(n-1)+1 - floor(0.6*(n-1)+1)) AS p60,
        |  max(CASE WHEN rn = floor(0.9*(n-1)+1) THEN l_quantity END)
        |    + (max(CASE WHEN rn = ceil(0.9*(n-1)+1) THEN l_quantity END)
        |       - max(CASE WHEN rn = floor(0.9*(n-1)+1) THEN l_quantity END))
        |      * max(0.9*(n-1)+1 - floor(0.9*(n-1)+1)) AS p90
        |FROM ranked GROUP BY l_returnflag""".stripMargin,

    "q53_ts_boxplot" ->
      """WITH ev AS (
        |  SELECT event_type, ts, event_id,
        |         CAST((CAST(floor(epoch(ts)) AS BIGINT) % 86400) // 60 AS BIGINT) AS minute
        |  FROM events
        |),
        |ranked AS (
        |  SELECT event_type, minute,
        |         row_number() OVER (PARTITION BY event_type ORDER BY minute) AS rn,
        |         COUNT(*) OVER (PARTITION BY event_type) AS n,
        |         first_value(minute) OVER (PARTITION BY event_type
        |           ORDER BY CAST(floor(epoch(ts)) AS BIGINT) DESC, event_id DESC) AS latest_minute
        |  FROM ev
        |),
        |agg AS (
        |  SELECT event_type,
        |         min(CASE WHEN rn >= ceil(0.75 * n) THEN minute END) AS p75_minute,
        |         max(latest_minute) AS latest_minute
        |  FROM ranked GROUP BY event_type
        |)
        |SELECT event_type, p75_minute, latest_minute,
        |       latest_minute > p75_minute AS late_flag
        |FROM agg""".stripMargin,

    "q54_json_blob" ->
      """WITH daily AS (
        |  SELECT strftime(o_orderdate, '%Y-%m-%d') AS date, o_custkey, COUNT(*) AS n
        |  FROM orders GROUP BY 1, 2
        |)
        |SELECT date,
        |       '[' || string_agg('{"o_custkey":' || o_custkey || ',"n":' || n || '}',
        |                         ',' ORDER BY o_custkey) || ']' AS blob
        |FROM daily GROUP BY date""".stripMargin,

    "q55_triple_join" ->
      """WITH sup AS (
        |  SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers,
        |         round(SUM(s_acctbal), 2) AS supplier_balance
        |  FROM supplier GROUP BY 1
        |),
        |cust AS (
        |  SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
        |  FROM customer GROUP BY 1
        |)
        |SELECT sup.nationkey, n_suppliers, supplier_balance, n_customers, n_name
        |FROM sup JOIN cust ON sup.nationkey = cust.nationkey
        |         JOIN nation ON sup.nationkey = n_nationkey""".stripMargin,

    "q56_periodic_sample" ->
      """WITH daily AS (
        |  SELECT l_suppkey, CAST(l_shipdate AS DATE) AS date,
        |         CAST(SUM(l_quantity) AS DOUBLE) AS qty
        |  FROM lineitem GROUP BY 1, 2
        |),
        |anchor AS (SELECT CAST(max(date) - INTERVAL 5 DAY AS DATE) AS a FROM daily)
        |SELECT l_suppkey, strftime(date, '%Y-%m-%d') AS date, qty
        |FROM daily, anchor
        |WHERE date <= a AND datediff('day', date, a) % 7 = 0""".stripMargin,

    "q58_interval_filter" ->
      """WITH o AS (SELECT *, CAST(o_orderdate AS DATE) AS d FROM orders),
        |cutoff AS (SELECT CAST(max(d) - INTERVAL 6 MONTH AS DATE) AS c FROM o)
        |SELECT o_orderstatus, COUNT(*) AS n, round(SUM(o_totalprice), 2) AS total
        |FROM o, cutoff WHERE d > c GROUP BY o_orderstatus""".stripMargin,

    "q59_sort_rank" ->
      """SELECT global_rank, o_orderkey, o_orderstatus, o_custkey, date FROM (
        |  SELECT o_orderkey, o_orderstatus, o_custkey,
        |         strftime(o_orderdate, '%Y-%m-%d') AS date,
        |         row_number() OVER (ORDER BY o_orderstatus ASC, o_custkey DESC,
        |                            o_orderdate DESC, o_orderkey ASC) AS global_rank
        |  FROM orders
        |) WHERE global_rank <= 1000""".stripMargin,

    "q69_geojson" ->
      """SELECT o_custkey,
        |       '{"type":"Feature","geometry":{"type":"Point","coordinates":['
        |       || CAST(c_nationkey AS BIGINT) || ',' || o_custkey
        |       || ']},"properties":{"id":' || o_custkey || ',"n_orders":' || n_orders
        |       || '}}' AS feature
        |FROM (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY 1) a
        |JOIN customer ON o_custkey = c_custkey""".stripMargin,

    "q70_distinct_exact" ->
      """SELECT l_returnflag,
        |       COUNT(DISTINCT l_suppkey) AS n_suppliers,
        |       COUNT(DISTINCT l_partkey) AS n_parts
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q65_zero_pad" ->
      """WITH daily AS (
        |  SELECT l_suppkey, CAST(l_shipdate AS DATE) AS date,
        |         CAST(SUM(l_quantity) AS DOUBLE) AS qty
        |  FROM lineitem GROUP BY 1, 2
        |),
        |g AS (SELECT max(date) AS gmax FROM daily),
        |km AS (SELECT l_suppkey, max(date) AS kmax FROM daily GROUP BY 1)
        |SELECT l_suppkey, strftime(date, '%Y-%m-%d') AS date, qty FROM daily
        |UNION ALL
        |SELECT km.l_suppkey,
        |       strftime(CAST(unnest(generate_series(
        |         CAST(kmax + INTERVAL 1 DAY AS TIMESTAMP),
        |         CAST(gmax AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE), '%Y-%m-%d'),
        |       CAST(0 AS DOUBLE)
        |FROM km, g WHERE kmax < gmax""".stripMargin,

    "q66_area_override" ->
      """SELECT c_custkey, c_mktsegment,
        |       CASE WHEN c_mktsegment IN ('BUILDING', 'MACHINERY')
        |            THEN 'industrial' ELSE c_mktsegment END AS segment_group
        |FROM customer""".stripMargin,

    "q60_densify_nested" ->
      """WITH li AS (
        |  SELECT l_suppkey, l_returnflag, CAST(l_shipdate AS DATE) AS date,
        |         CAST(SUM(l_quantity) AS DOUBLE) AS qty
        |  FROM lineitem WHERE year(l_shipdate) = 1995
        |  GROUP BY 1, 2, 3
        |),
        |bounds AS (SELECT min(date) AS lo, max(date) AS hi FROM li),
        |dates AS (
        |  SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS date
        |  FROM bounds
        |),
        |spine AS (
        |  SELECT k.l_suppkey, d.date, f.l_returnflag
        |  FROM (SELECT DISTINCT l_suppkey FROM li) k
        |  CROSS JOIN dates d
        |  CROSS JOIN (SELECT DISTINCT l_returnflag FROM li) f
        |)
        |SELECT s.l_suppkey, strftime(s.date, '%Y-%m-%d') AS date, s.l_returnflag, li.qty
        |FROM spine s LEFT JOIN li
        |  ON li.l_suppkey = s.l_suppkey AND li.date = s.date AND li.l_returnflag = s.l_returnflag""".stripMargin
  )
}
