package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.Tables

/** Event-stream-shaped queries on the `events` table: windowed aggregation,
  * gap sessionization (the batch equivalents of the Structured Streaming
  * front-end in `graft.streaming`), and JSON payload extraction — the
  * reference's `payload ->> 'value'` family (SURVEY.md §2.8 JSON).
  */
object EventQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Tumbling 5-minute window aggregation (streaming analogue; SURVEY §2.10)
    "q30_window_agg" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("bucket", (floor(unix_timestamp(col("ts")) / 300) * 300).cast("long"))
        .groupBy("bucket", "event_type")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))),

    // Gap-based sessionization: 30-min inactivity closes a session
    // (batch analogue of flatMapGroupsWithState; gap compared on floored
    // epoch seconds so both engines agree at sub-second precision)
    "q31_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      Tables.events(s, dir)
        .withColumn("sec", unix_timestamp(col("ts")))
        .withColumn("new_sess",
          when(col("sec") - lag(col("sec"), 1).over(w) > 1800 ||
               lag(col("sec"), 1).over(w).isNull, 1L).otherwise(0L))
        .withColumn("session_id", sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"), min(col("sec")).as("session_start"),
          round(sum("value"), 2).as("session_value"))
    }),

    // Sliding 10-minute windows every 5 minutes (overlapping-window analog of
    // window(ts, "10 minutes", "5 minutes")): each event lands in 2 buckets
    "q74_sliding_window" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("sec", unix_timestamp(col("ts")))
        .withColumn("win_start",
          explode(array((floor(col("sec") / 300) * 300 - 300).cast("long"),
            (floor(col("sec") / 300) * 300).cast("long"))))
        .where(col("sec") >= col("win_start") && col("sec") < col("win_start") + 600)
        .groupBy("win_start", "event_type")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))),

    // JSON payload extraction (reference `payload -> 'value'` everywhere)
    "q32_json_extract" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"))),

    // Bounded interval join (AsOf.intervalJoin): every (purchase, click)
    // pair of the same user with the click in the preceding 30 minutes —
    // bucketized equi-join, never a per-key cross product.
    "q83_interval_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("user_id"), col("ts").as("c_ts"))
      AsOf.intervalJoin(purchases, clicks, Seq("user_id"), "p_ts", "c_ts", 1800L)
        .select(col("p_id"), col("c_id"), col("user_id"),
          unix_timestamp(col("p_ts")).as("p_sec"), unix_timestamp(col("c_ts")).as("c_sec"))
    }),

    // As-of join (AsOf.asofBackward): each purchase picks up the user's
    // latest view at-or-before it — oracled by DuckDB's native ASOF JOIN.
    "q78_asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          round(col("value"), 2).as("purchase_value"))
      val views = ev.where(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts"))
        .agg(round(max("value"), 2).as("view_value"))
      AsOf.asofBackward(purchases, views, Seq("user_id"), "ts", "ts",
          Seq("view_value"), matchedTimeCol = "view_ts")
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("sec"), col("purchase_value"),
          col("view_value"), unix_timestamp(col("view_ts")).as("view_sec"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q30_window_agg" ->
      """SELECT CAST(floor(floor(epoch(ts)) / 300) * 300 AS BIGINT) AS bucket, event_type,
        |       COUNT(*) AS n, round(SUM(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q31_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, value, CAST(floor(epoch(ts)) AS BIGINT) AS sec, ts
        |  FROM events
        |),
        |flagged AS (
        |  SELECT user_id, value, sec, ts,
        |         CASE WHEN sec - lag(sec) OVER w > 1800 OR lag(sec) OVER w IS NULL
        |              THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |),
        |sess AS (
        |  SELECT user_id, value, sec,
        |         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged
        |)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |       min(sec) AS session_start, round(SUM(value), 2) AS session_value
        |FROM sess GROUP BY user_id, session_id""".stripMargin,

    "q74_sliding_window" ->
      """WITH e AS (
        |  SELECT event_type, value, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
        |         CAST(floor(floor(epoch(ts)) / 300) * 300 AS BIGINT) AS b
        |  FROM events
        |),
        |exploded AS (
        |  SELECT event_type, value, sec, unnest([b - 300, b]) AS win_start FROM e
        |)
        |SELECT win_start, event_type, COUNT(*) AS n, round(SUM(value), 2) AS sum_value
        |FROM exploded
        |WHERE sec >= win_start AND sec < win_start + 600
        |GROUP BY 1, 2""".stripMargin,

    "q32_json_extract" ->
      """SELECT event_type, COUNT(*) AS n,
        |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY event_type""".stripMargin,

    "q83_interval_join" ->
      """WITH p AS (
        |  SELECT event_id AS p_id, user_id, ts AS p_ts,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS p_sec
        |  FROM events WHERE event_type = 'purchase'
        |),
        |c AS (
        |  SELECT event_id AS c_id, user_id, ts AS c_ts,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS c_sec
        |  FROM events WHERE event_type = 'click'
        |)
        |SELECT p_id, c_id, user_id, p_sec, c_sec
        |FROM p JOIN c USING (user_id)
        |WHERE p_sec - c_sec >= 0 AND p_sec - c_sec <= 1800""".stripMargin,

    "q78_asof_join" ->
      """WITH p AS (
        |  SELECT event_id, user_id, ts, round(value, 2) AS purchase_value
        |  FROM events WHERE event_type = 'purchase'
        |),
        |v AS (
        |  SELECT user_id, ts, round(max(value), 2) AS view_value
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2
        |)
        |SELECT p.event_id, p.user_id, CAST(floor(epoch(p.ts)) AS BIGINT) AS sec,
        |       p.purchase_value, v.view_value,
        |       CAST(floor(epoch(v.ts)) AS BIGINT) AS view_sec
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts""".stripMargin
  )
}
