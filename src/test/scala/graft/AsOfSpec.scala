package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsOf

/** As-of backward join: inclusive match, no-prior-row nulls, latest-wins,
  * and payload atomicity (all attached fields from the SAME matched row). */
class AsOfSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("attaches latest right row at-or-before each left row") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2026-01-01 09:00:00"), "early"),   // before any right row
      (1L, ts("2026-01-01 10:00:00"), "equal"),   // equal ts -> inclusive match
      (1L, ts("2026-01-01 11:30:00"), "between"), // picks 11:00, not 10:00
      (2L, ts("2026-01-01 12:00:00"), "otherkey") // keys never cross
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2026-01-01 10:00:00"), 10.0, "a"),
      (1L, ts("2026-01-01 11:00:00"), 11.0, "b"),
      (2L, ts("2026-01-01 01:00:00"), 99.0, "z")
    ).toDF("k", "rt", "v", "label")

    val out = AsOf.asofBackward(left, right, Seq("k"), "t", "rt",
        Seq("v", "label"), matchedTimeCol = "matched_rt")
      .orderBy("k", "t")
      .select("tag", "v", "label", "matched_rt")
      .collect().map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))

    assert(out(0) === (("early", None, None, None)))
    assert(out(1) === (("equal", Some(10.0), Some("a"), Some(ts("2026-01-01 10:00:00")))))
    assert(out(2) === (("between", Some(11.0), Some("b"), Some(ts("2026-01-01 11:00:00")))))
    assert(out(3) === (("otherkey", Some(99.0), Some("z"), Some(ts("2026-01-01 01:00:00")))))
  }

  test("null right values stay atomic with their row") {
    import spark.implicits._
    val left = Seq((1L, ts("2026-01-01 12:00:00"))).toDF("k", "t")
    val right = Seq(
      (1L, ts("2026-01-01 10:00:00"), Option(1.0), Option("old")),
      (1L, ts("2026-01-01 11:00:00"), Option.empty[Double], Option("new"))
    ).toDF("k", "rt", "v", "label")
    // The 11:00 row matches; its null v must NOT fall back to 10:00's 1.0.
    val row = AsOf.asofBackward(left, right, Seq("k"), "t", "rt", Seq("v", "label"))
      .select("v", "label").collect().head
    assert(row.isNullAt(0) && row.getString(1) === "new")
  }

  test("interval join pairs within the gap, via equi-join (no cross product)") {
    import spark.implicits._
    val left = Seq((1L, 10L, ts("2026-01-01 12:00:00"))).toDF("k", "l_id", "t")
    val right = Seq(
      (1L, 20L, ts("2026-01-01 11:45:00")), // in gap
      (1L, 21L, ts("2026-01-01 11:30:00")), // exactly at gap boundary: kept
      (1L, 22L, ts("2026-01-01 11:29:59")), // just outside
      (1L, 23L, ts("2026-01-01 12:00:01"))  // after left: excluded
    ).toDF("k", "r_id", "rt")
    val out = AsOf.intervalJoin(left, right, Seq("k"), "t", "rt", 1800L)
      .select("r_id").as[Long].collect().sorted
    assert(out.toSeq === Seq(20L, 21L))
    val plan = AsOf.intervalJoin(left, right, Seq("k"), "t", "rt", 1800L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"interval join fell back to a cross product:\n$plan")
  }

  test("guards: non-positive gap and colliding value columns fail fast") {
    import spark.implicits._
    val left = Seq((1L, ts("2026-01-01 12:00:00"), 5.0)).toDF("k", "t", "v")
    val right = Seq((1L, ts("2026-01-01 10:00:00"), 1.0)).toDF("k", "rt", "v")
    val gapErr = intercept[IllegalArgumentException] {
      AsOf.intervalJoin(left, right, Seq("k"), "t", "rt", 0L)
    }
    assert(gapErr.getMessage.contains("maxGapSeconds"))
    val collideErr = intercept[IllegalArgumentException] {
      AsOf.asofBackward(left, right, Seq("k"), "t", "rt", Seq("v"))
    }
    assert(collideErr.getMessage.contains("collide"))
  }

  test("single shuffle: plan exchanges once on the join key") {
    import spark.implicits._
    val left = Seq((1L, ts("2026-01-01 12:00:00"))).toDF("k", "t")
    val right = Seq((1L, ts("2026-01-01 10:00:00"), 1.0)).toDF("k", "rt", "v")
    val plan = AsOf.asofBackward(left, right, Seq("k"), "t", "rt", Seq("v"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 1, s"expected at most one hash exchange, got $exchanges:\n$plan")
  }
}
