package graft

import org.apache.spark.sql.functions._
import graft.operators.{Fill, Reshape, Rolling, Trim}

/** Pandas-semantics unit fixtures for the rolling/fill/trim family
  * (reference `db_etl/processors`). Tiny in-memory frames, exact expectations.
  */
class RollingSpec extends SparkSpec {
  import spark.implicits._

  private def series(vals: Seq[(String, java.lang.Double)]) =
    vals.zipWithIndex.map { case ((d, v), _) => ("A", "X", java.sql.Date.valueOf(d), v) }
      .toDF("areaType", "areaCode", "date", "m")

  test("rollingSum needs 7 non-null observations (pandas min_periods)") {
    val dates = (1 to 10).map(i => f"2021-01-$i%02d")
    val df = series(dates.map(d => d -> java.lang.Double.valueOf(1.0)))
    val rs = Rolling.rollingSum(df, Seq("areaType", "areaCode"), "date", "m", "rs")
      .orderBy("date").select("rs").as[Option[Double]].collect()
    assert(rs.take(6).forall(_.isEmpty))
    assert(rs.drop(6).forall(_.contains(7.0)))
  }

  test("rollingSum nulls inside the frame null the window") {
    val vals: Seq[(String, java.lang.Double)] =
      (1 to 12).map { i =>
        f"2021-01-$i%02d" -> (if (i == 5) null else java.lang.Double.valueOf(i.toDouble))
      }
    val df = series(vals)
    val rs = Rolling.rollingSum(df, Seq("areaType", "areaCode"), "date", "m", "rs")
      .orderBy("date").select("rs").as[Option[Double]].collect()
    // any 7-row frame containing the null (rows 5..11) is null
    assert(rs.take(11).forall(_.isEmpty))
    assert(rs(11).contains((6 to 12).filter(_ != 5).map(_.toDouble).sum + 5 - 5))
  }

  test("percentageChange reference rules: den 0 -> 1; num 0 & den>0 -> -100") {
    val vals = Seq[java.lang.Double](0d, 0d, 0d, 0d, 0d, 0d, 0d, 5d,       // den=0 -> num-1 = 4 -> 400%
      0d, 0d, 0d, 0d, 0d, 0d, 0d)
    val df = series(vals.zipWithIndex.map { case (v, i) => f"2021-01-${i + 1}%02d" -> v })
    val out = Rolling.percentageChange(df, Seq("areaType", "areaCode"), "date", "m", "pct")
      .orderBy("date").select("pct").as[Option[Double]].collect()
    assert(out.take(7).forall(_.isEmpty))       // needs 8 obs
    assert(out(7).contains(400.0))              // (5/1 - 1) * 100
    assert(out(14).contains(-100.0))            // num 0, den (5) > 0
  }

  test("trimEnd keeps date <= max-5 only") {
    val dates = (1 to 10).map(i => f"2021-01-$i%02d")
    val df = series(dates.map(d => d -> java.lang.Double.valueOf(1.0)))
    val out = Trim.trimEnd(df, "date", Seq("m"), 5)
      .orderBy("date").select("m").as[Option[Double]].collect()
    assert(out.take(5).forall(_.contains(1.0)))
    assert(out.drop(5).forall(_.isEmpty))
  }

  test("bounded fills stop strictly before the last non-null date") {
    val vals = Seq[(String, java.lang.Double)](
      "2021-01-01" -> null, "2021-01-02" -> 2d, "2021-01-03" -> null,
      "2021-01-04" -> null, "2021-01-05" -> 5d, "2021-01-06" -> null)
    val df = series(vals)
    val zf = Fill.zeroFillBounded(df, Seq("areaType", "areaCode"), "date", "m")
      .orderBy("date").select("m").as[Option[Double]].collect()
    assert(zf === Seq(None, Some(2d), Some(0d), Some(0d), Some(5d), None))
    val ff = Fill.forwardFillBounded(df, Seq("areaType", "areaCode"), "date", "m")
      .orderBy("date").select("m").as[Option[Double]].collect()
    assert(ff === Seq(None, Some(2d), Some(2d), Some(2d), Some(5d), None))
  }

  test("densifyDates fills the full global range per key") {
    val df = Seq(
      ("A", "X", java.sql.Date.valueOf("2021-01-01"), 1.0),
      ("A", "X", java.sql.Date.valueOf("2021-01-05"), 2.0),
      ("A", "Y", java.sql.Date.valueOf("2021-01-03"), 3.0))
      .toDF("areaType", "areaCode", "date", "m")
    val dense = Reshape.densifyDates(df, Seq("areaType", "areaCode"), "date")
    assert(dense.count() === 10)  // 2 keys x 5 days
    assert(dense.where($"m".isNotNull).count() === 3)
  }

  test("changeBySum suppresses families where substituted rolling sum survives") {
    val dates = (1 to 14).map(i => f"2021-01-$i%02d")
    val df = series(dates.map(d => d -> java.lang.Double.valueOf(0.2)))
    // rolling sum = 1.4 < 3 -> substituted to 2 -> whole family nulled incl. base
    val out = Rolling.changeBySum(df, Seq("areaType", "areaCode"), "date", "m",
      minSumAllowed = Some(3d), minSumSub = 2d)
    val m = out.orderBy("date").select("m").as[Option[Double]].collect()
    assert(m.drop(6).forall(_.isEmpty))
  }
}
