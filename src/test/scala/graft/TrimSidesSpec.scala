package graft

import org.apache.spark.sql.functions._
import graft.operators.Trim

/** trim_sides fixtures mirroring the reference behavior
  * (`db_etl_upload/uploader.py:55-90`, golden test `tests/test_uploader.py`):
  * head trim drops through first-nonzero-position + 1, tail trim drops from
  * last-valid-position - 1, `variants` is exempt entirely. */
class TrimSidesSpec extends SparkSpec {
  import spark.implicits._

  private def frame(metric: String, vals: Seq[java.lang.Double]) =
    vals.zipWithIndex.map { case (v, i) =>
      (1L, java.sql.Date.valueOf(f"2021-01-${i + 1}%02d"), metric, v)
    }.toDF("k", "date", "metric", "payload")

  private def surviving(metric: String, vals: Seq[java.lang.Double]): Seq[Int] =
    Trim.trimSides(frame(metric, vals), Seq("k"), "date")
      .select(dayofmonth($"date")).as[Int].collect().sorted.toSeq

  test("leading zeros trimmed one past first non-zero; tail trimmed one before last valid") {
    // positions:        1  2  3  4  5  6  7  8
    val vals = Seq[java.lang.Double](0d, 0d, 3d, 4d, 5d, 6d, 7d, 8d)
    // f = 3 (first cum>0), head drops p <= 4; l = 8, tail drops p >= 7 -> keep 5, 6
    assert(surviving("m", vals) === Seq(5, 6))
  }

  test("variants metrics are never trimmed") {
    val vals = Seq[java.lang.Double](0d, 0d, 3d, 4d, 5d, 6d, 7d, 8d)
    assert(surviving("variants", vals) === (1 to 8))
  }

  test("all-null payload left untouched") {
    val vals = Seq[java.lang.Double](null, null, null, null)
    assert(surviving("m", vals) === Seq(1, 2, 3, 4))
  }

  test("interior nulls survive inside the kept range") {
    // positions:        1  2  3     4  5  6  7  8  9
    val vals = Seq[java.lang.Double](0d, 2d, null, 4d, null, 6d, 7d, 8d, 9d)
    // cum>0 first at p=2 -> drop p<=3; last valid p=9 -> drop p>=8 -> keep 4..7 (incl null p=5)
    assert(surviving("m", vals) === Seq(4, 5, 6, 7))
  }

  test("nothing survives head trim -> untouched") {
    val vals = Seq[java.lang.Double](0d, 0d, 1d)
    // f = 3, head would drop p <= 4 i.e. everything; reference `continue`s
    assert(surviving("m", vals) === Seq(1, 2, 3))
  }
}
