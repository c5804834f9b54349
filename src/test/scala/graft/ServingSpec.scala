package graft

import org.apache.spark.sql.functions._
import graft.operators.{Reshape, Serving}

class ServingSpec extends SparkSpec {
  import spark.implicits._

  test("percentileDisc matches PostgreSQL percentile_disc semantics") {
    // sorted: 1..10; percentile_disc(p) = value at 1-based index ceil(p*n)
    val df = (1 to 10).map(i => ("g", i.toDouble)).toDF("g", "v")
    val out = Serving.percentileDisc(df, Seq("g"), "v",
      Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75)).collect()(0)
    assert(out.getAs[Double]("min_value") === 1d)
    assert(out.getAs[Double]("p25") === 3d)   // ceil(2.5) = 3
    assert(out.getAs[Double]("p50") === 5d)   // ceil(5) = 5
    assert(out.getAs[Double]("p75") === 8d)   // ceil(7.5) = 8
    assert(out.getAs[Double]("max_value") === 10d)
  }

  test("releaseDelta clamps negative differences to zero") {
    val today = Seq(("a", 10d), ("b", 3d), ("c", 7d)).toDF("k", "v")
    val yesterday = Seq(("a", 4d), ("b", 9d)).toDF("k", "v")
    val out = Serving.releaseDelta(today, yesterday, Seq("k"), "v", "delta")
      .orderBy("k").select("delta").as[Double].collect()
    assert(out === Seq(6d, 0d, 7d))  // b: 3-9 -> clamped; c: no prev -> 7-0
  }

  test("nest orders array elements by the sort column") {
    val df = Seq(("x", "2021-01-03", 3d), ("x", "2021-01-01", 1d), ("x", "2021-01-02", 2d))
      .toDF("k", "d", "v")
    val arr = Reshape.nest(df, Seq("k"), "d", Seq("v"), "series")
      .select("series").collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(arr.map(_.getDouble(1)) === Seq(1d, 2d, 3d))
  }

  test("bin assigns half-open buckets and nulls outside range") {
    val df = Seq(-1d, 0d, 9.99, 10d, 49d, 1000d).toDF("v")
      .withColumn("band", Serving.bin($"v", Seq(0d, 10d, 50d, 100d)))
    val bands = df.select("band").as[Option[Double]].collect()
    assert(bands === Seq(None, Some(0d), Some(0d), Some(10d), Some(10d), None))
  }

  test("jsonAgg emits deterministic sorted JSON arrays") {
    val df = Seq(("d1", "b", 2L), ("d1", "a", 1L)).toDF("k", "code", "v")
    val out = Serving.jsonAgg(df, Seq("k"), "code", Seq("v"), "blob")
      .select("blob").as[String].collect()(0)
    assert(out === """[{"code":"a","v":1},{"code":"b","v":2}]""")
  }

  test("zeroPadTail appends zeros only for keys behind the global max date") {
    val df = Seq(
      ("a", java.sql.Date.valueOf("2021-01-05"), 1.0),
      ("b", java.sql.Date.valueOf("2021-01-03"), 2.0))
      .toDF("k", "date", "m")
    val out = Reshape.zeroPadTail(df, Seq("k"), "date", "m")
    assert(out.count() === 4)  // b gets 01-04 and 01-05 as zeros
    val bRows = out.where($"k" === "b" && $"m" === 0.0).count()
    assert(bRows === 2)
  }

  test("HLL estimate stays within tolerance of the exact distinct count") {
    // q71's approx_count_distinct output is engine-internal (no oracle);
    // bound its error against the exact count instead: rsd=0.02 should land
    // well inside 5% on this fixture (deterministic for fixed data).
    import org.apache.spark.sql.functions._
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val both = li.groupBy("l_returnflag").agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx"))
    both.collect().foreach { r =>
      val (exact, approx) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      val rel = math.abs(approx - exact) / exact
      assert(rel < 0.05, s"flag ${r.getString(0)}: exact=$exact approx=$approx rel=$rel")
    }
  }
}
