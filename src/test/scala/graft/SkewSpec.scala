package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin matches the plain join row-for-row") {
    // 90% of rows share one hot key
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong else 7L, i))
      .toDF("k", "v")
    val small = Seq((7L, "hot"), (10L, "a"), (20L, "b")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "v", "name")
      .collect().map(_.toString).sorted
    val salted = Skew.saltedJoin(big, small, Seq("k"), factor = 8, saltOn = Seq("v"))
      .select("k", "v", "name").collect().map(_.toString).sorted
    assert(salted === plain)
  }

  test("saltedCollect equals direct sorted collect") {
    val df = (1 to 500).map(i => ("hot", i)).toDF("k", "v")
    val direct = df.groupBy("k").agg(sort_array(collect_list($"v")).as("vs"))
      .select("vs").as[Seq[Int]].collect()(0)
    val salted = Skew.saltedCollect(df, Seq("k"), "v", factor = 8, out = "vs")
      .select("vs").as[Seq[Int]].collect()(0)
    assert(salted === direct)
  }
}
