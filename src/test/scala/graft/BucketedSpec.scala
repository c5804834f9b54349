package graft

import org.apache.spark.sql.functions._

import graft.sources.Bucketed

/** The bucketing contract: same-key same-count bucketed tables join with no
  * exchange (the shuffle was paid once at write time), and bucket pruning
  * applies to point lookups. */
class BucketedSpec extends SparkSpec {

  test("co-located join of same-bucketed tables plans zero exchange") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
    val or = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
    Bucketed.writeTable(li, "b_lineitem", 4, Seq("l_orderkey"), Seq("l_orderkey"))
    Bucketed.writeTable(or, "b_orders", 4, Seq("l_orderkey"), Seq("l_orderkey"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle-or-not decision to matter (no broadcast escape)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), "l_orderkey")
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p.take(1500))
      assert(!p.contains("Exchange"), p.take(1500))
      // and the join is still correct
      val expected = li.join(or, "l_orderkey").count()
      assert(joined.count() === expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("aggregation on the bucket key reuses the write-time distribution") {
    // self-contained: (re)write the table so this test runs in isolation
    Bucketed.writeTable(
      spark.read.parquet(s"$sf/lineitem.parquet")
        .select(col("l_orderkey"), col("l_quantity")),
      "b_lineitem_agg", 4, Seq("l_orderkey"), Seq("l_orderkey"))
    val agg = spark.table("b_lineitem_agg")
      .groupBy("l_orderkey").agg(sum("l_quantity"))
    val p = agg.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p.take(1500))
  }
}
