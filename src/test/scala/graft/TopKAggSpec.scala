package graft

import org.apache.spark.sql.functions._

import graft.functions.{ScoredCand, TopKAgg, TopKAggregator}

/** Bounded top-k aggregate: ranking rules, buffer trimming, partition-merge
  * associativity, and the partial-aggregation plan shape it exists for. */
class TopKAggSpec extends SparkSpec {

  test("ranks by score desc then id asc, trims to k") {
    val agg = new TopKAggregator(2)
    val all = (1L to 100L).map(i => ScoredCand(score = (i % 10).toDouble, id = i))
    val reduced = all.foldLeft(agg.zero)(agg.reduce)
    assert(reduced.items.length <= 4, "buffer must stay bounded at 2k")
    assert(agg.finish(reduced).items === Seq(ScoredCand(9.0, 9L), ScoredCand(9.0, 19L)))
  }

  test("merge of partial buffers equals single-pass result") {
    val agg = new TopKAggregator(3)
    val xs = Seq(5.0 -> 1L, 3.0 -> 2L, 5.0 -> 3L, 9.0 -> 4L, 1.0 -> 5L,
      9.0 -> 6L, 2.0 -> 7L).map { case (s, i) => ScoredCand(s, i) }
    val (l, r) = xs.splitAt(3)
    val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    assert(agg.finish(merged) === agg.finish(xs.foldLeft(agg.zero)(agg.reduce)))
    assert(agg.finish(merged).items.map(_.id) === Seq(4L, 6L, 1L))
  }

  test("runs as a partial aggregate over many partitions") {
    import spark.implicits._
    val df = spark.sparkContext.parallelize(1 to 1000, 8)
      .toDF("id").select(lit("g").as("grp"), (col("id") % 97).cast("double").as("score"),
        col("id").cast("long").as("id"))
    val out = df.groupBy("grp").agg(TopKAgg.topK(5)(col("score"), col("id")).as("tk"))
      .select(explode(col("tk.items")).as("c"))
      .select(col("c.score"), col("c.id")).as[(Double, Long)].collect()
    assert(out.toSeq === Seq((96.0, 96L), (96.0, 193L), (96.0, 290L), (96.0, 387L), (96.0, 484L)))
    // The aggregate must run map-side (partial) before the exchange — that is
    // the whole point of using an Aggregator instead of a ranking window.
    val plan = df.groupBy("grp").agg(TopKAgg.topK(5)(col("score"), col("id")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_topkaggregator") || plan.contains("partial_TopKAggregator")
      || plan.toLowerCase.contains("partial"), s"no partial aggregation in plan:\n$plan")
  }
}
