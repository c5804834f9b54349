package graft

import org.apache.spark.sql.functions._

import graft.functions.{FreqSketch, MGBuf, MisraGriesAggregator}

/** Misra-Gries sketch invariants: bounded size, the frequent-item guarantee
  * (every token above N/(k+1) survives), lower-bound estimates within the
  * error bound, and merge safety under real partial aggregation. */
class FreqSketchSpec extends SparkSpec {
  import spark.implicits._

  test("reduce keeps at most k counters and underestimates by at most N/(k+1)") {
    val agg = new MisraGriesAggregator(4)
    // 40×hot + 60 distinct singletons: N=100, bound N/5 = 20
    val stream = Seq.fill(40)("hot") ++ (1 to 60).map(i => s"rare$i")
    val buf = stream.foldLeft(agg.zero)(agg.reduce)
    assert(buf.counts.size <= 4)
    val res = agg.finish(buf)
    assert(res.tokens.contains("hot"))
    val est = res.estimates(res.tokens.indexOf("hot"))
    assert(est <= 40 && 40 - est <= 100 / 5, s"estimate $est out of bound")
  }

  test("merge sums counters then trims to k with the (k+1)-th largest") {
    val agg = new MisraGriesAggregator(2)
    val merged = agg.merge(
      MGBuf(Map("a" -> 10L, "b" -> 4L)),
      MGBuf(Map("a" -> 5L, "c" -> 3L)))
    // combined: a=15 b=4 c=3 → subtract 3rd largest (3) → a=12 b=1
    assert(merged.counts === Map("a" -> 12L, "b" -> 1L))
  }

  test("frequent items survive distributed partial aggregation") {
    // 32 partitions force real reduce-side merges. hot1/hot2 are each far
    // above N/(k+1) with k=8; the candidate set must contain both.
    val n = 2000
    val toks = (1 to n).map { i =>
      if (i % 3 == 0) "hot1" else if (i % 5 == 0) "hot2" else s"noise${i % 400}"
    }
    val res = toks.toDF("token").repartition(32)
      .agg(FreqSketch.misraGries(8)(col("token")).as("mg"))
      .select(col("mg.tokens"))
      .as[Seq[String]].head()
    assert(res.contains("hot1") && res.contains("hot2"))
    assert(res.size <= 8)
  }
}
