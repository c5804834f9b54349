package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Lloyd's k-means invariants: separable clusters are recovered, the result
  * is bit-identical under any partitioning (the integer-accumulation
  * guarantee), and degenerate inputs fail loudly or degrade safely. */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  // three well-separated 4-d clusters around (10,0,0,0), (0,10,0,0),
  // (0,0,10,0); ids interleave the groups so the deterministic init (the k
  // smallest ids) starts with one centroid in each cluster — Lloyd's from a
  // degenerate all-in-one-cluster init can legitimately converge to a split
  // cluster, which would test the seeding policy, not the iteration
  private def separable = {
    val pts = for {
      g <- 0 until 3
      i <- 0 until 10
    } yield {
      val base = Array.fill(4)(0f)
      base(g) = 10f
      base(3) = i.toFloat * 0.1f
      (i * 3 + g.toLong, base.toSeq, g)
    }
    pts.toDF("id", "emb", "truth")
  }

  test("recovers separable clusters: every point lands with its own group") {
    val out = Similarity.kMeans(separable, "id", "emb", k = 3, iters = 4)
      .join(separable.select("id", "truth"), "id")
    // all members of a truth group share one cluster, and clusters are distinct
    val m = out.groupBy("truth").agg(countDistinct("cluster").as("n")).collect()
    assert(m.forall(_.getAs[Long]("n") == 1L))
    assert(out.select("cluster").distinct().count() === 3)
  }

  test("assignment is identical under any partitioning") {
    val a = Similarity.kMeans(separable, "id", "emb", k = 3, iters = 4)
      .orderBy("id").collect().toSeq
    val b = Similarity.kMeans(separable.repartition(7), "id", "emb",
      k = 3, iters = 4).orderBy("id").collect().toSeq
    assert(a === b)
  }

  test("k exceeding distinct points leaves empty clusters without error") {
    val tiny = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f))).toDF("id", "emb")
    val out = Similarity.kMeans(tiny, "id", "emb", k = 2, iters = 2)
    assert(out.count() === 2)
    // k collapses to the available rows when the frame is smaller than k
    val one = Similarity.kMeans(tiny.limit(1), "id", "emb", k = 2, iters = 2)
    assert(one.select("cluster").distinct().count() === 1)
  }

  test("large k plans in bounded time (assign fold stays linear in k)") {
    // A reduce(when(...)) fold duplicates the accumulator subtree per step,
    // so at k = 32 the assign expression would have ~2^32 nodes and planning
    // would hang; the aggregate-HOF fold keeps it linear. A generous wall
    // bound catches any reintroduction without being load-sensitive.
    val pts = (0 until 64).map(i => (i.toLong, Seq.tabulate(4)(d => (i * 4 + d).toFloat)))
      .toDF("id", "emb")
    val t0 = System.nanoTime()
    val out = Similarity.kMeans(pts, "id", "emb", k = 32, iters = 2)
    assert(out.count() === 64)
    assert((System.nanoTime() - t0) / 1e9 < 60.0)
  }

  test("invalid parameters fail fast") {
    val tiny = Seq((1L, Seq(1f, 0f))).toDF("id", "emb")
    intercept[IllegalArgumentException](
      Similarity.kMeans(tiny, "id", "emb", k = 0, iters = 1))
    intercept[IllegalArgumentException](
      Similarity.kMeans(tiny, "id", "emb", k = 1, iters = 0))
  }
}
