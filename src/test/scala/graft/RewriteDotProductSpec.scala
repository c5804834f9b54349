package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** RewriteDotProduct: the HOF dot idiom must optimize into the native
  * expression (recovering whole-stage codegen), agree numerically, and leave
  * non-matching aggregates alone. */
class RewriteDotProductSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("the HOF idiom is rewritten to graft_dot and stays in codegen") {
    val q = emb.select(Similarity.dotHof($"embedding", $"embedding").as("d"))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_dot"), optimized)
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("*(1) Project [graft_dot"), physical)
  }

  test("rewritten and native forms agree on real embeddings") {
    val a = emb.select($"vec_id", Similarity.dotHof($"embedding", $"embedding").as("d"))
    val b = emb.select($"vec_id", Similarity.dot($"embedding", $"embedding").as("d"))
    assert(a.join(b.withColumnRenamed("d", "d2"), Seq("vec_id"))
      .where($"d" =!= $"d2").isEmpty)
  }

  test("non-matching aggregates are left untouched") {
    // non-zero init: NOT a dot product — must stay an ArrayAggregate
    val q = emb.select(aggregate(
      zip_with($"embedding", $"embedding", (x, y) => x.cast("double") * y.cast("double")),
      lit(1d), (acc, v) => acc + v).as("d"))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("graft_dot"), optimized)
    // sum via plain addition (no product): also untouched
    val q2 = emb.select(aggregate($"embedding", lit(0d),
      (acc, v) => acc + v.cast("double")).as("s"))
    assert(!q2.queryExecution.optimizedPlan.toString.contains("graft_dot"))
  }
}
