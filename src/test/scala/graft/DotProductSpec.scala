package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Native DotProductExpr vs the composed higher-order form: bit-identical
  * results on floats, doubles, nulls, and length mismatches — plus the
  * codegen property that motivated it. */
class DotProductSpec extends SparkSpec {
  import spark.implicits._

  private def f(xs: Float*): Array[Float] = xs.toArray

  test("matches the HOF form bit-for-bit on float arrays") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1),
        Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }.toDF("id", "a", "b")
    val both = rows.select(
      Similarity.dot($"a", $"b").as("native"),
      Similarity.dotHof($"a", $"b").as("hof"))
    assert(both.where($"native" =!= $"hof" ||
      ($"native".isNull =!= $"hof".isNull)).isEmpty)
  }

  test("mixed float/double inputs and literal planes work") {
    val rows = Seq((1L, f(1f, 2f, 3f))).toDF("id", "a")
    val plane = array(lit(0.5), lit(-1.0), lit(2.0))
    val got = rows.select(Similarity.dot($"a", plane)).as[Double].collect().head
    assert(got === 1 * 0.5 - 2.0 + 3 * 2.0)
  }

  test("null array, null element, and length mismatch all yield null") {
    val rows = Seq(
      (1L, f(1f, 2f), Some(f(1f, 1f))),             // fine
      (2L, f(1f, 2f), None),                         // null array
      (3L, f(1f, 2f), Some(f(1f)))                   // length mismatch
    ).toDF("id", "a", "b")
    val got = rows.select($"id", Similarity.dot($"a", $"b").as("d"))
      .orderBy("id").as[(Long, Option[Double])].collect().toList
    assert(got === List((1L, Some(3.0)), (2L, None), (3L, None)))
    // null ELEMENT (array<double> with a null slot)
    val withNullElem = Seq(1).toDF("x")
      .select(array(lit(1.0), lit(null).cast("double")).as("a"),
        array(lit(1.0), lit(2.0)).as("b"))
    assert(withNullElem.select(Similarity.dot($"a", $"b"))
      .as[Option[Double]].collect().head.isEmpty)
  }

  test("the native dot stays inside whole-stage codegen") {
    // local Seqs constant-fold to LocalTableScan, so probe over a real scan
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.select(Similarity.dot($"embedding", $"embedding").as("d"))
    val plan = q.queryExecution.executedPlan.toString
    // '*(n)' prefixes mark whole-stage-codegen stages in the compact form
    assert(plan.contains("*(1) Project [graft_dot"), plan)
    assert(q.where($"d" < 0).isEmpty) // self-dot is non-negative; also forces execution
  }
}
