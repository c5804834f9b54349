package graft

import org.apache.spark.sql.functions._

import graft.operators.Profile

/** Profiler invariants on the documents fixture: one row per column, exact
  * counts exact, and the linear-counting distinct near the true value well
  * under sketch capacity. */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile emits exact counts and an in-tolerance distinct per column") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = Profile.profile(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet === docs.columns.toSet)
    val n = docs.count()
    out.values.foreach { r =>
      assert(r.getLong(1) === n)             // n_rows
      assert(r.getLong(2) === 0L)            // fixture has no nulls
      assert(r.getLong(4) >= 1L)             // max_len
    }
    val exactIds = docs.select(countDistinct(col("doc_id"))).as[Long].head()
    val approxIds = out("doc_id").getLong(3)
    assert(math.abs(approxIds - exactIds) <= math.max(2L, exactIds / 10),
      s"approx=$approxIds exact=$exactIds")
  }
}
