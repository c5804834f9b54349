package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Native MinHashSigExpr vs the composed HOF form: identical signatures on
  * the documents fixture (same seed-fixed coefficient sequence, same
  * arithmetic), and the all-null/empty edge. */
class MinHashSigSpec extends SparkSpec {
  import spark.implicits._

  test("native signature equals the HOF signature on real documents") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val staged = docs.select($"doc_id", Dedup.shingles($"text", 3).as("sh"))
      .select($"doc_id", Dedup.shingleHashes($"sh").as("bh"))
    val both = staged.select($"doc_id",
      Dedup.minhashFromHashes($"bh", 16).as("native"),
      Dedup.minhashFromHashesHof($"bh", 16).as("hof"))
    val diff = both.where(to_json($"native") =!= to_json($"hof"))
    assert(diff.isEmpty, diff.take(3).mkString("\n"))
  }

  test("empty base-hash array yields all-null slots, like array_min") {
    val row = spark.range(1)
      .select(expr("array()").cast("array<bigint>").as("bh"))
    val native = row.select(Dedup.minhashFromHashes($"bh", 4).as("s"))
      .select(to_json($"s")).as[String].collect().head
    val hof = row.select(Dedup.minhashFromHashesHof($"bh", 4).as("s"))
      .select(to_json($"s")).as[String].collect().head
    assert(native === hof)
  }
}
