package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Recall of the MinHash-LSH near-dup path against exhaustive ground truth on
  * the documents fixture: every high-Jaccard pair the brute-force pass finds
  * must be recovered by the banded candidates. */
class RecallSpec extends SparkSpec {
  import spark.implicits._

  test("minhash candidates recover all pairs with shingle-jaccard >= 0.7") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val sh = docs.select($"doc_id",
      array_distinct(Dedup.shingles($"text", 3)).as("sh"))
    // exhaustive ground truth: all 500x500/2 pairs, exact jaccard
    val a = sh.toDF("a_id", "sh_a")
    val b = sh.toDF("b_id", "sh_b")
    val truth = a.crossJoin(b).where($"a_id" < $"b_id")
      .withColumn("j", size(array_intersect($"sh_a", $"sh_b")).cast("double")
        / size(array_union($"sh_a", $"sh_b")))
      .where($"j" >= 0.7)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty, "fixture should contain planted near-dups")
    val found = Dedup.minhashCandidates(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    val missed = truth -- found
    assert(missed.isEmpty,
      s"LSH missed ${missed.size}/${truth.size} true near-dup pairs: ${missed.take(5)}")
  }
}
