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

  test("simhash banding recovers EVERY pair at hamming <= 3 (pigeonhole recall)") {
    // 4 bands of 16 bits: any pair differing in <= 3 bits must share at least
    // one untouched band, so banded blocking is provably lossless there.
    // Verified against exhaustive all-pairs ground truth on the fixture plus
    // planted duplicates (identical text -> hamming 0 guarantees non-empty).
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text")
      .unionByName(Seq(
        (100001L, "planted twin document about spark native analytics engines"),
        (100002L, "planted twin document about spark native analytics engines"))
        .toDF("doc_id", "text"))
    val sh = Dedup.simhash64(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val ids = sh.keys.toSeq.sorted
    val truth = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      d = java.lang.Long.bitCount(sh(ids(i)) ^ sh(ids(j))) if d <= 3
    } yield (ids(i), ids(j), d.toLong)).toSet
    assert(truth.nonEmpty, "planted identical docs must appear in ground truth")
    val found = Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(found === truth,
      s"banded simhash diverged from exhaustive truth: missed ${(truth -- found).take(5)}, " +
        s"extra ${(found -- truth).take(5)}")
  }
}
