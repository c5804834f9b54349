package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.pipeline.GramStore
import graft.sources.Tables

/** The persisted half of release-novelty scoring: q132 verifies the
  * SEMANTICS against an inline old-slice gram set; this spec proves the
  * on-disk path carries them — novelty against the READ-BACK store equals
  * the batch operator, appends are idempotent, and accepting a release
  * grows the store by exactly its novel margin. */
class GramStoreSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf, "documents")
  private val isNew = col("doc_id") % 10 >= 8

  test("novelty against the read-back store equals the inline q132 answer") {
    val dir = Files.createTempDirectory("gramstore").toString + "/store"
    GramStore.append(spark, dir, "r1", docs.where(!isNew), "text")
    val fromDisk = GramStore.noveltyAgainst(docs.where(isNew), "doc_id",
        "text", GramStore.read(spark, dir))
      .as[(Long, Long, Long, Long)].collect().toSet
    val inline = SparkEntry.queries("q132_novelty")(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(fromDisk.nonEmpty)
    assert(fromDisk === inline)
  }

  test("a nonexistent store reads as an empty typed frame") {
    val dir = Files.createTempDirectory("gramstore_none").toString + "/store"
    // the fresh-store empty-novel branch of append leaves the path
    // unmaterialized — a caller appending an empty slice then reading
    // (rollForwardOnDisk on an empty retained release) must see empty,
    // not an AnalysisException
    GramStore.append(spark, dir, "r1", docs.limit(0), "text")
    val empty = GramStore.read(spark, dir)
    assert(empty.columns.toSeq === Seq("gram_h", "release"))
    assert(empty.isEmpty)
    assert(GramStore.noveltyAgainst(docs.where(isNew), "doc_id", "text",
      empty).where(col("novelty_permille") =!= 1000).isEmpty,
      "against an empty store every gram is novel")
  }

  test("append is idempotent; accepting a release adds only its novel margin") {
    val dir = Files.createTempDirectory("gramstore_idem").toString + "/store"
    val oldSlice = docs.where(!isNew)
    GramStore.append(spark, dir, "r1", oldSlice, "text")
    val once = GramStore.read(spark, dir).count()
    assert(once === GramStore.grams(oldSlice, "text").count())
    GramStore.append(spark, dir, "r1", oldSlice, "text")
    assert(GramStore.read(spark, dir).count() === once,
      "re-appending the same release must not grow the store")
    // r2 lands: the store gains exactly the grams r1 lacked, so the total
    // equals the corpus-wide distinct gram count
    GramStore.append(spark, dir, "r2", docs.where(isNew), "text")
    assert(GramStore.read(spark, dir).count() ===
      GramStore.grams(docs, "text").count())
    // and a doc made entirely of stored grams now scores zero novelty
    val again = GramStore.noveltyAgainst(docs.where(isNew), "doc_id", "text",
      GramStore.read(spark, dir))
    assert(again.where(col("novelty_permille") =!= 0).count() === 0)
  }
}
