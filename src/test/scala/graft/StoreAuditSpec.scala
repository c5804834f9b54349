package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.pipeline.{GramStore, SignatureStore, StoreAudit}
import graft.sources.Tables

/** The q207 integrity card: healthy stores audit to zero on both
  * invariants, and each planted corruption class — an id stored under two
  * release partitions, a stored id orphaned from its corpus — is caught
  * with the right count on the right release rows. */
class StoreAuditSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sf, "documents")
  private val isNew = col("doc_id") % 10 >= 8

  test("healthy signature and gram stores audit to zero invariants") {
    val dir = Files.createTempDirectory("audit_ok").toString
    SignatureStore.append(spark, s"$dir/sigs", "r1",
      docs.where(!isNew), "doc_id", "text")
    SignatureStore.append(spark, s"$dir/sigs", "r2",
      docs.where(isNew), "doc_id", "text")
    GramStore.append(spark, s"$dir/grams", "r1", docs.where(!isNew), "text")
    GramStore.append(spark, s"$dir/grams", "r2", docs.where(isNew), "text")
    val sig = StoreAudit.card("signatures",
      SignatureStore.read(spark, s"$dir/sigs"), "doc_id",
      docs.select("doc_id")).collect()
    assert(sig.length === 2)
    sig.foreach { r =>
      assert(r.getAs[Long]("cross_release_dup") === 0L, r.toString)
      assert(r.getAs[Long]("orphan") === 0L, r.toString)
      assert(r.getAs[Long]("n_rows") === r.getAs[Long]("n_ids"))
    }
    val gram = StoreAudit.card("grams",
      GramStore.read(spark, s"$dir/grams"), "gram_h",
      GramStore.grams(docs, "text")).collect()
    assert(gram.length === 2)
    gram.foreach { r =>
      assert(r.getAs[Long]("cross_release_dup") === 0L, r.toString)
      assert(r.getAs[Long]("orphan") === 0L, r.toString)
    }
  }

  test("an id stored under two releases is flagged on BOTH release rows") {
    val dir = Files.createTempDirectory("audit_dup").toString
    val overlap = docs.where(col("doc_id") % 10 < 2) // in r1 AND r2
    SignatureStore.append(spark, s"$dir/sigs", "r1",
      docs.where(!isNew), "doc_id", "text")
    SignatureStore.append(spark, s"$dir/sigs", "r2",
      docs.where(isNew).unionByName(overlap), "doc_id", "text")
    val nDup = overlap.count()
    val card = StoreAudit.card("signatures",
        SignatureStore.read(spark, s"$dir/sigs"), "doc_id",
        docs.select("doc_id"))
      .collect().map(r => r.getAs[String]("release") ->
        r.getAs[Long]("cross_release_dup")).toMap
    assert(card("r1") === nDup,
      "the overlap ids must flag on the release that held them first")
    assert(card("r2") === nDup,
      "the overlap ids must flag on the re-appending release too")
  }

  test("a stored id missing from the universe is flagged as an orphan") {
    val dir = Files.createTempDirectory("audit_orph").toString
    SignatureStore.append(spark, s"$dir/sigs", "r1",
      docs.where(!isNew), "doc_id", "text")
    // universe loses some corpus ids (a truncated corpus table — the
    // store now claims documents that no longer exist)
    val truncated = docs.where(col("doc_id") % 7 =!= 0).select("doc_id")
    val lost = docs.where(!isNew && col("doc_id") % 7 === 0).count()
    val card = StoreAudit.card("signatures",
      SignatureStore.read(spark, s"$dir/sigs"), "doc_id", truncated)
      .collect()
    assert(card.length === 1)
    assert(card(0).getAs[Long]("orphan") === lost)
    assert(card(0).getAs[Long]("cross_release_dup") === 0L)
  }
}
