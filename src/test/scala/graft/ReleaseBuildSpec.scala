package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Classifier
import graft.pipeline.{GramStore, ReleaseBuild, SignatureStore}
import graft.sources.Tables

/** The end-to-end nightly roll-forward: q140 verifies the SEMANTICS with
  * inline store frames; this spec proves the persisted-store path carries
  * them — seed release r0 on disk, roll r1 forward against the stores, and
  * re-run the roll-forward to prove the whole job idempotent (the crash-
  * rerun a real release pipeline must survive). */
class ReleaseBuildSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sf, "documents")
  private val isNew = col("doc_id") % 10 >= 8

  private def trainedWeights: Array[Long] = {
    val w = Classifier.trainWeights(docs.where(!isNew), "doc_id", "text",
      col("lang") === "en", d = 256, iters = 2, lr = 0.5)
    Classifier.denseWeights(w, 256)
  }

  test("roll-forward from persisted stores equals the inline q140 answer") {
    val dir = Files.createTempDirectory("relbuild").toString
    SignatureStore.append(spark, s"$dir/sigs", "r0",
      docs.where(!isNew), "doc_id", "text")
    GramStore.append(spark, s"$dir/grams", "r0", docs.where(!isNew), "text")
    val fromDisk = ReleaseBuild.rollForwardOnDisk(spark, docs.where(isNew),
      "doc_id", "text", "source", docs, s"$dir/sigs", s"$dir/grams", "r1",
      trainedWeights)
    val inline = SparkEntry.queries("q140_release_build")(spark, sf)
    assert(fromDisk.count() > 0, "fixture must retain documents")
    assert(fromDisk.exceptAll(inline).isEmpty && inline.exceptAll(fromDisk).isEmpty)
  }

  test("re-running the roll-forward is idempotent in output and state") {
    val dir = Files.createTempDirectory("relbuild_idem").toString
    SignatureStore.append(spark, s"$dir/sigs", "r0",
      docs.where(!isNew), "doc_id", "text")
    GramStore.append(spark, s"$dir/grams", "r0", docs.where(!isNew), "text")
    val w = trainedWeights
    def roll() = ReleaseBuild.rollForwardOnDisk(spark, docs.where(isNew),
      "doc_id", "text", "source", docs, s"$dir/sigs", s"$dir/grams", "r1", w)
    val first = roll().collect().toSet
    // state after run 1: r1 partitions hold the retained docs' signatures
    // and their novel grams
    spark.catalog.refreshByPath(s"$dir/sigs")
    val sigCount = SignatureStore.read(spark, s"$dir/sigs").count()
    val gramCount = GramStore.read(spark, s"$dir/grams").count()
    // the rerun sees its own r1 partitions in both stores (the crash-
    // between-append-and-publish case) and must converge, not self-suppress
    val second = roll().collect().toSet
    assert(second === first, "rerun must re-deliver the same release")
    spark.catalog.refreshByPath(s"$dir/sigs")
    assert(SignatureStore.read(spark, s"$dir/sigs").count() === sigCount)
    assert(GramStore.read(spark, s"$dir/grams").count() === gramCount)
    assert(SignatureStore.read(spark, s"$dir/sigs")
      .select("release").distinct().count() === 2)
  }
}
