package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.TextAnalysis

/** Persisted BPE tokenizer artifact — the frozen-model lifecycle for the
  * q142/q143 trainer, on the [[IndexStore]]/[[SignatureStore]] idiom: train
  * ONCE on a corpus, persist the two artifacts a tokenizer release ships,
  * and every downstream consumer (token counting, packing budgets, the
  * streaming `StreamEntry.countTokens` twin) reads the frozen vocabulary
  * instead of retraining. The reference's serving tier reads precomputed
  * stores the same way (`despatch_ops_workers/<worker>/queries.py`).
  *
  * Layout under `path`:
  *   - `vocab`  — (word, seg): the final word→segmentation map,
  *     vocabulary-sized (DISTINCT words, not tokens — metadata against the
  *     corpus; it broadcasts into the count join).
  *   - `merges` — (round, pair, pair_count): the ordered merge trajectory,
  *     the artifact that lets a different runtime re-derive the tokenizer.
  *
  * A build is a full overwrite (a tokenizer IS its training run — there is
  * no partial update; retraining on a new corpus replaces the artifact).
  */
object VocabStore {

  /** Train on `docs` and persist both artifacts (full overwrite). */
  def build(spark: SparkSession, path: String, docs: DataFrame,
            textCol: String, rounds: Int): Unit = {
    val (merges, vocab) = TextAnalysis.bpeTrainAndVocab(docs, textCol, rounds)
    vocab.coalesce(1).write.mode("overwrite").parquet(s"$path/vocab")
    merges.coalesce(1).write.mode("overwrite").parquet(s"$path/merges")
  }

  def readVocab(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/vocab")

  def readMerges(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/merges")

  /** Frozen-vocab token counting straight from the store — zero training
    * jobs (the q146 serving contract, applied to text): one word-keyed
    * broadcast join + one doc-keyed aggregation. */
  def countTokens(spark: SparkSession, path: String, docs: DataFrame,
                  idCol: String, textCol: String): DataFrame =
    TextAnalysis.bpeCountWithVocab(docs, idCol, textCol,
      readVocab(spark, path))
}
