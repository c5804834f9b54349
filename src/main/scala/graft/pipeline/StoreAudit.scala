package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Integrity card for a release-partitioned store — the nightly health
  * check a 100 TB store fleet runs after every append/vacuum/compact
  * (q207). One row per release with the row/id counts and the two
  * invariants every store in this family holds by construction:
  *
  *   - `cross_release_dup`: ids stored under MORE THAN ONE release
  *     partition. The gram store's novel-margin layout stores each gram
  *     under exactly one release ([[GramStore.append]]), a vector's code
  *     row lives in exactly one release ([[IndexStore.append]]), and a
  *     document signs once per release it was retained in
  *     ([[SignatureStore.append]] on disjoint release slices).
  *   - `orphan`: stored ids absent from the id universe the store claims
  *     to index (the corpus table, or the corpus gram set).
  *
  * Any non-zero is a corrupted store — a torn append, a partial vacuum,
  * an overlapping re-append — caught before it skews dedup margins or
  * serving answers. Scale shape: one store-sized groupBy (map-side
  * combined), one id-keyed duplicate check, one anti-join against the
  * universe — all keyed shuffles on the id, never corpus-text-sized. */
object StoreAudit {

  def card(tier: String, store: DataFrame, idCol: String,
           universe: DataFrame): DataFrame = {
    val idRel = store.select(col(idCol).cast("long").as("__id"),
      col("release").cast("string").as("release")).distinct()
    val dupIds = idRel.groupBy("__id")
      .agg(count(lit(1)).as("__n")).where(col("__n") > 1).select("__id")
    val perRel = store.groupBy(col("release").cast("string").as("release"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(idCol)).as("n_ids"))
    val dup = idRel.join(dupIds, Seq("__id"), "left_semi")
      .groupBy("release").agg(count(lit(1)).as("cross_release_dup"))
    val orph = idRel.join(universe
        .select(col(universe.columns.head).cast("long").as("__id")),
        Seq("__id"), "left_anti")
      .groupBy("release").agg(count(lit(1)).as("orphan"))
    perRel.join(dup, Seq("release"), "left")
      .join(orph, Seq("release"), "left")
      .na.fill(0L, Seq("cross_release_dup", "orphan"))
      .select(lit(tier).as("tier"), col("release"), col("n_rows"),
        col("n_ids"), col("cross_release_dup"), col("orphan"))
  }
}
