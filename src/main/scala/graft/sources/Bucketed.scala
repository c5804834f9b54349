package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed parquet tables — the storage-level lever for repeated big-to-big
  * joins. Two tables bucketed (and optionally sorted) on the same key with
  * the same bucket count join with ZERO exchange: each task reads matching
  * buckets from both sides, so the shuffle is paid once at write time and
  * amortized over every subsequent join/aggregation on that key.
  *
  * At 100 TB this is the difference between re-shuffling the store on every
  * release join and a scan-local merge: the reference's Citus distribution
  * column (`covid19.time_series` distributed by its hash key) re-expressed
  * as Spark's native bucketing. BucketedSpec asserts the no-exchange plan.
  */
object Bucketed {

  /** Write `df` as a bucketed (hash-distributed) parquet table registered in
    * the session catalog. `sortCols` additionally sorts within each bucket
    * file, letting sort-merge joins skip their per-task sort. */
  def writeTable(df: DataFrame, table: String, nBuckets: Int,
                 bucketCols: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    require(bucketCols.nonEmpty, "bucketCols must not be empty")
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }
}
