package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** The EAV long store (reference `covid19.time_series`,
  * `db_tables/covid19.py:192-216`): rows
  * `(hash, release_id, area/metric keys, partition_id, date, payload)` at rest
  * as parquet partitioned by `partition_id` — the exact analogue of the
  * reference's `PARTITION OF time_series FOR VALUES IN ('{date}|{group}')`
  * DDL (S10), with Catalyst partition pruning replacing the hand-templated
  * table names.
  *
  * The reference's `INSERT ... ON CONFLICT (hash, partition_id) DO UPDATE`
  * (S9) becomes: dedup on (hash, partition_id) keeping the incoming row, then
  * dynamic partition overwrite of only the touched partitions.
  */
object EavStore {

  /** S9/S10: idempotent upsert — pre-dedup (reference `uploader.py:308-312`)
    * then dynamic-overwrite only the partitions present in `df`. */
  def upsert(spark: SparkSession, df: DataFrame, path: String): Unit = {
    val existing = readIfExists(spark, path)
    val incoming = Dedup.exactFirst(df, Seq("hash", "partition_id"), "date")
    val merged = existing match {
      case Some(old) =>
        // Partition values are metadata-scale: collect the touched ids and
        // filter the store with isin so the old-side read is partition-PRUNED
        // (a semi join would shuffle the whole store instead). Keep old rows
        // only where no incoming row claims the same (hash, partition_id).
        val touched = incoming.select("partition_id").distinct()
          .collect().map(_.getString(0)).toSeq
        val keepOld = old
          .where(col("partition_id").isin(touched.map(_.asInstanceOf[Any]): _*))
          .join(incoming.select("hash", "partition_id"),
            Seq("hash", "partition_id"), "left_anti")
        // Only keepOld reads the path being overwritten — checkpoint just
        // that (usually a small remainder), not the whole merged set.
        incoming.unionByName(keepOld.localCheckpoint())
      case None => incoming
    }
    // Cluster on (partition_id, bounded hash bucket) before the partitioned
    // write: without it every shuffle task holds rows of every partition and
    // writes a file into each — partitions × tasks small files at scale.
    // With it each store partition gets at most FilesPerPartition sized
    // files, and the (partition_id, bucket) combos still spread across the
    // executor pool for parallel writing. One extra shuffle of the output,
    // paid once at the sink.
    merged
      .repartition(col("partition_id"), pmod(xxhash64(col("hash")), lit(FilesPerPartition)))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("partition_id")
      .parquet(path)
  }

  /** Upper bound on parquet files per partition value per write — also the
    * write parallelism per partition value, so it trades file count against
    * concurrent writers. A release writing P partitions uses up to
    * P × FilesPerPartition writer tasks. */
  val FilesPerPartition = 16

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  private def readIfExists(spark: SparkSession, path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(path)) else None
  }
}
