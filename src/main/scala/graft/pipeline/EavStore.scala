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

  /** Small-file compaction — the maintenance pass a long-lived partitioned
    * store needs: repeated upserts each add up to [[FilesPerPartition]]
    * files per touched partition, and at 100 TB a scan's task count (and
    * the namenode/listing load) degrades with file count, not byte count.
    * Rewrites ONLY partitions holding more than `maxFiles` parquet files,
    * re-clustered to ≤ [[FilesPerPartition]] sized files, leaving healthy
    * partitions untouched (their files are never read or rewritten).
    * Content-preserving by construction: one pruned read + one dynamic
    * partition overwrite of the same rows.
    *
    * The rewritten slice is localCheckpointed because it is read from the
    * very path being overwritten. Compaction holds that slice in
    * executor storage, so at scale callers compact a bounded batch of
    * partitions at a time (the fragmented list is returned for that).
    * Returns the partition values rewritten. */
  def compact(spark: SparkSession, path: String,
              maxFiles: Int = FilesPerPartition): Seq[String] = {
    require(maxFiles > 0, s"maxFiles must be positive, got $maxFiles")
    val fs = hadoopFs(spark, path)
    val fragmented = partitionDirs(spark, path).collect {
      case d if fs.listStatus(d).count(_.getPath.getName.endsWith(".parquet")) > maxFiles =>
        partitionValue(d.getName)
    }
    if (fragmented.nonEmpty) {
      val slice = read(spark, path)
        .where(col("partition_id").isin(fragmented.map(_.asInstanceOf[Any]): _*))
        .localCheckpoint()
      // bucket count honors the caller's bound: rewriting into
      // FilesPerPartition buckets when maxFiles < FilesPerPartition would
      // leave the partition still "fragmented" and re-rewrite it forever
      val buckets = math.min(maxFiles, FilesPerPartition)
      slice
        .repartition(col("partition_id"),
          pmod(xxhash64(col("hash")), lit(buckets)))
        .write
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("partition_id")
        .parquet(path)
    }
    fragmented
  }

  /** Retention vacuum: physically drops every store partition whose value
    * fails `keep` — how a release-versioned store stays bounded (the
    * reference deletes old release partitions the same way, via dropped
    * partition tables). A pure metadata/filesystem operation: no data is
    * read or shuffled. Returns the partition values dropped. */
  def vacuum(spark: SparkSession, path: String,
             keep: String => Boolean): Seq[String] = {
    val fs = hadoopFs(spark, path)
    partitionDirs(spark, path)
      .filterNot(d => keep(partitionValue(d.getName)))
      .map { d =>
        // fs.delete reports failure by RETURNING false, not throwing — a
        // silently-failed delete must not be recorded as dropped
        require(fs.delete(d, true), s"vacuum failed to delete $d")
        partitionValue(d.getName)
      }
  }

  private def hadoopFs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def partitionDirs(spark: SparkSession,
                            path: String): Seq[org.apache.hadoop.fs.Path] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = hadoopFs(spark, path)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("partition_id="))
      .map(_.getPath)
  }

  /** Decode a `partition_id=<escaped>` directory name back to its value.
    * Spark/Hive path escaping is %xx percent-encoding ONLY — unlike
    * URLDecoder it never turns `+` into a space (a literal `+` in a
    * partition value is written unescaped, and URLDecoder would corrupt it,
    * making vacuum delete or keep the wrong partitions). */
  private def partitionValue(dirName: String): String = {
    val s = dirName.stripPrefix("partition_id=")
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def readIfExists(spark: SparkSession, path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(path)
    if (hadoopFs(spark, path).exists(p)) Some(spark.read.parquet(path)) else None
  }
}
