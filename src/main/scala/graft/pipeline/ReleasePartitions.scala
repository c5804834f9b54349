package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Shared retention vacuum for stores parquet-partitioned by a top-level
  * `release=` directory ([[SignatureStore]], [[GramStore]]): delete every
  * release the predicate rejects, loudly failing on a silent delete
  * (Hadoop `fs.delete` reports failure by RETURNING false, not throwing).
  * The session listing cache is refreshed so a plan built after the
  * vacuum cannot read the dropped files' stale listing. */
private[pipeline] object ReleasePartitions {
  def vacuum(spark: SparkSession, path: String,
             keep: String => Boolean): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else {
      val dropped = for {
        rel <- fs.listStatus(root).toSeq
        if rel.isDirectory && rel.getPath.getName.startsWith("release=")
        name = rel.getPath.getName.stripPrefix("release=")
        if !keep(name)
      } yield {
        require(fs.delete(rel.getPath, true),
          s"vacuum failed to delete ${rel.getPath}")
        name
      }
      spark.catalog.refreshByPath(path)
      dropped.distinct
    }
  }
}
