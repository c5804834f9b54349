package graft

import org.apache.spark.sql.SparkSession

/** The one local-session builder every main (Bench/BenchSome/Explain/Soak/
  * Verify) shares — five hand-copied builder blocks had already started to
  * drift, and a config added to only some of them silently runs benchmarks
  * and validation under different sessions. */
object LocalSession {
  def create(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Scan-parallelism floor (guide: spark.sql.files.minPartitionNum /
    // split sizing). Spark sizes file splits as
    // max(openCostInBytes, totalBytes/defaultParallelism) capped by
    // maxPartitionBytes; the 4 MB openCost default floors every split at
    // 4 MB, so a table under ~4 MB scans as ONE task and every map-side
    // pass over it (shingling, signing, quantizer-training iterations)
    // runs single-threaded regardless of core count. Lowering the open
    // cost lets small inputs split to input-size/parallelism — scale-
    // ADAPTIVE, not a local constant: large files keep the
    // maxPartitionBytes cap, and at fleet scale a lower open cost only
    // packs more small files per split (fewer tasks, the desirable
    // direction). Env-overridable for A/B and cluster tuning.
    val openCost = sys.env.getOrElse("SPARK_GRAFT_OPEN_COST", (16 * 1024).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.openCostInBytes", openCost)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.HashFunctions.register(spark)
    spark
  }
}
