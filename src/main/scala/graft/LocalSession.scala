package graft

import org.apache.spark.sql.SparkSession

/** The one local-session builder every main (Bench/BenchSome/Explain/Soak/
  * Verify) shares — five hand-copied builder blocks had already started to
  * drift, and a config added to only some of them silently runs benchmarks
  * and validation under different sessions. */
object LocalSession {
  def create(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.HashFunctions.register(spark)
    spark
  }
}
