package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = LocalSession.create()
    // Warm the session (codegen paths, parquet listings/footers) so the first
    // timed query per table doesn't absorb the one-off JVM/planner startup;
    // the FileStatusCache then serves every query's listing.
    graft.sources.Tables.names.foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").count()
    }
    // ... and the WindowExec/Sort codegen templates, which count() never hits.
    locally {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      spark.range(1000).withColumn("g", col("id") % 7)
        .withColumn("rn", row_number().over(Window.partitionBy("g").orderBy("id")))
        .withColumn("s", sum("id").over(Window.partitionBy("g").orderBy("id")
          .rowsBetween(-3, 0)))
        .write.mode("overwrite").format("noop").save()
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink forces full materialization of every output column —
      // count() would let Catalyst prune the projection work away.
      // A failed query records -1, never its elapsed time.
      val sec =
        try {
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
        }
      name -> sec
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // total over SUCCESSFUL queries only — summing the -1 failure sentinels
    // would make the benchmark read faster when queries break
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
