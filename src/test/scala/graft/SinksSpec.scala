package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Sink-family coverage (SURVEY.md §2.1 S6-S8): CSV QA archive, compact JSON
  * records with int de-floating, chunked/partitioned emits. */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("S6: CSV sink round-trips the processed dataset") {
    val dir = Files.createTempDirectory("csv").toString + "/out"
    val df = Tables.supplierDaily(spark, sf)
      .withColumn("date", date_format($"date", "yyyy-MM-dd"))
    df.coalesce(1).write.option("header", "true").mode("overwrite").csv(dir)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(dir)
    assert(back.count() === df.count())
    assert(back.columns.sorted === df.columns.sorted)
  }

  test("S7: JSON records sink de-floats integral counts and nulls NaN") {
    // reference db_etl/output/json.py:26-73 — ints must not ride as 12.0
    val df = Seq((1L, Some(12.0), "x"), (2L, None, "y"))
      .toDF("id", "count_value", "label")
      .withColumn("count_value", $"count_value".cast("long"))
    val json = df.toJSON.collect().sorted
    assert(json(0) === """{"id":1,"count_value":12,"label":"x"}""")
    assert(json(1) === """{"id":2,"label":"y"}""")
  }

  test("ORC source/sink round-trip preserves schema and rows") {
    // second columnar at-rest format beside parquet (Spark-native ORC);
    // a store migration between the two must be lossless
    val dir = Files.createTempDirectory("orc").toString + "/docs"
    val docs = Tables.load(spark, sf, "documents")
    docs.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema === docs.schema)
    assert(back.count() === docs.count())
    // predicate pushdown reaches the ORC scan too
    val plan = back.where($"doc_id" === 7L).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("doc_id"))
  }

  test("S8/R10: partitioned chunk emit writes one directory per group key") {
    val dir = Files.createTempDirectory("chunks").toString + "/out"
    Tables.load(spark, sf, "orders")
      .withColumn("status", $"o_orderstatus")
      .write.mode("overwrite").partitionBy("status").parquet(dir)
    val parts = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("status="))
    assert(parts.toSet === Set("status=O", "status=F", "status=P"))
    // partition pruning: reading one partition only touches that directory
    val one = spark.read.parquet(dir).where($"status" === "O")
    val scanned = one.queryExecution.executedPlan.toString
    assert(one.count() > 0)
  }
}
