package graft

import java.nio.file.Files
import graft.pipeline.EavStore

class EavStoreSpec extends SparkSpec {
  import spark.implicits._

  private def row(hash: String, part: String, date: String, payload: String) =
    (hash, 1, "supplier", "1", "qty", part, java.sql.Date.valueOf(date), payload)

  test("upsert replaces rows on (hash, partition_id) and unions the rest") {
    val dir = Files.createTempDirectory("eav").toString + "/store"
    val first = Seq(
      row("h1", "p1", "2021-01-01", "old1"),
      row("h2", "p1", "2021-01-02", "old2"),
      row("h3", "p2", "2021-01-03", "old3"))
      .toDF("hash", "release_id", "areaType", "areaCode", "metric",
        "partition_id", "date", "payload")
    EavStore.upsert(spark, first, dir)
    assert(EavStore.read(spark, dir).count() === 3)

    val second = Seq(
      row("h1", "p1", "2021-01-01", "new1"),   // conflict -> replaced
      row("h4", "p1", "2021-01-04", "new4"))   // new row, same partition
      .toDF("hash", "release_id", "areaType", "areaCode", "metric",
        "partition_id", "date", "payload")
    EavStore.upsert(spark, second, dir)

    val after = EavStore.read(spark, dir)
    assert(after.count() === 4)
    val payloads = after.select("hash", "payload").as[(String, String)].collect().toMap
    assert(payloads("h1") === "new1")
    assert(payloads("h2") === "old2")
    assert(payloads("h3") === "old3")
    assert(payloads("h4") === "new4")
  }

  test("write clustering bounds files per store partition") {
    val dir = Files.createTempDirectory("eav_files").toString + "/store"
    val rows = (1 to 5000).map(i =>
      row(s"h$i", s"p${i % 3}", "2021-01-01", s"v$i"))
      .toDF("hash", "release_id", "areaType", "areaCode", "metric",
        "partition_id", "date", "payload")
    EavStore.upsert(spark, rows, dir)
    (0 until 3).foreach { p =>
      val files = new java.io.File(s"$dir/partition_id=p$p")
        .listFiles().count(_.getName.endsWith(".parquet"))
      assert(files > 0 && files <= EavStore.FilesPerPartition,
        s"partition p$p has $files files")
    }
  }

  test("S13 dump/load migration round-trip: store -> JSON.gz -> rebuilt store") {
    val src = Files.createTempDirectory("eav_src").toString + "/store"
    val dump = Files.createTempDirectory("eav_dump").toString + "/dump"
    val dst = Files.createTempDirectory("eav_dst").toString + "/store"
    val rows = Seq(
      row("h1", "p1", "2021-01-01", "v1"), row("h2", "p2", "2021-01-02", "v2"))
      .toDF("hash", "release_id", "areaType", "areaCode", "metric",
        "partition_id", "date", "payload")
    EavStore.upsert(spark, rows, src)
    // dump: SELECT * -> compressed JSON (the reference's db_dumper shape)
    EavStore.read(spark, src).write.option("compression", "gzip").json(dump)
    // load: read the dump, upsert into a fresh store (db_loader shape)
    val loaded = spark.read.json(dump)
      .select($"hash", $"release_id".cast("int"), $"areaType", $"areaCode",
        $"metric", $"partition_id", $"date".cast("date"), $"payload")
    EavStore.upsert(spark, loaded, dst)
    val a = EavStore.read(spark, src).select("hash", "payload")
      .as[(String, String)].collect().toSet
    val b = EavStore.read(spark, dst).select("hash", "payload")
      .as[(String, String)].collect().toSet
    assert(a === b && a.size === 2)
  }
}
