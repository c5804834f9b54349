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
}
