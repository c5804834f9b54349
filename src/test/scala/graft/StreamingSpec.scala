package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.sources.Tables
import graft.streaming.StreamEntry

class StreamingSpec extends SparkSpec {

  private lazy val landing: String = {
    // stage the events fixture as a landing directory with µs timestamps
    val dir = Files.createTempDirectory("landing").toString
    Tables.events(spark, sf).coalesce(1).write.mode("overwrite").parquet(dir)
    dir
  }

  test("windowed streaming aggregation matches the batch equivalent") {
    val stream = StreamEntry.windowedCounts(StreamEntry.readEvents(spark, landing))
    val q = stream.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("win").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    // watermark append-mode emits all windows once the source is exhausted
    // except those still within the watermark horizon; compare totals loosely
    val streamed = spark.sql("SELECT sum(n) FROM win").collect()(0).getLong(0)
    val batch = Tables.events(spark, sf).count()
    assert(streamed > 0 && streamed <= batch)
  }

  test("stateful sessionization emits closed sessions") {
    val events = StreamEntry.readEvents(spark, landing)
    val sessions = StreamEntry.sessionize(spark, events)
    val q = sessions.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sess").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val n = spark.sql("SELECT count(*) FROM sess").collect()(0).getLong(0)
    assert(n > 0)
  }

  test("foreachBatch runs the batch transform per micro-batch (trigger model)") {
    var seen = 0L
    val writer = StreamEntry.foreachBatchPipeline(
      StreamEntry.readEvents(spark, landing),
      transform = df => df.groupBy("event_type").agg(count(lit(1)).as("n")),
      sink = (df, _) => seen += df.count())
    val q = writer.trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    assert(seen === 5)  // five event types aggregated in the single micro-batch
  }
}
