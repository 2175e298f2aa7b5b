package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkTestBase

/** SURVEY.md §2.3 non-oracle checks: the streaming variant of Q03 must
  * equal the batch result when the stream is fully drained (replay
  * equivalence — same input, same aggregation, complete mode).
  */
class StreamBatchEquivSpec extends SparkTestBase {
  test("streaming groupBy over events == batch q03 aggregation") {
    val sf = "/root/testdata/sf0.001"
    val batchDf = graft.queries.Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // file-stream over the same parquet; the nanos ts column reads via
    // the EXPLICIT schema (Tables scopes the legacy conf to inference —
    // nothing session-wide to lean on anymore)
    // the file-stream source needs a DIRECTORY; testdata is single files
    val dir = java.nio.file.Files.createTempDirectory("sbe_events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val schema = graft.queries.Tables.eventsRawSchema(spark, sf)
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
      .groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
    val q = stream.writeStream.format("memory").queryName("sbe")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = spark.table("sbe")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batchDf)
  }
}
