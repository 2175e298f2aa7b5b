package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end streaming demo: convert a fixture bag with the batch ETL,
  * then stream its Messages table through a windowed aggregation into
  * parquet — the reference's contemplated live pipeline
  * (rosbag2parquet.cpp:37) over this engine's own output. Also runs the
  * multimodal blob path on the per-type table.
  * Run: sbt "runMain graft.streaming.StreamDemo"
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 1. batch-convert a fixture bag
    val bag = graft.ros.etl.BagEtlMain.demoBag()
    val out = java.nio.file.Files.createTempDirectory("stream_demo").toString
    val info = graft.ros.etl.BagEtl.run(spark, bag, s"$out/etl")
    println(s"DEMO etl messages=${info.count}")

    // 2. stream the Messages table: windowed per-connection counts
    val schema = spark.read.parquet(s"$out/etl/Messages.parquet").schema
    val stream = StreamingOps.streamEtlOutput(spark, s"$out/etl/Messages.parquet", schema)
      .withColumn("ts", timestamp_seconds(col("time_sec")))
    val agg = stream
      .withWatermark("ts", "30 seconds")
      .groupBy(window(col("ts"), "10 seconds"), col("connection_id"))
      .agg(count(lit(1)).as("cnt"))
    val q = agg.writeStream
      .format("parquet")
      .option("path", s"$out/windowed")
      .option("checkpointLocation", s"$out/ck")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val n = spark.read.parquet(s"$out/windowed").count()
    println(s"DEMO windowed_rows=$n")

    // 3. stream the BAG itself (DSv2 micro-batch tailing)
    val bagStream = spark.readStream.format("rosbag").load(bag)
      .groupBy(col("connection_id")).count()
    val q2 = bagStream.writeStream.format("memory").queryName("bagtail")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q2.awaitTermination(120000)
    println("DEMO bagtail_conns=" + spark.table("bagtail").count())

    // 4. multimodal path over the per-type table's blob column
    val imu = spark.read.parquet(s"$out/etl/sensor_msgs_Imu.parquet")
    val feats = graft.multimodal.MultimodalOps
      .decodeFeaturesStub(imu.select(col("seqno"), col("data")), "data", dim = 8)
    println(s"DEMO feature_rows=${feats.count()} dim=" +
      feats.select(size(col("features"))).head().getInt(0))
    val (slim, side) = graft.multimodal.MultimodalOps
      .externalizeBlobs(imu, "data", "seqno", threshold = 100)
    println(s"DEMO externalized=${side.count()} slim=${slim.count()}")
    spark.stop()
  }
}
