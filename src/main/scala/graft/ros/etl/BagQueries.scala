package graft.ros.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The "rosbag info" aggregation over a conversion output directory —
  * the reference's example query (reference rosbag_example.cpp:14-77)
  * re-expressed: per-topic stats from Messages ⋈ broadcast(Connections)
  * (the O11 broadcast join; O15 hash agg), then the per-type/global
  * re-aggregation as a ROLLUP (O16) with derived freq/data_rate
  * (rosbag_example.cpp:28-34).
  */
object BagQueries {
  /** Per (datatype, topic) stats with rollup rows for per-type and
    * global totals (null topic / null datatype rows).
    */
  def bagInfo(spark: SparkSession, etlDir: String): DataFrame = {
    val messages = spark.read.parquet(s"$etlDir/Messages.parquet")
    // connection ids are per-bag: the dimension key is (bag_path,
    // connection_id) whenever the output carries the bag spine column
    // (multi-bag ETL always does; tolerate older single-bag outputs).
    val joinKeys =
      if (messages.columns.contains("bag_path")) Seq("bag_path", "connection_id")
      else Seq("connection_id")
    val connections = spark.read.parquet(s"$etlDir/Connections.parquet")
      .select(joinKeys.map(col) :+ col("topic") :+ col("datatype"): _*)
    messages
      .join(broadcast(connections), joinKeys)
      .withColumn("ts", col("time_sec").cast("double") + col("time_nsec") / 1e9)
      .rollup(col("datatype"), col("topic"))
      .agg(
        count(lit(1)).as("n_messages"),
        sum(col("size").cast("long")).as("total_bytes"),
        min(col("ts")).as("min_ts"),
        max(col("ts")).as("max_ts"))
      .withColumn("span_sec", col("max_ts") - col("min_ts"))
      .withColumn("freq_hz",
        when(col("span_sec") > 0, col("n_messages") / col("span_sec")))
      .withColumn("data_rate_bps",
        when(col("span_sec") > 0, col("total_bytes") / col("span_sec")))
      .orderBy(asc_nulls_first("datatype"), asc_nulls_first("topic"))
  }
}
