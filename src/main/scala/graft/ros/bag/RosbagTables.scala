package graft.ros.bag

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Companion metadata reads for the `rosbag` source: the Connections
  * dimension as a DataFrame (reference Connections table,
  * FlattenedRosWriter.cpp:90-137) — tiny, built driver-side from the
  * bag index, intended as the broadcast side of joins (O11).
  */
object RosbagTables {
  val ConnectionsSchema: StructType = StructType(Seq(
    StructField("connection_id", IntegerType, nullable = false),
    StructField("topic", StringType, nullable = false),
    StructField("datatype", StringType, nullable = false),
    StructField("md5sum", StringType, nullable = false),
    StructField("msg_def", StringType, nullable = false),
    StructField("callerid", StringType, nullable = false),
    // full raw connection header as a string map (reference
    // FlattenedRosWriter.cpp:218-220's header->find model):
    // element_at(header, 'latching') etc.
    StructField("header", MapType(StringType, StringType, valueContainsNull = false),
      nullable = false)))

  def connections(spark: SparkSession, path: String): DataFrame =
    fromIndex(spark, RosbagIO.scanIndex(path))

  /** Build from an already-scanned index (avoids a second file scan). */
  def fromIndex(spark: SparkSession, index: BagFormat.BagIndex): DataFrame = {
    val rows = index.connections.map(c =>
      Row(c.connId, c.topic, c.datatype, c.md5sum, c.msgDef, c.callerid, c.header))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), ConnectionsSchema)
  }
}
