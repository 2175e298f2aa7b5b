package graft.ros.etl

import org.apache.spark.sql.SparkSession

/** CLI entry mirroring the reference's main.cpp: convert a bag to a
  * directory of parquet tables and print the info summary
  * (reference main.cpp:30-59). With no args, generates a demo fixture
  * bag first (so the pipeline is drivable without external data).
  *
  * Usage: sbt "runMain graft.ros.etl.BagEtlMain [bagfile [outdir]]"
  */
object BagEtlMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val bagPath = if (args.length >= 1) args(0) else demoBag()
    val outBase = if (args.length >= 2) args(1)
      else bagPath.stripSuffix(".bag") + "_parquet_dir"  // reference main.cpp:38
    val info = BagEtl.run(spark, bagPath, outBase)
    // reference main.cpp:57-59 report
    System.err.println(s"rosbag2parquet: processed ${info.count} messages " +
      s"(${info.sizeBytes} bytes, crc-xor ${info.crcXor}) from ${info.bagname}")
    spark.stop()
  }

  /** Write a small deterministic fixture bag (2 connections, 100
    * interleaved Imu messages) to a temp file.
    */
  def demoBag(): String = {
    import graft.ros.bag.BagFormat._
    import graft.ros.{Fixtures, MsgDefParser, RosSchemaMapper}
    val bundle = MsgDefParser.parse("sensor_msgs/Imu", Fixtures.imuDef)
    // array values vary per row AND per element: a decoder that reads a
    // neighboring row's array slot (offset bookkeeping bugs) cannot
    // round-trip this fixture
    def msg(seq: Long, sec: Int, nsec: Int, frame: String): Array[Byte] =
      RosSchemaMapper.encode(bundle, Seq(
        seq, sec, nsec, frame,
        0.0, 0.0, 0.0, 1.0, Seq.tabulate(9)(j => seq + j * 0.25),
        0.1, 0.2, 0.3, Seq.tabulate(9)(j => seq * 2 + j * 0.5),
        9.8, 0.0, 0.0, Seq.tabulate(9)(j => seq * 3 + j * 0.75)))
    val conns = Seq(
      BagConnection(0, "/imu/body", "sensor_msgs/Imu", Fixtures.imuMd5, Fixtures.imuDef, "/imu_node"),
      BagConnection(1, "/imu/head", "sensor_msgs/Imu", Fixtures.imuMd5, Fixtures.imuDef, "/imu_node"))
    val msgs = (0 until 100).map { i =>
      WriteMessage(i % 2, 1700000000 + i / 2, (i % 2) * 500000, msg(i.toLong, 1700000000 + i / 2, 0, s"f$i"))
    }
    val p = java.nio.file.Files.createTempFile("graft_demo", ".bag")
    java.nio.file.Files.write(p, writeBag(conns, msgs, messagesPerChunk = 16))
    p.toString
  }
}
