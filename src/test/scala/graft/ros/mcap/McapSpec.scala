package graft.ros.mcap

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import McapFormat._

class McapSpec extends SparkTestBase {

  private def fixtureMessages(n: Int): Seq[McapMessage] =
    (0 until n).map { i =>
      McapMessage(channelId = 1 + (i % 2), sequence = i.toLong,
        logTime = 1700000000000000000L + i * 1000000L,
        publishTime = 1700000000000000000L + i * 1000000L + 5,
        data = Array.tabulate(4 + i)(j => ((i * 31 + j) % 127).toByte))
    }

  private val fixtureSchemas = Seq(
    McapSchema(1, "sensor_msgs/msg/Imu", "ros2msg", "float64 x\n".getBytes("UTF-8")),
    McapSchema(2, "std_msgs/msg/String", "ros2msg", "string data\n".getBytes("UTF-8")))
  private val fixtureChannels = Seq(
    McapChannel(1, 1, "/imu", "cdr"),
    McapChannel(2, 2, "/chatter", "cdr"))

  private def writeTemp(bytes: Array[Byte], suffix: String = ".mcap"): String = {
    val f = java.io.File.createTempFile("graft_mcap", suffix)
    val out = new java.io.FileOutputStream(f)
    try out.write(bytes) finally out.close()
    f.getAbsolutePath
  }

  test("chunked mcap round-trips through the source (zstd, two chunks)") {
    val msgs = fixtureMessages(10)
    val path = writeTemp(writeMcap(fixtureSchemas, fixtureChannels, msgs,
      compression = "zstd", chunked = true, chunkGroups = 2))
    val df = spark.read.format("mcap").load(path)
    val rows = df.orderBy("chunk_idx", "offset").collect()
    assert(rows.length == 10)
    assert(rows.map(_.getAs[Int]("chunk_idx")).distinct.toSeq == Seq(0, 1))
    rows.zip(msgs).foreach { case (r, m) =>
      assert(r.getAs[Long]("log_time") == m.logTime)
      assert(r.getAs[Long]("publish_time") == m.publishTime)
      assert(r.getAs[Long]("sequence") == m.sequence)
      assert(r.getAs[Int]("channel_id") == m.channelId)
      assert(r.getAs[Array[Byte]]("data").toSeq == m.data.toSeq)
      assert(r.getAs[Int]("size") == m.data.length)
      assert(r.getAs[String]("topic") == (if (m.channelId == 1) "/imu" else "/chatter"))
      assert(r.getAs[String]("schema_name") ==
        (if (m.channelId == 1) "sensor_msgs/msg/Imu" else "std_msgs/msg/String"))
      assert(r.getAs[String]("schema_encoding") == "ros2msg")
      assert(r.getAs[String]("message_encoding") == "cdr")
      assert(r.getAs[Long]("data_crc32") ==
        graft.ros.bag.RosbagDataSource.crc32(m.data))
    }
  }

  test("all three compressions and the summary-less walk yield identical rows") {
    val msgs = fixtureMessages(8)
    def rowsOf(bytes: Array[Byte]): Seq[(Long, Long, String)] =
      spark.read.format("mcap").load(writeTemp(bytes))
        .select("log_time", "sequence", "data").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          r.getAs[Array[Byte]](2).map("%02x".format(_)).mkString)).toSeq.sorted
    val none = rowsOf(writeMcap(fixtureSchemas, fixtureChannels, msgs, ""))
    val lz4 = rowsOf(writeMcap(fixtureSchemas, fixtureChannels, msgs, "lz4"))
    val zstd = rowsOf(writeMcap(fixtureSchemas, fixtureChannels, msgs, "zstd"))
    val noSum = rowsOf(writeMcap(fixtureSchemas, fixtureChannels, msgs, "zstd",
      withSummary = false))
    assert(none == lz4 && lz4 == zstd && zstd == noSum && none.length == 8)
  }

  test("unchunked standalone messages read via the inline segment partition") {
    val msgs = fixtureMessages(5)
    val path = writeTemp(writeMcap(fixtureSchemas, fixtureChannels, msgs, chunked = false))
    val df = spark.read.format("mcap").load(path)
    val rows = df.orderBy("offset").collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getAs[Int]("chunk_idx") == -1))
    assert(rows.map(_.getAs[Long]("sequence")).toSeq == (0L until 5L))
  }

  test("chunk time-range pruning drops whole chunks from the plan") {
    val msgs = fixtureMessages(10) // two chunks: logTime split at msg 5
    val path = writeTemp(writeMcap(fixtureSchemas, fixtureChannels, msgs,
      chunked = true, chunkGroups = 2))
    val cut = msgs(5).logTime
    // plan directly: the second chunk's range is [cut, ...], the first
    // chunk ends before it
    import org.apache.spark.sql.sources.GreaterThanOrEqual
    val scan = new McapScan(path, McapDataSource.SpineSchema,
      Array(GreaterThanOrEqual("log_time", cut)), -1)
    assert(scan.planInputPartitions().length == 1, "first chunk must be pruned")
    // and through the full query path the rows are right
    val got = spark.read.format("mcap").load(path)
      .filter(col("log_time") >= cut).count()
    assert(got == 5)
  }

  test("topic filter and column pruning work through the query path") {
    val msgs = fixtureMessages(10)
    val path = writeTemp(writeMcap(fixtureSchemas, fixtureChannels, msgs, "lz4"))
    val got = spark.read.format("mcap").load(path)
      .filter(col("topic") === "/imu").select("sequence")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == msgs.filter(_.channelId == 1).map(_.sequence).sorted)
  }

  test("channels dimension table lists (channel, schema) per file") {
    val msgs = fixtureMessages(4)
    val path = writeTemp(writeMcap(fixtureSchemas, fixtureChannels, msgs))
    val ch = McapTables.channels(spark, path).collect()
      .map(r => (r.getAs[Int]("channel_id"), r.getAs[String]("topic"),
        r.getAs[String]("schema_name"))).toSet
    assert(ch == Set((1, "/imu", "sensor_msgs/msg/Imu"),
      (2, "/chatter", "std_msgs/msg/String")))
  }

  test("corrupt and truncated files fail loudly") {
    val good = writeMcap(fixtureSchemas, fixtureChannels, fixtureMessages(4))
    val badMagic = good.clone(); badMagic(0) = 0x00
    val e1 = intercept[Exception] {
      spark.read.format("mcap").load(writeTemp(badMagic)).count()
    }
    assert(e1.getMessage.contains("mcap") ||
      Option(e1.getCause).exists(_.getMessage.contains("mcap")))
    val truncated = good.take(good.length - 20)
    val e2 = intercept[Exception] {
      spark.read.format("mcap").load(writeTemp(truncated)).count()
    }
    assert(e2.getMessage.contains("magic") ||
      Option(e2.getCause).exists(_.getMessage.contains("magic")))
  }

  test("typed read flattens CDR payloads into columns") {
    val imuSchema =
      """std_msgs/msg/Header header
        |float64 ax
        |float64 ay
        |================================================================================
        |MSG: std_msgs/msg/Header
        |builtin_interfaces/Time stamp
        |string frame_id""".stripMargin
    val bundle = Ros2Msg.bundle("sensor_msgs/msg/Imu", imuSchema)
    val schemas = Seq(McapSchema(1, "sensor_msgs/msg/Imu", "ros2msg",
      imuSchema.getBytes("UTF-8")), fixtureSchemas(1))
    val channels = Seq(McapChannel(1, 1, "/imu", "cdr"), McapChannel(2, 2, "/chatter", "cdr"))
    val msgs = (0 until 6).map { i =>
      if (i % 3 == 2) // a /chatter message the typed read must skip
        McapMessage(2, i.toLong, 100L + i, 100L + i, Array[Byte](0, 1, 0, 0, 5, 0, 0, 0, 'h', 'i', 'x', 'y', 0))
      else
        McapMessage(1, i.toLong, 100L + i, 100L + i,
          CdrCodec.encode(bundle, Seq(10 + i, (20 + i).toLong, s"frame$i", 1.5 * i, -2.5 * i)))
    }
    val path = writeTemp(writeMcap(schemas, channels, msgs, "zstd"))
    val df = spark.read.format("mcap").option("schema_name", "sensor_msgs/msg/Imu").load(path)
    assert(df.schema.fieldNames.toSeq ==
      McapTypedRead.MetaFields.map(_.name) ++
        Seq("header_stamp_sec", "header_stamp_nanosec", "header_frame_id", "ax", "ay"))
    val rows = df.orderBy("offset").collect()
    assert(rows.length == 4) // chatter messages skipped
    rows.foreach { r =>
      val i = r.getAs[Long]("sequence").toInt
      assert(r.getAs[String]("topic") == "/imu")
      assert(r.getAs[Int]("header_stamp_sec") == 10 + i)
      assert(r.getAs[Long]("header_stamp_nanosec") == 20L + i)
      assert(r.getAs[String]("header_frame_id") == s"frame$i")
      assert(r.getAs[Double]("ax") == 1.5 * i && r.getAs[Double]("ay") == -2.5 * i)
    }
    // meta-only projection never decodes (chatter payloads would throw)
    assert(df.select("log_time").count() == 4)
    // pushed meta filter pre-decode
    assert(df.filter(col("log_time") >= 103L).count() == 2)
  }

  test("typed read fails loudly on schema drift across files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mcap_drift").toFile
    def write(name: String, text: String): Unit = {
      val sch = Seq(McapSchema(1, "p/msg/T", "ros2msg", text.getBytes("UTF-8")))
      val chs = Seq(McapChannel(1, 1, "/t", "cdr"))
      val b = Ros2Msg.bundle("p/msg/T", text)
      val ms = Seq(McapMessage(1, 0, 1L, 1L, CdrCodec.encode(b,
        if (text.contains("int64")) Seq(1L) else Seq(1))))
      val out = new java.io.FileOutputStream(new java.io.File(dir, name))
      try out.write(writeMcap(sch, chs, ms)) finally out.close()
    }
    write("a.mcap", "int32 x")
    write("b.mcap", "int64 x")
    val e = intercept[Exception] {
      spark.read.format("mcap").option("schema_name", "p/msg/T")
        .load(dir.getAbsolutePath).count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("variants")), msgs(e).mkString(" | "))
  }

  test("McapEtl routes by schema: spine + channels + per-type tables, drift namespaced") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mcap_etl").toFile
    val imuText = "float64 ax\nfloat64 ay"
    val imuText2 = "float64 ax\nfloat64 ay\nfloat64 az" // drifted variant
    val strText = "string data"
    def write(name: String, imuDef: String, n: Int): Unit = {
      val schemas = Seq(McapSchema(1, "sensor_msgs/msg/Imu", "ros2msg", imuDef.getBytes("UTF-8")),
        McapSchema(2, "std_msgs/msg/String", "ros2msg", strText.getBytes("UTF-8")))
      val channels = Seq(McapChannel(1, 1, "/imu", "cdr"), McapChannel(2, 2, "/chatter", "cdr"))
      val ib = Ros2Msg.bundle("sensor_msgs/msg/Imu", imuDef)
      val sb = Ros2Msg.bundle("std_msgs/msg/String", strText)
      val msgs = (0 until n).map { i =>
        if (i % 2 == 0) McapMessage(1, i.toLong, 100L + i, 100L + i, CdrCodec.encode(ib,
          if (imuDef == imuText) Seq(1.0 * i, 2.0 * i) else Seq(1.0 * i, 2.0 * i, 3.0 * i)))
        else McapMessage(2, i.toLong, 100L + i, 100L + i, CdrCodec.encode(sb, Seq(s"m$i")))
      }
      val out = new java.io.FileOutputStream(new java.io.File(dir, name))
      try out.write(writeMcap(schemas, channels, msgs, "zstd")) finally out.close()
    }
    write("a.mcap", imuText, 6)   // 3 imu + 3 chatter
    write("b.mcap", imuText2, 4)  // 2 imu (drifted) + 2 chatter
    val outDir = java.nio.file.Files.createTempDirectory("graft_mcap_etl_out").toString
    val info = McapEtl.run(spark, dir.getAbsolutePath, outDir)
    assert(info.messages == 10 && info.channels == 4)
    // one String table (no drift), TWO namespaced Imu variant tables
    val names = info.tables.keySet
    assert(names.contains("std_msgs_msg_String"), s"$names")
    val imuTables = names.filter(_.startsWith("sensor_msgs_msg_Imu__"))
    assert(imuTables.size == 2, s"$names")
    assert(info.tables("std_msgs_msg_String") == 5)
    assert(imuTables.map(info.tables).toSeq.sorted == Seq(2L, 3L))
    // the drifted variant's table carries its extra column
    val withAz = imuTables.map(t => spark.read.parquet(s"$outDir/$t.parquet"))
      .filter(_.schema.fieldNames.contains("az"))
    assert(withAz.size == 1 && withAz.head.count() == 2)
    // spine keeps every message (incl. both variants) minus the blob
    val spine = spark.read.parquet(s"$outDir/Messages.parquet")
    assert(spine.count() == 10 && !spine.schema.fieldNames.contains("data"))
  }

  test("directory load resolves *.mcap children; file_path pruning plans one file") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mcap_dir").toFile
    val m1 = fixtureMessages(3); val m2 = fixtureMessages(4)
    def writeTo(name: String, msgs: Seq[McapMessage]): Unit = {
      val out = new java.io.FileOutputStream(new java.io.File(dir, name))
      try out.write(writeMcap(fixtureSchemas, fixtureChannels, msgs)) finally out.close()
    }
    writeTo("a.mcap", m1); writeTo("b.mcap", m2)
    val df = spark.read.format("mcap").load(dir.getAbsolutePath)
    assert(df.count() == 7)
    val paths = df.select("file_path").distinct().collect().map(_.getString(0)).sorted
    assert(paths.length == 2 && paths.forall(_.startsWith("file:")))
    // file-level pruning: an exact file_path equality plans ONE file
    import org.apache.spark.sql.sources.EqualTo
    val scan = new McapScan(dir.getAbsolutePath, McapDataSource.SpineSchema,
      Array(EqualTo("file_path", paths.head)), -1)
    assert(scan.planInputPartitions().forall(
      _.asInstanceOf[McapInputPartition].path == paths.head))
    assert(df.filter(col("file_path") === paths.head).count() == 3)
  }
}
