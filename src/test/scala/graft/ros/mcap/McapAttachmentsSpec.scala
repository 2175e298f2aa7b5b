package graft.ros.mcap

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import McapFormat._

/** Attachment (op 0x09) and Metadata (op 0x0C) records: the
  * container's non-message payloads — calibration blobs, URDFs, run
  * descriptions — surfaced as side tables
  * (`option("table", "attachments" | "metadata")`) and writable
  * through the incremental writer. mcap spec: Attachment carries
  * log/create times, name, media_type, length-prefixed data and a
  * CRC; Metadata a named string map; both are top-level records
  * (never inside a chunk) counted by the summary Statistics.
  */
class McapAttachmentsSpec extends SparkTestBase {

  private val strDef = "string data"
  private lazy val bundle = Ros2Msg.bundle("std_msgs/msg/String", strDef)
  private val calib: Array[Byte] =
    (0 until 4096).map(i => (i * 37 % 251).toByte).toArray

  /** A file with 6 messages, 2 attachments and 1 metadata record,
    * written through the engine's own incremental writer.
    */
  private lazy val srcDir: String = {
    val dir = Files.createTempDirectory("mcap_attach")
    val out = new java.io.FileOutputStream(dir.resolve("a.mcap").toFile)
    val w = new McapStreamingWriter(out, "zstd", 1 << 20,
      Map("std_msgs/msg/String" -> Seq(("ros2msg", strDef.getBytes("UTF-8")))))
    w.writeMetadata("run_info",
      Seq("robot_id" -> "r7", "site" -> "plant-3"))
    (0 until 6).foreach { i =>
      w.write("/chat", "std_msgs/msg/String", "", "cdr", i.toLong,
        1000L + i, 1000L + i, CdrCodec.encode(bundle, Seq(s"m-$i")))
    }
    w.writeAttachment(2000L, 1999L, "camera_front.calib",
      "application/octet-stream", calib)
    w.writeAttachment(2001L, 2000L, "lidar.calib", "text/plain",
      "fx=1.0".getBytes("UTF-8"))
    w.finish()
    out.close()
    dir.toString
  }

  test("attachments side table round-trips names, media types and bytes") {
    val at = spark.read.format("mcap").option("table", "attachments").load(srcDir)
    val rows = at.orderBy("name").collect()
    assert(rows.length === 2)
    assert(rows.map(_.getAs[String]("name")).toSeq ===
      Seq("camera_front.calib", "lidar.calib"))
    assert(rows(0).getAs[String]("media_type") === "application/octet-stream")
    assert(rows(0).getAs[Long]("log_time") === 2000L)
    assert(rows(0).getAs[Long]("create_time") === 1999L)
    assert(rows(0).getAs[Long]("size") === calib.length.toLong)
    assert(java.util.Arrays.equals(rows(0).getAs[Array[Byte]]("data"), calib))
    assert(new String(rows(1).getAs[Array[Byte]]("data"), "UTF-8") === "fx=1.0")
    // one partition per attachment: a blob never shares task memory
    assert(at.rdd.getNumPartitions === 2)
  }

  test("metadata side table explodes the named string maps") {
    val md = McapTables.metadata(spark, srcDir)
    val kv = md.collect().map(r => (r.getAs[String]("name"),
      r.getAs[String]("key"), r.getAs[String]("value"))).toSet
    assert(kv === Set(("run_info", "robot_id", "r7"),
      ("run_info", "site", "plant-3")))
  }

  test("side tables work through the SQL catalog; spine read is unchanged") {
    spark.sql("DROP TABLE IF EXISTS graft_attach_sql")
    spark.sql("CREATE TABLE graft_attach_sql USING mcap " +
      s"OPTIONS (path '$srcDir', `table` 'attachments')")
    val n = spark.sql(
      "SELECT count(*) FROM graft_attach_sql WHERE media_type = 'text/plain'")
      .head().getLong(0)
    assert(n === 1L)
    // attachments/metadata never leak into the message spine
    val spine = spark.read.format("mcap").load(srcDir)
    assert(spine.count() === 6)
    assert(spine.select("topic").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("/chat"))
    // and the summary statistics carry the side-record counts (the
    // metadata-agg pushdown keeps answering count(*) from them)
    val idx = McapIO.scanIndex(
      new java.io.File(srcDir).listFiles().filter(_.getName.endsWith(".mcap"))
        .head.getPath)
    assert(idx.attachmentRefs.size === 2)
    assert(idx.metadataRefs.size === 1)
    assert(idx.stats.exists(_.messageCount === 6L))
  }

  test("summary carries AttachmentIndex/MetadataIndex records locating the data records") {
    val f = new java.io.File(srcDir).listFiles()
      .filter(_.getName.endsWith(".mcap")).head
    val b = java.nio.file.Files.readAllBytes(f.toPath)
    // footer record (fixed 29 bytes before trailing magic): summaryStart at +9
    val summaryStart = leLong(b, b.length - 8 - 29 + 9).toInt
    val sum = java.util.Arrays.copyOfRange(b, summaryStart, b.length - 8 - 29)
    def recs(op: Int): Seq[Array[Byte]] =
      chunkRecords(sum).collect { case (o, p) if o == op => p }.toSeq
    def strAt(p: Array[Byte], o: Int): String =
      new String(p, o + 4, leInt(p, o).toInt, "UTF-8")

    val ai = recs(OpAttachmentIndex)
    assert(ai.size === 2)
    val names = ai.map { p =>
      val off = leLong(p, 0).toInt
      val len = leLong(p, 8)
      // the index points at a genuine Attachment record of that length
      assert((b(off) & 0xFF) === OpAttachment)
      assert(leLong(b, off + 1) === len - 9)
      val att = McapFormat.parseAttachment(
        java.util.Arrays.copyOfRange(b, off + 9, off + 9 + (len - 9).toInt))
      assert(att.data.length.toLong === leLong(p, 32), "data_size field")
      assert(att.name === strAt(p, 40), "index name = record name")
      att.name
    }.toSet
    assert(names === Set("camera_front.calib", "lidar.calib"))

    val mi = recs(OpMetadataIndex)
    assert(mi.size === 1)
    val off = leLong(mi.head, 0).toInt
    assert((b(off) & 0xFF) === OpMetadata)
    assert(strAt(mi.head, 16) === "run_info")
  }

  test("a corrupt attachment crc fails loudly, not with silent garbage bytes") {
    val dir = Files.createTempDirectory("mcap_attach_bad")
    val f = dir.resolve("bad.mcap").toFile
    val out = new java.io.FileOutputStream(f)
    val w = new McapStreamingWriter(out, "", 1 << 20)
    w.write("/t", "", "", "cdr", 0L, 1L, 1L, Array[Byte](1, 2, 3))
    w.writeAttachment(10L, 10L, "x.bin", "application/octet-stream",
      Array[Byte](9, 9, 9))
    w.finish()
    out.close()
    // flip one payload byte inside the attachment data
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    val idx = McapIO.scanIndex(f.getPath)
    val (off, _) = idx.attachmentRefs.head
    // payload: 16B times + 4+5 name + 4+24 media_type + 8B len, then data
    val dataOff = (off + 9 + 16 + 4 + "x.bin".length + 4 +
      "application/octet-stream".length + 8).toInt
    bytes(dataOff) = (bytes(dataOff) ^ 0x7F).toByte
    java.nio.file.Files.write(f.toPath, bytes)
    val ex = intercept[Exception] {
      spark.read.format("mcap").option("table", "attachments")
        .load(dir.toString).collect()
    }
    assert(causeMessages(ex).contains("crc"),
      s"expected a crc failure, got: ${causeMessages(ex)}")
  }

  test("table + schema_name options contradict and fail loudly") {
    val ex = intercept[Exception] {
      spark.read.format("mcap").option("table", "attachments")
        .option("schema_name", "std_msgs/msg/String").load(srcDir).collect()
    }
    assert(causeMessages(ex).contains("contradict"))
  }

  test("relational attachments write: df.write round-trips through the side table") {
    import spark.implicits._
    val dir = Files.createTempDirectory("mcap_attach_w").toString
    val frame = Seq(
      ("imu.calib", "bias=0.02"),
      ("camera_rear.calib", "fx=2.5")).toDF("n", "body")
    McapExport.prepareAttachments(frame,
      name = col("n"), data = encode(col("body"), "UTF-8"),
      mediaType = lit("text/plain"), logTimeNs = lit(3000L))
      .write.format("mcap").option("table", "attachments")
      .mode("append").save(dir)
    val at = spark.read.format("mcap").option("table", "attachments").load(dir)
    assert(at.select("name", "media_type", "log_time").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet ===
      Set(("imu.calib", "text/plain", 3000L),
        ("camera_rear.calib", "text/plain", 3000L)))
    assert(at.filter(col("name") === "imu.calib").select("data").collect()
      .map(r => new String(r.getAs[Array[Byte]](0), "UTF-8")).toSeq ===
      Seq("bias=0.02"))
    // append accumulates — the dimension grows, nothing is replaced
    McapExport.prepareAttachments(Seq(("urdf", "xml")).toDF("n", "body"),
      name = col("n"), data = encode(col("body"), "UTF-8"))
      .write.format("mcap").option("table", "attachments")
      .mode("append").save(dir)
    assert(spark.read.format("mcap").option("table", "attachments").load(dir)
      .count() === 3)
    // a directory shared with message files stays consistent: the
    // message spine ignores attachment-only files
    assert(spark.read.format("mcap").load(dir).count() === 0)
    // overwrite is refused: attachments are an accumulating dimension
    val ex = intercept[Exception] {
      McapExport.prepareAttachments(Seq(("x", "y")).toDF("n", "body"),
        name = col("n"), data = encode(col("body"), "UTF-8"))
        .write.format("mcap").option("table", "attachments")
        .mode("overwrite").save(dir)
    }
    assert(causeMessages(ex).toLowerCase.contains("truncate") ||
      causeMessages(ex).toLowerCase.contains("overwrite"))
  }
}
