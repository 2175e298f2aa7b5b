package graft.ros.bag

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import BagFormat._

/** The rosbag1 export sink: `df.write.format("rosbag")` — the classic
  * `rosbag filter` re-emit, one locally-built + uploaded bag per
  * partition with a back-patched header index.
  */
class BagSinkSpec extends SparkTestBase {

  private val strDef = "string data"
  private val strName = "std_msgs/String"
  private lazy val bundle = graft.ros.MsgDefParser.parse(strName, strDef)
  private val strMd5 = "992ce8a1687cec8c8bd883ec73ca41d1"

  private def msgBytes(s: String): Array[Byte] =
    graft.ros.RosSchemaMapper.encode(bundle, Seq(s))

  private def sourceDir(n: Int): String = {
    val dir = Files.createTempDirectory("bag_sink_src")
    val conns = Seq(
      BagConnection(0, "/chat", strName, strMd5, strDef, ""),
      BagConnection(1, "/log", strName, strMd5, strDef, ""))
    val msgs = (0 until n).map(i => WriteMessage(i % 2, 1700000000 + i,
      i * 1000, msgBytes(s"m-$i")))
    Files.write(dir.resolve("in.bag"), writeBag(conns, msgs,
      messagesPerChunk = 4, compression = "bz2"))
    dir.toString
  }

  private val spineCols =
    Seq("topic", "datatype", "time_sec", "time_nsec", "data")

  test("filter-and-rewrite round-trips: exported rows equal the filtered source rows") {
    val src = sourceDir(20)
    val out = Files.createTempDirectory("bag_sink_out").toString + "/export"
    val filtered = spark.read.format("rosbag").load(src)
      .filter(col("topic") === "/chat")
    filtered.repartition(3).write.format("rosbag").mode("append").save(out)

    val all = new java.io.File(out).listFiles().toSeq.map(_.getName)
    assert(!all.exists(_.contains("inprogress")), s"debris in $all")
    val files = all.filterNot(_.startsWith("."))
    assert(files.forall(f => f.endsWith(".bag") && f.startsWith("part-")))
    assert(files.size <= 3 && files.nonEmpty)

    val back = spark.read.format("rosbag").load(out)
    val a = filtered.select(spineCols.map(col): _*)
    val b = back.select(spineCols.map(col): _*)
    assert(b.count() === 10)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("the export's header index is patched: index_pos lands on the trailing section") {
    val src = sourceDir(12)
    val out = Files.createTempDirectory("bag_sink_hdr").toString + "/export"
    spark.read.format("rosbag").load(src).coalesce(1)
      .write.format("rosbag").mode("append")
      .option("chunk_bytes", "128").option("compression", "none").save(out)
    val f = new java.io.File(out).listFiles()
      .filter(f => f.getName.endsWith(".bag") && !f.getName.startsWith(".")).head
    val bytes = Files.readAllBytes(f.toPath)
    def le32(o: Int) = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8) |
      ((bytes(o + 2) & 0xFF) << 16) | ((bytes(o + 3) & 0xFF) << 24)
    val hdrLen = le32(Magic.length)
    val hdr = parseHeader(java.util.Arrays.copyOfRange(bytes,
      Magic.length + 4, Magic.length + 4 + hdrLen))
    assert(hdr.contains("index_pos") && hdr.contains("chunk_count"))
    val rec = new Record(hdr, Array.emptyByteArray, 0L)
    val indexPos = rec.u64("index_pos")
    assert(indexPos > 4096L && indexPos < bytes.length,
      s"index_pos $indexPos out of range")
    assert(rec.u32("conn_count") === 2)
    assert(rec.u32("chunk_count") > 1, "small chunk_bytes must yield several chunks")
    // the record AT index_pos is a connection record (the index section)
    val idx = RosbagIO.scanIndex(f.getPath)
    assert(idx.chunks.size === rec.u32("chunk_count"))
    // chunk-info metadata agrees with the data: the "rosbag info"
    // metadata-agg class works against the sink's own output
    val counts = spark.read.format("rosbag").load(f.getPath)
      .groupBy("topic").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("/chat" -> 6L, "/log" -> 6L))
  }

  test("prepare splits nanoseconds exactly (long arithmetic, not double division)") {
    import spark.implicits._
    // 1699999999999999999 ns: double division rounds the quotient to
    // 1700000000.0, landing time_sec a full second late; the exact
    // split must give (1699999999, 999999999)
    val df = Seq((1699999999999999999L, "x")).toDF("t", "v")
    val prepared = BagExport.prepare(df, topic = lit("/t"),
      timeNs = col("t"), data = encode(col("v"), "UTF-8"))
    val r = prepared.select("time_sec", "time_nsec").head()
    assert(r.getInt(0) === 1699999999)
    assert(r.getInt(1) === 999999999)
  }

  test("each chunk is followed by the IndexData records ROS readers require") {
    val src = sourceDir(20)
    val out = Files.createTempDirectory("bag_sink_idx").toString + "/export"
    spark.read.format("rosbag").load(src).coalesce(1)
      .write.format("rosbag").mode("append")
      .option("chunk_bytes", "160").option("compression", "none").save(out)
    val f = new java.io.File(out).listFiles()
      .filter(f => f.getName.endsWith(".bag") && !f.getName.startsWith(".")).head
    val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      new java.io.FileInputStream(f)))
    try {
      in.skipBytes(Magic.length)
      var chunks = 0
      var indexedMessages = 0L
      // walk top-level records: every OpChunk must be directly followed
      // by OpIndexData records whose (conn, offset) entries point at
      // exactly the chunk body's MessageData records
      var pending: Map[Int, Seq[Int]] = Map.empty // conn -> expected offsets
      var rec = readRecord(in)
      while (rec.isDefined) {
        val r = rec.get
        r.op match {
          case OpChunk =>
            assert(pending.isEmpty, "chunk not fully covered by IndexData")
            chunks += 1
            // offset-tracked walk of the uncompressed chunk body
            val exp = scala.collection.mutable.Map[Int, Vector[Int]]()
            val body = r.data
            var pos = 0
            while (pos < body.length) {
              val bb = java.nio.ByteBuffer.wrap(body, pos, 4)
                .order(java.nio.ByteOrder.LITTLE_ENDIAN)
              val hlen = bb.getInt()
              val h = parseHeader(
                java.util.Arrays.copyOfRange(body, pos + 4, pos + 4 + hlen))
              val dlenOff = pos + 4 + hlen
              val dlen = java.nio.ByteBuffer.wrap(body, dlenOff, 4)
                .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt()
              if (h("op")(0) == OpMessageData) {
                val inner = new Record(h, Array.emptyByteArray, 0L)
                val conn = inner.u32("conn")
                exp(conn) = exp.getOrElse(conn, Vector.empty) :+ pos
              }
              pos = dlenOff + 4 + dlen
            }
            pending = exp.toMap
          case OpIndexData =>
            val conn = r.u32("conn")
            val n = r.u32("count")
            assert(r.data.length === n * 12, "IndexData entries are 12 bytes")
            val offsets = (0 until n).map { i =>
              java.nio.ByteBuffer.wrap(r.data, i * 12 + 8, 4)
                .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt()
            }
            assert(pending.get(conn).map(_.toSeq) === Some(offsets),
              s"IndexData offsets for conn $conn must match the chunk's messages")
            indexedMessages += n
            pending -= conn
          case _ => ()
        }
        rec = readRecord(in)
      }
      assert(pending.isEmpty)
      assert(chunks > 1, "small chunk_bytes must yield several chunks")
      assert(indexedMessages === 20L)
    } finally in.close()
  }

  test("IndexData entries are time-sorted even when rows arrive out of order") {
    val local = java.io.File.createTempFile("bag_idx_sort", ".bag")
    val w = new BagStreamingWriter(local, "none", 1 << 20)
    // one chunk, deliberately unsorted receipt times
    Seq(105, 101, 103, 102).foreach(s =>
      w.write("/t", "x/Y", s, 0, Array[Byte](1)))
    w.finish()
    val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      new java.io.FileInputStream(local)))
    try {
      in.skipBytes(Magic.length)
      var times: Seq[Int] = Nil
      var rec = readRecord(in)
      while (rec.isDefined) {
        val r = rec.get
        if (r.op == OpIndexData) {
          val n = r.u32("count")
          times = (0 until n).map { i =>
            java.nio.ByteBuffer.wrap(r.data, i * 12, 4)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt()
          }
        }
        rec = readRecord(in)
      }
      assert(times === Seq(101, 102, 103, 105))
    } finally { in.close(); local.delete(); () }
  }

  test("lz4 chunks interop across frame implementations (roslz4 = standard LZ4 frame)") {
    // the codec moved to lz4-java (JNI) for speed; the wire format must
    // stay the standard LZ4 frame that roslz4 and commons-compress
    // speak — cross-decode both directions to pin it
    val body = Array.tabulate[Byte](50000)(i => (i * 31 % 251).toByte)
    val ours = BagFormat.compressChunk("lz4", body)
    val ccIn = new org.apache.commons.compress.compressors.lz4
      .FramedLZ4CompressorInputStream(new java.io.ByteArrayInputStream(ours))
    val viaCc = org.apache.commons.io.IOUtils.toByteArray(ccIn)
    assert(java.util.Arrays.equals(viaCc, body),
      "commons-compress must decode lz4-java frames")
    val ccOut = new java.io.ByteArrayOutputStream()
    val cs = new org.apache.commons.compress.compressors.lz4
      .FramedLZ4CompressorOutputStream(ccOut)
    cs.write(body); cs.close()
    val back = BagFormat.decompressChunk("lz4", ccOut.toByteArray, body.length)
    assert(java.util.Arrays.equals(back, body),
      "our reader must decode commons-compress (roslz4-equivalent) frames")

    // block-LINKED frames (FLG bit 5 clear — `lz4 -BD`-style foreign
    // re-compressions; lz4-java refuses them) must route to the
    // pure-Java fallback and still decode
    val linkedOut = new java.io.ByteArrayOutputStream()
    val lcs = new org.apache.commons.compress.compressors.lz4
      .FramedLZ4CompressorOutputStream(linkedOut,
        new org.apache.commons.compress.compressors.lz4
          .FramedLZ4CompressorOutputStream.Parameters(
            org.apache.commons.compress.compressors.lz4
              .FramedLZ4CompressorOutputStream.BlockSize.K64,
            true, false, true)) // content checksum, no block checksum, DEPENDENT
    lcs.write(body); lcs.close()
    val linked = linkedOut.toByteArray
    assert((linked(4) & 0x20) === 0, "fixture must be a block-linked frame")
    val backLinked = BagFormat.decompressChunk("lz4", linked, body.length)
    assert(java.util.Arrays.equals(backLinked, body),
      "block-linked frames must decode via the fallback path")
  }

  test("conn_defs_from embeds definitions: the export decodes under the typed reader") {
    val src = sourceDir(8)
    val out = Files.createTempDirectory("bag_sink_typed").toString + "/export"
    spark.read.format("rosbag").load(src)
      .write.format("rosbag").mode("append")
      .option("conn_defs_from", src).save(out)
    val typed = spark.read.format("rosbag")
      .option("datatype", strName).load(out)
    val vals = typed.select("data_field").collect().map(_.getString(0)).toSet
    assert(vals === (0 until 8).map(i => s"m-$i").toSet)
  }

  test("task abort closes the scratch writer: no fd leaked to the deleted temp file") {
    val src = sourceDir(8)
    val out = Files.createTempDirectory("bag_sink_abortfd").toString + "/export"
    // rows 0..5 write fine (the scratch writer opens), then a null
    // topic fails the task -> abort must CLOSE the scratch stream
    // before deleting the file, or the executor keeps an fd to a
    // deleted file until GC (slow fd exhaustion under speculation)
    val poisoned = spark.read.format("rosbag").load(src)
      .withColumn("topic",
        when(col("time_sec") >= lit(1700000006), lit(null).cast("string"))
          .otherwise(col("topic")))
    intercept[Exception] {
      poisoned.coalesce(1).write.format("rosbag").mode("append").save(out)
    }
    val leaked = new java.io.File("/proc/self/fd").listFiles().toSeq
      .flatMap(f => scala.util.Try(
        java.nio.file.Files.readSymbolicLink(f.toPath).toString).toOption)
      .filter(_.contains("graft_bag_sink_"))
    assert(leaked.isEmpty, s"aborted bag task leaked scratch fds: $leaked")
  }

  test("mode overwrite replaces previous files") {
    val src = sourceDir(12)
    val out = Files.createTempDirectory("bag_sink_ow").toString + "/export"
    val df = spark.read.format("rosbag").load(src)
    df.write.format("rosbag").mode("append").save(out)
    assert(spark.read.format("rosbag").load(out).count() === 12)
    df.filter(col("time_sec") < 1700000005).coalesce(1)
      .write.format("rosbag").mode("overwrite").save(out)
    assert(spark.read.format("rosbag").load(out).count() === 5)
  }

  test("BagExport.prepare conforms an arbitrary frame; events round-trip as a bag") {
    val dir = "/root/testdata/sf0.001"
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .limit(150)
      .select(col("event_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"), col("props"))
    val prepared = BagExport.prepare(
      ev.withColumn("payload", encode(col("props"), "UTF-8")),
      topic = concat(lit("/"), col("event_type")),
      timeNs = col("ts_us") * lit(1000L),
      data = col("payload"))
    val out = Files.createTempDirectory("bag_sink_prep").toString + "/export"
    prepared.repartition(2).write.format("rosbag").mode("append").save(out)
    val back = spark.read.format("rosbag").load(out)
    assert(back.count() === 150)
    val types = ev.select("event_type").distinct().collect().map(_.getString(0)).toSet
    val topics = back.select("topic").distinct().collect().map(_.getString(0)).toSet
    assert(topics === types.map("/" + _))
    val aSum = ev.agg(sum(length(col("props")))).head().getLong(0)
    val bSum = back.agg(sum(length(col("data")))).head().getLong(0)
    assert(aSum === bSum)
  }
}
