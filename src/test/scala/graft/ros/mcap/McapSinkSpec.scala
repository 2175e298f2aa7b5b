package graft.ros.mcap

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import McapFormat._

/** The mcap export sink: `df.write.format("mcap")` — the
  * `rosbag filter` query class (read archive → relational transform →
  * re-emit a playable container), one incrementally-written file per
  * partition.
  */
class McapSinkSpec extends SparkTestBase {

  private val strDef = "string data"
  private lazy val bundle = Ros2Msg.bundle("std_msgs/msg/String", strDef)

  private val schemas = Seq(
    McapSchema(1, "std_msgs/msg/String", "ros2msg", strDef.getBytes("UTF-8")))
  private val channels = Seq(
    McapChannel(1, 1, "/chat", "cdr"), McapChannel(2, 1, "/log", "cdr"))

  private def msgs(n: Int): Seq[McapMessage] =
    (0 until n).map(i => McapMessage(
      channelId = 1 + (i % 2), sequence = i.toLong,
      logTime = 1700000000000000000L + i * 1000L,
      publishTime = 1700000000000000000L + i * 1000L,
      data = CdrCodec.encode(bundle, Seq(s"m-$i"))))

  private def sourceDir(n: Int): String = {
    val dir = Files.createTempDirectory("mcap_sink_src")
    Files.write(dir.resolve("in.mcap"), writeMcap(schemas, channels, msgs(n), "zstd"))
    dir.toString
  }

  private val spineCols = Seq("topic", "schema_name", "log_time",
    "publish_time", "sequence", "data")

  test("filter-and-rewrite round-trips: exported rows equal the filtered source rows") {
    val src = sourceDir(20)
    val out = Files.createTempDirectory("mcap_sink_out").toString + "/export"
    val filtered = spark.read.format("mcap").load(src)
      .filter(col("topic") === "/chat")
    filtered.repartition(3).write.format("mcap").mode("append").save(out)

    // layout: one file per non-empty partition, no in-progress debris
    // (the local FS adds .crc sidecars — exclude dot-names, then assert
    // nothing in-progress survived the task commits)
    val all = new java.io.File(out).listFiles().toSeq.map(_.getName)
    assert(!all.exists(_.contains("inprogress")), s"debris in $all")
    val files = all.filterNot(_.startsWith("."))
    assert(files.forall(f => f.endsWith(".mcap") && f.startsWith("part-")))
    assert(files.size <= 3 && files.nonEmpty)

    val back = spark.read.format("mcap").load(out)
    val a = filtered.select(spineCols.map(col): _*)
    val b = back.select(spineCols.map(col): _*)
    assert(b.count() === 10)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("schema_defs_from embeds definitions: the export decodes under the typed reader") {
    val src = sourceDir(8)
    val out = Files.createTempDirectory("mcap_sink_typed").toString + "/export"
    spark.read.format("mcap").load(src)
      .write.format("mcap").mode("append")
      .option("schema_defs_from", src).save(out)
    val typed = spark.read.format("mcap")
      .option("schema_name", "std_msgs/msg/String").load(out)
    val vals = typed.select("data_field").collect().map(_.getString(0)).toSet
    assert(vals === (0 until 8).map(i => s"m-$i").toSet)
  }

  test("empty schema_name exports as schema_id 0, never an empty-named Schema record") {
    // the MCAP spec requires Schema.name non-empty and reserves
    // schema_id 0 for "no schema" — strict linters reject the former
    val out = Files.createTempDirectory("mcap_sink_schema0").toString + "/export"
    val df = spark.range(4).select(
      concat(lit("raw-"), col("id").cast("string")).cast("binary").as("payload"),
      (lit(1700000000000000000L) + col("id")).as("ts"))
    McapExport.prepare(df, topic = lit("/blob"), logTimeNs = col("ts"),
      data = col("payload")).coalesce(1)
      .write.format("mcap").mode("append").save(out)
    val f = new java.io.File(out).listFiles()
      .filter(x => x.getName.endsWith(".mcap") && !x.getName.startsWith(".")).head
    val idx = McapIO.scanIndex(f.getPath)
    assert(idx.schemas.isEmpty, "no Schema record may carry an empty name")
    assert(idx.channels.values.forall(_.schemaId == 0))
    val back = spark.read.format("mcap").load(out)
    assert(back.count() === 4)
    assert(back.select("schema_name").distinct().collect()
      .map(_.getString(0)).toSeq === Seq(""))
  }

  private def profileOf(path: String): String =
    McapFormat.headerOf(
      java.nio.file.Files.readAllBytes(new java.io.File(path).toPath))._1

  test("profile is a write option: ros2 by default, '' = the spec's no-profile") {
    val src = sourceDir(4)
    val outDefault = Files.createTempDirectory("mcap_sink_prof1").toString + "/export"
    val outNone = Files.createTempDirectory("mcap_sink_prof2").toString + "/export"
    val df = spark.read.format("mcap").load(src).coalesce(1)
    df.write.format("mcap").mode("append").save(outDefault)
    df.write.format("mcap").mode("append").option("profile", "").save(outNone)
    def firstMcap(o: String): String = new java.io.File(o).listFiles()
      .filter(x => x.getName.endsWith(".mcap") && !x.getName.startsWith("."))
      .head.getPath
    assert(profileOf(firstMcap(outDefault)) === "ros2")
    assert(profileOf(firstMcap(outNone)) === "")
  }

  test("mode overwrite replaces previous files; metadata pushdown reads the new summary") {
    val src = sourceDir(12)
    val out = Files.createTempDirectory("mcap_sink_ow").toString + "/export"
    val df = spark.read.format("mcap").load(src)
    df.write.format("mcap").mode("append").save(out)
    assert(spark.read.format("mcap").load(out).count() === 12)
    df.filter(col("sequence") < 5).coalesce(1)
      .write.format("mcap").mode("overwrite").save(out)
    val back = spark.read.format("mcap").load(out)
    // count(*) answers from the Statistics record the sink wrote
    assert(back.count() === 5)
    val perTopic = back.groupBy("topic").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perTopic === Map("/chat" -> 3L, "/log" -> 2L))
  }

  test("small chunk_bytes yields multiple chunks; index and stats stay consistent") {
    val src = sourceDir(30)
    val out = Files.createTempDirectory("mcap_sink_chunks").toString + "/export"
    spark.read.format("mcap").load(src).coalesce(1)
      .write.format("mcap").mode("append")
      .option("chunk_bytes", "256").option("compression", "lz4").save(out)
    val f = new java.io.File(out).listFiles().filter(_.getName.endsWith(".mcap")).head
    val idx = McapIO.scanIndex(f.getPath)
    assert(idx.chunks.size > 1, s"expected multiple chunks, got ${idx.chunks.size}")
    assert(idx.stats.exists(_.messageCount === 30L))
    assert(spark.read.format("mcap").load(out).count() === 30)
    // time-range pruning works against the sink's chunk index
    val half = spark.read.format("mcap").load(out)
      .filter(col("log_time") < lit(1700000000000000000L + 15 * 1000L))
    assert(half.count() === 15)
  }

  test("MessageIndex records follow each chunk; ChunkIndex references them") {
    import McapFormat._
    val src = sourceDir(20)
    val out = Files.createTempDirectory("mcap_sink_mi").toString + "/export"
    spark.read.format("mcap").load(src).coalesce(1)
      .write.format("mcap").mode("append")
      .option("chunk_bytes", "256").option("compression", "none").save(out)
    val f = new java.io.File(out).listFiles()
      .filter(x => x.getName.endsWith(".mcap") && !x.getName.startsWith(".")).head
    val bytes = Files.readAllBytes(f.toPath)
    def leLongAt(o: Int) = java.nio.ByteBuffer.wrap(bytes, o, 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
    def leShortAt(o: Int) = java.nio.ByteBuffer.wrap(bytes, o, 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getShort & 0xFFFF
    def leIntAt(o: Int) = java.nio.ByteBuffer.wrap(bytes, o, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt

    // walk records: collect chunk payload offsets + every MessageIndex
    var pos = 8L // magic
    var chunks = Vector.empty[(Long, Long)] // (record offset, records-field offset)
    var miAt = Map.empty[Long, (Int, Seq[(Long, Long)])] // file offset -> (chan, entries)
    var chunkIdxMaps = Vector.empty[Map[Int, Long]]
    var indexed = 0L
    while (pos + 9 <= bytes.length - 8) {
      val op = bytes(pos.toInt) & 0xFF
      val len = leLongAt(pos.toInt + 1)
      val body = pos.toInt + 9
      op match {
        case OpChunk =>
          // uncompressed-records field starts after times(16) + size(8)
          // + crc(4) + compression string(4 + n) + records byteLen(8)
          val compLen = leIntAt(body + 28)
          chunks :+= ((pos, (body + 28 + 4 + compLen + 8).toLong))
        case OpMessageIndex =>
          val chan = leShortAt(body)
          val n = leIntAt(body + 2) / 16
          val entries = (0 until n).map { i =>
            (leLongAt(body + 6 + i * 16), leLongAt(body + 6 + i * 16 + 8))
          }
          miAt += pos -> ((chan, entries))
          indexed += n
        case OpChunkIndex =>
          val mapLen = leIntAt(body + 32)
          chunkIdxMaps :+= (0 until mapLen / 10).map { i =>
            leShortAt(body + 36 + i * 10) -> leLongAt(body + 36 + i * 10 + 2)
          }.toMap
        case _ => ()
      }
      pos += 9 + len
    }
    assert(chunks.size > 1 && indexed === 20L)
    // every ChunkIndex map points at real MessageIndex records whose
    // channel matches the map key
    assert(chunkIdxMaps.size === chunks.size)
    chunkIdxMaps.foreach { m =>
      assert(m.nonEmpty)
      m.foreach { case (chan, off) =>
        assert(miAt.get(off).exists(_._1 == chan),
          s"ChunkIndex offset $off must be channel $chan's MessageIndex")
      }
    }
    // entries point at Message records inside the uncompressed chunk,
    // in chronological order
    miAt.values.foreach { case (_, entries) =>
      assert(entries.map(_._1) === entries.map(_._1).sorted)
    }
    chunks.foreach { case (chunkPos, recordsAt) =>
      // the MessageIndexes directly following this chunk describe it
      miAt.filter { case (o, _) => o > chunkPos &&
        !chunks.exists(c => c._1 > chunkPos && c._1 < o) }
        .values.foreach { case (chan, entries) =>
          entries.foreach { case (_, off) =>
            val abs = (recordsAt + off).toInt
            assert((bytes(abs) & 0xFF) === OpMessage,
              s"MessageIndex offset $off must land on a Message record")
            assert(leShortAt(abs + 9) === chan,
              "the Message record's channel must match the index's")
          }
        }
    }
  }

  test("McapExport.prepare conforms an arbitrary frame; events round-trip as a container") {
    val dir = "/root/testdata/sf0.001"
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .limit(200)
      .select(col("event_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"),
        col("props"))
    val prepared = McapExport.prepare(ev.withColumn(
        "payload", encode(col("props").cast("string"), "UTF-8")),
      topic = concat(lit("/"), col("event_type")),
      logTimeNs = col("ts_us") * lit(1000L),
      data = col("payload"),
      schemaName = lit("graft/Props"),
      sequence = col("event_id"))
    val out = Files.createTempDirectory("mcap_sink_prep").toString + "/export"
    prepared.repartition(2).write.format("mcap").mode("append").save(out)
    val back = spark.read.format("mcap").load(out)
    assert(back.count() === 200)
    // topics = event types; payload bytes survive
    val types = ev.select("event_type").distinct().collect().map(_.getString(0)).toSet
    val topics = back.select("topic").distinct().collect().map(_.getString(0)).toSet
    assert(topics === types.map("/" + _))
    val aSum = ev.agg(sum(length(col("props").cast("string")))).head().getLong(0)
    val bSum = back.agg(sum(length(col("data")))).head().getLong(0)
    assert(aSum === bSum)
  }

  test("a sequence beyond uint32 fails loudly instead of silently wrapping") {
    val out = Files.createTempDirectory("mcap_sink_seq").toString + "/export"
    val bad = McapExport.prepare(
      spark.range(3).toDF("event_id"),
      topic = lit("/t"), logTimeNs = col("event_id"), data = lit(Array[Byte](1)),
      sequence = col("event_id") + lit(4294967295L))
    val e = intercept[Exception] {
      bad.coalesce(1).write.format("mcap").mode("append").save(out)
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: chain(t.getCause)
    assert(chain(e).exists(m => m != null && m.contains("uint32")))
  }

  test("a null required column fails loudly with the column name") {
    val out = Files.createTempDirectory("mcap_sink_null").toString + "/export"
    val bad = McapExport.prepare(
      spark.range(3).toDF("event_id"),
      topic = lit("/t"), logTimeNs = col("event_id"), data = lit(Array[Byte](1)))
      // sabotage: nullable topic with a real null
      .withColumn("topic",
        when(col("log_time") === 1L, lit(null: String)).otherwise(lit("/t")))
    val e = intercept[Exception] {
      bad.coalesce(1).write.format("mcap").mode("append").save(out)
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: chain(t.getCause)
    assert(chain(e).exists(m => m != null && m.contains("topic")))
  }
}
