package graft.ros.db3

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.ros.mcap.{CdrCodec, Ros2Msg}

/** The db3 export sink: `df.write.format("db3")` — rolled sqlite files
  * (one per rows/bytes budget per partition), engine b-tree writer.
  */
class Db3SinkSpec extends SparkTestBase {

  private val strDef = "string data"
  private val strName = "std_msgs/msg/String"
  private lazy val bundle = Ros2Msg.bundle(strName, strDef)

  private def sourceDir(n: Int): String = {
    val dir = Files.createTempDirectory("db3_sink_src")
    val db = SqliteFormat.writeDb(Seq(
      ("topics", "CREATE TABLE topics(id INTEGER PRIMARY KEY, name TEXT, type TEXT, serialization_format TEXT, offered_qos_profiles TEXT)",
        Seq(Seq[Any](null, "/chat", strName, "cdr", ""),
          Seq[Any](null, "/log", strName, "cdr", ""))),
      ("messages", "CREATE TABLE messages(id INTEGER PRIMARY KEY, topic_id INTEGER, timestamp INTEGER, data BLOB)",
        (0 until n).map(i => Seq[Any](null, (i % 2) + 1L,
          1700000000000000000L + i * 1000L,
          CdrCodec.encode(bundle, Seq(s"m-$i"))))),
      ("message_definitions", "CREATE TABLE message_definitions(id INTEGER PRIMARY KEY, topic_type TEXT, encoding TEXT, encoded_message_definition TEXT, type_hash TEXT)",
        Seq(Seq[Any](null, strName, "ros2msg", strDef, "")))))
    Files.write(dir.resolve("in.db3"), db)
    dir.toString
  }

  private val spineCols =
    Seq("topic", "type", "serialization_format", "timestamp", "data")

  test("filter-and-rewrite round-trips: exported rows equal the filtered source rows") {
    val src = sourceDir(20)
    val out = Files.createTempDirectory("db3_sink_out").toString + "/export"
    val filtered = spark.read.format("db3").load(src)
      .filter(col("topic") === "/chat")
    filtered.repartition(2).write.format("db3").mode("append").save(out)

    val all = new java.io.File(out).listFiles().toSeq.map(_.getName)
    assert(!all.exists(_.contains("inprogress")), s"debris in $all")
    val files = all.filterNot(_.startsWith("."))
    assert(files.forall(f =>
      (f.endsWith(".db3") && f.startsWith("part-")) || f == "metadata.yaml"))

    val back = spark.read.format("db3").load(out)
    val a = filtered.select(spineCols.map(col): _*)
    val b = back.select(spineCols.map(col): _*)
    assert(b.count() === 10)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("rows_per_file rolls multiple genuine sqlite files; grouped metadata agg works") {
    val src = sourceDir(30)
    val out = Files.createTempDirectory("db3_sink_roll").toString + "/export"
    spark.read.format("db3").load(src).coalesce(1)
      .write.format("db3").mode("append")
      .option("rows_per_file", "8").save(out)
    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.endsWith(".db3") && !f.getName.startsWith("."))
    assert(files.length === 4, s"30 rows / 8 per file -> 4 files, got ${files.length}")
    // each rolled file is a well-formed sqlite db under the engine reader
    files.foreach { f =>
      assert(Db3IO.scanMeta(f.getPath).topics.nonEmpty)
    }
    val back = spark.read.format("db3").load(out)
    assert(back.count() === 30)
    // the q83 grouped-info class runs against the sink's own output
    val grouped = back.groupBy("topic").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(grouped === Map("/chat" -> 15L, "/log" -> 15L))
  }

  test("schema_defs_from embeds message_definitions: typed read decodes the export") {
    val src = sourceDir(8)
    val out = Files.createTempDirectory("db3_sink_typed").toString + "/export"
    spark.read.format("db3").load(src)
      .write.format("db3").mode("append")
      .option("schema_defs_from", src).save(out)
    val typed = spark.read.format("db3")
      .option("path", out).option("schema_name", strName).load()
    val vals = typed.select("data_field").collect().map(_.getString(0)).toSet
    assert(vals === (0 until 8).map(i => s"m-$i").toSet)
  }

  test("mode overwrite replaces previous files") {
    val src = sourceDir(12)
    val out = Files.createTempDirectory("db3_sink_ow").toString + "/export"
    val df = spark.read.format("db3").load(src)
    df.write.format("db3").mode("append").save(out)
    assert(spark.read.format("db3").load(out).count() === 12)
    df.filter(col("timestamp") < 1700000000000005000L).coalesce(1)
      .write.format("db3").mode("overwrite").save(out)
    assert(spark.read.format("db3").load(out).count() === 5)
  }

  test("metadata.yaml makes the export a rosbag2 bag dir: counts, times, append merge, overwrite reset") {
    val src = sourceDir(12) // ts = 1700000000000000000 + i*1000, i in 0..11
    val out = Files.createTempDirectory("db3_sink_meta").toString + "/export"
    val df = spark.read.format("db3").load(src)
    df.write.format("db3").mode("append").save(out)

    def yaml(): String = new String(
      Files.readAllBytes(new java.io.File(out, "metadata.yaml").toPath),
      java.nio.charset.StandardCharsets.UTF_8)
    def db3Names(): Set[String] = new java.io.File(out).listFiles()
      .filter(f => f.getName.endsWith(".db3") && !f.getName.startsWith("."))
      .map(_.getName).toSet

    val y1 = yaml()
    assert(y1.contains("storage_identifier: sqlite3"))
    assert(y1.contains("message_count: 12"))
    assert(y1.contains("nanoseconds_since_epoch: 1700000000000000000"))
    assert(y1.contains("nanoseconds: 11000")) // duration = max - min
    db3Names().foreach(n => assert(y1.contains("\"" + n + "\"")))
    // per-topic blocks round-trip through the parser
    val (paths1, st1) = Db3BagMetadata.parse(y1)
    assert(paths1.toSet === db3Names())
    assert(st1.counts === Map(("/chat", strName, "cdr") -> 6L,
      ("/log", strName, "cdr") -> 6L))

    // append merges: 6 more /chat rows extend counts, not replace them
    df.filter(col("topic") === "/chat").coalesce(1)
      .write.format("db3").mode("append").save(out)
    val (paths2, st2) = Db3BagMetadata.parse(yaml())
    assert(paths2.toSet === db3Names())
    assert(st2.counts(("/chat", strName, "cdr")) === 12L)
    assert(st2.counts(("/log", strName, "cdr")) === 6L)

    // overwrite resets to the new generation only
    df.filter(col("topic") === "/log").coalesce(1)
      .write.format("db3").mode("overwrite").save(out)
    val (paths3, st3) = Db3BagMetadata.parse(yaml())
    assert(paths3.toSet === db3Names())
    assert(st3.counts === Map(("/log", strName, "cdr") -> 6L))
  }

  test("compression_format zstd: file and message modes round-trip through the reader") {
    val src = sourceDir(12)
    val df = spark.read.format("db3").load(src)

    // FILE mode: rosbag2's <name>.db3.zstd — whole db as one frame
    val outF = Files.createTempDirectory("db3_sink_zf").toString + "/export"
    df.coalesce(1).write.format("db3").mode("append")
      .option("compression_format", "zstd").option("compression_mode", "file")
      .option("rows_per_file", "5").save(outF)
    val filesF = new java.io.File(outF).listFiles()
      .filter(f => !f.getName.startsWith(".") && f.getName != "metadata.yaml")
    assert(filesF.nonEmpty && filesF.forall(_.getName.endsWith(".db3.zstd")),
      filesF.map(_.getName).toSeq.toString)
    val backF = spark.read.format("db3").load(outF)
    assert(backF.count() === 12)
    val a = df.select(spineCols.map(col): _*)
    val bF = backF.select(spineCols.map(col): _*)
    assert(a.exceptAll(bF).isEmpty && bF.exceptAll(a).isEmpty)
    val yamlF = new String(Files.readAllBytes(
      new java.io.File(outF, "metadata.yaml").toPath), "UTF-8")
    assert(yamlF.contains("compression_format: \"zstd\"")
      && yamlF.contains("compression_mode: \"FILE\""), yamlF)

    // MESSAGE mode: each payload its own zstd frame, sniffed at read
    val outM = Files.createTempDirectory("db3_sink_zm").toString + "/export"
    df.coalesce(1).write.format("db3").mode("append")
      .option("compression_format", "zstd").option("compression_mode", "message")
      .save(outM)
    val backM = spark.read.format("db3").load(outM)
    val bM = backM.select(spineCols.map(col): _*)
    assert(a.exceptAll(bM).isEmpty && bM.exceptAll(a).isEmpty,
      "message-mode payloads must inflate transparently at read")
    val yamlM = new String(Files.readAllBytes(
      new java.io.File(outM, "metadata.yaml").toPath), "UTF-8")
    assert(yamlM.contains("compression_mode: \"MESSAGE\""), yamlM)
  }

  test("compression guards: mode-without-format and mixed-compression appends fail loudly") {
    val src = sourceDir(6)
    val df = spark.read.format("db3").load(src)
    // rosbag2 rejects --compression-mode without --compression-format
    val e1 = intercept[Exception] {
      df.write.format("db3").mode("append")
        .option("compression_mode", "message")
        .save(Files.createTempDirectory("db3_g1").toString + "/export")
    }
    assert(e1.getMessage != null && e1.getMessage.contains("compression_mode"))
    // a bag dir has ONE compression: appending a different setting
    // would mislabel one generation in metadata.yaml
    val out = Files.createTempDirectory("db3_g2").toString + "/export"
    df.write.format("db3").mode("append")
      .option("compression_format", "zstd").option("compression_mode", "file")
      .save(out)
    val e2 = intercept[Exception] {
      df.write.format("db3").mode("append").save(out)
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Seq(Option(t.getMessage).getOrElse("")) ++ chain(t.getCause)
    assert(chain(e2).exists(_.contains("one compression")), chain(e2).toString)
    // overwrite resets the compression legitimately
    df.write.format("db3").mode("overwrite").save(out)
    assert(spark.read.format("db3").load(out).count() === 6)
  }

  test("Db3Export.prepare conforms an arbitrary frame; events round-trip as db3") {
    val dir = "/root/testdata/sf0.001"
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .limit(150)
      .select(col("event_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"), col("props"))
    val prepared = Db3Export.prepare(
      ev.withColumn("payload", encode(col("props"), "UTF-8")),
      topic = concat(lit("/"), col("event_type")),
      timestampNs = col("ts_us") * lit(1000L),
      data = col("payload"),
      tpe = lit("graft/Props"))
    val out = Files.createTempDirectory("db3_sink_prep").toString + "/export"
    prepared.repartition(2).write.format("db3").mode("append").save(out)
    val back = spark.read.format("db3").load(out)
    assert(back.count() === 150)
    val types = ev.select("event_type").distinct().collect().map(_.getString(0)).toSet
    val topics = back.select("topic").distinct().collect().map(_.getString(0)).toSet
    assert(topics === types.map("/" + _))
    val aSum = ev.agg(sum(length(col("props")))).head().getLong(0)
    val bSum = back.agg(sum(length(col("data")))).head().getLong(0)
    assert(aSum === bSum)
  }

  test("late-binding defs try EVERY observed source file per type; " +
      "divergent sources surface _divergent.json") {
    val dir = Files.createTempDirectory("db3_sink_div")
    val topicsDdl = "CREATE TABLE topics(id INTEGER PRIMARY KEY, name TEXT, type TEXT, serialization_format TEXT, offered_qos_profiles TEXT)"
    val msgsDdl = "CREATE TABLE messages(id INTEGER PRIMARY KEY, topic_id INTEGER, timestamp INTEGER, data BLOB)"
    val defsDdl = "CREATE TABLE message_definitions(id INTEGER PRIMARY KEY, topic_type TEXT, encoding TEXT, encoded_message_definition TEXT, type_hash TEXT)"
    val payload = CdrCodec.encode(bundle, Seq("x"))
    def db(defs: Seq[Seq[Any]]): Array[Byte] = SqliteFormat.writeDb(Seq(
      ("topics", topicsDdl, Seq(Seq[Any](null, "/chat", strName, "cdr", ""))),
      ("messages", msgsDdl, Seq(Seq[Any](null, 1L, 1L, payload)))) ++
      (if (defs.nonEmpty) Seq(("message_definitions", defsDdl, defs))
       else Seq.empty))
    // a.db3 carries rows of the type but NO definition; b.db3 defines
    // it; c.db3 defines a second type DIVERGENTLY (two layouts)
    val a = dir.resolve("a.db3"); Files.write(a, db(Seq.empty))
    val b = dir.resolve("b.db3")
    Files.write(b, db(Seq(Seq[Any](null, strName, "ros2msg", strDef, ""))))
    val divName = "graft_msgs/msg/Drifty"
    val c = dir.resolve("c.db3")
    Files.write(c, db(Seq(
      Seq[Any](null, divName, "ros2msg", "string data", ""),
      Seq[Any](null, divName, "ros2msg", "int64 x\nstring data", ""))))
    import spark.implicits._
    val raw = Seq(
      // the type's FIRST row routes through the def-less file — the
      // single-file typeSrc would remember only a.db3 and silently
      // omit the message_definitions row
      ("/chat", strName, "cdr", 1L, payload, a.toString),
      ("/chat", strName, "cdr", 2L, payload, b.toString),
      ("/div", divName, "cdr", 3L, payload, c.toString))
      .toDF("topic", "type", "serialization_format", "timestamp", "data", "src")
    val rows = Db3Export.prepare(raw, topic = col("topic"),
      timestampNs = col("timestamp"), data = col("data"), tpe = col("type"),
      serializationFormat = col("serialization_format"),
      sourcePath = col("src"))
    val out = Files.createTempDirectory("db3_sink_div_out").toString + "/export"
    rows.coalesce(1).write.format("db3").mode("append").save(out)
    val parts = new java.io.File(out).listFiles()
      .filter(f => f.getName.endsWith(".db3") && !f.getName.startsWith("."))
    val defsOut = parts.flatMap(f => Db3IO.scanMeta(f.getPath).definitions)
    assert(defsOut.exists(d => d._1 == strName && d._3 == strDef),
      s"the definition living in the SECOND observed file must export: $defsOut")
    assert(!defsOut.exists(_._1 == divName),
      "a divergent type's defs row must stay honestly omitted")
    val sidecar = new java.io.File(out, "_divergent.json")
    assert(sidecar.exists(), "divergence must surface a _divergent.json")
    val json = new String(Files.readAllBytes(sidecar.toPath), "UTF-8")
    assert(json.contains(divName) && json.contains("c.db3"),
      s"sidecar must name the type and its source files: $json")
    assert(!json.contains(strName), s"resolved types must not appear: $json")
    // append with no divergence merges, never loses the pointer
    rows.filter(col("type") === strName).coalesce(1)
      .write.format("db3").mode("append").save(out)
    val json2 = new String(Files.readAllBytes(sidecar.toPath), "UTF-8")
    assert(json2.contains(divName), "append must keep the sidecar")
    // overwrite resets the generation AND the diagnostic
    rows.filter(col("type") === strName).coalesce(1)
      .write.format("db3").mode("overwrite").save(out)
    assert(!sidecar.exists(), "overwrite must reset the sidecar")
  }
}
