package graft.ros

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import graft.ros.mcap.{CdrCodec, McapFormat, Ros2Msg}
import graft.ros.db3.SqliteFormat

/** One directory holding all three containers reads as one spine. */
class MixedReadSpec extends SparkTestBase {

  private val strDef = "string data"

  private lazy val mixedDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_mixed").toFile

    // rosbag1: 5 messages on /bag_topic, receive times t=100..104 s
    import graft.ros.bag.BagFormat
    val r1Bundle = MsgDefParser.parse("std_msgs/String", strDef)
    val bagMsgs = (0 until 5).map { i =>
      BagFormat.WriteMessage(0, 100 + i, 500, RosSchemaMapper.encode(r1Bundle, Seq(s"b$i")))
    }
    java.nio.file.Files.write(new java.io.File(dir, "a.bag").toPath,
      BagFormat.writeBag(
        Seq(BagFormat.BagConnection(0, "/bag_topic", "std_msgs/String", "m", strDef, "c")),
        bagMsgs))

    // mcap: 4 messages on /mcap_topic, log times 200e9..203e9
    val r2Bundle = Ros2Msg.bundle("std_msgs/msg/String", strDef)
    val mcapMsgs = (0 until 4).map { i =>
      val t = 200000000000L + i * 1000000000L
      McapFormat.McapMessage(1, i.toLong, t, t, CdrCodec.encode(r2Bundle, Seq(s"m$i")))
    }
    java.nio.file.Files.write(new java.io.File(dir, "b.mcap").toPath,
      McapFormat.writeMcap(
        Seq(McapFormat.McapSchema(1, "std_msgs/msg/String", "ros2msg", strDef.getBytes("UTF-8"))),
        Seq(McapFormat.McapChannel(1, 1, "/mcap_topic", "cdr")), mcapMsgs))

    // db3: 3 messages on /db3_topic, timestamps 300e9..302e9
    val db3Rows = (0 until 3).map { i =>
      Seq[Any](null, 1L, 300000000000L + i * 1000000000L,
        CdrCodec.encode(r2Bundle, Seq(s"d$i")))
    }
    java.nio.file.Files.write(new java.io.File(dir, "c.db3").toPath,
      SqliteFormat.writeDb(Seq(
        ("topics", "CREATE TABLE topics(id INTEGER PRIMARY KEY, name TEXT, type TEXT, serialization_format TEXT, offered_qos_profiles TEXT)",
          Seq(Seq[Any](null, "/db3_topic", "std_msgs/msg/String", "cdr", ""))),
        ("messages", "CREATE TABLE messages(id INTEGER PRIMARY KEY, topic_id INTEGER, timestamp INTEGER, data BLOB)", db3Rows))))

    // fleet noise the directory listing must skip
    java.nio.file.Files.write(new java.io.File(dir, "metadata.yaml").toPath,
      "rosbag2_bagfile_information: {}".getBytes("UTF-8"))
    dir.getAbsolutePath
  }

  test("a mixed directory reads as one spine; counts, types and timestamps per container") {
    val df = MixedRead.spine(spark, mixedDir)
    assert(df.schema.fieldNames.toSeq === Seq("file_path", "container", "topic",
      "type", "encoding", "timestamp", "publish_time", "sequence",
      "size", "data"))
    // the mcap-only clocks/counters ride along; other containers null
    val seqs = df.groupBy("container").agg(count(col("sequence"))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(seqs === Map("rosbag" -> 0L, "mcap" -> 4L, "db3" -> 0L))
    val byContainer = df.groupBy("container").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byContainer === Map("rosbag" -> 5L, "mcap" -> 4L, "db3" -> 3L))
    val byTopic = df.groupBy("topic", "type").count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(byTopic === Set(
      ("/bag_topic", "std_msgs/String", 5L),
      ("/mcap_topic", "std_msgs/msg/String", 4L),
      ("/db3_topic", "std_msgs/msg/String", 3L)))
    // nanosecond timestamps under each container's own convention
    val ts = df.groupBy("container").agg(min(col("timestamp"))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ts("rosbag") === 100L * 1000000000L + 500L)
    assert(ts("mcap") === 200000000000L)
    assert(ts("db3") === 300000000000L)
  }

  test("filters narrow each branch; payloads arrive whole; explicit unknown file is loud") {
    val df = MixedRead.spine(spark, mixedDir)
    assert(df.filter(col("topic") === "/mcap_topic").count() === 4)
    assert(df.filter(col("timestamp") >= 300000000000L).count() === 3)
    assert(df.filter(col("container") === "rosbag" && col("topic") === "/bag_topic")
      .count() === 5)
    // the shared `data` column still decodes per branch
    val one = df.filter(col("container") === "db3")
      .orderBy("timestamp").limit(1).collect().head
    assert(CdrCodec.decode(Ros2Msg.bundle("std_msgs/msg/String", strDef),
      one.getAs[Array[Byte]]("data")) === Seq("d0"))
    val ex = intercept[IllegalArgumentException] {
      MixedRead.resolve(s"$mixedDir/metadata.yaml")
    }
    assert(ex.getMessage.contains("not a recognized container"), ex.getMessage)
  }

  test("timestamp ranges over the spine prune BAG chunks via the inferred time_sec bound") {
    // the bag branch's timestamp is COMPUTED (sec*1e9 + nsec) — raw
    // DSv2 pushdown can't see it; the SplitTimeBounds optimizer rule
    // must derive the pushable time_sec conjunct so chunk-info pruning
    // fires (with its documented ±2-3 s conservative slack)
    val dir = java.nio.file.Files.createTempDirectory("graft_mixed_tsb").toFile
    import graft.ros.bag.BagFormat
    val b = MsgDefParser.parse("std_msgs/String", strDef)
    val msgs = (0 until 40).map(i => BagFormat.WriteMessage(0, 1000 + i,
      123456789, RosSchemaMapper.encode(b, Seq(s"x$i"))))
    java.nio.file.Files.write(new java.io.File(dir, "t.bag").toPath,
      BagFormat.writeBag(
        Seq(BagFormat.BagConnection(0, "/t", "std_msgs/String", "m", strDef, "c")),
        msgs, messagesPerChunk = 4)) // 10 chunks, 4 s each
    def spine = MixedRead.spine(spark, dir.getAbsolutePath)
    val all = spine.rdd.getNumPartitions
    assert(all === 10, s"fixture should plan one partition per chunk, got $all")

    val lo = 1030L * 1000000000L
    val tail = spine.filter(col("timestamp") >= lo)
    assert(tail.rdd.getNumPartitions < all,
      "a lower timestamp bound must prune leading bag chunks")
    assert(tail.count() === 10) // rows exact: the original filter still applies
    assert(tail.agg(min(col("timestamp"))).head().getLong(0)
      === lo + 123456789L)

    val window = spine.filter(
      col("timestamp") >= 1010L * 1000000000L &&
        col("timestamp") <= 1015L * 1000000000L)
    assert(window.rdd.getNumPartitions < all,
      "a two-sided window must prune both ends")
    assert(window.count() === 5) // sec 1010..1014 (1015*1e9 < 1015e9+nsec)

    // the equally natural user SPELLINGS derive the same bounds:
    // epoch-seconds double division
    val divD = spine.filter(col("timestamp") / 1e9 >= 1030.0)
    assert(divD.rdd.getNumPartitions < all,
      "timestamp/1e9 >= T (double division) must prune")
    assert(divD.count() === 10)
    // integral division (SQL `div`)
    val divI = spine.filter(
      call_function("div", col("timestamp"), lit(1000000000L)) >= lit(1030L))
    assert(divI.rdd.getNumPartitions < all,
      "div(timestamp, 1e9) >= S must prune")
    assert(divI.count() === 10)
    // a bare double literal coerces the long column to double
    val dblLit = spine.filter(col("timestamp") >= 1.030e12)
    assert(dblLit.rdd.getNumPartitions < all,
      "timestamp >= <double literal> must prune through the cast")
    assert(dblLit.count() === 10)
    // SQL BETWEEN folds to the two-sided conjuncts
    spine.createOrReplaceTempView("tsb_spine")
    val between = spark.sql(
      "SELECT * FROM tsb_spine WHERE timestamp BETWEEN 1010000000000 AND 1015000000000")
    assert(between.rdd.getNumPartitions < all, "BETWEEN must prune both ends")
    assert(between.count() === 5)
    // literal-on-the-left mirrors
    val mirrored = spine.filter(lit(1030L * 1000000000L) <= col("timestamp"))
    assert(mirrored.rdd.getNumPartitions < all,
      "lit <= timestamp must prune like timestamp >= lit")
    assert(mirrored.count() === 10)
  }

  test("mixed stream equals the batch spine, all three formats landing mid-stream") {
    import graft.ros.bag.BagFormat
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("graft_mixed_stream")
    val ck = dir.resolve("ck").toString
    val out = dir.resolve("out").toString
    val data = dir.resolve("data")
    java.nio.file.Files.createDirectories(data)

    val r1Bundle = MsgDefParser.parse("std_msgs/String", strDef)
    val r2Bundle = Ros2Msg.bundle("std_msgs/msg/String", strDef)
    def bagBytes(n: Int): Array[Byte] = BagFormat.writeBag(
      Seq(BagFormat.BagConnection(0, "/bag_topic", "std_msgs/String", "m",
        strDef, "c")),
      (0 until n).map(i => BagFormat.WriteMessage(0, 100 + i, 500,
        RosSchemaMapper.encode(r1Bundle, Seq(s"b$i")))),
      messagesPerChunk = 2)
    def mcapBytes(n: Int): Array[Byte] = McapFormat.writeMcap(
      Seq(McapFormat.McapSchema(1, "std_msgs/msg/String", "ros2msg",
        strDef.getBytes("UTF-8"))),
      Seq(McapFormat.McapChannel(1, 1, "/mcap_topic", "cdr")),
      (0 until n).map { i =>
        val t = 200000000000L + i * 1000000000L
        McapFormat.McapMessage(1, i.toLong, t, t,
          CdrCodec.encode(r2Bundle, Seq(s"m$i")))
      })
    def db3Bytes(name: String, n: Int): Array[Byte] = SqliteFormat.writeDb(Seq(
      ("topics", "CREATE TABLE topics(id INTEGER PRIMARY KEY, name TEXT, type TEXT, serialization_format TEXT, offered_qos_profiles TEXT)",
        Seq(Seq[Any](null, s"/db3_$name", "std_msgs/msg/String", "cdr", ""))),
      ("messages", "CREATE TABLE messages(id INTEGER PRIMARY KEY, topic_id INTEGER, timestamp INTEGER, data BLOB)",
        (0 until n).map(i => Seq[Any](null, 1L, 300000000000L + i,
          CdrCodec.encode(r2Bundle, Seq(s"$name-$i")))))))
    def land(name: String, bytes: Array[Byte]): Unit = {
      java.nio.file.Files.write(data.resolve(name), bytes); ()
    }

    val stream = MixedRead.stream(spark, data.toString)
    assert(stream.isStreaming)
    def runOnce(): Long = {
      val q = stream.writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      spark.read.parquet(out).count()
    }

    // trigger 1: only a bag exists (the prefix just went live)
    land("a.bag", bagBytes(4))
    assert(runOnce() === 4)
    // trigger 2: an mcap and a db3 land mid-stream; the bag GROWS
    // (chunks are immutable, the stream pays only the new ones)
    land("b.mcap", mcapBytes(3))
    land("c.db3", db3Bytes("c", 3))
    land("a.bag", bagBytes(8))
    assert(runOnce() === 4 + 4 + 3 + 3)
    // trigger 3: one more of each format lands; fleet noise is skipped
    land("d.bag", bagBytes(2))
    land("e.mcap", mcapBytes(2))
    land("f.db3", db3Bytes("f", 2))
    java.nio.file.Files.write(data.resolve("metadata.yaml"),
      "rosbag2_bagfile_information: {}".getBytes("UTF-8"))
    assert(runOnce() === 14 + 6)

    // the drained stream IS the batch read of the final directory
    val streamed = spark.read.parquet(out)
    val batch = MixedRead.spine(spark, data.toString)
    assert(streamed.schema.fieldNames.toSeq === batch.schema.fieldNames.toSeq)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }
}
