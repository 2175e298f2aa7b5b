package graft.ros

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import graft.ros.mcap.{CdrCodec, McapFormat, Ros2Msg}
import graft.ros.db3.SqliteFormat

/** Fleet-scale convert: a mixed directory normalizes into ONE target
  * container format, payload byte-exact, timestamps re-encoded per
  * target convention, transforms applied in between.
  */
class ConvertSpec extends SparkTestBase {

  private val strDef = "string data"

  private lazy val mixedDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_convert").toFile
    import graft.ros.bag.BagFormat
    val r1 = MsgDefParser.parse("std_msgs/String", strDef)
    java.nio.file.Files.write(new java.io.File(dir, "a.bag").toPath,
      BagFormat.writeBag(
        Seq(BagFormat.BagConnection(0, "/bag_topic", "std_msgs/String", "m", strDef, "c")),
        (0 until 5).map(i => BagFormat.WriteMessage(0, 100 + i, 500,
          RosSchemaMapper.encode(r1, Seq(s"b$i"))))))
    val r2 = Ros2Msg.bundle("std_msgs/msg/String", strDef)
    java.nio.file.Files.write(new java.io.File(dir, "b.mcap").toPath,
      McapFormat.writeMcap(
        Seq(McapFormat.McapSchema(1, "std_msgs/msg/String", "ros2msg",
          strDef.getBytes("UTF-8"))),
        Seq(McapFormat.McapChannel(1, 1, "/mcap_topic", "cdr")),
        (0 until 4).map { i =>
          val t = 200000000000L + i * 1000000000L
          McapFormat.McapMessage(1, i.toLong, t, t, CdrCodec.encode(r2, Seq(s"m$i")))
        }))
    java.nio.file.Files.write(new java.io.File(dir, "c.db3").toPath,
      SqliteFormat.writeDb(Seq(
        ("topics", "CREATE TABLE topics(id INTEGER PRIMARY KEY, name TEXT, type TEXT, serialization_format TEXT, offered_qos_profiles TEXT)",
          Seq(Seq[Any](null, "/db3_topic", "std_msgs/msg/String", "cdr", ""))),
        ("messages", "CREATE TABLE messages(id INTEGER PRIMARY KEY, topic_id INTEGER, timestamp INTEGER, data BLOB)",
          (0 until 3).map(i => Seq[Any](null, 1L, 300000000000L + i * 1000000000L,
            CdrCodec.encode(r2, Seq(s"d$i"))))))))
    dir.getAbsolutePath
  }

  private def out(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_convert_$tag").toString + "/export"

  test("mixed directory -> one mcap archive: counts, bytes and ns timestamps survive") {
    val o = out("mcap")
    Convert.run(spark, mixedDir, o, "mcap", partitions = 2)
    val back = spark.read.format("mcap").load(o)
    assert(back.count() === 12)
    val spine = MixedRead.spine(spark, mixedDir)
    val a = spine.select(col("topic"), col("type"), col("timestamp"), col("data"))
    val b = back.select(col("topic"), col("schema_name").as("type"),
      col("log_time").as("timestamp"), col("data"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "payloads, topics, types and ns timestamps must survive the convert")
    // each source dialect's wire encoding labels the output channels —
    // a typed consumer dispatches on it (cdr payloads from mcap/db3,
    // ros1 from the bag)
    val encs = back.select(col("topic"), col("message_encoding"))
      .distinct().collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(encs === Map("/bag_topic" -> "ros1", "/mcap_topic" -> "cdr",
      "/db3_topic" -> "cdr"))
  }

  test("transform in the middle: filter + target rosbag's (sec, nsec) convention") {
    val o = out("bag")
    Convert.run(spark, mixedDir, o, "rosbag", partitions = 1,
      transform = _.filter(col("container") =!= "db3"))
    val back = spark.read.format("rosbag").load(o)
    assert(back.count() === 9) // 5 bag + 4 mcap, db3 filtered out
    // ns -> (sec, nsec): the mcap rows' 200e9.. land at time_sec 200..
    val secs = back.groupBy("topic").agg(min(col("time_sec"))).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(secs === Map("/bag_topic" -> 100, "/mcap_topic" -> 200))
    val aBytes = MixedRead.spine(spark, mixedDir)
      .filter(col("container") =!= "db3")
      .agg(sum(length(col("data")))).head().getLong(0)
    assert(back.agg(sum(length(col("data")))).head().getLong(0) === aBytes)
  }

  test("runStream: files landing mid-stream normalize into one growing archive, exactly-once") {
    val in = java.nio.file.Files.createTempDirectory("graft_convstream_in").toString
    def land(name: String): Unit = {
      java.nio.file.Files.copy(
        new java.io.File(mixedDir, name).toPath,
        new java.io.File(in, name).toPath)
      ()
    }
    val o = out("stream")
    val ck = java.nio.file.Files.createTempDirectory("graft_convstream_ck").toString
    land("a.bag")
    assert(Convert.runStream(spark, in, o, "mcap", ck).awaitTermination(120000),
      "first drain must terminate inside the timeout")
    assert(spark.read.format("mcap").load(o).count() === 5)
    // more fleet uploads arrive — all three formats now present
    land("b.mcap"); land("c.db3")
    assert(Convert.runStream(spark, in, o, "mcap", ck).awaitTermination(120000),
      "second drain must terminate inside the timeout")
    val back = spark.read.format("mcap").load(o)
    assert(back.count() === 12)
    // the resumed stream re-planned nothing: the archive equals a
    // batch convert of the full directory, no duplicates
    val a = MixedRead.spine(spark, in)
      .select(col("topic"), col("type"), col("timestamp"), col("data"))
    val b = back.select(col("topic"), col("schema_name").as("type"),
      col("log_time").as("timestamp"), col("data"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("-> db3: rolled sqlite files plus metadata.yaml (a rosbag2 bag dir)") {
    val o = out("db3")
    Convert.run(spark, mixedDir, o, "db3", partitions = 1,
      options = Map("rows_per_file" -> "5"))
    val back = spark.read.format("db3").load(o)
    assert(back.count() === 12)
    assert(new java.io.File(o, "metadata.yaml").exists())
    val grouped = back.groupBy("topic").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(grouped === Map("/bag_topic" -> 5L, "/mcap_topic" -> 4L, "/db3_topic" -> 3L))
  }
}
