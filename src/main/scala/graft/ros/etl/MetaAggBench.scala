package graft.ros.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures what the metadata-aggregate pushdown is FOR: the "rosbag
  * info" scalar block — `count(*) + min/max(timestamp)` — answered
  * from container metadata versus the normal scan over the same
  * ~100 MB blob-dominated fixture, per container format. At fleet
  * scale this query class is the difference between a per-file index
  * read and decompressing every chunk of every recording.
  *
  * Both paths are asserted plan-visible (`metadataAgg=true` present /
  * absent) so the numbers can't silently measure the same plan; the
  * fallback plan groups by a literal, which the pushdown refuses
  * (non-column grouping) while row-level work stays identical.
  *
  * Run: sbt "runMain graft.ros.etl.MetaAggBench [targetMB]"
  * Writes BENCH_metaagg.json and prints the compact line LAST.
  */
object MetaAggBench {
  private val BlobName = "graft_msgs/msg/Blob"
  private val BlobDef = "int64 seq\nstring format\nuint8[] data"
  private val Blob1Name = "graft_msgs/Blob" // ROS 1 twin

  def main(args: Array[String]): Unit = {
    val targetMB = if (args.nonEmpty) args(0).toInt else 100
    require(targetMB > 0 && targetMB <= 1024,
      s"targetMB out of range: $targetMB (fixtures built in driver memory)")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.ros.mcap.{CdrCodec, McapFormat, Ros2Msg}
    import graft.ros.bag.BagFormat
    import graft.ros.{MsgDefParser, RosSchemaMapper}

    val rng = new scala.util.Random(42)
    val blob = new Array[Byte](4096)
    val nMsgs = ((targetMB.toLong << 20) / (4096 + 80)).toInt
    val dir = java.nio.file.Files.createTempDirectory("metaagg_bench")
    System.err.println(s"building 3 fixtures of $nMsgs messages (~$targetMB MB each)...")

    // --- mcap (zstd chunks, summary Statistics) ---
    val blobBundle = Ros2Msg.bundle(BlobName, BlobDef)
    def cdrPayload(i: Int): Array[Byte] = {
      rng.nextBytes(blob)
      CdrCodec.encode(blobBundle, Seq(i.toLong, "jpeg", blob))
    }
    val t0ns = 1700000000000000000L
    // each fixture's message vector + serialized bytes build and
    // release inside its own scope: peak driver retention stays ~1×
    // target, not 3× (the targetMB<=1024 guard assumes this)
    val mcapPath = dir.resolve("bench.mcap")
    locally {
      val mcapMsgs = (0 until nMsgs).map { i =>
        McapFormat.McapMessage(1, i.toLong, t0ns + i * 50000000L,
          t0ns + i * 50000000L, cdrPayload(i))
      }
      java.nio.file.Files.write(mcapPath, McapFormat.writeMcap(
        Seq(McapFormat.McapSchema(1, BlobName, "ros2msg", BlobDef.getBytes("UTF-8"))),
        Seq(McapFormat.McapChannel(1, 1, "/cam0/blob", "cdr")),
        mcapMsgs, "zstd", chunkGroups = math.max(1, nMsgs / 256)))
      ()
    }

    // --- rosbag1 (lz4 chunks, chunk-info records) ---
    val bagPath = dir.resolve("bench.bag")
    locally {
      val bagBundle = MsgDefParser.parse(Blob1Name, BlobDef)
      val bagMsgs = (0 until nMsgs).map { i =>
        rng.nextBytes(blob)
        BagFormat.WriteMessage(0, 1700000000 + i / 20, (i % 20) * 50000000,
          RosSchemaMapper.encode(bagBundle, Seq(i.toLong, "jpeg", blob)))
      }
      java.nio.file.Files.write(bagPath, BagFormat.writeBag(
        Seq(BagFormat.BagConnection(0, "/cam0/blob", Blob1Name, "m1", BlobDef, "c")),
        bagMsgs, messagesPerChunk = 256, compression = "lz4"))
      ()
    }

    // --- db3 (plain sqlite pages, count+minmax from the tree) ---
    val db3Path = dir.resolve("bench.db3")
    locally {
      val db3Msgs = (0 until nMsgs).map { i =>
        rng.nextBytes(blob)
        Seq[Any](null, 1L, t0ns + i * 50000000L,
          CdrCodec.encode(blobBundle, Seq(i.toLong, "jpeg", blob)))
      }
      java.nio.file.Files.write(db3Path, graft.ros.db3.SqliteFormat.writeDb(Seq(
        ("topics",
          "CREATE TABLE topics(id INTEGER PRIMARY KEY, name TEXT, type TEXT, serialization_format TEXT, offered_qos_profiles TEXT)",
          Seq(Seq[Any](null, "/cam0/blob", BlobName, "cdr", ""))),
        ("messages",
          "CREATE TABLE messages(id INTEGER PRIMARY KEY, topic_id INTEGER, timestamp INTEGER, data BLOB)",
          db3Msgs),
        ("message_definitions",
          "CREATE TABLE message_definitions(id INTEGER PRIMARY KEY, topic_type TEXT, encoding TEXT, encoded_message_definition TEXT, type_hash TEXT)",
          Seq(Seq[Any](null, BlobName, "ros2msg", BlobDef, "h"))))))
      ()
    }

    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    def time3(body: => Unit): Double =
      median((0 until 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      })

    def measure(name: String, df: => DataFrame, ts: String): (Double, Double) = {
      def scalarAgg(d: DataFrame) = d.agg(count(lit(1)).as("n"),
        min(col(ts)).as("mn"), max(col(ts)).as("mx"))
      val pushedPlan = scalarAgg(df).queryExecution.executedPlan.toString
      require(pushedPlan.contains("metadataAgg=true"),
        s"$name: pushdown did not engage:\n$pushedPlan")
      // literal grouping refuses the metadata path; row work is identical
      def full(d: DataFrame) = d.groupBy(lit(1).as("g")).agg(
        count(lit(1)).as("n"), min(col(ts)).as("mn"), max(col(ts)).as("mx"))
      require(!full(df).queryExecution.executedPlan.toString.contains("metadataAgg"),
        s"$name: fallback unexpectedly pushed")
      val pr = scalarAgg(df).collect().head
      val fr = full(df).collect().head
      require(pr.getLong(0) == fr.getLong(1) && pr.getLong(0) == nMsgs.toLong &&
        pr.get(1) == fr.get(2) && pr.get(2) == fr.get(3),
        s"$name: pushed ${pr.toSeq} != full ${fr.toSeq.drop(1)}")
      (time3 { scalarAgg(df).collect(); () }, time3 { full(df).collect(); () })
    }

    val results = Seq(
      ("rosbag", measure("rosbag",
        spark.read.format("rosbag").load(bagPath.toString), "time_sec")),
      ("mcap", measure("mcap",
        spark.read.format("mcap").load(mcapPath.toString), "log_time")),
      ("db3", measure("db3",
        spark.read.format("db3").option("path", db3Path.toString).load(),
        "timestamp")))

    val detail = results.map { case (n, (p, f)) =>
      f""""$n":{"pushed_sec":${math.rint(p * 1e6) / 1e6},"full_sec":${math.rint(f * 1e6) / 1e6},"speedup":${math.rint(f / p * 10) / 10}}"""
    }.mkString("{", ",", "}")
    val line = s"""{"metric":"metaagg","unit":"sec","target_mb":$targetMB,"n_msgs":$nMsgs,"formats":$detail}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_metaagg.json"),
      (line + "\n").getBytes("UTF-8"))
    println(line)
    spark.stop()
  }
}
