package graft.ros.etl

import org.apache.spark.sql.SparkSession

/** ETL throughput benchmark for the two newer containers — the
  * McapEtl/Db3Etl twin of [[EtlBench]], over the same camera+imu-like
  * shape (a blob-dominated channel + a small-reading channel, ~4 KB
  * blobs) at a comparable size.
  *
  * Measures the claims the ETL scale shapes argue:
  *  - MCAP: staged single-pass mode ("every chunk decompressed exactly
  *    ONCE for the whole ETL") vs the default per-schema re-scan —
  *    both timed on the same zstd-chunked file;
  *  - db3: the staging-only conversion (sqlite interleaves topics in
  *    shared b-tree pages, so there is no cheaper re-scan to compare —
  *    the number IS the datapoint).
  *
  * Run: sbt "runMain graft.ros.etl.ContainerEtlBench mcap|db3 [targetMB]"
  */
object ContainerEtlBench {
  private val BlobName = "graft_msgs/msg/Blob"
  private val BlobDef = "int64 seq\nstring format\nuint8[] data"
  private val ReadingName = "graft_msgs/msg/Reading"
  private val ReadingDef = "int64 seq\nfloat64 x\nfloat64 y\nfloat64 z"

  def main(args: Array[String]): Unit = {
    val format = if (args.nonEmpty) args(0) else "mcap"
    val targetMB = if (args.length > 1) args(1).toInt else 100
    require(format == "mcap" || format == "db3", s"unknown format $format")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.ros.mcap.{CdrCodec, McapEtl, McapFormat, Ros2Msg}

    val blobBundle = Ros2Msg.bundle(BlobName, BlobDef)
    val readingBundle = Ros2Msg.bundle(ReadingName, ReadingDef)
    val rng = new scala.util.Random(42)
    require(targetMB > 0 && targetMB <= 4096,
      s"targetMB out of range: $targetMB (fixture built in driver memory)")
    val blob = new Array[Byte](4096)
    val perPair = 4096 + 120
    val nPairs = ((targetMB.toLong << 20) / perPair).toInt
    System.err.println(s"generating $nPairs blob + $nPairs reading messages...")

    def blobPayload(i: Int): Array[Byte] = {
      rng.nextBytes(blob)
      CdrCodec.encode(blobBundle, Seq(i.toLong, "jpeg", blob))
    }
    def readingPayload(i: Int): Array[Byte] =
      CdrCodec.encode(readingBundle, Seq(i.toLong, 0.01 * i, 0.02 * i, 9.8))

    val dir = java.nio.file.Files.createTempDirectory("container_etl_bench")

    def dirSize(f: java.io.File): Long =
      if (f.isDirectory) f.listFiles().map(dirSize).sum else f.length()
    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    format match {
      case "mcap" =>
        val schemas = Seq(
          McapFormat.McapSchema(1, BlobName, "ros2msg", BlobDef.getBytes("UTF-8")),
          McapFormat.McapSchema(2, ReadingName, "ros2msg", ReadingDef.getBytes("UTF-8")))
        val channels = Seq(
          McapFormat.McapChannel(1, 1, "/cam0/blob", "cdr"),
          McapFormat.McapChannel(2, 2, "/reading", "cdr"))
        val msgs = (0 until nPairs).flatMap { i =>
          val t = 1700000000000000000L + i * 50000000L
          Seq(
            McapFormat.McapMessage(1, i.toLong, t, t, blobPayload(i)),
            McapFormat.McapMessage(2, i.toLong, t + 1, t + 1, readingPayload(i)))
        }
        // ~256 messages per chunk, EtlBench's grain, zstd like rosbag2's
        // default MCAP profile — the compressed-chunk case the staged
        // mode exists for
        val groups = math.max(1, msgs.size / 256)
        val path = dir.resolve("bench.mcap")
        java.nio.file.Files.write(path,
          McapFormat.writeMcap(schemas, channels, msgs, "zstd", chunkGroups = groups))
        val mb = java.nio.file.Files.size(path) / 1e6
        System.err.println(f"mcap written: $mb%.1f MB (zstd, $groups chunks)")
        val (infoR, secRescan) =
          timed(McapEtl.run(spark, path.toString, dir.resolve("out_rescan").toString))
        val (infoS, secStaged) =
          timed(McapEtl.run(spark, path.toString, dir.resolve("out_staged").toString,
            stagedBySchema = true))
        require(infoR.messages == infoS.messages && infoR.crcXor == infoS.crcXor,
          "staged and re-scan modes must convert identical rows")
        val outMB = dirSize(dir.resolve("out_staged").toFile) / 1e6
        println(f"""{"metric":"mcap_etl_mb_per_sec","staged":${mb / secStaged}%.2f,"rescan":${mb / secRescan}%.2f,"unit":"MB/s","mcap_mb":$mb%.1f,"out_mb":$outMB%.1f,"messages":${infoS.messages},"staged_sec":$secStaged%.2f,"rescan_sec":$secRescan%.2f}""")

      case "db3" =>
        import graft.ros.db3.{Db3Etl, SqliteFormat}
        val msgRows = (0 until nPairs).flatMap { i =>
          val t = 1700000000000000000L + i * 50000000L
          Seq(
            Seq[Any](null, 1L, t, blobPayload(i)),
            Seq[Any](null, 2L, t + 1, readingPayload(i)))
        }
        val db = SqliteFormat.writeDb(Seq(
          ("topics",
            "CREATE TABLE topics(id INTEGER PRIMARY KEY, name TEXT, type TEXT, serialization_format TEXT, offered_qos_profiles TEXT)",
            Seq(Seq[Any](null, "/cam0/blob", BlobName, "cdr", ""),
              Seq[Any](null, "/reading", ReadingName, "cdr", ""))),
          ("messages",
            "CREATE TABLE messages(id INTEGER PRIMARY KEY, topic_id INTEGER, timestamp INTEGER, data BLOB)",
            msgRows),
          ("message_definitions",
            "CREATE TABLE message_definitions(id INTEGER PRIMARY KEY, topic_type TEXT, encoding TEXT, encoded_message_definition TEXT, type_hash TEXT)",
            Seq(Seq[Any](null, BlobName, "ros2msg", BlobDef, "h1"),
              Seq[Any](null, ReadingName, "ros2msg", ReadingDef, "h2")))))
        val path = dir.resolve("bench.db3")
        java.nio.file.Files.write(path, db)
        val mb = java.nio.file.Files.size(path) / 1e6
        System.err.println(f"db3 written: $mb%.1f MB")
        val (info, sec) =
          timed(Db3Etl.run(spark, path.toString, dir.resolve("out").toString))
        val outMB = dirSize(dir.resolve("out").toFile) / 1e6
        println(f"""{"metric":"db3_etl_mb_per_sec","value":${mb / sec}%.2f,"unit":"MB/s","db3_mb":$mb%.1f,"out_mb":$outMB%.1f,"messages":${info.messages},"sec":$sec%.2f}""")
    }
    spark.stop()
  }
}
