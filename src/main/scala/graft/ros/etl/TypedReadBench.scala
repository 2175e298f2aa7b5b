package graft.ros.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed-scan throughput benchmark with a SAME-SESSION columnar A/B:
  * each container format gets one blob+reading fixture (the
  * ContainerEtlBench shape, ~4 KB camera blobs + small readings), and
  * each query runs twice — vectorized readers on, then forced onto the
  * row readers via the `graft.columnar.disable` sysprop (read at plan
  * time by every reader factory). Medians of 3; MB/s against the
  * container's on-disk bytes. Cross-round wall-clock on this box is
  * unreliable, so the A/B inside ONE process is the honest measure of
  * what the ColumnarBatch readers buy.
  *
  * Queries per format:
  *  - reading_agg: typed scan of the numeric type, sum/count over its
  *    payload columns (decode-bound, many small rows);
  *  - blob_meta: typed scan of the blob type projecting the small
  *    fields only — the 4 KB payload column is PRUNED, so the walk is
  *    skip-dominated (the "read the header before deciding whether to
  *    incur I/O for the image" economics, per column);
  *  - blob_full: same scan materializing the blob bytes too.
  *
  * Run: sbt "runMain graft.ros.etl.TypedReadBench [targetMB]"
  * Writes BENCH_typedscan.json (one JSON line per format).
  */
object TypedReadBench {
  private val BlobName = "graft_msgs/msg/Blob"
  private val BlobDef = "int64 seq\nstring format\nuint8[] data"
  private val ReadingName = "graft_msgs/msg/Reading"
  private val ReadingDef = "int64 seq\nfloat64 x\nfloat64 y\nfloat64 z"
  // ros1 twins (two-segment names, same wire-neutral field lists)
  private val BlobName1 = "graft_msgs/Blob"
  private val ReadingName1 = "graft_msgs/Reading"

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted; s(s.length / 2)
  }

  def main(args: Array[String]): Unit = {
    val targetMB = if (args.nonEmpty) args(0).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.ros.mcap.{CdrCodec, McapFormat, Ros2Msg}
    import graft.ros.{MsgDefParser, RosSchemaMapper}
    import graft.ros.bag.BagFormat
    import graft.ros.db3.SqliteFormat

    val blobB2 = Ros2Msg.bundle(BlobName, BlobDef)
    val readB2 = Ros2Msg.bundle(ReadingName, ReadingDef)
    val blobB1 = MsgDefParser.parse(BlobName1, BlobDef)
    val readB1 = MsgDefParser.parse(ReadingName1, ReadingDef)
    val rng = new scala.util.Random(42)
    val blob = new Array[Byte](4096)
    val perPair = 4096 + 120
    val nPairs = ((targetMB.toLong << 20) / perPair).toInt
    // the numeric channel carries ~50 B rows — a blob-sized count would
    // make its scan all job overhead; 20x gives a genuinely
    // decode-bound row population (~0.5M at the default 100 MB)
    val nReadings = nPairs * 20
    System.err.println(s"generating $nPairs blob + $nReadings reading messages per format...")

    val dir = java.nio.file.Files.createTempDirectory("typed_read_bench")

    // ---- fixtures ----
    val mcapPath = {
      val msgs = (0 until nPairs).flatMap { i =>
        rng.nextBytes(blob)
        val t = 1700000000000000000L + i * 50000000L
        McapFormat.McapMessage(1, i.toLong, t, t,
          CdrCodec.encode(blobB2, Seq(i.toLong, "jpeg", blob))) +:
          (0 until 20).map(k => McapFormat.McapMessage(2, (20 * i + k).toLong,
            t + 1 + k, t + 1 + k,
            CdrCodec.encode(readB2, Seq((20L * i + k), 0.01 * i, 0.02 * i, 9.8))))
      }
      val p = dir.resolve("bench.mcap")
      java.nio.file.Files.write(p, McapFormat.writeMcap(
        Seq(McapFormat.McapSchema(1, BlobName, "ros2msg", BlobDef.getBytes("UTF-8")),
          McapFormat.McapSchema(2, ReadingName, "ros2msg", ReadingDef.getBytes("UTF-8"))),
        Seq(McapFormat.McapChannel(1, 1, "/cam0/blob", "cdr"),
          McapFormat.McapChannel(2, 2, "/reading", "cdr")),
        msgs, chunkGroups = math.max(1, msgs.size / 256)))
      p.toString
    }
    val bagPath = {
      val msgs = (0 until nPairs).flatMap { i =>
        rng.nextBytes(blob)
        BagFormat.WriteMessage(0, 1700000000 + i / 20, 0,
          RosSchemaMapper.encode(blobB1, Seq(i.toLong, "jpeg", blob))) +:
          (0 until 20).map(k => BagFormat.WriteMessage(1, 1700000000 + i / 20,
            1 + k,
            RosSchemaMapper.encode(readB1, Seq(20L * i + k, 0.01 * i, 0.02 * i, 9.8))))
      }
      val p = dir.resolve("bench.bag")
      java.nio.file.Files.write(p, BagFormat.writeBag(
        Seq(BagFormat.BagConnection(0, "/cam0/blob", BlobName1, "*", BlobDef, "c"),
          BagFormat.BagConnection(1, "/reading", ReadingName1, "*", ReadingDef, "c")),
        msgs, messagesPerChunk = 256))
      p.toString
    }
    val db3Path = {
      val msgRows = (0 until nPairs).flatMap { i =>
        rng.nextBytes(blob)
        val t = 1700000000000000000L + i * 50000000L
        Seq[Any](null, 1L, t,
          CdrCodec.encode(blobB2, Seq(i.toLong, "jpeg", blob))) +:
          (0 until 20).map(k => Seq[Any](null, 2L, t + 1 + k,
            CdrCodec.encode(readB2, Seq(20L * i + k, 0.01 * i, 0.02 * i, 9.8))))
      }
      val p = dir.resolve("bench.db3")
      java.nio.file.Files.write(p, SqliteFormat.writeDb(Seq(
        ("topics", "CREATE TABLE topics(id INTEGER PRIMARY KEY, name TEXT, type TEXT, serialization_format TEXT, offered_qos_profiles TEXT)",
          Seq(Seq[Any](null, "/cam0/blob", BlobName, "cdr", ""),
            Seq[Any](null, "/reading", ReadingName, "cdr", ""))),
        ("messages", "CREATE TABLE messages(id INTEGER PRIMARY KEY, topic_id INTEGER, timestamp INTEGER, data BLOB)",
          msgRows),
        ("message_definitions", "CREATE TABLE message_definitions(id INTEGER PRIMARY KEY, topic_type TEXT, encoding TEXT, encoded_message_definition TEXT, type_hash TEXT)",
          Seq(Seq[Any](null, BlobName, "ros2msg", BlobDef, ""),
            Seq[Any](null, ReadingName, "ros2msg", ReadingDef, ""))))))
      p.toString
    }

    def typedRead(format: String, path: String, tpe: String): DataFrame =
      format match {
        case "rosbag" => spark.read.format("rosbag")
          .option("datatype", tpe).load(path)
        case f => spark.read.format(f).option("schema_name", tpe).load(path)
      }

    def queries(format: String, path: String): Seq[(String, Long, () => Long)] = {
      val (blobT, readT) = format match {
        case "rosbag" => (BlobName1, ReadingName1)
        case _ => (BlobName, ReadingName)
      }
      Seq(
        ("reading_agg", nReadings.toLong, () => typedRead(format, path, readT)
          .agg(sum("x"), sum("y"), count(lit(1))).collect().head.getLong(2)),
        ("blob_meta", nPairs.toLong, () => typedRead(format, path, blobT)
          .agg(count(lit(1)), sum(length(col("format")))).collect().head.getLong(0)),
        ("blob_full", nPairs.toLong, () => typedRead(format, path, blobT)
          .agg(sum(length(col("data_field")))).collect().head.getLong(0) / 4096))
    }

    def run(format: String, path: String): String = {
      val mb = java.nio.file.Files.size(java.nio.file.Paths.get(path)) / 1e6
      val parts = queries(format, path).flatMap { case (name, expect, q) =>
        Seq(false, true).map { columnar =>
          if (columnar) sys.props.remove("graft.columnar.disable")
          else sys.props("graft.columnar.disable") = "true"
          // warm the path untimed first (JIT, page cache, codegen) so
          // neither mode inherits the other's warmup
          require(q() == expect, s"$format/$name: row count drifted")
          val times = (1 to 5).map { _ =>
            val t0 = System.nanoTime()
            val rows = q()
            require(rows == expect, s"$format/$name: $rows rows != $expect")
            (System.nanoTime() - t0) / 1e9
          }
          val sec = median(times)
          f""""${name}_${if (columnar) "columnar" else "row"}":{"sec":$sec%.3f,"mb_per_sec":${mb / sec}%.2f}"""
        }
      }
      sys.props.remove("graft.columnar.disable")
      f"""{"metric":"typed_scan_$format","unit":"MB/s","file_mb":$mb%.1f,"blobs":$nPairs,"readings":$nReadings,${parts.mkString(",")}}"""
    }

    val lines = Seq(run("mcap", mcapPath), run("db3", db3Path),
      run("rosbag", bagPath))
    graft.Bench.writeArtifact("BENCH_typedscan.json", lines)
    lines.foreach(println)
    spark.stop()
  }
}
