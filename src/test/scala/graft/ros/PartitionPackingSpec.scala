package graft.ros

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import graft.ros.mcap.{CdrCodec, McapFormat, Ros2Msg}
import graft.ros.bag.BagFormat

/** Chunk bin-packing: small-chunk archives plan far fewer tasks than
  * chunks (Spark's own file-split budget), with row/columnar results,
  * storage-identity columns and pruning semantics all unchanged.
  */
class PartitionPackingSpec extends SparkTestBase {

  test("pack: budget respected, order preserved, oversized chunk stands alone") {
    // force deterministic budget: min(10, max(0, total/parallelism)) —
    // set the confs, compute, restore
    val conf = spark.conf
    val prevMax = conf.get("spark.sql.files.maxPartitionBytes")
    val prevOpen = conf.get("spark.graft.chunkOpenCostBytes", "131072")
    try {
      conf.set("spark.sql.files.maxPartitionBytes", "10")
      conf.set("spark.graft.chunkOpenCostBytes", "0")
      // the BIG tail pins bytesPerCore far above maxPartitionBytes, so
      // the budget is exactly the 10-byte conf regardless of the test
      // session's parallelism
      val packs = PartitionPacking.pack(
        Seq(("a", 4L), ("b", 4L), ("c", 4L), ("d", 25L), ("e", 1L),
          ("BIG", 100000000L)))
      assert(packs === Seq(Seq("a", "b"), Seq("c"), Seq("d"), Seq("e"),
        Seq("BIG")),
        "4+4 fits the 10-byte budget, the third spills, the oversized " +
          "chunk stands alone, order is preserved")
      conf.set("spark.graft.chunkOpenCostBytes", "3")
      val withOpen = PartitionPacking.pack(
        Seq(("a", 2L), ("b", 2L), ("c", 2L), ("BIG", 100000000L)))
      assert(withOpen === Seq(Seq("a", "b"), Seq("c"), Seq("BIG")),
        "openCost charges per chunk: (2+3)+(2+3)=10 fits, the third spills")
    } finally {
      conf.set("spark.sql.files.maxPartitionBytes", prevMax)
      conf.set("spark.graft.chunkOpenCostBytes", prevOpen)
    }
  }

  private val strDef = "string data\nint64 n"

  private lazy val manyChunkMcap: String = {
    val b = Ros2Msg.bundle("std_msgs/msg/KV", strDef)
    val msgs = (0 until 400).map { i =>
      McapFormat.McapMessage(1, i.toLong, 1000000000L * i, 1000000000L * i,
        CdrCodec.encode(b, Seq(s"v$i", i.toLong)))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_pack_mcap")
    val p = dir.resolve("many.mcap")
    // 4 messages per chunk -> 100 chunks
    java.nio.file.Files.write(p, McapFormat.writeMcap(
      Seq(McapFormat.McapSchema(1, "std_msgs/msg/KV", "ros2msg",
        strDef.getBytes("UTF-8"))),
      Seq(McapFormat.McapChannel(1, 1, "/kv", "cdr")),
      msgs, chunkGroups = 100))
    p.toString
  }

  private def withConfs(maxPartition: String, openCost: String)(body: => Unit): Unit = {
    val conf = spark.conf
    val prevMax = conf.get("spark.sql.files.maxPartitionBytes")
    val prevOpen = conf.get("spark.graft.chunkOpenCostBytes", "131072")
    try {
      conf.set("spark.sql.files.maxPartitionBytes", maxPartition)
      conf.set("spark.graft.chunkOpenCostBytes", openCost)
      body
    } finally {
      conf.set("spark.sql.files.maxPartitionBytes", prevMax)
      conf.set("spark.graft.chunkOpenCostBytes", prevOpen)
    }
  }

  private def plannedPartitions(df: org.apache.spark.sql.DataFrame): Int = {
    df.rdd.getNumPartitions
  }

  test("mcap: a 100-chunk file plans a handful of packed tasks, rows identical") {
    val path = manyChunkMcap
    def read() = spark.read.format("mcap").option("path", path)
      .option("schema_name", "std_msgs/msg/KV").load()
    def collectAll() = read()
      .select("chunk_idx", "offset", "data_field", "n").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    // per-chunk granularity forced: budget 1 byte, open cost 0
    var perChunkRows: Seq[(Int, Int, String, Long)] = null
    var perChunkParts = 0
    withConfs("1", "0") {
      perChunkParts = plannedPartitions(read())
      perChunkRows = collectAll()
    }
    assert(perChunkParts === 100, "budget 1 keeps one task per chunk")
    var packedParts = 0
    var packedRows: Seq[(Int, Int, String, Long)] = null
    // openCost 0: budget = total/parallelism (local[4] -> ~4-5 packs)
    withConfs((1L << 20).toString, "0") {
      packedParts = plannedPartitions(read())
      packedRows = collectAll()
    }
    assert(packedParts <= 8,
      s"100 tiny chunks must pack into a handful of tasks, got $packedParts")
    assert(packedRows === perChunkRows,
      "packing must not change rows, chunk_idx or offset")
    assert(packedRows.map(_._3).toSet === (0 until 400).map(i => s"v$i").toSet)
    // columnar off agrees too (the concat reader wraps ROW readers)
    System.setProperty("graft.columnar.disable", "1")
    try withConfs((1L << 20).toString, "0") {
      assert(collectAll() === perChunkRows)
    } finally System.clearProperty("graft.columnar.disable")
  }

  test("mcap: chunk pruning still runs per CHUNK before packing") {
    val path = manyChunkMcap
    withConfs((1L << 20).toString, "0") {
      // upper 10% of log_time: 10 of 100 chunks survive the prune and
      // pack into fewer tasks (budget = survivingBytes/parallelism, so
      // tiny surviving sets still spread over the cores); the rows are
      // exactly the tail
      val df = spark.read.format("mcap").option("path", path)
        .option("schema_name", "std_msgs/msg/KV").load()
        .filter(col("log_time") >= 1000000000L * 360)
      assert(plannedPartitions(df) <= 5,
        "10 surviving chunks pack toward the core count")
      assert(df.count() === 40)
    }
  }

  test("limit early-stop works through a packed partition") {
    val path = manyChunkMcap
    withConfs((1L << 20).toString, "0") {
      val df = spark.read.format("mcap").option("path", path)
        .option("schema_name", "std_msgs/msg/KV").load()
        .limit(5)
      assert(df.count() === 5,
        "a limit smaller than one pack must stop inside the concat reader")
      // and a limit crossing chunk boundaries inside one pack
      val df2 = spark.read.format("mcap").option("path", path)
        .option("schema_name", "std_msgs/msg/KV").load()
        .limit(150)
      assert(df2.count() === 150)
    }
  }

  test("rosbag: a many-chunk bag packs and typed rows are identical") {
    val defText = "string data\nint64 n"
    val b1 = MsgDefParser.parse("graft_msgs/KV", defText)
    val msgs = (0 until 400).map { i =>
      BagFormat.WriteMessage(0, 100 + i, 0,
        RosSchemaMapper.encode(b1, Seq(s"v$i", i.toLong)))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_pack_bag")
    val p = dir.resolve("many.bag")
    java.nio.file.Files.write(p, BagFormat.writeBag(
      Seq(BagFormat.BagConnection(0, "/kv", "graft_msgs/KV",
        RosMd5.compute("graft_msgs/KV", defText), defText, "c")),
      msgs, messagesPerChunk = 4))
    def read() = spark.read.format("rosbag")
      .option("datatype", "graft_msgs/KV").load(p.toString)
    def collectAll() = read().select("chunk_idx", "offset", "data_field", "n")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    var perChunk: Seq[(Int, Int, String, Long)] = null
    withConfs("1", "0") {
      assert(plannedPartitions(read()) === 100)
      perChunk = collectAll()
    }
    withConfs((1L << 20).toString, "0") {
      assert(plannedPartitions(read()) <= 8)
      assert(collectAll() === perChunk)
    }
  }
}
