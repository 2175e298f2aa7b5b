package graft.ros.bag

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.sources.Filter

/** Micro-batch streaming over a growing bag file — the live "rosnode"
  * the reference contemplates but never builds (reference
  * rosbag2parquet.cpp:37). The offset is the count of complete chunks:
  * each trigger re-scans the bag index and plans one InputPartition per
  * NEW chunk, so `spark.readStream.format("rosbag").load(path)` tails a
  * bag being appended to (chunks are immutable once written — the bag
  * format is append-only, so offsets are stable and replayable from the
  * checkpoint).
  */
final case class RosbagOffset(chunkCount: Long) extends Offset {
  override def json(): String = s"""{"chunkCount":$chunkCount}"""
}

class RosbagMicroBatchStream(path: String, required: StructType,
    filters: Array[Filter], typed: Option[(String, String)] = None,
    includeRaw: Boolean = false) extends MicroBatchStream {

  override def initialOffset(): Offset = RosbagOffset(0L)

  override def latestOffset(): Offset =
    RosbagOffset(RosbagIO.scanIndex(path).chunks.size.toLong)

  override def deserializeOffset(json: String): Offset = {
    val n = """\d+""".r.findFirstIn(json)
      .getOrElse(throw new IllegalArgumentException(s"bad offset $json")).toLong
    RosbagOffset(n)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[RosbagOffset].chunkCount.toInt
    val e = end.asInstanceOf[RosbagOffset].chunkCount.toInt
    if (e <= s) return Array.empty
    val index = RosbagIO.scanIndex(path)
    val conns = index.connections.map(c => c.connId -> c).toMap
    index.chunks.zipWithIndex.slice(s, e).map { case (c, i) =>
      RosbagInputPartition(path, i, c, conns): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = typed match {
    case Some((dt, msgDef)) =>
      new RosbagTypedReaderFactory(dt, msgDef, required, includeRaw, filters)
    case None => new RosbagReaderFactory(required, filters, limit = -1)
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
