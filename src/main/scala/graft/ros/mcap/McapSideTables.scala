package graft.ros.mcap

import java.util
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The container's NON-message payloads as side tables, selected with
  * `spark.read.format("mcap").option("table", "attachments"|"metadata")`
  * — the same dispatch shape as the typed read's `schema_name` option,
  * so they also work through the SQL catalog
  * (`CREATE TABLE ... USING mcap OPTIONS (path '...', table
  * 'attachments')`).
  *
  * Robotics archives carry calibration blobs / URDFs / firmware as
  * Attachment records (op 0x09) and run descriptions as Metadata
  * records (op 0x0C); the reference's pipeline (and this engine's
  * spine) only surfaces messages — a consumer re-calibrating a 100 TB
  * fleet archive needs the attachments WITHOUT re-reading message
  * chunks. Plan time touches only the cached per-file index (record
  * offsets — [[McapFormat.scanIndex]] collects them in its header-only
  * walk); attachment BODIES are read executor-side, one partition per
  * attachment, so a 2 GiB firmware blob never lands on the driver.
  */
object McapSideTables {
  val AttachmentsSchema: StructType = StructType(Seq(
    StructField("file_path", StringType, nullable = false),
    StructField("log_time", LongType, nullable = false),
    StructField("create_time", LongType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("data", BinaryType, nullable = false)))

  // one row per (record, key): the k/v map explodes relationally —
  // `WHERE key = 'robot_id'` beats a map column for catalog SQL
  val MetadataSchema: StructType = StructType(Seq(
    StructField("file_path", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("key", StringType, nullable = false),
    StructField("value", StringType, nullable = false)))

  def tableFor(kind: String, path: String): Table = kind match {
    case "attachments" => new McapAttachmentsTable(path)
    case "metadata" => new McapMetadataTable(path)
    case other => throw new IllegalArgumentException(
      s"unknown mcap side table '$other' (attachments | metadata); " +
        "omit the 'table' option for the message spine")
  }
}

private[mcap] final case class McapSideRef(file: String, offset: Long,
    payloadLen: Long) extends InputPartition

class McapAttachmentsTable(path: String) extends Table
    with SupportsRead with SupportsWrite {
  override def name(): String = s"mcap:$path:attachments"
  override def schema(): StructType = McapSideTables.AttachmentsSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)
  override def newScanBuilder(
      options: org.apache.spark.sql.util.CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new McapAttachmentsScan(path)
    }
  /** The relational WRITE half: `df.write.format("mcap")
    * .option("table", "attachments").mode("append").save(dir)` —
    * adding a calibration to an archive without hand-rolling mcap
    * bytes ([[McapExport.prepareAttachments]] conforms arbitrary
    * frames). APPEND ONLY: attachments are an accumulating dimension;
    * an overwrite would also have to decide the fate of message files
    * sharing the directory, so it is refused (no truncate capability).
    */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new McapAttachmentsWrite(path, info)
    }
}

/** One `att-<partition>-<task>-<job>.mcap` per non-empty task, each
  * holding only Attachment records (+ the AttachmentIndex/Statistics
  * summary [[McapStreamingWriter.finish]] emits) — the side-table read
  * lists them with the rest of the directory. Task commit promotes a
  * dotted in-progress file; job abort deletes committed files.
  */
class McapAttachmentsWrite(dir: String, info: LogicalWriteInfo)
    extends Write with BatchWrite {
  private val schema = info.schema()
  private def need(name: String,
      dt: org.apache.spark.sql.types.DataType): Int = {
    val i = schema.fieldNames.indexOf(name)
    require(i >= 0, s"mcap attachments write needs a '$name' column " +
      "(McapExport.prepareAttachments conforms arbitrary frames)")
    require(schema.fields(i).dataType == dt,
      s"mcap attachments write column '$name' must be $dt, " +
        s"got ${schema.fields(i).dataType}")
    i
  }
  private val ords = McapAttachmentWriteOrdinals(
    logTime = need("log_time", LongType),
    createTime = need("create_time", LongType),
    name = need("name", StringType),
    mediaType = need("media_type", StringType),
    data = need("data", BinaryType))
  private val jobId = java.util.UUID.randomUUID().toString.take(8)
  locally {
    val p = new Path(dir)
    val fs = p.getFileSystem(graft.ros.bag.RosbagIO.hadoopConf())
    if (!fs.exists(p)) { fs.mkdirs(p); () }
  }
  override def toBatch: BatchWrite = this
  override def createBatchWriterFactory(
      pinfo: PhysicalWriteInfo): DataWriterFactory =
    McapAttachmentsWriterFactory(dir, jobId, ords)
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(dir).getFileSystem(graft.ros.bag.RosbagIO.hadoopConf())
    messages.foreach {
      case c: McapFileCommit if c.path != null =>
        fs.delete(new Path(c.path), false); ()
      case _ => ()
    }
  }
}

private[mcap] final case class McapAttachmentWriteOrdinals(logTime: Int,
    createTime: Int, name: Int, mediaType: Int, data: Int)

private[mcap] final case class McapAttachmentsWriterFactory(dir: String,
    jobId: String, ords: McapAttachmentWriteOrdinals) extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val fs =
        new Path(dir).getFileSystem(graft.ros.bag.RosbagIO.hadoopConf())
      private val stem = f"att-$partitionId%05d-$taskId-$jobId"
      private val finalPath = new Path(dir, s"$stem.mcap")
      private val tmpPath = new Path(dir, s".$stem.mcap.inprogress")
      private var stream: java.io.OutputStream = null
      private var writer: McapStreamingWriter = null
      private var count = 0L
      private var bytes = 0L
      override def write(row: InternalRow): Unit = {
        if (writer == null) {
          stream = new java.io.BufferedOutputStream(
            fs.create(tmpPath, true), 1 << 16)
          writer = new McapStreamingWriter(stream, "", 4 * 1024 * 1024,
            profile = "")
        }
        require(!row.isNullAt(ords.name) && !row.isNullAt(ords.data),
          "mcap attachments write: 'name' and 'data' must be non-null")
        val data = row.getBinary(ords.data)
        writer.writeAttachment(
          logTime = if (row.isNullAt(ords.logTime)) 0L
            else row.getLong(ords.logTime),
          createTime = if (row.isNullAt(ords.createTime)) 0L
            else row.getLong(ords.createTime),
          name = row.getUTF8String(ords.name).toString,
          mediaType = if (row.isNullAt(ords.mediaType)) ""
            else row.getUTF8String(ords.mediaType).toString,
          data = data)
        count += 1; bytes += data.length.toLong
      }
      override def commit(): WriterCommitMessage = {
        if (writer == null) return McapFileCommit(null, 0L, 0L)
        writer.finish()
        stream.close()
        if (fs.exists(finalPath)) fs.delete(finalPath, false)
        require(fs.rename(tmpPath, finalPath),
          s"mcap attachments write: rename $tmpPath -> $finalPath failed")
        McapFileCommit(finalPath.toString, count, bytes)
      }
      override def abort(): Unit = {
        if (stream != null) {
          try stream.close() catch { case _: java.io.IOException => () }
          fs.delete(tmpPath, false); ()
        }
      }
      override def close(): Unit = ()
    }
}

class McapAttachmentsScan(path: String) extends Scan with Batch {
  override def readSchema(): StructType = McapSideTables.AttachmentsSchema
  override def toBatch: Batch = this
  // one partition per ATTACHMENT: bodies are blob-sized (calibration
  // maps, firmware), so per-file batching could stack gigabytes into
  // one task while per-attachment keeps task memory = one blob
  override def planInputPartitions(): Array[InputPartition] =
    // bounded-pool index scans, like the message-spine planner: a
    // fleet directory must not pay sequential summary walks
    graft.ros.DriverPool.parMap(McapIO.resolveFiles(path)) { f =>
      McapIO.scanIndex(f).attachmentRefs.map {
        case (off, len) => McapSideRef(f, off, len): InputPartition
      }
    }.flatten.toArray
  override def createReaderFactory(): PartitionReaderFactory =
    McapAttachmentsReaderFactory()
}

private[mcap] final case class McapAttachmentsReaderFactory()
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val ref = p.asInstanceOf[McapSideRef]
    new PartitionReader[InternalRow] {
      private var done = false
      override def next(): Boolean = !done && { done = true; true }
      override def get(): InternalRow = {
        val a = McapFormat.parseAttachment(
          McapIO.readPayload(ref.file, ref.offset, ref.payloadLen))
        InternalRow(UTF8String.fromString(ref.file), a.logTime, a.createTime,
          UTF8String.fromString(a.name), UTF8String.fromString(a.mediaType),
          a.data.length.toLong, a.data)
      }
      override def close(): Unit = ()
    }
  }
}

class McapMetadataTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"mcap:$path:metadata"
  override def schema(): StructType = McapSideTables.MetadataSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(
      options: org.apache.spark.sql.util.CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new McapMetadataScan(path)
    }
}

class McapMetadataScan(path: String) extends Scan with Batch {
  override def readSchema(): StructType = McapSideTables.MetadataSchema
  override def toBatch: Batch = this
  // metadata records are small string maps: one partition per FILE
  // (files without metadata records plan nothing)
  override def planInputPartitions(): Array[InputPartition] =
    graft.ros.DriverPool.parMap(McapIO.resolveFiles(path)) { f =>
      val refs = McapIO.scanIndex(f).metadataRefs
      if (refs.isEmpty) None
      else Some(McapMetadataFilePartition(f, refs): InputPartition)
    }.flatten.toArray
  override def createReaderFactory(): PartitionReaderFactory =
    McapMetadataReaderFactory()
}

private[mcap] final case class McapMetadataFilePartition(file: String,
    refs: Seq[(Long, Long)]) extends InputPartition

private[mcap] final case class McapMetadataReaderFactory()
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[McapMetadataFilePartition]
    new PartitionReader[InternalRow] {
      private val rows = part.refs.iterator.flatMap { case (off, len) =>
        val (name, kv) = McapFormat.parseMetadata(
          McapIO.readPayload(part.file, off, len))
        kv.iterator.map { case (k, v) =>
          InternalRow(UTF8String.fromString(part.file),
            UTF8String.fromString(name), UTF8String.fromString(k),
            UTF8String.fromString(v))
        }
      }
      private var current: InternalRow = null
      override def next(): Boolean =
        rows.hasNext && { current = rows.next(); true }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
