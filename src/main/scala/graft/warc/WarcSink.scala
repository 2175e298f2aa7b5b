package graft.warc

import java.util
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._

/** DataSource V2 `warc` WRITE sink — the EXPORT direction of the
  * crawl pipeline, completing the fourth container's source/sink
  * pair (mcap, rosbag and db3 already write): curated or transformed
  * crawl data re-emitted as standard web-archive shards any WARC
  * toolchain (and this engine's own reader) consumes.
  *
  * ```scala
  * WarcExport.prepareConversion(clean, uri = col("target_uri"),
  *     text = col("text"), refersTo = col("record_id"))
  *   .write.format("warc").mode("overwrite").save("/out/wet")
  * ```
  *
  * The canonical use is the WET shape: `conversion` records carrying
  * extracted text, one per stored page, `WARC-Refers-To` pointing at
  * the source record — exactly how Common Crawl publishes its
  * extracted-text sidecar. The sink itself is record-agnostic: rows
  * carry the full record block (helpers in [[WarcExport]] build HTTP
  * response blocks and conversion records).
  *
  * Layout and commit protocol mirror the container sinks: one shard
  * file per non-empty task (`part-<p>-<task>-<job>.warc.gz`,
  * member-per-record gzip by default — the spec's recommendation and
  * what the strict reader verifies member-by-member), written to a
  * dotted in-progress name and promoted by rename on task commit;
  * batch `overwrite` captures the pre-existing shard list BEFORE any
  * task writes and deletes it only after every task committed, so a
  * crash mid-job leaves the old generation fully readable. Streaming
  * writes name files `part-<p>-q<query8>-e<epoch>.warc.gz`
  * DELIBERATELY deterministically: an epoch replay replaces its
  * previous attempt's file instead of duplicating it — the
  * exactly-once contract shared with the mcap/rosbag/db3 sinks.
  *
  * Record ids: an explicit `record_id` column wins; empty ids get a
  * DETERMINISTIC name-UUID of (uri, date, payload) so an epoch replay
  * regenerates byte-identical records (a random UUID would make
  * "replace, don't duplicate" produce different bytes per attempt).
  *
  * The write spine IS the read schema (the mcap sink convention —
  * Spark's V2 write resolves the frame against the table schema, so
  * read-derived columns like `file_path`/`offset`/`http_status` ride
  * along as placeholders the writer ignores; [[WarcExport.prepare]]
  * fills them). `refers_to` and `payload_digest` round-trip to their
  * WARC headers — what the reader surfaces, the writer re-emits.
  */
class WarcWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var truncateFirst = false
  override def truncate(): WriteBuilder = { truncateFirst = true; this }

  override def build(): Write = {
    val schema = info.schema()
    def need(name: String, dt: DataType): Int = {
      val i = schema.fieldNames.indexOf(name)
      require(i >= 0, s"warc write needs a '$name' column " +
        "(WarcExport.prepare conforms arbitrary frames)")
      require(schema.fields(i).dataType == dt,
        s"warc write column '$name' must be $dt, got ${schema.fields(i).dataType}")
      i
    }
    def opt(name: String, dt: DataType): Int = {
      val i = schema.fieldNames.indexOf(name)
      if (i >= 0 && schema.fields(i).dataType == dt) i else -1
    }
    val ords = WarcWriteOrdinals(
      warcType = need("warc_type", StringType),
      targetUri = need("target_uri", StringType),
      contentType = need("content_type", StringType),
      recordId = need("record_id", StringType),
      warcDate = need("warc_date", StringType),
      payload = need("payload", BinaryType),
      refersTo = opt("refers_to", StringType),
      payloadDigest = opt("payload_digest", StringType))
    val gzip = Option(info.options().get("gzip")).forall(_.toBoolean)
    // cdx sidecars ON by default: an archive without its index is
    // sequential-scan-only; `option("cdx", "false")` opts out
    val cdx = Option(info.options().get("cdx")).forall(_.toBoolean)
    new WarcWrite(path, ords, gzip, truncateFirst, info.queryId(), cdx)
  }
}

private[warc] final case class WarcWriteOrdinals(warcType: Int, targetUri: Int,
    contentType: Int, recordId: Int, warcDate: Int, payload: Int,
    refersTo: Int = -1, payloadDigest: Int = -1)

class WarcWrite(path: String, ords: WarcWriteOrdinals, gzip: Boolean,
    truncateFirst: Boolean, queryId: String, cdx: Boolean = true)
    extends Write {
  override def toBatch: BatchWrite =
    new WarcBatchWrite(path, ords, gzip, truncateFirst, cdx)
  override def toStreaming
      : org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
    require(!truncateFirst,
      "warc streaming write supports the Append output mode only " +
        "(a shard directory cannot be truncated per epoch)")
    new WarcStreamingSinkWrite(path, ords, gzip, queryId, cdx)
  }
}

class WarcBatchWrite(dir: String, ords: WarcWriteOrdinals, gzip: Boolean,
    truncateFirst: Boolean, cdx: Boolean = true) extends BatchWrite {

  private val jobId = java.util.UUID.randomUUID().toString.take(8)

  // captured BEFORE any task writes — see the McapBatchWrite contract
  private val preExisting: Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(graft.ros.bag.RosbagIO.hadoopConf())
    if (truncateFirst && fs.exists(p))
      fs.listStatus(p).toSeq
        .filter(s => s.isFile && (WarcDataSource.isWarc(s.getPath.getName) ||
          s.getPath.getName.endsWith(".cdx")))
        .map(_.getPath.toString)
    else {
      if (!fs.exists(p)) { fs.mkdirs(p); () }
      Seq.empty
    }
  }

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    WarcWriterFactory(dir, jobId, ords, gzip, cdx)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(dir).getFileSystem(graft.ros.bag.RosbagIO.hadoopConf())
    preExisting.foreach { f =>
      require(fs.delete(new Path(f), false),
        s"warc overwrite: delete failed for $f")
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(dir).getFileSystem(graft.ros.bag.RosbagIO.hadoopConf())
    messages.foreach {
      case c: WarcFileCommit if c.path != null =>
        fs.delete(new Path(c.path), false)
        // a committed task published its sidecar too
        fs.delete(new Path(WarcCdx.sidecarPath(c.path)), false)
        ()
      case _ => ()
    }
  }
}

private[warc] final case class WarcWriterFactory(dir: String, jobId: String,
    ords: WarcWriteOrdinals, gzip: Boolean, cdx: Boolean)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new WarcDataWriter(dir, f"part-$partitionId%05d-$taskId-$jobId", ords, gzip,
      partitionId, cdx = cdx)
}

private[warc] final case class WarcFileCommit(path: String, rows: Long)
    extends WriterCommitMessage

class WarcStreamingSinkWrite(dir: String, ords: WarcWriteOrdinals,
    gzip: Boolean, queryId: String, cdx: Boolean = true)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  import org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory

  { // eager: the first epoch's tasks race mkdirs otherwise
    val p = new Path(dir)
    val fs = p.getFileSystem(graft.ros.bag.RosbagIO.hadoopConf())
    if (!fs.exists(p)) { fs.mkdirs(p); () }
  }

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : StreamingDataWriterFactory =
    WarcStreamWriterFactory(dir, queryId.take(8), ords, gzip, cdx)

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = ()

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(dir).getFileSystem(graft.ros.bag.RosbagIO.hadoopConf())
    messages.foreach {
      case c: WarcFileCommit if c.path != null =>
        fs.delete(new Path(c.path), false)
        fs.delete(new Path(WarcCdx.sidecarPath(c.path)), false)
        ()
      case _ => ()
    }
  }
}

private[warc] final case class WarcStreamWriterFactory(dir: String, qid: String,
    ords: WarcWriteOrdinals, gzip: Boolean, cdx: Boolean)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : DataWriter[InternalRow] =
    new WarcDataWriter(dir, f"part-$partitionId%05d-q$qid-e$epochId", ords,
      gzip, partitionId, attemptTag = s"-t$taskId", cdx = cdx)
}

/** One task's shard: record-at-a-time rendering (no whole-file
  * buffering — a shard is written in one pass at any size), each
  * record its own gzip member when `gzip`. With `cdx` (the default)
  * the writer tracks each record's exact byte range as it writes and
  * publishes a sorted CDXJ sidecar at task commit — the index costs
  * one pass of line buffering (entry-count-bounded, ~100 B/record),
  * never a re-read of the shard.
  */
class WarcDataWriter(dir: String, stem: String, ords: WarcWriteOrdinals,
    gzip: Boolean, partitionId: Int, attemptTag: String = "",
    cdx: Boolean = true)
    extends DataWriter[InternalRow] {

  private val ext = if (gzip) ".warc.gz" else ".warc"
  private val fs = new Path(dir).getFileSystem(graft.ros.bag.RosbagIO.hadoopConf())
  private val finalPath = new Path(dir, s"$stem$ext")
  // the tmp name carries the attempt tag — two live attempts of one
  // (partition, epoch) must never interleave into one file
  private val tmpPath = new Path(dir, s".$stem$attemptTag$ext.inprogress")

  // lazy: an empty partition leaves no file (empty shards are debris)
  private var stream: java.io.OutputStream = null
  private var rows = 0L
  private var written = 0L
  private val cdxEntries =
    if (cdx) Seq.newBuilder[WarcCdx.CdxEntry] else null

  /** Counts bytes at the FILE layer (below the per-record gzip, above
    * the fs stream) — the offsets the sidecar publishes are positions
    * in the final shard file.
    */
  private final class Counting(out: java.io.OutputStream)
      extends java.io.FilterOutputStream(out) {
    override def write(b: Int): Unit = { out.write(b); written += 1 }
    override def write(b: Array[Byte], off: Int, len: Int): Unit = {
      out.write(b, off, len); written += len
    }
  }

  private def nonNull(row: InternalRow, ord: Int, name: String): Unit =
    require(!row.isNullAt(ord), s"warc write: null '$name' " +
      s"(partition $partitionId); filter or default nulls before writing")

  override def write(row: InternalRow): Unit = {
    if (stream == null)
      stream = new Counting(
        new java.io.BufferedOutputStream(fs.create(tmpPath, true), 1 << 16))
    nonNull(row, ords.warcType, "warc_type")
    nonNull(row, ords.payload, "payload")
    nonNull(row, ords.warcDate, "warc_date")
    val uri = if (row.isNullAt(ords.targetUri)) ""
      else row.getUTF8String(ords.targetUri).toString
    val date = row.getUTF8String(ords.warcDate).toString
    val payload = row.getBinary(ords.payload)
    val explicitId = if (row.isNullAt(ords.recordId)) ""
      else row.getUTF8String(ords.recordId).toString
    val rid =
      if (explicitId.nonEmpty) explicitId
      else WarcExport.deterministicId(uri, date, payload)
    def hdr(ord: Int, name: String): Seq[(String, String)] =
      if (ord < 0 || row.isNullAt(ord)) Seq.empty
      else {
        val v = row.getUTF8String(ord).toString
        if (v.isEmpty) Seq.empty else Seq(name -> v)
      }
    val extra: Seq[(String, String)] =
      hdr(ords.refersTo, "WARC-Refers-To") ++
        hdr(ords.payloadDigest, "WARC-Payload-Digest")
    val rec = WarcFormat.WriteRecord(
      warcType = row.getUTF8String(ords.warcType).toString,
      targetUri = uri,
      block = payload,
      contentType = if (row.isNullAt(ords.contentType)) ""
        else row.getUTF8String(ords.contentType).toString,
      recordId = rid,
      date = date,
      extraHeaders = extra)
    val bytes = WarcFormat.renderRecord(rec, 0)
    val start = written
    if (gzip) {
      // member per record; the shield keeps the gzip close() (which
      // releases the member's native deflater) off the shard stream
      val gz = new java.util.zip.GZIPOutputStream(
        org.apache.commons.io.output.CloseShieldOutputStream.wrap(stream))
      gz.write(bytes); gz.close()
    } else stream.write(bytes)
    if (cdx)
      cdxEntries += WarcCdx.CdxEntry(WarcCdx.surtKey(uri),
        WarcCdx.timestamp14(date), uri, rows.toInt, start, written - start,
        finalPath.getName,
        digest = extra.collectFirst {
          case ("WARC-Payload-Digest", v) => v }.getOrElse(""))
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    if (stream == null) return WarcFileCommit(null, 0L)
    stream.close()
    // streaming epoch replays re-commit the same deterministic name:
    // replace, never duplicate
    if (fs.exists(finalPath)) fs.delete(finalPath, false)
    require(fs.rename(tmpPath, finalPath),
      s"warc write: rename $tmpPath -> $finalPath failed")
    // sidecar AFTER the shard: a reader that sees the index can
    // always fetch the bytes it addresses (the reverse would address
    // a half-renamed shard); epoch replays replace it with the shard
    if (cdx)
      WarcCdx.writeSidecar(finalPath.toString,
        cdxEntries.result().sortBy(e => (e.surt, e.timestamp)))
    WarcFileCommit(finalPath.toString, rows)
  }

  override def abort(): Unit = {
    if (stream != null) {
      try stream.close() catch { case _: java.io.IOException => () }
      fs.delete(tmpPath, false); ()
    }
  }

  override def close(): Unit = ()
}

/** Conform arbitrary frames to the warc write spine. */
object WarcExport {
  import org.apache.spark.sql.{Column, DataFrame}
  import org.apache.spark.sql.functions._

  // per-thread digester: getInstance-per-row would dominate the write
  // kernel on short records (the WarcDigest precedent)
  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** Deterministic record id: a name-UUID over (uri, date, payload) —
    * byte-identical across epoch replays, unlike a random UUID.
    */
  def deterministicId(uri: String, date: String,
      payload: Array[Byte]): String = {
    val md = md5.get()
    md.reset()
    md.update(uri.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    md.update(0.toByte)
    md.update(date.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    md.update(0.toByte)
    md.update(payload)
    "<urn:uuid:" + java.util.UUID.nameUUIDFromBytes(md.digest()) + ">"
  }

  /** Generic conform to the full read-spine schema: only `warcType`
    * and `payload` are semantically required; absent/null everything
    * else defaults (record ids to the deterministic name-UUID at
    * write time); read-derived placeholders (`file_path`, `offset`,
    * the http_* columns) are filled and ignored by the writer.
    */
  def prepare(df: DataFrame, warcType: Column, payload: Column,
      targetUri: Column = lit(""), contentType: Column = lit(""),
      recordId: Column = lit(""),
      warcDate: Column = lit("1970-01-01T00:00:00Z"),
      refersTo: Column = lit(null), payloadDigest: Column = lit(null))
      : DataFrame =
    df.select(
      lit("").as("file_path"),
      lit(0).as("offset"),
      coalesce(warcType.cast("string"), lit("")).as("warc_type"),
      coalesce(recordId.cast("string"), lit("")).as("record_id"),
      coalesce(warcDate.cast("string"), lit("1970-01-01T00:00:00Z"))
        .as("warc_date"),
      coalesce(targetUri.cast("string"), lit("")).as("target_uri"),
      coalesce(contentType.cast("string"), lit("")).as("content_type"),
      payloadDigest.cast("string").as("payload_digest"),
      refersTo.cast("string").as("refers_to"),
      lit(null).cast("int").as("http_status"),
      lit(null).cast("string").as("http_content_type"),
      lit(null).cast("string").as("http_content_encoding"),
      payload.cast("binary").as("payload"))

  /** The WET shape: one `conversion` record per row carrying
    * extracted text (UTF-8 entity bytes, `text/plain` content type),
    * `WARC-Refers-To` naming the source record when given — exactly
    * how Common Crawl publishes its extracted-text sidecar.
    */
  def prepareConversion(df: DataFrame, uri: Column, text: Column,
      refersTo: Column = lit(null),
      warcDate: Column = lit("1970-01-01T00:00:00Z")): DataFrame =
    prepare(df,
      warcType = lit("conversion"),
      payload = encode(text.cast("string"), "UTF-8"),
      targetUri = uri,
      contentType = lit("text/plain; charset=utf-8"),
      warcDate = warcDate,
      refersTo = refersTo)

  /** The response shape: wraps each body in an HTTP 200 head (the
    * [[WarcFormat.httpResponseBlock]] layout) via a deterministic
    * binary concat — one record per crawled document.
    */
  def prepareHttpResponse(df: DataFrame, uri: Column, body: Column,
      httpContentType: Column,
      warcDate: Column = lit("1970-01-01T00:00:00Z")): DataFrame = {
    val b = body.cast("binary")
    val head = concat(
      encode(concat(lit("HTTP/1.1 200 OK\r\nContent-Type: "),
        coalesce(httpContentType.cast("string"), lit("application/octet-stream")),
        lit("\r\nContent-Length: "), length(b).cast("string"),
        lit("\r\n\r\n")), "UTF-8"))
    prepare(df,
      warcType = lit("response"),
      payload = concat(head, b),
      targetUri = uri,
      contentType = lit("application/http; msgtype=response"),
      warcDate = warcDate)
  }
}
