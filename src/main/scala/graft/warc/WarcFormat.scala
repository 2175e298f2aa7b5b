package graft.warc

import java.io.{ByteArrayOutputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets.UTF_8

/** WARC (Web ARChive, ISO 28500 / IIPC warc-specifications) container
  * parsing and fixture writing — the wire format of Common Crawl and
  * every major web-archive corpus, i.e. the canonical INGESTION format
  * of a large-scale text-training pipeline.
  *
  * A WARC file is a sequence of records:
  *
  * ```
  * WARC/1.0\r\n
  * Name: value\r\n ...          (named fields; folding continuations)
  * \r\n
  * <Content-Length octets of block>
  * \r\n\r\n
  * ```
  *
  * `.warc.gz` files compress RECORD-AT-TIME (each record its own gzip
  * member — the spec's recommendation, what Common Crawl ships);
  * `java.util.zip.GZIPInputStream` reads concatenated members
  * transparently, so one sequential stream serves both layouts.
  *
  * `response` records carry an HTTP message as their block
  * (`Content-Type: application/http; msgtype=response`): status line +
  * headers + `\r\n\r\n` + body. [[httpSplit]] separates them so the
  * BODY (the html/text a pipeline actually wants) is a first-class
  * column and the status/content-type are filterable without user-side
  * byte surgery.
  *
  * Malformed framing FAILS LOUDLY (missing version line, non-numeric
  * Content-Length, truncated block): a corrupt crawl shard silently
  * skipped is training data silently lost.
  */
object WarcFormat {

  /** One parsed record: `offset` is the record ordinal within the
    * file (gzip members are not byte-addressable after decompression,
    * so the ordinal — not a byte position — is the stable identity).
    */
  final case class WarcRecord(offset: Int, warcType: String,
      recordId: String, date: String, targetUri: String,
      contentType: String, headers: Map[String, String],
      block: Array[Byte])

  /** (status, contentType, body) of an `application/http` block. */
  final case class HttpPayload(status: Int, contentType: String,
      body: Array[Byte])

  private def readLine(in: InputStream): String = {
    val buf = new ByteArrayOutputStream(64)
    var prev = -1
    var c = in.read()
    while (c != -1) {
      if (prev == '\r' && c == '\n') {
        val bytes = buf.toByteArray
        return new String(bytes, 0, bytes.length - 1, UTF_8)
      }
      buf.write(c); prev = c; c = in.read()
    }
    if (buf.size() == 0) throw new EOFException("eof")
    new String(buf.toByteArray, UTF_8)
  }

  private def readFully(in: InputStream, n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val k = in.read(out, off, n - off)
      if (k < 0) throw new IllegalArgumentException(
        s"warc block truncated: got $off of $n declared octets")
      off += k
    }
    out
  }

  /** Parse the NEXT record off the stream, or None at clean EOF.
    * Tolerates extra CRLFs between records (some writers pad) and a
    * missing final record terminator at EOF; everything else is loud.
    */
  def readRecord(in: InputStream, ordinal: Int): Option[WarcRecord] = {
    var version: String = null
    try {
      version = readLine(in)
      while (version != null && version.isEmpty) version = readLine(in)
    } catch { case _: EOFException => return None }
    require(version.startsWith("WARC/"),
      s"expected a WARC version line, got '${version.take(40)}' " +
        s"(record $ordinal)")
    val headers = scala.collection.mutable.LinkedHashMap[String, String]()
    var last: String = null
    var line = readLine(in)
    while (line.nonEmpty) {
      if ((line.startsWith(" ") || line.startsWith("\t")) && last != null)
        headers(last) = headers(last) + " " + line.trim // folding
      else line.indexOf(':') match {
        case -1 => throw new IllegalArgumentException(
          s"malformed warc header line '${line.take(60)}' (record $ordinal)")
        case i =>
          last = line.substring(0, i).trim.toLowerCase
          headers(last) = line.substring(i + 1).trim
      }
      line = readLine(in)
    }
    val len = headers.getOrElse("content-length", throw
      new IllegalArgumentException(s"record $ordinal missing Content-Length"))
    val n = try len.toInt catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"record $ordinal has non-numeric Content-Length '$len'")
    }
    val block = readFully(in, n)
    // consume the record terminator (\r\n\r\n); tolerate EOF after the
    // final record
    try { readLine(in); () } catch { case _: EOFException => () }
    try { readLine(in); () } catch { case _: EOFException => () }
    Some(WarcRecord(ordinal,
      headers.getOrElse("warc-type", ""),
      headers.getOrElse("warc-record-id", ""),
      headers.getOrElse("warc-date", ""),
      headers.getOrElse("warc-target-uri", ""),
      headers.getOrElse("content-type", ""),
      headers.toMap, block))
  }

  /** Iterate a whole stream (caller closes it). */
  def records(in: InputStream): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      private var ordinal = 0
      private var nextRec: Option[WarcRecord] = fetch()
      private def fetch(): Option[WarcRecord] = {
        val r = readRecord(in, ordinal)
        if (r.isDefined) ordinal += 1
        r
      }
      override def hasNext: Boolean = nextRec.isDefined
      override def next(): WarcRecord = {
        val r = nextRec.get; nextRec = fetch(); r
      }
    }

  /** Split an `application/http` block into status, Content-Type and
    * body. None when the block carries no parseable HTTP head (the
    * caller then surfaces the raw block — truncated crawls exist).
    */
  def httpSplit(block: Array[Byte]): Option[HttpPayload] = {
    var i = 0
    var split = -1
    while (split < 0 && i + 3 < block.length) {
      if (block(i) == '\r' && block(i + 1) == '\n' &&
          block(i + 2) == '\r' && block(i + 3) == '\n') split = i
      i += 1
    }
    if (split < 0) return None
    val head = new String(block, 0, split, UTF_8)
    val lines = head.split("\r\n")
    val status = lines.headOption.map(_.split(" ")) match {
      case Some(parts) if parts.length >= 2 && parts(0).startsWith("HTTP/") =>
        try parts(1).toInt catch { case _: NumberFormatException => return None }
      case _ => return None
    }
    val contentType = lines.drop(1).collectFirst {
      case l if l.toLowerCase.startsWith("content-type:") =>
        l.substring(l.indexOf(':') + 1).trim
    }.getOrElse("")
    Some(HttpPayload(status, contentType,
      java.util.Arrays.copyOfRange(block, split + 4, block.length)))
  }

  // ---- writer (fixtures + the export utility) ----

  /** One record to write: block = the full block bytes. */
  final case class WriteRecord(warcType: String, targetUri: String,
      block: Array[Byte], contentType: String = "",
      recordId: String = "", date: String = "2024-01-01T00:00:00Z")

  /** Wrap an HTTP 200 response head around a body — the shape one
    * response record per crawled document takes.
    */
  def httpResponseBlock(body: Array[Byte],
      contentType: String = "text/plain; charset=utf-8"): Array[Byte] = {
    val head = s"HTTP/1.1 200 OK\r\nContent-Type: $contentType\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n"
    val hb = head.getBytes(UTF_8)
    val out = new Array[Byte](hb.length + body.length)
    System.arraycopy(hb, 0, out, 0, hb.length)
    System.arraycopy(body, 0, out, hb.length, body.length)
    out
  }

  private def renderRecord(r: WriteRecord, ordinal: Int): Array[Byte] = {
    val id = if (r.recordId.nonEmpty) r.recordId
      else s"<urn:uuid:fixture-$ordinal>"
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append(s"WARC-Type: ${r.warcType}\r\n")
    sb.append(s"WARC-Record-ID: $id\r\n")
    sb.append(s"WARC-Date: ${r.date}\r\n")
    if (r.targetUri.nonEmpty) sb.append(s"WARC-Target-URI: ${r.targetUri}\r\n")
    if (r.contentType.nonEmpty) sb.append(s"Content-Type: ${r.contentType}\r\n")
    sb.append(s"Content-Length: ${r.block.length}\r\n\r\n")
    val head = sb.toString.getBytes(UTF_8)
    val out = new ByteArrayOutputStream(head.length + r.block.length + 4)
    out.write(head); out.write(r.block)
    out.write("\r\n\r\n".getBytes(UTF_8))
    out.toByteArray
  }

  /** Serialize records; `gzipPerRecord` emits the spec's
    * member-per-record layout (what `.warc.gz` means in the wild).
    */
  def writeWarc(records: Seq[WriteRecord],
      gzipPerRecord: Boolean = false): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    records.zipWithIndex.foreach { case (r, i) =>
      val bytes = renderRecord(r, i)
      if (gzipPerRecord) {
        val gz = new java.util.zip.GZIPOutputStream(out)
        gz.write(bytes); gz.finish()
      } else out.write(bytes)
    }
    out.toByteArray
  }
}
