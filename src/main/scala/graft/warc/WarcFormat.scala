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
  * member — the spec's recommendation, what Common Crawl ships).
  * [[StrictGzipStream]] reads the concatenated members with LOUD
  * failure semantics the JDK's `GZIPInputStream` lacks: the JDK
  * reader treats a corrupt or truncated subsequent member header as
  * clean EOF, which would let a truncated `.warc.gz` shard parse as
  * complete — records silently dropped, and in streaming the shard
  * committed with its tail permanently lost.
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

  /** (status, contentType, body) of an `application/http` block.
    * `remainingEncoding` is the part of the body's declared encoding
    * chain a decode could not / did not reverse — the POST-DECODE
    * verdict in both [[httpSplit]] modes. Under `decodeBody = true`,
    * "" means `body` IS plain entity bytes; under `decodeBody =
    * false` it only means the chain is fully reversible while `body`
    * stays in wire form (see [[httpSplit]]). Unknown content-codings
    * (br, zstd) surface the raw bytes WITH their name instead of
    * failing the shard or — worse — letting compressed bytes
    * masquerade as text (the silent-mojibake failure the
    * loud-truncation contract exists to prevent).
    */
  final case class HttpPayload(status: Int, contentType: String,
      body: Array[Byte], remainingEncoding: String = "")

  /** Strict concatenated-gzip reader (RFC 1952) for `.warc.gz`
    * shards. Differences from `java.util.zip.GZIPInputStream`, all in
    * service of the module's fail-loudly contract:
    *
    *  - a member truncated mid-deflate-stream throws
    *    [[IllegalArgumentException]] (the JDK throws a bare
    *    `EOFException` that upstream clean-EOF handling can swallow);
    *  - a malformed SUBSEQUENT member header throws (the JDK treats it
    *    as clean EOF, silently dropping every record after it);
    *  - each member's CRC32 and ISIZE trailer is verified (the JDK
    *    does this too, but only for members it doesn't drop).
    *
    * Clean EOF is exactly: the underlying stream exhausted at a
    * member boundary.
    */
  final class StrictGzipStream(under: InputStream) extends InputStream {
    private val inf = new java.util.zip.Inflater(true)
    private val crc = new java.util.zip.CRC32
    private val inBuf = new Array[Byte](1 << 16)
    private var inLen = 0
    private var inPos = 0
    private var memberOpen = false
    private var memberOut = 0L
    private var eos = false
    private var underRead = 0L
    private var memberStartPos = 0L

    /** COMPRESSED byte position of the current parse point — exact at
      * member boundaries (mid-member the inflater owns the buffered
      * window, so only boundary reads consult this). The CDX indexer's
      * source of (offset, length).
      */
    def compressedPos: Long = underRead - (inLen - inPos)

    /** Compressed start offset of the current/last member. */
    def memberStart: Long = memberStartPos

    /** Single-member mode: read() returns -1 at each member END
      * instead of opening the next member; [[nextMember]] advances.
      * Lets the CDX indexer attribute exact (offset, length) byte
      * ranges to each member without re-implementing the strict
      * header/trailer verification.
      */
    var memberLimit = false

    /** Open the next member when in [[memberLimit]] mode; false at
      * clean EOF. A no-op (true) if a member is already open.
      */
    def nextMember(): Boolean = {
      if (eos) return false
      if (memberOpen) return true
      if (openMember()) true else { eos = true; false }
    }

    /** Bytes buffered and unread, refilling if empty; -1 at EOF. */
    private def avail(): Int = {
      if (inPos < inLen) return inLen - inPos
      inLen = under.read(inBuf, 0, inBuf.length)
      inPos = 0
      if (inLen < 0) { inLen = 0; -1 }
      else { underRead += inLen; inLen }
    }

    private def byteOr(what: String): Int = {
      if (avail() < 0) throw new IllegalArgumentException(
        s"warc.gz truncated in $what")
      val b = inBuf(inPos) & 0xff
      inPos += 1
      b
    }

    /** Parse one member header; false = clean EOF at the boundary. */
    private def openMember(): Boolean = {
      if (avail() < 0) return false
      memberStartPos = compressedPos
      val m1 = byteOr("gzip magic")
      val m2 = byteOr("gzip magic")
      if (m1 != 0x1f || m2 != 0x8b) throw new IllegalArgumentException(
        f"warc.gz: bad gzip member magic 0x$m1%02x$m2%02x — corrupt " +
          "shard or truncated member header")
      val cm = byteOr("gzip header")
      if (cm != 8) throw new IllegalArgumentException(
        s"warc.gz: unsupported gzip compression method $cm")
      val flg = byteOr("gzip header")
      var i = 0
      while (i < 6) { byteOr("gzip header"); i += 1 } // MTIME, XFL, OS
      if ((flg & 0x04) != 0) {                         // FEXTRA
        val xlen = byteOr("gzip FEXTRA") | (byteOr("gzip FEXTRA") << 8)
        var j = 0
        while (j < xlen) { byteOr("gzip FEXTRA"); j += 1 }
      }
      if ((flg & 0x08) != 0)                           // FNAME
        while (byteOr("gzip FNAME") != 0) ()
      if ((flg & 0x10) != 0)                           // FCOMMENT
        while (byteOr("gzip FCOMMENT") != 0) ()
      if ((flg & 0x02) != 0) { byteOr("gzip FHCRC"); byteOr("gzip FHCRC") }
      inf.reset(); crc.reset(); memberOut = 0L
      memberOpen = true
      true
    }

    /** Reclaim the inflater's unconsumed lookahead, verify the 8-byte
      * trailer, reset for the next member.
      */
    private def closeMember(): Unit = {
      inPos = inLen - inf.getRemaining
      val crcRead = byteOr("gzip trailer").toLong |
        (byteOr("gzip trailer").toLong << 8) |
        (byteOr("gzip trailer").toLong << 16) |
        (byteOr("gzip trailer").toLong << 24)
      val isize = byteOr("gzip trailer").toLong |
        (byteOr("gzip trailer").toLong << 8) |
        (byteOr("gzip trailer").toLong << 16) |
        (byteOr("gzip trailer").toLong << 24)
      if (crcRead != crc.getValue) throw new IllegalArgumentException(
        f"warc.gz: member CRC mismatch (stored 0x$crcRead%08x, " +
          f"computed 0x${crc.getValue}%08x) — corrupt shard")
      if (isize != (memberOut & 0xffffffffL)) throw new IllegalArgumentException(
        s"warc.gz: member ISIZE mismatch (stored $isize, " +
          s"inflated ${memberOut & 0xffffffffL}) — corrupt shard")
      memberOpen = false
    }

    // reused: readLine consumes header bytes one at a time, and an
    // allocation per byte would dominate the header parse (the reader
    // is single-threaded per partition, like the JDK's own field)
    private val one = new Array[Byte](1)
    override def read(): Int = {
      val n = read(one, 0, 1)
      if (n < 0) -1 else one(0) & 0xff
    }

    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (len == 0) return 0
      while (true) {
        if (eos) return -1
        if (!memberOpen) {
          if (memberLimit) return -1 // boundary: caller advances
          if (!openMember()) { eos = true; return -1 }
        }
        if (inf.needsInput && !inf.finished) {
          if (avail() < 0) throw new IllegalArgumentException(
            "warc.gz: member truncated mid-deflate stream")
          inf.setInput(inBuf, inPos, inLen - inPos)
          inPos = inLen // the inflater owns the window; reclaimed at close
        }
        val n = inf.inflate(b, off, len)
        if (n > 0) { crc.update(b, off, n); memberOut += n; return n }
        if (inf.finished) { // then loop into the next member (or stop
          closeMember()     // at the boundary under memberLimit)
          if (memberLimit) return -1
        }
        else if (!inf.needsInput) throw new IllegalArgumentException(
          "warc.gz: inflater stalled (preset-dictionary deflate?) — " +
            "not a gzip member stream")
      }
      -1 // unreachable
    }

    override def close(): Unit = {
      inf.end()
      under.close()
    }
  }

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
    *
    * Clean EOF is detected by a one-byte probe at record START (after
    * padding): a -1 there means the previous record was the last one.
    * An EOF anywhere PAST the probe is mid-record truncation and
    * fails loudly — the old shape (catching `EOFException` around the
    * version-line read) also swallowed the gzip layer's
    * truncated-member `EOFException`, parsing a cut-short shard as
    * complete.
    */
  def readRecord(in: InputStream, ordinal: Int): Option[WarcRecord] = {
    var first = in.read()
    while (first == '\r' || first == '\n') first = in.read() // padding
    if (first == -1) return None
    val version =
      try first.toChar.toString + readLine(in)
      catch {
        case _: EOFException => throw new IllegalArgumentException(
          s"warc record $ordinal truncated mid version line")
      }
    require(version.startsWith("WARC/"),
      s"expected a WARC version line, got '${version.take(40)}' " +
        s"(record $ordinal)")
    val headers = scala.collection.mutable.LinkedHashMap[String, String]()
    try {
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
    } catch {
      case _: EOFException => throw new IllegalArgumentException(
        s"warc record $ordinal truncated mid named-field block")
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
    *
    * `decodeBody = true` additionally reverses the body's declared
    * wire encodings — `Transfer-Encoding: chunked` framing first (the
    * message layer), then `Content-Encoding: gzip/deflate` (the
    * entity layer) — so `payload` carries the entity bytes a text
    * pipeline actually wants. Common Crawl strips both before
    * writing, but self-recorded crawls (Heritrix, wget) store the
    * wire form; without this path `html_text` over a gzipped body
    * silently yields mojibake. Corrupt framing or a truncated deflate
    * stream FAILS LOUDLY; encodings the reader cannot reverse (br,
    * zstd) keep the raw bytes and surface the leftover chain in
    * [[HttpPayload.remainingEncoding]]. With `decodeBody = false`
    * (payload not projected) the body is split but left as-is —
    * status/content-type filters never pay for an inflate. In BOTH
    * modes `remainingEncoding` is the POST-DECODE verdict (what a
    * decode would leave / did leave): "" means the declared chain is
    * fully reversible, NOT that `body` already holds plain entity
    * bytes — under `decodeBody = false` a gzip body comes back still
    * gzipped with `remainingEncoding == ""`. Direct callers that
    * consume `body` must pass `decodeBody = true`; the two modes
    * agree on the verdict by construction so a header-only projection
    * and a payload projection can never report different chains.
    */
  def httpSplit(block: Array[Byte],
      decodeBody: Boolean = false): Option[HttpPayload] = {
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
    def header(name: String): String = {
      val p = name + ":"
      lines.drop(1).collectFirst {
        case l if l.toLowerCase.startsWith(p) =>
          l.substring(l.indexOf(':') + 1).trim
      }.getOrElse("")
    }
    val contentType = header("content-type")
    val body = java.util.Arrays.copyOfRange(block, split + 4, block.length)
    val transferEnc = header("transfer-encoding")
    val contentEnc = header("content-encoding")
    if (decodeBody) {
      val (decoded, remaining) = decodePayload(body, transferEnc, contentEnc)
      Some(HttpPayload(status, contentType, decoded, remaining))
    } else
      Some(HttpPayload(status, contentType, body,
        remainingChain(transferEnc, contentEnc)))
  }

  private def encTokens(h: String): Seq[String] =
    if (h.isEmpty) Seq.empty
    else h.split(',').toSeq.map(_.trim.toLowerCase).filter(_.nonEmpty)
      .filterNot(_ == "identity")

  // what each LAYER's decode loop actually reverses: chunked framing
  // is a transfer-coding only — a (buggy) `Content-Encoding: chunked`
  // is NOT decodable there, and remainingChain must say so or the
  // header-only projection would report a different verdict than the
  // payload-decoding path
  private def teDecodable(tok: String): Boolean =
    tok == "gzip" || tok == "x-gzip" || tok == "deflate" || tok == "chunked"
  private def ctDecodable(tok: String): Boolean =
    tok == "gzip" || tok == "x-gzip" || tok == "deflate"

  /** The declared encoding chain the reader will NOT reverse, without
    * touching the body: derivable from the headers alone, so a
    * projection of `http_content_encoding` WITHOUT `payload` reports
    * the same verdict the decode path would. Transfer layer leftovers
    * are prefixed `te:` to keep the (theoretical) namespace collision
    * between transfer- and content-codings visible. Encodings are
    * reversed right-to-left (innermost applied first), so a chain
    * stops being decodable at the first unknown token FROM THE RIGHT.
    */
  private[warc] def remainingChain(transferEnc: String,
      contentEnc: String): String = {
    val ct = encTokens(contentEnc)
    val ctCut = ct.lastIndexWhere(!ctDecodable(_)) + 1 // 0 = whole chain ok
    val ctLeft = ct.take(ctCut)
    val te = encTokens(transferEnc)
    // wire nesting is transfer OUTSIDE content: the transfer layer
    // decodes first; a transfer leftover therefore blocks the whole
    // content layer beneath it (the entity bytes are still framed),
    // exactly as decodePayload's loops behave
    val teCut = te.lastIndexWhere(!teDecodable(_)) + 1
    val teLeft = te.take(teCut)
    val ctLeftAll = if (teLeft.nonEmpty) ct else ctLeft
    (teLeft.map("te:" + _) ++ ctLeftAll).mkString(",")
  }

  /** Reverse the declared encodings (see [[httpSplit]]): transfer
    * layer right-to-left, then content layer right-to-left, stopping
    * at the first token the reader cannot reverse; returns the body
    * and the leftover chain in [[remainingChain]]'s format.
    */
  private[warc] def decodePayload(body: Array[Byte], transferEnc: String,
      contentEnc: String): (Array[Byte], String) = {
    var b = body
    val te = encTokens(transferEnc)
    var teLeft = te
    var stopped = false
    while (teLeft.nonEmpty && !stopped) {
      teLeft.last match {
        case "chunked" => b = dechunk(b); teLeft = teLeft.init
        case "gzip" | "x-gzip" => b = gunzipStrict(b); teLeft = teLeft.init
        case "deflate" => b = inflateAuto(b); teLeft = teLeft.init
        case _ => stopped = true
      }
    }
    var ctLeft = encTokens(contentEnc)
    if (teLeft.isEmpty) {
      stopped = false
      while (ctLeft.nonEmpty && !stopped) {
        ctLeft.last match {
          case "gzip" | "x-gzip" => b = gunzipStrict(b); ctLeft = ctLeft.init
          case "deflate" => b = inflateAuto(b); ctLeft = ctLeft.init
          case _ => stopped = true
        }
      }
    }
    (b, (teLeft.map("te:" + _) ++ ctLeft).mkString(","))
  }

  /** De-frame `Transfer-Encoding: chunked` (RFC 7230 §4.1): hex size
    * line (chunk extensions after ';' ignored), chunk octets, CRLF,
    * repeated to the 0-size last-chunk; trailer fields through the
    * final blank line are consumed and dropped. Malformed framing or
    * truncation FAILS LOUDLY — a half-dechunked page is training data
    * silently corrupted.
    */
  private[warc] def dechunk(body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(body.length)
    var i = 0
    def line(what: String): String = {
      val at = {
        var j = i
        var found = -1
        while (found < 0 && j + 1 < body.length) {
          if (body(j) == '\r' && body(j + 1) == '\n') found = j
          j += 1
        }
        found
      }
      if (at < 0) throw new IllegalArgumentException(
        s"chunked body truncated in $what at offset $i")
      val s = new String(body, i, at - i, UTF_8)
      i = at + 2
      s
    }
    var done = false
    while (!done) {
      val sizeLine = line("chunk size line")
      val hex = sizeLine.indexOf(';') match {
        case -1 => sizeLine.trim
        case k => sizeLine.substring(0, k).trim
      }
      val n = try Integer.parseInt(hex, 16) catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"malformed chunk size line '${sizeLine.take(40)}'")
      }
      if (n < 0) throw new IllegalArgumentException(
        s"negative chunk size in '$sizeLine'")
      if (n == 0) done = true
      else {
        if (i + n > body.length) throw new IllegalArgumentException(
          s"chunked body truncated: chunk of $n octets at offset $i " +
            s"overruns the ${body.length}-byte body")
        out.write(body, i, n)
        i += n
        if (i + 1 >= body.length || body(i) != '\r' || body(i + 1) != '\n')
          throw new IllegalArgumentException(
            s"chunk of $n octets not terminated by CRLF at offset $i")
        i += 2
      }
    }
    // trailer section: header lines through one blank line; absent
    // trailers mean the next line IS the blank terminator. Tolerate a
    // missing final CRLF at end-of-body (some writers drop it).
    var trailerDone = i >= body.length
    while (!trailerDone) {
      val t = line("trailer section")
      if (t.isEmpty) trailerDone = true
      else if (i >= body.length) trailerDone = true
    }
    out.toByteArray
  }

  /** Strict gunzip via [[StrictGzipStream]] — truncated members,
    * trailing garbage and CRC mismatches all throw.
    */
  private[warc] def gunzipStrict(body: Array[Byte]): Array[Byte] = {
    val in = new StrictGzipStream(new java.io.ByteArrayInputStream(body))
    val out = new ByteArrayOutputStream(body.length * 3)
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  /** `Content-Encoding: deflate` officially means zlib-wrapped (RFC
    * 7230 references RFC 1950), but a well-known population of
    * servers ships RAW deflate under the same name — browsers accept
    * both, so the reader does too: zlib first, raw on a zlib header
    * mismatch. A stream that fails BOTH, or ends before the deflate
    * stream does, throws.
    */
  private[warc] def inflateAuto(body: Array[Byte]): Array[Byte] = {
    def run(raw: Boolean): Array[Byte] = {
      val inf = new java.util.zip.Inflater(raw)
      try {
        inf.setInput(body)
        val out = new ByteArrayOutputStream(body.length * 3)
        val buf = new Array[Byte](8192)
        while (!inf.finished()) {
          val n = inf.inflate(buf)
          if (n > 0) out.write(buf, 0, n)
          else if (inf.needsInput() || inf.needsDictionary())
            throw new IllegalArgumentException(
              "deflate body truncated mid-stream")
        }
        out.toByteArray
      } finally inf.end()
    }
    // a zlib stream starts with CMF 0x78 (CM=8, CINFO<=7) — cheap
    // header sniff picks the right mode without a speculative parse
    // that could ACCEPT garbage; the fallback covers CINFO variants
    val zlibLikely = body.length >= 2 && (body(0) & 0x0f) == 8 &&
      ((((body(0) & 0xff) << 8) | (body(1) & 0xff)) % 31 == 0)
    try run(raw = !zlibLikely)
    catch {
      case e: java.util.zip.DataFormatException =>
        try run(raw = zlibLikely)
        catch {
          case _: java.util.zip.DataFormatException =>
            throw new IllegalArgumentException(
              s"corrupt deflate body (both zlib and raw modes fail): " +
                s"${e.getMessage}")
        }
    }
  }

  // ---- writer (fixtures + the export utility) ----

  /** One record to write: block = the full block bytes.
    * `extraHeaders` are rendered verbatim after the standard named
    * fields (revisit fixtures carry WARC-Payload-Digest /
    * WARC-Refers-To / WARC-Profile here).
    */
  final case class WriteRecord(warcType: String, targetUri: String,
      block: Array[Byte], contentType: String = "",
      recordId: String = "", date: String = "2024-01-01T00:00:00Z",
      extraHeaders: Seq[(String, String)] = Seq.empty)

  /** Wrap an HTTP 200 response head around a body — the shape one
    * response record per crawled document takes. `extraHeaders` go in
    * verbatim (fixtures declare Content-/Transfer-Encoding here; the
    * body bytes must already BE in that wire form — see [[gzipBody]],
    * [[deflateBody]], [[chunkedBody]]).
    */
  def httpResponseBlock(body: Array[Byte],
      contentType: String = "text/plain; charset=utf-8",
      extraHeaders: Seq[String] = Seq.empty): Array[Byte] = {
    val head = s"HTTP/1.1 200 OK\r\nContent-Type: $contentType\r\n" +
      extraHeaders.map(_ + "\r\n").mkString +
      s"Content-Length: ${body.length}\r\n\r\n"
    val hb = head.getBytes(UTF_8)
    val out = new Array[Byte](hb.length + body.length)
    System.arraycopy(hb, 0, out, 0, hb.length)
    System.arraycopy(body, 0, out, hb.length, body.length)
    out
  }

  /** One-member gzip of an entity body (`Content-Encoding: gzip`). */
  def gzipBody(body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(body.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(body); gz.close()
    out.toByteArray
  }

  /** zlib-wrapped deflate (`Content-Encoding: deflate`, the RFC
    * form); `raw = true` emits the header-less stream the well-known
    * buggy-server population ships under the same name.
    */
  def deflateBody(body: Array[Byte], raw: Boolean = false): Array[Byte] = {
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, raw)
    try {
      d.setInput(body); d.finish()
      val out = new ByteArrayOutputStream(body.length / 2 + 64)
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  /** Frame a body as `Transfer-Encoding: chunked` (RFC 7230 §4.1),
    * one chunk per `chunkSize` octets plus the 0-size last-chunk and
    * empty trailer section.
    */
  def chunkedBody(body: Array[Byte], chunkSize: Int = 512): Array[Byte] = {
    require(chunkSize > 0, s"chunk size must be positive: $chunkSize")
    val out = new ByteArrayOutputStream(body.length + 64)
    var i = 0
    while (i < body.length) {
      val n = math.min(chunkSize, body.length - i)
      out.write(s"${n.toHexString}\r\n".getBytes(UTF_8))
      out.write(body, i, n)
      out.write("\r\n".getBytes(UTF_8))
      i += n
    }
    out.write("0\r\n\r\n".getBytes(UTF_8))
    out.toByteArray
  }

  private[warc] def renderRecord(r: WriteRecord, ordinal: Int): Array[Byte] = {
    val id = if (r.recordId.nonEmpty) r.recordId
      else s"<urn:uuid:fixture-$ordinal>"
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append(s"WARC-Type: ${r.warcType}\r\n")
    sb.append(s"WARC-Record-ID: $id\r\n")
    sb.append(s"WARC-Date: ${r.date}\r\n")
    if (r.targetUri.nonEmpty) sb.append(s"WARC-Target-URI: ${r.targetUri}\r\n")
    if (r.contentType.nonEmpty) sb.append(s"Content-Type: ${r.contentType}\r\n")
    r.extraHeaders.foreach { case (k, v) => sb.append(s"$k: $v\r\n") }
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
        // close(), not finish(): finish alone leaves the member's
        // native Deflater for GC finalization — one leaked context per
        // record on a large export. Closing the BAOS is a no-op.
        gz.write(bytes); gz.close()
      } else out.write(bytes)
    }
    out.toByteArray
  }
}
