package graft.ros.mcap

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, EOFException, InputStream}

/** Pure-bytes reader/writer for the public MCAP container format
  * (https://mcap.dev/spec — the ROS 2 successor of the rosbag1 format
  * the reference converts; same role as `BagFormat` for `.bag`). An
  * MCAP file is `magic, records..., magic` where every record is
  * `opcode u8, length u64le, payload`; messages live either standalone
  * in the data section or inside compressed Chunk records, and a
  * Summary section before the Footer repeats the Schema/Channel
  * dimension records and per-chunk index entries — the parquet-footer
  * analog that lets a driver plan a scan without touching chunk bodies.
  *
  * Scope: batch read of Schema/Channel/Message/Chunk/ChunkIndex/
  * Footer/Statistics plus a writer for test fixtures. Compressions:
  * "" (none), "lz4" (LZ4 frame), "zstd" — both codecs ship with Spark.
  */
object McapFormat {
  val Magic: Array[Byte] =
    Array(0x89.toByte, 'M', 'C', 'A', 'P', '0', 0x0D, 0x0A)

  // record opcodes (spec §records)
  val OpHeader = 0x01; val OpFooter = 0x02; val OpSchema = 0x03
  val OpChannel = 0x04; val OpMessage = 0x05; val OpChunk = 0x06
  val OpMessageIndex = 0x07; val OpChunkIndex = 0x08
  val OpAttachment = 0x09; val OpAttachmentIndex = 0x0A
  val OpMetadata = 0x0C; val OpMetadataIndex = 0x0D
  val OpStatistics = 0x0B; val OpDataEnd = 0x0F; val OpSummaryOffset = 0x0E

  final case class McapSchema(id: Int, name: String, encoding: String, data: Array[Byte])
  final case class McapChannel(id: Int, schemaId: Int, topic: String,
                               messageEncoding: String)
  final case class McapMessage(channelId: Int, sequence: Long, logTime: Long,
                               publishTime: Long, data: Array[Byte])
  /** One Chunk record's plan-time identity: where it lives, its time
    * range (for pruning), and how to decode it.
    */
  final case class McapChunkRef(fileOffset: Long, recordLength: Long,
                                messageStartTime: Long, messageEndTime: Long,
                                compression: String, uncompressedSize: Long,
                                uncompressedCrc: Long)
  /** The summary Statistics record's count fields — what metadata-only
    * aggregate pushdown answers `count(*)` / per-channel counts from
    * (the parquet-row-count trust level: writer-stamped file metadata).
    */
  final case class McapStatistics(messageCount: Long,
                                  channelMessageCounts: Map[Int, Long],
                                  messageStartTime: Long = 0L,
                                  messageEndTime: Long = 0L)

  /** Driver-side index of one file: the dimension records, the chunk
    * refs, any STANDALONE (unchunked) message record locations, and
    * the summary Statistics when the writer emitted them.
    */
  final case class McapIndex(schemas: Map[Int, McapSchema],
                             channels: Map[Int, McapChannel],
                             chunks: Seq[McapChunkRef],
                             inlineMessages: Seq[(Long, Long)], // (offset, recordLength)
                             stats: Option[McapStatistics] = None,
                             // Attachment (0x09) / Metadata (0x0C)
                             // record locations as (offset, payloadLen)
                             // — bodies stay unread at plan time
                             // (attachments are calibration-blob-sized)
                             attachmentRefs: Seq[(Long, Long)] = Seq.empty,
                             metadataRefs: Seq[(Long, Long)] = Seq.empty)

  /** A robotics archive's side payload (op 0x09): calibration blobs,
    * URDFs, firmware dumps — named, media-typed, timestamped.
    */
  final case class McapAttachment(logTime: Long, createTime: Long,
                                  name: String, mediaType: String,
                                  data: Array[Byte], crc: Long)

  // ---- little-endian primitive readers over byte arrays ----

  def leShort(b: Array[Byte], o: Int): Int = (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  def leInt(b: Array[Byte], o: Int): Long =
    (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
      ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)
  def leLong(b: Array[Byte], o: Int): Long =
    leInt(b, o) | (leInt(b, o + 4) << 32)

  private def str(b: Array[Byte], o: Int): (String, Int) = {
    val n = leInt(b, o).toInt
    (new String(b, o + 4, n, java.nio.charset.StandardCharsets.UTF_8), o + 4 + n)
  }

  // ---- record payload parsers ----

  def parseSchema(p: Array[Byte]): McapSchema = {
    val id = leShort(p, 0)
    val (name, o1) = str(p, 2)
    val (enc, o2) = str(p, o1)
    val dataLen = leInt(p, o2).toInt
    McapSchema(id, name, enc, java.util.Arrays.copyOfRange(p, o2 + 4, o2 + 4 + dataLen))
  }

  def parseChannel(p: Array[Byte]): McapChannel = {
    val id = leShort(p, 0)
    val schemaId = leShort(p, 2)
    val (topic, o1) = str(p, 4)
    val (enc, _) = str(p, o1)
    // the metadata map (u32 byte-length prefixed) follows; the spine
    // read doesn't need it
    McapChannel(id, schemaId, topic, enc)
  }

  /** Header payload (op 0x01): (profile, library). */
  def parseHeader(p: Array[Byte]): (String, String) = {
    val (profile, o1) = str(p, 0)
    val (library, _) = str(p, o1)
    (profile, library)
  }

  /** The (profile, library) of whole-file bytes — the first record
    * after the leading magic must be the Header (spec §structure).
    */
  def headerOf(b: Array[Byte]): (String, String) = {
    require(b.length >= Magic.length + 9 && (b(Magic.length) & 0xFF) == OpHeader,
      "not an mcap file: no header record after the leading magic")
    val len = leLong(b, Magic.length + 1)
    // explicit bound: copyOfRange would zero-PAD past the array end
    // and a truncated header would silently parse as profile "".
    // Subtraction form — `off + len` would wrap for adversarial lens
    require(len >= 0 && len <= b.length - Magic.length - 9L,
      s"corrupt mcap: header record of $len bytes overruns the file")
    parseHeader(java.util.Arrays.copyOfRange(b,
      Magic.length + 9, Magic.length + 9 + len.toInt))
  }

  /** Attachment payload (spec §attachment): log_time u64, create_time
    * u64, name str, media_type str, data (u64 length-prefixed), crc
    * u32 over everything preceding it (0 = not computed).
    */
  def parseAttachment(p: Array[Byte]): McapAttachment = {
    val logTime = leLong(p, 0)
    val createTime = leLong(p, 8)
    val (name, o1) = str(p, 16)
    val (mediaType, o2) = str(p, o1)
    val dataLen = leLong(p, o2)
    require(dataLen >= 0 && o2 + 8 + dataLen + 4 <= p.length,
      s"corrupt mcap attachment: data length $dataLen overruns the record")
    val data = java.util.Arrays.copyOfRange(p, o2 + 8, (o2 + 8 + dataLen).toInt)
    val crc = leInt(p, (o2 + 8 + dataLen).toInt)
    if (crc != 0L) {
      val c = new java.util.zip.CRC32()
      c.update(p, 0, (o2 + 8 + dataLen).toInt)
      require(c.getValue == crc,
        f"corrupt mcap attachment '$name%s': crc 0x$crc%08x != computed 0x${c.getValue}%08x")
    }
    McapAttachment(logTime, createTime, name, mediaType, data, crc)
  }

  /** Metadata payload (spec §metadata): name str + a string→string
    * map (u32 byte-length prefixed), in record order.
    */
  def parseMetadata(p: Array[Byte]): (String, Seq[(String, String)]) = {
    val (name, o1) = str(p, 0)
    val mapLen = leInt(p, o1).toInt
    val end = o1 + 4 + mapLen
    require(mapLen >= 0 && end <= p.length,
      s"corrupt mcap metadata '$name': map length $mapLen overruns the record")
    val kv = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var o = o1 + 4
    while (o < end) {
      val (k, o2) = str(p, o)
      val (v, o3) = str(p, o2)
      kv += ((k, v))
      o = o3
    }
    (name, kv.toSeq)
  }

  def parseMessage(p: Array[Byte]): McapMessage =
    McapMessage(leShort(p, 0), leInt(p, 2), leLong(p, 6), leLong(p, 14),
      java.util.Arrays.copyOfRange(p, 22, p.length))

  /** Chunk payload HEADER (everything before the compressed records
    * bytes): returns the ref fields plus the offset of the records
    * bytes within the payload and their compressed length.
    */
  def parseChunkHeader(p: Array[Byte], fileOffset: Long, recordLength: Long)
      : (McapChunkRef, Int, Long) = {
    // the truncation guard must precede EVERY field read (a corrupt
    // record declaring len < 32 reaches leLong(p, 16) otherwise and
    // dies as a raw bounds error instead of this message); callers
    // hand a bounded header window (64 bytes) — a compression
    // identifier too long to fit must also fail as what it is, not as
    // an out-of-bounds read (the spec allows arbitrary strings but
    // decompress() supports ""/lz4/zstd, all far inside the window)
    require(p.length >= 32, s"chunk header truncated at offset $fileOffset")
    val startT = leLong(p, 0); val endT = leLong(p, 8)
    val uncSize = leLong(p, 16); val crc = leInt(p, 24)
    val compLen = leInt(p, 28)
    require(28 + 4 + compLen + 8 <= p.length,
      s"unsupported mcap chunk compression (identifier of $compLen bytes " +
        s"overruns the ${p.length}-byte header window) at offset $fileOffset")
    val (comp, o1) = str(p, 28)
    val recLen = leLong(p, o1)
    (McapChunkRef(fileOffset, recordLength, startT, endT, comp, uncSize, crc),
      o1 + 8, recLen)
  }

  /** Consume a Chunk record whose first `ph.length` bytes are already
    * read, decompress its records, and feed each in-chunk
    * Schema/Channel to the registrars. Shared by the no-summary batch
    * walk and the tolerant streaming walk so chunk parsing can never
    * drift between them (the registration POLICY — overwrite vs
    * first-wins — stays at the call site). Returns the chunk ref.
    */
  private def harvestChunk(in: DataInputStream, ph: Array[Byte],
      pos: Long, len: Long,
      onSchema: McapSchema => Unit, onChannel: McapChannel => Unit): McapChunkRef = {
    val (ref, recOff, recLen) = parseChunkHeader(ph, pos, len)
    val rest = new Array[Byte]((len - ph.length).toInt)
    in.readFully(rest)
    val full = ph ++ rest
    val comp = java.util.Arrays.copyOfRange(full, recOff, (recOff + recLen).toInt)
    chunkRecords(decompress(ref.compression, comp, ref.uncompressedSize,
      ref.uncompressedCrc)).foreach {
      case (OpSchema, p) => onSchema(parseSchema(p))
      case (OpChannel, p) => onChannel(parseChannel(p))
      case _ => ()
    }
    ref
  }

  /** Decompress a chunk's records bytes. Validates the chunk CRC when
    * the writer recorded one (0 = not computed, per spec).
    */
  def decompress(compression: String, bytes: Array[Byte], uncompressedSize: Long,
                 crc: Long): Array[Byte] = {
    val out = compression match {
      case "" => bytes
      case "zstd" =>
        com.github.luben.zstd.Zstd.decompress(bytes, uncompressedSize.toInt)
      case "lz4" =>
        val in = new net.jpountz.lz4.LZ4FrameInputStream(new ByteArrayInputStream(bytes))
        val buf = new Array[Byte](uncompressedSize.toInt)
        var read = 0
        try {
          var n = 0
          while (read < buf.length && n >= 0) {
            n = in.read(buf, read, buf.length - read)
            if (n > 0) read += n
          }
        } finally in.close()
        require(read == buf.length,
          s"lz4 chunk shorter than declared: $read of ${buf.length} bytes")
        buf
      case other =>
        throw new IllegalArgumentException(s"unsupported mcap chunk compression '$other'")
    }
    require(out.length == uncompressedSize,
      s"chunk decompressed to ${out.length} bytes, declared $uncompressedSize")
    if (crc != 0) {
      val c = new java.util.zip.CRC32(); c.update(out, 0, out.length)
      require(c.getValue == crc,
        f"chunk crc mismatch: computed ${c.getValue}%d, recorded $crc%d")
    }
    out
  }

  /** Iterate the records inside a DECOMPRESSED chunk buffer, yielding
    * (opcode, payload). Chunks legally contain Schema/Channel records
    * interleaved with Messages.
    */
  def chunkRecords(buf: Array[Byte]): Iterator[(Int, Array[Byte])] = new Iterator[(Int, Array[Byte])] {
    private var o = 0
    override def hasNext: Boolean = o + 9 <= buf.length
    override def next(): (Int, Array[Byte]) = {
      val op = buf(o) & 0xFF
      val len = leLong(buf, o + 1)
      require(len >= 0 && o + 9 + len <= buf.length,
        s"chunk record at $o overruns the buffer (op=$op len=$len of ${buf.length})")
      val p = java.util.Arrays.copyOfRange(buf, o + 9, (o + 9 + len).toInt)
      o = (o + 9 + len).toInt
      (op, p)
    }
  }

  /** Messages of a chunk in storage order, with any in-chunk Schema/
    * Channel records surfaced to the caller's maps first.
    */
  def chunkMessages(buf: Array[Byte]): Seq[McapMessage] =
    chunkRecords(buf).collect { case (OpMessage, p) => parseMessage(p) }.toSeq

  // ---- driver-side index scan ----

  /** Scan one file's index: MAGIC check, then the Summary section when
    * the Footer points at one (Schema/Channel/ChunkIndex read without
    * touching chunk bodies — the scalable path), plus a header-only
    * walk of the data section for standalone Message records and, when
    * NO summary exists (minimal writers, torn files), the chunk refs
    * and in-chunk dimension records harvested directly. `open` is
    * called for independent streams (seek via skip on a fresh stream).
    */
  def scanIndex(open: () => InputStream, fileLen: Long): McapIndex = {
    require(fileLen >= 8 + 9 + 20 + 8, s"file too short for mcap ($fileLen bytes)")
    val head = readAt(open, 0, 8)
    require(head.sameElements(Magic),
      "not an mcap file (bad leading magic); corrupt mcap input")
    val tail = readAt(open, fileLen - 8, 8)
    require(tail.sameElements(Magic),
      "corrupt mcap: bad trailing magic (truncated upload?)")
    // Footer record is FIXED SIZE (9-byte header + 20-byte payload)
    // immediately before the trailing magic
    val footer = readAt(open, fileLen - 8 - 29, 29)
    require((footer(0) & 0xFF) == OpFooter && leLong(footer, 1) == 20,
      "corrupt mcap: footer record not found before trailing magic")
    val summaryStart = leLong(footer, 9)

    val schemas = scala.collection.mutable.Map[Int, McapSchema]()
    val channels = scala.collection.mutable.Map[Int, McapChannel]()
    val chunksFromSummary = scala.collection.mutable.ArrayBuffer[McapChunkRef]()
    var statistics: Option[McapStatistics] = None

    if (summaryStart > 0) {
      // summary section runs to the footer record
      val sumLen = (fileLen - 8 - 29 - summaryStart).toInt
      val sum = readAt(open, summaryStart, sumLen)
      chunkRecords(sum).foreach {
        case (OpSchema, p) => val s = parseSchema(p); schemas(s.id) = s
        case (OpChannel, p) => val c = parseChannel(p); channels(c.id) = c
        case (OpChunkIndex, p) =>
          // message_start_time u64, message_end_time u64,
          // chunk_start_offset u64, chunk_length u64, then offsets map,
          // message_index_length u64, compression str, sizes
          val startT = leLong(p, 0); val endT = leLong(p, 8)
          val off = leLong(p, 16); val len = leLong(p, 24)
          // re-read the chunk record HEADER for compression/size/crc:
          // the index repeats them, but the chunk header is the single
          // source the executor decodes from — one parse, no skew
          val hdr = readAt(open, off, 9)
          require((hdr(0) & 0xFF) == OpChunk,
            s"chunk index points at non-chunk record (op=${hdr(0) & 0xFF}) at $off")
          val recLen = leLong(hdr, 1)
          require(recLen == len - 9,
            s"chunk index length $len disagrees with chunk record ${recLen + 9} at $off")
          // chunk header fields precede the records bytes; 64 bytes
          // covers times+size+crc+compression strings up to 28 chars
          val ph = readAt(open, off + 9, math.min(recLen, 64L).toInt)
          val (ref, _, _) = parseChunkHeader(ph, off, recLen)
          require(ref.messageStartTime == startT && ref.messageEndTime == endT,
            s"chunk index time range disagrees with chunk header at $off")
          chunksFromSummary += ref
        case (OpStatistics, p) =>
          // message_count u64, schema_count u16, channel_count u32,
          // attachment_count u32, metadata_count u32, chunk_count u32,
          // message_start_time u64, message_end_time u64,
          // channel_message_counts: u32 byteLen + (u16 id, u64 count)*
          // offsets: message_count@0, schema_count@8, channel_count@10,
          // attachment_count@14, metadata_count@18, chunk_count@22,
          // message_start_time@26, message_end_time@34, map byteLen@42
          val messageCount = leLong(p, 0)
          val startT = leLong(p, 26); val endT = leLong(p, 34)
          val mapLen = leInt(p, 42).toInt
          val counts = scala.collection.mutable.Map[Int, Long]()
          var o = 46
          val end = 46 + mapLen
          while (o + 10 <= end) {
            counts(leShort(p, o)) = leLong(p, o + 2)
            o += 10
          }
          statistics = Some(McapStatistics(messageCount, counts.toMap,
            startT, endT))
        case _ => () // SummaryOffset: not needed for planning
      }
    }

    // header-only walk of the data section: standalone messages always;
    // chunks + dimension records only when there was no summary
    val inline = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val attachRefs = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val metaRefs = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val chunksFromWalk = scala.collection.mutable.ArrayBuffer[McapChunkRef]()
    val in = new DataInputStream(open())
    try {
      skipFully(in, 8)
      var pos = 8L
      var done = false
      while (!done) {
        val op = in.read()
        if (op < 0) throw new EOFException("mcap ends without a footer record")
        val lenBuf = new Array[Byte](8); in.readFully(lenBuf)
        val len = leLong(lenBuf, 0)
        require(len >= 0 && pos + 9 + len <= fileLen,
          s"corrupt mcap: record at $pos overruns the file (op=$op len=$len)")
        op match {
          case OpFooter => done = true
          case OpMessage => inline += ((pos, len)); skipFully(in, len)
          case OpChunk if summaryStart == 0 =>
            val ph = new Array[Byte](math.min(len, 64L).toInt)
            in.readFully(ph)
            // harvest in-chunk Schema/Channel for the no-summary path
            chunksFromWalk += harvestChunk(in, ph, pos, len,
              s => schemas(s.id) = s, c => channels(c.id) = c)
          case OpSchema => // standalone dimension records (unchunked files)
            val p = new Array[Byte](len.toInt); in.readFully(p)
            val s = parseSchema(p); schemas.getOrElseUpdate(s.id, s)
          case OpChannel =>
            val p = new Array[Byte](len.toInt); in.readFully(p)
            val c = parseChannel(p); channels.getOrElseUpdate(c.id, c)
          case OpAttachment =>
            // location only — bodies are read by the side table's
            // executor-side scan, never at plan time
            attachRefs += ((pos, len)); skipFully(in, len)
          case OpMetadata =>
            metaRefs += ((pos, len)); skipFully(in, len)
          case _ => skipFully(in, len)
        }
        pos += 9 + len
      }
    } finally in.close()

    // sorted by file offset: chunk_idx must be the stable storage order
    // even for writers that emit ChunkIndex entries out of order
    McapIndex(schemas.toMap, channels.toMap,
      (if (summaryStart > 0) chunksFromSummary else chunksFromWalk)
        .sortBy(_.fileOffset).toSeq,
      inline.toSeq, statistics, attachRefs.toSeq, metaRefs.toSeq)
  }

  /** Resumable state of a TOLERANT data-section walk over a
    * still-growing file (live recorder / mid-upload): `pos` is the
    * offset after the last COMPLETE record consumed, `done` means the
    * Footer record was reached (the file is closed; nothing more can
    * legally append). The MCAP data section is append-only and records
    * are immutable once written, so a later walk resumes from `pos`
    * and only pays for NEW bytes — the per-trigger cost model the
    * streaming source needs.
    */
  final case class McapWalkState(pos: Long, done: Boolean,
      schemas: Map[Int, McapSchema], channels: Map[Int, McapChannel],
      chunks: Seq[McapChunkRef], inline: Seq[(Long, Long)]) {
    def index: McapIndex =
      McapIndex(schemas, channels, chunks.sortBy(_.fileOffset), inline)
  }

  /** Tolerant walk: like `scanIndex`'s fallback walk, but a record
    * whose header or body extends past `fileLen` is treated as a
    * PARTIAL APPEND still in flight — the walk stops at the last
    * complete record instead of throwing, and no trailing magic or
    * Footer is required. Complete-but-corrupt records (bad chunk crc,
    * non-mcap leading magic) still fail loudly: tolerance covers
    * growth, not corruption. In-chunk Schema/Channel records are
    * harvested (one decompression per NEW chunk — the same price the
    * no-summary batch walk pays), so dimension records that ride a
    * later chunk (a topic that starts mid-recording) are seen as soon
    * as their chunk completes.
    */
  def scanTolerant(open: () => InputStream, fileLen: Long,
                   resume: Option[McapWalkState] = None): McapWalkState = {
    resume match {
      case Some(s) if s.done => return s // closed file: nothing can append
      case _ => ()
    }
    val startPos = resume.map(_.pos).getOrElse(8L)
    // magic gate keyed on POSITION, not on resume-vs-fresh: a file
    // first observed at under 8 bytes returns pos=8 unvalidated, and a
    // resume-only gate would then skip the check forever — garbage
    // named *.mcap would parse from offset 8 instead of failing
    // loudly. pos == 8 means nothing has been parsed yet, so the
    // deferred first check runs here on whichever trigger first sees
    // 8 bytes; pos > 8 implies a prior call passed this gate.
    if (startPos == 8L) {
      if (fileLen < 8) return McapWalkState(8L, done = false,
        Map.empty, Map.empty, Seq.empty, Seq.empty)
      require(readAt(open, 0, 8).sameElements(Magic),
        "not an mcap file (bad leading magic); corrupt mcap input")
    }
    val schemas = scala.collection.mutable.Map[Int, McapSchema]() ++=
      resume.map(_.schemas).getOrElse(Map.empty)
    val channels = scala.collection.mutable.Map[Int, McapChannel]() ++=
      resume.map(_.channels).getOrElse(Map.empty)
    val chunks = scala.collection.mutable.ArrayBuffer[McapChunkRef]() ++=
      resume.map(_.chunks).getOrElse(Seq.empty)
    val inline = scala.collection.mutable.ArrayBuffer[(Long, Long)]() ++=
      resume.map(_.inline).getOrElse(Seq.empty)
    var pos = startPos
    var done = false
    val in = new DataInputStream(open())
    try {
      skipFully(in, pos)
      var stop = false
      while (!stop && !done && pos + 9 <= fileLen) {
        val op = in.read()
        if (op < 0) stop = true
        else {
          val lenBuf = new Array[Byte](8); in.readFully(lenBuf)
          val len = leLong(lenBuf, 0)
          if (len < 0 || pos + 9 + len > fileLen) stop = true // partial append
          else {
            op match {
              case OpFooter => done = true
              case OpMessage => inline += ((pos, len)); skipFully(in, len)
              case OpChunk =>
                val ph = new Array[Byte](math.min(len, 64L).toInt)
                in.readFully(ph)
                chunks += harvestChunk(in, ph, pos, len,
                  s => { schemas.getOrElseUpdate(s.id, s); () },
                  c => { channels.getOrElseUpdate(c.id, c); () })
              case OpSchema =>
                val p = new Array[Byte](len.toInt); in.readFully(p)
                val s = parseSchema(p); schemas.getOrElseUpdate(s.id, s); ()
              case OpChannel =>
                val p = new Array[Byte](len.toInt); in.readFully(p)
                val c = parseChannel(p); channels.getOrElseUpdate(c.id, c); ()
              case _ => skipFully(in, len)
            }
            pos += 9 + len
          }
        }
      }
    } finally in.close()
    McapWalkState(pos, done, schemas.toMap, channels.toMap, chunks.toSeq, inline.toSeq)
  }

  private def readAt(open: () => InputStream, off: Long, n: Int): Array[Byte] = {
    val in = open()
    try {
      in match {
        case s: org.apache.hadoop.fs.FSDataInputStream =>
          s.seek(off)
          val buf = new Array[Byte](n); s.readFully(buf); buf
        case s =>
          skipFully(s, off)
          val buf = new Array[Byte](n)
          val d = new DataInputStream(s); d.readFully(buf); buf
      }
    } finally in.close()
  }

  private def skipFully(in: InputStream, n: Long): Unit = {
    var left = n
    while (left > 0) {
      val s = in.skip(left)
      if (s > 0) left -= s
      else if (in.read() >= 0) left -= 1
      else throw new EOFException(s"mcap truncated while skipping ($left left)")
    }
  }

  // ---- fixture writer (tests + demos; mirrors BagFormat.writeBag) ----

  private[mcap] def wLeShort(o: ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xFF); o.write((v >> 8) & 0xFF)
  }
  private[mcap] def wLeInt(o: ByteArrayOutputStream, v: Long): Unit =
    (0 until 4).foreach(i => o.write(((v >> (8 * i)) & 0xFF).toInt))
  private[mcap] def wLeLong(o: ByteArrayOutputStream, v: Long): Unit =
    (0 until 8).foreach(i => o.write(((v >> (8 * i)) & 0xFF).toInt))
  private[mcap] def wStr(o: ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    wLeInt(o, b.length); o.write(b)
  }
  private[mcap] def record(op: Int, payload: Array[Byte]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    o.write(op); wLeLong(o, payload.length); o.write(payload)
    o.toByteArray
  }
  private[mcap] def schemaRec(s: McapSchema): Array[Byte] = {
    val p = new ByteArrayOutputStream()
    wLeShort(p, s.id); wStr(p, s.name); wStr(p, s.encoding)
    wLeInt(p, s.data.length); p.write(s.data)
    record(OpSchema, p.toByteArray)
  }
  private[mcap] def channelRec(c: McapChannel): Array[Byte] = {
    val p = new ByteArrayOutputStream()
    wLeShort(p, c.id); wLeShort(p, c.schemaId)
    wStr(p, c.topic); wStr(p, c.messageEncoding)
    wLeInt(p, 0) // empty metadata map
    record(OpChannel, p.toByteArray)
  }
  private[mcap] def messageRec(m: McapMessage): Array[Byte] = {
    val p = new ByteArrayOutputStream()
    wLeShort(p, m.channelId); wLeInt(p, m.sequence)
    wLeLong(p, m.logTime); wLeLong(p, m.publishTime); p.write(m.data)
    record(OpMessage, p.toByteArray)
  }

  private[mcap] def compress(compression: String, bytes: Array[Byte]): Array[Byte] =
    compression match {
      case "" => bytes
      case "zstd" => com.github.luben.zstd.Zstd.compress(bytes)
      case "lz4" =>
        val bos = new ByteArrayOutputStream()
        val out = new net.jpountz.lz4.LZ4FrameOutputStream(bos)
        out.write(bytes); out.close()
        bos.toByteArray
      case other =>
        throw new IllegalArgumentException(s"unsupported compression '$other'")
    }

  /** A LIVE-file fixture: the byte segments a recorder appends over
    * time. Segment 0 is `magic + Header record`; each message group
    * appends one Chunk record (dimension records ride the first
    * chunk); the returned `finale` closes the file (`DataEnd + summary
    * + Footer + magic`). Concatenating prefixes of the segments yields
    * exactly the states a growing recording passes through — the
    * streaming source's input shape. Concatenating everything equals a
    * `writeMcap(chunked = true)` layout.
    */
  def writeMcapSegments(schemas: Seq[McapSchema], channels: Seq[McapChannel],
      messageGroups: Seq[Seq[McapMessage]], compression: String = "")
      : (Seq[Array[Byte]], Array[Byte]) = {
    require(messageGroups.forall(_.nonEmpty), "empty message group")
    val head = new ByteArrayOutputStream()
    head.write(Magic)
    val hdr = new ByteArrayOutputStream()
    wStr(hdr, "ros2"); wStr(hdr, "graft-fixture")
    head.write(record(OpHeader, hdr.toByteArray))
    var pos = head.size().toLong
    val chunkIdx = scala.collection.mutable.ArrayBuffer[(McapChunkRef, Long)]()
    val segs = messageGroups.zipWithIndex.map { case (group, gi) =>
      val recs = new ByteArrayOutputStream()
      if (gi == 0) {
        schemas.foreach(s => recs.write(schemaRec(s)))
        channels.foreach(c => recs.write(channelRec(c)))
      }
      group.foreach(m => recs.write(messageRec(m)))
      val raw = recs.toByteArray
      val crc = new java.util.zip.CRC32(); crc.update(raw, 0, raw.length)
      val comp = compress(compression, raw)
      val p = new ByteArrayOutputStream()
      val startT = group.map(_.logTime).min; val endT = group.map(_.logTime).max
      wLeLong(p, startT); wLeLong(p, endT)
      wLeLong(p, raw.length); wLeInt(p, crc.getValue)
      wStr(p, compression); wLeLong(p, comp.length); p.write(comp)
      val rec = record(OpChunk, p.toByteArray)
      chunkIdx += ((McapChunkRef(pos, rec.length - 9, startT, endT,
        compression, raw.length, crc.getValue), rec.length.toLong))
      pos += rec.length
      rec
    }
    val fin = new ByteArrayOutputStream()
    val de = new ByteArrayOutputStream(); wLeInt(de, 0)
    fin.write(record(OpDataEnd, de.toByteArray))
    val summaryStart = pos + fin.size()
    schemas.foreach(s => fin.write(schemaRec(s)))
    channels.foreach(c => fin.write(channelRec(c)))
    chunkIdx.foreach { case (ref, recLen) =>
      val p = new ByteArrayOutputStream()
      wLeLong(p, ref.messageStartTime); wLeLong(p, ref.messageEndTime)
      wLeLong(p, ref.fileOffset); wLeLong(p, recLen)
      wLeInt(p, 0); wLeLong(p, 0)
      wStr(p, ref.compression)
      wLeLong(p, 0); wLeLong(p, ref.uncompressedSize)
      fin.write(record(OpChunkIndex, p.toByteArray))
    }
    val f = new ByteArrayOutputStream()
    wLeLong(f, summaryStart); wLeLong(f, 0); wLeInt(f, 0)
    fin.write(record(OpFooter, f.toByteArray))
    fin.write(Magic)
    (head.toByteArray +: segs, fin.toByteArray)
  }

  /** Write a complete MCAP file. `chunked=true` packs schema/channel/
    * message records into ONE chunk per `chunkGroups` split and writes
    * a Summary section with ChunkIndex entries (the spec-conformant
    * layout); `chunked=false` writes standalone records and summary
    * schema/channel copies only. `withSummary=false` omits the summary
    * (summary_start=0) to exercise the fallback walk.
    */
  def writeMcap(schemas: Seq[McapSchema], channels: Seq[McapChannel],
                messages: Seq[McapMessage], compression: String = "",
                chunked: Boolean = true, chunkGroups: Int = 1,
                withSummary: Boolean = true): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(Magic)
    val hdr = new ByteArrayOutputStream()
    wStr(hdr, "ros2"); wStr(hdr, "graft-fixture")
    out.write(record(OpHeader, hdr.toByteArray))
    val chunkIdx = scala.collection.mutable.ArrayBuffer[(McapChunkRef, Long)]() // (ref, recordLen+9)
    if (chunked) {
      val groups = messages.grouped(math.max(1, math.ceil(
        messages.size.toDouble / math.max(1, chunkGroups)).toInt)).toSeq
      groups.zipWithIndex.foreach { case (group, gi) =>
        val recs = new ByteArrayOutputStream()
        if (gi == 0) { // dimension records ride the first chunk, per convention
          schemas.foreach(s => recs.write(schemaRec(s)))
          channels.foreach(c => recs.write(channelRec(c)))
        }
        group.foreach(m => recs.write(messageRec(m)))
        val raw = recs.toByteArray
        val crc = new java.util.zip.CRC32(); crc.update(raw, 0, raw.length)
        val comp = compress(compression, raw)
        val p = new ByteArrayOutputStream()
        val startT = group.map(_.logTime).min; val endT = group.map(_.logTime).max
        wLeLong(p, startT); wLeLong(p, endT)
        wLeLong(p, raw.length); wLeInt(p, crc.getValue)
        wStr(p, compression); wLeLong(p, comp.length); p.write(comp)
        val rec = record(OpChunk, p.toByteArray)
        val off = out.size().toLong
        out.write(rec)
        chunkIdx += ((McapChunkRef(off, rec.length - 9, startT, endT,
          compression, raw.length, crc.getValue), rec.length.toLong))
      }
    } else {
      schemas.foreach(s => out.write(schemaRec(s)))
      channels.foreach(c => out.write(channelRec(c)))
      messages.foreach(m => out.write(messageRec(m)))
    }
    val de = new ByteArrayOutputStream(); wLeInt(de, 0)
    out.write(record(OpDataEnd, de.toByteArray))
    val summaryStart = if (withSummary) out.size().toLong else 0L
    if (withSummary) {
      schemas.foreach(s => out.write(schemaRec(s)))
      channels.foreach(c => out.write(channelRec(c)))
      // Statistics record (spec §Statistics): message counts per
      // channel — what metadata-only count(*) pushdown reads
      val st = new ByteArrayOutputStream()
      wLeLong(st, messages.size.toLong)
      wLeShort(st, schemas.size)
      wLeInt(st, channels.size.toLong)
      wLeInt(st, 0L); wLeInt(st, 0L) // attachments, metadata
      wLeInt(st, chunkIdx.size.toLong)
      wLeLong(st, if (messages.isEmpty) 0L else messages.map(_.logTime).min)
      wLeLong(st, if (messages.isEmpty) 0L else messages.map(_.logTime).max)
      val byChan = messages.groupBy(_.channelId).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1)
      wLeInt(st, byChan.size * 10L)
      byChan.foreach { case (id, n) => wLeShort(st, id); wLeLong(st, n) }
      out.write(record(OpStatistics, st.toByteArray))
      chunkIdx.foreach { case (ref, recLen) =>
        val p = new ByteArrayOutputStream()
        wLeLong(p, ref.messageStartTime); wLeLong(p, ref.messageEndTime)
        wLeLong(p, ref.fileOffset); wLeLong(p, recLen)
        wLeInt(p, 0) // empty message_index_offsets map
        wLeLong(p, 0) // message_index_length
        wStr(p, ref.compression)
        wLeLong(p, 0); wLeLong(p, ref.uncompressedSize)
        out.write(record(OpChunkIndex, p.toByteArray))
      }
    }
    val f = new ByteArrayOutputStream()
    wLeLong(f, summaryStart); wLeLong(f, 0); wLeInt(f, 0)
    out.write(record(OpFooter, f.toByteArray))
    out.write(Magic)
    out.toByteArray
  }
}
