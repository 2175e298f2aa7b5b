package graft.ros.db3

/** Read-only SQLite file-format walker (sqlite.org/fileformat2.html —
  * public spec) for rosbag2's pre-MCAP default storage (`.db3`): the
  * 100-byte header, table b-trees (interior pages 0x05, leaf pages
  * 0x0d), the record serial-type format, and overflow-page chains. Pure bytes over a page-fetch
  * function — no sqlite library (none is available offline, and a
  * JDBC driver would be the wrong shape for executor-side reads
  * anyway). Index b-trees, WAL frames, freelists and pointer maps are
  * not needed to SCAN tables and are ignored; a live `-wal` sidecar
  * means the main file may be stale, so sources refuse it loudly.
  *
  * Also carries a minimal WRITER (fixture/tooling, the writeMcap
  * analog): valid leaf/interior table pages, overflow chains, and a
  * page-1 sqlite_schema — enough for sqlite itself to read the output
  * (cross-validated against the stdlib sqlite3 during development; the
  * committed genuine-sqlite fixture pins the reader in-gate).
  */
object SqliteFormat {

  final case class Header(pageSize: Int, reserved: Int, pageCount: Int,
                          textEncoding: Int) {
    def usable: Int = pageSize - reserved
  }

  def parseHeader(h: Array[Byte]): Header = {
    require(h.length >= 100, s"sqlite header needs 100 bytes, got ${h.length}")
    val magic = "SQLite format 3\u0000".getBytes("ISO-8859-1")
    require(h.take(16).sameElements(magic), "not a SQLite 3 database")
    val ps0 = ((h(16) & 0xFF) << 8) | (h(17) & 0xFF)
    val pageSize = if (ps0 == 1) 65536 else ps0
    require(pageSize >= 512 && (pageSize & (pageSize - 1)) == 0,
      s"invalid page size $ps0")
    val reserved = h(20) & 0xFF
    val pageCount = be32(h, 28)
    val enc = be32(h, 56)
    require(enc == 1 || enc == 0, // 0: never-written db; 1: UTF-8
      s"unsupported text encoding $enc (only UTF-8 rosbag2 files)")
    Header(pageSize, reserved, pageCount, enc)
  }

  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)
  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 24) | ((b(o + 1) & 0xFF) << 16) |
      ((b(o + 2) & 0xFF) << 8) | (b(o + 3) & 0xFF)

  /** SQLite varint: 1-9 bytes, big-endian 7-bit groups; the 9th byte
    * contributes 8 bits. Returns (value, bytesRead).
    */
  private[db3] def varint(b: Array[Byte], o: Int): (Long, Int) = {
    var v = 0L; var i = 0
    while (i < 8) {
      val x = b(o + i); i += 1
      v = (v << 7) | (x & 0x7FL)
      if ((x & 0x80) == 0) return (v, i)
    }
    ((v << 8) | (b(o + 8) & 0xFFL), 9)
  }

  /** Decode one record (payload of a table-leaf cell): serial-type
    * header then values. NULL→null, ints→Long, float→Double,
    * blob→Array[Byte], text→String.
    */
  def record(p: Array[Byte]): Seq[Any] = {
    val (hdrLen, n0) = varint(p, 0)
    var ho = n0
    val types = scala.collection.mutable.ArrayBuffer[Long]()
    while (ho < hdrLen) {
      val (t, n) = varint(p, ho); types += t; ho += n
    }
    require(ho == hdrLen, s"record header overrun: $ho != $hdrLen")
    var vo = hdrLen.toInt
    types.map { t =>
      def int(k: Int): Long = {
        var acc = p(vo).toLong // first byte signed: big-endian two's complement
        var i = 1
        while (i < k) { acc = (acc << 8) | (p(vo + i) & 0xFFL); i += 1 }
        vo += k; acc
      }
      t match {
        case 0 => null
        case 1 => int(1)
        case 2 => int(2)
        case 3 => int(3)
        case 4 => int(4)
        case 5 => int(6)
        case 6 => int(8)
        case 7 => java.lang.Double.longBitsToDouble(int(8))
        case 8 => 0L
        case 9 => 1L
        case n if n >= 12 && n % 2 == 0 =>
          val len = ((n - 12) / 2).toInt
          val a = java.util.Arrays.copyOfRange(p, vo, vo + len); vo += len; a
        case n if n >= 13 =>
          val len = ((n - 13) / 2).toInt
          val s = new String(p, vo, len, java.nio.charset.StandardCharsets.UTF_8)
          vo += len; s
        case n => throw new IllegalArgumentException(
          s"reserved serial type $n (index/internal page read as table?)")
      }
    }.toSeq
  }

  /** Overflow-split math for a table LEAF cell, straight from the spec:
    * U = usable page size, P = payload length; X = U-35 is the largest
    * all-local payload; past it, M+((P-M)%(U-4)) bytes stay local when
    * that is <= X, else M = ((U-12)*32/255)-23.
    */
  private[db3] def leafLocal(usable: Int, payload: Long): Int = {
    val x = usable - 35
    if (payload <= x) payload.toInt
    else {
      val m = ((usable - 12) * 32 / 255) - 23
      val k = m + ((payload - m) % (usable - 4))
      if (k <= x) k.toInt else m
    }
  }

  /** Stream all (rowid, record) rows of the table rooted at `root`,
    * in rowid order (the b-tree's own order). `page(i)` fetches
    * 1-based page i; page 1's b-tree content begins after the 100-byte
    * header (the spec's one special case).
    */
  def tableRows(page: Int => Array[Byte], usable: Int,
                root: Int): Iterator[(Long, Seq[Any])] = {
    def walk(pageNo: Int): Iterator[(Long, Seq[Any])] = {
      val b = page(pageNo)
      val base = if (pageNo == 1) 100 else 0
      val tpe = b(base) & 0xFF
      val nCells = be16(b, base + 3)
      tpe match {
        case 0x0d => // table leaf
          val ptrBase = base + 8
          (0 until nCells).iterator.map { i =>
            val co = be16(b, ptrBase + 2 * i)
            val (payloadLen, n1) = varint(b, co)
            val (rowid, n2) = varint(b, co + n1)
            val local = leafLocal(usable, payloadLen)
            val payload =
              if (local == payloadLen) // all local, no copy of the chain
                java.util.Arrays.copyOfRange(b, co + n1 + n2, co + n1 + n2 + local)
              else {
                val out = new Array[Byte](payloadLen.toInt)
                System.arraycopy(b, co + n1 + n2, out, 0, local)
                var got = local
                var next = be32(b, co + n1 + n2 + local)
                while (got < payloadLen) {
                  require(next > 0, s"overflow chain ends at $got of $payloadLen bytes")
                  val ob = page(next)
                  val take = math.min(usable - 4, payloadLen.toInt - got)
                  System.arraycopy(ob, 4, out, got, take)
                  got += take
                  next = be32(ob, 0)
                }
                out
              }
            (rowid, record(payload))
          }
        case 0x05 => // table interior: cells = (child be32, key varint)
          val ptrBase = base + 12 // 12-byte header (rightmost ptr at +8)
          val children = (0 until nCells).map { i =>
            be32(b, be16(b, ptrBase + 2 * i))
          }
          val rightmost = be32(b, base + 8)
          (children :+ rightmost).iterator.flatMap(walk)
        case other => throw new IllegalArgumentException(
          f"page $pageNo is b-tree type 0x$other%02x, not a table page " +
            "(index pages and corrupt files both land here)")
      }
    }
    walk(root)
  }

  /** Decode the first `k` values of a record from its LOCAL payload
    * prefix only — never follows the overflow chain. Sound whenever
    * the header plus those values fit inside the minimum local payload
    * (~489 bytes at 4096-byte pages): rosbag2's messages rows carry
    * (id NULL, topic_id, timestamp) in well under 30 bytes before the
    * data blob. Bounds-checked against `avail` so a violation fails
    * loudly instead of reading overflow bytes as record content.
    */
  private[db3] def recordPrefix(b: Array[Byte], off: Int, avail: Int,
                                k: Int): Seq[Any] = {
    val (hdrLen, n0) = varint(b, off)
    require(hdrLen <= avail,
      s"record header ($hdrLen bytes) exceeds the local payload ($avail)")
    var ho = off + n0
    val types = scala.collection.mutable.ArrayBuffer[Long]()
    while (ho < off + hdrLen && types.length < k) {
      val (t, n) = varint(b, ho); types += t; ho += n
    }
    var vo = off + hdrLen.toInt
    types.map { t =>
      def int(w: Int): Long = {
        require(vo + w <= off + avail,
          s"record prefix value overruns the local payload at $vo")
        var acc = b(vo).toLong
        var i = 1
        while (i < w) { acc = (acc << 8) | (b(vo + i) & 0xFFL); i += 1 }
        vo += w; acc
      }
      t match {
        case 0 => null
        case 1 => int(1)
        case 2 => int(2)
        case 3 => int(3)
        case 4 => int(4)
        case 5 => int(6)
        case 6 => int(8)
        case 7 => java.lang.Double.longBitsToDouble(int(8))
        case 8 => 0L
        case 9 => 1L
        case n => throw new IllegalArgumentException(
          s"record prefix cannot span variable-width serial type $n " +
            "within the first fixed-width values")
      }
    }.toSeq
  }

  /** First and last (rowid, first-`k`-values) of the subtree rooted at
    * `root`: two spine descents, one leaf-cell prefix decode each —
    * the plan-time pruning probe (two page-path reads per subtree, no
    * row walk). None for an empty subtree (only a root that is itself
    * an empty leaf).
    */
  def edgeRows(page: Int => Array[Byte], usable: Int, root: Int, k: Int)
      : Option[((Long, Seq[Any]), (Long, Seq[Any]))] = {
    @scala.annotation.tailrec
    def descend(pageNo: Int, last: Boolean): Option[(Long, Seq[Any])] = {
      val b = page(pageNo)
      val base = if (pageNo == 1) 100 else 0
      val tpe = b(base) & 0xFF
      val n = be16(b, base + 3)
      tpe match {
        case 0x0d =>
          if (n == 0) None
          else {
            val co = be16(b, base + 8 + 2 * (if (last) n - 1 else 0))
            val (payloadLen, n1) = varint(b, co)
            val (rowid, n2) = varint(b, co + n1)
            val local = leafLocal(usable, payloadLen)
            Some((rowid, recordPrefix(b, co + n1 + n2, local, k)))
          }
        case 0x05 =>
          // n == 0: a cell-less interior page (rightmost pointer only)
          // — the engine's writer never emits one, but a foreign file
          // may; the rightmost child IS its whole subtree
          val child =
            if (last || n == 0) be32(b, base + 8)
            else be32(b, be16(b, base + 12))
          descend(child, last)
        case other => throw new IllegalArgumentException(
          f"page $pageNo is b-tree type 0x$other%02x, not a table page")
      }
    }
    for (f <- descend(root, last = false); l <- descend(root, last = true))
      yield (f, l)
  }

  /** Row count of the subtree rooted at `root` from page HEADERS
    * alone: interior pages are descended, leaf pages contribute their
    * cell count — no record parse, no overflow chain, no payload
    * bytes. The count comes from the tree itself (not writer-stamped
    * metadata), so it is exact by construction; what it saves is
    * everything that makes a blob-heavy scan expensive.
    */
  def countRows(page: Int => Array[Byte], usable: Int, root: Int): Long = {
    def walk(pageNo: Int): Long = {
      val b = page(pageNo)
      val base = if (pageNo == 1) 100 else 0
      val n = be16(b, base + 3)
      (b(base) & 0xFF) match {
        case 0x0d => n.toLong
        case 0x05 =>
          (0 until n).map(i => walk(be32(b, be16(b, base + 12 + 2 * i)))).sum +
            walk(be32(b, base + 8))
        case other => throw new IllegalArgumentException(
          f"page $pageNo is b-tree type 0x$other%02x, not a table page")
      }
    }
    walk(root)
  }

  /** (row count, min, max) of the `valueIdx`-th record value (0-based,
    * fixed-width integer) over the subtree rooted at `root` — the
    * metadata-aggregate walk behind pushed `min/max(timestamp)`. Leaf
    * cells are PREFIX-decoded only ([[recordPrefix]]): enough of the
    * record header to reach the value, never the blob bytes, never an
    * overflow chain — so the walk prices like [[countRows]] plus one
    * small varint parse per row, not like a scan. Unlike the edge-probe
    * pruning (two probes per subtree, sound only under write-order
    * monotonicity), this reads EVERY row's value: exact on any file
    * whose rows carry an INTEGER value at `valueIdx`, foreign or
    * merged, no order assumption. Drift fails LOUDLY (the db3
    * contract): a missing column (short record), a NULL, or a
    * non-integer serial type throws rather than skewing min/max —
    * rosbag2's messages.timestamp is declared NOT NULL, so any of
    * those is a corrupt or foreign-schema file, and the normal scan
    * would fail on it too instead of agreeing with a silent skip.
    * Returns (0, None, None) for an empty subtree.
    */
  def countMinMax(page: Int => Array[Byte], usable: Int, root: Int,
                  valueIdx: Int): (Long, Option[Long], Option[Long]) = {
    var n = 0L
    var mn = Long.MaxValue
    var mx = Long.MinValue
    var seen = false
    def walk(pageNo: Int): Unit = {
      val b = page(pageNo)
      val base = if (pageNo == 1) 100 else 0
      val nCells = be16(b, base + 3)
      (b(base) & 0xFF) match {
        case 0x0d =>
          val ptrBase = base + 8
          var i = 0
          while (i < nCells) {
            val co = be16(b, ptrBase + 2 * i)
            val (payloadLen, n1) = varint(b, co)
            val (_, n2) = varint(b, co + n1)
            val local = leafLocal(usable, payloadLen)
            n += 1L
            val prefix = recordPrefix(b, co + n1 + n2, local, valueIdx + 1)
            require(prefix.length > valueIdx,
              s"record has only ${prefix.length} values, none at " +
                s"index $valueIdx — foreign schema, refusing min/max")
            prefix(valueIdx) match {
              case v: Long =>
                seen = true
                if (v < mn) mn = v
                if (v > mx) mx = v
              case null => throw new IllegalArgumentException(
                s"NULL at record value $valueIdx — rosbag2 declares " +
                  "timestamp NOT NULL; refusing a silently skewed min/max")
              case other => throw new IllegalArgumentException(
                s"record value $valueIdx is ${other.getClass.getSimpleName}, " +
                  "not an integer — refusing min/max over a foreign schema")
            }
            i += 1
          }
        case 0x05 =>
          var i = 0
          while (i < nCells) {
            walk(be32(b, be16(b, base + 12 + 2 * i))); i += 1
          }
          walk(be32(b, base + 8))
        case other => throw new IllegalArgumentException(
          f"page $pageNo is b-tree type 0x$other%02x, not a table page")
      }
    }
    walk(root)
    (n, if (seen) Some(mn) else None, if (seen) Some(mx) else None)
  }

  /** Per-key (count, min, max) of the `valueIdx`-th record value over
    * the subtree rooted at `root`, keyed by the `keyIdx`-th value —
    * the GROUPED twin of [[countMinMax]], behind pushed
    * `groupBy(topic…).agg(count + min/max(timestamp))`: the same
    * leaf-cell PREFIX decode (never blob bytes, never an overflow
    * chain), one extra small varint per row for the key. db3 is the
    * one container where grouped ranges are exact from metadata —
    * the walk reads (topic_id, timestamp) together per cell, which
    * chunk-info / MCAP Statistics cannot offer. `needValue = false`
    * (grouped counts alone) stops the prefix at the key. Same
    * loud-drift contract as countMinMax: a short record, a NULL, or
    * a non-integer at either index throws rather than skewing the
    * aggregate. Values are Array(count, min, max) per key; min/max
    * are untouched Long.MaxValue/MinValue when `needValue = false`.
    */
  def groupedCountMinMax(page: Int => Array[Byte], usable: Int, root: Int,
      keyIdx: Int, valueIdx: Int, needValue: Boolean)
      : scala.collection.mutable.LinkedHashMap[Long, Array[Long]] = {
    val acc = scala.collection.mutable.LinkedHashMap[Long, Array[Long]]()
    val nVals = (if (needValue) math.max(keyIdx, valueIdx) else keyIdx) + 1
    def walk(pageNo: Int): Unit = {
      val b = page(pageNo)
      val base = if (pageNo == 1) 100 else 0
      val nCells = be16(b, base + 3)
      (b(base) & 0xFF) match {
        case 0x0d =>
          val ptrBase = base + 8
          var i = 0
          while (i < nCells) {
            val co = be16(b, ptrBase + 2 * i)
            val (payloadLen, n1) = varint(b, co)
            val (_, n2) = varint(b, co + n1)
            val local = leafLocal(usable, payloadLen)
            val prefix = recordPrefix(b, co + n1 + n2, local, nVals)
            require(prefix.length > keyIdx,
              s"record has only ${prefix.length} values, none at " +
                s"index $keyIdx — foreign schema, refusing grouped agg")
            val key = prefix(keyIdx) match {
              case v: Long => v
              case other => throw new IllegalArgumentException(
                s"record value $keyIdx is " +
                  s"${if (other == null) "NULL" else other.getClass.getSimpleName}, " +
                  "not an integer — refusing grouped agg over a foreign schema")
            }
            val slot = acc.getOrElseUpdate(key,
              Array(0L, Long.MaxValue, Long.MinValue))
            slot(0) += 1L
            if (needValue) {
              require(prefix.length > valueIdx,
                s"record has only ${prefix.length} values, none at " +
                  s"index $valueIdx — foreign schema, refusing min/max")
              prefix(valueIdx) match {
                case v: Long =>
                  if (v < slot(1)) slot(1) = v
                  if (v > slot(2)) slot(2) = v
                case null => throw new IllegalArgumentException(
                  s"NULL at record value $valueIdx — rosbag2 declares " +
                    "timestamp NOT NULL; refusing a silently skewed min/max")
                case other => throw new IllegalArgumentException(
                  s"record value $valueIdx is ${other.getClass.getSimpleName}, " +
                    "not an integer — refusing min/max over a foreign schema")
              }
            }
            i += 1
          }
        case 0x05 =>
          var i = 0
          while (i < nCells) {
            walk(be32(b, be16(b, base + 12 + 2 * i))); i += 1
          }
          walk(be32(b, base + 8))
        case other => throw new IllegalArgumentException(
          f"page $pageNo is b-tree type 0x$other%02x, not a table page")
      }
    }
    walk(root)
    acc
  }

  /** One-level partition grain of a table b-tree: the root's direct
    * children (subtree roots), or the root itself when it is a leaf.
    * Each subtree walks independently ([[tableRows]] handles either
    * page type), covering disjoint rowid ranges in order — the
    * row-group analog for scan parallelism inside ONE database file.
    */
  def rootChildren(page: Int => Array[Byte], usable: Int, root: Int): Seq[Int] = {
    val b = page(root)
    val base = if (root == 1) 100 else 0
    (b(base) & 0xFF) match {
      case 0x0d => Seq(root)
      case 0x05 =>
        val n = be16(b, base + 3)
        (0 until n).map(i => be32(b, be16(b, base + 12 + 2 * i))) :+
          be32(b, base + 8)
      case other => throw new IllegalArgumentException(
        f"page $root is b-tree type 0x$other%02x, not a table page")
    }
  }

  /** The sqlite_schema table (root = page 1): rows are
    * (type, name, tbl_name, rootpage, sql). Returns name → rootpage
    * for type='table'.
    */
  def tableRoots(page: Int => Array[Byte], usable: Int): Map[String, Int] =
    tableRows(page, usable, 1).flatMap { case (_, vals) =>
      (vals(0), vals(1), vals(3)) match {
        case ("table", name: String, root: Long) => Some(name -> root.toInt)
        case _ => None
      }
    }.toMap

  // ---------------------------------------------------------------
  // Minimal writer (fixtures/tooling): leaf + one-level interior
  // table b-trees, overflow chains, page-1 schema. Rowids are
  // 1..n in insertion order.
  // ---------------------------------------------------------------

  private[db3] def putVarint(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    require(v >= 0, s"writer only emits non-negative varints, got $v")
    if (v <= 0x7F) { out.write(v.toInt); return }
    val groups = scala.collection.mutable.ArrayBuffer[Int]()
    var x = v
    // 9-byte form unneeded below 2^56; use 7-bit groups
    while (x != 0) { groups += (x & 0x7F).toInt; x >>>= 7 }
    val gs = groups.reverse
    gs.init.foreach(g => out.write(g | 0x80))
    out.write(gs.last)
  }

  /** Serialize one record from Scala values (null, Long/Int, Double,
    * String, Array[Byte], Boolean→0/1 int).
    */
  private[db3] def writeRecord(values: Seq[Any]): Array[Byte] = {
    def ser(v: Any): (Long, Array[Byte]) = v match {
      case null => (0L, Array.emptyByteArray)
      case b: Boolean => ser(if (b) 1L else 0L)
      case i: Int => ser(i.toLong)
      case v: Long =>
        if (v == 0L) (8L, Array.emptyByteArray)
        else if (v == 1L) (9L, Array.emptyByteArray)
        else {
          val k = if (v >= Byte.MinValue && v <= Byte.MaxValue) 1
            else if (v >= Short.MinValue && v <= Short.MaxValue) 2
            else if (v >= -(1L << 23) && v < (1L << 23)) 3
            else if (v >= Int.MinValue && v <= Int.MaxValue) 4
            else if (v >= -(1L << 47) && v < (1L << 47)) 6
            else 8
        val serial = k match { case 6 => 5L; case 8 => 6L; case n => n.toLong }
          val b = new Array[Byte](k)
          var i = 0
          while (i < k) { b(k - 1 - i) = ((v >> (8 * i)) & 0xFF).toByte; i += 1 }
          (serial, b)
        }
      case d: Double =>
        val bits = java.lang.Double.doubleToLongBits(d)
        val b = new Array[Byte](8)
        var i = 0
        while (i < 8) { b(7 - i) = ((bits >> (8 * i)) & 0xFF).toByte; i += 1 }
        (7L, b)
      case s: String =>
        val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        (13L + 2L * b.length, b)
      case a: Array[Byte] => (12L + 2L * a.length, a)
      case other => throw new IllegalArgumentException(
        s"unsupported fixture value ${other.getClass}")
    }
    val parts = values.map(ser)
    val hdr = new java.io.ByteArrayOutputStream()
    parts.foreach(p => putVarint(hdr, p._1))
    // header length varint includes itself; sizes here stay < 127
    val hdrLen = hdr.size() + 1
    require(hdrLen <= 127, "fixture writer: record header too wide")
    val out = new java.io.ByteArrayOutputStream()
    out.write(hdrLen)
    hdr.writeTo(out)
    parts.foreach(p => out.write(p._2))
    out.toByteArray
  }

  /** One table's rows → its pages. Returns (rootPageNo) and appends
    * pages to `pages` (1-based global numbering via base offset).
    */
  private final class PageAlloc(val pageSize: Int) {
    val pages = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    /** reserve page number (1-based, accounting for page 1 later) */
    def alloc(): Int = { pages += new Array[Byte](pageSize); pages.length + 1 }
    def apply(no: Int): Array[Byte] = pages(no - 2)
  }

  private def setBe16(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = ((v >> 8) & 0xFF).toByte; b(o + 1) = (v & 0xFF).toByte
  }
  private def setBe32(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = ((v >> 24) & 0xFF).toByte; b(o + 1) = ((v >> 16) & 0xFF).toByte
    b(o + 2) = ((v >> 8) & 0xFF).toByte; b(o + 3) = (v & 0xFF).toByte
  }

  /** Build the leaf (and, if needed, interior) pages for `records`
    * (rowid = 1..n) and return the root page number.
    */
  private def buildTable(alloc: PageAlloc, usable: Int,
                         records: Seq[Array[Byte]]): Int = {
    final case class Cell(bytes: Array[Byte], overflow: Seq[Array[Byte]])
    // serialize cells, splitting oversized payloads into overflow pages
    val cells = records.zipWithIndex.map { case (r, i) =>
      val head = new java.io.ByteArrayOutputStream()
      putVarint(head, r.length.toLong)
      putVarint(head, (i + 1).toLong)
      val local = leafLocal(usable, r.length.toLong)
      if (local == r.length) {
        head.write(r)
        Cell(head.toByteArray, Nil)
      } else {
        head.write(r, 0, local)
        val chunks = r.drop(local).grouped(usable - 4).toSeq
        Cell(head.toByteArray, chunks) // 4-byte next-ptr appended at layout
      }
    }
    // greedy page fill: leaf header 8 bytes + 2-byte ptr per cell
    val leaves = scala.collection.mutable.ArrayBuffer[Seq[Cell]]()
    var cur = scala.collection.mutable.ArrayBuffer[Cell]()
    var used = 8
    cells.foreach { c =>
      val w = c.bytes.length + (if (c.overflow.nonEmpty) 4 else 0) + 2
      if (cur.nonEmpty && used + w > usable) {
        leaves += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer[Cell](); used = 8
      }
      cur += c; used += w
    }
    if (cur.nonEmpty || leaves.isEmpty) leaves += cur.toSeq
    // lay out leaves + overflow chains
    var rowid = 0L
    val leafInfo = leaves.map { cs =>
      val no = alloc.alloc()
      val b = alloc(no)
      b(0) = 0x0d
      setBe16(b, 3, cs.length)
      var contentEnd = usable
      val withOv = cs.map { c =>
        // allocate the overflow chain pages first so the first pointer
        // is known when the cell body is placed
        val ovPages = c.overflow.map(_ => alloc.alloc())
        ovPages.zipWithIndex.foreach { case (po, i) =>
          val pb = alloc(po)
          setBe32(pb, 0, if (i + 1 < ovPages.length) ovPages(i + 1) else 0)
          System.arraycopy(c.overflow(i), 0, pb, 4, c.overflow(i).length)
        }
        (c, ovPages.headOption.getOrElse(0))
      }
      withOv.zipWithIndex.foreach { case ((c, firstOv), i) =>
        val total = c.bytes.length + (if (firstOv != 0) 4 else 0)
        contentEnd -= total
        System.arraycopy(c.bytes, 0, b, contentEnd, c.bytes.length)
        if (firstOv != 0) setBe32(b, contentEnd + c.bytes.length, firstOv)
        setBe16(b, 8 + 2 * i, contentEnd)
      }
      setBe16(b, 5, contentEnd)
      rowid += cs.length
      (no, rowid) // (leaf page, largest rowid in it)
    }
    // interior levels built bottom-up until one page holds the rest —
    // a 100 MB blob table needs thousands of leaves, i.e. two levels
    // (the reader's tableRows walks any depth; rootChildren's
    // partition grain stays the root's direct children either way).
    // Conservative per-page child cap: cell = 2B ptr + 4B child +
    // ≤9B rowid varint = 15B against (usable - 12) header budget.
    val maxKids = math.max(2, (usable - 12) / 15)
    var level: Seq[(Int, Long)] = leafInfo.toSeq // (page, max rowid in subtree)
    while (level.length > 1) {
      // a trailing group of ONE child would build a zero-cell interior
      // page (inner = group.init = empty) whose leftmost-descent reads
      // a nonexistent cell pointer — rebalance the last two groups so
      // every interior page has >= 2 children (the previous group is
      // full with maxKids >= 3 children, so both halves end up >= 2)
      val groups0 = level.grouped(maxKids).toSeq
      val groups =
        if (groups0.length > 1 && groups0.last.length == 1) {
          val merged = groups0(groups0.length - 2) ++ groups0.last
          val (a, b) = merged.splitAt(merged.length / 2)
          groups0.dropRight(2) :+ a :+ b
        } else groups0
      level = groups.map { group =>
        val no = alloc.alloc()
        val b = alloc(no)
        b(0) = 0x05
        val inner = group.init
        setBe16(b, 3, inner.length)
        setBe32(b, 8, group.last._1)
        var contentEnd = usable
        inner.zipWithIndex.foreach { case ((child, maxRow), i) =>
          val cell = new java.io.ByteArrayOutputStream()
          val cb = new Array[Byte](4)
          setBe32(cb, 0, child); cell.write(cb)
          putVarint(cell, maxRow)
          contentEnd -= cell.size()
          System.arraycopy(cell.toByteArray, 0, b, contentEnd, cell.size())
          setBe16(b, 12 + 2 * i, contentEnd)
        }
        setBe16(b, 5, contentEnd)
        require(contentEnd >= 12 + 2 * inner.length, "fixture interior page overflow")
        (no, group.last._2)
      }.toSeq
    }
    level.head._1
  }

  /** Write a complete single-file database: page 1 schema + one b-tree
    * per table. `tables` = (name, createSql, rows); rowids 1..n.
    */
  def writeDb(tables: Seq[(String, String, Seq[Seq[Any]])],
              pageSize: Int = 4096): Array[Byte] = {
    val usable = pageSize
    val alloc = new PageAlloc(pageSize)
    val entries = tables.map { case (name, sql, rows) =>
      val root = buildTable(alloc, usable, rows.map(writeRecord))
      (name, sql, root)
    }
    // page 1: header + sqlite_schema leaf
    val p1 = new Array[Byte](pageSize)
    val magic = "SQLite format 3\u0000".getBytes("ISO-8859-1")
    System.arraycopy(magic, 0, p1, 0, 16)
    setBe16(p1, 16, if (pageSize == 65536) 1 else pageSize)
    p1(18) = 1; p1(19) = 1 // legacy file format read/write versions
    p1(21) = 64; p1(22) = 32; p1(23) = 32 // spec-mandated fractions
    setBe32(p1, 28, alloc.pages.length + 1) // page count
    setBe32(p1, 44, 4) // schema format 4
    setBe32(p1, 56, 1) // text encoding utf-8
    setBe32(p1, 96, 3049000) // sqlite version number (plausible)
    val base = 100
    p1(base) = 0x0d
    val schemaCells = entries.zipWithIndex.map { case ((name, sql, root), i) =>
      val rec = writeRecord(Seq("table", name, name, root.toLong, sql))
      val c = new java.io.ByteArrayOutputStream()
      putVarint(c, rec.length.toLong); putVarint(c, (i + 1).toLong)
      c.write(rec); c.toByteArray
    }
    setBe16(p1, base + 3, schemaCells.length)
    var contentEnd = pageSize
    schemaCells.zipWithIndex.foreach { case (c, i) =>
      contentEnd -= c.length
      System.arraycopy(c, 0, p1, contentEnd, c.length)
      setBe16(p1, base + 8 + 2 * i, contentEnd)
    }
    setBe16(p1, base + 5, contentEnd)
    require(contentEnd >= base + 8 + 2 * schemaCells.length,
      "fixture schema page overflow (too many/too wide CREATE TABLEs)")
    val out = new java.io.ByteArrayOutputStream()
    out.write(p1)
    alloc.pages.foreach(out.write)
    out.toByteArray
  }
}
