package graft.ros.db3

import org.scalatest.funsuite.AnyFunSuite
import SqliteFormat._

/** The SQLite walker against GENUINE sqlite bytes: the committed
  * fixture was written by the reference implementation itself (stdlib
  * sqlite3, rosbag2's default-plugin schema, 2000 messages — enough
  * for interior pages — plus a 20 KB blob that spans a multi-page
  * overflow chain). The writer is then checked as a round-trip source
  * AND was cross-validated against the reference reader during
  * development.
  */
class SqliteFormatSpec extends AnyFunSuite {

  private def load(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(name)
    require(in != null, s"missing test resource $name")
    try in.readAllBytes() finally in.close()
  }

  private def pager(db: Array[Byte], pageSize: Int): Int => Array[Byte] =
    i => java.util.Arrays.copyOfRange(db, (i - 1) * pageSize, i * pageSize)

  test("genuine rosbag2-schema db3: header, schema roots, full scans, overflow chain") {
    val db = load("/db3/genuine_rosbag2.db3")
    val h = parseHeader(db)
    assert(h.pageSize === 4096 && h.textEncoding === 1)
    assert(h.pageCount * h.pageSize === db.length)
    val page = pager(db, h.pageSize)
    val roots = tableRoots(page, h.usable)
    assert(roots.keySet === Set("topics", "messages", "message_definitions"))

    val topics = tableRows(page, h.usable, roots("topics")).toSeq
    assert(topics.map(_._2) === Seq(
      Seq(null, "/imu", "sensor_msgs/msg/Imu", "cdr", ""),
      Seq(null, "/chatter", "std_msgs/msg/String", "cdr", ""),
      Seq(null, "/bulk", "test_msgs/msg/Bulk", "cdr", "")))
    // INTEGER PRIMARY KEY column is the rowid (stored NULL in the record)
    assert(topics.map(_._1) === Seq(1L, 2L, 3L))

    val defs = tableRows(page, h.usable, roots("message_definitions")).toSeq
    assert(defs.map(_._2(1)) === Seq("sensor_msgs/msg/Imu", "std_msgs/msg/String"))
    assert(defs.map(_._2(2)) === Seq("ros2msg", "ros2msg"))

    val msgs = tableRows(page, h.usable, roots("messages")).toSeq
    assert(msgs.length === 2000)
    assert(msgs.map(_._1) === (1L to 2000L)) // rowid order
    // every row matches its generation rule
    msgs.foreach { case (rowid, vals) =>
      val i = rowid - 1
      assert(vals(1) === (if (i == 500) 3L else 1L + (i % 2)), s"topic_id at $rowid")
      assert(vals(2) === 1700000000000000000L + i * 1000000L, s"ts at $rowid")
    }
    // the 20 KB blob (row 501) came back whole through the overflow chain
    val big = msgs(500)._2(3).asInstanceOf[Array[Byte]]
    assert(big.length === 20000)
    (0 until 20000).foreach { j =>
      assert((big(j) & 0xFF) === (j * 31 + 7) % 251, s"overflow byte $j")
    }
    // total payload bytes equal sqlite's own SUM(length(data)) = 55425
    assert(msgs.map(_._2(3).asInstanceOf[Array[Byte]].length).sum === 55425)
  }

  test("writer round-trip: multi-page tables with overflow blobs read back exactly") {
    val rows = (0 until 1500).map { i =>
      Seq[Any](null, (i % 3).toLong,
        if (i == 77) Array.tabulate(9000)(j => ((j * 13 + i) % 251).toByte)
        else Array.tabulate(8 + i % 32)(j => ((i + j) % 127).toByte),
        s"label$i", i * 1.5, if (i % 5 == 0) null else i.toLong)
    }
    val tiny = Seq(Seq[Any](null, "only", 1L))
    val db = writeDb(Seq(
      ("t", "CREATE TABLE t(id INTEGER PRIMARY KEY, k INTEGER, data BLOB, s TEXT, d REAL, opt INTEGER)", rows),
      ("u", "CREATE TABLE u(id INTEGER PRIMARY KEY, s TEXT, v INTEGER)", tiny),
      ("empty", "CREATE TABLE empty(id INTEGER PRIMARY KEY, x TEXT)", Seq.empty)))
    val h = parseHeader(db)
    val page = pager(db, h.pageSize)
    val roots = tableRoots(page, h.usable)
    assert(roots.keySet === Set("t", "u", "empty"))
    val got = tableRows(page, h.usable, roots("t")).toSeq
    assert(got.length === 1500 && got.map(_._1) === (1L to 1500L))
    got.zip(rows).foreach { case ((_, g), w) =>
      assert(g(1) === w(1))
      assert(g(2).asInstanceOf[Array[Byte]].toSeq === w(2).asInstanceOf[Array[Byte]].toSeq)
      assert(g(3) === w(3) && g(4) === w(4) && g(5) === w(5))
    }
    assert(tableRows(page, h.usable, roots("u")).toSeq.map(_._2) === tiny)
    assert(tableRows(page, h.usable, roots("empty")).isEmpty)
  }

  test("writer builds multi-LEVEL interior trees; edge probes and subtree walks agree") {
    // 512-byte pages force many leaves and two interior levels (child
    // cap ≈ 33/page) — the shape a 100 MB recording produces at 4096
    val rows = (0 until 3000).map { i =>
      Seq[Any](null, 1L, 1000L + i, Array.tabulate(40)(j => ((i + j) % 127).toByte))
    }
    val db = writeDb(Seq(
      ("messages", "CREATE TABLE messages(id INTEGER PRIMARY KEY, topic_id INTEGER, timestamp INTEGER, data BLOB)", rows)),
      pageSize = 512)
    val h = parseHeader(db)
    val page = pager(db, h.pageSize)
    val root = tableRoots(page, h.usable)("messages")
    // full walk: every row, in rowid order
    val got = tableRows(page, h.usable, root).toSeq
    assert(got.length === 3000 && got.map(_._1) === (1L to 3000L))
    assert(got.map(_._2(2).asInstanceOf[Long]) === (0 until 3000).map(1000L + _))
    // root children are interior pages (two levels); each subtree walks
    // independently and they partition the rowids in order
    val subs = rootChildren(page, h.usable, root)
    assert(subs.length > 1)
    val bySub = subs.map(st => tableRows(page, h.usable, st).map(_._1).toSeq)
    assert(bySub.flatten === (1L to 3000L))
    // edge probes agree with each subtree's true first/last rows
    subs.zip(bySub).foreach { case (st, ids) =>
      val Some(((fid, fv), (lid, lv))) = edgeRows(page, h.usable, st, 3)
      assert(fid === ids.head && lid === ids.last)
      assert(fv(2) === 1000L + fid - 1 && lv(2) === 1000L + lid - 1)
    }
  }

  test("multi-level grouping never builds a zero-cell interior page (row-count sweep)") {
    // a trailing group of one child (level size ≡ 1 mod the per-page
    // child cap) used to emit an interior page with zero cells, whose
    // first-edge descent read a nonexistent cell pointer; sweep row
    // counts across several page-boundary shapes and require walks +
    // edge probes to agree everywhere
    for (n <- Seq(260, 270, 280, 290, 297, 298, 299, 300, 310, 330, 350, 400)) {
      val rows = (0 until n).map { i =>
        Seq[Any](null, 1L, 1000L + i, Array.tabulate(40)(j => ((i + j) % 127).toByte))
      }
      val db = writeDb(Seq(
        ("messages", "CREATE TABLE messages(id INTEGER PRIMARY KEY, topic_id INTEGER, timestamp INTEGER, data BLOB)", rows)),
        pageSize = 512)
      val h = parseHeader(db)
      val page = pager(db, h.pageSize)
      val root = tableRoots(page, h.usable)("messages")
      assert(tableRows(page, h.usable, root).map(_._1).toSeq === (1L to n.toLong), s"n=$n")
      rootChildren(page, h.usable, root).foreach { st =>
        val e = edgeRows(page, h.usable, st, 3)
        assert(e.isDefined, s"n=$n subtree $st")
        val ((fid, _), (lid, _)) = e.get
        assert(fid <= lid, s"n=$n subtree $st")
      }
    }
  }

  test("extreme integer widths and serial-type specials survive the record codec") {
    val vals = Seq[Any](null, 0L, 1L, -1L, 127L, -128L, 32767L, -32768L,
      (1L << 23) - 1, -(1L << 23), Int.MaxValue.toLong, Int.MinValue.toLong,
      (1L << 47) - 1, -(1L << 47), Long.MaxValue, Long.MinValue,
      3.14159, -0.0, "", "héllo wörld")
    assert(record(writeRecord(vals)) === vals)
  }

  test("countMinMax: exact over writer + genuine trees; drift fails loudly") {
    // writer-built multi-page tree with shuffled timestamps
    val ts = (1 to 500).map(i => 1000L + ((i.toLong * 37) % 211) * 13)
    val rows = ts.map(t => Seq[Any](null, 1L, t, Array.fill(40)(t.toByte)))
    val db = writeDb(Seq(("messages",
      "CREATE TABLE messages(id INTEGER PRIMARY KEY, topic_id INTEGER, timestamp INTEGER, data BLOB)",
      rows)))
    val h = parseHeader(java.util.Arrays.copyOfRange(db, 0, 100))
    val pg = pager(db, h.pageSize)
    val root = tableRoots(pg, h.usable)("messages")
    assert(countMinMax(pg, h.usable, root, 2) ===
      ((500L, Some(ts.min), Some(ts.max))))
    // genuine sqlite3 bytes (incl. the multi-page overflow blob row:
    // the prefix walk must never follow that chain)
    val gen = load("/db3/genuine_rosbag2.db3")
    val gh = parseHeader(java.util.Arrays.copyOfRange(gen, 0, 100))
    val gp = pager(gen, gh.pageSize)
    val groot = tableRoots(gp, gh.usable)("messages")
    val full = tableRows(gp, gh.usable, groot).map(_._2(2).asInstanceOf[Long]).toSeq
    assert(countMinMax(gp, gh.usable, groot, 2) ===
      ((full.size.toLong, Some(full.min), Some(full.max))))

    def oneRowDb(row: Seq[Any], ddl: String): (Int => Array[Byte], Int, Int) = {
      val d = writeDb(Seq(("t", ddl, Seq(row))))
      val hh = parseHeader(java.util.Arrays.copyOfRange(d, 0, 100))
      val pp = pager(d, hh.pageSize)
      (pp, hh.usable, tableRoots(pp, hh.usable)("t"))
    }
    // short record: no value at index 2 — foreign schema, loud
    val (p1, u1, r1) = oneRowDb(Seq[Any](null, 7L),
      "CREATE TABLE t(a INTEGER PRIMARY KEY, b INTEGER)")
    val e1 = intercept[IllegalArgumentException] { countMinMax(p1, u1, r1, 2) }
    assert(e1.getMessage.contains("foreign schema"))
    // NULL timestamp — rosbag2 declares NOT NULL, loud
    val (p2, u2, r2) = oneRowDb(Seq[Any](null, 1L, null, Array[Byte](1)),
      "CREATE TABLE t(a INTEGER PRIMARY KEY, b INTEGER, c INTEGER, d BLOB)")
    val e2 = intercept[IllegalArgumentException] { countMinMax(p2, u2, r2, 2) }
    assert(e2.getMessage.contains("NOT NULL"))
    // REAL timestamp — non-integer serial type, loud
    val (p3, u3, r3) = oneRowDb(Seq[Any](null, 1L, 3.5, Array[Byte](1)),
      "CREATE TABLE t(a INTEGER PRIMARY KEY, b INTEGER, c REAL, d BLOB)")
    val e3 = intercept[IllegalArgumentException] { countMinMax(p3, u3, r3, 2) }
    assert(e3.getMessage.contains("not an integer"))
  }

  test("corrupt input fails loudly: bad magic, index page, truncated overflow") {
    val bad = new Array[Byte](100)
    intercept[IllegalArgumentException] { parseHeader(bad) }
    // an index-typed page (0x0a) must not be walked as a table
    val fake = new Array[Byte](512)
    fake(0) = 0x0a
    intercept[IllegalArgumentException] {
      tableRows(_ => fake, 512, 2).toSeq
    }
  }
}
