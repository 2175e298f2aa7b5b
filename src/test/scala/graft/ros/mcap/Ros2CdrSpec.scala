package graft.ros.mcap

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row

class Ros2CdrSpec extends AnyFunSuite {

  test("ros2msg normalization: bounds, defaults, /msg/ names, byte/char") {
    val ros2 =
      """string<=10 name "anon"
        |int32 count 5
        |byte flags
        |char code
        |float64[] values
        |geometry_msgs/msg/Point[<=16] points
        |uint8[4] quad
        |CONST_A int32 does_not_parse_as_field
        |================================================================================
        |MSG: geometry_msgs/msg/Point
        |float64 x
        |float64 y 1.5
        |float64 z""".stripMargin
    // the constant-looking line above is malformed on purpose? no — drop it
    val cleaned = ros2.linesIterator.filterNot(_.startsWith("CONST_A")).mkString("\n")
    val b = Ros2Msg.bundle("test_pkg/msg/Sample", cleaned)
    assert(b.root.fullName == "test_pkg/Sample")
    val names = b.root.fields.map(f => (f.name, f.tpe.toString))
    assert(b.root.fields.map(_.name) ==
      Seq("name", "count", "flags", "code", "values", "points", "quad"), s"$names")
    import graft.ros._
    import graft.ros.RosPrimitive._
    assert(b.root.fields(0).tpe == RString)       // bound dropped
    assert(b.root.fields(1).tpe == RInt32)        // default stripped
    assert(b.root.fields(2).tpe == RUInt8)        // ros2 byte = uint8
    assert(b.root.fields(3).tpe == RUInt8)
    assert(b.root.fields(5).tpe == RosArray(RosMsgRef(Some("geometry_msgs"), "Point"), None))
    assert(b.root.fields(6).tpe == RosArray(RUInt8, Some(4)))
    assert(b.deps.contains("geometry_msgs/Point"))
    // builtins injected even though the closure omitted them
    assert(b.deps.contains("builtin_interfaces/Time"))
  }

  test("constants are kept as constants (with values) and skipped on the wire") {
    val b = Ros2Msg.bundle("p/msg/C", "int32 LIMIT=42\nint32 x")
    assert(b.root.fields.head.isConstant && b.root.fields.head.constantValue.contains("42"))
    val bytes = CdrCodec.encode(b, Seq(7))
    assert(CdrCodec.decode(b, bytes) == Seq(7))
  }

  test("wstring: XTypes UTF-16 wire goldens, both endiannesses, round trips") {
    val b = Ros2Msg.bundle("p/msg/W", "wstring s\nint32 x")
    // LE golden: {0,1,0,0} header; u32 byte length 4 (NO terminator,
    // unlike string's NUL-counting length); "aé" as UTF-16LE; x @12
    val le = Array[Byte](0, 1, 0, 0,
      4, 0, 0, 0, 0x61, 0x00, 0xE9.toByte, 0x00,
      7, 0, 0, 0)
    assert(CdrCodec.decode(b, le) === Seq("aé", 7))
    // BE golden (representation id 0x00): code units big-endian
    val be = Array[Byte](0, 0, 0, 0,
      0, 0, 0, 4, 0x00, 0x61, 0x00, 0xE9.toByte,
      0, 0, 0, 7)
    assert(CdrCodec.decode(b, be) === Seq("aé", 7))
    // interop tolerance: a writer that appended (and counted) a
    // UTF-16 NUL terminator still decodes clean
    val leNul = Array[Byte](0, 1, 0, 0,
      6, 0, 0, 0, 0x61, 0x00, 0xE9.toByte, 0x00, 0x00, 0x00,
      0, 0, // alignment pad to 4 for x
      7, 0, 0, 0)
    assert(CdrCodec.decode(b, leNul) === Seq("aé", 7))
    // odd byte length is corruption, not UTF-16
    val odd = Array[Byte](0, 1, 0, 0, 3, 0, 0, 0, 0x61, 0x00, 0x62, 0x00)
    val eOdd = intercept[IllegalArgumentException] { CdrCodec.decode(b, odd) }
    assert(eOdd.getMessage.contains("odd"))
    // encode round trip across every flavor, surrogate pairs included
    val arr = Ros2Msg.bundle("p/msg/WA",
      "wstring<=16 s\nwstring[] many\nwstring[2] two")
    val vals = Seq("漢字 😀", Seq("", "π≈3"), Seq("aé", new String(Character.toChars(0x1F680))))
    import CdrCodec._
    for (fl <- Seq(Xcdr1, Xcdr1Mutable, Xcdr2Final, Xcdr2Delimited, Xcdr2Mutable)) {
      val bytes = CdrCodec.encode(arr, vals, fl)
      assert(CdrCodec.decode(arr, bytes) === vals, s"flavor $fl")
    }
    // ros1 paths refuse: wstring has no ROS 1 wire form
    val ros1 = graft.ros.MsgDefParser.parse("p/W", "wstring s")
    val e1 = intercept[IllegalArgumentException] {
      graft.ros.RosSchemaMapper.decode(ros1, Array[Byte](0, 0, 0, 0))
    }
    assert(e1.getMessage.contains("not a ROS 1 wire type"))
  }

  test("CDR alignment golden: hand-computed byte layout") {
    val b = Ros2Msg.bundle("p/msg/G", "bool a\nfloat64 v\nstring s\nint32 c")
    val bytes = CdrCodec.encode(b, Seq(true, 1.5, "hi", 7))
    // 4-byte encapsulation {0,1,0,0}; a @4; 7 pad; v (le double 1.5) @12;
    // string: align4 @20 -> u32 len 3 (incl NUL), "hi\0" @24..26;
    // c: align4 from 27 -> pad @27, @28..31. Total 32.
    assert(bytes.length == 32, s"got ${bytes.length}")
    assert(bytes.slice(0, 4).toSeq == Seq[Byte](0, 1, 0, 0))
    assert(bytes(4) == 1)
    assert(bytes.slice(5, 12).forall(_ == 0))
    assert(java.lang.Double.longBitsToDouble(
      (0 until 8).map(i => (bytes(12 + i) & 0xFFL) << (8 * i)).reduce(_ | _)) == 1.5)
    assert(McapFormat.leInt(bytes, 20) == 3)
    assert(new String(bytes, 24, 2, "UTF-8") == "hi" && bytes(26) == 0)
    assert(McapFormat.leInt(bytes, 28) == 7)
    assert(CdrCodec.decode(b, bytes) == Seq(true, 1.5, "hi", 7))
  }

  test("big-endian representation id decodes too; unknown id fails loudly") {
    val b = Ros2Msg.bundle("p/msg/E", "int32 x")
    // hand-build a CDR_BE payload: {0,0,0,0} then int32 BE
    val be = Array[Byte](0, 0, 0, 0, 0, 0, 1, 2)
    assert(CdrCodec.decode(b, be) == Seq(258))
    val bad = Array[Byte](0, 0x21, 0, 0, 0, 0, 0, 0)
    val e = intercept[IllegalArgumentException](CdrCodec.decode(b, bad))
    assert(e.getMessage.contains("representation"))
    // the PL_PLAIN gap ids (0x04/0x05 are unassigned) refuse too
    for (rep <- Seq(0x04, 0x05, 0x0c)) {
      val pl = Array[Byte](0, rep.toByte, 0, 0, 0, 0, 0, 0)
      intercept[IllegalArgumentException](CdrCodec.decode(b, pl))
    }
  }

  test("nested structs, builtin Time, and sequences round-trip (randomized)") {
    val schema =
      """std_msgs/msg/Header header
        |float64[] ranges
        |int16 level
        |p/msg/Sub[] subs
        |uint8[] payload
        |================================================================================
        |MSG: std_msgs/msg/Header
        |builtin_interfaces/Time stamp
        |string frame_id
        |================================================================================
        |MSG: p/msg/Sub
        |int8 tag
        |float32 weight""".stripMargin
    val b = Ros2Msg.bundle("p/msg/Scan", schema)
    val flat = graft.ros.RosSchemaMapper.flatSchema(b)
    assert(flat.fieldNames.toSeq == Seq(
      "header_stamp_sec", "header_stamp_nanosec", "header_frame_id",
      "ranges", "level", "subs", "payload"))
    val rnd = new scala.util.Random(88)
    for (_ <- 0 until 50) {
      val vals = Seq(
        rnd.nextInt(), rnd.nextInt(1 << 30).toLong, // nanosec is uint32 -> Long
        rnd.alphanumeric.take(rnd.nextInt(9)).mkString,
        Seq.fill(rnd.nextInt(5))(rnd.nextDouble()),
        rnd.nextInt(1 << 14) - (1 << 13),
        Seq.fill(rnd.nextInt(4))(Row(rnd.nextInt(256) - 128, rnd.nextFloat())),
        Array.fill(rnd.nextInt(9))(rnd.nextInt(256).toByte): Any)
      val bytes = CdrCodec.encode(b, vals)
      val back = CdrCodec.decode(b, bytes)
      val norm = (x: Any) => x match {
        case a: Array[Byte] => a.toSeq
        case other => other
      }
      assert(back.map(norm) == vals.map(norm), s"mismatch for $vals")
    }
  }

  test("XCDR2 alignment golden: 8-byte primitives align to 4, both endiannesses") {
    import CdrCodec.Xcdr2Final
    val b = Ros2Msg.bundle("p/msg/E", "uint8 a\nfloat64 v\nint64 c")
    // CDR2_LE {0,7,0,0}: a @4(rel0); pad rel1-3; v @rel4 (4-byte max
    // alignment — XCDR1 would pad to rel8); c @rel12. Total 24.
    val bytes = CdrCodec.encode(b, Seq(17, 1.5, -2L), Xcdr2Final)
    assert(bytes.length == 24, s"got ${bytes.length}")
    assert(bytes.slice(0, 4).toSeq == Seq[Byte](0, 7, 0, 0))
    assert(bytes(4) == 17)
    assert(java.lang.Double.longBitsToDouble(
      (0 until 8).map(i => (bytes(8 + i) & 0xFFL) << (8 * i)).reduce(_ | _)) == 1.5)
    assert((0 until 8).map(i => (bytes(16 + i) & 0xFFL) << (8 * i))
      .reduce(_ | _) == -2L)
    assert(CdrCodec.decode(b, bytes) == Seq(17, 1.5, -2L))
    // the SAME values under XCDR1 pad v to rel8 → 4 bytes longer
    assert(CdrCodec.encode(b, Seq(17, 1.5, -2L)).length == 28)
    // hand-built CDR2_BE {0,6,0,0}
    val bb = java.nio.ByteBuffer.allocate(24).order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.put(Array[Byte](0, 6, 0, 0)).put(17.toByte)
      .put(Array[Byte](0, 0, 0)).putDouble(1.5).putLong(-2L)
    assert(CdrCodec.decode(b, bb.array()) == Seq(17, 1.5, -2L))
  }

  test("XCDR2 delimited golden: DHEADERs, nested struct, appendable forward-skip") {
    import CdrCodec.Xcdr2Delimited
    val schema =
      """int32 x
        |p/msg/Inner i
        |string s
        |================================================================================
        |MSG: p/msg/Inner
        |uint8 y""".stripMargin
    val b = Ros2Msg.bundle("p/msg/Outer", schema)
    val bytes = CdrCodec.encode(b, Seq(7, 42, "hi"), Xcdr2Delimited)
    // D_CDR2_LE {0,9,0,0}; top DHEADER @rel0 = 19; x @rel4 = 7;
    // inner DHEADER @rel8 = 1; y @rel12 = 42; pad rel13-15;
    // string len @rel16 = 3; "hi\0" @rel20-22. Total 4 + 4 + 19 = 27.
    assert(bytes.slice(0, 4).toSeq == Seq[Byte](0, 9, 0, 0))
    assert(McapFormat.leInt(bytes, 4) == 19, "top DHEADER bytes")
    assert(McapFormat.leInt(bytes, 8) == 7)
    assert(McapFormat.leInt(bytes, 12) == 1, "inner DHEADER bytes")
    assert(bytes(16) == 42)
    assert(McapFormat.leInt(bytes, 20) == 3)
    assert(new String(bytes, 24, 2, "UTF-8") == "hi" && bytes(26) == 0)
    assert(bytes.length == 27)
    assert(CdrCodec.decode(b, bytes) == Seq(7, 42, "hi"))
    // appendable forward-compat: a NEWER writer appended a field to
    // Inner — extra bytes inside its DHEADER scope are skipped, and
    // the decode still lands on s correctly
    val grown = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array[Byte](0, 9, 0, 0))
      def le(v: Int): Array[Byte] =
        Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
          ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
      out.write(le(27))          // top DHEADER (8 extra inner bytes)
      out.write(le(7))           // x
      out.write(le(9))           // inner DHEADER: y + pad + extra u32
      out.write(42); out.write(Array[Byte](0, 0, 0)) // y + pad to 4
      out.write(le(999))         // the appended unknown member
      out.write(0)               // one more unknown byte in the scope
      // after skip-to-end, string aligns from rel21 → pad to rel24?
      // no: scope end is rel21... keep it simple, make inner scope a
      // multiple of 4: dheader said 9 → next pos rel21; string align4
      // pads rel21-23; len @rel24
      out.write(Array[Byte](0, 0, 0)) // string alignment pad
      out.write(le(3))
      out.write("hi".getBytes("UTF-8")); out.write(0)
      out.toByteArray
    }
    assert(CdrCodec.decode(b, grown) == Seq(7, 42, "hi"),
      "unknown appended members must skip via the DHEADER")
    // a decode OVERRUNNING its scope is corruption
    val shrunk = bytes.clone()
    shrunk(12) = 0 // inner DHEADER claims 0 bytes but y follows
    val e = intercept[IllegalArgumentException](CdrCodec.decode(b, shrunk))
    assert(e.getMessage.contains("DHEADER"))
  }

  test("XCDR2 collections: non-primitive element sequences carry DHEADERs") {
    import CdrCodec.{Xcdr2Final, Xcdr2Delimited}
    val b = Ros2Msg.bundle("p/msg/L", "string[] xs\nuint32 n")
    val vals = Seq(Seq("ab", "c"), 9L)
    val fin = CdrCodec.encode(b, vals, Xcdr2Final)
    // CDR2_LE: collection DHEADER @rel0 = bytes of (count + elements)
    // = 4 + (4+3) + pad1 + (4+2) = 18; count @rel4 = 2; "ab\0" len 3
    // @rel8; "c\0" len 2 @rel16 (align4 from rel15); n @rel24
    assert(McapFormat.leInt(fin, 4) == 18, "collection DHEADER")
    assert(McapFormat.leInt(fin, 8) == 2, "element count")
    assert(CdrCodec.decode(b, fin) == vals)
    val delim = CdrCodec.encode(b, vals, Xcdr2Delimited)
    assert(CdrCodec.decode(b, delim) == vals)
    // uint8[] stays primitive: count + raw bytes, no DHEADER
    val bb = Ros2Msg.bundle("p/msg/B", "uint8[] p\nint32 z")
    val bv = Seq(Array[Byte](1, 2, 3), 5)
    val enc = CdrCodec.encode(bb, bv, Xcdr2Final)
    assert(McapFormat.leInt(enc, 4) == 3, "count directly, no DHEADER")
    val back = CdrCodec.decode(bb, enc)
    assert(back(0).asInstanceOf[Array[Byte]].toSeq == Seq[Byte](1, 2, 3))
    assert(back(1) == 5)
  }

  test("XCDR2 randomized round-trips match XCDR1 values (all flavors)") {
    import CdrCodec.{Xcdr1, Xcdr2Final, Xcdr2Delimited}
    val schema =
      """std_msgs/msg/Header header
        |float64[] ranges
        |int16 level
        |p/msg/Sub[] subs
        |uint8[] payload
        |string[] tags
        |================================================================================
        |MSG: std_msgs/msg/Header
        |builtin_interfaces/Time stamp
        |string frame_id
        |================================================================================
        |MSG: p/msg/Sub
        |int8 tag
        |float32 weight""".stripMargin
    val b = Ros2Msg.bundle("p/msg/Scan", schema)
    val rnd = new scala.util.Random(1616)
    val norm = (x: Any) => x match {
      case a: Array[Byte] => a.toSeq
      case other => other
    }
    for (_ <- 0 until 40) {
      val vals = Seq(
        rnd.nextInt(), rnd.nextInt(1 << 30).toLong,
        rnd.alphanumeric.take(rnd.nextInt(9)).mkString,
        Seq.fill(rnd.nextInt(5))(rnd.nextDouble()),
        rnd.nextInt(1 << 14) - (1 << 13),
        Seq.fill(rnd.nextInt(4))(Row(rnd.nextInt(256) - 128, rnd.nextFloat())),
        Array.fill(rnd.nextInt(9))(rnd.nextInt(256).toByte): Any,
        Seq.fill(rnd.nextInt(4))(rnd.alphanumeric.take(rnd.nextInt(6)).mkString))
      for (flavor <- Seq(Xcdr1, Xcdr2Final, Xcdr2Delimited)) {
        val bytes = CdrCodec.encode(b, vals, flavor)
        val back = CdrCodec.decode(b, bytes)
        assert(back.map(norm) == vals.map(norm), s"flavor $flavor: $vals")
      }
    }
  }

  test("payload/schema mismatch fails loudly, not silently truncated") {
    val b = Ros2Msg.bundle("p/msg/M", "int64 x")
    val tooLong = CdrCodec.encode(b, Seq(5L)) ++ Array[Byte](1, 2, 3, 4, 5)
    val e = intercept[IllegalArgumentException](CdrCodec.decode(b, tooLong))
    assert(e.getMessage.contains("mismatch"))
    val tooShort = CdrCodec.encode(b, Seq(5L)).take(8)
    intercept[IllegalArgumentException](CdrCodec.decode(b, tooShort))
  }

  // ---- mutable flavors: PL_CDR (0x02/0x03) and PL_CDR2 (0x0a/0x0b) ----

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)

  test("PL_CDR2 mutable golden: EMHEADER layout byte-by-byte, LC 2/3/5") {
    import CdrCodec.Xcdr2Mutable
    val b = Ros2Msg.bundle("p/msg/M", "int32 x\nfloat64 v\nstring s")
    val bytes = CdrCodec.encode(b, Seq(7, 1.5, "hi"), Xcdr2Mutable)
    // {0,0x0b,0,0}; DHEADER @rel0 = 31; EMHEADER(x: LC=2, id=0) @rel4;
    // 7 @rel8; EMHEADER(v: LC=3, id=1) @rel12; 1.5 @rel16 (xcdr2: no
    // 8-align); EMHEADER(s: LC=5 NEXTINT-reuse, id=2) @rel24;
    // len 3 @rel28; "hi\0" @rel32..34. Total 4+4+31 = 39.
    assert(bytes.slice(0, 4).toSeq == Seq[Byte](0, 0x0b, 0, 0))
    assert(McapFormat.leInt(bytes, 4) == 31, "top DHEADER")
    assert(McapFormat.leInt(bytes, 8) == 0x20000000, "EMHEADER x: LC=2 id=0")
    assert(McapFormat.leInt(bytes, 12) == 7)
    assert(McapFormat.leInt(bytes, 16) == 0x30000001, "EMHEADER v: LC=3 id=1")
    assert(java.lang.Double.longBitsToDouble(
      (0 until 8).map(i => (bytes(20 + i) & 0xFFL) << (8 * i)).reduce(_ | _)) == 1.5)
    assert(McapFormat.leInt(bytes, 28) == 0x50000002, "EMHEADER s: LC=5 id=2")
    assert(McapFormat.leInt(bytes, 32) == 3, "string length doubles as NEXTINT")
    assert(new String(bytes, 36, 2, "UTF-8") == "hi" && bytes(38) == 0)
    assert(bytes.length == 39)
    assert(CdrCodec.decode(b, bytes) == Seq(7, 1.5, "hi"))
  }

  test("PL_CDR2 mutable: any member order, unknown ids skip, absent members default") {
    val b = Ros2Msg.bundle("p/msg/M", "int32 x\nfloat64 v\nstring s")
    // hand-build {s first, then an UNKNOWN id 9 (LC=4), then x; v absent}
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0, 0x0b, 0, 0))
    val members = new java.io.ByteArrayOutputStream()
    members.write(le32(0x50000002))            // s: LC=5, id=2
    members.write(le32(3)); members.write("hi".getBytes("UTF-8")); members.write(0)
    members.write(0)                           // pad to 4 for next EMHEADER
    members.write(le32(0x40000009))            // unknown id 9: LC=4
    members.write(le32(6))                     // NEXTINT: 6 bytes follow
    members.write(Array[Byte](1, 2, 3, 4, 5, 6))
    members.write(Array[Byte](0, 0))           // pad to 4
    members.write(le32(0x20000000))            // x: LC=2, id=0
    members.write(le32(42))
    val m = members.toByteArray
    out.write(le32(m.length)); out.write(m)
    assert(CdrCodec.decode(b, out.toByteArray) == Seq(42, 0.0, "hi"),
      "reorder + unknown-skip + default for the absent double")
    // the SAME unknown id with the must-understand bit set fails loudly
    val mu = m.clone()
    // flip id-9's EMHEADER top bit (offset: 12 bytes of s member + pad)
    val emOff = 4 + (4 + 3) + 1
    assert(McapFormat.leInt(mu, emOff) == 0x40000009)
    mu(emOff + 3) = (mu(emOff + 3) | 0x80).toByte
    val out2 = new java.io.ByteArrayOutputStream()
    out2.write(Array[Byte](0, 0x0b, 0, 0)); out2.write(le32(mu.length)); out2.write(mu)
    val e = intercept[IllegalArgumentException](CdrCodec.decode(b, out2.toByteArray))
    assert(e.getMessage.contains("must-understand"))
  }

  test("PL_CDR2 mutable: LC 6/7 element-count lengths and duplicate-id refusal") {
    val b = Ros2Msg.bundle("p/msg/M", "uint32[] xs\nfloat64[] vs")
    // xs via LC=6 (4-byte elements: len = 4 + count*4), vs via LC=7
    // (8-byte elements: len = 4 + count*8) — NEXTINT reused as the
    // sequence's own count; 2-byte-element sequences have no
    // shortcut code and take LC=4
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0, 0x0b, 0, 0))
    val members = new java.io.ByteArrayOutputStream()
    members.write(le32(0x60000000))                      // xs: LC=6, id=0
    members.write(le32(2)); members.write(le32(7)); members.write(le32(9))
    members.write(le32(0x70000001))                      // vs: LC=7, id=1
    members.write(le32(1))
    (0 until 8).foreach(i => members.write(((java.lang.Double.doubleToLongBits(2.5) >> (8 * i)) & 0xFF).toInt))
    val m = members.toByteArray
    out.write(le32(m.length)); out.write(m)
    assert(CdrCodec.decode(b, out.toByteArray) == Seq(Seq(7, 9), Seq(2.5)))
    // a duplicated member id is corruption, not last-wins
    val dup = new java.io.ByteArrayOutputStream()
    dup.write(Array[Byte](0, 0x0b, 0, 0))
    val dm = new java.io.ByteArrayOutputStream()
    dm.write(le32(0x60000000)); dm.write(le32(1)); dm.write(le32(7))
    dm.write(le32(0x60000000)); dm.write(le32(1)); dm.write(le32(8))
    val dmb = dm.toByteArray
    dup.write(le32(dmb.length)); dup.write(dmb)
    val e = intercept[IllegalArgumentException](CdrCodec.decode(b, dup.toByteArray))
    assert(e.getMessage.contains("duplicate"))
  }

  test("PL_CDR mutable golden: parameter headers, member origin reset, sentinel") {
    import CdrCodec.Xcdr1Mutable
    val b = Ros2Msg.bundle("p/msg/M", "int32 x\nfloat64 v\nstring s")
    val bytes = CdrCodec.encode(b, Seq(7, 1.5, "hi"), Xcdr1Mutable)
    // {0,0x03,0,0}; param(id=0,len=4) @rel0, 7 @rel4;
    // param(id=1,len=8) @rel8, 1.5 @rel12 — rel12 is NOT 8-aligned:
    // the member value's alignment origin RESETS (XTypes PUSH(ORIGIN=0));
    // param(id=2,len=8 incl pad) @rel20, u32 3 + "hi\0" + pad @rel24;
    // sentinel 0x3F02 len 0 @rel32. Total 4 + 36 = 40.
    assert(bytes.slice(0, 4).toSeq == Seq[Byte](0, 3, 0, 0))
    assert(McapFormat.leShort(bytes, 4) == 0 && McapFormat.leShort(bytes, 6) == 4)
    assert(McapFormat.leInt(bytes, 8) == 7)
    assert(McapFormat.leShort(bytes, 12) == 1 && McapFormat.leShort(bytes, 14) == 8)
    assert(java.lang.Double.longBitsToDouble(
      (0 until 8).map(i => (bytes(16 + i) & 0xFFL) << (8 * i)).reduce(_ | _)) == 1.5,
      "double at a 4-but-not-8-aligned stream position: origin reset")
    assert(McapFormat.leShort(bytes, 24) == 2 && McapFormat.leShort(bytes, 26) == 8)
    assert(McapFormat.leInt(bytes, 28) == 3)
    assert(new String(bytes, 32, 2, "UTF-8") == "hi" && bytes(34) == 0)
    assert(McapFormat.leShort(bytes, 36) == 0x3F02 && McapFormat.leShort(bytes, 38) == 0)
    assert(bytes.length == 40)
    assert(CdrCodec.decode(b, bytes) == Seq(7, 1.5, "hi"))
  }

  test("PL_CDR mutable: reorder, extended PID, unknown skip, defaults, must-understand") {
    val b = Ros2Msg.bundle("p/msg/M", "int32 x\nfloat64 v\nstring s")
    def payload(params: Array[Byte]): Array[Byte] =
      Array[Byte](0, 3, 0, 0) ++ params ++ le16(0x3F02) ++ le16(0)
    // v via EXTENDED pid header, then unknown id 7 skipped, then x; s absent
    val p = new java.io.ByteArrayOutputStream()
    p.write(le16(0x3F01)); p.write(le16(8))    // PID_EXTENDED, header len 8
    p.write(le32(1)); p.write(le32(8))         // member id 1, value len 8
    (0 until 8).foreach(i => p.write(((java.lang.Double.doubleToLongBits(1.5) >> (8 * i)) & 0xFF).toInt))
    p.write(le16(7)); p.write(le16(4)); p.write(le32(99))  // unknown id 7
    p.write(le16(0)); p.write(le16(4)); p.write(le32(42))  // x
    assert(CdrCodec.decode(b, payload(p.toByteArray)) == Seq(42, 1.5, ""),
      "extended pid + reorder + unknown-skip + default for the absent string")
    // the unknown id with FLAG_MUST_UNDERSTAND (0x4000) fails loudly
    val q = new java.io.ByteArrayOutputStream()
    q.write(le16(7 | 0x4000)); q.write(le16(4)); q.write(le32(99))
    val e = intercept[IllegalArgumentException](CdrCodec.decode(b, payload(q.toByteArray)))
    assert(e.getMessage.contains("must-understand"))
  }

  test("mutable randomized round-trips across BOTH PL flavors (nested, arrays, Time)") {
    import CdrCodec.{Xcdr1Mutable, Xcdr2Mutable}
    val schema =
      """std_msgs/msg/Header header
        |float64[] ranges
        |int16 level
        |p/msg/Sub[] subs
        |uint8[] payload
        |string[] tags
        |================================================================================
        |MSG: std_msgs/msg/Header
        |builtin_interfaces/Time stamp
        |string frame_id
        |================================================================================
        |MSG: p/msg/Sub
        |int8 tag
        |float32 weight""".stripMargin
    val b = Ros2Msg.bundle("p/msg/Scan", schema)
    val rnd = new scala.util.Random(2024)
    val norm = (x: Any) => x match {
      case a: Array[Byte] => a.toSeq
      case other => other
    }
    for (_ <- 0 until 40) {
      val vals = Seq(
        rnd.nextInt(), rnd.nextInt(1 << 30).toLong,
        rnd.alphanumeric.take(rnd.nextInt(9)).mkString,
        Seq.fill(rnd.nextInt(5))(rnd.nextDouble()),
        rnd.nextInt(1 << 14) - (1 << 13),
        Seq.fill(rnd.nextInt(4))(Row(rnd.nextInt(256) - 128, rnd.nextFloat())),
        Array.fill(rnd.nextInt(9))(rnd.nextInt(256).toByte): Any,
        Seq.fill(rnd.nextInt(4))(rnd.alphanumeric.take(rnd.nextInt(6)).mkString))
      for (flavor <- Seq(Xcdr1Mutable, Xcdr2Mutable)) {
        val bytes = CdrCodec.encode(b, vals, flavor)
        val back = CdrCodec.decode(b, bytes)
        assert(back.map(norm) == vals.map(norm), s"flavor $flavor: $vals")
      }
    }
  }

  test("big-endian mutable payloads decode too (PL_CDR2 0x0a, PL_CDR 0x02)") {
    val b = Ros2Msg.bundle("p/msg/M", "int32 x\nfloat64 v")
    def be32(v: Int): Array[Byte] =
      Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
        ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def be16(v: Int): Array[Byte] =
      Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    val vbits = java.lang.Double.doubleToLongBits(1.5)
    val beDouble = (0 until 8).map(i => ((vbits >> (8 * (7 - i))) & 0xFF).toByte).toArray
    // PL_CDR2 BE: {0,0x0a,0,0}; DHEADER; EMHEADER(LC=2,id=0); x;
    // EMHEADER(LC=3,id=1); v
    val pl2 = new java.io.ByteArrayOutputStream()
    pl2.write(Array[Byte](0, 0x0a, 0, 0))
    val m2 = be32(0x20000000) ++ be32(7) ++ be32(0x30000001) ++ beDouble
    pl2.write(be32(m2.length)); pl2.write(m2)
    assert(CdrCodec.decode(b, pl2.toByteArray) == Seq(7, 1.5))
    // PL_CDR BE: {0,0x02,0,0}; param(0,4); x; param(1,8); v (origin
    // reset: the double starts unpadded at its member's value start);
    // sentinel
    val pl1 = new java.io.ByteArrayOutputStream()
    pl1.write(Array[Byte](0, 0x02, 0, 0))
    pl1.write(be16(0)); pl1.write(be16(4)); pl1.write(be32(7))
    pl1.write(be16(1)); pl1.write(be16(8)); pl1.write(beDouble)
    pl1.write(be16(0x3F02)); pl1.write(be16(0))
    assert(CdrCodec.decode(b, pl1.toByteArray) == Seq(7, 1.5))
  }

  test("PL_CDR2 member overrunning its struct DHEADER fails loudly") {
    val b = Ros2Msg.bundle("p/msg/M", "int32 x")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0, 0x0b, 0, 0))
    out.write(le32(8))                 // DHEADER claims 8 bytes
    out.write(le32(0x40000000))        // x: LC=4 …
    out.write(le32(64))                // … but NEXTINT says 64 bytes
    out.write(le32(42))
    val e = intercept[IllegalArgumentException](CdrCodec.decode(b, out.toByteArray))
    assert(e.getMessage.contains("overruns"))
  }

  test("'=' in a string default or comment does not turn a field into a constant") {
    // misrouting any of these into the constant branch would skip a
    // REAL wire field and misalign every later column
    val defn =
      """string url "http://h?a=b"
        |int32 x 5 # a=b
        |int32 LIM=7
        |int32 SPACED = 9
        |int32 w""".stripMargin
    val b = Ros2Msg.bundle("p/msg/Eq", defn)
    val (consts, fields) = b.root.fields.partition(_.isConstant)
    assert(fields.map(_.name) == Seq("url", "x", "w"), fields.map(_.name))
    assert(consts.map(_.name) == Seq("LIM", "SPACED"))
    // and the wire layout matches the three real fields
    val bytes = CdrCodec.encode(b, Seq("u", 3, 4))
    assert(CdrCodec.decode(b, bytes) == Seq("u", 3, 4))
  }
}
