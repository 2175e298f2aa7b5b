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

  test("wstring fails loudly") {
    val e = intercept[IllegalArgumentException] {
      Ros2Msg.bundle("p/msg/W", "wstring s")
    }
    assert(e.getMessage.contains("wstring"))
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
    val bad = Array[Byte](0, 9, 0, 0, 0, 0, 0, 0)
    val e = intercept[IllegalArgumentException](CdrCodec.decode(b, bad))
    assert(e.getMessage.contains("representation"))
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

  test("payload/schema mismatch fails loudly, not silently truncated") {
    val b = Ros2Msg.bundle("p/msg/M", "int64 x")
    val tooLong = CdrCodec.encode(b, Seq(5L)) ++ Array[Byte](1, 2, 3, 4, 5)
    val e = intercept[IllegalArgumentException](CdrCodec.decode(b, tooLong))
    assert(e.getMessage.contains("mismatch"))
    val tooShort = CdrCodec.encode(b, Seq(5L)).take(8)
    intercept[IllegalArgumentException](CdrCodec.decode(b, tooShort))
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
