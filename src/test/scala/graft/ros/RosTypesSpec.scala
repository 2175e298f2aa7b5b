package graft.ros

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import RosPrimitive._


class RosTypesSpec extends AnyFunSuite {
  test("parses Imu bundle: root fields, deps, arrays, comments") {
    val b = MsgDefParser.parse("sensor_msgs/Imu", Fixtures.imuDef)
    assert(b.root.fullName == "sensor_msgs/Imu")
    assert(b.root.fields.map(_.name) == Seq("header", "orientation",
      "orientation_covariance", "angular_velocity", "angular_velocity_covariance",
      "linear_acceleration", "linear_acceleration_covariance"))
    assert(b.deps.keySet == Set("std_msgs/Header", "geometry_msgs/Quaternion",
      "geometry_msgs/Vector3"))
    assert(b.root.fields(2).tpe == RosArray(RFloat64, Some(9)))
    // bare `Header` resolves to std_msgs/Header
    val hdr = b.resolve(RosMsgRef(None, "Header"), Some("sensor_msgs"))
    assert(hdr.fullName == "std_msgs/Header")
    assert(hdr.fields.map(_.tpe) == Seq(RUInt32, RTime, RString))
  }

  test("parses Log: constants flagged and excluded from schema") {
    val b = MsgDefParser.parse("rosgraph_msgs/Log", Fixtures.logDef)
    val consts = b.root.fields.filter(_.isConstant)
    assert(consts.map(_.name) == Seq("DEBUG", "INFO", "WARN", "ERROR", "FATAL"))
    assert(consts.map(_.constantValue.get) == Seq("1", "2", "4", "8", "16"))
    assert(b.root.fields.filterNot(_.isConstant).map(_.name) ==
      Seq("header", "level", "name", "msg", "file", "function", "line", "topics"))
    assert(b.root.fields.last.tpe == RosArray(RString, None))
  }

  test("string constants keep '#' (ROS spec)") {
    val d = MsgDefParser.parseBlock("t/T", Seq("string EXAMPLE=#comment is value"))
    assert(d.fields.head.constantValue.contains("#comment is value"))
  }

  test("array suffix parsing") {
    assert(MsgDefParser.parseType("uint8[]")._1 == RosArray(RUInt8, None))
    assert(MsgDefParser.parseType("float32[36]")._1 == RosArray(RFloat32, Some(36)))
    assert(MsgDefParser.parseType("geometry_msgs/Point[]")._1 ==
      RosArray(RosMsgRef(Some("geometry_msgs"), "Point"), None))
  }
}

class RosSchemaMapperSpec extends AnyFunSuite {
  import Fixtures._

  test("Imu flat schema: prefix-joined columns, time split, arrays materialized") {
    val b = MsgDefParser.parse("sensor_msgs/Imu", imuDef)
    val s = RosSchemaMapper.flatSchema(b)
    assert(s.fieldNames.toSeq == Seq(
      "header_seq", "header_stamp_sec", "header_stamp_nsec", "header_frame_id",
      "orientation_x", "orientation_y", "orientation_z", "orientation_w",
      "orientation_covariance",
      "angular_velocity_x", "angular_velocity_y", "angular_velocity_z",
      "angular_velocity_covariance",
      "linear_acceleration_x", "linear_acceleration_y", "linear_acceleration_z",
      "linear_acceleration_covariance"))
    assert(s("header_seq").dataType == LongType)          // uint32 widened
    assert(s("header_stamp_sec").dataType == IntegerType)
    assert(s("orientation_x").dataType == DoubleType)
    assert(s("orientation_covariance").dataType ==
      ArrayType(DoubleType, containsNull = false))
    assert(s("header_frame_id").dataType == StringType)
  }

  test("unsigned decode is correct where the reference is wrong (SURVEY §1.2)") {
    val d = RosMsgDef("t/T", Seq(
      RosField("u8", RUInt8, None), RosField("u16", RUInt16, None),
      RosField("u32", RUInt32, None), RosField("i8", RInt8, None),
      RosField("b", RBool, None)))
    val bundle = RosMsgBundle(d, Map.empty)
    val bytes = Array[Byte](
      200.toByte,                       // uint8 200 (ref would read -56)
      0x30, 0x82.toByte,                // uint16 0x8230 = 33328 (ref: negative)
      0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte, // uint32 4294967295
      -5,                               // int8 -5
      1)                                // bool true
    val vals = RosSchemaMapper.decode(bundle, bytes)
    assert(vals == Seq(200, 33328, 4294967295L, -5, true))
  }

  test("decode enforces full consumption (reference MessageTable.cpp:38)") {
    val d = RosMsgDef("t/T", Seq(RosField("x", RInt32, None)))
    val bundle = RosMsgBundle(d, Map.empty)
    intercept[IllegalArgumentException] {
      RosSchemaMapper.decode(bundle, Array[Byte](1, 0, 0, 0, 99))
    }
  }

  test("encode/decode round-trip on a kitchen-sink type") {
    val sub = RosMsgDef("t/Sub", Seq(
      RosField("a", RInt16, None), RosField("s", RString, None)))
    val d = RosMsgDef("t/T", Seq(
      RosField("flag", RBool, None),
      RosField("n", RInt64, None),
      RosField("f", RFloat32, None),
      RosField("name", RString, None),
      RosField("when", RTime, None),
      RosField("blob", RosArray(RUInt8, None), None),
      RosField("fixed", RosArray(RFloat64, Some(3)), None),
      RosField("subs", RosArray(RosMsgRef(Some("t"), "Sub"), None), None),
      RosField("child", RosMsgRef(Some("t"), "Sub"), None)))
    val bundle = RosMsgBundle(d, Map("t/Sub" -> sub))
    val values: Seq[Any] = Seq(
      true, 123456789012345L, 2.5f, "hello wörld", 1700000000, 999,
      Array[Byte](1, 2, 3, 4),
      Seq(1.0, -2.0, 3.5),
      Seq(org.apache.spark.sql.Row(7, "x"), org.apache.spark.sql.Row(-9, "yz")),
      // child flattened inline:
      42, "tail")
    val bytes = RosSchemaMapper.encode(bundle, values)
    val decoded = RosSchemaMapper.decode(bundle, bytes)
    // byte arrays need deep compare
    assert(decoded.map {
      case a: Array[Byte] => a.toSeq
      case v => v
    } == values.map {
      case a: Array[Byte] => a.toSeq
      case v => v
    })
    // schema arity matches decoded arity
    assert(RosSchemaMapper.flatSchema(bundle).size == decoded.size)
  }
}

class PrettyPrintSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("pretty-print drops blanks/comments and stops at ===") {
    val out = MsgDefParser.prettyPrint(Fixtures.imuDef)
    assert(out.linesIterator.toSeq.head == "Header header")
    assert(out.linesIterator.forall(l => !l.startsWith("#")))  // comment LINES dropped
    assert(!out.contains("MSG:") && !out.contains("==="))
    assert(out.contains("float64[9] orientation_covariance"))
  }
}
