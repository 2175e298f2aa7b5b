package graft.ros.mcap

import org.scalatest.funsuite.AnyFunSuite
import graft.ros.RosSchemaMapper

/** Ros2Idl against realistic rosidl_adapter-generated IDL. The oracle
  * is the SAME type declared as ros2msg text: both parsers must land
  * on the identical flat frame, and CDR payloads must decode to
  * identical values through either bundle.
  */
class Ros2IdlSpec extends AnyFunSuite {

  private val idlText =
    """// generated from rosidl_adapter/resource/msg.idl.em
      |// with input from graft_msgs/msg/Telemetry.msg
      |// generated code does not contain a copyright notice
      |
      |#include "geometry_msgs/msg/Vector3.idl"
      |#include "builtin_interfaces/msg/Time.idl"
      |
      |module graft_msgs {
      |  module msg {
      |    module Telemetry_Constants {
      |      const int32 MODE_IDLE = 0;
      |      const string NAME = "telemetry; with (tricky) chars";
      |    };
      |    typedef double double__9[9];
      |    @verbatim (language="comment", text=
      |      "The multi-line verbatim comment rosidl actually emits," "\n"
      |      "complete with (parens), ; semicolons and { braces }")
      |    struct Telemetry {
      |      @default (value=5)
      |      int32 mode;
      |      @unit (value="m/s")
      |      double speed;
      |      float ratio;
      |      boolean ok;
      |      octet flag;
      |      uint64 big;
      |      string label;
      |      string<10> bounded_label;
      |      sequence<int32> counts;
      |      sequence<double, 4> caps;
      |      double__9 covariance;
      |      builtin_interfaces::msg::Time stamp;
      |      geometry_msgs::msg::Vector3 vel;
      |    };
      |  };
      |};
      |
      |================================================================================
      |IDL: geometry_msgs/msg/Vector3
      |// generated from rosidl_adapter/resource/msg.idl.em
      |
      |module geometry_msgs {
      |  module msg {
      |    struct Vector3 {
      |      double x;
      |      double y;
      |      double z;
      |    };
      |  };
      |};
      |""".stripMargin

  private val msgText =
    """int32 mode
      |float64 speed
      |float32 ratio
      |bool ok
      |uint8 flag
      |uint64 big
      |string label
      |string<=10 bounded_label
      |int32[] counts
      |float64[<=4] caps
      |float64[9] covariance
      |builtin_interfaces/Time stamp
      |geometry_msgs/Vector3 vel
      |================================================================================
      |MSG: geometry_msgs/Vector3
      |float64 x
      |float64 y
      |float64 z
      |""".stripMargin

  private val fromIdl = Ros2Idl.bundle("graft_msgs/msg/Telemetry", idlText)
  private val fromMsg = Ros2Msg.bundle("graft_msgs/msg/Telemetry", msgText)

  test("IDL bundle lands on the identical flat frame as the ros2msg declaration") {
    assert(RosSchemaMapper.flatSchema(fromIdl) === RosSchemaMapper.flatSchema(fromMsg))
    // spot-check the shape is what we meant, not just mutually wrong
    val names = RosSchemaMapper.flatSchema(fromIdl).fieldNames.toSeq
    assert(names === Seq("mode", "speed", "ratio", "ok", "flag", "big",
      "label", "bounded_label", "counts", "caps", "covariance",
      "stamp_sec", "stamp_nanosec", "vel_x", "vel_y", "vel_z"))
  }

  test("CDR payloads decode identically through either bundle") {
    // Time flattens to sec:int32 + nanosec:uint32 (widened Long)
    val vals = Seq[Any](5, 2.5, 0.5f, true, 200, -1L, "hello", "bnd",
      Seq(1, -2), Seq(0.25, 0.5), (1 to 9).map(_.toDouble),
      7, 999L, 1.0, 2.0, 3.0)
    // encode under the msg bundle, decode under BOTH — bit-identical
    val bytes = CdrCodec.encode(fromMsg, vals)
    val a = CdrCodec.decode(fromMsg, bytes)
    val b = CdrCodec.decode(fromIdl, bytes)
    assert(a === b)
    assert(b(0) === 5 && b(5) === -1L && b(10) === (1 to 9).map(_.toDouble))
    assert(b(11) === 7 && b(12) === 999L)
  }

  test("headerless first block is the root; wstring decodes, long double refuses") {
    val bare = Ros2Idl.bundle("p/msg/T",
      "module p { module msg { struct T { int32 v; }; }; };")
    assert(RosSchemaMapper.flatSchema(bare).fieldNames.toSeq === Seq("v"))
    // wstring (bounded too) is a real IDL type now: StringType column,
    // UTF-16 wire decode — the round-trip lives in Ros2CdrSpec
    val withW = Ros2Idl.bundle("p/msg/T",
      "module p { module msg { struct T { wstring w; wstring<8> b; }; }; };")
    assert(RosSchemaMapper.flatSchema(withW).fields.toSeq.map(f =>
      (f.name, f.dataType.typeName)) === Seq("w" -> "string", "b" -> "string"))
    assert(CdrCodec.decode(withW, CdrCodec.encode(withW, Seq("é漢", "ok")))
      === Seq("é漢", "ok"))
    val exLd = intercept[IllegalArgumentException] {
      Ros2Idl.bundle("p/msg/T",
        "module p { module msg { struct T { long double d; }; }; };")
    }
    assert(exLd.getMessage.contains("long double"))
  }

  test("classic IDL integer spellings map like the 4.x ones") {
    val classic = Ros2Idl.bundle("p/msg/C",
      """module p { module msg { struct C {
        |  short a; unsigned short b; long c; unsigned long d;
        |  long long e; unsigned long long f;
        |}; }; };""".stripMargin)
    val modern = Ros2Idl.bundle("p/msg/C",
      """module p { module msg { struct C {
        |  int16 a; uint16 b; int32 c; uint32 d; int64 e; uint64 f;
        |}; }; };""".stripMargin)
    assert(RosSchemaMapper.flatSchema(classic) === RosSchemaMapper.flatSchema(modern))
  }

  test("string constants with braces/semicolons do not unbalance the parser") {
    val b = Ros2Idl.bundle("p/msg/T",
      """module p { module msg {
        |  module T_Constants {
        |    const string EMOTICON = ":-}";
        |    const string TRICKY = "a;b{c}d(e)f";
        |  };
        |  const string TOP = "x;y}z";
        |  struct T { int32 v; string s; };
        |}; };""".stripMargin)
    assert(RosSchemaMapper.flatSchema(b).fieldNames.toSeq === Seq("v", "s"))
  }

  test("missing root type names what the closure declares") {
    val ex = intercept[IllegalArgumentException] {
      Ros2Idl.bundle("p/msg/Nope",
        "module p { module msg { struct T { int32 v; }; }; };")
    }
    assert(ex.getMessage.contains("p/T"))
  }
}
