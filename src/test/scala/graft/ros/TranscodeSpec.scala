package graft.ros

import org.scalacheck.{Arbitrary, Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.ros.mcap.{CdrCodec, Ros2Msg}
import RosPrimitive._

/** Cross-dialect transcode: ros1msg definitions translate to ros2msg
  * and payloads re-encode decode(ros1) → encode(cdr) with VALUE
  * identity — the unit half of the Convert `transcode` option
  * (ConvertSpec holds the end-to-end archive round-trips).
  */
class TranscodeSpec extends AnyFunSuite {

  // ---- definition translation ----

  test("field-type mapping: time/duration/byte/char/Header rename, rest verbatim") {
    val src =
      """# a sensor sample
        |Header header
        |time stamp
        |duration age
        |byte b
        |char c
        |uint8 FLAG=7
        |float64[9] cov
        |geometry_msgs/Point[] pts
        |string note
        |================================================================================
        |MSG: std_msgs/Header
        |uint32 seq
        |time stamp
        |string frame_id
        |================================================================================
        |MSG: geometry_msgs/Point
        |float64 x
        |float64 y
        |float64 z""".stripMargin
    val out = Transcode.translateDefText(src)
    val lines = out.linesIterator.toSeq
    assert(lines.contains("std_msgs/Header header"))
    assert(lines.contains("builtin_interfaces/Time stamp"))
    assert(lines.contains("builtin_interfaces/Duration age"))
    assert(lines.contains("int8 b"), "ROS1 byte aliases int8")
    assert(lines.contains("uint8 c"), "ROS1 char aliases uint8")
    assert(lines.contains("uint8 FLAG=7"), "constants pass through")
    assert(lines.contains("float64[9] cov"), "fixed arrays keep their bound")
    assert(lines.contains("geometry_msgs/Point[] pts"))
    assert(lines.contains("# a sensor sample"), "comments pass through")
    assert(lines.contains("MSG: std_msgs/msg/Header"),
      "dependent block headers take the ROS 2 namespace")
    assert(lines.contains("MSG: builtin_interfaces/Time") &&
      lines.contains("MSG: builtin_interfaces/Duration"),
      "builtin blocks are appended when time/duration was used")
  }

  test("translate validates the value stream and renames pkg/Type -> pkg/msg/Type") {
    val e = Transcode.translate("graft_msgs/Event",
      "int64 event_id\nstring event_type\nfloat64 value")
    assert(e.dstName === "graft_msgs/msg/Event")
    // the translated definition parses under the ros2msg reader
    val b2 = Ros2Msg.bundle(e.dstName, e.dstDef)
    assert(RosSchemaMapper.flatSchema(b2).fieldNames.toSeq ===
      Seq("event_id", "event_type", "value"))
  }

  test("valueShape distinguishes incompatible walks and floats by width") {
    def shape(name: String, d: String) =
      Transcode.valueShape(MsgDefParser.parse(name, d))
    assert(shape("t/A", "int32 a\nint64 b") === shape("t/B", "uint32 a\nuint64 b"),
      "integer widths box through Number — one token")
    assert(shape("t/A", "float32 a") !== shape("t/B", "float64 a"),
      "float widths stay distinct (cross-width would lose precision)")
    assert(shape("t/A", "uint8[] a") !== shape("t/B", "uint16[] a"),
      "binary-materialized arrays differ from boxed ones")
    assert(shape("t/A", "time t") === "NN")
    assert(shape("t/A", "time[2] t") === "[2{NN}]")
  }

  // ---- value fidelity through decode(ros1) -> encode(cdr) ----

  private def norm(v: Any): Any = v match {
    case a: Array[Byte] => a.toSeq
    case f: Float if f.isNaN => "NaN-f"
    case d: Double if d.isNaN => "NaN-d"
    case n: java.lang.Long => n.longValue
    case n: java.lang.Integer => n.longValue
    case n: java.lang.Short => n.longValue
    case n: java.lang.Byte => n.longValue
    case r: Row => r.toSeq.map(norm)
    case s: Seq[_] => s.map(norm)
    case x => x
  }

  private def transcodeRoundTrip(name: String, defText: String,
      values: Seq[Any]): Seq[Any] = {
    val e = Transcode.translate(name, defText)
    val b1 = MsgDefParser.parse(name, defText)
    val ros1 = RosSchemaMapper.encode(b1, values)
    val cdr = Transcode.codec(e)(ros1)
    // the encapsulation header marks the payload CDR
    assert(cdr(0) === 0x00.toByte && cdr(1) === 0x01.toByte)
    CdrCodec.decode(Ros2Msg.bundle(e.dstName, e.dstDef), cdr)
  }

  test("rich type: Header + nested msgs + time arrays + byte/char survive byte-for-value") {
    val defText =
      """Header header
        |time stamp
        |duration age
        |byte b
        |char c
        |bool ok
        |uint8[] blob
        |int8[3] trio
        |float32 f
        |float64[2] pair
        |time[2] marks
        |geometry_msgs/Point[] pts
        |string note
        |uint16 STATUS=3
        |================================================================================
        |MSG: std_msgs/Header
        |uint32 seq
        |time stamp
        |string frame_id
        |================================================================================
        |MSG: geometry_msgs/Point
        |float64 x
        |float64 y
        |float64 z""".stripMargin
    val values = Seq[Any](
      42L,                  // header.seq (uint32 decodes Long)
      100, 200,             // header.stamp sec/nsec
      "base_link",          // header.frame_id
      7, 8,                 // stamp
      -1, 2,                // age (duration, int32 pair)
      -5,                   // byte (signed)
      200,                  // char (unsigned)
      true,
      Array[Byte](1, 2, -3),
      Array[Byte](9, 8, 7),
      1.5f,
      Seq[Any](2.5, -3.5),
      Seq(Row(1, 2), Row(3, 4)),
      Seq(Row(1.0, 2.0, 3.0), Row(4.0, 5.0, 6.0)),
      "hello # not a comment",
      // STATUS is a constant: no value
    )
    val decoded = transcodeRoundTrip("graft_msgs/Sample", defText, values)
    assert(norm(decoded) === norm(values))
  }

  test("empty arrays and empty strings transcode") {
    val decoded = transcodeRoundTrip("t/Edge",
      "uint8[] blob\nstring s\nfloat64[] xs\ntime[] ts",
      Seq[Any](Array.emptyByteArray, "", Seq.empty[Any], Seq.empty[Row]))
    assert(norm(decoded) === norm(Seq[Any](
      Array.emptyByteArray, "", Seq.empty[Any], Seq.empty[Row])))
  }

  test("plan harvests from a bag and reports untranslatable definitions") {
    import graft.ros.bag.BagFormat
    val dir = java.nio.file.Files.createTempDirectory("graft_tc_plan").toFile
    val good = "int64 id\ntime t"
    val goodB = MsgDefParser.parse("graft_msgs/Ok", good)
    java.nio.file.Files.write(new java.io.File(dir, "a.bag").toPath,
      BagFormat.writeBag(
        Seq(BagFormat.BagConnection(0, "/ok", "graft_msgs/Ok", "*", good, "c"),
          BagFormat.BagConnection(1, "/bad", "graft_msgs/Bad", "*",
            "this-is-not-a-msg-def", "c")),
        Seq(BagFormat.WriteMessage(0, 1, 0,
          RosSchemaMapper.encode(goodB, Seq[Any](5L, 1, 2))),
          BagFormat.WriteMessage(1, 1, 0, Array[Byte](0)))))
    val (entries, failures) = Transcode.plan(dir.getAbsolutePath)
    assert(entries.keySet === Set("graft_msgs/Ok"))
    assert(entries("graft_msgs/Ok").dstName === "graft_msgs/msg/Ok")
    assert(failures.keySet === Set("graft_msgs/Bad"))
  }

  test("plan counts EMPTY-definition ros1 types as failures (profile honesty)") {
    import graft.ros.bag.BagFormat
    val dir = java.nio.file.Files.createTempDirectory("graft_tc_empty").toFile
    java.nio.file.Files.write(new java.io.File(dir, "a.bag").toPath,
      BagFormat.writeBag(
        Seq(BagFormat.BagConnection(0, "/nodefs", "graft_msgs/NoDef", "*",
          "", "c")),
        Seq(BagFormat.WriteMessage(0, 1, 0, Array[Byte](1)))))
    val (entries, failures) = Transcode.plan(dir.getAbsolutePath)
    assert(entries.isEmpty)
    assert(failures.keySet === Set("graft_msgs/NoDef"),
      "a def-less type cannot transcode — failures.isEmpty must not " +
        "let autoProfile stamp ros2 on an archive keeping ros1 channels")
  }

  test("plan: WITHIN-file divergence fails at plan time; ACROSS files stays translatable") {
    import graft.ros.bag.BagFormat
    val defV1 = "int64 a"
    val defV2 = "int64 a\nstring b"
    def bagBytes(conns: Seq[(String, String)]): Array[Byte] =
      BagFormat.writeBag(
        conns.zipWithIndex.map { case ((tp, d), i) =>
          BagFormat.BagConnection(i, s"/t$i", tp, "*", d, "c") },
        conns.zipWithIndex.map { case ((tp, d), i) =>
          BagFormat.WriteMessage(i, 1, 0, RosSchemaMapper.encode(
            MsgDefParser.parse(tp, d),
            if (d == defV1) Seq[Any](1L) else Seq[Any](1L, "x"))) })
    // across files: each file's rows attribute to its own definition —
    // per-file resolution handles this, NOT a plan failure
    val across = java.nio.file.Files.createTempDirectory("graft_tc_across").toFile
    java.nio.file.Files.write(new java.io.File(across, "a.bag").toPath,
      bagBytes(Seq("graft_msgs/Evo" -> defV1)))
    java.nio.file.Files.write(new java.io.File(across, "b.bag").toPath,
      bagBytes(Seq("graft_msgs/Evo" -> defV2)))
    val (entriesA, failuresA) = Transcode.plan(across.getAbsolutePath)
    assert(failuresA.isEmpty,
      "cross-file divergence transcodes under per-file truth — flagging " +
        "it would drop the ros2 profile from a fully-transcodable fleet")
    assert(entriesA.contains("graft_msgs/Evo"))
    // within one file: rows cannot be attributed — plan-time failure,
    // so strict refuses before writing and auto's profile claim is
    // honest (the execution sentinel null-passes these rows as ros1)
    val within = java.nio.file.Files.createTempDirectory("graft_tc_within").toFile
    java.nio.file.Files.write(new java.io.File(within, "both.bag").toPath,
      bagBytes(Seq("graft_msgs/Evo" -> defV1, "graft_msgs/Evo" -> defV2)))
    val (_, failuresW) = Transcode.plan(within.getAbsolutePath)
    assert(failuresW.keySet === Set("graft_msgs/Evo"))
    assert(failuresW("graft_msgs/Evo").contains("DIVERGENTLY"))
    assert(failuresW("graft_msgs/Evo").contains("both.bag"),
      "the failure must name the offending file")
  }

  test("pinnedEntries: unique defs translate; divergent names are absent") {
    import graft.ros.bag.BagFormat
    val dir = java.nio.file.Files.createTempDirectory("graft_tc_pinned").toFile
    java.nio.file.Files.write(new java.io.File(dir, "p.bag").toPath,
      BagFormat.writeBag(
        Seq(BagFormat.BagConnection(0, "/a", "graft_msgs/Ok", "*", "int64 v", "c"),
          BagFormat.BagConnection(1, "/b", "graft_msgs/Dup", "*", "int64 x", "c"),
          BagFormat.BagConnection(2, "/c", "graft_msgs/Dup", "*", "int64 y", "c")),
        Seq(BagFormat.WriteMessage(0, 1, 0, RosSchemaMapper.encode(
          MsgDefParser.parse("graft_msgs/Ok", "int64 v"), Seq[Any](1L))))))
    val pinned = Transcode.pinnedEntries(dir.getAbsolutePath)
    assert(pinned.keySet === Set("graft_msgs/Ok"),
      "a divergently-pinned name must fall through to file resolution")
    assert(pinned("graft_msgs/Ok").dstName === "graft_msgs/msg/Ok")
  }

  // ---- reverse direction: cdr → ros1 ----

  test("reverse: ros2msg renders valid ros1 text and values survive cdr→ros1") {
    val ros2Def =
      """std_msgs/Header header
        |builtin_interfaces/Time stamp
        |uint8 b
        |string<=20 note
        |float64[<=4] xs
        |geometry_msgs/Point[2] pts
        |================================================================================
        |MSG: std_msgs/msg/Header
        |uint32 seq
        |builtin_interfaces/Time stamp
        |string frame_id
        |================================================================================
        |MSG: geometry_msgs/msg/Point
        |float64 x
        |float64 y""".stripMargin
    val e = Transcode.translateToRos1("graft_msgs/msg/RSample", "ros2msg", ros2Def)
    assert(e.dstName === "graft_msgs/RSample")
    val lines = e.dstDef.linesIterator.toSeq
    assert(lines.contains("time stamp"), "builtin Time lowers to the primitive")
    assert(lines.contains("string note"), "bounded strings unbound")
    assert(lines.contains("float64[] xs"), "bounded sequences unbound")
    assert(lines.contains("geometry_msgs/Point[2] pts"))
    assert(lines.contains("MSG: std_msgs/Header"),
      "dependent headers take the two-segment ros1 convention")
    assert(!e.dstDef.contains("builtin_interfaces"),
      "no builtin blocks in ros1 text")
    assert(e.md5 === RosMd5.compute(e.dstName, e.dstDef))
    // value fidelity: encode CDR under the ros2 bundle, transcode,
    // decode under the rendered ros1 definition
    val b2 = Ros2Msg.bundle("graft_msgs/msg/RSample", ros2Def)
    val values = Seq[Any](
      42L, 9, 10, "frame",       // header: seq(uint32), stamp, frame_id
      100, 200,                  // stamp
      250,                       // uint8
      "note text",
      Seq[Any](1.5, -2.5),
      Seq(Row(1.0, 2.0), Row(3.0, 4.0)))
    val cdr = CdrCodec.encode(b2, values)
    val ros1 = Transcode.codecToRos1(e)(cdr)
    val decoded = RosSchemaMapper.decode(
      MsgDefParser.parse(e.dstName, e.dstDef), ros1)
    assert(norm(decoded) === norm(values))
  }

  test("reverse: MUTABLE-encoded cdr payloads (PL_CDR + PL_CDR2) transcode to ros1 too") {
    // the transcode decode hop dispatches per representation id, so a
    // fleet recording under a mutable-extensibility rmw still lowers
    // into packed ros1 value-identically
    import graft.ros.mcap.CdrCodec.{Xcdr1Mutable, Xcdr2Mutable}
    val ros2Def =
      """builtin_interfaces/Time stamp
        |uint8 b
        |string note
        |float64[] xs""".stripMargin
    val e = Transcode.translateToRos1("graft_msgs/msg/MSample", "ros2msg", ros2Def)
    val b2 = Ros2Msg.bundle("graft_msgs/msg/MSample", ros2Def)
    val values = Seq[Any](100, 200, 250, "note text", Seq[Any](1.5, -2.5))
    for (flavor <- Seq(Xcdr1Mutable, Xcdr2Mutable)) {
      val cdr = CdrCodec.encode(b2, values, flavor)
      val decoded = RosSchemaMapper.decode(
        MsgDefParser.parse(e.dstName, e.dstDef), Transcode.codecToRos1(e)(cdr))
      assert(norm(decoded) === norm(values), s"flavor $flavor")
    }
  }

  test("reverse: ros2idl definitions translate too") {
    val idl =
      """module graft_msgs { module msg { struct Ev {
        |  int64 id;
        |  string tag;
        |  double v;
        |}; }; };""".stripMargin
    val e = Transcode.translateToRos1("graft_msgs/msg/Ev", "ros2idl", idl)
    assert(e.dstName === "graft_msgs/Ev")
    val b2 = graft.ros.mcap.Ros2Idl.bundle("graft_msgs/msg/Ev", idl)
    val cdr = CdrCodec.encode(b2, Seq[Any](7L, "x", 2.5))
    val decoded = RosSchemaMapper.decode(
      MsgDefParser.parse(e.dstName, e.dstDef), Transcode.codecToRos1(e)(cdr))
    assert(norm(decoded) === norm(Seq[Any](7L, "x", 2.5)))
  }

  test("property: the full circle ros1 → cdr → ros1 is value-identity") {
    val genCase = for {
      n <- Gen.choose(1, 6)
      fields <- Gen.listOfN(n, genFieldLine)
      values <- Gen.sequence[List[List[Any]], List[Any]](
        fields.map { case (_, p, arr) => genValuesFor(p, arr) })
    } yield {
      val defText = fields.zipWithIndex.map { case ((tn, _, arr), i) =>
        val suffix = arr match {
          case None => ""
          case Some(None) => "[]"
          case Some(Some(k)) => s"[$k]"
        }
        s"$tn$suffix f_$i"
      }.mkString("\n")
      (defText, values.flatten)
    }
    val prop = Prop.forAll(genCase) { case (defText: String, values: List[Any]) =>
      val fwd = Transcode.translate("graft_msgs/C", defText)
      val rev = Transcode.translateToRos1(fwd.dstName, "ros2msg", fwd.dstDef)
      val b1 = MsgDefParser.parse("graft_msgs/C", defText)
      val ros1 = RosSchemaMapper.encode(b1, values)
      val back = Transcode.codecToRos1(rev)(Transcode.codec(fwd)(ros1))
      val decoded = RosSchemaMapper.decode(
        MsgDefParser.parse(rev.dstName, rev.dstDef), back)
      val ok = norm(decoded) == norm(values) && rev.dstName == "graft_msgs/C"
      if (!ok) println(s"CIRCLE MISMATCH def=\n$defText\n in=${norm(values)}\n out=${norm(decoded)}")
      ok
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(150), prop)
    assert(res.passed, res.status.toString)
  }

  // ---- property: random primitive defs round-trip through the codec ----

  private val prims: Seq[RosPrimitive] = Seq(
    RBool, RInt8, RUInt8, RByte, RChar, RInt16, RUInt16, RInt32, RUInt32,
    RInt64, RFloat32, RFloat64, RString, RTime, RDuration)

  private def genValue(p: RosPrimitive): Gen[Any] = p match {
    case RBool    => Gen.oneOf(true, false)
    case RInt8 | RByte => Gen.choose(-128, 127)
    case RUInt8 | RChar => Gen.choose(0, 255)
    case RInt16   => Gen.choose(-32768, 32767)
    case RUInt16  => Gen.choose(0, 65535)
    case RInt32   => Arbitrary.arbitrary[Int]
    case RUInt32  => Gen.choose(0L, 0xFFFFFFFFL)
    case RInt64   => Arbitrary.arbitrary[Long]
    case RFloat32 => Arbitrary.arbitrary[Float]
    case RFloat64 => Arbitrary.arbitrary[Double]
    case RString  => Gen.alphaNumStr.map(_.take(30))
    case RTime | RDuration => Gen.choose(0, Int.MaxValue)
    case other    => throw new IllegalArgumentException(other.toString)
  }

  private val genFieldLine: Gen[(String, RosPrimitive, Option[Option[Int]])] = for {
    p <- Gen.oneOf(prims)
    arr <- Gen.frequency(3 -> Gen.const(None),
      1 -> Gen.option(Gen.choose(0, 4)).map(Some(_)))
  } yield (p.name, p, arr)

  private def genValuesFor(p: RosPrimitive, arr: Option[Option[Int]]): Gen[List[Any]] =
    arr match {
      case None => p match {
        case RTime | RDuration =>
          Gen.zip(genValue(p), genValue(p)).map(t => List(t._1, t._2))
        case _ => genValue(p).map(List(_))
      }
      case Some(fixed) =>
        val len = fixed.map(Gen.const).getOrElse(Gen.choose(0, 5))
        len.flatMap { n =>
          if (Seq(RUInt8, RByte, RChar, RInt8).contains(p))
            Gen.listOfN(n, Gen.choose(-128, 127))
              .map(bs => List(bs.map(_.toByte).toArray))
          else if (p == RTime || p == RDuration)
            Gen.listOfN(n, Gen.zip(genValue(p), genValue(p)))
              .map(ts => List(ts.map(t => Row(t._1, t._2)): Seq[Any]))
          else Gen.listOfN(n, genValue(p)).map(vs => List(vs: Seq[Any]))
        }
    }

  test("property: random ros1 defs + values transcode value-identically") {
    val genCase = for {
      n <- Gen.choose(1, 8)
      fields <- Gen.listOfN(n, genFieldLine)
      values <- Gen.sequence[List[List[Any]], List[Any]](
        fields.map { case (_, p, arr) => genValuesFor(p, arr) })
    } yield {
      val defText = fields.zipWithIndex.map { case ((tn, _, arr), i) =>
        val suffix = arr match {
          case None => ""
          case Some(None) => "[]"
          case Some(Some(k)) => s"[$k]"
        }
        s"$tn$suffix f_$i"
      }.mkString("\n")
      (defText, values.flatten)
    }
    val prop = Prop.forAll(genCase) { case (defText: String, values: List[Any]) =>
      val decoded = transcodeRoundTrip("graft_msgs/P", defText, values)
      val ok = norm(decoded) == norm(values)
      if (!ok) println(s"MISMATCH def=\n$defText\n in=${norm(values)}\n out=${norm(decoded)}")
      ok
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  // ---- the protobuf crossing ----

  test("protobuf: descriptor renders ros2msg and values survive proto→cdr byte-for-value") {
    import graft.ros.mcap.{ProtoCodec, ProtoDescriptor}
    import ProtoDescriptor._
    val fds = buildFds("graft.test", Seq(
      "Point" -> Seq(
        ProtoField("x", 1, repeated = false, TDouble, ""),
        ProtoField("y", 2, repeated = false, TFloat, "")),
      "Sample" -> Seq(
        ProtoField("id", 1, repeated = false, TInt64, ""),
        ProtoField("flags", 2, repeated = false, TUInt32, ""),
        ProtoField("name", 3, repeated = false, TString, ""),
        ProtoField("blob", 4, repeated = false, TBytes, ""),
        ProtoField("origin", 5, repeated = false, TMessage, "graft.test.Point"),
        ProtoField("pts", 6, repeated = true, TMessage, "graft.test.Point"),
        ProtoField("vals", 7, repeated = true, TSInt32, ""),
        ProtoField("tags", 8, repeated = true, TString, ""),
        ProtoField("ok", 9, repeated = false, TBool, ""))))
    val e = Transcode.translateProto("graft.test.Sample", fds)
    assert(e.dstName === "graft_test/msg/Sample",
      "proto package dots map to underscores, /msg/ namespace inserted")
    val lines = e.dstDef.linesIterator.toSeq
    assert(lines.contains("int64 id"))
    assert(lines.contains("uint32 flags"))
    assert(lines.contains("uint8[] blob"), "bytes fields render as uint8[]")
    assert(lines.contains("graft_test/msg/Point origin"))
    assert(lines.contains("graft_test/msg/Point[] pts"))
    assert(lines.contains("int32[] vals"), "sint32 and int32 share a wire value")
    assert(lines.contains("string[] tags"))
    assert(lines.contains("MSG: graft_test/msg/Point"),
      "dependent blocks carry the renamed header")
    // value fidelity across the wire boundary: proto encode → codec →
    // cdr decode under the RENDERED definition
    val set = parseSet(fds)
    val values = Seq[Any](
      42L, 4294967295L, "n", Array[Byte](1, 2, 3),
      1.5, 2.5f, // origin, inlined by the shared flat frame
      Seq(Row(-1.0, 0.5f), Row(3.0, -4.5f)),
      Seq(-7, 8),
      Seq("a", "b"),
      true)
    val pb = ProtoCodec.encode(set, "graft.test.Sample", values)
    val cdr = Transcode.codecProto(e)(pb)
    val decoded = CdrCodec.decode(Ros2Msg.bundle(e.dstName, e.dstDef), cdr)
    assert(norm(decoded) === norm(values))
  }

  test("protobuf → ros1: the composed lowering renders ros1msg with a genuine md5") {
    import graft.ros.mcap.{ProtoCodec, ProtoDescriptor}
    import ProtoDescriptor._
    val fds = buildFds("graft.test", Seq(
      "Point" -> Seq(
        ProtoField("x", 1, repeated = false, TDouble, ""),
        ProtoField("y", 2, repeated = false, TFloat, "")),
      "Sample" -> Seq(
        ProtoField("id", 1, repeated = false, TInt64, ""),
        ProtoField("name", 2, repeated = false, TString, ""),
        ProtoField("origin", 3, repeated = false, TMessage, "graft.test.Point"),
        ProtoField("pts", 4, repeated = true, TMessage, "graft.test.Point"),
        ProtoField("tags", 5, repeated = true, TString, ""))))
    val e = Transcode.translateProtoToRos1("graft.test.Sample", fds)
    assert(e.dstName === "graft_test/Sample",
      "ros1 two-segment name off the ros2 rendering")
    val lines = e.dstDef.linesIterator.toSeq
    assert(lines.contains("int64 id"))
    assert(lines.contains("graft_test/Point origin"))
    assert(lines.contains("graft_test/Point[] pts"))
    assert(lines.contains("MSG: graft_test/Point"))
    // the md5 is the GENUINE genmsg checksum of the rendered text
    assert(e.md5 === graft.ros.RosMd5.compute(e.dstName, e.dstDef))
    // one decode hop + one encode hop: proto wire → packed ros1
    val set = parseSet(fds)
    val values = Seq[Any](
      42L, "n", 1.5, 2.5f,
      Seq(Row(-1.0, 0.5f), Row(3.0, -4.5f)),
      Seq("a", "b"))
    val pb = ProtoCodec.encode(set, "graft.test.Sample", values)
    val ros1 = Transcode.codecProtoToRos1(e)(pb)
    val decoded = RosSchemaMapper.decode(
      MsgDefParser.parse(e.dstName, e.dstDef), ros1)
    assert(norm(decoded) === norm(values))
  }

  test("property: random proto descriptors + values transcode value-identically") {
    import graft.ros.mcap.{ProtoCodec, ProtoDescriptor}
    import ProtoDescriptor._
    // scalar types whose proto decode boxing survives the CDR round
    // trip (groups/repeated-bytes are refusals, fixed/zigzag share
    // wire values with these)
    val scalars = Seq(TInt64, TUInt64, TInt32, TUInt32, TBool, TString,
      TDouble, TFloat, TSInt32, TSInt64)
    def genScalarValue(t: Int): Gen[Any] = t match {
      case TInt64 | TSInt64 => Arbitrary.arbitrary[Long]
      case TUInt64 => Arbitrary.arbitrary[Long]
      case TInt32 | TSInt32 => Arbitrary.arbitrary[Int]
      case TUInt32 => Gen.choose(0L, 0xFFFFFFFFL)
      case TBool => Arbitrary.arbitrary[Boolean]
      case TString => Gen.alphaNumStr.map(_.take(12))
      case TDouble => Arbitrary.arbitrary[Double].suchThat(!_.isNaN)
      case TFloat => Arbitrary.arbitrary[Float].suchThat(!_.isNaN)
    }
    // message shapes: each message may reference PRIOR messages only
    // (no recursion by construction); fields mix scalars, bytes,
    // repeated scalars, singular + repeated message refs
    final case class FieldShape(tpe: Int, typeName: String, repeated: Boolean)
    val genCase: Gen[(Seq[(String, Seq[ProtoField])], Seq[Any])] = for {
      nMsgs <- Gen.choose(1, 3)
      shapes <- Gen.sequence[List[List[FieldShape]], List[FieldShape]](
        (0 until nMsgs).toList.map { mi =>
          for {
            nf <- Gen.choose(1, 5)
            fs <- Gen.listOfN(nf, {
              val base = Seq(
                6 -> Gen.oneOf(scalars).map(t =>
                  FieldShape(t, "", repeated = false)),
                2 -> Gen.oneOf(scalars).map(t =>
                  FieldShape(t, "", repeated = true)),
                1 -> Gen.const(FieldShape(TBytes, "", repeated = false)))
              val all = if (mi == 0) base else base :+ (2 ->
                Gen.choose(0, mi - 1).flatMap(r => Gen.oneOf(false, true)
                  .map(rep => FieldShape(TMessage, s"graft.prop.M$r", rep))))
              Gen.frequency(all: _*)
            })
          } yield fs
        })
      values <- {
        def valuesOf(fs: List[FieldShape]): Gen[List[Any]] =
          Gen.sequence[List[List[Any]], List[Any]](fs.map { f =>
            def msgIdx(tn: String) = tn.stripPrefix("graft.prop.M").toInt
            (f.tpe, f.repeated) match {
              case (TMessage, false) => valuesOf(shapes(msgIdx(f.typeName)))
              case (TMessage, true) => for {
                k <- Gen.choose(0, 2)
                rows <- Gen.listOfN(k, valuesOf(shapes(msgIdx(f.typeName))))
              } yield List(rows.map(r => Row.fromSeq(r)))
              case (TBytes, false) =>
                Gen.choose(0, 6).flatMap(k => Gen.listOfN(k,
                  Arbitrary.arbitrary[Byte])).map(bs => List(bs.toArray))
              case (t, false) => genScalarValue(t).map(List(_))
              case (t, true) => Gen.choose(0, 3).flatMap(k =>
                Gen.listOfN(k, genScalarValue(t))).map(vs => List(vs))
            }
          }).map(_.flatten)
        valuesOf(shapes.last)
      }
    } yield {
      val messages = shapes.zipWithIndex.map { case (fs, mi) =>
        s"M$mi" -> fs.zipWithIndex.map { case (f, fi) =>
          ProtoField(s"f$fi", fi + 1, f.repeated, f.tpe, f.typeName)
        }
      }
      (messages, values)
    }
    val prop = Prop.forAll(genCase) { case (messages, values) =>
      val fds = buildFds("graft.prop", messages)
      val rootFq = s"graft.prop.M${messages.size - 1}"
      val set = parseSet(fds)
      val pb = ProtoCodec.encode(set, rootFq, values)
      val e = Transcode.translateProto(rootFq, fds)
      val decoded = CdrCodec.decode(Ros2Msg.bundle(e.dstName, e.dstDef),
        Transcode.codecProto(e)(pb))
      val ok = norm(decoded) == norm(values)
      if (!ok) println(s"MISMATCH msgs=$messages\n in=${norm(values)}\n " +
        s"out=${norm(decoded)}")
      ok
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(150), prop)
    assert(res.passed, res.status.toString)
  }

  test("protobuf: repeated-bytes, recursion and package-less types refuse loudly") {
    import graft.ros.mcap.ProtoDescriptor._
    val rb = buildFds("graft.test", Seq("R" -> Seq(
      ProtoField("chunks", 1, repeated = true, TBytes, ""))))
    val e1 = intercept[IllegalArgumentException](
      Transcode.translateProto("graft.test.R", rb))
    assert(e1.getMessage.contains("repeated bytes"))
    val noPkg = buildFds("", Seq("P" -> Seq(
      ProtoField("x", 1, repeated = false, TInt32, ""))))
    val e2 = intercept[IllegalArgumentException](
      Transcode.translateProto("P", noPkg))
    assert(e2.getMessage.contains("no ros2 package"))
    val rec = buildFds("graft.test", Seq("Node" -> Seq(
      ProtoField("next", 1, repeated = false, TMessage, "graft.test.Node"))))
    val e3 = intercept[IllegalArgumentException](
      Transcode.translateProto("graft.test.Node", rec))
    assert(e3.getMessage.contains("recursive"))
  }
}
