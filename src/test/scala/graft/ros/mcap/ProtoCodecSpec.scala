package graft.ros.mcap

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import ProtoDescriptor._

/** The protobuf typed-decode path: descriptor parsing, the
  * RosMsgBundle mapping, and wire codec round-trips.
  *
  * The FileDescriptorSet fixtures are built by ProtoCodec.encode
  * itself over a hand-declared descriptor-subset ProtoSet (the
  * descriptor format IS protobuf) and then parsed back by the
  * independent tolerant walker — an encoder bug and a parser bug
  * would have to cancel exactly for these to pass.
  */
class ProtoCodecSpec extends AnyFunSuite {

  // ---- descriptor.proto subset as a ProtoSet (public field numbers) ----
  private val descSet = ProtoSet(Map(
    "FDS" -> ProtoMsgDescr("FDS", Seq(
      ProtoField("file", 1, repeated = true, TMessage, "FDP"))),
    "FDP" -> ProtoMsgDescr("FDP", Seq(
      ProtoField("name", 1, repeated = false, TString, ""),
      ProtoField("package", 2, repeated = false, TString, ""),
      ProtoField("message_type", 4, repeated = true, TMessage, "DP"))),
    "DP" -> ProtoMsgDescr("DP", Seq(
      ProtoField("name", 1, repeated = false, TString, ""),
      ProtoField("field", 2, repeated = true, TMessage, "FLD"),
      ProtoField("nested_type", 3, repeated = true, TMessage, "DP"))),
    "FLD" -> ProtoMsgDescr("FLD", Seq(
      ProtoField("name", 1, repeated = false, TString, ""),
      ProtoField("number", 3, repeated = false, TInt32, ""),
      ProtoField("label", 4, repeated = false, TEnum, ""),
      ProtoField("type", 5, repeated = false, TEnum, ""),
      ProtoField("type_name", 6, repeated = false, TString, "")))))

  private def fld(name: String, number: Int, label: Int, tpe: Int,
                  typeName: String = ""): Row =
    Row(name, number, label, tpe, typeName)

  private def msg(name: String, fields: Seq[Row]): Row =
    Row(name, fields, Seq.empty[Row])

  private def fds(pkg: String, msgs: Seq[Row]): Array[Byte] =
    ProtoCodec.encode(descSet, "FDS", Seq(Seq(Row("test.proto", pkg, msgs))))

  // ---- the test schema: nested message, repeated fields, string,
  //      bytes, unsigned widening, zigzag ----
  private val telemetryFds: Array[Byte] = fds("graft.test", Seq(
    msg("Pose", Seq(
      fld("x", 1, 1, TDouble),
      fld("y", 2, 1, TFloat))),
    msg("Telemetry", Seq(
      fld("tag", 1, 1, TString),
      fld("stamp", 2, 1, TInt64),
      fld("pose", 3, 1, TMessage, ".graft.test.Pose"),
      fld("counts", 4, 3, TInt32),
      fld("flags", 5, 1, TUInt32),
      fld("delta", 6, 1, TSInt64),
      fld("ok", 7, 1, TBool),
      fld("blob", 8, 1, TBytes),
      fld("tags", 9, 3, TString),
      fld("path", 10, 3, TMessage, ".graft.test.Pose")))))

  private val set = parseSet(telemetryFds)
  private val FQ = "graft.test.Telemetry"

  private val vals: Seq[Any] = Seq(
    "hello", 42L, 1.5, 2.5f, Seq(1, -2, 3), 7L, -5L, true,
    Array[Byte](9, 8, 7), Seq("a", "b"), Seq(Row(0.25, -1.0f), Row(0.0, 0.0f)))

  test("parseSet recovers the declared messages and fields from real descriptor bytes") {
    assert(set.messages.keySet === Set("graft.test.Pose", "graft.test.Telemetry"))
    val t = set(FQ)
    assert(t.fields.map(_.name) === Seq("tag", "stamp", "pose", "counts",
      "flags", "delta", "ok", "blob", "tags", "path"))
    assert(t.fields.map(_.number) === Seq(1, 2, 3, 4, 5, 6, 7, 8, 9, 10))
    assert(t.fields.filter(_.repeated).map(_.name) === Seq("counts", "tags", "path"))
    assert(t.fields.find(_.name == "pose").get.typeName === "graft.test.Pose")
  }

  test("bundle maps onto the shared flat frame: names, nesting prefix, type widening") {
    val flat = graft.ros.RosSchemaMapper.flatSchema(bundle(FQ, set))
    assert(flat.fields.map(f => (f.name, f.dataType)) === Seq(
      ("tag", StringType), ("stamp", LongType),
      ("pose_x", DoubleType), ("pose_y", FloatType),
      ("counts", ArrayType(IntegerType, containsNull = false)),
      ("flags", LongType),   // uint32 widens, the RUInt32 rule
      ("delta", LongType),
      ("ok", BooleanType), ("blob", BinaryType),
      ("tags", ArrayType(StringType, containsNull = false)),
      ("path", ArrayType(StructType(Seq(
        StructField("x", DoubleType, nullable = false),
        StructField("y", FloatType, nullable = false))), containsNull = false))))
  }

  test("encode/decode round-trip, flatSchema-ordered values") {
    val got = ProtoCodec.decode(set, FQ, ProtoCodec.encode(set, FQ, vals))
    assert(got.length === vals.length)
    assert(got(0) === "hello" && got(1) === 42L)
    assert(got(2) === 1.5 && got(3) === 2.5f)
    assert(got(4) === Seq(1, -2, 3))
    assert(got(5) === 7L && got(6) === -5L && got(7) === true)
    assert(got(8).asInstanceOf[Array[Byte]].toSeq === Seq[Byte](9, 8, 7))
    assert(got(9) === Seq("a", "b"))
    assert(got(10) === Seq(Row(0.25, -1.0f), Row(0.0, 0.0f)))
  }

  test("negative and extreme scalars survive: int32 sign-extension, zigzag, uint reinterpret") {
    val extremeFds = fds("t", Seq(msg("E", Seq(
      fld("a", 1, 1, TInt32), fld("b", 2, 1, TSInt32), fld("c", 3, 1, TUInt64),
      fld("d", 4, 1, TFixed32), fld("e", 5, 1, TSFixed64), fld("f", 6, 1, TEnum)))))
    val es = parseSet(extremeFds)
    val in = Seq(Int.MinValue, Int.MaxValue, -1L /* = 2^64-1 reinterpret */,
      0xFFFFFFFFL /* fixed32 max widens */, Long.MinValue, 12)
    assert(ProtoCodec.decode(es, "t.E", ProtoCodec.encode(es, "t.E", in)) === in)
  }

  test("absent fields decode to proto3 defaults, including a flattened absent message") {
    // a writer on schema-v0 (only `tag`) produces bytes the full
    // schema's reader must fill with defaults
    val v0 = fds("graft.test", Seq(msg("Telemetry", Seq(fld("tag", 1, 1, TString)))))
    val v0set = parseSet(v0)
    val bytes = ProtoCodec.encode(v0set, FQ, Seq("only-tag"))
    val got = ProtoCodec.decode(set, FQ, bytes)
    assert(got === Seq("only-tag", 0L, 0.0, 0.0f, Seq.empty, 0L, 0L, false,
      Array.emptyByteArray, Seq.empty, Seq.empty) ||
      (got(8).asInstanceOf[Array[Byte]].isEmpty &&
        got.patch(8, Nil, 1) === Seq("only-tag", 0L, 0.0, 0.0f, Seq.empty, 0L,
          0L, false, Seq.empty, Seq.empty)))
  }

  test("split embedded-message occurrences MERGE (spec), not last-wins") {
    // a conforming writer may emit `pose` as two fragments: one
    // carrying x, one carrying y — parsers must merge
    val b = new java.io.ByteArrayOutputStream()
    def varint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7FL) != 0L) { b.write(((x & 0x7F) | 0x80).toInt); x >>>= 7 }
      b.write(x.toInt)
    }
    def fragment(fieldNum: Int, wt: Int)(body: java.io.ByteArrayOutputStream => Unit): Unit = {
      val sub = new java.io.ByteArrayOutputStream()
      body(sub)
      varint((fieldNum.toLong << 3) | 2L); varint(sub.size().toLong)
      sub.writeTo(b)
    }
    // pose fragment 1: x = 1.5 (field 1, fixed64)
    fragment(3, 2) { sub =>
      sub.write(((1 << 3) | 1)); val bits = java.lang.Double.doubleToLongBits(1.5)
      (0 until 8).foreach(i => sub.write(((bits >>> (8 * i)) & 0xFF).toInt))
    }
    // pose fragment 2: y = 2.5f (field 2, fixed32)
    fragment(3, 2) { sub =>
      sub.write(((2 << 3) | 5)); val bits = java.lang.Float.floatToIntBits(2.5f)
      (0 until 4).foreach(i => sub.write((bits >>> (8 * i)) & 0xFF))
    }
    val got = ProtoCodec.decode(set, FQ, b.toByteArray)
    assert(got(2) === 1.5, "fragment 1's x must survive the merge")
    assert(got(3) === 2.5f, "fragment 2's y must survive the merge")
  }

  test("unpacked repeated scalars are accepted alongside packed (spec: parsers take both)") {
    // hand-write field 4 (counts) as three expanded varint entries
    val b = new java.io.ByteArrayOutputStream()
    def varint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7FL) != 0L) { b.write(((x & 0x7F) | 0x80).toInt); x >>>= 7 }
      b.write(x.toInt)
    }
    (1 to 3).foreach { i => varint((4L << 3) | 0L); varint(i.toLong) }
    val got = ProtoCodec.decode(set, FQ, b.toByteArray)
    assert(got(4) === Seq(1, 2, 3))
  }

  test("drift fails loudly: unknown field number and wire-type mismatch") {
    val full = ProtoCodec.encode(set, FQ, vals)
    val v0 = parseSet(fds("graft.test", Seq(msg("Telemetry", Seq(fld("tag", 1, 1, TString))))))
    val exUnknown = intercept[IllegalArgumentException] {
      ProtoCodec.decode(v0, FQ, full)
    }
    assert(exUnknown.getMessage.contains("unknown field number"))
    // same field number, different declared type with a different wire type
    val drifted = parseSet(fds("graft.test", Seq(msg("Telemetry", Seq(
      fld("tag", 1, 1, TInt64))))))
    val strBytes = ProtoCodec.encode(v0, FQ, Seq("s"))
    val exWire = intercept[IllegalArgumentException] {
      ProtoCodec.decode(drifted, FQ, strBytes)
    }
    assert(exWire.getMessage.contains("wire type"))
  }

  test("flattening refuses what the frame cannot hold: recursion, repeated bytes, groups") {
    val rec = parseSet(fds("t", Seq(msg("Node", Seq(
      fld("next", 1, 1, TMessage, ".t.Node"))))))
    val exRec = intercept[IllegalArgumentException] { bundle("t.Node", rec) }
    assert(exRec.getMessage.contains("recursive"))
    val rb = parseSet(fds("t", Seq(msg("B", Seq(fld("bs", 1, 3, TBytes))))))
    val exB = intercept[IllegalArgumentException] { bundle("t.B", rb) }
    assert(exB.getMessage.contains("repeated bytes"))
    val grp = parseSet(fds("t", Seq(msg("G", Seq(fld("g", 1, 1, TGroup, ".t.X"))))))
    val exG = intercept[IllegalArgumentException] { bundle("t.G", grp) }
    assert(exG.getMessage.contains("group"))
  }

  test("missing root type names what the descriptor does carry") {
    val ex = intercept[IllegalArgumentException] {
      ProtoCodec.decode(set, "graft.test.Nope", Array.emptyByteArray)
    }
    assert(ex.getMessage.contains("graft.test.Telemetry"))
  }

  test("nested message declarations register under their dotted path") {
    // DescriptorProto.nested_type: Outer.Inner referenced from Outer
    val outer = Row("Outer",
      Seq(fld("inner", 1, 1, TMessage, ".t.Outer.Inner"),
        fld("n", 2, 1, TInt32)),
      Seq(msg("Inner", Seq(fld("v", 1, 1, TInt64)))))
    val nb = parseSet(fds("t", Seq(outer)))
    assert(nb.messages.keySet === Set("t.Outer", "t.Outer.Inner"))
    val flat = graft.ros.RosSchemaMapper.flatSchema(bundle("t.Outer", nb))
    assert(flat.fieldNames.toSeq === Seq("inner_v", "n"))
    val rt = ProtoCodec.decode(nb, "t.Outer",
      ProtoCodec.encode(nb, "t.Outer", Seq(77L, 5)))
    assert(rt === Seq(77L, 5))
  }
}
