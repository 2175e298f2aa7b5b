package graft.ros.mcap

import graft.ros._
import graft.ros.RosPrimitive._

/** Typed protobuf decode for MCAP channels — the MCAP well-known
  * `protobuf` profile (mcap.dev registry): a Schema record whose
  * `encoding` is "protobuf" carries a serialized
  * `google.protobuf.FileDescriptorSet` in `data` and the root
  * message's fully-qualified name in `name`; the channel's message
  * encoding is "protobuf". Everything here is a pure-bytes walker in
  * the CdrCodec style — the descriptor format (descriptor.proto) and
  * the wire format (varint/tag encoding) are public and small, and a
  * generated-code dependency would be both unavailable offline and
  * the wrong shape (schemas arrive at runtime, inside the container).
  *
  * Same engine role as Ros2Msg+CdrCodec for ros2msg schemas: the
  * descriptor maps onto a [[RosMsgBundle]] so `RosSchemaMapper
  * .flatSchema` (the ONE flattening, reference MessageTable.cpp:263-303)
  * defines the column frame, and [[ProtoCodec.decode]] emits values in
  * exactly that order. Downstream (typed reads, ETL, queries) is
  * shared with both other formats.
  *
  * Contract notes, mirroring the ros2msg path:
  *  - Unknown field numbers FAIL LOUDLY. Protobuf-the-ecosystem skips
  *    them (schema evolution across independently-deployed readers),
  *    but here the schema IS the writer's: it rides the same file as
  *    the payloads it describes, so an unknown field is drift or
  *    corruption, the md5-drift contract of the typed read.
  *  - Absent fields surface as proto3 defaults (0 / false / "" /
  *    empty), matching what any protobuf reader reports; an absent
  *    singular nested message yields its all-defaults flattening.
  *  - uint64/fixed64 reinterpret into LongType (the RUInt64 rule);
  *    uint32/fixed32 widen to LongType (the RUInt32 rule); enums
  *    decode as their int32 wire value.
  *  - `bytes` fields become BinaryType columns; REPEATED `bytes` (an
  *    array of blobs) has no ROS-frame analog and is refused loudly,
  *    as are `group` fields (proto1 relic) and recursive message
  *    types (an unbounded flattening).
  */
object ProtoDescriptor {

  /** One field of a message descriptor: declaration-ordered, with the
    * wire `number`, the FieldDescriptorProto `type` enum value, and
    * `typeName` (leading-dot-stripped fq name) for message/enum types.
    */
  final case class ProtoField(name: String, number: Int, repeated: Boolean,
                              tpe: Int, typeName: String)

  final case class ProtoMsgDescr(fq: String, fields: Seq[ProtoField]) {
    /** number → field, built once per descriptor (not per message —
      * a 10M-row decode must not allocate 10M lookup maps).
      */
    @transient lazy val byNumber: Map[Int, ProtoField] =
      fields.map(f => f.number -> f).toMap
  }

  /** All messages of a FileDescriptorSet, keyed by fq name (no leading
    * dot): "pkg.sub.Outer.Inner" for nested declarations.
    */
  final case class ProtoSet(messages: Map[String, ProtoMsgDescr]) {
    def apply(fq: String): ProtoMsgDescr =
      messages.getOrElse(fq, throw new IllegalArgumentException(
        s"message type '$fq' not present in the FileDescriptorSet " +
          s"(carries: ${messages.keys.toSeq.sorted.mkString(", ")})"))
  }

  // FieldDescriptorProto.Type values (descriptor.proto, public)
  val TDouble = 1; val TFloat = 2; val TInt64 = 3; val TUInt64 = 4
  val TInt32 = 5; val TFixed64 = 6; val TFixed32 = 7; val TBool = 8
  val TString = 9; val TGroup = 10; val TMessage = 11; val TBytes = 12
  val TUInt32 = 13; val TEnum = 14; val TSFixed32 = 15; val TSFixed64 = 16
  val TSInt32 = 17; val TSInt64 = 18

  /** Parse a serialized FileDescriptorSet. UNLIKE the payload decoder
    * this walker SKIPS unknown fields: protoc emits options,
    * source-code info, service/extension blocks and more, none of
    * which affect the wire layout of the described messages.
    */
  def parseSet(data: Array[Byte]): ProtoSet = {
    val msgs = scala.collection.mutable.Map[String, ProtoMsgDescr]()
    val r = new PbReader(data, 0, data.length)
    while (r.hasNext) {
      val (num, wt) = r.tag()
      if (num == 1 && wt == 2) { // repeated FileDescriptorProto file
        val (o, l) = r.lenDelim()
        parseFile(data, o, o + l, msgs)
      } else r.skip(wt)
    }
    ProtoSet(msgs.toMap)
  }

  private def parseFile(b: Array[Byte], start: Int, end: Int,
      out: scala.collection.mutable.Map[String, ProtoMsgDescr]): Unit = {
    // two passes: package (field 2) may legally follow message_type
    // records in the serialized form — collect message ranges first
    var pkg = ""
    val msgRanges = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    val r = new PbReader(b, start, end)
    while (r.hasNext) {
      val (num, wt) = r.tag()
      (num, wt) match {
        case (2, 2) => pkg = r.string()
        case (4, 2) => val (o, l) = r.lenDelim(); msgRanges += ((o, o + l))
        case _ => r.skip(wt)
      }
    }
    msgRanges.foreach { case (o, e) => parseMessage(b, o, e, pkg, out) }
  }

  private def parseMessage(b: Array[Byte], start: Int, end: Int, prefix: String,
      out: scala.collection.mutable.Map[String, ProtoMsgDescr]): Unit = {
    var name = ""
    val fieldRanges = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    val nestedRanges = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    val r = new PbReader(b, start, end)
    while (r.hasNext) {
      val (num, wt) = r.tag()
      (num, wt) match {
        case (1, 2) => name = r.string()
        case (2, 2) => val (o, l) = r.lenDelim(); fieldRanges += ((o, o + l))
        case (3, 2) => val (o, l) = r.lenDelim(); nestedRanges += ((o, o + l))
        case _ => r.skip(wt)
      }
    }
    require(name.nonEmpty, "DescriptorProto without a name")
    val fq = if (prefix.isEmpty) name else s"$prefix.$name"
    val fields = fieldRanges.map { case (o, e) => parseField(b, o, e) }.toSeq
    require(!out.contains(fq), s"duplicate message descriptor '$fq'")
    out(fq) = ProtoMsgDescr(fq, fields)
    nestedRanges.foreach { case (o, e) => parseMessage(b, o, e, fq, out) }
  }

  private def parseField(b: Array[Byte], start: Int, end: Int): ProtoField = {
    var name = ""; var number = 0; var label = 1; var tpe = 0; var typeName = ""
    val r = new PbReader(b, start, end)
    while (r.hasNext) {
      val (num, wt) = r.tag()
      (num, wt) match {
        case (1, 2) => name = r.string()
        case (3, 0) => number = r.varint().toInt
        case (4, 0) => label = r.varint().toInt
        case (5, 0) => tpe = r.varint().toInt
        case (6, 2) => typeName = r.string().stripPrefix(".")
        case _ => r.skip(wt)
      }
    }
    require(name.nonEmpty && number > 0 && tpe > 0,
      s"malformed FieldDescriptorProto (name='$name', number=$number, type=$tpe)")
    ProtoField(name, number, repeated = label == 3, tpe, typeName)
  }

  // descriptor.proto subset (public field numbers) used by
  // [[buildFds]] — FileDescriptorSet / FileDescriptorProto /
  // DescriptorProto / FieldDescriptorProto, flat declarations only
  private lazy val DescSubset: ProtoSet = ProtoSet(Map(
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

  /** Serialize a real FileDescriptorSet for one package of flat
    * (non-nested) message declarations — the fixture/tooling writer.
    * The bytes come from [[ProtoCodec.encode]] over a descriptor-subset
    * ProtoSet (the descriptor format IS protobuf), so every consumer
    * cross-validates the engine's encoder against its independent
    * descriptor parser.
    */
  def buildFds(pkg: String, messages: Seq[(String, Seq[ProtoField])]): Array[Byte] = {
    import org.apache.spark.sql.Row
    val msgRows = messages.map { case (n, fs) =>
      Row(n, fs.map(f =>
        Row(f.name, f.number, if (f.repeated) 3 else 1, f.tpe, f.typeName)),
        Seq.empty[Row])
    }
    ProtoCodec.encode(DescSubset, "FDS",
      Seq(Seq(Row(s"${pkg.replace('.', '_')}.proto", pkg, msgRows))))
  }

  /** "pkg.sub.Msg" → the RosMsgDef fullName form "pkg.sub/Msg" (last
    * dot becomes the single pkg/name separator, so RosMsgBundle's
    * exact-full-name resolution is a straight map hit).
    */
  def rosName(fq: String): String = fq.lastIndexOf('.') match {
    case -1 => fq
    case i => fq.substring(0, i) + "/" + fq.substring(i + 1)
  }

  private def rosRef(fq: String): RosMsgRef = fq.lastIndexOf('.') match {
    case -1 => RosMsgRef(None, fq)
    case i => RosMsgRef(Some(fq.substring(0, i)), fq.substring(i + 1))
  }

  /** Scalar proto type → the ROS primitive whose Spark mapping matches
    * the decode boxing (RosSchemaMapper.scalarSparkType).
    */
  private def scalarRos(tpe: Int, fq: String, field: String): RosPrimitive = tpe match {
    case TDouble => RFloat64
    case TFloat => RFloat32
    case TInt64 | TSInt64 | TSFixed64 => RInt64
    case TUInt64 | TFixed64 => RUInt64
    case TInt32 | TSInt32 | TSFixed32 => RInt32
    case TUInt32 | TFixed32 => RUInt32
    case TBool => RBool
    case TString => RString
    case TEnum => RInt32
    case TGroup => throw new IllegalArgumentException(
      s"$fq.$field is a group — proto1 groups are not supported")
    case other => throw new IllegalArgumentException(
      s"$fq.$field has unknown FieldDescriptorProto type $other")
  }

  /** Map the transitive message closure from `rootFq` onto a
    * RosMsgBundle, so `RosSchemaMapper.flatSchema` defines the typed
    * column frame exactly as it does for ros2msg and rosbag1 schemas.
    * Recursive message types are refused (their flattening is
    * unbounded — protobuf allows them, a columnar frame cannot).
    */
  def bundle(rootFq: String, set: ProtoSet): RosMsgBundle = {
    val defs = scala.collection.mutable.Map[String, RosMsgDef]()
    def build(fq: String, path: List[String]): RosMsgDef = {
      require(!path.contains(fq),
        s"recursive message type ${(fq :: path).reverse.mkString(" -> ")} " +
          "cannot be flattened to columns")
      defs.getOrElseUpdate(rosName(fq), {
        val d = set(fq)
        val fields = d.fields.map { f =>
          val tpe: RosType = (f.tpe, f.repeated) match {
            case (TMessage, rep) =>
              build(f.typeName, fq :: path) // register the dependency
              val ref = rosRef(f.typeName)
              if (rep) RosArray(ref, None) else ref
            case (TBytes, false) => RosArray(RUInt8, None) // BinaryType column
            case (TBytes, true) => throw new IllegalArgumentException(
              s"$fq.${f.name} is repeated bytes — an array of blobs has no " +
                "flattened-column mapping; read the channel untyped")
            case (t, false) => scalarRos(t, fq, f.name)
            case (t, true) => RosArray(scalarRos(t, fq, f.name), None)
          }
          RosField(f.name, tpe, None)
        }
        RosMsgDef(rosName(fq), fields)
      })
    }
    val root = build(rootFq, Nil)
    RosMsgBundle(root, (defs - root.fullName).toMap)
  }
}

/** Protobuf wire walker over a byte-range view (no copies for nested
  * messages). Wire types: 0 varint, 1 fixed64, 2 length-delimited,
  * 5 fixed32 (3/4 are the deprecated group markers, refused).
  */
private[mcap] final class PbReader(b: Array[Byte], start: Int, end: Int) {
  private var pos = start
  def hasNext: Boolean = pos < end

  def varint(): Long = {
    var v = 0L; var shift = 0
    while (true) {
      require(pos < end, "varint overruns the payload")
      require(shift < 64, "varint longer than 10 bytes")
      val x = b(pos); pos += 1
      v |= (x & 0x7FL) << shift
      if ((x & 0x80) == 0) return v
      shift += 7
    }
    v // unreachable
  }

  def tag(): (Int, Int) = {
    val t = varint()
    val wt = (t & 7L).toInt
    val num = (t >>> 3).toInt
    require(num > 0, s"field number 0 in tag")
    require(wt == 0 || wt == 1 || wt == 2 || wt == 5,
      s"unsupported wire type $wt (groups / reserved)")
    (num, wt)
  }

  def fixed32(): Int = {
    require(pos + 4 <= end, "fixed32 overruns the payload")
    val v = (b(pos) & 0xFF) | ((b(pos + 1) & 0xFF) << 8) |
      ((b(pos + 2) & 0xFF) << 16) | ((b(pos + 3) & 0xFF) << 24)
    pos += 4; v
  }

  def fixed64(): Long = {
    require(pos + 8 <= end, "fixed64 overruns the payload")
    var v = 0L; var i = 7
    while (i >= 0) { v = (v << 8) | (b(pos + i) & 0xFFL); i -= 1 }
    pos += 8; v
  }

  /** (offset, length) of a length-delimited payload; advances past it. */
  def lenDelim(): (Int, Int) = {
    val n = varint()
    require(n >= 0 && pos + n <= end,
      s"length-delimited field of $n bytes overruns the payload")
    val o = pos; pos += n.toInt; (o, n.toInt)
  }

  def string(): String = {
    val (o, l) = lenDelim()
    new String(b, o, l, java.nio.charset.StandardCharsets.UTF_8)
  }

  def blob(): Array[Byte] = {
    val (o, l) = lenDelim()
    java.util.Arrays.copyOfRange(b, o, o + l)
  }

  def skip(wireType: Int): Unit = wireType match {
    case 0 => varint(); ()
    case 1 => fixed64(); ()
    case 2 => lenDelim(); ()
    case 5 => fixed32(); ()
  }
}

/** Decode/encode protobuf message payloads against a
  * [[ProtoDescriptor.ProtoSet]], value-aligned with
  * `RosSchemaMapper.flatSchema(ProtoDescriptor.bundle(...))` — the
  * protobuf sibling of CdrCodec, same Seq[Any] contract.
  */
object ProtoCodec {
  import ProtoDescriptor._
  import org.apache.spark.sql.Row

  private def wireTypeOf(tpe: Int): Int = tpe match {
    case TInt64 | TUInt64 | TInt32 | TUInt32 | TBool | TEnum | TSInt32 | TSInt64 => 0
    case TDouble | TFixed64 | TSFixed64 => 1
    case TString | TMessage | TBytes => 2
    case TFloat | TFixed32 | TSFixed32 => 5
  }

  private def zig32(v: Long): Int = (((v >>> 1) ^ -(v & 1L))).toInt
  private def zig64(v: Long): Long = (v >>> 1) ^ -(v & 1L)

  private def scalarFromVarint(tpe: Int, v: Long): Any = tpe match {
    case TInt64 => v
    case TUInt64 => v // reinterpret, the RUInt64 rule
    case TInt32 => v.toInt
    case TUInt32 => v & 0xFFFFFFFFL // widen, the RUInt32 rule
    case TBool => v != 0L
    case TEnum => v.toInt
    case TSInt32 => zig32(v)
    case TSInt64 => zig64(v)
  }

  private def defaultOf(tpe: Int): Any = tpe match {
    case TDouble => 0.0
    case TFloat => 0.0f
    case TInt64 | TSInt64 | TUInt64 | TFixed64 | TSFixed64 => 0L
    case TUInt32 | TFixed32 => 0L
    case TInt32 | TSInt32 | TEnum => 0
    case TBool => false
    case TString => ""
    case TBytes => Array.emptyByteArray
  }

  /** Decode one message payload into flatSchema-ordered values. */
  def decode(set: ProtoSet, rootFq: String, bytes: Array[Byte]): Seq[Any] = {
    val out = scala.collection.mutable.ArrayBuffer[Any]()
    decodeMsg(set, set(rootFq), bytes, 0, bytes.length, out)
    out.toSeq
  }

  /** One collected wire occurrence: varint/fixed payloads in `v`,
    * length-delimited ranges as (offset, length) in (`o`, `l`).
    */
  private final case class Occ(wt: Int, v: Long, o: Int, l: Int)

  private def decodeMsg(set: ProtoSet, msg: ProtoMsgDescr, b: Array[Byte],
      start: Int, end: Int, out: scala.collection.mutable.ArrayBuffer[Any]): Unit = {
    val byNumber = msg.byNumber
    // pass 1: collect occurrences per declared field (wire order is
    // free; repeated fields may interleave; last-wins for singulars)
    val occs = scala.collection.mutable.Map[Int, scala.collection.mutable.ArrayBuffer[Occ]]()
    val r = new PbReader(b, start, end)
    while (r.hasNext) {
      val (num, wt) = r.tag()
      val f = byNumber.getOrElse(num, throw new IllegalArgumentException(
        s"unknown field number $num in ${msg.fq} — schema/payload drift " +
          "(the writer's schema rides the same file; this payload was not " +
          "serialized under it)"))
      val expected = wireTypeOf(f.tpe)
      val packed = f.repeated && wt == 2 && expected != 2
      require(wt == expected || packed,
        s"${msg.fq}.${f.name} (field $num) arrived as wire type $wt, " +
          s"declared type ${f.tpe} expects $expected — schema/payload drift")
      val occ = wt match {
        case 0 => Occ(0, r.varint(), 0, 0)
        case 1 => Occ(1, r.fixed64(), 0, 0)
        case 5 => Occ(5, r.fixed32().toLong, 0, 0)
        case 2 => val (o, l) = r.lenDelim(); Occ(2, 0L, o, l)
      }
      occs.getOrElseUpdate(num, scala.collection.mutable.ArrayBuffer[Occ]()) += occ
    }
    // pass 2: emit in declaration order (= flatSchema order)
    msg.fields.foreach { f =>
      val got = occs.getOrElse(f.number, scala.collection.mutable.ArrayBuffer.empty[Occ])
      if (f.repeated) out += repeatedValues(set, f, b, got.toSeq)
      else (f.tpe, got.lastOption) match {
        case (TMessage, Some(occ)) =>
          if (got.length == 1)
            decodeMsg(set, set(f.typeName), b, occ.o, occ.o + occ.l, out)
          else {
            // spec: parsers MERGE multiple occurrences of an embedded
            // message field — and merging serialized messages IS
            // byte-concatenation (the inner decode's last-wins /
            // repeated-append semantics then apply across fragments)
            val merged = new Array[Byte](got.map(_.l).sum)
            var off = 0
            got.foreach { o =>
              System.arraycopy(b, o.o, merged, off, o.l); off += o.l
            }
            decodeMsg(set, set(f.typeName), merged, 0, merged.length, out)
          }
        case (TMessage, None) => // absent: all-defaults flattening
          decodeMsg(set, set(f.typeName), b, 0, 0, out)
        case (TBytes, Some(occ)) =>
          out += java.util.Arrays.copyOfRange(b, occ.o, occ.o + occ.l)
        case (TString, Some(occ)) =>
          out += new String(b, occ.o, occ.l, java.nio.charset.StandardCharsets.UTF_8)
        case (tpe, Some(occ)) => out += scalarOf(tpe, occ)
        case (tpe, None) => out += defaultOf(tpe)
      }
    }
  }

  private def scalarOf(tpe: Int, occ: Occ): Any = tpe match {
    case TDouble => java.lang.Double.longBitsToDouble(occ.v)
    case TFloat => java.lang.Float.intBitsToFloat(occ.v.toInt)
    case TFixed64 => occ.v // reinterpret (RUInt64)
    case TSFixed64 => occ.v
    case TFixed32 => occ.v & 0xFFFFFFFFL // widen (RUInt32)
    case TSFixed32 => occ.v.toInt
    case t => scalarFromVarint(t, occ.v)
  }

  /** Repeated field → the Seq the flat frame expects ([[Row]] per
    * message element). Packed occurrences (wire type 2 over a scalar
    * type) unpack; packed and expanded entries may mix (the spec
    * allows it; parsers must accept both).
    */
  private def repeatedValues(set: ProtoSet, f: ProtoField, b: Array[Byte],
      got: Seq[Occ]): Any = f.tpe match {
    case TMessage =>
      got.map { occ =>
        val vals = scala.collection.mutable.ArrayBuffer[Any]()
        decodeMsg(set, set(f.typeName), b, occ.o, occ.o + occ.l, vals)
        Row.fromSeq(vals.toSeq)
      }
    case TString =>
      got.map(occ => new String(b, occ.o, occ.l, java.nio.charset.StandardCharsets.UTF_8))
    case tpe =>
      got.flatMap { occ =>
        if (occ.wt != 2) Seq(scalarOf(tpe, occ))
        else { // packed
          val r = new PbReader(b, occ.o, occ.o + occ.l)
          val buf = scala.collection.mutable.ArrayBuffer[Any]()
          while (r.hasNext) buf += (wireTypeOf(tpe) match {
            case 0 => scalarFromVarint(tpe, r.varint())
            case 1 => scalarOf(tpe, Occ(1, r.fixed64(), 0, 0))
            case 5 => scalarOf(tpe, Occ(5, r.fixed32().toLong, 0, 0))
          })
          buf.toSeq
        }
      }
  }

  // ---- encoder (fixtures + round-trip property tests), the CdrCodec
  // pattern: consume flatSchema-ordered values, emit declaration-order
  // fields; scalar runs pack (proto3 default), strings/messages one
  // tag per element; singular fields always written (explicit defaults
  // are legal on the wire and keep round-trips exact) ----

  private final class PbWriter {
    val buf = new java.io.ByteArrayOutputStream()
    def varint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7FL) != 0L) { buf.write(((x & 0x7F) | 0x80).toInt); x >>>= 7 }
      buf.write(x.toInt)
    }
    def tag(num: Int, wt: Int): Unit = varint((num.toLong << 3) | wt)
    def fixed32(v: Int): Unit = {
      var i = 0
      while (i < 4) { buf.write((v >>> (8 * i)) & 0xFF); i += 1 }
    }
    def fixed64(v: Long): Unit = {
      var i = 0
      while (i < 8) { buf.write(((v >>> (8 * i)) & 0xFF).toInt); i += 1 }
    }
    def lenDelim(bs: Array[Byte]): Unit = { varint(bs.length.toLong); buf.write(bs) }
    def bytes: Array[Byte] = buf.toByteArray
  }

  def encode(set: ProtoSet, rootFq: String, values: Seq[Any]): Array[Byte] = {
    val it = values.iterator
    val w = new PbWriter
    encodeMsg(set, set(rootFq), it, w)
    require(!it.hasNext, s"${it.size} leftover values after encode")
    w.bytes
  }

  private def encodeMsg(set: ProtoSet, msg: ProtoMsgDescr, it: Iterator[Any],
      w: PbWriter): Unit =
    msg.fields.foreach { f =>
      if (f.repeated) f.tpe match {
        case TMessage =>
          it.next().asInstanceOf[Seq[Any]].foreach { x =>
            val sub = new PbWriter
            encodeMsg(set, set(f.typeName), x.asInstanceOf[Row].toSeq.iterator, sub)
            w.tag(f.number, 2); w.lenDelim(sub.bytes)
          }
        case TString =>
          it.next().asInstanceOf[Seq[Any]].foreach { x =>
            w.tag(f.number, 2)
            w.lenDelim(x.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8))
          }
        case tpe =>
          val xs = it.next().asInstanceOf[Seq[Any]]
          if (xs.nonEmpty) {
            val sub = new PbWriter
            xs.foreach(x => encScalar(tpe, x, sub))
            w.tag(f.number, 2); w.lenDelim(sub.bytes) // packed
          }
      } else f.tpe match {
        case TMessage =>
          val sub = new PbWriter
          encodeMsg(set, set(f.typeName), it, sub)
          w.tag(f.number, 2); w.lenDelim(sub.bytes)
        case TBytes =>
          w.tag(f.number, 2); w.lenDelim(it.next().asInstanceOf[Array[Byte]])
        case TString =>
          w.tag(f.number, 2)
          w.lenDelim(it.next().asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8))
        case tpe =>
          w.tag(f.number, wireTypeOf(tpe))
          encScalar(tpe, it.next(), w)
      }
    }

  // numeric boxes widen through catalyst round-trips (Int vs Long),
  // so accept any Number of sufficient range, as CdrCodec does
  private def encScalar(tpe: Int, v: Any, w: PbWriter): Unit = tpe match {
    case TDouble => w.fixed64(java.lang.Double.doubleToLongBits(v.asInstanceOf[Number].doubleValue))
    case TFloat => w.fixed32(java.lang.Float.floatToIntBits(v.asInstanceOf[Number].floatValue))
    case TInt64 | TUInt64 => w.varint(v.asInstanceOf[Number].longValue)
    case TInt32 => w.varint(v.asInstanceOf[Number].intValue.toLong) // sign-extends, per spec
    case TUInt32 => w.varint(v.asInstanceOf[Number].longValue & 0xFFFFFFFFL)
    case TEnum => w.varint(v.asInstanceOf[Number].intValue.toLong)
    case TBool => w.varint(if (v.asInstanceOf[Boolean]) 1L else 0L)
    case TSInt32 =>
      val x = v.asInstanceOf[Number].intValue.toLong
      w.varint((x << 1) ^ (x >> 63))
    case TSInt64 =>
      val x = v.asInstanceOf[Number].longValue
      w.varint((x << 1) ^ (x >> 63))
    case TFixed64 | TSFixed64 => w.fixed64(v.asInstanceOf[Number].longValue)
    case TFixed32 | TSFixed32 => w.fixed32(v.asInstanceOf[Number].intValue)
  }
}
