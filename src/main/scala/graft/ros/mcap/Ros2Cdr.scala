package graft.ros.mcap

import graft.ros._
import graft.ros.RosPrimitive._

/** ROS 2 message definitions + CDR serialization for MCAP typed reads.
  *
  * `Ros2Msg` normalizes the `ros2msg` schema text (what MCAP Schema
  * records carry for ROS 2 bags) down to the ROS 1 msg grammar that
  * `MsgDefParser` already reads — the two formats share the field
  * grammar; ROS 2 adds bounded strings/sequences, inline default
  * values, and three-segment type names (`pkg/msg/Type`), none of
  * which change the WIRE layout. `CdrCodec` then decodes the message
  * payload per XCDR1 ("cdr" message encoding): a 4-byte encapsulation
  * header followed by little/big-endian primitives each aligned to
  * their own size relative to the post-header origin — the alignment
  * being the one rule ROS 1's packed format doesn't have.
  *
  * Same engine role as RosSchemaMapper.decode for rosbag1 (reference
  * MessageTable.cpp:40-225); output is aligned with the SAME
  * `RosSchemaMapper.flatSchema`, so every downstream layer (typed
  * schema, ETL, queries) is shared between the two container formats.
  */
object Ros2Msg {

  /** Rewrite one ros2msg definition (root + `===`-separated dependent
    * blocks) into MsgDefParser's grammar:
    *  - `pkg/msg/Type` → `pkg/Type` in MSG: headers and field types;
    *  - bounded strings `string<=N` → `string` (CDR serializes bounded
    *    and unbounded strings identically);
    *  - bounded sequences `T[<=N]` → `T[]` (same reasoning);
    *  - inline default values (`int32 x 5`, `string s "hi"`) stripped
    *    (defaults are a codegen concern, not a wire one);
    *  - `byte`/`char` → `uint8` (the ROS 2 semantics; ROS 1 aliased
    *    byte to int8);
    *  - `wstring` (bounded or not) kept as the distinct RWString
    *    primitive — UTF-16 on the wire (round 17; previously refused),
    *    decoded per XTypes: u32 BYTE length, no terminator, code units
    *    in the encapsulation's endianness. ROS 1 paths still refuse it.
    */
  def normalize(definition: String): String =
    definition.linesIterator.map { raw =>
      val trimmed = raw.trim
      if (trimmed.startsWith("MSG:"))
        "MSG: " + collapseMsg(trimmed.stripPrefix("MSG:").trim)
      else if (trimmed.isEmpty || trimmed.startsWith("#") || trimmed.matches("=+"))
        raw
      else {
        // split off the comment so default-stripping can't eat it; a
        // '#' inside a string CONSTANT stays (constants keep the rest
        // of the line verbatim, handled below)
        val code = trimmed
        val sp = code.indexWhere(c => c == ' ' || c == '\t')
        if (sp <= 0) raw
        else {
          val typeStr = normalizeType(code.substring(0, sp))
          val rest = code.substring(sp).trim
          // a CONSTANT is `NAME=VALUE` (optionally spaced '='): the
          // '=' must follow the name token itself. Searching the whole
          // line for '=' would misroute a FIELD whose string default
          // or trailing comment contains '=' (`string url "a?x=1"`,
          // `int32 x 5 # a=b`) into the constant branch — the field
          // would then be skipped on the wire and every later column
          // would decode misaligned.
          val name = rest.takeWhile(c => c != ' ' && c != '\t' && c != '=' && c != '#')
          val afterName = rest.drop(name.length).dropWhile(c => c == ' ' || c == '\t')
          if (afterName.startsWith("=")) s"$typeStr $rest" // constant: keep value verbatim
          else s"$typeStr $name" // field with optional default: name only
        }
      }
    }.mkString("\n")

  private def collapseMsg(name: String): String =
    name.split("/") match {
      case Array(pkg, "msg", tpe) => s"$pkg/$tpe"
      case _ => name
    }

  private def normalizeType(t: String): String = {
    // split base type from array suffix
    val (base0, arr) = t.indexOf('[') match {
      case -1 => (t, "")
      case i => (t.substring(0, i), t.substring(i))
    }
    val base1 =
      if (base0.startsWith("string<=")) "string"
      else if (base0.startsWith("wstring<=")) "wstring"
      else base0
    val base2 = base1 match {
      case "byte" | "char" => "uint8"
      case b => collapseMsg(b)
    }
    // bounded sequence [<=N] → []; bounded-capacity [N] stays fixed
    val arrNorm = if (arr.startsWith("[<=")) "[]" else arr
    base2 + arrNorm
  }

  private val BuiltinTimeDefs =
    """================================================================================
      |MSG: builtin_interfaces/Time
      |int32 sec
      |uint32 nanosec
      |================================================================================
      |MSG: builtin_interfaces/Duration
      |int32 sec
      |uint32 nanosec""".stripMargin

  /** Parse a ros2msg schema into the shared bundle form. The
    * builtin_interfaces Time/Duration definitions are appended when the
    * writer omitted them from the dependency closure (common: they are
    * "well-known" to ROS 2 tooling).
    */
  def bundle(schemaName: String, definition: String): RosMsgBundle = {
    val root = collapseMsg(schemaName)
    val norm = normalize(definition)
    val withBuiltins =
      if (norm.contains("MSG: builtin_interfaces/Time")) norm
      else norm + "\n" + BuiltinTimeDefs
    MsgDefParser.parse(root, withBuiltins)
  }
}

/** XCDR1 + XCDR2 decode/encode against a RosMsgBundle, value-aligned
  * with `RosSchemaMapper.flatSchema` (same contract as
  * RosSchemaMapper.decode/encode for the ROS 1 wire format).
  *
  * XCDR2 (DDS-XTypes 1.3 §7.4.3) differs from XCDR1 in exactly two
  * ways on this type subset:
  *  - maximum alignment is 4 (8-byte primitives align to 4);
  *  - DHEADERs — a u32 byte count of the object that follows —
  *    precede (a) collections whose element type is non-primitive
  *    (strings, Time/Duration, nested messages) in EVERY xcdr2
  *    flavor, and (b) every struct value (top-level and nested,
  *    including Time/Duration) under the DELIMITED encapsulations
  *    0x08/0x09, which declare the bundle's types appendable.
  * On decode a DHEADER is also honored as appendable forward-compat:
  * members past what our schema knows are SKIPPED to the header's
  * end (a newer writer appended fields); a decode OVERRUNNING its
  * scope is corruption and fails loudly.
  *
  * The MUTABLE encapsulations carry a per-member id header on every
  * struct member (top-level and nested, including Time/Duration),
  * which makes members reorderable, omittable and extensible:
  *  - PL_CDR (0x02/0x03, XCDR1 mutable): each member is a 4-aligned
  *    RTPS-style parameter `{u16 pid, u16 length}` whose value gets a
  *    FRESH alignment origin (XTypes 1.3 §7.4.1's PUSH(ORIGIN=0) for
  *    mutable xcdr1 members); ids ≥ 0x3F00 or lengths > 0xFFFF use
  *    the extended header (PID_EXTENDED 0x3F01, length 8, then
  *    u32 id + u32 length); the list ends at PID_SENTINEL 0x3F02.
  *    Flag 0x4000 is must-understand; 0x8000 (impl-extension) is
  *    ignored. Member values are padded to a 4-byte multiple with the
  *    padding INCLUDED in the declared length (the RTPS convention);
  *    exact lengths also decode (the next header re-aligns).
  *  - PL_CDR2 (0x0a/0x0b, XCDR2 mutable): the struct value is a
  *    DHEADER followed by EMHEADER-framed members — a 4-aligned u32
  *    `(M<<31)|(LC<<28)|id`; LC 0–3 declare value lengths 1/2/4/8,
  *    LC 4 takes the length from a following NEXTINT u32, and LC
  *    5/6/7 REUSE the member's own leading u32 (an element count, or
  *    a DHEADER value under LC 5): length = 4 + NEXTINT×{1,4,8} —
  *    the shortcut covers 1/4/8-byte-element sequences; 2-byte
  *    elements take LC 4.
  * Decode semantics for both: member ids are the field ordinals in
  * definition order (the DDS default AUTOID sequential assignment
  * from 0) per struct; unknown ids skip by their declared length
  * (must-understand unknowns fail loudly); duplicate known ids fail;
  * members ABSENT from the wire take the type's default values
  * (XTypes member-default rule: zero/""/empty).
  *
  * Scope note: XTypes extensibility is formally PER TYPE — a bundle
  * could mix a mutable root with final nested structs. This codec
  * assumes UNIFORM extensibility across the bundle, selected by the
  * message's encapsulation id (the ROS 2 reality: rosidl applies one
  * default to generated types and rmw stamps the message-level id
  * accordingly). A genuinely mixed-extensibility payload fails
  * loudly on the scope/overrun checks rather than misparsing.
  */
object CdrCodec {
  import org.apache.spark.sql.Row

  /** Serialization flavor selected by the encapsulation id: maximum
    * alignment, struct delimiting, member-id headers, and the id the
    * encoder stamps. The mutable flavors keep `delimited = false`
    * because the mutable struct machinery frames its OWN scope
    * (DHEADER + EMHEADERs for xcdr2, sentinel-terminated parameter
    * list for xcdr1) — the generic inScope wrappers stay no-ops.
    */
  sealed abstract class CdrFlavor(val maxAlign: Int, val delimited: Boolean,
      val repLe: Int, val mutable: Boolean = false) {
    /** xcdr2 collection rule: non-primitive-element collections carry
      * a DHEADER in both final and delimited flavors. */
    def xcdr2: Boolean = maxAlign == 4
  }
  case object Xcdr1 extends CdrFlavor(8, false, 0x01)
  case object Xcdr2Final extends CdrFlavor(4, false, 0x07)
  case object Xcdr2Delimited extends CdrFlavor(4, true, 0x09)
  case object Xcdr1Mutable extends CdrFlavor(8, false, 0x03, mutable = true)
  case object Xcdr2Mutable extends CdrFlavor(4, false, 0x0b, mutable = true)

  private[mcap] val PidExtended = 0x3F01
  private[mcap] val PidSentinel = 0x3F02
  private[mcap] val PidFlagMustUnderstand = 0x4000

  /** Time/Duration as a struct for the mutable flavors: two members,
    * id 0 = sec, id 1 = nsec — the same two flattened i32 values the
    * other flavors emit.
    */
  private[mcap] val MutableTimeMsg = RosMsgDef("builtin_interfaces/Time",
    Seq(RosField("sec", RInt32, None), RosField("nsec", RInt32, None)))

  /** (flavor, littleEndian) for a representation id; loud refusal for
    * anything unknown.
    */
  def flavorOf(rep: Int): (CdrFlavor, Boolean) = rep match {
    case 0x00 => (Xcdr1, false)
    case 0x01 => (Xcdr1, true)
    case 0x02 => (Xcdr1Mutable, false)
    case 0x03 => (Xcdr1Mutable, true)
    case 0x06 => (Xcdr2Final, false)
    case 0x07 => (Xcdr2Final, true)
    case 0x08 => (Xcdr2Delimited, false)
    case 0x09 => (Xcdr2Delimited, true)
    case 0x0a => (Xcdr2Mutable, false)
    case 0x0b => (Xcdr2Mutable, true)
    case other => throw new IllegalArgumentException(
      f"unsupported cdr representation id 0x$other%02x")
  }

  private final class Reader(bytes: Array[Byte]) {
    require(bytes.length >= 4, s"cdr payload shorter than its encapsulation header")
    // {0x00, representation, options u16}
    val (flavor, le) = flavorOf(bytes(1) & 0xFF)
    private var pos = 4
    /** Alignment origin — 4 (post-encapsulation) except inside a
      * PL_CDR mutable member value, which resets it to the value's
      * start (XTypes §7.4.1 PUSH(ORIGIN=0)).
      */
    private var orig = 4
    def origin: Int = orig
    def setOrigin(o: Int): Unit = orig = o
    def align(n: Int): Unit = {
      val w = math.min(n, flavor.maxAlign)
      val rem = (pos - orig) % w
      if (rem != 0) pos += w - rem
    }
    def position: Int = pos
    def seek(p: Int): Unit = pos = p
    def payloadLength: Int = bytes.length
    /** Aligned u32 read that does NOT consume — EMHEADER LC 5/6/7
      * reuse the member's own leading count as its length.
      */
    def peekU32(): Long = { align(4); val p = pos; val v = u32(); pos = p; v }
    /** End of a DHEADER scope: appendable forward-compat skips ahead
      * to unknown trailing members; an overrun is corruption.
      */
    def closeScope(end: Int): Unit = {
      require(pos <= end, s"cdr decode overran its DHEADER scope: " +
        s"at $pos, scope ends at $end — schema/payload mismatch")
      pos = end
    }
    private def take(n: Int): Int = {
      require(pos + n <= bytes.length,
        s"cdr decode overruns the payload at $pos (+$n of ${bytes.length})")
      val p = pos; pos += n; p
    }
    def u8(): Int = bytes(take(1)) & 0xFF
    def i8(): Int = bytes(take(1)).toInt
    def u16(): Int = { align(2); val o = take(2); bits(o, 2).toInt }
    def i16(): Int = u16().toShort.toInt
    def u32(): Long = { align(4); val o = take(4); bits(o, 4) }
    def i32(): Int = u32().toInt
    def i64(): Long = { align(8); val o = take(8); bits(o, 8) }
    def f32(): Float = java.lang.Float.intBitsToFloat(i32())
    def f64(): Double = java.lang.Double.longBitsToDouble(i64())
    def blob(n: Int): Array[Byte] = {
      val o = take(n); java.util.Arrays.copyOfRange(bytes, o, o + n)
    }
    def string(): String = {
      val n = u32().toInt // length INCLUDES the null terminator
      require(n >= 0, s"negative cdr string length $n")
      val raw = blob(n)
      val end = if (n > 0 && raw(n - 1) == 0) n - 1 else n
      new String(raw, 0, end, java.nio.charset.StandardCharsets.UTF_8)
    }
    /** DDS CHAR16 string (ros2 `wstring`): u32 BYTE length of the
      * UTF-16 code units, NO terminator included (XTypes' asymmetry
      * with `string`, whose length counts the NUL). Code units follow
      * the encapsulation's endianness. Interop tolerance: a writer
      * that appended a UTF-16 NUL terminator anyway (and counted it)
      * has it stripped, mirroring string()'s terminator handling; an
      * ODD byte length is corruption and fails loudly.
      *
      * SUPPORTED WIRE FORM, stated plainly: the XTypes §7.4.3.5
      * byte-length + 2-byte-code-unit layout above is the ONLY one
      * this reader decodes. Fast-CDR 1.x (FastDDS's default
      * serializer in several ROS 2 distros) serialized wstring as an
      * ELEMENT COUNT followed by 4-byte wchar_t values — bags from
      * that population mis-frame here: best case the length check or
      * a downstream overrun fails loudly, worst case alternating NUL
      * code units decode as garbage text. The error paths name the
      * divergence so the failure is attributable, not a generic
      * frame error.
      */
    def wstring(): String = {
      val n = u32().toInt
      require(n >= 0, s"negative cdr wstring length $n")
      require(n % 2 == 0, s"cdr wstring byte length $n is odd — not " +
        "UTF-16 code units (supported wire form is XTypes " +
        "byte-length + UTF-16; Fast-CDR 1.x bags use element-count + " +
        "4-byte wchar_t, which this reader does not decode)")
      require(n <= remaining, s"cdr wstring byte length $n overruns " +
        s"the payload ($remaining bytes left) — a Fast-CDR 1.x " +
        "element-count + 4-byte-wchar_t wstring mis-framed under the " +
        "XTypes byte-length layout produces exactly this shape")
      val raw = blob(n)
      val end = if (n >= 2 && raw(n - 1) == 0 && raw(n - 2) == 0) n - 2 else n
      new String(raw, 0, end,
        if (le) java.nio.charset.StandardCharsets.UTF_16LE
        else java.nio.charset.StandardCharsets.UTF_16BE)
    }
    private def bits(o: Int, n: Int): Long = {
      var v = 0L
      if (le) { var i = n - 1; while (i >= 0) { v = (v << 8) | (bytes(o + i) & 0xFFL); i -= 1 } }
      else { var i = 0; while (i < n) { v = (v << 8) | (bytes(o + i) & 0xFFL); i += 1 } }
      v
    }
    def remaining: Int = bytes.length - pos
  }

  /** Decode one CDR message payload into values aligned with
    * `RosSchemaMapper.flatSchema(bundle)`. Trailing padding up to 3
    * bytes is tolerated (writers pad the final primitive's alignment);
    * anything more is a schema/payload mismatch and fails loudly.
    */
  def decode(bundle: RosMsgBundle, bytes: Array[Byte]): Seq[Any] = {
    val r = new Reader(bytes)
    val out = scala.collection.mutable.ArrayBuffer[Any]()
    inScope(r, r.flavor.delimited) { decodeMsg(bundle, bundle.root, r, out) }
    require(r.remaining <= 3,
      s"cdr decode left ${r.remaining} bytes unread of ${bytes.length} — schema/payload mismatch")
    out.toSeq
  }

  /** DHEADER scope when `active`: read the u32 byte count, run the
    * body, then reconcile (skip-forward to the scope's end, fail on
    * overrun).
    */
  private def inScope[A](r: Reader, active: Boolean)(body: => A): A =
    if (!active) body
    else {
      val dh = r.u32().toInt
      require(dh >= 0, s"negative cdr DHEADER $dh")
      val end = r.position + dh
      val a = body
      r.closeScope(end)
      a
    }

  private def decodeMsg(bundle: RosMsgBundle, msg: RosMsgDef, r: Reader,
                        out: scala.collection.mutable.ArrayBuffer[Any]): Unit =
    if (r.flavor.mutable) decodeMutable(bundle, msg, r, out)
    else msg.fields.filterNot(_.isConstant)
      .foreach(f => decodeField(bundle, msg, f, r, out))

  private def decodeField(bundle: RosMsgBundle, msg: RosMsgDef, f: RosField,
                          r: Reader,
                          out: scala.collection.mutable.ArrayBuffer[Any]): Unit = {
      val delim = r.flavor.delimited
      val x2 = r.flavor.xcdr2
      val mut = r.flavor.mutable
      f.tpe match {
        case RTime | RDuration =>
          if (mut) decodeMutable(bundle, MutableTimeMsg, r, out)
          else inScope(r, delim) { out += r.i32(); out += r.i32() }
        case p: RosPrimitive => out += scalar(p, r)
        case ref: RosMsgRef => inScope(r, delim) {
          decodeMsg(bundle, bundle.resolve(ref, msg.pkg), r, out)
        }
        case RosArray(RUInt8 | RByte | RChar | RInt8, fixedLen) =>
          val n = fixedLen.getOrElse(r.u32().toInt)
          out += r.blob(n)
        case RosArray(RTime | RDuration, fixedLen) =>
          out += inScope(r, x2) {
            val n = fixedLen.getOrElse(r.u32().toInt)
            Seq.fill(n) {
              if (mut) {
                val vals = scala.collection.mutable.ArrayBuffer[Any]()
                decodeMutable(bundle, MutableTimeMsg, r, vals)
                Row.fromSeq(vals.toSeq)
              } else inScope(r, delim)(Row(r.i32(), r.i32()))
            }
          }
        case RosArray(RString, fixedLen) =>
          out += inScope(r, x2) {
            val n = fixedLen.getOrElse(r.u32().toInt)
            Seq.fill(n)(r.string())
          }
        case RosArray(RWString, fixedLen) =>
          out += inScope(r, x2) {
            val n = fixedLen.getOrElse(r.u32().toInt)
            Seq.fill(n)(r.wstring())
          }
        case RosArray(p: RosPrimitive, fixedLen) =>
          val n = fixedLen.getOrElse(r.u32().toInt)
          out += Seq.fill(n)(scalar(p, r))
        case RosArray(ref: RosMsgRef, fixedLen) =>
          out += inScope(r, x2) {
            val n = fixedLen.getOrElse(r.u32().toInt)
            val sub = bundle.resolve(ref, msg.pkg)
            Seq.fill(n) {
              inScope(r, delim) {
                val vals = scala.collection.mutable.ArrayBuffer[Any]()
                decodeMsg(bundle, sub, r, vals)
                Row.fromSeq(vals.toSeq)
              }
            }
          }
        case RosArray(_: RosArray, _) =>
          throw new IllegalArgumentException("arrays of arrays are not in the ROS IDL")
      }
    }

  /** Decode one MUTABLE struct value (both PL flavors): member-id
    * headers dispatch to the schema's fields in ANY wire order; the
    * flattened values are emitted in SCHEMA order afterwards, with
    * absent members taking their defaults.
    */
  private def decodeMutable(bundle: RosMsgBundle, msg: RosMsgDef, r: Reader,
                            out: scala.collection.mutable.ArrayBuffer[Any]): Unit = {
    val fields = msg.fields.filterNot(_.isConstant).toIndexedSeq
    val slots = new Array[Seq[Any]](fields.length)
    def member(id: Int, must: Boolean, len: Int): Unit = {
      // bound at the member HEADER (position + len, not len alone): a
      // declared length overrunning the remaining payload must fail
      // here with the type named, not later as a generic take() error
      require(len >= 0 && r.position + len <= r.payloadLength,
        s"mutable member length $len (id $id) at ${r.position} exceeds " +
          s"the ${r.payloadLength}-byte payload in ${msg.fullName}")
      val end = r.position + len
      if (id >= 0 && id < fields.length) {
        require(slots(id) == null,
          s"duplicate mutable member id $id in ${msg.fullName}")
        val vals = scala.collection.mutable.ArrayBuffer[Any]()
        decodeField(bundle, msg, fields(id), r, vals)
        slots(id) = vals.toSeq
        r.closeScope(end) // tolerate member padding; overrun is corruption
      } else if (must) throw new IllegalArgumentException(
        s"unknown must-understand mutable member id $id in ${msg.fullName}")
      else r.seek(end) // unknown member: skip by its declared length
    }
    if (r.flavor.xcdr2) {
      // PL_CDR2: DHEADER scope, then EMHEADER-framed members
      val dh = r.u32().toInt
      require(dh >= 0, s"negative cdr DHEADER $dh")
      val end = r.position + dh
      while (r.position < end) {
        val em = r.u32()
        val must = (em & 0x80000000L) != 0
        val lc = ((em >>> 28) & 0x7L).toInt
        val id = (em & 0x0FFFFFFFL).toInt
        // lengths in LONG: an adversarial LC 5/6/7 count (u32, up to
        // 4G elements × 8 bytes) must overrun the DHEADER check, not
        // wrap Int into a small positive skip that silently misparses
        val len: Long = lc match {
          case 0 => 1L
          case 1 => 2L
          case 2 => 4L
          case 3 => 8L
          case 4 => r.u32()
          case 5 => 4L + r.peekU32()
          case 6 => 4L + r.peekU32() * 4L
          case 7 => 4L + r.peekU32() * 8L
        }
        require(r.position + len <= end,
          s"mutable member id $id (len $len) overruns its struct DHEADER in ${msg.fullName}")
        member(id, must, len.toInt)
      }
      require(r.position == end,
        s"mutable member walk overran its DHEADER scope in ${msg.fullName}")
    } else {
      // PL_CDR: sentinel-terminated parameter list; each member value
      // gets a fresh alignment origin
      var done = false
      while (!done) {
        r.align(4)
        val pid = r.u16()
        val plen = r.u16()
        val idPart = pid & 0x3FFF
        val must = (pid & PidFlagMustUnderstand) != 0
        if (idPart == PidSentinel) done = true
        else {
          val (id, len) =
            if (idPart == PidExtended) {
              require(plen == 8,
                s"PID_EXTENDED header length $plen != 8 in ${msg.fullName}")
              (r.u32().toInt, r.u32().toInt)
            } else (idPart, plen)
          val savedOrigin = r.origin
          r.setOrigin(r.position)
          try member(id, must, len)
          finally r.setOrigin(savedOrigin)
        }
      }
    }
    fields.indices.foreach { i =>
      out ++= (if (slots(i) != null) slots(i)
               else defaultFlat(bundle, msg, fields(i).tpe))
    }
  }

  /** Flattened default values for a member ABSENT from a mutable
    * struct's wire form — zero/""/empty, box-for-box identical with
    * what [[decodeField]] emits (Int for narrow ints, Long for
    * uint32/64, two Ints for Time).
    */
  private def defaultFlat(bundle: RosMsgBundle, msg: RosMsgDef,
                          tpe: RosType): Seq[Any] = tpe match {
    case RTime | RDuration => Seq(0, 0)
    case RBool => Seq(false)
    case RUInt32 | RInt64 | RUInt64 => Seq(0L)
    case RFloat32 => Seq(0.0f)
    case RFloat64 => Seq(0.0)
    case RString | RWString => Seq("")
    case _: RosPrimitive => Seq(0)
    case ref: RosMsgRef =>
      val sub = bundle.resolve(ref, msg.pkg)
      sub.fields.filterNot(_.isConstant).flatMap(f => defaultFlat(bundle, sub, f.tpe))
    case RosArray(RUInt8 | RByte | RChar | RInt8, fixedLen) =>
      Seq(new Array[Byte](fixedLen.getOrElse(0)))
    case RosArray(elem, fixedLen) =>
      val n = fixedLen.getOrElse(0)
      val one: Any = elem match {
        case RTime | RDuration => Row(0, 0)
        case p: RosPrimitive => defaultFlat(bundle, msg, p).head
        case ref: RosMsgRef => Row.fromSeq(defaultFlat(bundle, msg, ref))
        case _: RosArray =>
          throw new IllegalArgumentException("arrays of arrays are not in the ROS IDL")
      }
      Seq(Seq.fill(n)(one))
  }

  private def scalar(p: RosPrimitive, r: Reader): Any = p match {
    case RBool => r.u8() != 0
    case RInt8 | RByte => r.i8()
    case RUInt8 | RChar => r.u8()
    case RInt16 => r.i16()
    case RUInt16 => r.u16()
    case RInt32 => r.i32()
    case RUInt32 => r.u32()
    case RInt64 | RUInt64 => r.i64() // uint64 reinterpreted, as in ros1 path
    case RFloat32 => r.f32()
    case RFloat64 => r.f64()
    case RString => r.string()
    case RWString => r.wstring()
    case RTime | RDuration => throw new IllegalStateException("handled by caller")
  }

  // ---- encoder (fixtures + round-trip property tests) ----

  /** `origin` is where alignment counts from: 4 past the top writer's
    * encapsulation header, 0 for a DHEADER sub-scope — sound because a
    * scope always starts 4-aligned and xcdr2's max alignment IS 4.
    */
  private final class Writer(flavor: CdrFlavor, withHeader: Boolean) {
    private val buf = new java.io.ByteArrayOutputStream()
    private val origin = if (withHeader) 4 else 0
    if (withHeader) {
      buf.write(0x00); buf.write(flavor.repLe); buf.write(0x00); buf.write(0x00)
    }
    private def pos: Int = buf.size()
    def align(n: Int): Unit = {
      val w = math.min(n, flavor.maxAlign)
      val rem = (pos - origin) % w
      if (rem != 0) (0 until w - rem).foreach(_ => buf.write(0))
    }
    def u8(v: Int): Unit = buf.write(v & 0xFF)
    def u16(v: Int): Unit = { align(2); buf.write(v & 0xFF); buf.write((v >> 8) & 0xFF) }
    def u32(v: Long): Unit = { align(4); (0 until 4).foreach(i => buf.write(((v >> (8 * i)) & 0xFF).toInt)) }
    def u64(v: Long): Unit = { align(8); (0 until 8).foreach(i => buf.write(((v >> (8 * i)) & 0xFF).toInt)) }
    def blob(b: Array[Byte]): Unit = buf.write(b)
    def string(s: String): Unit = {
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      u32(b.length + 1); buf.write(b); buf.write(0)
    }
    /** `wstring`: u32 BYTE length, UTF-16LE code units (the Writer is
      * LE-only), no terminator — XTypes' asymmetry with string().
      */
    def wstring(s: String): Unit = {
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
      u32(b.length.toLong); buf.write(b)
    }
    /** DHEADER scope when `active`: body into a fresh origin-0
      * sub-writer, then u32 byte count + bytes.
      */
    def scope(active: Boolean)(body: Writer => Unit): Unit =
      if (!active) body(this)
      else {
        val sub = new Writer(flavor, withHeader = false)
        body(sub)
        val b = sub.bytes
        u32(b.length.toLong)
        blob(b)
      }
    def bytes: Array[Byte] = buf.toByteArray
  }

  def encode(bundle: RosMsgBundle, values: Seq[Any],
      flavor: CdrFlavor = Xcdr1): Array[Byte] = {
    val w = new Writer(flavor, withHeader = true)
    val it = values.iterator
    w.scope(flavor.delimited)(encodeMsg(bundle, bundle.root, it, _, flavor))
    require(!it.hasNext, s"${it.size} leftover values after encode")
    w.bytes
  }

  private def encodeMsg(bundle: RosMsgBundle, msg: RosMsgDef, it: Iterator[Any],
                        w: Writer, flavor: CdrFlavor): Unit =
    if (flavor.mutable) encodeMutable(bundle, msg, it, w, flavor)
    else msg.fields.filterNot(_.isConstant)
      .foreach(f => encodeField(bundle, msg, f, it, w, flavor))

  private def encodeField(bundle: RosMsgBundle, msg: RosMsgDef, f: RosField,
                          it: Iterator[Any], w: Writer, flavor: CdrFlavor): Unit =
      f.tpe match {
        case RTime | RDuration =>
          if (flavor.mutable)
            encodeMutable(bundle, MutableTimeMsg, it, w, flavor)
          else {
            val sec = it.next().asInstanceOf[Int].toLong
            val nsec = it.next().asInstanceOf[Int].toLong
            w.scope(flavor.delimited) { sw => sw.u32(sec); sw.u32(nsec) }
          }
        case p: RosPrimitive => encScalar(p, it.next(), w)
        case ref: RosMsgRef => w.scope(flavor.delimited)(
          encodeMsg(bundle, bundle.resolve(ref, msg.pkg), it, _, flavor))
        case RosArray(RUInt8 | RByte | RChar | RInt8, fixedLen) =>
          val b = it.next().asInstanceOf[Array[Byte]]
          fixedLen match {
            case Some(n) => require(b.length == n, s"fixed array ${f.name}: ${b.length} != $n")
            case None => w.u32(b.length.toLong)
          }
          w.blob(b)
        case RosArray(elem, fixedLen) =>
          val xs = it.next().asInstanceOf[Seq[Any]]
          fixedLen match {
            case Some(n) => require(xs.length == n, s"fixed array ${f.name}: ${xs.length} != $n")
            case None => ()
          }
          val nonPrimitive = elem match {
            case RString | RWString | RTime | RDuration | _: RosMsgRef => true
            case _ => false
          }
          w.scope(flavor.xcdr2 && nonPrimitive) { cw =>
            if (fixedLen.isEmpty) cw.u32(xs.length.toLong)
            elem match {
              case RTime | RDuration => xs.foreach { x =>
                val row = x.asInstanceOf[Row]
                if (flavor.mutable)
                  encodeMutable(bundle, MutableTimeMsg,
                    Iterator(row.getInt(0), row.getInt(1)), cw, flavor)
                else cw.scope(flavor.delimited) { sw =>
                  sw.u32(row.getInt(0).toLong); sw.u32(row.getInt(1).toLong)
                }
              }
              case p: RosPrimitive => xs.foreach(x => encScalar(p, x, cw))
              case ref: RosMsgRef =>
                val sub = bundle.resolve(ref, msg.pkg)
                xs.foreach(x => cw.scope(flavor.delimited)(
                  encodeMsg(bundle, sub, x.asInstanceOf[Row].toSeq.iterator, _, flavor)))
              case _: RosArray =>
                throw new IllegalArgumentException("arrays of arrays are not in the ROS IDL")
            }
          }
      }

  /** Encode one MUTABLE struct value: per-member id headers in schema
    * order (M flag clear — every member here is schema-known). PL_CDR2
    * picks the tightest length code (LC 0–3 by byte length, LC 5 when
    * the member's own leading u32 is its byte count, LC 4 + NEXTINT
    * otherwise); PL_CDR pads each value to a 4-byte multiple with the
    * padding inside the declared length, and terminates with
    * PID_SENTINEL.
    */
  private def encodeMutable(bundle: RosMsgBundle, msg: RosMsgDef,
                            it: Iterator[Any], w: Writer,
                            flavor: CdrFlavor): Unit = {
    val fields = msg.fields.filterNot(_.isConstant)
    // reads the leading u32 LITTLE-endian unconditionally: Writer is
    // LE-only (it always stamps the repLe encapsulation ids), so the
    // member bytes here are LE by construction. If a BE encode mode
    // ever lands, derive this read order from the flavor or LC 5 will
    // silently mislabel member lengths.
    def leadingCount(b: Array[Byte]): Long =
      if (b.length < 4) -1L
      else (b(0) & 0xFFL) | ((b(1) & 0xFFL) << 8) |
        ((b(2) & 0xFFL) << 16) | ((b(3) & 0xFFL) << 24)
    def members(sub: Writer): Unit = fields.zipWithIndex.foreach { case (f, id) =>
      val mv = new Writer(flavor, withHeader = false) // fresh origin: PL_CDR's member origin reset
      encodeField(bundle, msg, f, it, mv, flavor)
      val b = mv.bytes
      if (flavor.xcdr2) {
        val lc = b.length match {
          case 1 => 0
          case 2 => 1
          case 4 => 2
          case 8 => 3
          case n if n > 4 && leadingCount(b) == n - 4 => 5
          case _ => 4
        }
        sub.align(4)
        sub.u32(((lc.toLong & 0x7L) << 28) | (id.toLong & 0x0FFFFFFFL))
        if (lc == 4) sub.u32(b.length.toLong)
        sub.blob(b)
      } else {
        val padded = (b.length + 3) / 4 * 4
        sub.align(4)
        if (id >= 0x3F00 || padded > 0xFFFF) {
          sub.u16(PidExtended); sub.u16(8)
          sub.u32(id.toLong); sub.u32(padded.toLong)
        } else { sub.u16(id); sub.u16(padded) }
        sub.blob(b)
        (b.length until padded).foreach(_ => sub.u8(0))
      }
    }
    if (flavor.xcdr2) w.scope(active = true)(members) // PL_CDR2: DHEADER wrap
    else {
      members(w)
      w.align(4); w.u16(PidSentinel); w.u16(0)
    }
  }

  // numeric values arrive as whatever box the caller had (decode emits
  // Int for narrow types, Long for uint32 — and Rows round-tripped
  // through catalyst can widen); accept any Number of sufficient range
  private def encScalar(p: RosPrimitive, v: Any, w: Writer): Unit = p match {
    case RBool => w.u8(if (v.asInstanceOf[Boolean]) 1 else 0)
    case RInt8 | RByte | RUInt8 | RChar => w.u8(v.asInstanceOf[Number].intValue)
    case RInt16 | RUInt16 => w.u16(v.asInstanceOf[Number].intValue)
    case RInt32 | RUInt32 => w.u32(v.asInstanceOf[Number].longValue)
    case RInt64 | RUInt64 => w.u64(v.asInstanceOf[Number].longValue)
    case RFloat32 => w.u32(java.lang.Float.floatToIntBits(v.asInstanceOf[Number].floatValue).toLong & 0xFFFFFFFFL)
    case RFloat64 => w.u64(java.lang.Double.doubleToLongBits(v.asInstanceOf[Number].doubleValue))
    case RString => w.string(v.asInstanceOf[String])
    case RWString => w.wstring(v.asInstanceOf[String])
    case RTime | RDuration => throw new IllegalStateException("handled by caller")
  }
}
