package graft.ros.mcap

import graft.ros.RosMsgBundle

/** The one place the engine maps an MCAP schema encoding onto a typed
  * decode path. Three of the well-known registry encodings flatten to
  * columns: `ros2msg`/`ros2idl` (schema text → MsgDefParser/IDL,
  * payloads CDR), `protobuf` (schema bytes → FileDescriptorSet,
  * payloads protobuf wire format), and `ros1msg` (ROS1 .msg text,
  * payloads ros1 serialization — the channels a bag→mcap convert
  * produces, so a normalized fleet archive's ros1-era recordings stay
  * typed-readable). All route through the SAME RosMsgBundle frame, so
  * `RosSchemaMapper.flatSchema` — and everything above it: typed
  * reads, ETL tables, queries — is encoding-agnostic.
  */
object McapPayload {

  /** Schema encodings the engine can flatten. Channels under any other
    * encoding (jsonschema, flatbuffer, …) are retained as RawMessages
    * bytes by the ETL and refused by typed reads — honest, loud.
    */
  val typedEncodings: Set[String] =
    Set("ros1msg", "ros2msg", "ros2idl", "protobuf")

  /** The message encoding a schema encoding's decoder consumes, None
    * for encodings the engine cannot flatten.
    */
  def messageEncodingOpt(schemaEncoding: String): Option[String] =
    schemaEncoding match {
      case "ros2msg" | "ros2idl" => Some("cdr")
      case "ros1msg" => Some("ros1")
      case "protobuf" => Some("protobuf")
      case _ => None
    }

  /** The message encoding a channel must declare for its schema
    * encoding's decoder — a mismatched pair is container drift.
    */
  def messageEncodingFor(schemaEncoding: String): String =
    messageEncodingOpt(schemaEncoding).getOrElse(throw
      new IllegalArgumentException(
        s"no typed decode for schema encoding '$schemaEncoding' " +
          s"(supported: ${typedEncodings.toSeq.sorted.mkString(", ")})"))

  /** The flattening frame for a schema record. */
  def bundle(schemaEncoding: String, name: String, data: Array[Byte]): RosMsgBundle =
    schemaEncoding match {
      case "ros2msg" =>
        Ros2Msg.bundle(name, new String(data, java.nio.charset.StandardCharsets.UTF_8))
      case "ros2idl" =>
        Ros2Idl.bundle(name, new String(data, java.nio.charset.StandardCharsets.UTF_8))
      case "ros1msg" =>
        graft.ros.MsgDefParser.parse(name,
          new String(data, java.nio.charset.StandardCharsets.UTF_8))
      case "protobuf" =>
        ProtoDescriptor.bundle(name, ProtoDescriptor.parseSet(data))
      case other => throw new IllegalArgumentException(
        s"no typed decode for schema encoding '$other'")
    }

  /** The exact WIRE layout of a bundle's walk — primitive widths,
    * array bounds, nesting — with the ros1 aliases normalized
    * (byte≡int8, char≡uint8 on the wire). Two bundles with equal
    * signatures (and the same decoder family) decode each other's
    * payloads byte-for-byte: what lets a typed read auto-merge
    * semantically equivalent definition VARIANTS (the same type
    * carried as ros2msg text in one file and generated IDL in
    * another). NOT sufficient for protobuf (field numbers live in the
    * descriptor, not the walk).
    */
  def wireSignature(bundle: RosMsgBundle): String = {
    import graft.ros._
    import graft.ros.RosPrimitive._
    val sb = new StringBuilder
    def prim(p: RosPrimitive): String = p match {
      case RByte => "int8"
      case RChar => "uint8"
      case other => other.name
    }
    def walk(msg: RosMsgDef, depth: Int): Unit = {
      require(depth < 64, s"message nesting too deep in ${msg.fullName}")
      msg.fields.filterNot(_.isConstant).foreach { f =>
        def one(t: RosType): Unit = t match {
          case p: RosPrimitive => sb.append(prim(p)).append(';')
          case ref: RosMsgRef =>
            sb.append('{'); walk(bundle.resolve(ref, msg.pkg), depth + 1)
            sb.append('}')
          case RosArray(elem, fl) =>
            sb.append('[').append(fl.getOrElse(-1)); one(elem); sb.append(']')
        }
        one(f.tpe)
      }
    }
    walk(bundle.root, 0)
    sb.toString
  }

  /** Per-message decoder aligned with `flatSchema(bundle(...))`. Built
    * once per (schema, partition) — the parse cost is per-task, the
    * per-message cost is the walk alone.
    */
  def decoder(schemaEncoding: String, name: String,
              data: Array[Byte]): Array[Byte] => Seq[Any] =
    schemaEncoding match {
      case "ros2msg" | "ros2idl" =>
        val b = bundle(schemaEncoding, name, data)
        bytes => CdrCodec.decode(b, bytes)
      case "ros1msg" =>
        val b = bundle(schemaEncoding, name, data)
        bytes => graft.ros.RosSchemaMapper.decode(b, bytes)
      case "protobuf" =>
        val set = ProtoDescriptor.parseSet(data)
        ProtoDescriptor.bundle(name, set) // validate flattenability up front
        bytes => ProtoCodec.decode(set, name, bytes)
      case other => throw new IllegalArgumentException(
        s"no typed decode for schema encoding '$other'")
    }
}
