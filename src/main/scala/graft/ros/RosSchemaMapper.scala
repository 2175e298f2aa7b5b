package graft.ros

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import RosPrimitive._

/** ROS msg-def → flat Spark schema + wire-format decoder.
  *
  * Flattening semantics per reference MessageTable.cpp:263-303: nested
  * messages become `_`-joined top-level columns (prefix join at
  * MessageTable.cpp:300), constants are dropped (MessageTable.cpp:274),
  * time/duration split into `<name>_sec`/`<name>_nsec` INT32 pairs
  * (MessageTable.cpp:284-292).
  *
  * Deviations from the reference, all documented in SURVEY.md §1.2 /
  * Appendix A:
  *  - bool is a real BooleanType (reference corrupts bools via a
  *    buffer-width mismatch, MessageTable.cpp:129-142 vs
  *    TableBuffer.cpp:134-138);
  *  - uint8/uint16 decode unsigned (reference sign-extends through
  *    narrow reads, MessageTable.cpp:136-137,148-149);
  *  - uint32 widens to LongType (reference bit-reinterprets to INT32);
  *  - arrays are MATERIALIZED (uint8[] → BinaryType, primitive[] →
  *    ArrayType, msg[] → ArrayType(StructType)) instead of skipped
  *    (reference MessageTable.cpp:275-277 drops them, README.md:126;
  *    README.md:128-129 invites the extension).
  *
  * Schema build and decode share one traversal shape so column order and
  * value order always align (enforced by RosSchemaMapperSpec).
  */
object RosSchemaMapper {

  def scalarSparkType(p: RosPrimitive): DataType = p match {
    case RBool => BooleanType
    case RInt8 | RByte | RUInt8 | RChar | RInt16 | RUInt16 | RInt32 => IntegerType
    case RUInt32 | RInt64 | RUInt64 => LongType
    case RFloat32 => FloatType
    case RFloat64 => DoubleType
    case RString | RWString => StringType
    case RTime | RDuration =>
      throw new IllegalArgumentException("time/duration split into _sec/_nsec")
  }

  private val secNsecStruct = StructType(Seq(
    StructField("sec", IntegerType, nullable = false),
    StructField("nsec", IntegerType, nullable = false)))

  /** Flattened schema of the message payload (no seqno/connection_id/
    * data — the ETL layer prepends/appends those, reference
    * MessageTable.cpp:326-343).
    */
  def flatSchema(bundle: RosMsgBundle): StructType =
    StructType(schemaFields(bundle, bundle.root, prefix = ""))

  private def join(prefix: String, name: String): String =
    if (prefix.isEmpty) name else s"${prefix}_$name"

  private def schemaFields(bundle: RosMsgBundle, msg: RosMsgDef, prefix: String): Seq[StructField] =
    msg.fields.filterNot(_.isConstant).flatMap { f =>
      val col = join(prefix, f.name)
      f.tpe match {
        case RTime | RDuration =>
          Seq(StructField(s"${col}_sec", IntegerType, nullable = false),
              StructField(s"${col}_nsec", IntegerType, nullable = false))
        case p: RosPrimitive =>
          Seq(StructField(col, scalarSparkType(p), nullable = false))
        case ref: RosMsgRef =>
          schemaFields(bundle, bundle.resolve(ref, msg.pkg), col)
        case RosArray(RUInt8 | RByte | RChar | RInt8, _) =>
          Seq(StructField(col, BinaryType, nullable = false))
        case RosArray(RTime | RDuration, _) =>
          Seq(StructField(col, ArrayType(secNsecStruct, containsNull = false), nullable = false))
        case RosArray(p: RosPrimitive, _) =>
          Seq(StructField(col, ArrayType(scalarSparkType(p), containsNull = false), nullable = false))
        case RosArray(ref: RosMsgRef, _) =>
          val elem = StructType(schemaFields(bundle, bundle.resolve(ref, msg.pkg), prefix = ""))
          Seq(StructField(col, ArrayType(elem, containsNull = false), nullable = false))
        case RosArray(_: RosArray, _) =>
          throw new IllegalArgumentException("arrays of arrays are not in the ROS IDL")
      }
    }

  /** Decode one serialized message into values aligned with
    * `flatSchema`. Little-endian walk mirroring reference
    * MessageTable.cpp:40-225 (handleMessage/handleBuiltin), with the
    * full-consumption assert of MessageTable.cpp:38.
    */
  def decode(bundle: RosMsgBundle, bytes: Array[Byte]): Seq[Any] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val out = scala.collection.mutable.ArrayBuffer[Any]()
    decodeMsg(bundle, bundle.root, buf, out)
    require(!buf.hasRemaining,
      s"decode did not consume buffer: ${buf.remaining} bytes left of ${bytes.length}")
    out.toSeq
  }

  private def decodeMsg(bundle: RosMsgBundle, msg: RosMsgDef, buf: ByteBuffer,
                        out: scala.collection.mutable.ArrayBuffer[Any]): Unit =
    msg.fields.filterNot(_.isConstant).foreach { f =>
      f.tpe match {
        case RTime | RDuration =>
          out += buf.getInt(); out += buf.getInt()
        case p: RosPrimitive =>
          out += decodeScalar(p, buf)
        case ref: RosMsgRef =>
          decodeMsg(bundle, bundle.resolve(ref, msg.pkg), buf, out)
        case RosArray(RUInt8 | RByte | RChar | RInt8, fixedLen) =>
          val n = fixedLen.getOrElse(readLen(buf))
          val arr = new Array[Byte](n); buf.get(arr); out += arr
        case RosArray(RTime | RDuration, fixedLen) =>
          val n = fixedLen.getOrElse(readLen(buf))
          out += Seq.fill(n)(Row(buf.getInt(), buf.getInt()))
        case RosArray(p: RosPrimitive, fixedLen) =>
          val n = fixedLen.getOrElse(readLen(buf))
          out += Seq.fill(n)(decodeScalar(p, buf))
        case RosArray(ref: RosMsgRef, fixedLen) =>
          val n = fixedLen.getOrElse(readLen(buf))
          val sub = bundle.resolve(ref, msg.pkg)
          out += Seq.fill(n) {
            val vals = scala.collection.mutable.ArrayBuffer[Any]()
            decodeMsg(bundle, sub, buf, vals)
            Row.fromSeq(vals.toSeq)
          }
        case RosArray(_: RosArray, _) =>
          throw new IllegalArgumentException("arrays of arrays are not in the ROS IDL")
      }
    }

  private def readLen(buf: ByteBuffer): Int = {
    val n = buf.getInt()
    require(n >= 0, s"negative array/string length $n")
    n
  }

  private def decodeScalar(p: RosPrimitive, buf: ByteBuffer): Any = p match {
    case RBool    => buf.get() != 0
    case RInt8 | RByte => buf.get().toInt                    // signed widen
    case RUInt8 | RChar => java.lang.Byte.toUnsignedInt(buf.get())
    case RInt16   => buf.getShort().toInt
    case RUInt16  => java.lang.Short.toUnsignedInt(buf.getShort())
    case RInt32   => buf.getInt()
    case RUInt32  => java.lang.Integer.toUnsignedLong(buf.getInt())
    case RInt64   => buf.getLong()
    case RUInt64  => buf.getLong()                           // reinterpret (doc'd)
    case RFloat32 => buf.getFloat()
    case RFloat64 => buf.getDouble()
    case RString  =>
      val n = readLen(buf)
      val arr = new Array[Byte](n); buf.get(arr)
      new String(arr, StandardCharsets.UTF_8)
    case RWString =>
      // wstring is a ROS 2 IDL type; it has NO ROS 1 wire form — a
      // definition claiming one is not a ROS 1 message
      throw new IllegalArgumentException(
        "wstring is not a ROS 1 wire type (ros2 CDR decodes it)")
    case RTime | RDuration =>
      throw new IllegalStateException("handled by caller")
  }

  /** Encode values (aligned with flatSchema order for scalars/arrays as
    * produced by `decode`) back to wire bytes — used by tests and the
    * fixture bag writer for round-trip properties.
    */
  def encode(bundle: RosMsgBundle, values: Seq[Any]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val it = values.iterator
    encodeMsg(bundle, bundle.root, it, bos)
    require(!it.hasNext, "encode did not consume all values")
    bos.toByteArray
  }

  private def writeLE(bos: java.io.ByteArrayOutputStream, bytes: Int, v: Long): Unit = {
    var i = 0
    while (i < bytes) { bos.write(((v >> (8 * i)) & 0xFF).toInt); i += 1 }
  }

  private def encodeMsg(bundle: RosMsgBundle, msg: RosMsgDef, it: Iterator[Any],
                        bos: java.io.ByteArrayOutputStream): Unit =
    msg.fields.filterNot(_.isConstant).foreach { f =>
      f.tpe match {
        case RTime | RDuration =>
          // Number, not Int: values may arrive from the CDR decoder
          // (builtin_interfaces/Time's uint32 nanosec boxes as Long)
          // or catalyst-widened Rows — same tolerance as CdrCodec
          writeLE(bos, 4, it.next().asInstanceOf[Number].longValue)
          writeLE(bos, 4, it.next().asInstanceOf[Number].longValue)
        case p: RosPrimitive => encodeScalar(p, it.next(), bos)
        case ref: RosMsgRef  => encodeMsg(bundle, bundle.resolve(ref, msg.pkg), it, bos)
        case RosArray(RUInt8 | RByte | RChar | RInt8, fixedLen) =>
          val arr = it.next().asInstanceOf[Array[Byte]]
          if (fixedLen.isEmpty) writeLE(bos, 4, arr.length.toLong)
          bos.write(arr)
        case RosArray(RTime | RDuration, fixedLen) =>
          val rows = it.next().asInstanceOf[Seq[Row]]
          if (fixedLen.isEmpty) writeLE(bos, 4, rows.length.toLong)
          rows.foreach { r =>
            writeLE(bos, 4, r.get(0).asInstanceOf[Number].longValue)
            writeLE(bos, 4, r.get(1).asInstanceOf[Number].longValue)
          }
        case RosArray(p: RosPrimitive, fixedLen) =>
          val vals = it.next().asInstanceOf[Seq[Any]]
          if (fixedLen.isEmpty) writeLE(bos, 4, vals.length.toLong)
          vals.foreach(v => encodeScalar(p, v, bos))
        case RosArray(ref: RosMsgRef, fixedLen) =>
          val rows = it.next().asInstanceOf[Seq[Row]]
          if (fixedLen.isEmpty) writeLE(bos, 4, rows.length.toLong)
          val sub = bundle.resolve(ref, msg.pkg)
          rows.foreach(r => encodeMsg(bundle, sub, r.toSeq.iterator, bos))
        case RosArray(_: RosArray, _) =>
          throw new IllegalArgumentException("arrays of arrays are not in the ROS IDL")
      }
    }

  // numeric values arrive as whatever box the caller had (the CDR
  // decoder emits Long for uint32, Int for narrow types; catalyst
  // Rows can widen) — accept any Number of sufficient range, exactly
  // as CdrCodec.encScalar does
  private def encodeScalar(p: RosPrimitive, v: Any, bos: java.io.ByteArrayOutputStream): Unit = p match {
    case RBool    => bos.write(if (v.asInstanceOf[Boolean]) 1 else 0)
    case RInt8 | RByte | RUInt8 | RChar => writeLE(bos, 1, v.asInstanceOf[Number].longValue)
    case RInt16 | RUInt16 => writeLE(bos, 2, v.asInstanceOf[Number].longValue)
    case RInt32   => writeLE(bos, 4, v.asInstanceOf[Number].longValue)
    case RUInt32  => writeLE(bos, 4, v.asInstanceOf[Number].longValue)
    case RInt64 | RUInt64 => writeLE(bos, 8, v.asInstanceOf[Number].longValue)
    case RFloat32 => writeLE(bos, 4, java.lang.Float.floatToIntBits(v.asInstanceOf[Number].floatValue).toLong & 0xFFFFFFFFL)
    case RFloat64 => writeLE(bos, 8, java.lang.Double.doubleToLongBits(v.asInstanceOf[Number].doubleValue))
    case RString  =>
      val b = v.asInstanceOf[String].getBytes(StandardCharsets.UTF_8)
      writeLE(bos, 4, b.length.toLong); bos.write(b)
    case RWString => throw new IllegalArgumentException(
      "wstring is not a ROS 1 wire type (ros2 CDR encodes it)")
    case RTime | RDuration => throw new IllegalStateException("handled by caller")
  }
}
