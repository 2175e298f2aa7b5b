package graft.ros

/** ROS message type system + message-definition parser.
  *
  * Re-implements in pure Scala what the reference delegates to
  * ros_type_introspection (reference MessageTable.cpp:316-320;
  * dependency it wants to drop per rosbag2parquet.cpp:17-18,
  * README.md:136). Primitive wire formats per reference utils.h:26-55:
  * little-endian; string = uint32-length-prefixed bytes; time = 2x
  * uint32 (sec, nsec); duration = 2x int32; arrays fixed `[N]` or
  * uint32-length-prefixed `[]`.
  */
sealed trait RosType

sealed abstract class RosPrimitive(val name: String, val wireSize: Int) extends RosType
object RosPrimitive {
  case object RBool    extends RosPrimitive("bool", 1)
  case object RInt8    extends RosPrimitive("int8", 1)
  case object RUInt8   extends RosPrimitive("uint8", 1)
  case object RByte    extends RosPrimitive("byte", 1)    // alias of int8 (legacy)
  case object RChar    extends RosPrimitive("char", 1)    // alias of uint8 (legacy)
  case object RInt16   extends RosPrimitive("int16", 2)
  case object RUInt16  extends RosPrimitive("uint16", 2)
  case object RInt32   extends RosPrimitive("int32", 4)
  case object RUInt32  extends RosPrimitive("uint32", 4)
  case object RInt64   extends RosPrimitive("int64", 8)
  case object RUInt64  extends RosPrimitive("uint64", 8)
  case object RFloat32 extends RosPrimitive("float32", 4)
  case object RFloat64 extends RosPrimitive("float64", 8)
  case object RString  extends RosPrimitive("string", -1)   // var-length
  // ROS 2 IDL only (DDS CHAR16 string; UTF-16 on the wire, exposed as
  // a UTF-8 Spark string) — never a ROS 1 wire type: the ros1
  // decode/encode paths refuse it loudly
  case object RWString extends RosPrimitive("wstring", -1)  // var-length
  case object RTime    extends RosPrimitive("time", 8)
  case object RDuration extends RosPrimitive("duration", 8)

  val all: Seq[RosPrimitive] = Seq(RBool, RInt8, RUInt8, RByte, RChar,
    RInt16, RUInt16, RInt32, RUInt32, RInt64, RUInt64, RFloat32, RFloat64,
    RString, RWString, RTime, RDuration)
  val byName: Map[String, RosPrimitive] = all.map(p => p.name -> p).toMap
}

/** Array of `elem`; `fixedLen` = Some(n) for `[n]`, None for `[]`
  * (uint32-length-prefixed on the wire) — reference MessageTable.cpp:365-391
  * (RemoveArray) and decode skip logic MessageTable.cpp:62-97.
  */
final case class RosArray(elem: RosType, fixedLen: Option[Int]) extends RosType

/** Reference to another message type, resolved against a registry. */
final case class RosMsgRef(pkg: Option[String], name: String) extends RosType {
  def fullName: String = pkg.map(_ + "/").getOrElse("") + name
}

final case class RosField(name: String, tpe: RosType, constantValue: Option[String]) {
  def isConstant: Boolean = constantValue.isDefined
}

final case class RosMsgDef(fullName: String, fields: Seq[RosField]) {
  def pkg: Option[String] = fullName.split("/") match {
    case Array(p, _) => Some(p)
    case _           => None
  }
}

/** Parsed bundle: root message + all dependent definitions (the `===`
  * separated blocks carried in bag connection records — reference
  * MessageTable.cpp:354 skips them in pretty-print; rosbag stores the
  * full dependency closure in the `message_definition` header field).
  */
final case class RosMsgBundle(root: RosMsgDef, deps: Map[String, RosMsgDef]) {
  /** Resolve a message reference per ROS rules: exact full name, then
    * same-package as the referencing type, then `std_msgs/Header` for
    * the bare `Header` shorthand, then unique short-name match.
    */
  def resolve(ref: RosMsgRef, fromPkg: Option[String]): RosMsgDef = {
    val all = deps + (root.fullName -> root)
    ref.pkg.flatMap(p => all.get(s"$p/${ref.name}"))
      .orElse(fromPkg.flatMap(p => all.get(s"$p/${ref.name}")))
      .orElse(if (ref.name == "Header") all.get("std_msgs/Header") else None)
      .orElse {
        val short = all.values.filter(_.fullName.split("/").last == ref.name).toSeq
        if (short.size == 1) Some(short.head) else None
      }
      .getOrElse(throw new IllegalArgumentException(
        s"unresolved message type ${ref.fullName} (from pkg $fromPkg)"))
  }
}

object MsgDefParser {
  private val Separator = "^=+$".r

  /** Parse a full message_definition text (root block + `===`-separated
    * dependent blocks, each headed by `MSG: <full/Name>`).
    */
  def parse(rootTypeName: String, definition: String): RosMsgBundle = {
    val blocks = splitBlocks(definition)
    val root = parseBlock(rootTypeName, blocks.head._2)
    val deps = blocks.tail.map { case (name, lines) =>
      val n = name.getOrElse(throw new IllegalArgumentException("dependent block without MSG: header"))
      n -> parseBlock(n, lines)
    }.toMap
    RosMsgBundle(root, deps)
  }

  private def splitBlocks(text: String): Seq[(Option[String], Seq[String])] = {
    val result = scala.collection.mutable.ArrayBuffer[(Option[String], scala.collection.mutable.ArrayBuffer[String])]()
    result += ((None, scala.collection.mutable.ArrayBuffer[String]()))
    for (raw <- text.linesIterator) {
      val line = raw
      if (Separator.matches(line.trim) && line.trim.length >= 3) {
        result += ((None, scala.collection.mutable.ArrayBuffer[String]()))
      } else if (line.trim.startsWith("MSG:")) {
        val name = line.trim.stripPrefix("MSG:").trim
        val last = result.last
        result(result.size - 1) = (Some(name), last._2)
      } else {
        result.last._2 += line
      }
    }
    result.toSeq.map { case (n, ls) => (n, ls.toSeq) }
  }

  /** Parse one block's field lines. Comment/blank lines dropped
    * (reference MessageTable.cpp:346-358's filtering); constants kept in
    * the AST but flagged (schema layer drops them — MessageTable.cpp:274,
    * decode skips them — MessageTable.cpp:58).
    */
  def parseBlock(fullName: String, lines: Seq[String]): RosMsgDef = {
    val fields = lines.flatMap { raw =>
      val noComment = stripComment(raw)
      val line = noComment.trim
      if (line.isEmpty) None
      else {
        val firstSpace = line.indexWhere(c => c == ' ' || c == '\t')
        require(firstSpace > 0, s"malformed field line in $fullName: '$raw'")
        val typeStr = line.substring(0, firstSpace)
        val rest = line.substring(firstSpace).trim
        val (tpe, base) = parseType(typeStr)
        // constant: `<type> NAME=value`; for string constants the value
        // is the raw remainder INCLUDING '#' (ROS spec), so re-derive
        // from the uncommented line.
        val eq = rest.indexOf('=')
        if (eq >= 0) {
          val cname = rest.substring(0, eq).trim
          val cval =
            if (base == RosPrimitive.RString) {
              val origRest = raw.trim.substring(firstSpace).trim
              origRest.substring(origRest.indexOf('=') + 1).trim
            } else rest.substring(eq + 1).trim
          Some(RosField(cname, tpe, Some(cval)))
        } else Some(RosField(rest, tpe, None))
      }
    }
    RosMsgDef(fullName, fields)
  }

  /** Debug pretty-print of a message definition: drop blank lines and
    * comment lines, stop at the first `===` separator — reference
    * MessageTable.cpp:346-358 (O20).
    */
  def prettyPrint(definition: String): String =
    definition.linesIterator
      .takeWhile(l => !Separator.matches(l.trim) || l.trim.length < 3)
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .mkString("\n")

  /** '#' starts a comment unless inside a string constant (handled by
    * caller); good enough for the msg IDL.
    */
  private def stripComment(line: String): String = {
    val i = line.indexOf('#')
    if (i < 0) line else line.substring(0, i)
  }

  /** `float64[9]` → (RosArray(RFloat64, Some(9)), RFloat64), etc.
    * One suffix level only — arrays-of-arrays are not in the IDL
    * (reference MessageTable.cpp:82).
    */
  def parseType(s: String): (RosType, RosType) = {
    val (baseStr, arr) =
      if (s.endsWith("[]")) (s.dropRight(2), Some(None))
      else if (s.endsWith("]")) {
        val i = s.lastIndexOf('[')
        require(i > 0, s"malformed type $s")
        (s.substring(0, i), Some(Some(s.substring(i + 1, s.length - 1).trim.toInt)))
      } else (s, None)
    val base: RosType = RosPrimitive.byName.getOrElse(baseStr, {
      baseStr.split("/") match {
        case Array(p, n) => RosMsgRef(Some(p), n)
        case Array(n)    => RosMsgRef(None, n)
        case _ => throw new IllegalArgumentException(s"malformed type $s")
      }
    })
    arr match {
      case Some(len) => (RosArray(base, len), base)
      case None      => (base, base)
    }
  }
}
