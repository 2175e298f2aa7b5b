package graft.ros.mcap

import graft.ros._
import graft.ros.RosPrimitive._

/** `ros2idl` message definitions → the shared [[RosMsgBundle]] frame.
  *
  * ROS 2 tooling ships every .msg as a generated OMG IDL file
  * (rosidl_adapter), and newer recordings (Iron+, and many MCAP
  * writers) store THAT text in message_definitions / Schema records
  * under encoding "ros2idl" instead of "ros2msg". The wire format is
  * still CDR, so typed reads only need the schema translated — this
  * parser covers the rosidl-generated IDL subset:
  *
  *  - `module pkg { module msg { struct Type { ... }; }; };` nesting
  *    (constants modules `*_Constants` skipped — constants are not on
  *    the wire);
  *  - comments, `@annotations` (verbatim/unit/default), typedefs
  *    (rosidl emits fixed arrays through typedefs:
  *    `typedef double double__9[9];`);
  *  - primitives in BOTH spellings (IDL 4.x `int16`/`uint64`/... and
  *    classic `short`/`unsigned long long`/...), `octet`/`char` →
  *    uint8 (ROS 2 semantics), `boolean`, `float`/`double`;
  *  - `string` / bounded `string<N>` (same CDR layout), `sequence<T>`
  *    / bounded `sequence<T, N>` (same CDR layout), fixed arrays
  *    `T name[N]`;
  *  - scoped references `pkg::msg::Type` → the bundle's `pkg/Type`
  *    names (same collapse as ros2msg's three-segment names);
  *  - `wstring` (bounded or not) → the RWString primitive, decoded
  *    per XTypes as UTF-16 (round 17; previously refused);
  *    `wchar`/`long double` still rejected loudly (2-byte char /
  *    128-bit payloads need a decode policy, not silent mojibake).
  *
  * Multi-type closures arrive as blocks separated by `===` lines, each
  * headed by `IDL: pkg/msg/Type` (the rosbag2/MCAP concatenation
  * convention); a headerless first block is the root. The
  * builtin_interfaces Time/Duration structs are injected when a
  * reference needs them and no block defines them — the same
  * well-known-omission rule as [[Ros2Msg.bundle]].
  */
object Ros2Idl {

  private val Separator = "^=+$".r

  def bundle(schemaName: String, idlText: String): RosMsgBundle = {
    val root = collapse(schemaName)
    // the `===` separators and `IDL: <name>` headers of a concatenated
    // closure are pure noise to the parser: every struct's name comes
    // from its own module nesting, so the whole text parses as one
    // stream (a header that disagreed with its block's modules could
    // not change anything anyway)
    val body = idlText.linesIterator.filterNot { line =>
      val t = line.trim
      (Separator.matches(t) && t.length >= 3) || t.startsWith("IDL:")
    }.mkString("\n")
    val defs = scala.collection.mutable.Map[String, RosMsgDef]()
    parseBlock(body).foreach(d => defs(d.fullName) = d)
    val rootDef = defs.getOrElse(root, throw new IllegalArgumentException(
      s"ros2idl definition does not declare $root " +
        s"(declares: ${defs.keys.toSeq.sorted.mkString(", ")})"))
    // well-known omission: inject builtin time structs when referenced
    // but not carried in the closure
    for ((nm, fields) <- Seq(
        "builtin_interfaces/Time" -> Seq(
          RosField("sec", RInt32, None), RosField("nanosec", RUInt32, None)),
        "builtin_interfaces/Duration" -> Seq(
          RosField("sec", RInt32, None), RosField("nanosec", RUInt32, None))))
      if (!defs.contains(nm)) defs(nm) = RosMsgDef(nm, fields)
    RosMsgBundle(rootDef, (defs - root).toMap)
  }

  /** "pkg/msg/Type" or "pkg::msg::Type" → "pkg/Type". */
  private def collapse(name: String): String =
    name.replace("::", "/").split("/") match {
      case Array(pkg, "msg", tpe) => s"$pkg/$tpe"
      case Array(pkg, tpe) => s"$pkg/$tpe"
      case other => other.mkString("/")
    }

  /** Parse one IDL file's structs (fully-qualified via module nesting). */
  private def parseBlock(text: String): Seq[RosMsgDef] = {
    val tokens = tokenize(text)
    val out = scala.collection.mutable.ArrayBuffer[RosMsgDef]()
    val typedefs = scala.collection.mutable.Map[String, RosType]()
    var i = 0
    def parseScope(modulePath: List[String]): Unit = {
      while (i < tokens.length && tokens(i) != "}") {
        tokens(i) match {
          case "module" =>
            val name = tokens(i + 1)
            require(tokens(i + 2) == "{", s"expected '{' after module $name")
            i += 3
            if (name.endsWith("_Constants")) skipBalanced()
            else { parseScope(modulePath :+ name); expect("}"); expectOpt(";") }
          case "struct" =>
            val name = tokens(i + 1)
            require(tokens(i + 2) == "{", s"expected '{' after struct $name")
            i += 3
            out += parseStruct(fqName(modulePath, name), typedefs)
            expect("}"); expectOpt(";")
          case "typedef" =>
            i += 1
            val (tpe, _) = parseType(typedefs)
            val alias = tokens(i); i += 1
            // rosidl emits fixed arrays through typedefs with the
            // suffix on the ALIAS: `typedef double double__9[9];`
            val full = if (tokens(i) == "[") {
              expect("["); val n = tokens(i).toInt; i += 1; expect("]")
              tpe match {
                case _: RosArray => throw new IllegalArgumentException(
                  s"typedef $alias: array of array")
                case t => RosArray(t, Some(n))
              }
            } else tpe
            typedefs(alias) = full
            expect(";")
          case "const" => // constants outside _Constants modules: skip the statement
            while (i < tokens.length && tokens(i) != ";") i += 1
            expect(";")
          case other => throw new IllegalArgumentException(
            s"unexpected token '$other' at IDL top level")
        }
      }
    }
    def skipBalanced(): Unit = {
      var depth = 1
      while (depth > 0) {
        if (tokens(i) == "{") depth += 1
        else if (tokens(i) == "}") depth -= 1
        i += 1
      }
      expectOpt(";")
    }
    def expect(t: String): Unit = {
      require(i < tokens.length && tokens(i) == t,
        s"expected '$t', got '${if (i < tokens.length) tokens(i) else "<eof>"}'")
      i += 1
    }
    def expectOpt(t: String): Unit = if (i < tokens.length && tokens(i) == t) i += 1

    def parseStruct(full: String,
        tds: scala.collection.mutable.Map[String, RosType]): RosMsgDef = {
      val fields = scala.collection.mutable.ArrayBuffer[RosField]()
      while (tokens(i) != "}") {
        val (tpe, _) = parseType(tds)
        val name = tokens(i); i += 1
        val withArr = if (tokens(i) == "[") {
          expect("["); val n = tokens(i).toInt; i += 1; expect("]")
          tpe match {
            case _: RosArray => throw new IllegalArgumentException(
              s"array of array at field $name")
            case t => RosArray(t, Some(n))
          }
        } else tpe
        expect(";")
        fields += RosField(name, withArr, None)
      }
      RosMsgDef(full, fields.toSeq)
    }

    /** Parse a type at the cursor; returns (type, consumedName). */
    def parseType(tds: scala.collection.mutable.Map[String, RosType]): (RosType, String) = {
      val t0 = tokens(i); i += 1
      t0 match {
        case "sequence" =>
          expect("<")
          val (elem, _) = parseType(tds)
          if (tokens(i) == ",") { i += 1; i += 1 } // bound: same CDR layout
          expect(">")
          elem match {
            case _: RosArray => throw new IllegalArgumentException("sequence of array")
            case e => (RosArray(e, None), "sequence")
          }
        case "string" | "wstring" =>
          if (tokens(i) == "<") { // bounded: same CDR layout
            expect("<"); i += 1; expect(">")
          }
          if (t0 == "string") (RString, "string") else (RWString, "wstring")
        case "unsigned" =>
          val t1 = tokens(i); i += 1
          t1 match {
            case "short" => (RUInt16, "unsigned short")
            case "long" =>
              if (tokens(i) == "long") { i += 1; (RUInt64, "unsigned long long") }
              else (RUInt32, "unsigned long")
            case other => throw new IllegalArgumentException(s"unsigned $other")
          }
        case "long" =>
          if (tokens(i) == "long") { i += 1; (RInt64, "long long") }
          else if (tokens(i) == "double") throw new IllegalArgumentException(
            "long double fields are not supported (128-bit wire payload)")
          else (RInt32, "long")
        case "short" => (RInt16, "short")
        case "boolean" => (RBool, "boolean")
        case "octet" | "char" | "uint8" => (RUInt8, t0)
        case "wchar" => throw new IllegalArgumentException(
          "wchar fields are not supported (UTF-16 wire payload)")
        case "int8" => (RInt8, t0)
        case "int16" => (RInt16, t0)
        case "uint16" => (RUInt16, t0)
        case "int32" => (RInt32, t0)
        case "uint32" => (RUInt32, t0)
        case "int64" => (RInt64, t0)
        case "uint64" => (RUInt64, t0)
        case "float" => (RFloat32, t0)
        case "double" => (RFloat64, t0)
        case name if tds.contains(name) => (tds(name), name)
        case name =>
          // scoped reference pkg::msg::Type (tokenizer keeps :: tokens)
          val parts = scala.collection.mutable.ArrayBuffer(name)
          while (i + 1 < tokens.length && tokens(i) == "::") {
            i += 1; parts += tokens(i); i += 1
          }
          val fq = collapse(parts.mkString("::"))
          fq.split("/") match {
            case Array(pkg, tpe) => (RosMsgRef(Some(pkg), tpe), fq)
            case Array(tpe) => (RosMsgRef(None, tpe), fq)
            case _ => throw new IllegalArgumentException(s"malformed type reference $fq")
          }
      }
    }

    parseScope(Nil)
    out.toSeq
  }

  private def fqName(modulePath: List[String], struct: String): String =
    collapse((modulePath :+ struct).mkString("::"))

  /** Comment/annotation-stripping tokenizer: identifiers/numbers,
    * punctuation `{ } < > [ ] ; , =` and `::` as standalone tokens.
    * Annotations (`@verbatim (language="comment", text="...")`,
    * `@default (value=5)`, `@unit (...)`, bare `@key`) are dropped
    * WHOLE — the paren group is matched quote-aware and may span
    * lines, which rosidl's generated verbatim comments routinely do.
    */
  private def tokenize(text: String): Vector[String] = {
    val noBlock = "/\\*[\\s\\S]*?\\*/".r.replaceAllIn(text, " ")
    val s = noBlock.linesIterator.map { l =>
      // rosidl files open with `#include "dep.idl"` preprocessor lines
      // — the dependency closure arrives as separate IDL: blocks, so
      // the include itself is noise
      if (l.trim.startsWith("#")) ""
      else l.indexOf("//") match {
        case -1 => l
        case j => l.substring(0, j)
      }
    }.mkString("\n")
    val buf = scala.collection.mutable.ArrayBuffer[String]()
    var k = 0
    while (k < s.length) {
      val c = s(k)
      if (c == '@') {
        k += 1
        while (k < s.length && (s(k).isLetterOrDigit || s(k) == '_')) k += 1
        while (k < s.length && s(k).isWhitespace) k += 1
        if (k < s.length && s(k) == '(') {
          var depth = 1; var inStr = false
          k += 1
          while (k < s.length && depth > 0) {
            val ch = s(k)
            if (inStr) {
              if (ch == '\\') k += 1
              else if (ch == '"') inStr = false
            } else {
              if (ch == '"') inStr = true
              else if (ch == '(') depth += 1
              else if (ch == ')') depth -= 1
            }
            k += 1
          }
        }
      } else if (c == '"') {
        // string LITERAL (constants): one token, so braces/semicolons
        // inside it (`const string E = ":-};"`) can never unbalance
        // the scope math or cut a const-skip short
        val start = k
        k += 1
        while (k < s.length && s(k) != '"') {
          if (s(k) == '\\') k += 1
          k += 1
        }
        k = math.min(k + 1, s.length)
        buf += s.substring(start, k)
      } else if (c.isWhitespace) k += 1
      else if (c == ':' && k + 1 < s.length && s(k + 1) == ':') {
        buf += "::"; k += 2
      } else if ("{}<>[];,=".contains(c)) { buf += c.toString; k += 1 }
      else {
        val start = k
        while (k < s.length && !s(k).isWhitespace &&
          !"{}<>[];,=:@\"".contains(s(k))) k += 1
        if (k > start) buf += s.substring(start, k)
        else k += 1 // stray ':' outside '::'
      }
    }
    buf.toVector
  }
}
