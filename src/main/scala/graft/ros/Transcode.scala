package graft.ros

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import RosPrimitive._

/** Typed CROSS-DIALECT transcode: ros1-serialized payloads re-encoded
  * as CDR so a rosbag1-era fleet normalizes into a genuinely
  * `ros2`-profile archive instead of byte-embedding foreign rows.
  *
  * This is the Spark analog of the reference's whole reason to exist —
  * wire-format decode (reference MessageTable.cpp:110-225) — pointed
  * at the WRITE side: each row whose `encoding` is "ros1" decodes
  * through [[RosSchemaMapper.decode]] under its ros1msg definition and
  * re-encodes through [[graft.ros.mcap.CdrCodec.encode]] under the
  * TRANSLATED ros2msg definition. The translation ros1msg → ros2msg is
  * near-syntactic (the two grammars share field syntax):
  *
  *   - `time` → `builtin_interfaces/Time`, `duration` →
  *     `builtin_interfaces/Duration` (ROS 2 has no time primitives;
  *     the builtin blocks are appended to the dependency closure);
  *   - `byte` → `int8`, `char` → `uint8` (the ROS 1 alias semantics —
  *     ROS 2 re-aliased both to uint8, so keeping the names would
  *     flip `byte`'s signedness);
  *   - bare `Header` → `std_msgs/Header` (the ROS 1 shorthand);
  *   - type names `pkg/Type` → `pkg/msg/Type` (the ROS 2 namespace
  *     convention mcap Schema records use);
  *   - everything else verbatim — field order, array bounds, constants
  *     (all wire-neutral).
  *
  * Fidelity over migration: a ros1 `std_msgs/Header` keeps its `seq`
  * field (real ROS 2 dropped it). The translated definition travels in
  * the output's own Schema record, so schema-text-driven readers (this
  * engine, and any mcap consumer honoring the spec's embedded schemas)
  * decode every field; a consumer substituting its locally compiled
  * `std_msgs/Header` would misread — dropping `seq` instead would
  * silently lose data, the worse default for an archival engine.
  *
  * Translations are VALIDATED structurally before use: the ros1 decode
  * walk and the ros2 encode walk must consume the identical value
  * stream ([[valueShape]]), so a translation bug fails loudly at plan
  * time, never as silent payload corruption.
  */
object Transcode {

  /** One translatable type: ros1 side and its ros2msg translation. */
  final case class Entry(srcName: String, srcDef: String,
      dstName: String, dstDef: String)

  /** `pkg/Type` → `pkg/msg/Type` (already-three-segment and
    * unpackaged names pass through).
    */
  def ros2TypeName(ros1Name: String): String = ros1Name.split("/") match {
    case Array(p, t) => s"$p/msg/$t"
    case _ => ros1Name
  }

  private val Separator = "^=+$".r

  private def translateFieldType(t: String): String = {
    val (base, arr) = t.indexOf('[') match {
      case -1 => (t, "")
      case i => (t.substring(0, i), t.substring(i))
    }
    val mapped = base match {
      case "time" => "builtin_interfaces/Time"
      case "duration" => "builtin_interfaces/Duration"
      case "byte" => "int8"   // ROS1 byte aliased int8; ROS2 byte = uint8
      case "char" => "uint8"
      case "Header" => "std_msgs/Header"
      case other => other
    }
    mapped + arr
  }

  /** Translate one ros1msg definition TEXT (root + `===`-separated
    * dependent blocks) into ros2msg form. Line-shape preserving:
    * comments, blanks, constants and field names pass through; only
    * the leading type token and `MSG:` headers are rewritten.
    */
  private[ros] def translateDefText(text: String): String = {
    val body = text.linesIterator.map { raw =>
      val t = raw.trim
      if (t.startsWith("MSG:"))
        "MSG: " + ros2TypeName(t.stripPrefix("MSG:").trim)
      else if (t.isEmpty || t.startsWith("#") ||
          (Separator.matches(t) && t.length >= 3)) raw
      else {
        val sp = t.indexWhere(c => c == ' ' || c == '\t')
        if (sp <= 0) raw
        else translateFieldType(t.substring(0, sp)) + t.substring(sp)
      }
    }.mkString("\n")
    if (body.contains("builtin_interfaces/") &&
        !body.contains("MSG: builtin_interfaces/Time"))
      body + BuiltinBlocks
    else body
  }

  private val BuiltinBlocks =
    """
      |================================================================================
      |MSG: builtin_interfaces/Time
      |int32 sec
      |uint32 nanosec
      |================================================================================
      |MSG: builtin_interfaces/Duration
      |int32 sec
      |uint32 nanosec""".stripMargin

  /** The canonical VALUE-STREAM shape of a bundle's decode/encode walk
    * — two bundles with equal shapes consume/produce positionally
    * compatible value sequences (every integer width boxes through
    * `Number`, so ints share one token; float widths and everything
    * else stay distinct). Used to validate a translation before any
    * payload trusts it.
    */
  private[ros] def valueShape(bundle: RosMsgBundle): String = {
    val sb = new StringBuilder
    def walk(msg: RosMsgDef, depth: Int): Unit = {
      require(depth < 64, s"message nesting too deep in ${msg.fullName}")
      msg.fields.filterNot(_.isConstant).foreach { f =>
        def one(t: RosType): Unit = t match {
          case RTime | RDuration => sb.append("NN")
          case RBool => sb.append("B")
          case RFloat32 => sb.append("f")
          case RFloat64 => sb.append("F")
          case RString => sb.append("S")
          case _: RosPrimitive => sb.append("N")
          case ref: RosMsgRef => walk(bundle.resolve(ref, msg.pkg), depth + 1)
          case RosArray(_, _) => throw new IllegalStateException("unreachable")
        }
        f.tpe match {
          case RosArray(RUInt8 | RByte | RChar | RInt8, fl) =>
            sb.append("X").append(fl.getOrElse(-1))
          case RosArray(elem, fl) =>
            sb.append("[").append(fl.getOrElse(-1)).append("{")
            elem match {
              case RTime | RDuration => sb.append("NN")
              case ref: RosMsgRef => walk(bundle.resolve(ref, msg.pkg), depth + 1)
              case other => one(other)
            }
            sb.append("}]")
          case other => one(other)
        }
      }
    }
    walk(bundle.root, 0)
    sb.toString
  }

  /** Translate and VALIDATE one ros1msg definition. Throws (loudly,
    * naming the type) when the definition does not parse or the
    * translated walk would consume a different value stream.
    */
  def translate(ros1Name: String, ros1Def: String): Entry = {
    val src = MsgDefParser.parse(ros1Name, ros1Def)
    val dstName = ros2TypeName(ros1Name)
    val dstDef = translateDefText(ros1Def)
    val dst = graft.ros.mcap.Ros2Msg.bundle(dstName, dstDef)
    val (s1, s2) = (valueShape(src), valueShape(dst))
    require(s1 == s2,
      s"transcode: translated definition for $ros1Name walks a different " +
        s"value stream (ros1 $s1 vs ros2 $s2) — refusing to re-encode")
    Entry(ros1Name, ros1Def, dstName, dstDef)
  }

  /** Harvest every ros1msg definition under `inPath` and translate.
    * Returns (translatable entries by ros1 type name, failures by
    * name → reason). A ros1 type whose every harvested definition is
    * EMPTY (recorders do ship them) counts as a failure too —
    * otherwise `failures.isEmpty` would claim full transcodability
    * and the mcap profile would stamp "ros2" on an archive whose
    * def-less rows byte-embed as ros1 channels.
    */
  def plan(inPath: String): (Map[String, Entry], Map[String, String]) = {
    val ros1 = DefsHarvest.dedupe(
      DefsHarvest.fromPath(inPath).filter(_.encoding == "ros1msg"))
    val attempts = ros1.map { d =>
      val text = new String(d.data, java.nio.charset.StandardCharsets.UTF_8)
      d.name -> (try Right(translate(d.name, text)) catch {
        case e: Exception => Left(e.getMessage)
      })
    }
    val entries = attempts.collect { case (n, Right(e)) => n -> e }.toMap
    val resolved = MixedRead.resolve(inPath)
    val defless = (
      resolved.getOrElse("rosbag", Seq.empty)
        .flatMap(f => bag.RosbagIO.scanIndexes(Seq(f)).flatMap(_._2.connections))
        .filter(c => c.datatype.nonEmpty && c.msgDef.trim.isEmpty)
        .map(_.datatype) ++
      resolved.getOrElse("mcap", Seq.empty)
        .flatMap(f => mcap.McapIO.scanIndex(f).schemas.values)
        .filter(s => s.encoding == "ros1msg" && s.name.nonEmpty && s.data.isEmpty)
        .map(_.name)
    ).distinct.filterNot(entries.contains)
      .map(_ -> "empty message definition in source").toMap
    (entries,
      attempts.collect { case (n, Left(m)) => n -> m }.toMap ++ defless)
  }

  /** The translated definitions as sink-side defs-channel entries. */
  def inlineDefs(entries: Iterable[Entry]): Seq[DefsHarvest.TypeDef] =
    entries.toSeq.sortBy(_.dstName).map(e => DefsHarvest.TypeDef(
      e.dstName, "ros2msg",
      e.dstDef.getBytes(java.nio.charset.StandardCharsets.UTF_8), "*"))

  // ---- executor-side codecs ----

  /** Per-JVM codec cache: bundles parse once per (executor, type),
    * the per-message cost is decode walk + encode walk alone.
    */
  private val codecs =
    new java.util.concurrent.ConcurrentHashMap[Entry, Array[Byte] => Array[Byte]]()

  private[ros] def codec(e: Entry): Array[Byte] => Array[Byte] =
    codecs.computeIfAbsent(e, { entry =>
      val src = MsgDefParser.parse(entry.srcName, entry.srcDef)
      val dst = graft.ros.mcap.Ros2Msg.bundle(entry.dstName, entry.dstDef)
      bytes => graft.ros.mcap.CdrCodec.encode(dst,
        RosSchemaMapper.decode(src, bytes))
    })

  /** Per-JVM per-FILE definition resolution — consulted FIRST, before
    * the plan-time broadcast: two files may define the SAME type name
    * with divergent (schema-evolved) definitions, and decoding a row
    * under the other file's definition is silent corruption; the
    * row's own `file_path` is the authority. Cache entries carry the
    * file's (mtime, length) fingerprint: a type-miss re-stats the file
    * (streams TAIL still-growing containers, so a type appended after
    * the first scan must be found), reloads only when the bytes
    * changed, and caches the negative otherwise so later rows stop
    * stat'ing. `None` = the file defines no translatable ros1msg for
    * this type.
    */
  private final case class CachedEntries(fingerprint: String,
      lastStatNanos: Long, entries: Map[String, Option[Entry]])

  private val fileDefs =
    new java.util.concurrent.ConcurrentHashMap[String, CachedEntries]()

  private def fingerprint(f: String): String =
    try {
      val p = new org.apache.hadoop.fs.Path(f)
      val st = p.getFileSystem(bag.RosbagIO.hadoopConf()).getFileStatus(p)
      s"${st.getModificationTime}:${st.getLen}"
    } catch { case _: Exception => "unavailable" }

  private def loadFileDefs(f: String): Map[String, Option[Entry]] = {
    val conns = try {
      if (f.endsWith(".bag"))
        bag.RosbagIO.scanIndexes(Seq(f)).flatMap(_._2.connections)
          .map(c => (c.datatype, c.msgDef))
      else if (f.endsWith(".mcap"))
        mcap.McapIO.scanIndex(f).schemas.values.toSeq
          .filter(_.encoding == "ros1msg")
          .map(s => (s.name,
            new String(s.data, java.nio.charset.StandardCharsets.UTF_8)))
      else Seq.empty
    } catch { case _: Exception => Seq.empty }
    conns.filter(_._2.trim.nonEmpty).groupBy(_._1).map { case (name, ds) =>
      name -> (try Some(translate(name, ds.head._2)) catch {
        case _: Exception => None
      })
    }
  }

  private def fileFallback(filePath: String, tpe: String): Option[Entry] = {
    if (filePath == null || filePath.isEmpty) return None
    val now = System.nanoTime()
    val cur = fileDefs.get(filePath)
    if (cur != null) {
      val hit = cur.entries.get(tpe)
      // positives serve from cache (a connection's definition is
      // immutable); a cached NEGATIVE re-validates at most once per
      // throttle window — this sits on the ROW path for unknown types
      if (hit.exists(_.isDefined)) return hit.get
      if (hit.isDefined && now - cur.lastStatNanos < SourceDefs.recheckNanos)
        return None
    }
    val fp = fingerprint(filePath)
    val base =
      if (cur != null && cur.fingerprint == fp) cur.entries
      else loadFileDefs(filePath)
    val entry = base.getOrElse(tpe, None)
    fileDefs.put(filePath, CachedEntries(fp, now, base + (tpe -> entry)))
    entry
  }

  /** Rewrite a mixed-spine frame's "ros1" rows to CDR: `data`
    * re-encoded, `type` renamed to the ROS 2 convention, `encoding` →
    * "cdr", `size` recomputed. The row's own file resolves its
    * definition first (divergent same-named definitions, types landing
    * mid-stream); plan-time `entries` are the fallback for unscannable
    * files. `strict` controls the remainder: true
    * fails the row loudly, false passes it through unchanged (the
    * byte-embed path — still a valid mcap, not a ros2-profile one).
    *
    * Shape: map-only (one UDF projection — no shuffle, no driver
    * loop); the UDF is marked nondeterministic so the optimizer never
    * duplicates the decode+encode into sibling projections.
    */
  def toCdr(spine: DataFrame, entries: Map[String, Entry],
      strict: Boolean): DataFrame = {
    val bc = spine.sparkSession.sparkContext.broadcast(entries)
    // the row's own FILE resolves first (same-named types can carry
    // divergent definitions across a fleet's files — decoding under
    // the other file's definition would be silent corruption); the
    // plan-time broadcast covers rows whose file cannot be scanned
    val tcodeUdf = udf { (tpe: String, data: Array[Byte], filePath: String) =>
      fileFallback(filePath, tpe).orElse(bc.value.get(tpe)) match {
        case Some(e) => (e.dstName, codec(e)(data))
        case None if strict => throw new IllegalArgumentException(
          s"transcode: no translatable ros1msg definition for type '$tpe' " +
            s"(file $filePath) — fix the source definition or pass " +
            "transcode=auto to embed untranslatable rows as ros1 bytes")
        case None => null
      }
    }.asNondeterministic()
    val isRos1 = col("encoding") === lit("ros1")
    val sizeType = spine.schema("size").dataType
    spine
      .withColumn("__tc",
        when(isRos1, tcodeUdf(col("type"), col("data"), col("file_path"))))
      .withColumn("type", coalesce(col("__tc._1"), col("type")))
      .withColumn("encoding",
        when(col("__tc").isNotNull, lit("cdr")).otherwise(col("encoding")))
      .withColumn("size",
        when(col("__tc").isNotNull, length(col("__tc._2")).cast(sizeType))
          .otherwise(col("size")))
      .withColumn("data", coalesce(col("__tc._2"), col("data")))
      .drop("__tc")
  }
}
