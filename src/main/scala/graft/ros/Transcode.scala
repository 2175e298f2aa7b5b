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
          case RString | RosPrimitive.RWString => sb.append("S")
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
  /** Type names some single file defines DIVERGENTLY (several distinct
    * variant keys under one name within ONE file — the per-row
    * attribution the execution-time sentinel refuses). These must
    * count as PLAN-TIME failures: strict then fails before writing a
    * byte, and auto's profile claim falls back honestly — otherwise
    * `failures.isEmpty` would stamp a "ros2" profile on an archive
    * whose divergent rows pass through under their original encoding.
    */
  private def divergentNames(perFile: Seq[(String, Seq[(String, String)])])
      : Map[String, String] =
    perFile.flatMap { case (f, defs) =>
      defs.groupBy(_._1).collect {
        case (n, ds) if ds.map(_._2).distinct.size > 1 => (n, f)
      }
    }.groupBy(_._1).map { case (n, hits) =>
      n -> ("defined DIVERGENTLY within " +
        hits.map(_._2).distinct.sorted.mkString(", ") +
        " (several layouts under one name — rows cannot be attributed " +
        "to a definition)")
    }

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
    val bagIdx = bag.RosbagIO.scanIndexes(resolved.getOrElse("rosbag", Seq.empty))
    val mcapIdx = DriverPool.parMap(resolved.getOrElse("mcap", Seq.empty))(
      f => f -> mcap.McapIO.scanIndex(f))
    val defless = (
      bagIdx.flatMap(_._2.connections)
        .filter(c => c.datatype.nonEmpty && c.msgDef.trim.isEmpty)
        .map(_.datatype) ++
      mcapIdx.flatMap(_._2.schemas.values)
        .filter(s => s.encoding == "ros1msg" && s.name.nonEmpty && s.data.isEmpty)
        .map(_.name)
    ).distinct.filterNot(entries.contains)
      .map(_ -> "empty message definition in source").toMap
    // within-file divergence = plan-time failure (see divergentNames);
    // divergence ACROSS files stays translatable — per-file resolution
    // decodes each file's rows under its own truth
    val divergent = divergentNames(
      bagIdx.map { case (f, idx) => f -> idx.connections
        .filter(c => c.datatype.nonEmpty && c.msgDef.trim.nonEmpty)
        .map(c => (c.datatype, c.msgDef)) } ++
      mcapIdx.map { case (f, idx) => f -> idx.schemas.values.toSeq
        .filter(s => s.encoding == "ros1msg" && s.name.nonEmpty && s.data.nonEmpty)
        .map(s => (s.name,
          new String(s.data, java.nio.charset.StandardCharsets.UTF_8))) })
    (entries,
      attempts.collect { case (n, Left(m)) => n -> m }.toMap ++ defless ++
        divergent)
  }

  /** Harvest + translate the ros1msg definitions under an explicitly
    * PINNED defs channel path — the entries [[toCdr]] consults BEFORE
    * any per-file resolution when `defs_priority` is channel-first
    * (the sinks' contract for a user-pinned definitive source). A name
    * the pinned channel defines divergently or untranslatably is
    * simply absent here (resolution falls through to file-then-plan).
    */
  def pinnedEntries(path: String): Map[String, Entry] =
    DefsHarvest.fromPath(path).filter(_.encoding == "ros1msg")
      .groupBy(_.name).flatMap { case (n, ds) =>
        val texts = ds.map(d =>
          new String(d.data, java.nio.charset.StandardCharsets.UTF_8)).distinct
        if (texts.size != 1) None
        else try Some(n -> translate(n, texts.head))
        catch { case _: Exception => None }
      }

  /** [[pinnedEntries]] for the reverse direction: ros2-dialect
    * definitions under the pinned path, translated to ros1msg, keyed
    * by the ros2 type name [[toRos1]] sees on the rows.
    */
  def pinnedRos1Entries(path: String): Map[String, Ros1Entry] =
    DefsHarvest.fromPath(path).filter(d => DefsHarvest.isRos2(d.encoding))
      .groupBy(_.name).flatMap { case (n, ds) =>
        val variants = ds.map(d => (d.encoding,
          new String(d.data, java.nio.charset.StandardCharsets.UTF_8))).distinct
        if (variants.size != 1) None
        else try Some(n -> translateToRos1(n, variants.head._1, variants.head._2))
        catch { case _: Exception => None }
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
      // a file carrying DIVERGENT definitions for one type cannot be
      // attributed per row — the SENTINEL (not None) so resolution
      // never falls through to the plan-level single definition,
      // which would be the exact corruption per-file truth prevents
      val texts = ds.map(_._2).distinct
      name -> (if (texts.size > 1) Some(DivergentEntry)
        else try Some(translate(name, texts.head)) catch {
          case _: Exception => None
        })
    }
  }

  /** Marker: the row's file defines this type DIVERGENTLY (several
    * layouts under one name) — per-row attribution is impossible, and
    * falling through to a plan-level definition would silently
    * re-encode half the rows wrong. Compared by reference (executor-
    * local object).
    */
  private[ros] val DivergentEntry = Entry("", "", "", "")
  private[ros] val DivergentRos1Entry = Ros1Entry("", "", "", "", "", "")

  private val fileDefs = new SourceDefs.FileDefCache[Entry](loadFileDefs)

  private def fileFallback(filePath: String, tpe: String): Option[Entry] =
    fileDefs.get(filePath, tpe)

  /** Rewrite a mixed-spine frame's "ros1" and "protobuf" rows to CDR:
    * `data` re-encoded, `type` renamed to the ROS 2 convention,
    * `encoding` → "cdr", `size` recomputed. Resolution order: `pinned`
    * (a USER's explicitly pinned defs channel under channel-first
    * priority — the sinks' `defs_priority` contract, mirrored here)
    * wins over everything; otherwise the row's own file resolves first
    * (divergent same-named definitions, types landing mid-stream);
    * plan-time `entries` are the fallback for unscannable files.
    * `strict` controls the remainder: true
    * fails the row loudly, false passes it through unchanged (the
    * byte-embed path — still a valid mcap, not a ros2-profile one).
    *
    * Shape: map-only (one UDF projection — no shuffle, no driver
    * loop); the UDF is marked nondeterministic so the optimizer never
    * duplicates the decode+encode into sibling projections.
    */
  def toCdr(spine: DataFrame, entries: Map[String, Entry],
      strict: Boolean, pinned: Map[String, Entry] = Map.empty,
      protoEntries: Map[String, ProtoEntry] = Map.empty,
      pinnedProto: Map[String, ProtoEntry] = Map.empty): DataFrame = {
    val bc = spine.sparkSession.sparkContext.broadcast(entries)
    val bcPinned = spine.sparkSession.sparkContext.broadcast(pinned)
    val bcProto = spine.sparkSession.sparkContext.broadcast(protoEntries)
    val bcPinnedProto = spine.sparkSession.sparkContext.broadcast(pinnedProto)
    // a user-PINNED channel wins (defs_priority=channel); otherwise
    // the row's own FILE resolves first (same-named types can carry
    // divergent definitions across a fleet's files — decoding under
    // the other file's definition would be silent corruption); the
    // plan-time broadcast covers rows whose file cannot be scanned
    val tcodeUdf = udf {
      (enc: String, tpe: String, data: Array[Byte], filePath: String) =>
      if (enc == "protobuf")
        bcPinnedProto.value.get(tpe).orElse(protoFileDefs.get(filePath, tpe))
          .orElse(bcProto.value.get(tpe)) match {
          case Some(e) if e eq DivergentProtoEntry =>
            if (strict) throw new IllegalArgumentException(
              s"transcode: $filePath defines '$tpe' DIVERGENTLY (several " +
                "descriptor sets under one name) — rows cannot be " +
                "attributed to a definition; split the source or pass " +
                "transcode=auto to embed them as protobuf bytes")
            else null
          case Some(e) => (e.dstName, codecProto(e)(data))
          case None if strict => throw new IllegalArgumentException(
            s"transcode: no translatable protobuf descriptor for type " +
              s"'$tpe' (file $filePath) — fix the source schema or pass " +
              "transcode=auto to embed untranslatable rows as protobuf bytes")
          case None => null
        }
      else bcPinned.value.get(tpe).orElse(fileFallback(filePath, tpe))
        .orElse(bc.value.get(tpe)) match {
        case Some(e) if e eq DivergentEntry =>
          if (strict) throw new IllegalArgumentException(
            s"transcode: $filePath defines '$tpe' DIVERGENTLY (several " +
              "layouts under one name) — rows cannot be attributed to a " +
              "definition; split the source or pass transcode=auto to " +
              "embed them as ros1 bytes")
          else null
        case Some(e) => (e.dstName, codec(e)(data))
        case None if strict => throw new IllegalArgumentException(
          s"transcode: no translatable ros1msg definition for type '$tpe' " +
            s"(file $filePath) — fix the source definition or pass " +
            "transcode=auto to embed untranslatable rows as ros1 bytes")
        case None => null
      }
    }.asNondeterministic()
    rewrite(spine, col("encoding").isin("ros1", "protobuf"),
      tcodeUdf(col("encoding"), col("type"), col("data"), col("file_path")),
      "cdr")
  }

  /** Shared column-rewrite half of both directions: `tc` (the applied
    * transcode UDF, nullable (newType, newData)) evaluated on rows
    * matching `cond`, type/encoding/size/data rewritten where it
    * returned non-null.
    */
  private def rewrite(spine: DataFrame, cond: Column, tc: Column,
      newEncoding: String): DataFrame = {
    val sizeType = spine.schema("size").dataType
    spine
      .withColumn("__tc", when(cond, tc))
      .withColumn("type", coalesce(col("__tc._1"), col("type")))
      .withColumn("encoding",
        when(col("__tc").isNotNull, lit(newEncoding)).otherwise(col("encoding")))
      .withColumn("size",
        when(col("__tc").isNotNull, length(col("__tc._2")).cast(sizeType))
          .otherwise(col("size")))
      .withColumn("data", coalesce(col("__tc._2"), col("data")))
      .drop("__tc")
  }

  // ---- the REVERSE direction: cdr → ros1 (rosbag targets) ----

  /** One translatable ros2-dialect type and its ros1msg rendering.
    * `md5` is the GENUINE genmsg checksum of the translated definition
    * ([[RosMd5]]) — rosbag tooling validates it on play.
    */
  final case class Ros1Entry(srcName: String, srcEncoding: String,
      srcDef: String, dstName: String, dstDef: String, md5: String)

  /** `pkg/msg/Type` → `pkg/Type` (the ROS 1 two-segment convention). */
  def ros1TypeName(ros2Name: String): String = ros2Name.split("/") match {
    case Array(p, "msg", t) => s"$p/$t"
    case _ => ros2Name
  }

  private def ros1TypeText(t: RosType): String = t match {
    // ros1 has no wstring: lower to string — the value stream carries
    // a decoded String either way, so re-encode writes UTF-8 bytes
    // under the ros1 wire (validated by the valueShape equality below)
    case RosPrimitive.RWString => "string"
    case p: RosPrimitive => p.name
    case RosMsgRef(Some("builtin_interfaces"), "Time") => "time"
    case RosMsgRef(Some("builtin_interfaces"), "Duration") => "duration"
    case r: RosMsgRef => r.fullName
    case RosArray(elem, Some(n)) => s"${ros1TypeText(elem)}[$n]"
    case RosArray(elem, None) => s"${ros1TypeText(elem)}[]"
  }

  /** Render a (normalized ros2) bundle as ros1msg definition text:
    * root block + `===`-separated dependent blocks, builtin
    * Time/Duration references lowered to the ros1 primitives (their
    * blocks omitted). Bounded strings/sequences and inline defaults
    * were already normalized away when the ros2 text parsed.
    */
  private[ros] def renderRos1(bundle: RosMsgBundle): String = {
    def block(m: RosMsgDef): String = m.fields.map { f =>
      f.constantValue match {
        case Some(v) => s"${ros1TypeText(f.tpe)} ${f.name}=$v"
        case None => s"${ros1TypeText(f.tpe)} ${f.name}"
      }
    }.mkString("\n")
    val deps = bundle.deps.values.toSeq
      .filterNot(_.fullName.startsWith("builtin_interfaces/"))
      .sortBy(_.fullName)
    (block(bundle.root) +: deps.map(d =>
      ("=" * 80) + "\nMSG: " + d.fullName + "\n" + block(d))).mkString("\n")
  }

  /** Translate and VALIDATE one ros2msg/ros2idl definition into
    * ros1msg — same contract as [[translate]], pointed the other way.
    */
  def translateToRos1(srcName: String, srcEncoding: String,
      defText: String): Ros1Entry = {
    require(DefsHarvest.isRos2(srcEncoding),
      s"transcode to ros1 consumes ros2msg/ros2idl definitions, " +
        s"got '$srcEncoding' for $srcName")
    val src = mcap.McapPayload.bundle(srcEncoding, srcName,
      defText.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val dstName = ros1TypeName(srcName)
    val dstDef = renderRos1(src)
    val dst = MsgDefParser.parse(dstName, dstDef)
    val (s2, s1) = (valueShape(src), valueShape(dst))
    require(s2 == s1,
      s"transcode: ros1 rendering of $srcName walks a different value " +
        s"stream (ros2 $s2 vs ros1 $s1) — refusing to re-encode")
    Ros1Entry(srcName, srcEncoding, defText, dstName, dstDef,
      RosMd5.compute(dst))
  }

  /** Harvest every ros2-dialect definition under `inPath` and
    * translate to ros1msg. A cdr TOPIC with no harvestable definition
    * (db3 topics without a message_definitions row, empty mcap
    * schemas) counts as a failure — its rows cannot re-encode.
    */
  def planToRos1(inPath: String)
      : (Map[String, Ros1Entry], Map[String, String]) = {
    val ros2 = DefsHarvest.dedupe(
      DefsHarvest.fromPath(inPath).filter(d => DefsHarvest.isRos2(d.encoding)),
      preferKnownMd5 = false)
    val attempts = ros2.map { d =>
      val text = new String(d.data, java.nio.charset.StandardCharsets.UTF_8)
      d.name -> (try Right(translateToRos1(d.name, d.encoding, text)) catch {
        case e: Exception => Left(e.getMessage)
      })
    }
    val entries = attempts.collect { case (n, Right(e)) => n -> e }.toMap
    val resolved = MixedRead.resolve(inPath)
    val db3Metas = db3.Db3IO.scanMetas(resolved.getOrElse("db3", Seq.empty))
    val mcapIdx = DriverPool.parMap(resolved.getOrElse("mcap", Seq.empty))(
      f => f -> mcap.McapIO.scanIndex(f))
    val defless = (
      db3Metas.flatMap { case (_, m) =>
          // an EMPTY definition text counts as undefined, like the
          // mcap branch's s.data.isEmpty
          val defined = m.definitions
            .filter(_._3.trim.nonEmpty).map(_._1).toSet
          m.topics.values.collect {
            case (_, tpe, "cdr") if tpe.nonEmpty && !defined.contains(tpe) => tpe
          }
        } ++
      mcapIdx.flatMap(_._2.schemas.values)
        .filter(s => DefsHarvest.isRos2(s.encoding) && s.name.nonEmpty &&
          s.data.isEmpty)
        .map(_.name)
    ).distinct.filterNot(entries.contains)
      .map(_ -> "no/empty message definition in source").toMap
    // within-file divergence = plan-time failure, as in [[plan]];
    // variant key (encoding, text) matches loadFileDefsToRos1's rule
    val divergent = divergentNames(
      db3Metas.map { case (f, m) => f -> m.definitions
        .filter(_._3.trim.nonEmpty)
        .map(d => (d._1, d._2 + " " + d._3)) } ++
      mcapIdx.map { case (f, idx) => f -> idx.schemas.values.toSeq
        .filter(s => DefsHarvest.isRos2(s.encoding) && s.name.nonEmpty &&
          s.data.nonEmpty)
        .map(s => (s.name, s.encoding + " " +
          new String(s.data, java.nio.charset.StandardCharsets.UTF_8))) })
    (entries,
      attempts.collect { case (n, Left(m)) => n -> m }.toMap ++ defless ++
        divergent)
  }

  /** The translated definitions as the BAG sink's defs-channel
    * entries, genuine md5s included.
    */
  def inlineRos1Defs(entries: Iterable[Ros1Entry]): Seq[DefsHarvest.TypeDef] =
    entries.toSeq.sortBy(_.dstName).map(e => DefsHarvest.TypeDef(
      e.dstName, "ros1msg",
      e.dstDef.getBytes(java.nio.charset.StandardCharsets.UTF_8), e.md5))

  private val ros1Codecs = new java.util.concurrent.ConcurrentHashMap[
    Ros1Entry, Array[Byte] => Array[Byte]]()

  private[ros] def codecToRos1(e: Ros1Entry): Array[Byte] => Array[Byte] =
    ros1Codecs.computeIfAbsent(e, { entry =>
      val src = mcap.McapPayload.bundle(entry.srcEncoding, entry.srcName,
        entry.srcDef.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val dst = MsgDefParser.parse(entry.dstName, entry.dstDef)
      bytes => RosSchemaMapper.encode(dst,
        graft.ros.mcap.CdrCodec.decode(src, bytes))
    })

  private def loadFileDefsToRos1(f: String): Map[String, Option[Ros1Entry]] = {
    val defs: Seq[(String, String, String)] = try {
      if (f.endsWith(".mcap"))
        mcap.McapIO.scanIndex(f).schemas.values.toSeq
          .filter(s => DefsHarvest.isRos2(s.encoding))
          .map(s => (s.name, s.encoding,
            new String(s.data, java.nio.charset.StandardCharsets.UTF_8)))
      else if (f.endsWith(".db3") || f.endsWith(".db3.zstd"))
        db3.Db3IO.scanMetas(Seq(f)).flatMap(_._2.definitions)
      else Seq.empty
    } catch { case _: Exception => Seq.empty }
    defs.filter(_._3.trim.nonEmpty).groupBy(_._1).map { case (name, ds) =>
      // divergence rule as in loadFileDefs
      val variants = ds.map(d => (d._2, d._3)).distinct
      name -> (if (variants.size > 1) Some(DivergentRos1Entry)
        else try Some(translateToRos1(name, variants.head._1,
          variants.head._2)) catch {
          case _: Exception => None
        })
    }
  }

  private val ros1FileDefs = new SourceDefs.FileDefCache[Ros1Entry](loadFileDefsToRos1)

  /** Rewrite a mixed-spine frame's "cdr" AND "protobuf" rows to ros1
    * serialization: the reverse of [[toCdr]], for rosbag targets —
    * what turns the bag sink's foreign-encoding refusal into a
    * fallback. Protobuf rows lower through the composed
    * proto→ros2→ros1 rendering ([[translateProtoToRos1]], round 16 —
    * the matrix's last cell); cdr rows through [[translateToRos1]].
    */
  def toRos1(spine: DataFrame, entries: Map[String, Ros1Entry],
      strict: Boolean, pinned: Map[String, Ros1Entry] = Map.empty,
      protoEntries: Map[String, ProtoRos1Entry] = Map.empty,
      pinnedProto: Map[String, ProtoRos1Entry] = Map.empty): DataFrame = {
    val bc = spine.sparkSession.sparkContext.broadcast(entries)
    val bcPinned = spine.sparkSession.sparkContext.broadcast(pinned)
    val bcProto = spine.sparkSession.sparkContext.broadcast(protoEntries)
    val bcPinnedProto = spine.sparkSession.sparkContext.broadcast(pinnedProto)
    val tcodeUdf = udf {
      (enc: String, tpe: String, data: Array[Byte], filePath: String) =>
      if (enc == "protobuf")
        bcPinnedProto.value.get(tpe).orElse(protoRos1FileDefs.get(filePath, tpe))
          .orElse(bcProto.value.get(tpe)) match {
          case Some(e) if e eq DivergentProtoRos1Entry =>
            if (strict) throw new IllegalArgumentException(
              s"transcode: $filePath defines '$tpe' DIVERGENTLY (several " +
                "descriptor sets under one name) — rows cannot be " +
                "attributed to a definition; split the source or pass " +
                "transcode=auto (with allow_foreign_encoding=true) to " +
                "embed them as foreign bytes")
            else null
          case Some(e) => (e.dstName, codecProtoToRos1(e)(data))
          case None if strict => throw new IllegalArgumentException(
            s"transcode: no translatable protobuf descriptor for type " +
              s"'$tpe' (file $filePath) — fix the source schema or pass " +
              "transcode=auto (with allow_foreign_encoding=true) to embed " +
              "untranslatable rows as foreign bytes")
          case None => null
        }
      else bcPinned.value.get(tpe).orElse(ros1FileDefs.get(filePath, tpe))
        .orElse(bc.value.get(tpe)) match {
        case Some(e) if e eq DivergentRos1Entry =>
          if (strict) throw new IllegalArgumentException(
            s"transcode: $filePath defines '$tpe' DIVERGENTLY (several " +
              "layouts under one name) — rows cannot be attributed to a " +
              "definition; split the source or pass transcode=auto (with " +
              "allow_foreign_encoding=true) to embed them as foreign bytes")
          else null
        case Some(e) => (e.dstName, codecToRos1(e)(data))
        case None if strict => throw new IllegalArgumentException(
          s"transcode: no translatable ros2 definition for type '$tpe' " +
            s"(file $filePath) — fix the source definition or pass " +
            "transcode=auto (with allow_foreign_encoding=true) to embed " +
            "untranslatable rows as foreign bytes")
        case None => null
      }
    }.asNondeterministic()
    rewrite(spine, col("encoding").isin("cdr", "protobuf"),
      tcodeUdf(col("encoding"), col("type"), col("data"), col("file_path")),
      "ros1")
  }

  // ---- the THIRD dialect crossing: protobuf → ros2msg / CDR ----

  /** One translatable protobuf type: the root message's fq name, its
    * serialized FileDescriptorSet (base64 — value equality for
    * broadcast and codec-cache keys; the raw bytes have identity
    * equality only), and the RENDERED ros2msg translation. Unlike the
    * ros1 crossing the source definition is BINARY (descriptor.proto),
    * so translation is a real re-expression, not a line rewrite: the
    * descriptor maps onto the shared [[RosMsgBundle]] flat frame
    * ([[graft.ros.mcap.ProtoDescriptor.bundle]] — recursive types,
    * proto1 groups and repeated-bytes fields keep their loud refusals
    * there) and the bundle renders back out as ros2msg text
    * ([[renderRos2]]). A foxglove/protobuf-profile fleet normalizing
    * into a ros2-profile archive is the user path; the composition is
    * the same one q91 ships for ros1 (decode to the flat value stream,
    * re-encode through [[graft.ros.mcap.CdrCodec.encode]]).
    */
  final case class ProtoEntry(srcName: String, srcFdsB64: String,
      dstName: String, dstDef: String)

  /** Bundle fullName ("a.b.c.Outer/Inner") → ros2 schema name
    * ("a_b_c_Outer/msg/Inner"): proto packages and nesting paths allow
    * dots, ros2 package names don't. Package-less protos are refused —
    * no ros2 package name exists to render the translation into.
    */
  private def ros2NameOfProto(bundleName: String): String =
    bundleName.split("/") match {
      case Array(pkg, name) => pkg.replace('.', '_') + "/msg/" + name
      case _ => throw new IllegalArgumentException(
        s"protobuf type '$bundleName' has no package — no ros2 package " +
          "name exists to render its translation into")
    }

  private def ros2TypeText(t: RosType, msg: RosMsgDef,
      bundle: RosMsgBundle, names: Map[String, String]): String = t match {
    case p: RosPrimitive => p.name
    case r: RosMsgRef => names(bundle.resolve(r, msg.pkg).fullName)
    case RosArray(elem, Some(n)) =>
      s"${ros2TypeText(elem, msg, bundle, names)}[$n]"
    case RosArray(elem, None) =>
      s"${ros2TypeText(elem, msg, bundle, names)}[]"
  }

  /** Render a protobuf-derived bundle as (ros2 schema name, ros2msg
    * definition text): root block + `===`-separated dependent blocks.
    * The '.'→'_' package mapping is checked INJECTIVE over the
    * bundle's closure — two distinct proto packages collapsing onto
    * one ros2 name would cross-wire the dependency references.
    */
  private[ros] def renderRos2(bundle: RosMsgBundle): (String, String) = {
    val msgs = bundle.root +: bundle.deps.values.toSeq.sortBy(_.fullName)
    val names = msgs.map(m => m.fullName -> ros2NameOfProto(m.fullName)).toMap
    val collisions = names.groupBy(_._2).filter(_._2.size > 1)
    require(collisions.isEmpty,
      "protobuf type names collide after the ros2 renaming: " +
        collisions.map { case (n, srcs) =>
          s"$n <- ${srcs.keys.toSeq.sorted.mkString(", ")}"
        }.mkString("; "))
    def block(m: RosMsgDef): String =
      m.fields.map(f => s"${ros2TypeText(f.tpe, m, bundle, names)} ${f.name}")
        .mkString("\n")
    (names(bundle.root.fullName),
      (block(bundle.root) +: msgs.tail.map(d =>
        ("=" * 80) + "\nMSG: " + names(d.fullName) + "\n" + block(d)))
        .mkString("\n"))
  }

  /** Translate and VALIDATE one protobuf schema (fq root name +
    * serialized FileDescriptorSet) into ros2msg — same contract as
    * [[translate]]: the proto decode walk and the rendered ros2 encode
    * walk must consume the identical value stream, so a rendering bug
    * fails loudly at plan time, never as silent payload corruption.
    */
  def translateProto(fq: String, fds: Array[Byte]): ProtoEntry = {
    val set = mcap.ProtoDescriptor.parseSet(fds)
    val src = mcap.ProtoDescriptor.bundle(fq, set)
    val (dstName, dstDef) = renderRos2(src)
    val dst = mcap.Ros2Msg.bundle(dstName, dstDef)
    val (sp, s2) = (valueShape(src), valueShape(dst))
    require(sp == s2,
      s"transcode: ros2msg rendering of $fq walks a different value " +
        s"stream (proto $sp vs ros2 $s2) — refusing to re-encode")
    ProtoEntry(fq, java.util.Base64.getEncoder.encodeToString(fds),
      dstName, dstDef)
  }

  /** Harvest every protobuf schema under `inPath` and translate to
    * ros2msg — the protobuf half of [[plan]]: failures cover
    * untranslatable shapes (recursion, groups, repeated bytes,
    * package-less types), empty descriptor sets, and names one file
    * defines divergently.
    */
  def planProto(inPath: String)
      : (Map[String, ProtoEntry], Map[String, String]) = {
    val protos = DefsHarvest.dedupe(
      DefsHarvest.fromPath(inPath).filter(_.encoding == "protobuf"),
      preferKnownMd5 = false)
    val attempts = protos.map { d =>
      d.name -> (try Right(translateProto(d.name, d.data)) catch {
        case e: Exception => Left(e.getMessage)
      })
    }
    val entries = attempts.collect { case (n, Right(e)) => n -> e }.toMap
    val mcapIdx = DriverPool.parMap(
      MixedRead.resolve(inPath).getOrElse("mcap", Seq.empty))(
      f => f -> mcap.McapIO.scanIndex(f))
    val defless = mcapIdx.flatMap(_._2.schemas.values)
      .filter(s => s.encoding == "protobuf" && s.name.nonEmpty && s.data.isEmpty)
      .map(_.name)
      .distinct.filterNot(entries.contains)
      .map(_ -> "empty FileDescriptorSet in source").toMap
    val divergent = divergentNames(
      mcapIdx.map { case (f, idx) => f -> idx.schemas.values.toSeq
        .filter(s => s.encoding == "protobuf" && s.name.nonEmpty &&
          s.data.nonEmpty)
        .map(s => (s.name,
          java.util.Base64.getEncoder.encodeToString(s.data))) })
    (entries,
      attempts.collect { case (n, Left(m)) => n -> m }.toMap ++ defless ++
        divergent)
  }

  /** [[pinnedEntries]] for protobuf: descriptor sets under the pinned
    * path, translated, keyed by the proto fq name [[toCdr]] sees on
    * the rows.
    */
  def pinnedProtoEntries(path: String): Map[String, ProtoEntry] =
    DefsHarvest.fromPath(path).filter(_.encoding == "protobuf")
      .groupBy(_.name).flatMap { case (n, ds) =>
        val variants = ds.map(d =>
          java.util.Base64.getEncoder.encodeToString(d.data)).distinct
        if (variants.size != 1) None
        else try Some(n -> translateProto(n, ds.head.data))
        catch { case _: Exception => None }
      }

  /** The translated definitions as sink-side defs-channel entries. */
  def inlineProtoDefs(entries: Iterable[ProtoEntry]): Seq[DefsHarvest.TypeDef] =
    entries.toSeq.sortBy(_.dstName).map(e => DefsHarvest.TypeDef(
      e.dstName, "ros2msg",
      e.dstDef.getBytes(java.nio.charset.StandardCharsets.UTF_8), "*"))

  private val protoCodecs = new java.util.concurrent.ConcurrentHashMap[
    ProtoEntry, Array[Byte] => Array[Byte]]()

  private[ros] def codecProto(e: ProtoEntry): Array[Byte] => Array[Byte] =
    protoCodecs.computeIfAbsent(e, { entry =>
      val set = mcap.ProtoDescriptor.parseSet(
        java.util.Base64.getDecoder.decode(entry.srcFdsB64))
      val dst = mcap.Ros2Msg.bundle(entry.dstName, entry.dstDef)
      bytes => graft.ros.mcap.CdrCodec.encode(dst,
        graft.ros.mcap.ProtoCodec.decode(set, entry.srcName, bytes))
    })

  private[ros] val DivergentProtoEntry = ProtoEntry("", "", "", "")

  private def loadFileProtoDefs(f: String): Map[String, Option[ProtoEntry]] = {
    val schemas: Seq[(String, Array[Byte])] = try {
      if (f.endsWith(".mcap"))
        mcap.McapIO.scanIndex(f).schemas.values.toSeq
          .filter(s => s.encoding == "protobuf" && s.data.nonEmpty)
          .map(s => (s.name, s.data))
      else Seq.empty
    } catch { case _: Exception => Seq.empty }
    schemas.groupBy(_._1).map { case (name, ds) =>
      // divergence rule as in loadFileDefs (variant key = the bytes)
      val variants = ds.map(d =>
        java.util.Base64.getEncoder.encodeToString(d._2)).distinct
      name -> (if (variants.size > 1) Some(DivergentProtoEntry)
        else try Some(translateProto(name, ds.head._2)) catch {
          case _: Exception => None
        })
    }
  }

  private val protoFileDefs =
    new SourceDefs.FileDefCache[ProtoEntry](loadFileProtoDefs)

  // ---- the FOURTH crossing: protobuf → ros1msg (rosbag targets) ----

  /** One translatable protobuf type and its ros1msg rendering — the
    * matrix's last cell, closed by COMPOSITION: the descriptor lowers
    * onto the shared bundle frame and renders as ros2msg
    * ([[translateProto]] — injectivity + value-shape validated), and
    * that rendering lowers through [[translateToRos1]] (value-shape
    * validated again), so the proto decode walk and the ros1 encode
    * walk consume the identical flat value stream by transitivity.
    * `md5` is the GENUINE genmsg checksum of the ros1 rendering.
    */
  final case class ProtoRos1Entry(srcName: String, srcFdsB64: String,
      dstName: String, dstDef: String, md5: String)

  def translateProtoToRos1(fq: String, fds: Array[Byte]): ProtoRos1Entry = {
    val mid = translateProto(fq, fds)
    val r1 = translateToRos1(mid.dstName, "ros2msg", mid.dstDef)
    ProtoRos1Entry(fq, mid.srcFdsB64, r1.dstName, r1.dstDef, r1.md5)
  }

  /** [[planProto]] lowered one hop further — failures from EITHER hop
    * surface under the proto type's name.
    */
  def planProtoToRos1(inPath: String)
      : (Map[String, ProtoRos1Entry], Map[String, String]) = {
    val (mid, failures) = planProto(inPath)
    val attempts = mid.toSeq.map { case (n, e) =>
      n -> (try Right(lowerProtoEntry(e)) catch {
        case ex: Exception => Left(ex.getMessage)
      })
    }
    (attempts.collect { case (n, Right(e)) => n -> e }.toMap,
      failures ++ attempts.collect { case (n, Left(m)) => n -> m })
  }

  private def lowerProtoEntry(e: ProtoEntry): ProtoRos1Entry = {
    val r1 = translateToRos1(e.dstName, "ros2msg", e.dstDef)
    ProtoRos1Entry(e.srcName, e.srcFdsB64, r1.dstName, r1.dstDef, r1.md5)
  }

  /** [[pinnedProtoEntries]] lowered to the ros1 rendering. */
  def pinnedProtoRos1Entries(path: String): Map[String, ProtoRos1Entry] =
    pinnedProtoEntries(path).flatMap { case (n, e) =>
      try Some(n -> lowerProtoEntry(e))
      catch { case _: Exception => None }
    }

  /** The translated definitions as the BAG sink's defs-channel
    * entries, genuine genmsg md5s included.
    */
  def inlineProtoRos1Defs(entries: Iterable[ProtoRos1Entry])
      : Seq[DefsHarvest.TypeDef] =
    entries.toSeq.sortBy(_.dstName).map(e => DefsHarvest.TypeDef(
      e.dstName, "ros1msg",
      e.dstDef.getBytes(java.nio.charset.StandardCharsets.UTF_8), e.md5))

  private val protoRos1Codecs = new java.util.concurrent.ConcurrentHashMap[
    ProtoRos1Entry, Array[Byte] => Array[Byte]]()

  /** ONE decode hop (proto wire → flat values) and one encode hop
    * (values → packed ros1) — no intermediate CDR bytes; sound
    * because both hops' value shapes were validated at translation.
    */
  private[ros] def codecProtoToRos1(e: ProtoRos1Entry)
      : Array[Byte] => Array[Byte] =
    protoRos1Codecs.computeIfAbsent(e, { entry =>
      val set = mcap.ProtoDescriptor.parseSet(
        java.util.Base64.getDecoder.decode(entry.srcFdsB64))
      val dst = MsgDefParser.parse(entry.dstName, entry.dstDef)
      bytes => RosSchemaMapper.encode(dst,
        graft.ros.mcap.ProtoCodec.decode(set, entry.srcName, bytes))
    })

  private[ros] val DivergentProtoRos1Entry = ProtoRos1Entry("", "", "", "", "")

  private def loadFileProtoRos1Defs(f: String)
      : Map[String, Option[ProtoRos1Entry]] = {
    val schemas: Seq[(String, Array[Byte])] = try {
      if (f.endsWith(".mcap"))
        mcap.McapIO.scanIndex(f).schemas.values.toSeq
          .filter(s => s.encoding == "protobuf" && s.data.nonEmpty)
          .map(s => (s.name, s.data))
      else Seq.empty
    } catch { case _: Exception => Seq.empty }
    schemas.groupBy(_._1).map { case (name, ds) =>
      val variants = ds.map(d =>
        java.util.Base64.getEncoder.encodeToString(d._2)).distinct
      name -> (if (variants.size > 1) Some(DivergentProtoRos1Entry)
        else try Some(translateProtoToRos1(name, ds.head._2)) catch {
          case _: Exception => None
        })
    }
  }

  private val protoRos1FileDefs =
    new SourceDefs.FileDefCache[ProtoRos1Entry](loadFileProtoRos1Defs)
}
