package graft.ros

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fleet-scale `ros2 bag convert` / `rosbag filter`: normalize a
  * MIXED container directory (or any frame carrying the mixed spine's
  * `topic`/`type`/`timestamp`/`data` columns) into ONE target format,
  * optionally transformed relationally in between.
  *
  * ```scala
  * // archive a mixed upload prefix as one queryable mcap fleet
  * Convert.run(spark, "/uploads/robot7", "/archive/robot7", "mcap",
  *   transform = _.filter(col("topic") =!= "/camera/raw"))
  * ```
  *
  * The read side is [[MixedRead.spine]] (catalog pruning, filter
  * pushdown and metadata aggregation intact per format); the write
  * side is the target's DSv2 sink, so the plan is scan → optional
  * transform → one layout exchange → embarrassingly-parallel encode.
  * Message payloads pass through byte-exact; the TIMESTAMP convention
  * is normalized to nanoseconds by the spine and re-encoded per
  * target ((sec, nsec) receipt pairs for rosbag1).
  *
  * Output LAYOUT: the default (`layout = "time"`) range-partitions on
  * the message timestamp and sorts within partitions, so each output
  * file — and each chunk inside it — covers a tight, disjoint time
  * range. That is what makes the sinks' own index artifacts (mcap
  * ChunkIndex, rosbag ChunkInfo, db3 metadata.yaml ranges) PRUNE on
  * the converted archive: a time-range query over a 100 TB normalized
  * fleet reads only the overlapping chunks. `layout = "roundrobin"`
  * (`repartition(n)`) balances bytes perfectly but smears every
  * chunk's min/max across the whole corpus — time-range reads then
  * re-scan everything; use it only when downstream never filters on
  * time.
  *
  * Schema/connection DEFINITIONS are harvested from the SOURCE
  * containers automatically (mcap Schema records, db3
  * `message_definitions` rows, bag connection records — see
  * [[DefsHarvest]]) and embedded in the target, so typed readers can
  * decode the converted archive with no extra options for same-dialect
  * transfers. Pass the sink's `schema_defs_from`/`conn_defs_from`
  * explicitly to override (explicit paths harvest STRICTLY: a
  * definition the target dialect cannot represent fails loudly;
  * the automatic harvest carries the representable subset).
  */
object Convert {
  /** Conform a mixed-spine frame to `format`'s write spine. The
    * spine's `encoding` column (each source dialect's wire
    * serialization — "cdr", "protobuf", "ros1") labels the target's
    * channels so typed consumers dispatch correctly.
    *
    * rosbag1 has no per-connection encoding field — everything in a
    * `.bag` is ros1 serialization. Converting cdr/protobuf payloads
    * INTO a bag therefore produces a container rosbag tooling can
    * list but never decode; `prepare` refuses such rows loudly unless
    * `allowForeignEncoding` opts in (spine-level consumers can still
    * read the bytes back).
    */
  def prepare(df: DataFrame, format: String,
      allowForeignEncoding: Boolean = false): DataFrame = {
    def c(n: String): Column = col(n)
    val hasEnc = df.columns.contains("encoding")
    val enc: Column = if (hasEnc) c("encoding") else lit("cdr")
    format match {
      case "mcap" => mcap.McapExport.prepare(df,
        topic = c("topic"), logTimeNs = c("timestamp"), data = c("data"),
        schemaName = c("type"), messageEncoding = enc,
        // the spine carries mcap's second clock and per-channel
        // counter (null for bag/db3 sources) — an mcap→mcap convert
        // must not flatten them into log_time / 0
        publishTimeNs =
          if (df.columns.contains("publish_time")) c("publish_time") else null,
        sequence = if (df.columns.contains("sequence")) c("sequence") else null)
      case "rosbag" =>
        val payload =
          if (!hasEnc || allowForeignEncoding) c("data")
          else when(c("encoding") === lit("ros1"), c("data"))
            .otherwise(raise_error(concat(
              lit("rosbag is a ros1-serialization container but this row " +
                "carries a '"), c("encoding"),
              lit("'-encoded payload (topic "), c("topic"),
              lit("): rosbag tooling could not decode the output and this " +
                "engine does not re-serialize across dialects — set " +
                "allow_foreign_encoding=true to embed the bytes anyway " +
                "(spine-level reads only)"))))
        bag.BagExport.prepare(df,
          topic = c("topic"), timeNs = c("timestamp"), data = payload,
          datatype = c("type"))
      case "db3" => db3.Db3Export.prepare(df,
        topic = c("topic"), timestampNs = c("timestamp"), data = c("data"),
        tpe = c("type"), serializationFormat = enc)
      case other => throw new IllegalArgumentException(
        s"unknown target container format '$other' (mcap | rosbag | db3)")
    }
  }

  /** The prepared frame's message-time columns, in sort-significance
    * order — what the "time" layout ranges and sorts on.
    */
  private def timeCols(format: String): Seq[Column] = format match {
    case "mcap" => Seq(col("log_time"))
    case "rosbag" => Seq(col("time_sec"), col("time_nsec"))
    case "db3" => Seq(col("timestamp"))
    case other => throw new IllegalArgumentException(
      s"unknown target container format '$other' (mcap | rosbag | db3)")
  }

  private def applyLayout(prepared: DataFrame, format: String,
      partitions: Int, layout: String): DataFrame = layout match {
    case "time" =>
      val ts = timeCols(format)
      val ranged =
        if (partitions > 0) prepared.repartitionByRange(partitions, ts: _*)
        else prepared
      ranged.sortWithinPartitions(ts: _*)
    case "roundrobin" =>
      if (partitions > 0) prepared.repartition(partitions) else prepared
    case other => throw new IllegalArgumentException(
      s"unknown layout '$other' (time | roundrobin)")
  }

  private[ros] def defsOptionName(format: String): String =
    if (format == "rosbag") "conn_defs_from" else "schema_defs_from"

  /** The Convert-consumed options (not forwarded to the sink). */
  private val ConvertOnly =
    Set("allow_foreign_encoding", "carry_attachments", "target_file_mb",
      "transcode")

  /** Parse the `transcode` option: "off" (default — payloads pass
    * through byte-exact), "strict" (alias "true" — every ros1 row
    * re-encodes as CDR, untranslatable definitions fail loudly) or
    * "auto" (translatable rows re-encode, the rest byte-embed under
    * their original encoding).
    */
  private def transcodeMode(options: Map[String, String]): String =
    options.collectFirst {
      case (k, v) if k.equalsIgnoreCase("transcode") => v.toLowerCase
    } match {
      case None | Some("false") | Some("off") => "off"
      case Some("true") | Some("strict") => "strict"
      case Some("auto") => "auto"
      case Some(other) => throw new IllegalArgumentException(
        s"transcode must be off | auto | strict (true), got '$other'")
    }

  /** Resolve the transcode plan for `inPath` and rewrite `spine`'s
    * ros1 rows to CDR ([[Transcode.toCdr]]). Returns the rewritten
    * frame plus the sink options feeding the TRANSLATED definitions
    * into the target's defs channel, and whether every harvested ros1
    * definition translated (drives the mcap profile choice).
    */
  private def applyTranscode(spine: DataFrame, mode: String, format: String,
      inPath: String, options: Map[String, String] = Map.empty)
      : (DataFrame, Map[String, String], Boolean) = {
    if (mode == "off") return (spine, Map.empty, false)
    require(format == "mcap" || format == "db3",
      s"transcode re-encodes toward CDR containers (mcap | db3), not '$format'")
    val (entries, failures) = Transcode.plan(inPath)
    if (failures.nonEmpty) {
      val detail = failures.toSeq.sortBy(_._1).take(5)
        .map { case (n, m) => s"$n: $m" }.mkString("; ")
      if (mode == "strict") throw new IllegalArgumentException(
        s"transcode: ${failures.size} ros1msg definition(s) under $inPath " +
          s"do not translate to ros2msg ($detail) — fix the definitions " +
          "or pass transcode=auto to embed those rows as ros1 bytes")
      logger.warn(s"transcode: ${failures.size} ros1msg definition(s) " +
        s"under $inPath do not translate and will byte-embed ($detail)")
    }
    val defsOpt =
      if (entries.isEmpty) Map.empty[String, String]
      else {
        // merge with (never override) a caller-passed inline channel
        val mine = DefsHarvest.encodeInline(Transcode.inlineDefs(entries.values))
        val user = options.collectFirst {
          case (k, v) if k.equalsIgnoreCase("schema_defs_inline") => v
        }
        Map("schema_defs_inline" -> user.map(u => u + "\n" + mine).getOrElse(mine))
      }
    (Transcode.toCdr(spine, entries, strict = mode == "strict"),
      defsOpt, failures.isEmpty)
  }

  /** Parse `target_file_mb`, naming the option in every failure. */
  private def targetFileMb(options: Map[String, String]): Option[Long] =
    options.collectFirst {
      case (k, v) if k.equalsIgnoreCase("target_file_mb") =>
        val mb = try v.toLong catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"target_file_mb must be a positive integer MB count, got '$v'")
        }
        require(mb > 0, s"target_file_mb must be positive, got $mb")
        mb
    }

  /** ceil(inputBytes / target), clamped LOUDLY: a count past Int range
    * would wrap and silently skip the repartition.
    */
  private[ros] def partitionsFor(inputBytes: Long, mb: Long): Int = {
    val n = math.max(1L, (inputBytes + mb * 1000000L - 1) / (mb * 1000000L))
    require(n <= Int.MaxValue,
      s"target_file_mb=$mb on $inputBytes input bytes needs $n output " +
        "files — beyond Spark's partition count; raise target_file_mb")
    n.toInt
  }

  private def boolOpt(options: Map[String, String], name: String,
      default: Boolean = false): Boolean =
    options.collectFirst {
      case (k, v) if k.equalsIgnoreCase(name) => java.lang.Boolean.parseBoolean(v)
    }.getOrElse(default)

  private val logger = org.slf4j.LoggerFactory.getLogger(Convert.getClass)

  /** Auto-wire the target sink's definitions channel to the SOURCE
    * path when the caller did not: the sources already carry the
    * definitions, and a converted archive only spine-level consumers
    * can decode typed is a day-one defect for every typed consumer.
    * The automatic harvest is best-effort (`foreign_defs=skip`): a
    * definition the target dialect cannot represent is dropped, never
    * fatal — an EXPLICIT defs path keeps the strict default.
    */
  private def autoDefs(options: Map[String, String], format: String,
      inPath: String): Map[String, String] = {
    val optName = defsOptionName(format)
    if (options.keys.exists(_.equalsIgnoreCase(optName))) Map.empty
    else if (options.keys.exists(_.equalsIgnoreCase("foreign_defs")))
      // the user pinned the dialect policy (e.g. foreign_defs=error to
      // make even the automatic harvest strict) — honor it
      Map(optName -> inPath)
    else Map(optName -> inPath, "foreign_defs" -> "skip")
  }

  /** The mcap header profile, derived from the SOURCES' message
    * encodings when the caller didn't pick one: "ros2" is only
    * conformant when every channel is cdr, so a corpus carrying
    * protobuf or ros1 payloads exports under the spec's "" (no
    * profile) instead — conformance checkers would reject a
    * ros2-profile file with non-cdr channels. With `ros1Transcoded`
    * (every harvested ros1 definition translated and transcode is
    * on), "ros1" counts as cdr — those rows re-encode before the sink
    * sees them.
    *
    * Derivation is METADATA-ONLY (one cached index sweep, no data
    * scan), so it reflects the SOURCES, not the `transform`'s output:
    * a transform that unions in rows of another encoding must pass
    * `profile` explicitly or the header may overclaim.
    */
  private def autoProfile(options: Map[String, String], format: String,
      inPath: String, ros1Transcoded: Boolean = false): Map[String, String] =
    if (format != "mcap" || options.keys.exists(_.equalsIgnoreCase("profile")))
      Map.empty
    else {
      val encs0 = DefsHarvest.messageEncodings(inPath)
      val encs =
        if (ros1Transcoded) encs0.map(e => if (e == "ros1") "cdr" else e)
        else encs0
      Map("profile" -> (if (encs.nonEmpty && encs.forall(_ == "cdr")) "ros2"
        else ""))
    }

  /** Read `inPath` as a mixed spine, apply `transform`, write
    * `format` containers to `outPath`. `partitions` > 0 controls the
    * output file count (one container file per partition — size for
    * the target filesystem, not for the input's layout); with
    * `partitions = 0`, option `target_file_mb` derives the count from
    * the SOURCE bytes (ceil(inputBytes / target) — a 100 TB corpus
    * with target_file_mb=512 plans ~200k files without the caller
    * pre-counting bytes; compression makes actual files smaller, a
    * conservative direction for file-count limits). `layout` picks
    * how rows land in those files ("time", the default, clusters and
    * sorts by message time so the output's own chunk indexes prune
    * time-range reads; "roundrobin" balances bytes but destroys time
    * locality).
    *
    * Source mcap ATTACHMENTS and METADATA records (calibration blobs,
    * URDFs, run descriptions) carry over when the target is mcap:
    * they land in one `attachments.mcap` alongside the message files
    * (zero messages — the side-table reads list them with the rest of
    * the directory), streamed one record at a time so driver memory
    * is bounded by the largest attachment. Silently dropping them
    * would lose exactly the data a re-calibration needs; option
    * `carry_attachments=false` opts out. Non-mcap targets have no
    * attachment concept — records are NOT carried and a loud log line
    * is the best the format allows.
    */
  def run(spark: SparkSession, inPath: String, outPath: String,
      format: String, partitions: Int = 0,
      transform: DataFrame => DataFrame = identity,
      options: Map[String, String] = Map.empty,
      mode: String = "append", layout: String = "time"): Unit = {
    val spine0 = transform(MixedRead.spine(spark, inPath))
    val (spine, transcodeDefs, ros1Transcoded) =
      applyTranscode(spine0, transcodeMode(options), format, inPath, options)
    val prepared = prepare(spine, format,
      allowForeignEncoding = boolOpt(options, "allow_foreign_encoding"))
    val effParts =
      if (partitions > 0) partitions
      else targetFileMb(options).map { mb =>
        val inputBytes = DriverPool.totalBytes(
          MixedRead.resolve(inPath).values.flatten.toSeq,
          graft.ros.bag.RosbagIO.hadoopConf())
        partitionsFor(inputBytes, mb)
      }.getOrElse(0)
    val sized = applyLayout(prepared, format, effParts, layout)
    val sinkOpts = options.filterNot(kv => ConvertOnly(kv._1.toLowerCase)) ++
      autoDefs(options, format, inPath) ++
      autoProfile(options, format, inPath, ros1Transcoded) ++ transcodeDefs
    sinkOpts.foldLeft(sized.write.format(format).mode(mode)) {
      case (w, (k, v)) => w.option(k, v)
    }.save(outPath)
    val carry = boolOpt(options, "carry_attachments", default = true)
    if (format == "mcap" && carry) carryAttachments(inPath, outPath)
    else if (format != "mcap" && carry) warnDroppedAttachments(inPath, format)
  }

  /** The loud line for targets that cannot represent mcap side
    * records (metadata scans are cached; this is cheap).
    */
  private def warnDroppedAttachments(inPath: String, format: String): Unit = {
    val carriers = MixedRead.resolve(inPath).getOrElse("mcap", Seq.empty)
      .count { f =>
        val i = mcap.McapIO.scanIndex(f)
        i.attachmentRefs.nonEmpty || i.metadataRefs.nonEmpty
      }
    if (carriers > 0) logger.warn(
      s"convert: $carriers source mcap file(s) under $inPath carry " +
        s"attachment/metadata records that a '$format' target cannot " +
        "represent — they are NOT carried (convert to mcap to keep them)")
  }

  /** Stream every source Attachment/Metadata record into ONE
    * `attachments.mcap` under `outPath` (temp + rename). Append-mode
    * re-runs MERGE by record identity — the archive's messages
    * accumulate across appends, so its attachment dimension must too
    * (a previous run's calibrations stay with their messages; a
    * re-run of the same sources adds nothing twice); an overwrite's
    * sink commit already deleted the previous file. The dimension is
    * tiny next to the message volume — a fleet's calibrations — so a
    * driver-side sequential copy is the right scale shape; each body
    * is read and written one record at a time.
    */
  private def carryAttachments(inPath: String, outPath: String): Unit = {
    import graft.ros.mcap.{McapFormat, McapIO}
    val mcaps = MixedRead.resolve(inPath).getOrElse("mcap", Seq.empty)
    val refs = mcaps.map(f => f -> McapIO.scanIndex(f))
      .filter { case (_, i) => i.attachmentRefs.nonEmpty || i.metadataRefs.nonEmpty }
    if (refs.isEmpty) return
    val fs = new org.apache.hadoop.fs.Path(outPath)
      .getFileSystem(graft.ros.bag.RosbagIO.hadoopConf())
    val fin = new org.apache.hadoop.fs.Path(outPath, "attachments.mcap")
    val tmp = new org.apache.hadoop.fs.Path(outPath, ".attachments.mcap.inprogress")
    // prior generation first (so a merged re-write keeps its records),
    // then the sources; identity keys dedupe re-runs
    val sources: Seq[(String, McapFormat.McapIndex)] =
      (if (fs.exists(fin)) {
        val p = fin.toString
        Seq(p -> McapIO.scanIndex(p))
      } else Seq.empty) ++ refs
    // identity includes a CONTENT crc: two distinct same-named
    // same-size blobs (two robots' fixed-size calibrations) must both
    // survive the merge
    def contentCrc(a: McapFormat.McapAttachment): Long =
      if (a.crc != 0L) a.crc
      else {
        val c = new java.util.zip.CRC32()
        c.update(a.data, 0, a.data.length)
        c.getValue
      }
    val seenAtt =
      scala.collection.mutable.HashSet[(Long, Long, String, String, Long, Long)]()
    val seenMeta = scala.collection.mutable.HashSet[(String, Seq[(String, String)])]()
    val out = new java.io.BufferedOutputStream(fs.create(tmp, true), 1 << 16)
    try {
      val w = new graft.ros.mcap.McapStreamingWriter(out, "", 4 * 1024 * 1024,
        profile = "")
      sources.foreach { case (f, idx) =>
        idx.attachmentRefs.foreach { case (off, len) =>
          val a = McapFormat.parseAttachment(McapIO.readPayload(f, off, len))
          if (seenAtt.add((a.logTime, a.createTime, a.name, a.mediaType,
              a.data.length.toLong, contentCrc(a))))
            w.writeAttachment(a.logTime, a.createTime, a.name, a.mediaType, a.data)
        }
        idx.metadataRefs.foreach { case (off, len) =>
          val (name, kv) = McapFormat.parseMetadata(McapIO.readPayload(f, off, len))
          if (seenMeta.add((name, kv))) w.writeMetadata(name, kv)
        }
      }
      w.finish()
      out.close()
    } catch {
      case t: Throwable =>
        // no .inprogress debris on a failed carry (corrupt source crc,
        // I/O error mid-copy) — mirror the sinks' abort hygiene
        try out.close() catch { case _: java.io.IOException => () }
        fs.delete(tmp, false)
        throw t
    }
    if (fs.exists(fin)) fs.delete(fin, false)
    require(fs.rename(tmp, fin),
      s"convert: attachments.mcap publish failed under $outPath")
  }

  /** The CONTINUOUS convert: a fleet-upload prefix receiving `.bag` +
    * `.mcap` + `.db3` at any time ([[MixedRead.stream]]) normalizes
    * into an ever-growing `format` archive through the streaming sink
    * — exactly-once per the sinks' deterministic (query, epoch,
    * partition) naming, resumable from `checkpoint`. Returns the
    * started query; pass `Trigger.AvailableNow()` for a drain-and-stop
    * catch-up run, or a processing-time trigger for a standing
    * normalizer.
    *
    * Definitions auto-wire like [[run]] when files are already present
    * under `inPath` at START (the harvest is a query-construction-time
    * scan; types first landing mid-stream export with empty
    * definitions until the next restart — pass `schema_defs_from`
    * explicitly to pin a definitive source). Attachments/metadata
    * carry the same way for mcap targets: records present at start
    * merge into `attachments.mcap` now, later-landing ones on the
    * next (re)start — the identity merge makes restarts idempotent.
    * Layout: each epoch's files hold only that epoch's time window,
    * so time locality is already micro-batch-granular; Structured
    * Streaming forbids per-partition sorts, so no further clustering
    * applies.
    */
  def runStream(spark: SparkSession, inPath: String, outPath: String,
      format: String, checkpoint: String,
      transform: DataFrame => DataFrame = identity,
      options: Map[String, String] = Map.empty,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    // streaming output files are per (epoch, partition) — an epoch's
    // volume varies with arrival, so a bytes-per-file target cannot be
    // honored; refuse loudly rather than silently ignore it (size a
    // standing normalizer via the trigger interval + source options)
    require(targetFileMb(options).isEmpty,
      "target_file_mb applies to batch Convert.run only: streaming " +
        "epochs size by arrival, not by a per-file byte target")
    // an empty / not-yet-created prefix is a legal stream start — skip
    // the defs auto-wire rather than fail (nothing to harvest yet)
    val resolvable = scala.util.Try(MixedRead.resolve(inPath)).isSuccess
    val spine0 = transform(MixedRead.stream(spark, inPath))
    val mode = transcodeMode(options)
    val (spine, transcodeDefs, ros1Transcoded) =
      if (mode == "off") (spine0, Map.empty[String, String], false)
      else if (resolvable) applyTranscode(spine0, mode, format, inPath, options)
      else {
        // nothing to plan from yet: the per-file fallback inside the
        // transcode UDF harvests definitions as files land
        require(format == "mcap" || format == "db3",
          s"transcode re-encodes toward CDR containers (mcap | db3), not '$format'")
        (Transcode.toCdr(spine0, Map.empty, strict = mode == "strict"),
          Map.empty[String, String], false)
      }
    val prepared = prepare(spine, format,
      allowForeignEncoding = boolOpt(options, "allow_foreign_encoding"))
    val auto =
      if (resolvable)
        autoDefs(options, format, inPath) ++
          autoProfile(options, format, inPath, ros1Transcoded) ++ transcodeDefs
      else Map.empty[String, String]
    if (resolvable && boolOpt(options, "carry_attachments", default = true)) {
      if (format == "mcap") carryAttachments(inPath, outPath)
      else warnDroppedAttachments(inPath, format)
    }
    val sinkOpts = options.filterNot(kv => ConvertOnly(kv._1.toLowerCase)) ++ auto
    sinkOpts.foldLeft(
      prepared.writeStream.format(format)
        .option("checkpointLocation", checkpoint)
        .outputMode("append").trigger(trigger)) {
      case (w, (k, v)) => w.option(k, v)
    }.start(outPath)
  }
}
