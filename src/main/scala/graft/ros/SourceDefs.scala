package graft.ros

import java.nio.charset.StandardCharsets.UTF_8

/** EXECUTOR-side, single-file definition harvest — the late-binding
  * complement of the driver-side [[DefsHarvest]]. A standing streaming
  * normalizer resolves its defs channel at query construction; a type
  * FIRST LANDING MID-STREAM (a new robot model) would export with
  * empty definitions until a restart. Instead, the mcap writer falls
  * back here when a row's schema name has no harvested variant: the
  * row's own `file_path` carries the definition (mcap Schema records,
  * bag connection records, db3 `message_definitions` rows), one cached
  * index scan per (executor, file) — the same discovery-at-first-
  * message model the reference uses (FlattenedRosWriter.cpp:277-285),
  * distributed.
  *
  * Transcoded rows carry the RENAMED ros2 type, whose ros2msg
  * definition exists in no container — harvested ros1msg definitions
  * therefore also register under their [[Transcode]] translation.
  */
object SourceDefs {

  /** Re-validate a NEGATIVE answer against the filesystem at most this
    * often per file — a per-lookup stat would put a remote-FS call on
    * the row path for absent types, while never re-checking would miss
    * definitions a tailed file gained after the first scan. Sysprop
    * `graft.sourcedefs.recheck.nanos` overrides (tests set 0).
    */
  private[ros] def recheckNanos: Long =
    sys.props.get("graft.sourcedefs.recheck.nanos").map(_.toLong)
      .getOrElse(10L * 1000 * 1000 * 1000)

  /** Per-JVM per-FILE lookup cache, THE freshness contract for every
    * late-binding definition consumer (this object and both
    * [[Transcode]] directions): cached answers — positive AND negative
    * — serve straight from memory inside the [[recheckNanos]] window;
    * once the window expires, the next lookup re-stats the file and
    * reloads only when the (mtime, length) fingerprint changed
    * (streams tail still-growing files). Cost is one stat per file per
    * window, never per row — but a type that turns DIVERGENT mid-tail
    * (a later-appended same-name connection with a different layout)
    * now flips to its honest divergence answer within one window
    * instead of keeping the stale resolution until restart. NOTE:
    * the sinks' own per-(topic, datatype, file) result caches may
    * still pin an earlier answer within one task; across tasks and
    * epochs the recheck is authoritative.
    */
  private[ros] final class FileDefCache[E](
      load: String => Map[String, Option[E]]) {
    private final case class Cached(fingerprint: String,
        lastStatNanos: Long, entries: Map[String, Option[E]])
    private val cache =
      new java.util.concurrent.ConcurrentHashMap[String, Cached]()

    private def fingerprint(f: String): String =
      try {
        val p = new org.apache.hadoop.fs.Path(f)
        val st = p.getFileSystem(bag.RosbagIO.hadoopConf()).getFileStatus(p)
        s"${st.getModificationTime}:${st.getLen}"
      } catch { case _: Exception => "unavailable" }

    def get(filePath: String, tpe: String): Option[E] = {
      if (filePath == null || filePath.isEmpty) return None
      val now = System.nanoTime()
      val cur = cache.get(filePath)
      if (cur != null && now - cur.lastStatNanos < recheckNanos) {
        // inside the throttle window both answers serve from cache; a
        // type never asked about falls through (one stat, then cached)
        val hit = cur.entries.get(tpe)
        if (hit.isDefined) return hit.get
      }
      val fp = fingerprint(filePath)
      if (fp == "unavailable" && cur != null) {
        // a TRANSIENT stat failure must not clobber known-good answers
        // with a failed reload's empty map (rows written during an FS
        // hiccup would degrade permanently) — keep serving the cached
        // entries, re-arm the throttle, retry next window
        cache.put(filePath, cur.copy(lastStatNanos = now))
        return cur.entries.getOrElse(tpe, None)
      }
      val base =
        if (cur != null && cur.fingerprint == fp) cur.entries
        else load(filePath)
      val entry = base.getOrElse(tpe, None)
      cache.put(filePath, Cached(fp, now, base + (tpe -> entry)))
      entry
    }
  }

  private val cache = new FileDefCache[Seq[(String, Array[Byte])]](
    p => load(p).view.mapValues(Option(_)).toMap)

  /** The (schema encoding, definition bytes) variants file `path`
    * defines for type `name`; empty when the file defines none (or the
    * path is empty / unreadable — the writer then falls back to an
    * empty-definition Schema record, the pre-existing behavior).
    */
  def variantsFor(path: String, name: String): Seq[(String, Array[Byte])] =
    cache.get(path, name).getOrElse(Seq.empty)

  private val ros1Conns = new FileDefCache[(String, String)](loadRos1Conns(_))

  /** The bag-connection (md5sum, definition text) file `path` provides
    * for `datatype` — its own ros1msg definition directly (md5
    * computed per [[RosMd5]] when the source stored none), or the ros1
    * RENDERING of the file's ros2 schema whose translated name matches
    * (the reverse-transcode case) with the rendering's genuine md5.
    */
  def ros1ConnFor(path: String, datatype: String): Option[(String, String)] =
    ros1Conns.get(path, datatype)

  private val ros2Defs = new FileDefCache[(String, String)](loadRos2Defs(_))

  /** Sentinel: the file defines the type DIVERGENTLY (several layouts
    * under one name) — cached as a positive so lookups stop reloading,
    * but distinguishable from plain absence so the db3 sink can
    * surface a diagnostic instead of a silent honest-empty. The empty
    * pair cannot collide with a real definition: loads filter empty
    * texts out.
    */
  private[ros] val DivergentRos2Def: (String, String) = ("", "")

  /** The ros2-dialect (schema encoding, definition text) file `path`
    * provides for type `tpe` — its own ros2msg/ros2idl definition, or
    * the [[Transcode]] translation of its ros1msg definition under the
    * renamed type (the forward-transcode case). None when the file
    * defines the type divergently (honest absent — the db3 defs table
    * holds one row per type; [[ros2DefDivergent]] tells the two
    * absences apart).
    */
  def ros2DefFor(path: String, tpe: String): Option[(String, String)] =
    ros2Defs.get(path, tpe).filter(_ != DivergentRos2Def)

  /** Does `path` define `tpe` DIVERGENTLY (several distinct layouts
    * under one name — per-row attribution impossible)? Serves from the
    * same cache as [[ros2DefFor]]; drives the db3 sink's divergence
    * diagnostic.
    */
  def ros2DefDivergent(path: String, tpe: String): Boolean =
    ros2Defs.get(path, tpe).contains(DivergentRos2Def)

  private def loadRos2Defs(f: String)
      : Map[String, Option[(String, String)]] = {
    val defs: Seq[DefsHarvest.TypeDef] = try {
      if (f.endsWith(".mcap"))
        mcap.McapIO.scanIndex(f).schemas.values.toSeq.filter(_.data.nonEmpty)
          .map(s => DefsHarvest.TypeDef(s.name, s.encoding, s.data, "*"))
      else if (f.endsWith(".db3") || f.endsWith(".db3.zstd"))
        db3.Db3IO.scanMetas(Seq(f)).flatMap(_._2.definitions)
          .filter(_._3.trim.nonEmpty)
          .map { case (tp, enc, text) =>
            DefsHarvest.TypeDef(tp, enc, text.getBytes(UTF_8), "*")
          }
      else if (f.endsWith(".bag"))
        bag.RosbagIO.scanIndexes(Seq(f)).flatMap(_._2.connections)
          .filter(_.msgDef.trim.nonEmpty)
          .map(c => DefsHarvest.TypeDef(c.datatype, "ros1msg",
            c.msgDef.getBytes(UTF_8), c.md5sum))
      else Seq.empty
    } catch { case _: Exception => Seq.empty }
    val direct = defs.filter(d => DefsHarvest.isRos2(d.encoding))
      .map(d => d.name -> (d.encoding, new String(d.data, UTF_8)))
    val translated = defs.filter(_.encoding == "ros1msg").flatMap { d =>
      try {
        val e = Transcode.translate(d.name, new String(d.data, UTF_8))
        Seq(e.dstName -> ("ros2msg", e.dstDef))
      } catch { case _: Exception => Seq.empty }
    } ++ defs.filter(_.encoding == "protobuf").flatMap { d =>
      // transcoded protobuf rows carry the RENAMED ros2 type, whose
      // ros2msg rendering exists in no container — register it so a
      // mid-stream protobuf file late-binds like the ros1 crossing
      try {
        val e = Transcode.translateProto(d.name, d.data)
        Seq(e.dstName -> ("ros2msg", e.dstDef))
      } catch { case _: Exception => Seq.empty }
    }
    (direct.map(_._1) ++ translated.map(_._1)).distinct.map { n =>
      val d = direct.collect { case (`n`, v) => v }.distinct
      val t = translated.collect { case (`n`, v) => v }.distinct
      val chosen = if (d.nonEmpty) d else t
      // several distinct layouts under one name = divergent — the
      // SENTINEL (not None) so consumers can tell "file defines it
      // ambiguously" apart from "file doesn't define it" and surface
      // a diagnostic instead of a silent honest-empty
      n -> Some(if (chosen.size == 1) chosen.head else DivergentRos2Def)
    }.toMap
  }

  private def loadRos1Conns(f: String)
      : Map[String, Option[(String, String)]] = {
    val defs: Seq[DefsHarvest.TypeDef] = try {
      if (f.endsWith(".bag"))
        bag.RosbagIO.scanIndexes(Seq(f)).flatMap(_._2.connections)
          .filter(_.msgDef.trim.nonEmpty)
          .map(c => DefsHarvest.TypeDef(c.datatype, "ros1msg",
            c.msgDef.getBytes(UTF_8), c.md5sum))
      else if (f.endsWith(".mcap"))
        mcap.McapIO.scanIndex(f).schemas.values.toSeq.filter(_.data.nonEmpty)
          .map(s => DefsHarvest.TypeDef(s.name, s.encoding, s.data, "*"))
      else if (f.endsWith(".db3") || f.endsWith(".db3.zstd"))
        db3.Db3IO.scanMetas(Seq(f)).flatMap(_._2.definitions)
          .filter(_._3.trim.nonEmpty)
          .map { case (tp, enc, text) =>
            DefsHarvest.TypeDef(tp, enc, text.getBytes(UTF_8), "*")
          }
      else Seq.empty
    } catch { case _: Exception => Seq.empty }
    val direct = defs.filter(_.encoding == "ros1msg").map { d =>
      val text = new String(d.data, UTF_8)
      val md5 =
        if (d.md5sum != "*") d.md5sum
        else try RosMd5.compute(d.name, text) catch { case _: Exception => "*" }
      d.name -> (md5, text)
    }
    val translated = defs
      .filter(d => DefsHarvest.isRos2(d.encoding)).flatMap { d =>
        try {
          val e = Transcode.translateToRos1(d.name, d.encoding,
            new String(d.data, UTF_8))
          Seq(e.dstName -> (e.md5, e.dstDef))
        } catch { case _: Exception => Seq.empty }
      }
    (direct.map(_._1) ++ translated.map(_._1)).distinct.map { n =>
      // the file's own ros1 text wins over a translated rendering; a
      // file carrying DIVERGENT definitions for one datatype (two
      // same-type connections with different layouts) cannot be
      // attributed per row here — an honest ("*", "") beats a
      // confidently wrong genuine-looking checksum
      val d = direct.collect { case (`n`, v) => v }.distinct
      val t = translated.collect { case (`n`, v) => v }.distinct
      val chosen = if (d.nonEmpty) d else t
      n -> Option(if (chosen.size == 1) chosen.head else ("*", ""))
    }.toMap
  }

  private def load(path: String): Map[String, Seq[(String, Array[Byte])]] = {
    val raw: Seq[DefsHarvest.TypeDef] = try {
      if (path.endsWith(".mcap"))
        mcap.McapIO.scanIndex(path).schemas.toSeq.sortBy(_._1).map(_._2)
          .map(s => DefsHarvest.TypeDef(s.name, s.encoding, s.data, "*"))
      else if (path.endsWith(".bag"))
        bag.RosbagIO.scanIndexes(Seq(path)).flatMap(_._2.connections)
          .map(c => DefsHarvest.TypeDef(c.datatype, "ros1msg",
            c.msgDef.getBytes(UTF_8), c.md5sum))
      else if (path.endsWith(".db3") || path.endsWith(".db3.zstd"))
        db3.Db3IO.scanMetas(Seq(path)).flatMap(_._2.definitions)
          .map { case (tp, enc, text) =>
            DefsHarvest.TypeDef(tp, enc, text.getBytes(UTF_8), "*")
          }
      else Seq.empty
    } catch {
      // unreadable/corrupt source: the write must not fail over a
      // DEFINITION lookup — the row's bytes still land (empty-def
      // Schema record), exactly the no-fallback behavior
      case _: Exception => Seq.empty
    }
    val translated = raw.filter(_.encoding == "ros1msg").flatMap { d =>
      try {
        val e = Transcode.translate(d.name, new String(d.data, UTF_8))
        if (e.dstName != d.name)
          Seq(DefsHarvest.TypeDef(e.dstName, "ros2msg",
            e.dstDef.getBytes(UTF_8), "*"))
        else Seq.empty
      } catch { case _: Exception => Seq.empty }
    } ++ raw.filter(_.encoding == "protobuf").flatMap { d =>
      // the protobuf crossing renames too (graft.test.Ev →
      // graft_test/msg/Ev) — the renamed type's ros2msg rendering must
      // late-bind for mid-stream protobuf files, like the ros1 case
      try {
        val e = Transcode.translateProto(d.name, d.data)
        Seq(DefsHarvest.TypeDef(e.dstName, "ros2msg",
          e.dstDef.getBytes(UTF_8), "*"))
      } catch { case _: Exception => Seq.empty }
    }
    (raw ++ translated).filter(d => d.name.nonEmpty && d.data.nonEmpty)
      .groupBy(_.name).view.mapValues(_.map(d => (d.encoding, d.data)).toSeq)
      .toMap
  }
}
