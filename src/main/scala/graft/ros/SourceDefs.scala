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

  private final case class CachedDefs(fingerprint: String,
      lastStatNanos: Long, defs: Map[String, Seq[(String, Array[Byte])]])

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, CachedDefs]()

  /** Re-validate a NEGATIVE answer against the filesystem at most this
    * often per file — a per-lookup stat would put a remote-FS call on
    * the row path for absent types, while never re-checking would miss
    * definitions a tailed file gained after the first scan. Sysprop
    * `graft.sourcedefs.recheck.nanos` overrides (tests set 0).
    */
  private[ros] def recheckNanos: Long =
    sys.props.get("graft.sourcedefs.recheck.nanos").map(_.toLong)
      .getOrElse(10L * 1000 * 1000 * 1000)

  private def fingerprint(f: String): String =
    try {
      val p = new org.apache.hadoop.fs.Path(f)
      val st = p.getFileSystem(bag.RosbagIO.hadoopConf()).getFileStatus(p)
      s"${st.getModificationTime}:${st.getLen}"
    } catch { case _: Exception => "unavailable" }

  /** The (schema encoding, definition bytes) variants file `path`
    * defines for type `name`; empty when the file defines none (or the
    * path is empty / unreadable — the writer then falls back to an
    * empty-definition Schema record, the pre-existing behavior).
    *
    * Freshness: streams TAIL still-growing containers, so a cached
    * scan can predate the Schema record a later chunk introduced.
    * Positive answers serve from cache (definitions are immutable per
    * schema record); a MISS re-stats the file — throttled to once per
    * [[RecheckNanos]] — and reloads only when its (mtime, length)
    * changed.
    */
  def variantsFor(path: String, name: String): Seq[(String, Array[Byte])] = {
    if (path == null || path.isEmpty) return Seq.empty
    val now = System.nanoTime()
    val cur = cache.get(path)
    if (cur != null) {
      val hit = cur.defs.get(name)
      if (hit.exists(_.nonEmpty)) return hit.get
      if (hit.isDefined && now - cur.lastStatNanos < recheckNanos)
        return Seq.empty
    }
    val fp = fingerprint(path)
    val base =
      if (cur != null && cur.fingerprint == fp) cur.defs else load(path)
    val vs = base.getOrElse(name, Seq.empty)
    cache.put(path, CachedDefs(fp, now, base + (name -> vs)))
    vs
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
    }
    (raw ++ translated).filter(d => d.name.nonEmpty && d.data.nonEmpty)
      .groupBy(_.name).view.mapValues(_.map(d => (d.encoding, d.data)).toSeq)
      .toMap
  }
}
