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

  private val cache = new java.util.concurrent.ConcurrentHashMap[
    String, Map[String, Seq[(String, Array[Byte])]]]()

  /** The (schema encoding, definition bytes) variants file `path`
    * defines for type `name`; empty when the file defines none (or the
    * path is empty / unreadable — the writer then falls back to an
    * empty-definition Schema record, the pre-existing behavior).
    */
  def variantsFor(path: String, name: String): Seq[(String, Array[Byte])] =
    if (path == null || path.isEmpty) Seq.empty
    else cache.computeIfAbsent(path, load(_)).getOrElse(name, Seq.empty)

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
