package graft.ros.bag

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.sources.Filter

/** Micro-batch streaming over a growing bag file — the live "rosnode"
  * the reference contemplates but never builds (reference
  * rosbag2parquet.cpp:37). The offset is the count of complete chunks:
  * each trigger re-scans the bag index and plans one InputPartition per
  * NEW chunk, so `spark.readStream.format("rosbag").load(path)` tails a
  * bag being appended to (chunks are immutable once written — the bag
  * format is append-only, so offsets are stable and replayable from the
  * checkpoint).
  */
final case class RosbagOffset(chunkCount: Long) extends Offset {
  override def json(): String = s"""{"chunkCount":$chunkCount}"""
}

class RosbagMicroBatchStream(path: String, required: StructType,
    filters: Array[Filter], typed: Option[(String, String, String)] = None,
    includeRaw: Boolean = false)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  override def initialOffset(): Offset = RosbagOffset(0L)

  // Trigger.AvailableNow: pin the end ONCE at query start so the run
  // drains exactly what existed then and terminates even while the
  // recorder keeps appending chunks.
  private var availableNowEnd: Option[Offset] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(computeLatestOffset())

  override def latestOffset(): Offset =
    availableNowEnd.getOrElse(computeLatestOffset())

  // admission-control form (SupportsTriggerAvailableNow extends it);
  // chunk counts have no meaningful rate limit — serve the current end,
  // floored at `start`: a truncated/replaced file (outside the
  // append-only contract) must not regress the offset, or the next
  // trigger would re-plan already-committed chunk indexes against the
  // new bytes and emit duplicate rows
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val cur = latestOffset().asInstanceOf[RosbagOffset].chunkCount
    RosbagOffset(math.max(cur, start.asInstanceOf[RosbagOffset].chunkCount))
  }

  private def computeLatestOffset(): Offset =
    RosbagOffset(RosbagIO.scanIndex(path).chunks.size.toLong)

  override def deserializeOffset(json: String): Offset = {
    val n = """\d+""".r.findFirstIn(json)
      .getOrElse(throw new IllegalArgumentException(s"bad offset $json")).toLong
    RosbagOffset(n)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[RosbagOffset].chunkCount.toInt
    val e = end.asInstanceOf[RosbagOffset].chunkCount.toInt
    if (e <= s) return Array.empty
    val index = RosbagIO.scanIndex(path)
    val conns0 = index.connections.map(c => c.connId -> c).toMap
    // drop mismatched same-datatype connections — the md5-variant
    // filter the batch scan and the directory stream already apply;
    // without it a divergent bag's other variant decodes under the
    // wrong bundle
    val conns = typed match {
      case Some((dt, _, md5)) => conns0.filter { case (_, c) =>
        c.datatype != dt || c.md5sum == md5 }
      case None => conns0
    }
    index.chunks.zipWithIndex.slice(s, e).map { case (c, i) =>
      RosbagInputPartition(path, i, c, conns): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = typed match {
    case Some((dt, msgDef, _)) =>
      new RosbagTypedReaderFactory(dt, msgDef, required, includeRaw, filters)
    case None => new RosbagReaderFactory(required, filters, limit = -1)
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Offset of a directory stream: per-bag complete-chunk counts. JSON
  * shape `{"bags":{"<path>":<chunks>,...}}`, emitted sorted so equal
  * offsets serialize identically.
  */
final case class RosbagDirOffset(bags: Map[String, Long]) extends Offset {
  override def json(): String =
    bags.toSeq.sortBy(_._1).map { case (p, n) =>
      "\"" + RosbagDirOffset.esc(p) + "\":" + n
    }.mkString("{\"bags\":{", ",", "}}")
}

object RosbagDirOffset {
  // FULL JSON string escaping incl. control characters: the offset is
  // stored in Spark's LINE-delimited offset log, so a raw newline in a
  // path (legal on POSIX) would split the checkpoint entry across
  // lines and brick recovery
  // private[ros]: the mcap dir stream reuses the same offset-JSON
  // escaping (same line-delimited-offset-log rationale)
  private[ros] def esc(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }
  private[ros] def unesc(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s(i) == '\\' && i + 1 < s.length) {
        s(i + 1) match {
          case 'n' => sb += '\n'; i += 2
          case 'r' => sb += '\r'; i += 2
          case 't' => sb += '\t'; i += 2
          case 'u' if i + 5 < s.length =>
            sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
          case c => sb += c; i += 2
        }
      } else { sb += s(i); i += 1 }
    }
    sb.toString
  }
  /** Parse the shape json() writes: quoted-path : integer pairs (the
    * "bags" key itself never matches — its value is an object, not an
    * integer).
    */
  def parse(json: String): RosbagDirOffset = {
    val pair = """"((?:[^"\\]|\\.)*)"\s*:\s*(\d+)""".r
    RosbagDirOffset(pair.findAllMatchIn(json).map(m =>
      unesc(m.group(1)) -> m.group(2).toLong).toMap)
  }
}

/** Micro-batch streaming over a DIRECTORY (or glob) of bags — the
  * fleet-ingest shape: drives upload finished (or still-growing) bags
  * into a prefix, and each trigger re-lists the path, indexes any new
  * bag, and plans one InputPartition per NEW chunk of every bag. Bags
  * are append-only (chunk indexes are stable once written), so offsets
  * replay exactly from the checkpoint; a bag that disappears keeps its
  * committed count and simply contributes no new chunks. Typed dir
  * streams pin the (datatype, md5) variant resolved at stream start —
  * connections of the same datatype with a DIFFERENT definition are
  * dropped from the partition's connection map, so a drifted bag
  * arriving mid-stream is skipped for this stream rather than decoded
  * with the wrong definition (read it with its own `option("md5",...)`
  * stream).
  */
class RosbagDirMicroBatchStream(path: String, required: StructType,
    filters: Array[Filter], typed: Option[RosbagTypedRead.TypedTarget] = None,
    includeRaw: Boolean = false)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  override def initialOffset(): Offset = RosbagDirOffset(Map.empty)

  // Trigger.AvailableNow: pin the end ONCE at query start (same
  // drain-then-terminate contract as the single-file stream).
  private var availableNowEnd: Option[Offset] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(computeLatestOffset())

  override def latestOffset(): Offset =
    availableNowEnd.getOrElse(computeLatestOffset())

  // The served end is the current listing UNIONED with `start` (per-bag
  // max): a bag that transiently drops out of the listing (deleted and
  // re-uploaded, or its index scan fails this trigger) must keep its
  // committed chunk count in the offset chain — if it were simply
  // omitted, the next start would no longer contain it and its
  // reappearance would re-plan every chunk from 0, duplicating rows.
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val cur = latestOffset().asInstanceOf[RosbagDirOffset].bags
    val base = start.asInstanceOf[RosbagDirOffset].bags
    RosbagDirOffset(base.foldLeft(cur) { case (acc, (p, n)) =>
      acc.updated(p, math.max(n, acc.getOrElse(p, 0L)))
    })
  }

  private def computeLatestOffset(): Offset = {
    // an empty/not-yet-created prefix is a stream with nothing to read
    // yet, not an error
    val bags = try RosbagIO.resolveBags(path) catch {
      case _: IllegalArgumentException | _: java.io.FileNotFoundException => Seq.empty
    }
    // tolerant: a bag deleted between the listing and the index open is
    // simply not offered this trigger (it keeps any committed count)
    RosbagDirOffset(RosbagIO.scanIndexesTolerant(bags)
      .map { case (b, index) => b -> index.chunks.size.toLong }.toMap)
  }

  override def deserializeOffset(json: String): Offset = RosbagDirOffset.parse(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[RosbagDirOffset].bags
    val e = end.asInstanceOf[RosbagDirOffset].bags
    // same plan-time pruning as the batch scan: bag_path filters skip
    // whole bags, chunk-info time ranges skip chunks — offsets still
    // advance over pruned ranges (they are committed as read)
    e.toSeq.sortBy(_._1)
      .filter { case (bag, _) => filters.forall(f => RosbagFilters.bagMayMatch(f, bag)) }
      .flatMap { case (bag, until) =>
        val from = s.getOrElse(bag, 0L).toInt
        if (until <= from) Nil
        else {
          // Same delete/rename tolerance as latestOffset: a bag that
          // vanished AFTER latestOffset offered it (uploader deleted or
          // renamed it mid-trigger) contributes nothing this batch.
          // Strict here would be worse than lost data — the checkpoint
          // replays the uncommitted batch on every restart, hitting
          // FileNotFoundException forever and permanently wedging the
          // stream. Rows in already-deleted chunks are gone either way;
          // skipping commits the offset and the stream moves on.
          val indexOpt =
            try Some(RosbagIO.scanIndex(bag))
            catch { case _: java.io.FileNotFoundException => None }
          indexOpt.toSeq.flatMap { index =>
            val conns0 = index.connections.map(c => c.connId -> c).toMap
            val conns = typed match {
              case Some(t) => conns0.filter { case (_, c) =>
                c.datatype != t.datatype || c.md5sum == t.md5 }
              case None => conns0
            }
            index.chunks.zipWithIndex.slice(from, until.toInt)
              .filter { case (c, _) => filters.forall(f => RosbagFilters.chunkMayMatch(f, c)) }
              .map { case (c, i) => RosbagInputPartition(bag, i, c, conns): InputPartition }
          }
        }
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = typed match {
    case Some(t) =>
      new RosbagTypedReaderFactory(t.datatype, t.msgDef, required, includeRaw, filters)
    case None => new RosbagReaderFactory(required, filters, limit = -1)
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
