package graft.ros.mcap

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** Offset of an MCAP stream: per-file (complete chunks, standalone
  * messages) counts. Both counts are stable under append (the data
  * section is immutable once written), so offsets replay exactly from
  * the checkpoint. JSON shape `{"files":{"<path>":[chunks,inline],...}}`,
  * emitted sorted so equal offsets serialize identically; path
  * escaping shared with the rosbag dir offset (the offset log is
  * line-delimited — a raw newline in a path would split the entry).
  */
final case class McapStreamOffset(files: Map[String, (Long, Long)]) extends Offset {
  override def json(): String =
    files.toSeq.sortBy(_._1).map { case (p, (c, i)) =>
      "\"" + graft.ros.bag.RosbagDirOffset.esc(p) + "\":[" + c + "," + i + "]"
    }.mkString("{\"files\":{", ",", "}}")
}

object McapStreamOffset {
  /** Parse the shape json() writes: quoted-path : [int,int] pairs (the
    * "files" key itself never matches — its value is an object).
    */
  def parse(json: String): McapStreamOffset = {
    val pair = """"((?:[^"\\]|\\.)*)"\s*:\s*\[(\d+),(\d+)\]""".r
    McapStreamOffset(pair.findAllMatchIn(json).map(m =>
      graft.ros.bag.RosbagDirOffset.unesc(m.group(1)) ->
        (m.group(2).toLong, m.group(3).toLong)).toMap)
  }
}

/** Micro-batch streaming over MCAP input — a single STILL-GROWING file
  * (live recorder: the tolerant-tail walk needs no footer), a
  * directory of `*.mcap` uploads, or a glob; the fleet-ingest sibling
  * of the rosbag dir stream over the successor container. Each
  * trigger re-lists the path, extends each file's resumable tolerant
  * walk (paying only for NEW bytes — `McapIO.scanTolerant`), and
  * plans one InputPartition per NEW complete chunk plus one for any
  * NEW standalone messages. A file that disappears after being
  * offered keeps its committed counts and contributes nothing — same
  * delete/rename tolerance (and same wedged-checkpoint rationale) as
  * the rosbag dir stream.
  *
  * Typed streams pin the (schema_name, md5) variant resolved at
  * stream start: a DRIFTED file arriving mid-stream has its
  * mismatched same-name channels dropped from the partition map (and
  * its partitions skipped entirely when it carries no matching
  * schema), so it is skipped for this stream rather than decoded
  * with the wrong definition — read it with its own
  * `option("schema_md5", ...)` stream.
  */
class McapMicroBatchStream(path: String, required: StructType,
    filters: Array[Filter], typed: Option[McapTypedRead.TypedTarget] = None,
    includeRaw: Boolean = false)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  override def initialOffset(): Offset = McapStreamOffset(Map.empty)

  // Trigger.AvailableNow contract: pin the end offset ONCE at query
  // start so the run drains exactly what existed then and terminates
  // even while recorders keep appending.
  private var availableNowEnd: Option[Offset] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(computeLatestOffset())

  override def latestOffset(): Offset =
    availableNowEnd.getOrElse(computeLatestOffset())

  // admission-control form (SupportsTriggerAvailableNow extends it);
  // chunk counts have no meaningful rate limit — serve the current end
  // UNIONED with `start` (per-file, per-count max): a file that
  // transiently drops out (deleted and re-uploaded, or its walk fails
  // this trigger) must keep its committed counts in the offset chain —
  // if simply omitted, the next start would no longer contain it and
  // its reappearance would re-plan from (0,0), duplicating rows.
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val cur = latestOffset().asInstanceOf[McapStreamOffset].files
    val base = start.asInstanceOf[McapStreamOffset].files
    McapStreamOffset(base.foldLeft(cur) { case (acc, (p, (c, i))) =>
      val (c0, i0) = acc.getOrElse(p, (0L, 0L))
      acc.updated(p, (math.max(c, c0), math.max(i, i0)))
    })
  }

  private def computeLatestOffset(): Offset = {
    // an empty/not-yet-created prefix is a stream with nothing to read
    // yet, not an error
    val files = try McapIO.resolveFiles(path) catch {
      case _: IllegalArgumentException | _: java.io.FileNotFoundException => Seq.empty
    }
    McapStreamOffset(files.flatMap { f =>
      // a file deleted between the listing and the stat/walk is simply
      // not offered this trigger (it keeps any committed counts)
      try {
        val idx = McapIO.scanTolerant(f)
        Some(f -> (idx.chunks.size.toLong, idx.inlineMessages.size.toLong))
      } catch { case _: java.io.FileNotFoundException => None }
    }.toMap)
  }

  override def deserializeOffset(json: String): Offset = McapStreamOffset.parse(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[McapStreamOffset].files
    val e = end.asInstanceOf[McapStreamOffset].files
    e.toSeq.sortBy(_._1)
      .filter { case (f, _) => filters.forall(fl => McapFilters.fileMayMatch(fl, f)) }
      .flatMap { case (f, (untilChunks, untilInline)) =>
        val (fromChunks, fromInline) = s.getOrElse(f, (0L, 0L))
        if (untilChunks <= fromChunks && untilInline <= fromInline) Nil
        else {
          // vanished-after-offer tolerance: replaying a committed range
          // against a deleted file must skip, not wedge the stream
          val idxOpt =
            try Some(McapIO.scanTolerant(f))
            catch { case _: java.io.FileNotFoundException => None }
          idxOpt.toSeq.flatMap { idx =>
            val schemaInfo = idx.schemas.map { case (id, sc) =>
              id -> (sc.name, sc.encoding, McapTypedRead.md5hex(sc.data)) }
            // the typed reader itself matches channels on (name, md5),
            // so a drifted newcomer's channels are skipped, not
            // mis-decoded — no partition-side map surgery needed
            val channels = idx.channels
            // typed streams skip whole files that carry no matching
            // variant (offsets still advance over them — committed as
            // read, like filter-pruned chunks)
            val carries = typed.forall(t => schemaInfo.values.exists(sc =>
              sc._1 == t.schemaName && t.md5s(sc._3)))
            if (!carries) Nil
            else {
              val chunkParts = idx.chunks.zipWithIndex
                .slice(fromChunks.toInt, untilChunks.toInt)
                .filter { case (c, _) => filters.forall(fl => McapFilters.chunkMayMatch(fl, c)) }
                .map { case (c, i) =>
                  McapInputPartition(f, i, Some(c), Seq.empty,
                    schemaInfo, channels): InputPartition
                }
              val inlineSlice = idx.inlineMessages
                .slice(fromInline.toInt, untilInline.toInt)
              val inlinePart =
                if (inlineSlice.nonEmpty)
                  Seq(McapInputPartition(f, -1, None, inlineSlice, schemaInfo,
                    channels, ordinalBase = fromInline.toInt): InputPartition)
                else Seq.empty
              chunkParts ++ inlinePart
            }
          }
        }
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = typed match {
    case Some(t) => new McapTypedReaderFactory(t.schemaName, t.encoding,
      t.schemaData, t.md5s, required, includeRaw, filters)
    case None => new McapReaderFactory(required, filters, limit = -1)
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
