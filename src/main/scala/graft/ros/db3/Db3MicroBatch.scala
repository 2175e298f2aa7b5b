package graft.ros.db3

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** Offset of a db3 stream: per-file planned-subtree counts. A db3
  * file is AT-REST (never tailed — see Db3DataSource's design note),
  * so a file appears in the offset exactly once, with the subtree
  * count its b-tree had when it was offered; replay re-plans the same
  * count. JSON shape `{"files":{"<path>":<subtrees>,...}}`, emitted
  * sorted so equal offsets serialize identically; path escaping
  * shared with the rosbag dir offset (the offset log is
  * line-delimited — a raw newline in a path would split the entry).
  */
final case class Db3StreamOffset(files: Map[String, Long]) extends Offset {
  override def json(): String =
    files.toSeq.sortBy(_._1).map { case (p, n) =>
      "\"" + graft.ros.bag.RosbagDirOffset.esc(p) + "\":" + n
    }.mkString("{\"files\":{", ",", "}}")
}

object Db3StreamOffset {
  /** Parse the shape json() writes: quoted-path : integer pairs (the
    * "files" key itself never matches — its value is an object).
    */
  def parse(json: String): Db3StreamOffset = {
    val pair = """"((?:[^"\\]|\\.)*)"\s*:\s*(\d+)""".r
    Db3StreamOffset(pair.findAllMatchIn(json).map(m =>
      graft.ros.bag.RosbagDirOffset.unesc(m.group(1)) -> m.group(2).toLong).toMap)
  }
}

/** Micro-batch streaming over a db3 path at FILE granularity — the
  * at-rest member of the mixed fleet-upload stream: each trigger
  * re-lists the prefix and plans every newly LANDED recording's
  * b-tree subtrees exactly once. Nothing inside a file is ever
  * re-offered (the whole file is one atom), so offsets replay exactly
  * from the checkpoint.
  *
  * "Landed" is verified, not assumed, before a file is offered:
  *
  *   - a live `-wal` / hot `-journal` sidecar means the writer has
  *     not closed the recording — DEFERRED to a later trigger (the
  *     batch reader refuses the same state loudly; a stream must
  *     tolerate it, the file is simply not done uploading);
  *   - a plain `.db3` whose sqlite header page count reaches past the
  *     file's current length is a TRUNCATED in-flight upload —
  *     deferred (complete modern-sqlite files satisfy
  *     pageCount·pageSize == length);
  *   - a file whose metadata scan throws (garbage bytes, a zstd frame
  *     still being appended) — deferred.
  *
  * The residual — an uploader writing a valid prefix IN PLACE whose
  * header already claims the final length — is unverifiable from
  * outside; upload via write-to-temp + rename (every standard
  * uploader's landing contract) and it cannot occur.
  *
  * A file that disappears after being offered keeps its committed
  * count and contributes nothing — same delete/rename tolerance (and
  * same wedged-checkpoint rationale) as the rosbag/mcap dir streams.
  * File-level pruning matches the batch scan: `file_path` filters and
  * the topics catalog skip whole files (offsets still advance over
  * pruned files — committed as read). Typed streams pin the
  * (schema_name, md5) variant resolved at stream start; a DRIFTED
  * file landing mid-stream is skipped rather than mis-decoded (read
  * it with its own `option("schema_md5", ...)` stream); pre-Humble
  * files without a message_definitions table stream under an explicit
  * `option("schema_text", ...)` exactly as they batch-read.
  */
class Db3MicroBatchStream(path: String, required: StructType,
    filters: Array[Filter], typed: Option[Db3TypedRead.TypedTarget] = None,
    includeRaw: Boolean = false)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  override def initialOffset(): Offset = Db3StreamOffset(Map.empty)

  // Trigger.AvailableNow: pin the end ONCE at query start so the run
  // drains exactly what had landed then and terminates even while
  // uploads keep arriving.
  private var availableNowEnd: Option[Offset] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(computeLatestOffset())

  override def latestOffset(): Offset =
    availableNowEnd.getOrElse(computeLatestOffset())

  // The served end is the current listing UNIONED with `start` (start
  // wins on conflict — the offered count is the replay contract): a
  // file that transiently drops out of offer() after its batch
  // committed (a tool briefly opens a -wal sidecar, a transient IO
  // error, delete + re-upload under the same name) must keep its entry
  // in the offset chain — if simply omitted, the next start would no
  // longer contain it and its reappearance would re-plan every
  // subtree, duplicating rows ("a file appears in the offset exactly
  // once").
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val cur = latestOffset().asInstanceOf[Db3StreamOffset].files
    val base = start.asInstanceOf[Db3StreamOffset].files
    Db3StreamOffset(cur ++ base)
  }

  /** Candidate files under the path — `Db3IO.resolveFiles`' listing
    * semantics (dir / glob / explicit newline-separated list) made
    * stream-tolerant: a missing prefix is a stream with nothing to
    * read yet, and NO sidecar/completeness checks here (they decide
    * deferral per file, not listing failure).
    */
  private def listCandidates(): Seq[String] = {
    val conf = Db3IO.hadoopConf()
    path.split('\n').filter(_.nonEmpty).toSeq.flatMap { spec =>
      try {
        val p = new Path(spec)
        val fs = p.getFileSystem(conf)
        if (fs.isDirectory(p))
          fs.listStatus(p).toSeq
            .filter(s => s.isFile && Db3IO.isDb3(s.getPath.getName))
            .map(_.getPath.toString)
        else Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
          .filter(s => s.isFile && Db3IO.isDb3(s.getPath.getName))
          .map(_.getPath.toString)
      } catch {
        case _: java.io.FileNotFoundException => Seq.empty
      }
    }.distinct.sorted
  }

  /** The file's subtree count if it has LANDED (scaladoc checks), else
    * None = defer to a later trigger. `siblings` = the directory
    * listing's name set (one listing answers every sidecar check).
    */
  private def offer(f: String, siblings: Set[String]): Option[Long] =
    try {
      if (Db3IO.sidecarProblem(f, siblings).isDefined) None
      else {
        if (f.endsWith(".db3")) {
          val p = new Path(f)
          val len = p.getFileSystem(Db3IO.hadoopConf()).getFileStatus(p).getLen
          val pager = new Db3IO.Pager(f)
          val complete =
            try pager.header.pageCount.toLong * pager.header.pageSize <= len
            finally pager.close()
          if (!complete) return None
        }
        Some(Db3IO.scanMeta(f).subtrees.size.toLong)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  private def computeLatestOffset(): Offset = {
    val cands = listCandidates()
    val siblings = Db3IO.siblingNames(cands)
    Db3StreamOffset(graft.ros.DriverPool.parMap(cands) { f =>
      f -> offer(f, siblings)
    }.collect { case (f, Some(n)) => f -> n }.toMap)
  }

  override def deserializeOffset(json: String): Offset = Db3StreamOffset.parse(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[Db3StreamOffset].files
    val e = end.asInstanceOf[Db3StreamOffset].files
    e.toSeq.sortBy(_._1)
      .filter { case (f, _) => !s.contains(f) }        // at-rest: one offer
      .flatMap { case (f, n) =>
        // vanished-after-offer tolerance: replaying a committed range
        // against a deleted file must skip, not wedge the stream
        val metaOpt =
          try Some(Db3IO.scanMeta(f))
          catch { case _: java.io.FileNotFoundException => None }
        metaOpt.toSeq.flatMap { meta =>
          val keepFile =
            filters.forall(fl => Db3Filters.fileMayMatch(fl, f, meta.topics))
          // typed: drifted newcomers skip whole (offset still advances);
          // a pre-Humble file without a definitions table streams under
          // the caller's explicit schema_text, like the batch read
          val carries = typed.forall(t => meta.definitions.isEmpty ||
            meta.definitions.exists { case (name, _, text) =>
              name == t.schemaName &&
                graft.ros.mcap.McapTypedRead.md5hex(
                  text.getBytes(java.nio.charset.StandardCharsets.UTF_8)) == t.md5
            })
          if (!keepFile || !carries) Nil
          // take(n): the offered count is the replay contract; a file
          // mutated after landing (outside the contract) must not make
          // a replayed batch non-deterministic
          else meta.subtrees.take(n.toInt).map(st =>
            Db3InputPartition(f, st, meta.topics): InputPartition)
        }
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = typed match {
    case Some(t) => new Db3TypedReaderFactory(t.schemaName, t.encoding,
      t.schemaText, required, includeRaw, filters, limit = -1)
    case None => new Db3ReaderFactory(required, filters, limit = -1)
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
