package graft.ros

import org.apache.hadoop.fs.{FileSystem, Path}

/** The journaled atomic-swap machinery behind [[Convert.compact]],
  * format-agnostic: a compaction stages its new generation under a
  * dotted `.compact-<tag>/` directory, publishes a rename/delete PLAN
  * as `.compact.journal` (itself via temp + rename — a truncated
  * journal replayed would promote without deleting, duplicating every
  * old-generation row), then executes every promotion BEFORE any
  * deletion. A crash anywhere self-heals: [[recover]] replays the plan
  * idempotently (renames of already-promoted files no-op, deletes of
  * already-deleted files no-op).
  *
  * CRASH-WINDOW READS: between a crash and the next compact call the
  * journal can sit pending indefinitely, with BOTH generations (up to
  * 2× every message) visible to a naive directory listing. Every
  * batch directory listing therefore applies [[maskedNames]]: while a
  * journal is pending, either the old generation is still complete
  * (deletes only start after every promote — serve it, hide the
  * partially-promoted new one) or promotion is complete (serve the
  * new generation, hide the not-yet-deleted old one). Readers get a
  * consistent single-generation view without mutating the archive.
  */
private[ros] object CompactJournal {
  val JournalName = ".compact.journal"
  private val JournalTmpName = ".compact.journal.tmp"

  def journalPath(dir: String): Path = new Path(dir, JournalName)

  /** Publish the plan atomically (temp + rename). Lines:
    * `MV\t<stageRelPath>\t<finalName>` and `RM\t<oldName>`.
    */
  def write(fs: FileSystem, dir: String, plan: Seq[String]): Unit = {
    val journal = journalPath(dir)
    val jtmp = new Path(dir, JournalTmpName)
    val jout = fs.create(jtmp, true)
    try jout.write(plan.mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally jout.close()
    require(fs.rename(jtmp, journal),
      s"compact: journal publish failed under $dir")
  }

  private def readPlan(fs: FileSystem, journal: Path): Seq[String] = {
    val in = fs.open(journal)
    val text = try {
      val bos = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 1 << 16, false)
      new String(bos.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
    text.linesIterator.toSeq
  }

  /** Execute the plan: every promotion first (the new generation must
    * be fully in place), deletions of the old generation only after.
    */
  def execute(fs: FileSystem, dir: String, plan: Seq[String]): Unit = {
    val d = new Path(dir)
    plan.foreach {
      case line if line.startsWith("MV\t") =>
        // the journal is published atomically, so a malformed line is
        // corruption, not truncation — fail loudly rather than replay
        // a partial swap
        val parts = line.split('\t')
        require(parts.length == 3, s"compact: malformed journal line '$line'")
        val src = new Path(d, parts(1))
        val dst = new Path(d, parts(2))
        if (fs.exists(src)) {
          if (fs.exists(dst)) fs.delete(dst, false)
          require(fs.rename(src, dst), s"compact: rename $src -> $dst failed")
        }
      case _ => ()
    }
    plan.foreach {
      case line if line.startsWith("RM\t") =>
        fs.delete(new Path(d, line.substring(3)), false)
        ()
      case _ => ()
    }
  }

  /** Complete a crashed swap: re-apply the journal, then clear the
    * consumed stage directories and a pre-publish journal tmp.
    */
  def recover(fs: FileSystem, dir: String): Unit = {
    val journal = journalPath(dir)
    if (fs.exists(journal)) {
      execute(fs, dir, readPlan(fs, journal))
      fs.delete(journal, false)
      ()
    }
    // stage dirs are debris once no journal names them: either the
    // replay above consumed them, or the compact crashed BEFORE its
    // journal published (staged files were never part of any plan)
    fs.listStatus(new Path(dir)).foreach { s =>
      if (s.isDirectory && s.getPath.getName.startsWith(".compact-"))
        fs.delete(s.getPath, true)
    }
    fs.delete(new Path(dir, JournalTmpName), false)
    ()
  }

  /** File names a directory LISTING must exclude while a journal is
    * pending, chosen so the view is one complete generation:
    *
    *  - promotion incomplete (some MV SOURCE still staged): the old
    *    generation is untouched (deletes run strictly after all
    *    promotes) — hide the MV targets, serve the old files;
    *  - promotion complete (every staged source consumed by its
    *    rename): the new generation is fully in place — hide the RM
    *    names (whatever the interrupted delete phase left).
    *
    * The phase test checks MV SOURCES, not targets: a target name may
    * legally PRE-EXIST in the old generation (db3's `metadata.yaml`
    * is renamed over), so target-presence would flip the view to
    * "promoted" one step early and serve new data files under the old
    * generation's metadata.
    *
    * Cost on the happy path is one existence check for the journal.
    * This is a VIEW fix only — recovery stays with the next compact()
    * call (a read must not mutate the archive it scans).
    */
  def maskedNames(fs: FileSystem, dir: Path): Set[String] =
    try {
      val journal = new Path(dir, JournalName)
      if (!fs.exists(journal)) Set.empty
      else {
        val plan = readPlan(fs, journal)
        val mvs = plan.collect {
          case l if l.startsWith("MV\t") && l.split('\t').length == 3 =>
            val parts = l.split('\t')
            (parts(1), parts(2)) // (stage-relative source, final name)
        }
        val rmNames = plan.collect {
          case l if l.startsWith("RM\t") => l.substring(3)
        }
        val promoted = mvs.forall { case (src, _) =>
          !fs.exists(new Path(dir, src)) }
        if (promoted) rmNames.toSet else mvs.map(_._2).toSet
      }
    } catch {
      // an unreadable journal (listing raced its deletion at the end
      // of a healthy compact) = nothing pending
      case _: java.io.IOException => Set.empty
    }

  /** Apply [[maskedNames]] to GLOB results: a glob over an archive
    * with a pending journal matches BOTH generations just like a
    * listing does, so the same single-generation view must filter it —
    * grouped by parent directory, one journal existence check per
    * distinct parent (the happy-path cost stays one `exists`).
    */
  def maskGlobbed(fs: FileSystem,
      matches: Seq[org.apache.hadoop.fs.FileStatus])
      : Seq[org.apache.hadoop.fs.FileStatus] =
    matches.groupBy(s => Option(s.getPath.getParent)).toSeq.flatMap {
      case (None, sts) => sts
      case (Some(dir), sts) =>
        val masked = maskedNames(fs, dir)
        if (masked.isEmpty) sts
        else sts.filterNot(s => masked.contains(s.getPath.getName))
    }
}
