package graft.ros

import org.apache.hadoop.fs.{FileSystem, Path}
import scala.util.matching.Regex

/** Epoch-commit reconciliation for the streaming container sinks.
  *
  * The sinks get exactly-once semantics from DETERMINISTIC per-(query,
  * epoch, partition) file names: a replayed epoch regenerates the same
  * names and replaces its crashed attempt's files. That replacement
  * only covers names the replay re-produces — a replay running with
  * fewer partitions (or rolling fewer files) than the crashed attempt
  * would otherwise leave the extras behind as duplicates. At epoch
  * commit, sweep the directory for this (query, epoch)'s pattern and
  * delete whatever this commit did not produce.
  */
object ContainerStreamReconcile {
  def sweep(fs: FileSystem, dir: String, pattern: Regex,
      committedNames: Set[String]): Unit =
    fs.listStatus(new Path(dir)).foreach { s =>
      val n = s.getPath.getName
      if (s.isFile && pattern.matches(n) && !committedNames.contains(n)) {
        fs.delete(s.getPath, false)
        ()
      }
    }
}
