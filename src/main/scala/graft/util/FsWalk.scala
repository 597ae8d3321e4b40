package graft.util

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}

/** Fast recursive data-file listing via per-directory `listStatus`.
  *
  * Hadoop's `fs.listFiles(path, recursive = true)` materializes a
  * `LocatedFileStatus` per file — a block-location lookup and a re-stat
  * behind every `next()` — measured at 120 s for a single 30k-file
  * directory on the local filesystem (4 ms/file), which made it the
  * hidden cost of every stats-manifest staleness sweep and every
  * before/after insert listing. A plain `listStatus` walk returns the
  * same names in ~0.5 s: one bulk call per DIRECTORY, no locations
  * (callers here only ever need paths). On object stores the flat
  * listing is one LIST page per ~1000 keys either way, so this is never
  * slower there.
  *
  * Hidden segments (`_…`, `.…`: committer staging, `_graft_commits`,
  * `_graft_stats_index`, checksums) are pruned at DIRECTORY level, so
  * their whole subtrees are skipped rather than filtered file-by-file.
  */
object FsWalk {

  /** All non-hidden data files under `root` (absent root → empty). */
  def dataFiles(fs: FileSystem, root: Path): Seq[String] =
    dataFileStatuses(fs, root).map(_.getPath.toString)

  /** Same walk, statuses kept (listStatus already carries length — no
    * re-stat needed for size sums).
    */
  def dataFileStatuses(fs: FileSystem, root: Path): Seq[FileStatus] = {
    if (!fs.exists(root)) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[FileStatus]
    val stack = scala.collection.mutable.Stack[Path](root)
    while (stack.nonEmpty) {
      val dir = stack.pop()
      fs.listStatus(dir).foreach { st: FileStatus =>
        val name = st.getPath.getName
        if (!name.startsWith("_") && !name.startsWith(".")) {
          if (st.isDirectory) stack.push(st.getPath)
          else out += st
        }
      }
    }
    out.toSeq
  }
}
