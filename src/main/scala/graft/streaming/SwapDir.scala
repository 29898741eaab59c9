package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}

/** The rename-swap protocol shared by [[ChangelogSink]] (whole table) and
  * [[BucketedChangelogSink]] (per bucket): write a uniquely-named temp
  * dir, rotate `target → target.old`, move the temp into place, then drop
  * the backup. At every instant either `target` or `target.old` holds the
  * complete previous state, so a crash in any window loses no committed
  * keys; [[resolveCurrent]] is the matching read rule. Living in ONE
  * place keeps both sinks' crash-recovery guarantees identical (the
  * batch-side [[graft.functions.ModelStore]] commits through the same
  * protocol, hence the graft-wide visibility). */
private[graft] object SwapDir {

  /** Reclaim temp dirs orphaned by an earlier crash — recovery never
    * reads them, they are dead weight. */
  def cleanStaleTmp(fs: FileSystem, targetPath: String): Unit =
    fs.globStatus(new Path(targetPath + ".tmp-*")) match {
      case null => ()
      case stale => stale.foreach(st => fs.delete(st.getPath, true))
    }

  /** The surviving side of the swap: `target` if present, else the
    * backup, else None. */
  def resolveCurrent(fs: FileSystem, targetPath: String): Option[String] = {
    if (fs.exists(new Path(targetPath))) Some(targetPath)
    else if (fs.exists(new Path(targetPath + ".old"))) Some(targetPath + ".old")
    else None
  }

  /** Fresh unique temp path beside the target. */
  def tmpPath(targetPath: String): Path =
    new Path(targetPath + ".tmp-" + java.util.UUID.randomUUID())

  /** Swap `tmp` into `target` with the backup rotation described above. */
  def commit(fs: FileSystem, targetPath: String, tmp: Path): Unit = {
    val target = new Path(targetPath)
    val backup = new Path(targetPath + ".old")
    if (fs.exists(target)) {
      if (fs.exists(backup)) fs.delete(backup, true)
      if (!fs.rename(target, backup))
        throw new IllegalStateException(s"backup rename failed for $targetPath")
    }
    if (!fs.rename(tmp, target))
      throw new IllegalStateException(s"swap rename failed for $targetPath")
    fs.delete(backup, true)
  }
}
