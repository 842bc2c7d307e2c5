package graft.core

import org.apache.hadoop.fs.{LocalFileSystem, Path => HPath, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Local filesystem minus the per-file `chmod` FORK.
  *
  * Without the Hadoop native library, `RawLocalFileSystem.setPermission`
  * shells out (`Shell.runCommand` → fork/exec of `chmod`) — and the
  * FileSystem facade passes an explicit permission on EVERY
  * `create`/`mkdirs`, so every data file, committer temp file, and
  * partition directory Spark writes on `file://` costs a process fork
  * (~10–25 ms each; all-thread stack sampling attributed seconds per
  * commit-heavy query to it). The permission being chmod'ed is the
  * default one (0666/0777 masked by the process umask) — exactly what
  * the file was just created with — so the fork is a no-op in effect.
  *
  * This subclass makes it a no-op in cost too: `setPermission` with the
  * DEFAULT permission does nothing; any explicit non-default request
  * still goes through (correctness over speed for the rare real chmod).
  * Wired in via `spark.hadoop.fs.file.impl` (GraftSession); HDFS and
  * object-store schemes are untouched, and on a real cluster the native
  * library makes the default path forkless anyway — this closes the
  * same gap for environments without it.
  */
class BareLocalFileSystem extends LocalFileSystem(new NoChmodRawLocalFileSystem)

class NoChmodRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: HPath, permission: FsPermission): Unit = {
    val umask = FsPermission.getUMask(getConf)
    val fileDefault = FsPermission.getFileDefault.applyUMask(umask)
    val dirDefault = FsPermission.getDirDefault.applyUMask(umask)
    if (permission != null && permission != fileDefault && permission != dirDefault)
      super.setPermission(p, permission)
  }
}
