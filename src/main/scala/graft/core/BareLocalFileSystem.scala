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
  * default one — exactly what the file was just created with — so the
  * fork is a no-op in effect.
  *
  * This subclass makes it a no-op in cost too: `setPermission` is
  * skipped when the requested bits equal what the OS ALREADY gives a
  * fresh file/directory under the PROCESS umask (probed once via a
  * java.nio temp file — round-22 advice: Hadoop's configured umask,
  * default 022, and the process umask can disagree, and files are
  * actually created with the process one, so comparing against Hadoop's
  * belief could skip a chmod that was not a no-op). Any request that
  * differs from the probed creation bits still goes through
  * (correctness over speed for the rare real chmod), and a non-POSIX
  * filesystem that fails the probe never skips. Wired in via
  * `spark.hadoop.fs.file.impl` (GraftSession); HDFS and object-store
  * schemes are untouched, and on a real cluster the native library
  * makes the default path forkless anyway — this closes the same gap
  * for environments without it.
  */
class BareLocalFileSystem extends LocalFileSystem(new NoChmodRawLocalFileSystem)

object NoChmodRawLocalFileSystem {
  /** (fresh-file bits, fresh-directory bits) under the process umask,
    * probed once per JVM; None when the probe fails (never skip then).
    */
  private[core] lazy val createdBits: Option[(FsPermission, FsPermission)] =
    try {
      import java.nio.file.Files
      import java.nio.file.attribute.PosixFilePermission._
      val f = Files.createTempFile("graft-perm-probe", ".tmp")
      val d = Files.createTempDirectory("graft-perm-probe")
      def bits(p: java.nio.file.Path): FsPermission = {
        val s = Files.getPosixFilePermissions(p)
        val m = Seq(OWNER_READ -> 0x100, OWNER_WRITE -> 0x80,
          OWNER_EXECUTE -> 0x40, GROUP_READ -> 0x20, GROUP_WRITE -> 0x10,
          GROUP_EXECUTE -> 0x8, OTHERS_READ -> 0x4, OTHERS_WRITE -> 0x2,
          OTHERS_EXECUTE -> 0x1)
          .collect { case (k, v) if s.contains(k) => v }.sum
        new FsPermission(m.toShort)
      }
      val r = (bits(f), bits(d))
      Files.deleteIfExists(f)
      Files.deleteIfExists(d)
      Some(r)
    } catch { case _: Throwable => None }
}

class NoChmodRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: HPath, permission: FsPermission): Unit = {
    val noop = permission != null &&
      NoChmodRawLocalFileSystem.createdBits.exists { case (fp, dp) =>
        permission == fp || permission == dp
      }
    if (!noop) super.setPermission(p, permission)
  }
}
