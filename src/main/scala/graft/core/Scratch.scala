package graft.core

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Recursive scratch-directory cleanup for queries whose sinks cannot
  * ride SaveMode.Overwrite alone — streaming checkpoints and
  * dated-partition stores pin state across runs (a stale checkpoint pins
  * the previous run's SOURCE PATH; a stale dated partition double-counts
  * the previous cycle), so those queries wipe their scratch subtree at
  * construction and rebuild it deterministically.
  */
object Scratch {

  /** Delete `dir` recursively if it exists (no-op otherwise). */
  def rmTree(dir: String): Unit = {
    val root: Path = Paths.get(dir)
    if (Files.exists(root)) {
      // Files.walk must be closed (it holds directory handles open until
      // GC otherwise — a per-query leak under a long harness sweep)
      val stream = Files.walk(root)
      try stream.sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
      finally stream.close()
    }
  }
}
