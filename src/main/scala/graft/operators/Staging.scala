package graft.operators

import java.nio.file.{Files, Path, Paths}

/** Shared staging-dir hygiene for the persisted index publishers
  * ([[PoolRankIndex]] / [[Bm25Index]] / [[Bm25PoolIndex]]): every
  * publisher stages at `<dir>.tmp-<pid>` (per-process so two live
  * drivers never tear each other's half-written staging — reference
  * analogue: the sampler's refresh staging, src/sampler/mod.rs:994-1151)
  * then temp-then-move publishes. A builder that CRASHES mid-stage
  * orphans its pid-suffixed dir, and unlike the old fixed `.tmp` name it
  * would never be reclaimed — so builders sweep dead-pid siblings before
  * staging.
  */
object Staging {

  /** Delete sibling `<name>.tmp-<pid>` staging dirs of `target` whose
    * owning process is no longer alive. Live pids are left alone (a
    * concurrent builder mid-stage owns its dir); malformed suffixes and
    * delete races (another sweeper got there first) are skipped, never
    * fatal — the sweep is best-effort hygiene, not correctness.
    */
  def sweepStale(target: Path): Unit = {
    val parent = Option(target.toAbsolutePath.getParent).getOrElse(return)
    if (!Files.isDirectory(parent)) return
    val prefix = target.getFileName.toString + ".tmp-"
    val entries =
      try {
        val s = Files.list(parent)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.filter(_.getFileName.toString.startsWith(prefix)).toList
        } finally s.close()
      } catch { case _: java.io.IOException => Nil }
    entries.foreach { p =>
      val pidStr = p.getFileName.toString.stripPrefix(prefix)
      val dead =
        try ProcessHandle.of(pidStr.toLong).isEmpty
        catch { case _: NumberFormatException => true }
      if (dead) rmTree(p)
    }
  }

  /** Recursive best-effort delete (children-first). */
  def rmTree(p: Path): Unit =
    try {
      if (Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        val w = Files.walk(p)
        val all = try w.iterator().asScala.toSeq finally w.close()
        all.reverse.foreach(f =>
          try Files.deleteIfExists(f)
          catch { case _: java.io.IOException => () })
      }
    } catch { case _: java.io.IOException => () }

  /** The per-process staging path for `dir`. */
  def stagingFor(dir: String): Path =
    Paths.get(dir + ".tmp-" + ProcessHandle.current().pid())
}
