package graft.sources

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

/** Closed-stream directory listing. `Files.list` / `Files.walk` return
  * streams that HOLD THE DIRECTORY FD until closed — the widespread
  * `Files.list(p).iterator.asScala` idiom never closes them, so every
  * commit/plan leaked one fd, and a multi-hundred-query run (or the
  * full test suite in one JVM) exhausted the process limit: the
  * measured r14 failure mode was `sbt test` dying at ~20k open fds,
  * >500 of them `_delta_log` directory handles. On a long-lived 100 TB
  * driver the same leak is a slow outage. These helpers materialize
  * the KB-scale name lists eagerly and close the stream.
  */
private[graft] object Fs {

  /** Direct children of `dir`, stream closed. */
  def list(dir: Path): Seq[Path] = {
    val s = Files.list(dir)
    try s.iterator.asScala.toVector finally s.close()
  }

  /** Recursive walk under `root` (root included), stream closed. */
  def walk(root: Path): Seq[Path] = {
    val s = Files.walk(root)
    try s.iterator.asScala.toVector finally s.close()
  }
}
