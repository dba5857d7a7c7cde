package graft

import java.nio.file.{Files, Path}

/** Local-FS helpers for the harness's staging/fixture plumbing.
  *
  * `Files.list` returns a lazily-populated stream backed by an OPEN
  * directory handle; callers that never close it leak one file
  * descriptor per call (and the CDC generation scan runs once per
  * micro-batch). Everything here collects eagerly and closes the
  * stream in a finally, so call sites can stay expression-shaped.
  */
object FsUtil {
  /** Eager, closed directory listing. */
  def listDir(dir: Path): Array[Path] = {
    val s = Files.list(dir)
    try s.toArray.map(_.asInstanceOf[Path])
    finally s.close()
  }

  /** Recursive delete; a missing path is a no-op. Depth-first so the
    * directory entries go before their parent.
    */
  def deleteRecursively(root: Path): Unit = if (Files.exists(root)) {
    val s = Files.walk(root)
    try s.sorted(java.util.Comparator.reverseOrder[Path]())
      .forEach(p => Files.deleteIfExists(p))
    finally s.close()
  }

  /** The single `part-*.parquet` Spark wrote into a coalesce(1) build
    * dir — the common "write one file, then move it" staging step.
    */
  def singleParquetPart(buildDir: Path): Path =
    listDir(buildDir).filter(_.getFileName.toString.endsWith(".parquet")) match {
      case Array(one) => one
      case parts => throw new IllegalStateException(
        s"expected exactly one .parquet part in $buildDir, found ${parts.length}")
    }
}
