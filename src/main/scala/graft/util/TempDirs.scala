package graft.util

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Process-scoped temp directories with shutdown cleanup: every scratch dir
  * the queries create (stream sources, engine fixture outputs) lives under
  * one root that a JVM shutdown hook deletes recursively — repeated
  * Verify/Bench runs no longer accumulate data copies in /tmp. */
object TempDirs {

  private lazy val root: Path = {
    val r = Files.createTempDirectory("graft-run")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(r)))
    r
  }

  def create(prefix: String): Path = Files.createTempDirectory(root, prefix)

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val stream = Files.walk(p)
      try stream.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.deleteIfExists(f))
      finally stream.close()
    }
}
