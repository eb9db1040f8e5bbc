package graft.util

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Process-scoped temp directories with shutdown cleanup: every scratch dir
  * the queries create (stream sources, engine fixture outputs) lives under
  * one root that a JVM shutdown hook deletes recursively — repeated
  * Verify/Bench runs no longer accumulate data copies in /tmp. */
object TempDirs {

  /** Scratch lives on tmpfs when the host has one (guide §6: every byte here
    * is ephemeral — stream-source copies, artifact staging, checkpoints — so
    * paying disk I/O and fsync for it is pure overhead; a production
    * deployment writes durable artifacts to object storage, which these
    * scratch dirs never model). `SPARK_GRAFT_SCRATCH_DIR` overrides; an
    * unwritable /dev/shm falls back to java.io.tmpdir. */
  private lazy val root: Path = {
    val base = sys.env.get("SPARK_GRAFT_SCRATCH_DIR")
      .map(java.nio.file.Paths.get(_))
      .orElse(Some(java.nio.file.Paths.get("/dev/shm"))
        .filter(p => Files.isDirectory(p) && Files.isWritable(p)))
    val r = base match {
      case Some(b) => Files.createTempDirectory(b, "graft-run")
      case None => Files.createTempDirectory("graft-run")
    }
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(r)))
    r
  }

  def create(prefix: String): Path = Files.createTempDirectory(root, prefix)

  /** A `spark.local.dir` value for local-mode mains (Bench/TimeOne/probes):
    * shuffle and spill scratch under the same tmpfs-preferring root. Returns
    * the JVM default (java.io.tmpdir) when no tmpfs root was selected, so
    * setting it unconditionally is always safe. */
  def sparkLocalDir: String =
    sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", create("spark-local").toString)

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val stream = Files.walk(p)
      try stream.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.deleteIfExists(f))
      finally stream.close()
    }
}
