package graft.operators

/** Per-JVM scratch root for sink/roundtrip queries, removed on JVM
  * exit. Each call to [[dir]] returns a fresh numbered subdirectory: a
  * previously returned DataFrame is lazily backed by its sink files,
  * so invocations must never overwrite each other — but they share one
  * root so repeated runs stop leaking /tmp directories across JVMs.
  */
object Scratch {

  private lazy val root: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft-scratch")
    sys.addShutdownHook {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      if (Files.exists(p)) {
        val walk = Files.walk(p)
        try walk.sorted(Comparator.reverseOrder[Path]()).forEach(Files.deleteIfExists(_))
        finally walk.close()
      }
    }
    p
  }

  private val seq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** A fresh scratch directory path (not yet created — Spark sinks
    * insist on creating their own target). */
  def dir(): String = s"$root/${seq.getAndIncrement()}"
}
