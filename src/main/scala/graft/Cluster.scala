package graft

import java.nio.file.{Files, Path, Paths}

/** `bin/mapreduce`-parity lifecycle CLI (`/root/reference/bin/mapreduce:18-70`):
  * `start | stop | status | restart`, mapped onto the Spark runtime.
  *
  * The reference starts one manager + two worker PROCESSES in the
  * background, `status` pgreps them, and `stop` sends a shutdown
  * message then pkills stragglers. Spark subsumes the process roles —
  * the driver is the manager, the executor pool the workers — so the
  * faithful mapping is process-level too:
  *
  *  - `start`: build the session (driver + local executor pool), write
  *    a pidfile-style marker, and stay in the foreground (the
  *    reference backgrounds its daemons with `&`; so does a caller
  *    here — `graft-cluster start &`).
  *  - `status`: read the marker and probe the pid (`ProcessHandle` is
  *    the portable pgrep), printing the reference's exact two-line
  *    report (`bin/mapreduce:55-66`) — in local mode the workers are
  *    the manager's executor threads, so both lines derive from one
  *    liveness probe.
  *  - `stop`: graceful `ProcessHandle.destroy` (SIGTERM — the shutdown
  *    hook stops the session and removes the marker), mirroring
  *    shutdown-message-then-pkill (`bin/mapreduce:27-52`).
  *
  * On a real cluster `start`/`stop` wrap the resource manager's
  * submit/kill instead; `status` reads the same marker. Job submission
  * stays a separate entry point ([[Submit]]), exactly like
  * `mapreduce-submit` vs `bin/mapreduce` in the reference.
  */
object Cluster {

  final case class Marker(pid: Long, appId: String, master: String, startedAtMs: Long)

  /** Marker location; overridable for tests via system property. */
  def markerPath: Path = Paths.get(
    sys.props.getOrElse("graft.cluster.marker", sys.props("java.io.tmpdir")),
    "graft-cluster.json")

  /** Serializes marker MUTATIONS across processes (java FileLock on a
    * sibling .lock file). Every check-then-act on the marker — the
    * shutdown hook's "delete only if still ours", stop()'s stale-marker
    * cleanup, and writeMarker itself — runs under this lock, so a
    * restarting process can never interleave its writeMarker between
    * another process's read and delete. Read-only paths (status) stay
    * lock-free. */
  private def withMarkerLock[A](body: => A): A = {
    Files.createDirectories(markerPath.getParent)
    val lockPath = markerPath.resolveSibling(markerPath.getFileName.toString + ".lock")
    val ch = java.nio.channels.FileChannel.open(lockPath,
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.WRITE)
    try {
      val l = ch.lock()
      try body finally l.release()
    } finally ch.close()
  }

  def writeMarker(m: Marker): Unit = withMarkerLock {
    Files.writeString(markerPath,
      s"""{"pid": ${m.pid}, "app_id": "${m.appId}", "master": "${m.master}", "started_at_ms": ${m.startedAtMs}}""")
  }

  /** Deletes the marker iff it still names `pid` — atomically with
    * respect to every other marker mutation. */
  def deleteMarkerIfOwnedBy(pid: Long): Unit = withMarkerLock {
    if (readMarker().exists(_.pid == pid)) Files.deleteIfExists(markerPath)
  }

  def readMarker(): Option[Marker] = {
    if (!Files.exists(markerPath)) None
    else {
      import org.json4s.{DefaultFormats, Formats}
      implicit val fmt: Formats = DefaultFormats
      val j = org.json4s.jackson.JsonMethods.parse(Files.readString(markerPath))
      Some(Marker(
        (j \ "pid").extract[Long], (j \ "app_id").extract[String],
        (j \ "master").extract[String], (j \ "started_at_ms").extract[Long]))
    }
  }

  private def alive(pid: Long): Boolean =
    ProcessHandle.of(pid).map[Boolean](_.isAlive).orElse(false)

  /** The reference's two status lines (`bin/mapreduce:55-66`). */
  def statusLines(): Seq[String] = readMarker() match {
    case Some(m) if alive(m.pid) =>
      Seq("manager running", "workers running")
    case _ =>
      Seq("manager not running", "workers not running")
  }

  /** True if a live cluster was told to stop; false (after cleaning a
    * stale marker) otherwise. Refuses to destroy the calling process
    * itself and leaves its marker intact. */
  def stop(): Boolean = readMarker() match {
    case Some(m) if m.pid == ProcessHandle.current().pid() => false
    case Some(m) if alive(m.pid) =>
      ProcessHandle.of(m.pid).map[Boolean](_.destroy()).orElse(false)
    case Some(m) =>
      // Stale marker (the pgrep-miss path): delete only if it still
      // names the dead pid we just probed — under the lock, so a new
      // start's writeMarker can't be clobbered in between.
      withMarkerLock {
        if (readMarker().exists(_.pid == m.pid)) Files.deleteIfExists(markerPath)
      }
      false
    case None => false
  }

  def main(args: Array[String]): Unit = args.headOption match {
    case Some("start") =>
      println("starting mapreduce ...")
      val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      writeMarker(Marker(ProcessHandle.current().pid(),
        spark.sparkContext.applicationId, spark.sparkContext.master,
        System.currentTimeMillis()))
      sys.addShutdownHook {
        // Delete the marker only if it is still OURS: on `restart`,
        // the old process's hook can run after the new start's
        // writeMarker (slow signal delivery / long spark.stop), and an
        // unconditional delete would orphan the NEW cluster — running
        // but invisible to `status` and unreachable by `stop`. The
        // check-and-delete runs under the marker lock, so the new
        // start's writeMarker can't interleave between read and delete.
        deleteMarkerIfOwnedBy(ProcessHandle.current().pid())
        spark.stop()
      }
      // Foreground daemon: the session serves until SIGTERM (`stop`).
      new java.util.concurrent.CountDownLatch(1).await()
    case Some("stop") =>
      println("stopping mapreduce")
      stop()
    case Some("status") =>
      statusLines().foreach(println)
    case Some("restart") =>
      println("stopping mapreduce")
      stop()
      main(Array("start"))
    case _ =>
      System.err.println("Usage: graft.Cluster (start|stop|status|restart)")
      sys.exit(1)
  }
}
