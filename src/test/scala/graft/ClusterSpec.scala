package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Contract tests for the bin/mapreduce-parity lifecycle CLI: marker
  * roundtrip, pgrep-equivalent liveness, stale-marker cleanup, and the
  * reference's exact status strings — without spawning a second JVM
  * (the daemon loop itself is three lines of main).
  */
class ClusterSpec extends AnyFunSuite {

  private def withMarkerDir(f: => Unit): Unit = {
    val d = Files.createTempDirectory("graft-cluster-test").toString
    System.setProperty("graft.cluster.marker", d)
    try f finally System.clearProperty("graft.cluster.marker")
  }

  test("status reports running for a live pid, reference strings verbatim") {
    withMarkerDir {
      Cluster.writeMarker(Cluster.Marker(
        ProcessHandle.current().pid(), "app-1", "local[4]", 1L))
      assert(Cluster.statusLines() == Seq("manager running", "workers running"))
      val m = Cluster.readMarker().get
      assert(m.appId == "app-1" && m.master == "local[4]")
    }
  }

  test("status reports not running with no marker or a dead pid") {
    withMarkerDir {
      assert(Cluster.statusLines() ==
        Seq("manager not running", "workers not running"))
      // A pid far beyond pid_max is never alive.
      Cluster.writeMarker(Cluster.Marker(4194304L * 1024, "app-2", "local[4]", 1L))
      assert(Cluster.statusLines() ==
        Seq("manager not running", "workers not running"))
    }
  }

  test("stop cleans a stale marker and reports no live cluster") {
    withMarkerDir {
      Cluster.writeMarker(Cluster.Marker(4194304L * 1024, "app-3", "local[4]", 1L))
      assert(!Cluster.stop())
      assert(Cluster.readMarker().isEmpty, "stale marker must be removed")
      assert(!Cluster.stop(), "idempotent with nothing running")
    }
  }

  test("restart interleaving: the old hook's delete cannot orphan the new marker") {
    withMarkerDir {
      val oldPid = 4194304L * 1024 // the process being restarted
      val newPid = ProcessHandle.current().pid()
      // Old daemon wrote its marker and got SIGTERM'd...
      Cluster.writeMarker(Cluster.Marker(oldPid, "app-old", "local[4]", 1L))
      // ...and the NEW start's writeMarker lands BEFORE the old hook
      // runs (slow signal delivery / long spark.stop — the restart
      // race the ownership check exists for; cross-process the marker
      // lock serializes exactly this interleaving).
      Cluster.writeMarker(Cluster.Marker(newPid, "app-new", "local[4]", 2L))
      // The old hook fires last: it must see the marker is no longer
      // its own and leave the new cluster visible to status/stop.
      Cluster.deleteMarkerIfOwnedBy(oldPid)
      assert(Cluster.readMarker().exists(_.appId == "app-new"),
        "old hook must not orphan the new cluster's marker")
      assert(Cluster.statusLines() == Seq("manager running", "workers running"))
      // stop()'s stale-cleanup path must equally refuse: the marker
      // names a LIVE pid (ours), so nothing may be deleted.
      assert(!Cluster.stop())
      assert(Cluster.readMarker().exists(_.appId == "app-new"))
      // When the marker IS its own again, the hook removes it.
      Cluster.deleteMarkerIfOwnedBy(newPid)
      assert(Cluster.readMarker().isEmpty)
    }
  }

  test("stop never destroys the calling process itself") {
    withMarkerDir {
      Cluster.writeMarker(Cluster.Marker(
        ProcessHandle.current().pid(), "app-4", "local[4]", 1L))
      // Own pid: must refuse the destroy path, leave this JVM alive,
      // and keep the live cluster's marker in place.
      assert(!Cluster.stop())
      assert(Cluster.readMarker().nonEmpty, "own marker must survive")
    }
  }
}
