package graft

import org.scalatest.funsuite.AnyFunSuite

/** KILL -9 A REAL LOCK HOLDER (r16): CrossProcessLockSpec proves the
  * dead-pid sweep against fabricated foreign lock files, and
  * ForkedProcessSpec proves serialization against a live child — this
  * spec closes the remaining gap with a child JVM that ACQUIRES the
  * shared build lock and is then killed hard while holding it. The
  * contract gated: the parent's next lock-taking maintenance succeeds
  * (the acquire loop reads the pinned pid, finds it dead, sweeps, and
  * proceeds) instead of waiting out the live-holder timeout or
  * refusing — a writer crash must never wedge the warehouse.
  */
class ForkedKillSpec extends AnyFunSuite with SparkSuite {

  private val pid = ProcessHandle.current().pid()

  private val addOpensPkgs = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar")

  test("a child JVM killed while HOLDING the shared build lock does " +
      "not wedge the warehouse: the parent's next maintenance sweeps " +
      "the dead pid and proceeds") {
    // a PRIVATE lock file for this test (same acquire/sweep code
    // path): the child deliberately holds for seconds, and doing
    // that on the default warehouse lock would starve the parallel
    // suites in this JVM into their live-holder timeout
    val lockPath = s"${spark.conf.get("spark.sql.warehouse.dir")}" +
      s"/_graft_fk_p$pid.lock"
    val out = java.nio.file.Files.createTempFile("graft_hold", ".log")
    val javaBin = sys.props("java.home") + "/bin/java"
    val cmd: Seq[String] = Seq(javaBin) ++
      addOpensPkgs.flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED")) ++
      Seq("-Xmx1g", "-Dspark.ui.enabled=false",
        "-Dfile.encoding=UTF-8",
        "-cp", sys.props("java.class.path"),
        "graft.ChildHold", lockPath, "120000")
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    pb.redirectOutput(out.toFile)
    val child = pb.start()
    try {
      // wait for the child to actually hold the lock (HOLDING prints
      // inside the lock scope), then kill it hard while it does —
      // poll tightly to keep the genuine-holder window short for the
      // parallel suites sharing this warehouse
      val deadline = System.currentTimeMillis() + 120000L
      var holding = false
      while (!holding && child.isAlive) {
        assert(System.currentTimeMillis() < deadline,
          "child never reached HOLDING within 120s")
        holding = new String(java.nio.file.Files.readAllBytes(out),
          "UTF-8").contains("HOLDING")
        if (!holding) Thread.sleep(100L)
      }
      assert(holding, "child exited before acquiring the lock: " +
        new String(java.nio.file.Files.readAllBytes(out), "UTF-8")
          .takeRight(2000))
      child.destroyForcibly()
      assert(child.waitFor(30, java.util.concurrent.TimeUnit.SECONDS))
      assert(child.exitValue() !== 0)
      // the dead child's lock FILE is still pinned with its pid (no
      // one else uses this path). The contract: a SECOND real
      // process acquiring the same path sweeps the dead pid and
      // proceeds — never the live-holder refusal, never a hang.
      val lockP = new org.apache.hadoop.fs.Path(lockPath)
      val fs = lockP.getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      assert(fs.exists(lockP),
        "the killed child's lock file should still be pinned")
      val out2 = java.nio.file.Files.createTempFile("graft_sweep",
        ".log")
      try {
        val cmd2: Seq[String] = Seq(javaBin) ++
          addOpensPkgs.flatMap(p =>
            Seq("--add-opens", s"$p=ALL-UNNAMED")) ++
          Seq("-Xmx1g", "-Dspark.ui.enabled=false",
            "-Dfile.encoding=UTF-8",
            "-cp", sys.props("java.class.path"),
            "graft.ChildSweep", lockPath)
        val pb2 = new ProcessBuilder(cmd2: _*)
        pb2.redirectErrorStream(true)
        pb2.redirectOutput(out2.toFile)
        val sweeper = pb2.start()
        assert(sweeper.waitFor(120,
          java.util.concurrent.TimeUnit.SECONDS),
          "sweeper JVM hung on the dead holder's lock")
        val log2 = new String(
          java.nio.file.Files.readAllBytes(out2), "UTF-8")
        assert(sweeper.exitValue() === 0, log2.takeRight(2000))
        assert(log2.contains("SWEPT_OK"), log2.takeRight(2000))
        // the sweeper released cleanly: the path is free again
        assert(!fs.exists(lockP),
          "lock file still pinned after the sweeping process exited")
      } finally java.nio.file.Files.deleteIfExists(out2)
    } finally {
      if (child.isAlive) child.destroyForcibly()
      val lp = new org.apache.hadoop.fs.Path(lockPath)
      val lfs = lp.getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      if (lfs.exists(lp)) { lfs.delete(lp, false); () }
      java.nio.file.Files.deleteIfExists(out)
    }
  }
}
