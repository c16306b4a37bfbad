package graft

import graft.operators.TextOps
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
    val t = s"fk_parent_p$pid"
    val out = java.nio.file.Files.createTempFile("graft_hold", ".log")
    val javaBin = sys.props("java.home") + "/bin/java"
    val cmd: Seq[String] = Seq(javaBin) ++
      addOpensPkgs.flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED")) ++
      Seq("-Xmx1g", "-Dspark.ui.enabled=false",
        "-Dfile.encoding=UTF-8",
        "-cp", sys.props("java.class.path"),
        "graft.ChildHold", "120000")
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
      // the dead child's lock file may still be pinned (another
      // parallel suite's acquire can sweep it first — both orders are
      // legal). The contract: the parent's own lock-taking op
      // SUCCEEDS rather than throwing the live-holder refusal or
      // hanging — the sweep path, driven by a real process death.
      val sp = spark
      import sp.implicits._
      TextOps.appendBm25Postings(
        Seq(1L -> "alpha beta gamma").toDF("doc_id", "text"),
        t, s"${t}_stats")
      assert(spark.table(s"${t}_stats")
        .select("n_docs").head().getLong(0) === 1L)
    } finally {
      if (child.isAlive) child.destroyForcibly()
      Seq(t, s"${t}_stats").foreach(x =>
        spark.sql(s"DROP TABLE IF EXISTS $x"))
      java.nio.file.Files.deleteIfExists(out)
    }
  }
}
