package graft

import org.scalatest.funsuite.AnyFunSuite

/** TWO REAL JVMs RACING THE FULL LIFECYCLE ALGEBRA (r18, VERDICT #2):
  * LifecycleModelSpec proves the verb algebra in ONE process;
  * ForkedProcessSpec contends a forked appends/folds storm against
  * parent maintenance. This spec closes the remaining assurance gap —
  * the deployment shape at 100 TB is an ingest stream + maintenance
  * cron + backup cron + readers as SEPARATE processes — by running
  * the complete seeded verb walk (append / upsert / delete / anchored
  * folds / snapshot / full+differential backup / copy-restore /
  * promote / prune / epoch) SIMULTANEOUSLY in this JVM and in a
  * forked child JVM, every verb of both walks serialized only by the
  * shared cross-process build-lock file.
  *
  * Each process owns its own FAMILY (the engine's documented
  * ownership contract: Spark's in-memory catalog is per-JVM — a
  * shared-metastore deployment shares table metadata, these tests
  * share the warehouse, the lock, and the disk); what is adversarial
  * here is the LOCK and FILESYSTEM interleaving: every append,
  * swap, backup copy, restore rename, and epoch snapshot of one
  * process brackets arbitrary verbs of the other. Gates: both walks'
  * shadow models stay exact (ids after every verb, scores vs a
  * one-shot rebuild, fsck + backup/snapshot audits Nil), the child
  * exits 0, and the two walks PROVABLY overlapped in time (verbs of
  * each inside the other's span — not accidental serialization).
  */
class TwoProcessWalkSpec extends AnyFunSuite with SparkSuite {

  private val pid = ProcessHandle.current().pid()

  private val addOpensPkgs = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar")

  test("interleaved seeded walks in two real JVMs both hold their " +
      "models under the shared build lock, and the interleaving is " +
      "proven, not accidental") {
   ForkedSuites.gate.synchronized {
    val steps = 18
    val childT = s"xw_child_p$pid"
    val parentT = s"xw_parent_p$pid"
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val fs = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // pre-clean both families' catalog entries AND locations (a
    // crashed previous run of this pid would wedge the child's CTAS)
    (LifecycleWalk.allTables(childT, steps) ++
      LifecycleWalk.allTables(parentT, steps)).foreach { x =>
      spark.sql(s"DROP TABLE IF EXISTS $x")
      val p = new org.apache.hadoop.fs.Path(wh, x.toLowerCase)
      if (fs.exists(p)) fs.delete(p, true)
    }
    val out = java.nio.file.Files.createTempFile("graft_xwalk", ".log")
    val javaBin = sys.props("java.home") + "/bin/java"
    val cmd: Seq[String] = Seq(javaBin) ++
      addOpensPkgs.flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED")) ++
      Seq("-Xmx2g", "-Dspark.ui.enabled=false",
        "-Dfile.encoding=UTF-8",
        "-cp", sys.props("java.class.path"),
        "graft.ChildWalk", childT, "2718", steps.toString)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    pb.redirectOutput(out.toFile)
    val child = pb.start()
    val parentVerbs =
      scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    try {
      // wait until the child's walk is actually UNDERWAY (first verb
      // line) so the parent's walk overlaps it instead of racing the
      // child JVM's session spin-up
      val deadline = System.currentTimeMillis() + 240000L
      def log() = new String(
        java.nio.file.Files.readAllBytes(out), "UTF-8")
      while (!log().contains("\nW ") && !log().startsWith("W ") &&
          child.isAlive) {
        assert(System.currentTimeMillis() < deadline,
          s"child never started its walk: ${log().takeRight(2000)}")
        Thread.sleep(200L)
      }
      assert(child.isAlive, s"child died early: ${log().takeRight(2000)}")

      // the parent's own full walk, different seed, same shared lock
      val trace = LifecycleWalk.run(spark, parentT, 3141L, steps,
        onVerb = v =>
          parentVerbs += ((System.currentTimeMillis(), v)))
      assert(trace.size >= steps)

      assert(child.waitFor(240, java.util.concurrent.TimeUnit.SECONDS),
        "child walk did not finish in time")
      val text = log()
      assert(child.exitValue() === 0, text.takeRight(3000))
      assert(text.contains(s"CHILD_OK steps="), text.takeRight(2000))

      // interleaving PROOF: child verb timestamps inside the parent
      // walk's span, and parent verbs inside the child's span — on
      // the wall clock both JVMs share. Require several on each side
      // so a single boundary verb can't fake an overlap.
      val childTimes = text.linesIterator
        .filter(_.startsWith("W ")).map(_.split(" ", 3)(1).toLong)
        .toSeq
      assert(childTimes.size >= steps, s"child logged ${childTimes.size}")
      val pTimes = parentVerbs.map(_._1)
      val childInParent = childTimes
        .count(t => t > pTimes.min && t < pTimes.max)
      val parentInChild = pTimes
        .count(t => t > childTimes.min && t < childTimes.max)
      assert(childInParent >= 3,
        s"only $childInParent child verbs inside the parent span — " +
          "the walks serialized instead of interleaving")
      assert(parentInChild >= 3,
        s"only $parentInChild parent verbs inside the child span — " +
          "the walks serialized instead of interleaving")
    } finally {
      if (child.isAlive) child.destroyForcibly()
      (LifecycleWalk.allTables(childT, steps) ++
        LifecycleWalk.allTables(parentT, steps)).foreach { x =>
        spark.sql(s"DROP TABLE IF EXISTS $x")
        val p = new org.apache.hadoop.fs.Path(wh, x.toLowerCase)
        if (fs.exists(p)) fs.delete(p, true)
      }
      java.nio.file.Files.deleteIfExists(out)
    }
   }
  }
}
