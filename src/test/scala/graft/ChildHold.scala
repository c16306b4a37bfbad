package graft

/** A standalone main that ACQUIRES the shared build lock and then
  * blocks — the forked victim for [[ForkedKillSpec]]'s
  * kill-while-holding leg. Prints HOLDING once inside the lock scope
  * (the parent waits for the line before killing) and never releases
  * voluntarily: the parent `destroyForcibly`s this JVM, leaving the
  * lock FILE pinned with a genuinely dead pid — the state the
  * acquire loop's dead-pid sweep exists for, here produced by a real
  * process death instead of a fabricated lock file
  * (CrossProcessLockSpec's simulation).
  */
object ChildHold {
  def main(args: Array[String]): Unit = {
    // args: lockPath sleepMs — the test runs on a PRIVATE lock file
    // (graft.buildLock.path) so the deliberate multi-second holding
    // window cannot starve the parallel suites sharing the parent
    // JVM's default warehouse lock; the sweep semantics under test
    // are path-independent
    val spark = GraftSession.builder("local[2]", "4")
      .config("graft.buildLock.path", args(0))
      .getOrCreate()
    graft.operators.TextOps.withBuildLock(spark) {
      println("HOLDING")
      Console.out.flush()
      Thread.sleep(args.lift(1).map(_.toLong).getOrElse(120000L))
    }
    spark.stop()
  }
}

/** The second real process of [[ForkedKillSpec]]: acquires the same
  * private lock file the killed [[ChildHold]] left pinned with its
  * dead pid — the acquire loop must read the pid, find the process
  * gone, sweep the file, and proceed (never the live-holder refusal,
  * never a hang). Prints SWEPT_OK inside the lock scope and exits 0.
  * A separate JVM because the parent's in-process reentrancy counter
  * is global, not per-path — acquiring a custom path from the shared
  * test JVM could be skipped entirely while another suite holds the
  * default lock, making an in-parent assertion vacuous.
  */
object ChildSweep {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[2]", "4")
      .config("graft.buildLock.path", args(0))
      .getOrCreate()
    graft.operators.TextOps.withBuildLock(spark) {
      println("SWEPT_OK")
      Console.out.flush()
    }
    spark.stop()
    sys.exit(0)
  }
}
