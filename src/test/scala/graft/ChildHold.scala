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
    val spark = GraftSession.builder("local[2]", "4").getOrCreate()
    graft.operators.TextOps.withBuildLock(spark) {
      println("HOLDING")
      Console.out.flush()
      Thread.sleep(args.headOption.map(_.toLong).getOrElse(120000L))
    }
    spark.stop()
  }
}
