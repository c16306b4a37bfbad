package graft

/** The REAL second process for [[TwoProcessWalkSpec]] (r18, VERDICT
  * #2): runs the full [[LifecycleWalk]] verb algebra — append /
  * upsert / delete / folds / backup / restore / promote / prune /
  * epoch — against its own family in the SHARED warehouse, every
  * verb contending on the SAME default cross-process build lock as
  * the parent's concurrent walk. Prints one timestamped line per
  * completed verb (`W <epochMs> <verb>` — wall-clock millis, the one
  * clock both JVMs share) so the parent can assert the two walks
  * genuinely OVERLAPPED in time, then `CHILD_OK steps=<n>` once the
  * walk's own model checks (ids every step, scores + audits at the
  * end) all passed. Any divergence prints CHILD_FAIL with the verb
  * trace and exits nonzero.
  */
object ChildWalk {
  def main(args: Array[String]): Unit = {
    val table = args(0)
    val seed = args(1).toLong
    val steps = args(2).toInt
    val spark = GraftSession.builder("local[2]", "4").getOrCreate()
    // the SparkSuite rationale: under full-suite load a lock waiter
    // can starve past the 30 s production default
    spark.conf.set("graft.buildLock.timeoutMs", "180000")
    try {
      val trace = LifecycleWalk.run(spark, table, seed, steps,
        onVerb = v => {
          println(s"W ${System.currentTimeMillis()} $v")
          Console.out.flush()
        })
      println(s"CHILD_OK steps=${trace.size}")
      Console.out.flush()
      spark.stop()
      sys.exit(0)
    } catch {
      case e: Throwable =>
        println(s"CHILD_FAIL ${e.getClass.getName}: ${e.getMessage}")
        Console.out.flush()
        try spark.stop() catch { case _: Throwable => () }
        sys.exit(1)
    }
  }
}
