package graft

/** Per-query job/stage profiler — the measurement harness behind the
  * optimization rounds' "where does the time actually go" step (guide
  * §1.1 empirical loop, without a UI in the sandbox). For each named
  * query: run once warm, then run again under a listener and print
  * total seconds, job/stage counts, and the top stages by duration with
  * their task counts — single-task stages and long stage tails are the
  * signals the optimization guide says to chase.
  *
  * Usage: runMain graft.Profile <sfDir> [q1,q2,...|all]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names: Seq[String] =
      if (args.length < 2 || args(1) == "all")
        SparkEntry.queries.keys.toSeq.sorted
      else args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = SparkEntry.queries
    names.foreach { name =>
      val fn = qs(name)
      // warm pass: stored-index builds, codegen, file listing
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
      } catch { case _: Throwable => }
      val stages = new java.util.concurrent.ConcurrentHashMap[
        Int, (String, Long, Int)]()
      var jobs = 0
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs += 1
        override def onStageCompleted(
            sc: org.apache.spark.scheduler
              .SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          val ms = (for {
            s <- i.submissionTime; c <- i.completionTime
          } yield c - s).getOrElse(0L)
          stages.put(i.stageId,
            (i.name.takeWhile(_ != '\n'), ms, i.numTasks))
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val res =
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          f"${(System.nanoTime() - t0) / 1e9}%.3f"
        } catch { case e: Throwable =>
          s"FAILED ${e.getMessage.take(60)}"
        }
      spark.catalog.clearCache()
      // let straggler stage-completed events drain before reading
      // (listenerBus is private[spark]; a short sleep is enough here)
      Thread.sleep(200)
      spark.sparkContext.removeSparkListener(listener)
      import scala.jdk.CollectionConverters._
      val top = stages.values.asScala.toSeq.sortBy(-_._2).take(4)
        .map { case (_, ms, nt) => s"${ms}ms/T$nt" }.mkString(" ")
      println(f"PROF $name%-24s $res%8s jobs=$jobs%-3d " +
        f"stages=${stages.size}%-3d top: $top")
    }
    spark.stop()
  }
}
