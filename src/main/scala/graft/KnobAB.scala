package graft

/** Interleaved A/B harness for a single SQL conf knob (r20): runs each
  * named query alternating knob=A and knob=B inside ONE JVM and prints
  * min-of-reps for both arms. Interleaving is the only A/B immune to the
  * sandbox's machine drift (OPTIMIZATION_r19.md "Noise discipline");
  * min-of-N discards GC/compilation stalls. The knob must be a
  * runtime-settable SQLConf (planning-time reads are fine — each rep
  * re-plans from the QDef).
  *
  * Usage: runMain graft.KnobAB <sfDir> <q1,q2,...> <conf> <valA> <valB> [reps]
  */
object KnobAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val (conf, valA, valB) = (args(2), args(3), args(4))
    val reps = if (args.length > 5) args(5).toInt else 5
    val unknown = names.toSet.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty,
      s"unknown query name(s): ${unknown.toSeq.sorted.mkString(", ")}")
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
      def run(v: String): Double = {
        spark.conf.set(conf, v)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        s
      }
      val (as, bs) = (Array.fill(reps)(0.0), Array.fill(reps)(0.0))
      (0 until reps).foreach { i => as(i) = run(valA); bs(i) = run(valB) }
      spark.conf.unset(conf)
      println(f"AB $name%-22s $conf $valA=${as.min}%.3f " +
        f"$valB=${bs.min}%.3f  (all A=${as.map(x => f"$x%.2f").mkString(",")}" +
        f" B=${bs.map(x => f"$x%.2f").mkString(",")})")
    }
    spark.stop()
  }
}
